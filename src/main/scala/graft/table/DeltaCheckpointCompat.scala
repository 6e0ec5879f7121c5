package graft.table

import java.nio.file.Path

/** Reader for REAL delta-spark parquet checkpoints — the remaining piece of
  * Delta read-interop: once delta's metadata cleanup deletes the JSON
  * commits behind a checkpoint, the checkpoint is the ONLY seed a fold can
  * start from, and it is a parquet file whose schema (one nullable struct
  * column per action: txn / add / remove / metaData / protocol, stats as a
  * nested JSON string) shares nothing with graft's CheckpointCodec layout.
  *
  * Decoding rides the SAME shape-detecting parser the JSON commits use:
  * each checkpoint row re-serializes to single-action JSON (`toJSON` omits
  * the null action columns, leaving exactly `{"add":{...}}` lines), and
  * `Actions.fromJson` folds it like any Delta log line — stats string,
  * URI-encoded paths, foreign-DV refusal and the columnMapping gate all
  * behave identically on the checkpoint path and the commit path.
  *
  * `remove` rows in a Delta checkpoint are historical tombstones retained
  * for VACUUM, not state — the snapshot's live set is the `add` rows alone
  * (the same rule graft's own JSON checkpoint fold applies).
  *
  * Scale note: this collects the checkpoint to the driver — metadata, not
  * data, and the compat path serves MIGRATING tables (read-only); graft's
  * own checkpoints decode via the multipart parquet codec.
  */
object DeltaCheckpointCompat {

  /** Fold the delta checkpoint file(s) at `cp` into a Snapshot — classic
    * single parquet, multi-part parquet, or a V2 manifest
    * (`<v>.checkpoint.<uuid>.{parquet|json}`) whose `sidecar` actions
    * reference add/remove parquet files under `_delta_log/_sidecars/`.
    * Requires an active SparkSession (always true under any graft read
    * path — forPath/catalog/queries all run inside one). */
  def read(files: Seq[Path], cp: Long): Snapshot = {
    require(files.nonEmpty, s"no delta checkpoint files for version $cp")
    // Multi-part completeness: each part's filename encodes (part i OF n).
    // A lost part — or an eventually-consistent object-store LIST that
    // returned a partial set — must fail HERE, loudly: folding the
    // surviving parts would silently drop AddFiles and serve partial
    // query results as if they were the table.
    val MultiPart = """\d{20}\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val parts = files.flatMap(_.getFileName.toString match {
      case MultiPart(i, n) => Some(i.toLong -> n.toLong)
      case _ => None
    })
    if (parts.nonEmpty) {
      val ns = parts.map(_._2).distinct
      require(ns.size == 1 && parts.map(_._1).sorted == (1L to ns.head),
        s"delta multi-part checkpoint $cp is incomplete: found parts " +
          s"${parts.map(_._1).sorted.mkString(",")} of ${ns.mkString("/")} — " +
          "refusing to fold a partial file set (missing parts would " +
          "silently drop live files)")
    }
    val spark = org.apache.spark.sql.SparkSession.active
    def linesOf(fs: Seq[Path]): Seq[String] =
      if (fs.exists(_.toString.endsWith(".json")))
        // a v2 manifest may be JSON lines — same action-per-line shape
        fs.flatMap(f => new String(java.nio.file.Files.readAllBytes(f),
          java.nio.charset.StandardCharsets.UTF_8).split('\n').toSeq)
      else spark.read.parquet(fs.map(_.toString): _*).toJSON.collect().toSeq
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val raw = linesOf(files).filter(l => l.nonEmpty && l != "{}")
    // V2 layout: `checkpointMetadata` names the checkpoint's version
    // (validated — a torn rename could leave a mismatched manifest);
    // `sidecar` actions reference the add/remove files. Both action types
    // exist only in v2 manifests; classic checkpoints have neither.
    val sidecarPaths = scala.collection.mutable.ArrayBuffer[Path]()
    val logDir = files.head.getParent
    val plain = raw.filter { l =>
      // cheap substring gate first: a classic checkpoint is millions of
      // add lines and can never contain these v2-only actions — parsing
      // every line twice just to probe two keys would double the
      // driver-side fold cost of every foreign table open
      if (!l.contains("\"checkpointMetadata\"") && !l.contains("\"sidecar\"")) true
      else {
      val n = mapper.readTree(l)
      if (n.has("checkpointMetadata")) {
        val declared = n.get("checkpointMetadata").get("version").asLong()
        require(declared == cp,
          s"v2 checkpoint manifest at $cp declares version $declared — " +
            "refusing a mismatched (torn?) manifest")
        false
      } else if (n.has("sidecar")) {
        val rel = n.get("sidecar").get("path").asText()
        // the spec allows absolute sidecar URIs; graft refuses them like
        // every other absolute-path spelling (escape from the table root)
        require(!rel.contains("://") && !rel.startsWith("/"),
          s"v2 checkpoint sidecar path '$rel' is absolute — only " +
            "_delta_log/_sidecars/-relative names are readable")
        val p = logDir.resolve("_sidecars").resolve(rel)
        require(java.nio.file.Files.isRegularFile(p),
          s"v2 checkpoint $cp references sidecar $rel which does not " +
            "exist — refusing to fold a torn checkpoint (missing sidecars " +
            "would silently drop live files)")
        sidecarPaths += p
        false
      } else true
      }
    }
    val sidecarLines =
      if (sidecarPaths.isEmpty) Nil
      else spark.read.parquet(sidecarPaths.map(_.toString).toSeq: _*)
        .toJSON.collect().toSeq.filter(l => l.nonEmpty && l != "{}")
    val actions = (plain ++ sidecarLines).map(Actions.fromJson)
    val meta = actions.collectFirst { case m: MetaData => m }.getOrElse(
      throw new IllegalStateException(s"delta checkpoint $cp lacks metaData"))
    Snapshot(cp, meta,
      actions.collect { case a: AddFile => a },
      actions.collect { case t: Txn => t.appId -> t.version }.toMap,
      actions.collectFirst { case p: Protocol => p }.getOrElse(Protocol()))
  }
}
