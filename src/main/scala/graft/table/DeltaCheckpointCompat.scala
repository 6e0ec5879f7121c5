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

  /** Fold the delta checkpoint parquet file(s) at `cp` into a Snapshot.
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
    val actions = spark.read.parquet(files.map(_.toString): _*)
      .toJSON.collect().iterator
      .filter(l => l.nonEmpty && l != "{}")
      .map(Actions.fromJson).toSeq
    val meta = actions.collectFirst { case m: MetaData => m }.getOrElse(
      throw new IllegalStateException(s"delta checkpoint $cp lacks metaData"))
    Snapshot(cp, meta,
      actions.collect { case a: AddFile => a },
      actions.collect { case t: Txn => t.appId -> t.version }.toMap,
      actions.collectFirst { case p: Protocol => p }.getOrElse(Protocol()))
  }
}
