package graft.table

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Read-interop with REAL delta-spark transaction logs.
  *
  * The reference's on-disk tables are genuine Delta tables
  * (spark_project.py:36 `df.write.format("delta")`; Dockerfile:10 pins
  * delta-core 1.0.0), whose log actions differ from graft's in exactly the
  * ways these fixtures exercise: stats live in a nested JSON STRING on the
  * add (`stats`), `dataChange` is present, metaData carries a `format`
  * block and a `configuration` map, commitInfo names no version, and paths
  * are URI-encoded. Every log here is HAND-AUTHORED byte-for-byte in the
  * delta-1.0 JSON shape (no delta jar exists in this environment — which
  * also proves the reader needs none).
  */
class DeltaCompatSpec extends SparkTestBase {

  /** Write `rows` as ONE parquet file at tablePath/relPath, returning
    * (size, mtime). Spark writes into a temp dir; the single part file
    * moves to the requested name — delta logs reference exact file names. */
  private def dataFile(tablePath: String, relPath: String,
      df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val stage = tmpDir("delta-stage-")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val target = Paths.get(tablePath, relPath)
    Files.createDirectories(target.getParent)
    Files.move(Paths.get(part), target, StandardCopyOption.REPLACE_EXISTING)
    (Files.size(target), Files.getLastModifiedTime(target).toMillis)
  }

  private def commit(tablePath: String, v: Long, lines: Seq[String]): Unit = {
    val logDir = Paths.get(tablePath, "_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** A Delta `stats` value: the nested-JSON-string form delta-spark writes. */
  private def stats(numRecords: Long, mins: Map[String, Any],
      maxs: Map[String, Any], nulls: Map[String, Long]): String = {
    def lit(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      case other => other.toString
    }
    def obj(m: Map[String, Any]): String =
      m.map { case (k, v) => s""""$k":${lit(v)}""" }.mkString("{", ",", "}")
    val body = s"""{"numRecords":$numRecords,"minValues":${obj(mins)},""" +
      s""""maxValues":${obj(maxs)},"nullCount":${obj(nulls.map { case (k, v) => k -> (v: Any) })}}"""
    body.replace("\\", "\\\\").replace("\"", "\\\"")
  }

  private val idSchema =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""

  private def metaData(schema: String, partitionColumns: Seq[String] = Nil,
      configuration: Map[String, String] = Map.empty): String = {
    val conf = configuration.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    s"""{"metaData":{"id":"11111111-2222-3333-4444-555555555555","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[${partitionColumns.map("\"" + _ + "\"").mkString(",")}],"configuration":$conf,"createdTime":1619112344000}}"""
  }

  private def add(path: String, size: Long, mtime: Long,
      statsStr: Option[String], partitionValues: Map[String, String] = Map.empty): String = {
    val pv = partitionValues.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val st = statsStr.map(s => s""","stats":"$s"""").getOrElse("")
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":$size,"modificationTime":$mtime,"dataChange":true$st}}"""
  }

  private def commitInfo(ts: Long, op: String): String =
    s"""{"commitInfo":{"timestamp":$ts,"operation":"$op","operationParameters":{"mode":"Append"},"isBlindAppend":true,"operationMetrics":{"numFiles":"1"}}}"""

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, s"row$i")).toDF("id", "s")
  }

  // ---------------------------------------------------------------------------

  test("genuine delta-1.0 log: snapshot, version/timestamp travel, history") {
    val dir = tmpDir("delta-compat-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(5 until 10))
    val (sz3, mt3) = dataFile(dir, "part-00002-ccc-c000.snappy.parquet", df(10 until 15))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0, "s" -> "row0"), Map("id" -> 4, "s" -> "row4"),
          Map("id" -> 0L, "s" -> 0L)))),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(5, Map("id" -> 5, "s" -> "row5"), Map("id" -> 9, "s" -> "row9"),
          Map("id" -> 0L, "s" -> 0L))))))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "DELETE"),
      """{"remove":{"path":"part-00001-bbb-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true,"extendedFileMetadata":true,"partitionValues":{},"size":""" + sz2 + "}}",
      add("part-00002-ccc-c000.snappy.parquet", sz3, mt3,
        Some(stats(5, Map("id" -> 10, "s" -> "row10"), Map("id" -> 14, "s" -> "row14"),
          Map("id" -> 0L, "s" -> 0L))))))

    val t = GraftTable.forPath(spark, dir)
    assert(t.latestVersion === 1L)
    // latest = first file + third file: ids 0-4 ∪ 10-14
    assert(t.toDF.select("id").collect().map(_.getLong(0)).sorted
      === ((0L until 5L) ++ (10L until 15L)).toArray)
    // versionAsOf 0 = ids 0-9
    assert(t.versionAsOf(0).count() === 10L)
    // timestamp travel between the two commits lands on version 0
    assert(t.timestampAsOf(new java.sql.Timestamp(1619112345500L)).count() === 10L)
    // history carries the patched versions and the Delta operation names
    val hist = t.history().select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist === Map(0L -> "WRITE", 1L -> "DELETE"))
  }

  test("delta stats prune files; stats-less adds degrade to scan, not to a wrong count") {
    val dir = tmpDir("delta-compat-stats-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(5 until 10))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0), Map("id" -> 4), Map("id" -> 0L)))),
      // second file ships NO stats at all (delta allows it)
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2, None)))
    val t = GraftTable.forPath(spark, dir)
    val snap = t.snapshot
    // pruning: id > 100 drops the stats-carrying file, keeps the unknown one
    val pruned = t.prunedFiles(snap, col("id") > 100L)
    assert(pruned.map(_.path) === Seq("part-00001-bbb-c000.snappy.parquet"))
    // the stats-less add parses as numRecords = -1 (unknown) ...
    assert(snap.files.find(_.path.contains("00001")).get.numRecords === -1L)
    // ... and count(*) is still exact — the scan answers, never the log
    assert(t.toDF.count() === 10L)
    assert(t.scan(col("id") < 7L).count() === 7L)
    // the METADATA-ONLY surfaces must not sum the sentinel into a wrong
    // number: metadataCount falls back to the scan (exact), DESCRIBE
    // DETAIL's numRows says NULL (unknown), never -1-tainted arithmetic
    assert(t.metadataCount() === 10L)
    assert(t.detail().head().isNullAt(2),
      "detail().numRows must be NULL when any add lacks stats")
  }

  test("partitioned delta table: URI-encoded paths decode, partition dirs reconstruct") {
    import spark.implicits._
    val dir = tmpDir("delta-compat-part-")
    val dfa = Seq((1L, "x")).toDF("id", "s")
    val dfb = Seq((2L, "y"), (3L, "z")).toDF("id", "s")
    val (sz1, mt1) = dataFile(dir, "p=a b/part-00000-aaa-c000.snappy.parquet", dfa.drop("s"))
    val (sz2, mt2) = dataFile(dir, "p=q/part-00001-bbb-c000.snappy.parquet", dfb.drop("s"))
    val schema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"p\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(schema, partitionColumns = Seq("p")),
      // the space in the dir URI-encodes as %20, exactly as delta writes it
      add("p=a%20b/part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(1, Map("id" -> 1), Map("id" -> 1), Map("id" -> 0L))),
        partitionValues = Map("p" -> "a b")),
      add("p=q/part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(2, Map("id" -> 2), Map("id" -> 3), Map("id" -> 0L))),
        partitionValues = Map("p" -> "q"))))
    val t = GraftTable.forPath(spark, dir)
    assert(t.snapshot.files.map(_.path).toSet ===
      Set("p=a b/part-00000-aaa-c000.snappy.parquet",
          "p=q/part-00001-bbb-c000.snappy.parquet"))
    val rows = t.toDF.select($"id", $"p").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "a b", 2L -> "q", 3L -> "q"))
  }

  test("foreign features refuse loudly; ignorable ones don't") {
    val dir = tmpDir("delta-compat-gate-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))

    // deletion vectors with u/i/p storage READ natively (DeltaDvCompatSpec);
    // an UNKNOWN storage type must still refuse at parse with a named error
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaData(idSchema),
      s"""{"add":{"path":"part-00000-aaa-c000.snappy.parquet","partitionValues":{},"size":$sz1,"modificationTime":$mt1,"dataChange":true,"deletionVector":{"storageType":"x","pathOrInlineDv":"ab^-aqEH.-t@S}K{vb[*k^","offset":4,"sizeInBytes":40,"cardinality":6}}}"""))
    val e1 = intercept[GraftProtocolException] {
      GraftTable.forPath(spark, dir).toDF.collect()
    }
    assert(e1.getMessage.contains("deletion vector") &&
      e1.getMessage.contains("storageType"), s"got $e1")

    // columnMapping name and id modes READ natively (dedicated tests
    // below); a mode this reader does not know refuses at the gate
    val dir2 = tmpDir("delta-compat-gate2-")
    dataFile(dir2, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))
    commit(dir2, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaData(idSchema, configuration = Map(
        "delta.columnMapping.mode" -> "hypothetical",
        "delta.columnMapping.maxColumnId" -> "2"))))
    val e2 = intercept[GraftProtocolException] {
      GraftTable.forPath(spark, dir2).snapshot
    }
    assert(e2.getMessage.contains("columnMapping"))

    // minReaderVersion past 3 → refuse
    val dir3 = tmpDir("delta-compat-gate3-")
    dataFile(dir3, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))
    commit(dir3, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":7}}""",
      metaData(idSchema)))
    intercept[GraftProtocolException] {
      GraftTable.forPath(spark, dir3).snapshot
    }

    // declared-but-unused safe features + domainMetadata lines read fine
    val dir4 = tmpDir("delta-compat-gate4-")
    val (sz4, mt4) = dataFile(dir4, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))
    commit(dir4, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz","v2Checkpoint"],"writerFeatures":["timestampNtz","v2Checkpoint"]}}""",
      metaData(idSchema),
      """{"domainMetadata":{"domain":"delta.clustering","configuration":"{}","removed":false}}""",
      add("part-00000-aaa-c000.snappy.parquet", sz4, mt4,
        Some(stats(3, Map("id" -> 0), Map("id" -> 2), Map("id" -> 0L))))))
    assert(GraftTable.forPath(spark, dir4).toDF.count() === 3L)
  }

  test("columnMapping.mode=name reads natively: physical parquet names project to logical") {
    import spark.implicits._
    val dir = tmpDir("delta-compat-cmap-")
    // the parquet file spells the PHYSICAL names (delta's col-<uuid> style)
    val (sz, mt) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet",
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("col-aaa111", "col-bbb222"))
    // logical schema binds physical names via delta.columnMapping metadata
    val mappedSchema =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col-aaa111\"}},""" +
        """{\"name\":\"label\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":2,\"delta.columnMapping.physicalName\":\"col-bbb222\"}}]}"""
    // delta stats under column mapping are keyed by PHYSICAL name
    val physStats =
      """{\"numRecords\":3,\"minValues\":{\"col-aaa111\":1},\"maxValues\":{\"col-aaa111\":3},\"nullCount\":{\"col-aaa111\":0}}"""
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaData(mappedSchema, configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "2")),
      s"""{"add":{"path":"part-00000-aaa-c000.snappy.parquet","partitionValues":{},"size":$sz,"modificationTime":$mt,"dataChange":true,"stats":"$physStats"}}"""))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.columns.toSeq === Seq("id", "label"),
      "logical names project out of physically-named parquet")
    assert(t.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "x", 2L -> "y", 3L -> "z"))
    // pruning translates the logical predicate to the physical stat key
    assert(t.prunedFiles(t.snapshot, col("id") > 10L).isEmpty,
      "physical-keyed delta stats must prune through the mapping")
    assert(t.prunedFiles(t.snapshot, col("id") === 2L).size === 1)
    assert(t.scan(col("id") >= 2L).count() === 2L)
    // still read-only
    intercept[GraftProtocolException](t.delete(col("id") === 1L))

    // foreign cdc files spell PHYSICAL names too — the change feed must
    // read them physically and rename, or every mapped column serves NULL
    val (szC, _) = dataFile(dir, "_change_data/cdc-cmap-c000.snappy.parquet",
      Seq((3L, "z", "delete")).toDF("col-aaa111", "col-bbb222", "_change_type"))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "DELETE"),
      s"""{"remove":{"path":"part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true}}""",
      s"""{"cdc":{"path":"_change_data/cdc-cmap-c000.snappy.parquet","partitionValues":{},"size":$szC,"dataChange":false}}"""))
    val ch = GraftTable.forPath(spark, dir).changes(0, 1)
      .select("id", "label", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ch.toSeq === Seq((3L, "z", "delete")),
      s"name-mapped cdc must bind physical names to logical columns, got ${ch.toSeq}")
  }

  test("columnMapping.mode=id reads natively: columns resolve by parquet FIELD ID, not name") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmpDir("delta-compat-idmap-")
    // The file's column NAMES match NOTHING in the delta schema — the
    // Iceberg-conversion shape (converted tables keep their original
    // parquet names); only the stamped field ids can bind the columns.
    // Name-based resolution would read all-nulls, so correct values here
    // PROVE the id lookup ran.
    val fileSchema = StructType(Seq(
      StructField("orig_key", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("orig_label", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val (sz, mt) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet",
      spark.createDataFrame(
        java.util.Arrays.asList(Row(1L, "x"), Row(2L, "y"), Row(3L, "z")),
        fileSchema))
    val mappedSchema =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":1,\"delta.columnMapping.physicalName\":\"col-aaa111\"}},""" +
        """{\"name\":\"label\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"delta.columnMapping.id\":2,\"delta.columnMapping.physicalName\":\"col-bbb222\"}}]}"""
    // delta stats stay keyed by PHYSICAL name in id mode too
    val physStats =
      """{\"numRecords\":3,\"minValues\":{\"col-aaa111\":1},\"maxValues\":{\"col-aaa111\":3},\"nullCount\":{\"col-aaa111\":0}}"""
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaData(mappedSchema, configuration = Map(
        "delta.columnMapping.mode" -> "id",
        "delta.columnMapping.maxColumnId" -> "2")),
      s"""{"add":{"path":"part-00000-aaa-c000.snappy.parquet","partitionValues":{},"size":$sz,"modificationTime":$mt,"dataChange":true,"stats":"$physStats"}}"""))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.columns.toSeq === Seq("id", "label"))
    assert(t.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "x", 2L -> "y", 3L -> "z"),
      "values must bind by field id (name lookup would serve nulls)")
    // pruning still translates logical predicates to physical stat keys
    assert(t.prunedFiles(t.snapshot, org.apache.spark.sql.functions.col("id") > 10L).isEmpty)
    assert(t.scan(org.apache.spark.sql.functions.col("id") >= 2L).count() === 2L)
    // a RENAME in the log history is metadata-only: same ids, new logical
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "RENAME COLUMN"),
      metaData(mappedSchema.replace("""\"name\":\"label\"""", """\"name\":\"txt\""""),
        configuration = Map(
          "delta.columnMapping.mode" -> "id",
          "delta.columnMapping.maxColumnId" -> "2"))))
    val t2 = GraftTable.forPath(spark, dir)
    assert(t2.toDF.columns.toSeq === Seq("id", "txt"))
    assert(t2.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "x", 2L -> "y", 3L -> "z"))
    // the STREAM decodes through the vectorized V2 factory — same id path
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0").load(dir)
      .writeStream.format("memory").queryName("idmap_stream")
      .option("checkpointLocation", tmpDir("delta-compat-idmap-ckpt-"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("idmap_stream").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "x", 2L -> "y", 3L -> "z"),
      "the vectorized factory must resolve id-mode columns by field id")
    // still read-only
    intercept[GraftProtocolException](t2.delete(org.apache.spark.sql.functions.col("id") === 1L))

    // the CHANGE FEED binds by field id too, even when no prior read
    // flipped the session flag (changes() builds its own spark.read — it
    // must enable field-id resolution itself, never depend on read order)
    val (szC, _) = dataFile(dir, "_change_data/cdc-idmap-c000.snappy.parquet",
      spark.createDataFrame(
        java.util.Arrays.asList(Row(3L, "z", "delete")),
        fileSchema.add(StructField("_change_type", StringType, nullable = true))))
    commit(dir, 2, Seq(
      commitInfo(1619112347000L, "DELETE"),
      s"""{"remove":{"path":"part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112347000,"dataChange":true}}""",
      s"""{"cdc":{"path":"_change_data/cdc-idmap-c000.snappy.parquet","partitionValues":{},"size":$szC,"dataChange":false}}"""))
    spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    val ch = GraftTable.forPath(spark, dir).changes(1, 2)
      .select("id", "txt", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ch.toSeq === Seq((3L, "z", "delete")),
      s"id-mode cdc must bind by field id (name lookup serves NULLs), got ${ch.toSeq}")
  }

  test("delta V2 checkpoint (UUID manifest + sidecars) folds; checkpoint-only survives cleanup; torn sidecar refuses") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // --- a foreign log whose checkpoint is V2: manifest + two sidecars ---
    val dir = tmpDir("delta-compat-v2cp-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 4))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(4 until 9))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L))))))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "WRITE"),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(5, Map("id" -> 4), Map("id" -> 8), Map("id" -> 0L))))))
    val jsonReplay = GraftTable.forPath(spark, dir).toDF
      .collect().map(_.getLong(0)).sorted.toSeq

    // the sidecars: add-action parquet under _delta_log/_sidecars/
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val sidecarSchema = StructType(Seq(StructField("add", addType)))
    def sidecarRow(p: String, sz: Long, mt: Long) =
      Row(Row(p, Map.empty[String, String], sz, mt, false))
    dataFile(dir, "_delta_log/_sidecars/sc-aaa.parquet",
      spark.createDataFrame(java.util.Arrays.asList(
        sidecarRow("part-00000-aaa-c000.snappy.parquet", sz1, mt1)), sidecarSchema))
    dataFile(dir, "_delta_log/_sidecars/sc-bbb.parquet",
      spark.createDataFrame(java.util.Arrays.asList(
        sidecarRow("part-00001-bbb-c000.snappy.parquet", sz2, mt2)), sidecarSchema))
    // the manifest: metaData + protocol + checkpointMetadata + sidecar refs
    val manifestSchema = StructType(Seq(
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType)))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType))))))
    val plainSchema = idSchema.replace("\\\"", "\"")
    def manifestRows(version: Long, sidecars: Seq[String]) = {
      val rows = new java.util.ArrayList[Row]()
      rows.add(Row(
        Row("v2cp-1111", Row("parquet"), plainSchema, Seq.empty[String],
          Map.empty[String, String], 1619112344000L),
        Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")), null, null))
      rows.add(Row(null, null, Row(version), null))
      sidecars.foreach(s => rows.add(Row(null, null, null, Row(s, 1024L))))
      rows
    }
    dataFile(dir, "_delta_log/00000000000000000001.checkpoint.4d2a55ae-0001.parquet",
      spark.createDataFrame(manifestRows(1L, Seq("sc-aaa.parquet", "sc-bbb.parquet")),
        manifestSchema))
    // crash DEBRIS: a graft-multipart-named part file with no manifest
    // (%020d.checkpoint.%010d.parquet — a pure-digit middle) must stay
    // invisible, never be picked as "the v2 manifest" (it sorts BEFORE
    // the uuid name, so a greedy take(1) would fold garbage)
    Files.write(Paths.get(dir, "_delta_log",
      "00000000000000000001.checkpoint.0000000001.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":1}""".getBytes("UTF-8"))
    // cleanup: delete every JSON commit — the v2 checkpoint is now the
    // ONLY seed (the delta-3.x metadata-cleanup shape that used to refuse)
    Files.delete(Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
    Files.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.collect().map(_.getLong(0)).sorted.toSeq === jsonReplay,
      "v2 checkpoint fold must equal the JSON replay")

    // --- torn checkpoint: a manifest referencing a MISSING sidecar ---
    // (checkpoint-only, like the cleaned shape above — with JSON commits
    // intact a torn checkpoint falls back to full replay instead)
    val dir2 = tmpDir("delta-compat-v2cp-torn-")
    dataFile(dir2, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))
    dataFile(dir2, "_delta_log/00000000000000000001.checkpoint.4d2a55ae-0002.parquet",
      spark.createDataFrame(manifestRows(1L, Seq("sc-lost.parquet")), manifestSchema))
    Files.write(Paths.get(dir2, "_delta_log", "_last_checkpoint"),
      """{"version":1}""".getBytes("UTF-8"))
    val e = intercept[Exception](GraftTable.forPath(spark, dir2).toDF.count())
    assert(e.getMessage.contains("sidecar"),
      s"torn v2 checkpoint must refuse naming the sidecar, got $e")

    // --- mismatched manifest version refuses ---
    val dir3 = tmpDir("delta-compat-v2cp-mismatch-")
    dataFile(dir3, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))
    dataFile(dir3, "_delta_log/00000000000000000001.checkpoint.4d2a55ae-0003.parquet",
      spark.createDataFrame(manifestRows(7L, Nil), manifestSchema))
    Files.write(Paths.get(dir3, "_delta_log", "_last_checkpoint"),
      """{"version":1}""".getBytes("UTF-8"))
    val e2 = intercept[Exception](GraftTable.forPath(spark, dir3).toDF.count())
    assert(e2.getMessage.contains("declares version"), s"got $e2")
  }

  test("foreign delta logs are read-only: every write path refuses with the migration hint") {
    val dir = tmpDir("delta-compat-ro-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0), Map("id" -> 4), Map("id" -> 0L))))))
    val t = GraftTable.forPath(spark, dir)
    val e = intercept[GraftProtocolException] { t.delete(col("id") === 1L) }
    assert(e.getMessage.contains("delta-spark") && e.getMessage.contains("read"))
    // the refused write left the table fully intact and readable
    assert(t.toDF.count() === 5L)
    // ... and the documented migration path works: copy into a graft table
    val migrated = GraftTable.create(spark, tmpDir("delta-compat-migrated-"), t.toDF)
    migrated.delete(col("id") === 1L)
    assert(migrated.toDF.count() === 4L)
  }

  test("foreign delta logs are read-only for MAINTENANCE too: vacuum, log cleanup, checkpoints refuse") {
    val dir = tmpDir("delta-compat-maint-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(5 until 10))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0), Map("id" -> 4), Map("id" -> 0L)))),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(5, Map("id" -> 5), Map("id" -> 9), Map("id" -> 0L))))))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "DELETE"),
      s"""{"remove":{"path":"part-00001-bbb-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true}}"""))
    val t = GraftTable.forPath(spark, dir)
    // vacuum would delete the tombstoned file — delta versions this fold
    // cannot see may still reference it; MUST refuse (and leave it alone)
    intercept[GraftProtocolException](t.vacuum(retentionMs = 0L))
    assert(Files.exists(Paths.get(dir, "part-00001-bbb-c000.snappy.parquet")),
      "refused vacuum must not have deleted anything")
    // log cleanup would delete delta's commit files / plant _log_start
    intercept[GraftProtocolException](t.cleanupExpiredLogs(retentionMs = 0L))
    assert(Files.exists(Paths.get(dir, "_delta_log", f"${0L}%020d.json")))
    // graft checkpoints must never land inside a foreign _delta_log
    intercept[GraftProtocolException](t.log.writeCheckpoint(t.latestVersion))
    // dry-run stays allowed: auditing a foreign table is always safe
    assert(t.vacuumDryRun(retentionMs = 0L)
      .contains("part-00001-bbb-c000.snappy.parquet"))
    // reads keep working after every refusal
    assert(t.toDF.count() === 5L)
  }

  test("foreign commitInfo with no timestamp degrades (all fields optional), never NPEs the version") {
    val dir = tmpDir("delta-compat-noci-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    commit(dir, 0, Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0), Map("id" -> 4), Map("id" -> 0L))))))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.count() === 5L)
    assert(t.history().count() === 1L)
    assert(t.versionAsOf(0).count() === 5L)
  }

  /** Write delta-checkpoint rows (single-action JSON lines → parquet with
    * one nullable struct column per action — the real delta layout) and
    * move the part files to the given names under _delta_log. */
  private def deltaCheckpoint(dir: String, actionLines: Seq[String],
      names: Seq[String]): Unit = {
    import spark.implicits._
    val stage = tmpDir("delta-cp-auth-")
    spark.read.json(actionLines.toDS).repartition(names.size)
      .write.mode("overwrite").parquet(stage)
    val parts = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    assert(parts.length == names.length)
    parts.zip(names).foreach { case (p, n) =>
      Files.move(Paths.get(p), Paths.get(dir, "_delta_log", n),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("checkpoint-only delta log (JSON commits cleaned) folds through the compat reader") {
    val dir = tmpDir("delta-compat-cponly-")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(5 until 10))
    // delta's metadata cleanup deleted JSONs 0-10; the version-10
    // checkpoint parquet is the only seed, and commit 11 appends a file
    deltaCheckpoint(dir, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"abc","format":{"provider":"parquet"},"schemaString":"$idSchema","partitionColumns":[],"configuration":{"k":"v"},"createdTime":1619112344000}}""",
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0), Map("id" -> 4), Map("id" -> 0L))))),
      Seq(f"${10L}%020d.checkpoint.parquet"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":10,"size":3}""".getBytes("UTF-8"))
    commit(dir, 11, Seq(
      commitInfo(1619112399000L, "WRITE"),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(5, Map("id" -> 5), Map("id" -> 9), Map("id" -> 0L))))))

    val t = GraftTable.forPath(spark, dir)
    assert(t.latestVersion === 11L)
    assert(t.toDF.count() === 10L)
    // the checkpoint version itself time-travels; configuration flowed
    // through, with the foreign marker attached
    val s10 = t.snapshotAt(10L)
    assert(s10.files.map(_.path) === Seq("part-00000-aaa-c000.snappy.parquet"))
    assert(s10.metaData.properties.get("k").contains("v"))
    assert(s10.metaData.properties.contains(Actions.DeltaReadMarker))
    assert(t.versionAsOf(10L).count() === 5L)
    // versions below the cleaned horizon stay unreachable, loudly
    intercept[Exception](t.versionAsOf(3L).count())
    // ... and the foreign log is still read-only
    intercept[GraftProtocolException](t.delete(col("id") >= 0L))
  }

  test("multi-part delta checkpoint (part-of-n naming, no manifest) folds too") {
    val dir = tmpDir("delta-compat-cpmulti-")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 4))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(4 until 9))
    deltaCheckpoint(dir, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"abc","format":{"provider":"parquet"},"schemaString":"$idSchema","partitionColumns":[],"configuration":{},"createdTime":1619112344000}}""",
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L)))),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(5, Map("id" -> 4), Map("id" -> 8), Map("id" -> 0L))))),
      Seq(f"${20L}%020d.checkpoint.${1}%010d.${2}%010d.parquet",
        f"${20L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":20,"size":4,"parts":2}""".getBytes("UTF-8"))
    commit(dir, 21, Seq(commitInfo(1619112400000L, "OPTIMIZE")))
    val t = GraftTable.forPath(spark, dir)
    assert(t.latestVersion === 21L)
    assert(t.toDF.count() === 9L)
  }

  test("format(\"delta\") alias: the reference's verbatim API runs against graft") {
    // no delta jar exists here, so the short name is free — the reference's
    // exact call shapes (spark_project.py:36 write, api.py:77-80 reads)
    // resolve to the graft source
    val dir = tmpDir("delta-alias-") + "/t"
    df(0 until 6).write.format("delta").save(dir)
    assert(GraftTable.isGraftTable(dir), "format(\"delta\") write must create a graft table")
    df(6 until 9).write.format("delta").mode("append").save(dir)
    assert(spark.read.format("delta").load(dir).count() === 9L)
    assert(spark.read.format("delta").option("versionAsOf", 0).load(dir).count() === 6L)
    // full circle: the alias reads a REAL delta-spark log transparently...
    val foreign = tmpDir("delta-alias-foreign-")
    val (sz1, mt1) = dataFile(foreign, "part-00000-aaa-c000.snappy.parquet", df(0 until 4))
    commit(foreign, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L))))))
    assert(spark.read.format("delta").load(foreign).count() === 4L)
    // ... and still refuses to APPEND into one (the foreign-log gate holds
    // regardless of spelling)
    val e = intercept[Exception] {
      df(100 until 103).write.format("delta").mode("append").save(foreign)
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.isInstanceOf[GraftProtocolException]),
      s"foreign append must refuse through the gate, got $e")
  }

  test("a foreign (non-graft) checkpoint is ignored: full JSON replay folds the table") {
    import spark.implicits._
    val dir = tmpDir("delta-compat-cp-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 5))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(5, Map("id" -> 0), Map("id" -> 4), Map("id" -> 0L))))))
    // a DELTA-format checkpoint parquet (nested action structs — not
    // graft's codec schema) plus the _last_checkpoint pointer delta writes
    val cpDf = Seq(("part-00000-aaa-c000.snappy.parquet", 5L))
      .toDF("path", "numRecords")
      .select(struct($"path", $"numRecords").as("add"))
    val cpStage = tmpDir("delta-cp-stage-")
    cpDf.coalesce(1).write.mode("overwrite").parquet(cpStage)
    val part = Files.list(Paths.get(cpStage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part),
      Paths.get(dir, "_delta_log", f"${0L}%020d.checkpoint.parquet"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":0,"size":1}""".getBytes("UTF-8"))
    // decode of the foreign checkpoint fails internally; the fold falls
    // back to the JSON commits and still answers correctly
    assert(GraftTable.forPath(spark, dir).toDF.count() === 5L)
  }

  test("FULLY-cleaned delta log (zero JSON commits) reads from the checkpoint; create refuses") {
    val dir = tmpDir("delta-compat-zerojson-")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 7))
    // delta metadata cleanup on an idle table deletes EVERY JSON commit —
    // a valid Delta state: checkpoint parquet + _last_checkpoint survive
    deltaCheckpoint(dir, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"abc","format":{"provider":"parquet"},"schemaString":"$idSchema","partitionColumns":[],"configuration":{},"createdTime":1619112344000}}""",
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(7, Map("id" -> 0), Map("id" -> 6), Map("id" -> 0L))))),
      Seq(f"${10L}%020d.checkpoint.parquet"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":10,"size":3}""".getBytes("UTF-8"))

    val t = GraftTable.forPath(spark, dir) // must not refuse: the checkpoint IS the table
    assert(t.latestVersion === 10L)
    assert(t.toDF.count() === 7L)
    assert(t.versionAsOf(10L).count() === 7L)
    // no commit file survives → no history, no timestamp resolution
    assert(t.history().count() === 0L)
    intercept[Exception](t.timestampAsOf(new java.sql.Timestamp(1619112345500L)))
    // version 0's JSON is free — a graft create landing there would put
    // graft commits (and a later graft VACUUM) inside a live Delta table
    val e = intercept[Exception](GraftTable.create(spark, dir, df(0 until 2)))
    assert(e.getMessage.contains("already") || e.getMessage.contains("Delta"),
      s"create inside a checkpoint-only Delta table must refuse, got $e")
    // still read-only through every DML gate
    intercept[GraftProtocolException](t.delete(col("id") >= 0L))
  }

  test("checkpoint-only log with a LOST _last_checkpoint recovers by listing") {
    val dir = tmpDir("delta-compat-zerojson-noptr-")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 4))
    // version 7 is deliberately UNALIGNED with graft's checkpoint interval
    // — the aligned-probe fallback alone would never find it
    deltaCheckpoint(dir, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"abc","format":{"provider":"parquet"},"schemaString":"$idSchema","partitionColumns":[],"configuration":{},"createdTime":1619112344000}}""",
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L))))),
      Seq(f"${7L}%020d.checkpoint.parquet"))
    val t = GraftTable.forPath(spark, dir)
    assert(t.latestVersion === 7L)
    assert(t.toDF.count() === 4L)
  }

  test("INCOMPLETE multi-part checkpoint refuses loudly instead of folding partial state") {
    val dir = tmpDir("delta-compat-cppartial-")
    Files.createDirectories(Paths.get(dir, "_delta_log"))
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 4))
    // only part 1 of 2 survives (lost part / eventually-consistent LIST):
    // folding it would silently drop every AddFile in part 2
    deltaCheckpoint(dir, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"abc","format":{"provider":"parquet"},"schemaString":"$idSchema","partitionColumns":[],"configuration":{},"createdTime":1619112344000}}""",
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L))))),
      Seq(f"${20L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":20,"size":4,"parts":2}""".getBytes("UTF-8"))
    val e = intercept[Exception](GraftTable.forPath(spark, dir).toDF.count())
    assert(e.getMessage != null && e.getMessage.contains("incomplete"),
      s"partial multi-part checkpoint must refuse by name, got $e")
  }

  test("null partition value in a foreign add maps to the Hive sentinel, not a missing key") {
    import spark.implicits._
    val dir = tmpDir("delta-compat-nullpart-")
    val dfa = Seq(Tuple1(1L)).toDF("id")
    val dfb = Seq(Tuple1(2L), Tuple1(3L)).toDF("id")
    val (sz1, mt1) =
      dataFile(dir, "p=__HIVE_DEFAULT_PARTITION__/part-00000-aaa-c000.snappy.parquet", dfa)
    val (sz2, mt2) = dataFile(dir, "p=q/part-00001-bbb-c000.snappy.parquet", dfb)
    val schema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"p\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(schema, partitionColumns = Seq("p")),
      // delta serializes a null partition value as JSON null — the key
      // must SURVIVE (as the sentinel) or keyed lookups downstream throw
      s"""{"add":{"path":"p=__HIVE_DEFAULT_PARTITION__/part-00000-aaa-c000.snappy.parquet","partitionValues":{"p":null},"size":$sz1,"modificationTime":$mt1,"dataChange":true,"stats":"${stats(1, Map("id" -> 1), Map("id" -> 1), Map("id" -> 0L))}"}}""",
      add("p=q/part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(2, Map("id" -> 2), Map("id" -> 3), Map("id" -> 0L))),
        partitionValues = Map("p" -> "q"))))
    val t = GraftTable.forPath(spark, dir)
    val sentinel = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .DEFAULT_PARTITION_NAME
    assert(t.snapshot.files.flatMap(_.partitionValues.get("p")).toSet ===
      Set(sentinel, "q"), "the null partition key must survive as the sentinel")
    val rows = t.toDF.select($"id", $"p").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows === Map(1L -> null, 2L -> "q", 3L -> "q"))
    assert(t.toDF.filter($"p".isNull).count() === 1L)
  }

  test("absolute add paths refuse in every spelling (scheme://, scheme:/, bare /)") {
    for (bad <- Seq("s3a://bucket/part-x.parquet", "file:/ext/part-x.parquet",
                    "/ext/part-x.parquet")) {
      val dir = tmpDir("delta-compat-abs-")
      val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 2))
      commit(dir, 0, Seq(
        commitInfo(1619112345000L, "WRITE"),
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        metaData(idSchema),
        add(bad, sz1, mt1, None)))
      val e = intercept[Exception](GraftTable.forPath(spark, dir).toDF.count())
      assert(e.getMessage != null && e.getMessage.contains("absolute"),
        s"path '$bad' must refuse as absolute, got $e")
    }
  }

  test("CALL graft.system.import_delta migrates a foreign table in one call") {
    import spark.implicits._
    val dir = tmpDir("delta-compat-import-")
    val dfa = Seq((1L, "x"), (2L, "x")).toDF("id", "p")
    val dfb = Seq((3L, "y")).toDF("id", "p")
    val (sz1, mt1) = dataFile(dir, "p=x/part-00000-aaa-c000.snappy.parquet", dfa.drop("p"))
    val (sz2, mt2) = dataFile(dir, "p=y/part-00001-bbb-c000.snappy.parquet", dfb.drop("p"))
    val schema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"p\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(schema, partitionColumns = Seq("p")),
      add("p=x/part-00000-aaa-c000.snappy.parquet", sz1, mt1, None,
        partitionValues = Map("p" -> "x")),
      add("p=y/part-00001-bbb-c000.snappy.parquet", sz2, mt2, None,
        partitionValues = Map("p" -> "y"))))
    graft.sources.GraftCatalog.register(spark, tmpDir("delta-import-wh-"),
      name = "dimp")
    val dest = tmpDir("delta-import-dest-") + "/t"
    val res = spark.sql(
      s"CALL dimp.system.import_delta(source => '$dir', dest => '$dest')").head
    assert(res.getLong(0) === 3L, "rows_imported")
    val t = GraftTable.forPath(spark, dest)
    assert(t.snapshot.metaData.partitionColumns === Seq("p"), "partitioning preserved")
    assert(t.toDF.count() === 3L)
    t.append(Seq((4L, "y")).toDF("id", "p")) // the copy is a NATIVE, writable table
    assert(t.toDF.count() === 4L)
    // the source stayed untouched and read-only
    assert(GraftTable.forPath(spark, dir).toDF.count() === 3L)
    intercept[GraftProtocolException](
      GraftTable.forPath(spark, dir).delete(col("id") === 1L))
  }

  test("foreign OPTIMIZE (dataChange=false, commitInfo-less) streams ZERO rows, not duplicates") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("delta-compat-reorg-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 3))
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(3 until 6))
    val (szC, mtC) = dataFile(dir, "part-00002-compact-c000.snappy.parquet", df(0 until 6))
    val (sz3, mt3) = dataFile(dir, "part-00003-ccc-c000.snappy.parquet", df(6 until 8))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaData(idSchema),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(3, Map("id" -> 0), Map("id" -> 2), Map("id" -> 0L)))),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(3, Map("id" -> 3), Map("id" -> 5), Map("id" -> 0L))))))
    // a compaction by some OTHER engine: NO commitInfo at all (the Delta
    // spec makes it optional) — the protocol-level reorganization signal
    // is dataChange=false on the add; the stream must skip it wholesale
    // instead of erroring (no recognizable operation name) or re-serving
    // the compacted rows as fresh appends
    commit(dir, 1, Seq(
      s"""{"add":{"path":"part-00002-compact-c000.snappy.parquet","partitionValues":{},"size":$szC,"modificationTime":$mtC,"dataChange":false,"stats":"${stats(6, Map("id" -> 0), Map("id" -> 5), Map("id" -> 0L))}"}}""",
      s"""{"remove":{"path":"part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":false}}""",
      s"""{"remove":{"path":"part-00001-bbb-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":false}}"""))
    commit(dir, 2, Seq(
      commitInfo(1619112347000L, "WRITE"),
      add("part-00003-ccc-c000.snappy.parquet", sz3, mt3,
        Some(stats(2, Map("id" -> 6), Map("id" -> 7), Map("id" -> 0L))))))
    // batch read folds the post-compaction snapshot (6 + 2 rows, once)
    assert(GraftTable.forPath(spark, dir).toDF.count() === 8L)
    // streamed tail from version 0: the reorg commit contributes NOTHING
    val out = tmpDir("delta-compat-reorg-out-")
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0").load(dir)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmpDir("delta-compat-reorg-ckpt-"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 8L),
      s"stream must serve each row exactly once across the reorg, got $got")

    // MIXED commit: new data + a reorg add in one version — only the
    // data-changing file streams (the admission counters and the planner
    // must agree, or compacted rows re-serve as appends)
    val (szM, mtM) = dataFile(dir, "part-00004-mixed-c000.snappy.parquet", df(8 until 10))
    val (szR, mtR) = dataFile(dir, "part-00005-recompact-c000.snappy.parquet", df(6 until 8))
    commit(dir, 3, Seq(
      s"""{"add":{"path":"part-00004-mixed-c000.snappy.parquet","partitionValues":{},"size":$szM,"modificationTime":$mtM,"dataChange":true,"stats":"${stats(2, Map("id" -> 8), Map("id" -> 9), Map("id" -> 0L))}"}}""",
      s"""{"add":{"path":"part-00005-recompact-c000.snappy.parquet","partitionValues":{},"size":$szR,"modificationTime":$mtR,"dataChange":false,"stats":"${stats(2, Map("id" -> 6), Map("id" -> 7), Map("id" -> 0L))}"}}""",
      s"""{"remove":{"path":"part-00003-ccc-c000.snappy.parquet","deletionTimestamp":1619112348000,"dataChange":false}}"""))
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "3").load(dir)
      .writeStream.format("memory").queryName("dc_mixed")
      .option("checkpointLocation", tmpDir("delta-compat-mixed-ckpt-"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val mixed = spark.table("dc_mixed").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(mixed === Seq(8L, 9L),
      s"mixed commit must stream only its data-changing add, got $mixed")

    // CLONE of the foreign table: the reorganization flag is commit-
    // scoped, so the clone's commit 0 (its initial data) must stream ALL
    // rows even though some source adds carried dataChange=false
    val cdest = tmpDir("delta-compat-clone-") + "/t"
    val clone = GraftTable.forPath(spark, dir).cloneTo(cdest, shallow = false)
    assert(clone.toDF.count() === 10L)
    val q3 = spark.readStream.format("graft")
      .option("startingVersion", "0").load(cdest)
      .writeStream.format("memory").queryName("dc_clone")
      .option("checkpointLocation", tmpDir("delta-compat-clone-ckpt-"))
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(60000)
    assert(spark.table("dc_clone").count() === 10L,
      "a clone's commit 0 is its initial data — the inherited reorg tag must not silence it")
  }

  test("foreign delta CDF: cdc actions (URI path, no numRecords) parse and serve the feed") {
    val dir = tmpDir("delta-compat-cdf-")
    val (sz1, mt1) = dataFile(dir, "part-00000-aaa-c000.snappy.parquet", df(0 until 4))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      metaData(idSchema, configuration = Map("delta.enableChangeDataFeed" -> "true")),
      add("part-00000-aaa-c000.snappy.parquet", sz1, mt1,
        Some(stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L))))))
    // a delta DELETE with CDF: rewrite + an AddCDCFile carrying the deltas
    val (sz2, mt2) = dataFile(dir, "part-00001-bbb-c000.snappy.parquet", df(0 until 3))
    import spark.implicits._
    val (szC, _) = dataFile(dir, "_change_data/cdc-x-c000.snappy.parquet",
      Seq((3L, "delete")).toDF("id", "_change_type"))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "DELETE"),
      add("part-00001-bbb-c000.snappy.parquet", sz2, mt2,
        Some(stats(3, Map("id" -> 0), Map("id" -> 2), Map("id" -> 0L)))),
      s"""{"remove":{"path":"part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true}}""",
      s"""{"cdc":{"path":"_change_data/cdc-x-c000.snappy.parquet","partitionValues":{},"size":$szC,"dataChange":false}}"""))
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.count() === 3L)
    val ch = t.changes(0, 1).select("id", "_change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(ch.toSeq === Seq(3L -> "delete"), s"got ${ch.toSeq}")
  }

  test("a native graft table with a column literally named dataChange stays writable") {
    import spark.implicits._
    val dir = tmpDir("graft-datachange-col-")
    val seed = Seq((1L, 10L), (2L, 20L)).toDF("id", "dataChange")
    val t = GraftTable.create(spark, dir, seed)
    // commit 0's adds carry "dataChange" inside min/max stat KEYS — a raw
    // substring probe would mistake the table for a foreign Delta log and
    // brick it read-only; the node-level probe must not
    t.append(Seq((3L, 30L)).toDF("id", "dataChange"))
    assert(t.toDF.count() === 3L)
    t.delete($"id" === 1L)
    assert(t.toDF.count() === 2L)
  }

  // partitioned schema for the CDF reconstitution tests: `lang` is a
  // partition column — absent from every data and cdc FILE, carried by the
  // actions' partitionValues (delta's layout for partitioned tables)
  private val partSchema =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"lang\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""

  /** Foreign PARTITIONED delta table with CDF: three partitions (en, fr,
    * and the null partition), a DELETE with a cdc action per touched
    * partition. Round 13 refused this table; the reader now reconstitutes
    * the partition columns from the cdc actions' partitionValues —
    * delta cdc files omit them, exactly like data files. */
  private def partitionedCdfFixture(): String = {
    import spark.implicits._
    val dir = tmpDir("delta-compat-part-cdf-")
    def ids(r: Range) = r.map(_.toLong).toDF("id")
    val (szE, mtE) = dataFile(dir, "lang=en/part-00000-aaa-c000.snappy.parquet", ids(0 until 4))
    val (szF, mtF) = dataFile(dir, "lang=fr/part-00001-bbb-c000.snappy.parquet", ids(10 until 13))
    val (szN, mtN) = dataFile(dir,
      "lang=__HIVE_DEFAULT_PARTITION__/part-00002-ccc-c000.snappy.parquet", ids(20 until 22))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      metaData(partSchema, partitionColumns = Seq("lang"),
        configuration = Map("delta.enableChangeDataFeed" -> "true")),
      s"""{"add":{"path":"lang=en/part-00000-aaa-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$szE,"modificationTime":$mtE,"dataChange":true,"stats":"${stats(4, Map("id" -> 0), Map("id" -> 3), Map("id" -> 0L))}"}}""",
      s"""{"add":{"path":"lang=fr/part-00001-bbb-c000.snappy.parquet","partitionValues":{"lang":"fr"},"size":$szF,"modificationTime":$mtF,"dataChange":true,"stats":"${stats(3, Map("id" -> 10), Map("id" -> 12), Map("id" -> 0L))}"}}""",
      s"""{"add":{"path":"lang=__HIVE_DEFAULT_PARTITION__/part-00002-ccc-c000.snappy.parquet","partitionValues":{"lang":null},"size":$szN,"modificationTime":$mtN,"dataChange":true,"stats":"${stats(2, Map("id" -> 20), Map("id" -> 21), Map("id" -> 0L))}"}}"""))
    // v1: DELETE id=3 in lang=en — rewrite + one cdc action carrying the
    // partition value on the ACTION (the cdc file has id+_change_type only)
    val (szE2, mtE2) = dataFile(dir, "lang=en/part-00003-ddd-c000.snappy.parquet", ids(0 until 3))
    val (szC1, _) = dataFile(dir, "_change_data/lang=en/cdc-aaa-c000.snappy.parquet",
      Seq((3L, "delete")).toDF("id", "_change_type"))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "DELETE"),
      s"""{"add":{"path":"lang=en/part-00003-ddd-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$szE2,"modificationTime":$mtE2,"dataChange":true,"stats":"${stats(3, Map("id" -> 0), Map("id" -> 2), Map("id" -> 0L))}"}}""",
      s"""{"remove":{"path":"lang=en/part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true,"partitionValues":{"lang":"en"}}}""",
      s"""{"cdc":{"path":"_change_data/lang=en/cdc-aaa-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$szC1,"dataChange":false}}"""))
    // v2: DELETE the whole null partition — cdc partitionValues spells
    // the null value as JSON null (delta's encoding), decoded to a NULL
    // column, never the Hive sentinel string
    val (szC2, _) = dataFile(dir, "_change_data/cdc-bbb-c000.snappy.parquet",
      Seq((20L, "delete"), (21L, "delete")).toDF("id", "_change_type"))
    commit(dir, 2, Seq(
      commitInfo(1619112347000L, "DELETE"),
      s"""{"remove":{"path":"lang=__HIVE_DEFAULT_PARTITION__/part-00002-ccc-c000.snappy.parquet","deletionTimestamp":1619112347000,"dataChange":true,"partitionValues":{"lang":null}}}""",
      s"""{"cdc":{"path":"_change_data/cdc-bbb-c000.snappy.parquet","partitionValues":{"lang":null},"size":$szC2,"dataChange":false}}"""))
    dir
  }

  test("foreign PARTITIONED delta CDF: partition columns reconstitute from cdc partitionValues") {
    val dir = partitionedCdfFixture()
    val t = GraftTable.forPath(spark, dir)
    assert(t.toDF.count() === 6L) // en 3 + fr 3 + null partition emptied
    val ch = t.changes(0, 2)
      .select("id", "lang", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    assert(ch === Set(
      (3L, "en", "delete", 1L),
      (20L, null, "delete", 2L),
      (21L, null, "delete", 2L)), s"got $ch")
  }

  test("foreign PARTITIONED delta CDF streams: cdc partitions serve values through the constant row") {
    val dir = partitionedCdfFixture()
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .load(dir)
      .writeStream.format("memory").queryName("part_cdf_stream")
      .option("checkpointLocation", tmpDir("delta-compat-part-cdf-ckpt-"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("part_cdf_stream")
      .select("id", "lang", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got === Set(
      (3L, "en", "delete", 1L),
      (20L, null, "delete", 2L),
      (21L, null, "delete", 2L)), s"got $got")
  }

  test("malformed partitioned foreign cdc (no partitionValues) refuses loudly") {
    import spark.implicits._
    val dir = tmpDir("delta-compat-bad-cdf-")
    def ids(r: Range) = r.map(_.toLong).toDF("id")
    val (szE, mtE) = dataFile(dir, "lang=en/part-00000-aaa-c000.snappy.parquet", ids(0 until 2))
    val (szC, _) = dataFile(dir, "_change_data/cdc-aaa-c000.snappy.parquet",
      Seq((0L, "delete")).toDF("id", "_change_type"))
    commit(dir, 0, Seq(
      commitInfo(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      metaData(partSchema, partitionColumns = Seq("lang"),
        configuration = Map("delta.enableChangeDataFeed" -> "true")),
      s"""{"add":{"path":"lang=en/part-00000-aaa-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$szE,"modificationTime":$mtE,"dataChange":true}}"""))
    commit(dir, 1, Seq(
      commitInfo(1619112346000L, "DELETE"),
      s"""{"remove":{"path":"lang=en/part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true}}""",
      s"""{"cdc":{"path":"_change_data/cdc-aaa-c000.snappy.parquet","partitionValues":{},"size":$szC,"dataChange":false}}"""))
    val t = GraftTable.forPath(spark, dir)
    val e = intercept[GraftProtocolException](t.changes(0, 1).collect())
    assert(e.getMessage.contains("partitionValues"))
  }
}
