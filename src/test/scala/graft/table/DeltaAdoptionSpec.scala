package graft.table

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** IN-PLACE adoption of a foreign delta-spark table (zero-copy migration):
  * `GraftTable.adoptDelta` commits ownership markers as the log's next
  * version instead of copying 100 TB through `import_delta`. These tests
  * pin (a) adoption unlocks graft DML/maintenance while the CONTINUED log
  * stays replayable by an independent delta-1.0 fold, (b) every refusal
  * gate (protocols graft cannot continue), (c) delta-config translation
  * into the keys graft enforcement reads, and (d) ownership reverts to
  * read-only foreign if a foreign engine writes past the adoption. */
class DeltaAdoptionSpec extends SparkTestBase {
  private val mapper = new ObjectMapper()

  // ---- foreign-log fixture plumbing (DeltaCompatSpec shapes) ----------------

  private def dataFile(tablePath: String, relPath: String,
      df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val stage = tmpDir("adopt-stage-")
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

  private val idSchema =
    """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""

  private def metaLine(configuration: Map[String, String] = Map.empty,
      schema: String = idSchema): String = {
    val conf = configuration.map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    s"""{"metaData":{"id":"aaaa-adopt-1111","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":$conf,"createdTime":1619112344000}}"""
  }

  private def addLine(path: String, size: Long, mtime: Long, rows: Long): String =
    s"""{"add":{"path":"$path","partitionValues":{},"size":$size,"modificationTime":$mtime,"dataChange":true,"stats":"{\\"numRecords\\":$rows,\\"minValues\\":{},\\"maxValues\\":{},\\"nullCount\\":{}}"}}"""

  private def infoLine(ts: Long, op: String): String =
    s"""{"commitInfo":{"timestamp":$ts,"operation":"$op","operationParameters":{},"isBlindAppend":true,"operationMetrics":{}}}"""

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, s"row$i")).toDF("id", "s")
  }

  /** A plain 2-commit foreign delta table over `0 until 8`: commit 0 adds
    * two files, commit 1 deletes the high file the delta way. Live rows
    * after the fixture: 0..3. */
  private def foreignTable(configuration: Map[String, String] = Map.empty,
      protocolLine: String =
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      schema: String = idSchema): String = {
    val dir = tmpDir("adopt-foreign-")
    val (s1, m1) = dataFile(dir, "part-00000-lo-c000.snappy.parquet", df(0 until 4))
    val (s2, m2) = dataFile(dir, "part-00001-hi-c000.snappy.parquet", df(4 until 8))
    commit(dir, 0, Seq(infoLine(1619112345000L, "WRITE"), protocolLine,
      metaLine(configuration, schema),
      addLine("part-00000-lo-c000.snappy.parquet", s1, m1, 4L),
      addLine("part-00001-hi-c000.snappy.parquet", s2, m2, 4L)))
    commit(dir, 1, Seq(infoLine(1619112346000L, "DELETE"),
      s"""{"remove":{"path":"part-00001-hi-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true}}"""))
    dir
  }

  /** Independent delta-1.0 replay (protocol-spec semantics, no graft code
    * in the fold): live relative file paths, last-writer-wins. */
  private def deltaReplayLiveFiles(dir: String): Set[String] = {
    val logDir = Paths.get(dir, "_delta_log")
    val live = scala.collection.mutable.LinkedHashMap[String, Boolean]()
    def decode(p: String): String = new java.net.URI(p).getPath
    val versions = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
    versions.foreach { v =>
      Files.readAllLines(logDir.resolve(f"$v%020d.json")).asScala
        .filter(_.nonEmpty).foreach { l =>
          val root = mapper.readTree(l)
          if (root.has("add")) live(decode(root.get("add").get("path").asText())) = true
          if (root.has("remove")) live.remove(decode(root.get("remove").get("path").asText()))
        }
    }
    live.keys.toSet
  }

  private def ids(t: GraftTable): Set[Long] =
    t.toDF.select("id").collect().map(_.getLong(0)).toSet

  // ---------------------------------------------------------------------------

  test("adopt, then graft DML on the foreign files; the continued log stays delta-replayable") {
    val dir = foreignTable()
    // pre-adoption: reads fine, writes refuse with the adoption hint
    val before = GraftTable.forPath(spark, dir)
    assert(ids(before) === Set(0L, 1L, 2L, 3L))
    val refusal = intercept[GraftProtocolException](before.delete(col("id") === 0L))
    assert(refusal.getMessage.contains("adopt_delta"),
      s"the refusal must point at the zero-copy path: ${refusal.getMessage}")

    val t = GraftTable.adoptDelta(spark, dir)
    // the adopting commit: delta-shaped, ownership-marked, metadata-only
    val adoptLines = Files.readAllLines(
      Paths.get(dir, "_delta_log", f"${2L}%020d.json")).asScala
    assert(adoptLines.exists(Actions.hasGraftWriterMarker),
      "the adopting commit must carry the graft ownership marker")
    assert(!adoptLines.exists(_.contains("\"add\"")),
      "adoption is metadata-only — no data file moves")
    assert(ids(t) === Set(0L, 1L, 2L, 3L), "adoption must not change content")

    // graft DML now works against the adopted files
    t.append(df(100 until 103))
    assert(t.delete(col("id") === 1L) === 1L)
    t.merge(df(102 until 105), "t.id = s.id")
      .whenMatchedUpdate(Map("s" -> "s.s"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "s" -> "s.s"))
      .execute()
    assert(ids(t) === Set(0L, 2L, 3L, 100L, 101L, 102L, 103L, 104L))

    // the whole continued log — foreign prefix AND graft continuation —
    // replays under an independent delta-1.0 fold to the same live set
    val replayed = deltaReplayLiveFiles(dir)
    assert(replayed === t.snapshot.files.map(_.path).toSet,
      s"delta replay $replayed must equal graft's live set")
    assert(spark.read.parquet(replayed.map(p => s"$dir/$p").toSeq: _*)
      .select("id").collect().map(_.getLong(0)).toSet ===
      Set(0L, 2L, 3L, 100L, 101L, 102L, 103L, 104L))

    // maintenance unlocks too (both refused pre-adoption)
    t.log.writeCheckpoint(t.latestVersion)
    t.setProperty("vacuum.retentionDurationCheck", "false")
    t.vacuum(retainVersions = 100, retentionMs = 0L)

    // a FRESH instance (new probe) also sees graft ownership
    val fresh = GraftTable.forPath(spark, dir)
    fresh.append(df(200 until 201))
    assert(ids(fresh).contains(200L))
    // time travel below the adoption still serves the foreign history
    assert(fresh.versionAsOf(0).count() === 8L)
    assert(fresh.versionAsOf(1).count() === 4L)
  }

  test("delta table configuration translates to the keys graft enforces") {
    val dir = foreignTable(configuration = Map(
      "delta.appendOnly" -> "true",
      "delta.dataSkippingNumIndexedCols" -> "7",
      "delta.checkpointInterval" -> "25"))
    val t = GraftTable.adoptDelta(spark, dir)
    val props = t.snapshot.metaData.properties
    assert(props.get("appendOnly").contains("true"))
    assert(props.get("dataSkipping.numIndexedCols").contains("7"))
    assert(props.get("delta.checkpointInterval").contains("25"),
      "unknown delta keys ride along untouched")
    assert(!props.contains(Actions.DeltaReadMarker),
      "the foreign-provenance marker must not survive adoption")
    // the translated key ENFORCES: appendOnly refuses the delete
    intercept[Exception](t.delete(col("id") === 0L))
    t.append(df(50 until 51)) // appends stay legal
    assert(ids(t).contains(50L))
  }

  test("refusal gates: protocols and features graft cannot continue") {
    def adoptFails(dir: String, needle: String): Unit = {
      val e = intercept[GraftProtocolException](GraftTable.adoptDelta(spark, dir))
      assert(e.getMessage.contains(needle) &&
        e.getMessage.contains("import_delta"),
        s"expected '$needle' + copy fallback, got: ${e.getMessage}")
    }
    // ID-mode column mapping: graft writes no parquet field ids, so an
    // id-resolving reader could never bind post-adoption files' columns
    // (NAME mode is continuable since round 15 — dedicated test below)
    adoptFails(foreignTable(configuration = Map(
      "delta.columnMapping.mode" -> "id",
      "delta.columnMapping.maxColumnId" -> "2")), "column mapping")
    // legacy reader 2 / writer 5 declaring mapping WITHOUT a stated mode
    adoptFails(foreignTable(protocolLine =
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""),
      "reader version 2")
    // v7 writer feature graft cannot maintain
    adoptFails(foreignTable(protocolLine =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking"]}}"""),
      "rowTracking")
    // v3 reader feature with no continuable semantics (rowTracking READS
    // fine — foreign ids are ignorable — but graft will not maintain
    // delta-spelled row ids on its own commits)
    adoptFails(foreignTable(protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["rowTracking"],"writerFeatures":["rowTracking"]}}"""),
      "rowTracking")
    // delta-spelled generated column (legacy writer 4 admits them silently)
    val genSchema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"delta.generationExpression\":\"CAST(id AS STRING)\"}}]}"""
    adoptFails(foreignTable(protocolLine =
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      schema = genSchema), "generated columns")
    // a graft-owned table has nothing to adopt
    val own = tmpDir("adopt-own-")
    GraftTable.create(spark, own, df(0 until 3))
    val e = intercept[GraftProtocolException](GraftTable.adoptDelta(spark, own))
    assert(e.getMessage.contains("nothing to adopt"))
  }

  test("allowed protocols adopt: writer-7 feature subset, DV-capable reader") {
    val dir = foreignTable(protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors","appendOnly","invariants"]}}""",
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val t = GraftTable.adoptDelta(spark, dir)
    assert(t.snapshot.metaData.properties.get("deletionVectors.enabled")
      .contains("true"))
    assert(t.snapshot.protocol.minReaderVersion === 3)
    assert(t.snapshot.protocol.readerFeatures.contains("deletionVectors"))
    // merge-on-read DML on the adopted table writes DELTA-format DVs
    // (compat is on), so the continued log keeps its reader guarantee
    assert(t.delete(col("id") === 2L) === 1L)
    assert(ids(t) === Set(0L, 1L, 3L))
    val lastLines = Files.readAllLines(Paths.get(dir, "_delta_log",
      f"${t.latestVersion}%020d.json")).asScala
    assert(lastLines.exists(_.contains("deletionVector")),
      "the adopted DV delete must carry a delta deletionVector descriptor")
  }

  test("a foreign write past the adoption flips the table back to read-only") {
    val dir = foreignTable()
    val t = GraftTable.adoptDelta(spark, dir)
    t.append(df(10 until 12))
    // a foreign engine (no markers) commits the next version directly
    val (s3, m3) = dataFile(dir, "part-00009-foreign-c000.snappy.parquet", df(90 until 92))
    commit(dir, t.latestVersion + 1, Seq(infoLine(1619112399000L, "WRITE"),
      addLine("part-00009-foreign-c000.snappy.parquet", s3, m3, 2L)))
    val fresh = GraftTable.forPath(spark, dir)
    assert(ids(fresh).contains(90L), "the foreign tail still READS")
    val e = intercept[GraftProtocolException](fresh.delete(col("id") === 0L))
    assert(e.getMessage.contains("adopt_delta"),
      "contested ownership must revert to read-only foreign (re-adopt to reclaim)")
    // re-adoption reclaims
    val again = GraftTable.adoptDelta(spark, dir)
    again.append(df(300 until 301))
    assert(ids(again).contains(300L))
  }

  test("a LONG-LIVED adopted handle detects a foreign write too (no stale ownership cache)") {
    val dir = foreignTable()
    val t = GraftTable.adoptDelta(spark, dir)
    t.append(df(10 until 12)) // warm the ownership cache on THIS handle
    assert(ids(t).contains(10L))
    // a foreign engine commits past the adoption while the handle lives
    val (s3, m3) = dataFile(dir, "part-00010-foreign-c000.snappy.parquet", df(95 until 97))
    commit(dir, t.latestVersion + 1, Seq(infoLine(1619112400000L, "WRITE"),
      addLine("part-00010-foreign-c000.snappy.parquet", s3, m3, 2L)))
    // the SAME handle must refuse its next write — a memoized "owned"
    // answer here would interleave graft commits with the contesting
    // engine's, the exact dual-writer state the flip exists to prevent
    val e = intercept[GraftProtocolException](t.append(df(500 until 501)))
    assert(e.getMessage.contains("adopt_delta"),
      s"stale ownership cache: the live handle wrote past a foreign commit ($e)")
  }

  test("adopt a PARTITIONED foreign table with CDF: the feed continues across the ownership boundary") {
    import spark.implicits._
    // foreign partitioned delta table, CDF on: one file per lang, plus a
    // foreign DELETE with a partition-carrying AddCDCFile (round-14 read)
    val dir = tmpDir("adopt-part-cdf-")
    val partSchema =
      """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"lang\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    def ids(r: Range) = r.map(_.toLong).toDF("id")
    val (sE, mE) = dataFile(dir, "lang=en/part-00000-aaa-c000.snappy.parquet", ids(0 until 4))
    val (sF, mF) = dataFile(dir, "lang=fr/part-00001-bbb-c000.snappy.parquet", ids(10 until 13))
    commit(dir, 0, Seq(infoLine(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      s"""{"metaData":{"id":"aaaa-adopt-2222","format":{"provider":"parquet","options":{}},"schemaString":"$partSchema","partitionColumns":["lang"],"configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":1619112344000}}""",
      s"""{"add":{"path":"lang=en/part-00000-aaa-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$sE,"modificationTime":$mE,"dataChange":true}}""",
      s"""{"add":{"path":"lang=fr/part-00001-bbb-c000.snappy.parquet","partitionValues":{"lang":"fr"},"size":$sF,"modificationTime":$mF,"dataChange":true}}"""))
    val (sE2, mE2) = dataFile(dir, "lang=en/part-00002-ccc-c000.snappy.parquet", ids(0 until 3))
    val (sC, _) = dataFile(dir, "_change_data/lang=en/cdc-aaa-c000.snappy.parquet",
      Seq((3L, "delete")).toDF("id", "_change_type"))
    commit(dir, 1, Seq(infoLine(1619112346000L, "DELETE"),
      s"""{"add":{"path":"lang=en/part-00002-ccc-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$sE2,"modificationTime":$mE2,"dataChange":true}}""",
      s"""{"remove":{"path":"lang=en/part-00000-aaa-c000.snappy.parquet","deletionTimestamp":1619112346000,"dataChange":true,"partitionValues":{"lang":"en"}}}""",
      s"""{"cdc":{"path":"_change_data/lang=en/cdc-aaa-c000.snappy.parquet","partitionValues":{"lang":"en"},"size":$sC,"dataChange":false}}"""))
    // adopt (partitioned + CDF is compat-legal since round 14) and run
    // graft DML — its cdc sidecars land delta-shaped on a partitioned
    // compat table (values on the action, columns omitted from the file)
    val t = GraftTable.adoptDelta(spark, dir)
    t.delete($"id" === 11L) // lang=fr
    val adoptedHead = t.latestVersion
    val cdcLine = Files.readAllLines(
      Paths.get(dir, "_delta_log", f"$adoptedHead%020d.json")).asScala
      .find(_.contains("\"cdc\"")).get
    val cdcNode = mapper.readTree(cdcLine).get("cdc")
    assert(cdcNode.get("partitionValues").get("lang").asText() === "fr",
      s"graft's compat cdc action must carry the partition value: $cdcLine")
    // ONE feed across the boundary: foreign commit 1 + graft DML commit
    val ch = t.changes(0, adoptedHead)
      .filter($"_change_type" === "delete")
      .select("id", "lang", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ch === Set((3L, "en", 1L), (11L, "fr", adoptedHead)),
      s"the change feed must span foreign and graft eras, got $ch")
    assert(t.toDF.count() === 5L) // en 3 + fr 2
  }

  test("modern delta-spark defaults adopt: vacuumProtocolCheck + v2Checkpoint + timestampNtz continue") {
    // current delta-spark stamps exactly this trio on FRESH tables — the
    // round-14 allowlist refused them, routing the most common real
    // tables through the 100-TB copy; each is continuable: graft's vacuum
    // honors protocol gating, classic checkpoints stay legal on a
    // v2Checkpoint table, and NTZ is a native graft type since round 15
    val dir = foreignTable(protocolLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz","v2Checkpoint","vacuumProtocolCheck"],"writerFeatures":["timestampNtz","v2Checkpoint","vacuumProtocolCheck","appendOnly","invariants"]}}""")
    val t = GraftTable.adoptDelta(spark, dir)
    // the continued protocol RETAINS the trio: dropping them would
    // invalidate state existing delta readers already gate on
    val p = t.snapshot.protocol
    for (f <- Seq("timestampNtz", "v2Checkpoint", "vacuumProtocolCheck")) {
      assert(p.readerFeatures.contains(f), s"reader feature $f must continue")
      assert(p.writerFeatures.contains(f), s"writer feature $f must continue")
    }
    assert(p.minReaderVersion === 3 && p.minWriterVersion === 7)
    // DML + maintenance on the adopted table
    assert(t.delete(col("id") === 1L) === 1L)
    t.append(df(70 until 72))
    assert(ids(t) === Set(0L, 2L, 3L, 70L, 71L))
    t.log.writeCheckpoint(t.latestVersion) // classic checkpoint stays legal
    t.setProperty("vacuum.retentionDurationCheck", "false")
    t.vacuum(retainVersions = 100, retentionMs = 0L)
    // independent delta-1.0 replay of the continued log equals graft
    assert(deltaReplayLiveFiles(dir) === t.snapshot.files.map(_.path).toSet)
  }

  test("NAME-mode mapped foreign table adopts: rename + DML continue in delta spelling") {
    import spark.implicits._
    val dir = tmpDir("adopt-mapped-")
    // physical parquet columns col-1/col-2 bound to logical id/s
    val (s1, m1) = dataFile(dir, "part-00000-m-c000.snappy.parquet",
      df(0 until 4).select($"id".as("col-1"), $"s".as("col-2")))
    val mappedSchema = org.apache.spark.sql.types.StructType(Seq(
      field("id", "col-1", 1L, org.apache.spark.sql.types.LongType),
      field("s", "col-2", 2L, org.apache.spark.sql.types.StringType)))
    commit(dir, 0, Seq(infoLine(1619112345000L, "WRITE"),
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"bbbb-adopt-2222","format":{"provider":"parquet","options":{}},"schemaString":${mapper.writeValueAsString(mappedSchema.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"},"createdTime":1619112344000}}""",
      addLine("part-00000-m-c000.snappy.parquet", s1, m1, 4L)))
    val t = GraftTable.adoptDelta(spark, dir)
    assert(t.toDF.columns.toSeq === Seq("id", "s"))
    // RENAME — the schema change adoption existed to keep — then DML
    t.renameColumn("s", "label")
    t.append(df(90 until 92).withColumnRenamed("s", "label"))
    assert(t.toDF.filter($"label" === "row90").count() === 1L)
    assert(ids(t) === Set(0L, 1L, 2L, 3L, 90L, 91L))
    // the rename commit stays delta-shaped: metaData carries the standard
    // mapping spelling (mode + per-field physicalName/id), and the new
    // logical name binds the ORIGINAL physical column
    val metaJson = (t.latestVersion to 1L by -1L).iterator
      .flatMap(v => Files.readAllLines(
        Paths.get(dir, "_delta_log", f"$v%020d.json")).asScala)
      .find(_.contains("\"metaData\"")).get
    val mNode = mapper.readTree(metaJson).get("metaData")
    assert(mNode.get("configuration").get("delta.columnMapping.mode")
      .asText() === "name")
    val emitted = org.apache.spark.sql.types.DataType
      .fromJson(mNode.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val lbl = emitted.fields.find(_.name == "label").get
    assert(lbl.metadata.getString("delta.columnMapping.physicalName") === "col-2")
    assert(lbl.metadata.getLong("delta.columnMapping.id") === 2L)
    // independent delta-1.0 replay equality over the continued log
    assert(deltaReplayLiveFiles(dir) === t.snapshot.files.map(_.path).toSet)
  }

  private def field(logical: String, physical: String, id: Long,
      dt: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.types.StructField(logical, dt, nullable = true,
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .putString("delta.columnMapping.physicalName", physical)
        .putLong("delta.columnMapping.id", id).build())

  test("CHECKPOINT-ONLY v2 foreign log adopts: zero JSON commits, the v2 manifest is the seed") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the delta-3.x metadata-cleanup shape: every JSON commit deleted,
    // a v2 UUID manifest + _sidecars/ is the ONLY replay seed — exactly
    // what a long-lived production table looks like when adopted
    val dir = tmpDir("adopt-v2cp-")
    val (s1, m1) = dataFile(dir, "part-00000-v2-c000.snappy.parquet", df(0 until 4))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val sidecarSchema = StructType(Seq(StructField("add", addType)))
    val stage = tmpDir("adopt-v2cp-stage-")
    spark.createDataFrame(java.util.Arrays.asList(
      Row(Row("part-00000-v2-c000.snappy.parquet", Map.empty[String, String], s1, m1, false))),
      sidecarSchema).coalesce(1).write.mode("overwrite").parquet(stage)
    val scPart = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(dir, "_delta_log", "_sidecars"))
    Files.move(Paths.get(scPart),
      Paths.get(dir, "_delta_log", "_sidecars", "sc-v2a.parquet"))
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
    // one ACTION per row, as real delta checkpoints lay out
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(
      Row("v2cp-adopt-1", Row("parquet"), plainSchema, Seq.empty[String],
        Map.empty[String, String], 1619112344000L),
      null, null, null))
    rows.add(Row(null,
      Row(3, 7, Seq("v2Checkpoint", "vacuumProtocolCheck"),
        Seq("v2Checkpoint", "vacuumProtocolCheck")), null, null))
    rows.add(Row(null, null, Row(3L), null))
    rows.add(Row(null, null, null, Row("sc-v2a.parquet", 1024L)))
    val stage2 = tmpDir("adopt-v2cp-man-")
    spark.createDataFrame(rows, manifestSchema)
      .coalesce(1).write.mode("overwrite").parquet(stage2)
    val manPart = Files.list(Paths.get(stage2)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(manPart), Paths.get(dir, "_delta_log",
      "00000000000000000003.checkpoint.9a7b55ae-0001.parquet"))
    Files.write(Paths.get(dir, "_delta_log", "_last_checkpoint"),
      """{"version":3}""".getBytes("UTF-8"))
    // zero JSON commits exist — reads fold from the manifest alone
    assert(ids(GraftTable.forPath(spark, dir)) === Set(0L, 1L, 2L, 3L))
    // adoption continues the log at v4 and unlocks DML
    val t = GraftTable.adoptDelta(spark, dir)
    assert(t.latestVersion === 4L, "adoption commits the checkpoint version + 1")
    val p = t.snapshot.protocol
    assert(p.readerFeatures.contains("v2Checkpoint") &&
      p.writerFeatures.contains("vacuumProtocolCheck"),
      s"the continued protocol must retain the adopted features: $p")
    assert(t.delete(col("id") === 1L) === 1L)
    t.append(df(80 until 82))
    assert(ids(t) === Set(0L, 2L, 3L, 80L, 81L))
    // independent fold: v2 sidecar adds seeded, then the graft-authored
    // delta-shaped JSON tail replayed last-writer-wins
    val live = scala.collection.mutable.LinkedHashMap[String, Boolean]()
    spark.read.parquet(Paths.get(dir, "_delta_log", "_sidecars").toString)
      .select("add.path").collect()
      .foreach(r => if (!r.isNullAt(0)) live(r.getString(0)) = true)
    Files.list(Paths.get(dir, "_delta_log")).toArray.map(_.toString)
      .filter(_.matches(".*\\d{20}\\.json$")).sorted
      .foreach { f =>
        Files.readAllLines(Paths.get(f)).forEach { l =>
          if (l.nonEmpty) {
            val n = mapper.readTree(l)
            if (n.has("add"))
              live(new java.net.URI(n.get("add").get("path").asText()).getPath) = true
            if (n.has("remove"))
              live.remove(new java.net.URI(n.get("remove").get("path").asText()).getPath)
          }
        }
      }
    assert(live.keys.toSet === t.snapshot.files.map(_.path).toSet,
      "checkpoint-seed + continued-tail replay must equal graft's live set")
  }

  test("adopt_delta procedure: one CALL, ownership taken, result row reports it") {
    val dir = foreignTable()
    graft.sources.GraftCatalog.register(spark, tmpDir("adopt-wh-"), name = "adpt")
    val rows = spark.sql(
      s"CALL adpt.system.adopt_delta(path => '$dir')").collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(0) === 2L, "adopted_version = foreign head + 1")
    assert(rows(0).getLong(1) === 1L, "one live file after the foreign delete")
    val t = GraftTable.forPath(spark, dir)
    t.append(df(40 until 42))
    assert(ids(t) === Set(0L, 1L, 2L, 3L, 40L, 41L))
  }
}
