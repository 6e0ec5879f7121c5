package graft.table

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 soundness hardening:
  *   - numeric-overflow casts RAISE instead of wrapping (non-ANSI `Cast`
  *     stores 44 when 300 is written to a tinyint; `try_cast` in the
  *     write projection surfaces overflow as null → raise);
  *   - `convert()`-imported parquet with MILLIS/NANOS timestamp columns
  *     records micros-normalized footer stats (raw storage-unit stats
  *     would let DataSkipping unsoundly prune matching files and
  *     MetadataOnlyCount serve 1000×-off MIN/MAX);
  *   - vacuum clamps its retained-version range to the log's retention
  *     floor after `cleanupExpiredLogs` pruned history;
  *   - a corrupt `_log_start` pointer recovers the true floor from the
  *     commit files instead of probing deleted version 0;
  *   - staged CTAS/RTAS writes funnel through the same guarded
  *     projection + CHECK enforcement as every other write path.
  */
class SoundnessR11Spec extends SparkTestBase {
  import spark.implicits._

  private def raisedMessages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ raisedMessages(t.getCause)

  // ---- overflow guard -------------------------------------------------

  test("append raises on numeric overflow instead of wrapping (int -> tinyint)") {
    val schema = StructType(Seq(StructField("b", ByteType, nullable = true)))
    val seed = spark.createDataFrame(
      java.util.List.of(Row(java.lang.Byte.valueOf(1: Byte))), schema)
    val t = GraftTable.create(spark, tmpDir("ovf-"), seed)
    val v0 = t.latestVersion
    val bad = Seq(300).toDF("b") // legacy cast would store 44 silently
    val ex = intercept[Exception](t.append(bad))
    assert(raisedMessages(ex).exists(_.contains("not castable")),
      s"expected a cast raise, got: ${raisedMessages(ex).mkString(" | ")}")
    assert(t.latestVersion == v0)
    assert(t.toDF.as[Byte].collect().toSeq == Seq(1: Byte))
  }

  test("append raises on long -> int truncation; in-range long still writes") {
    val schema = StructType(Seq(StructField("i", IntegerType, nullable = true)))
    val seed = spark.createDataFrame(
      java.util.List.of(Row(Integer.valueOf(7))), schema)
    val t = GraftTable.create(spark, tmpDir("ovf64-"), seed)
    intercept[Exception](t.append(Seq(1L << 40).toDF("i")))
    t.append(Seq(123L).toDF("i")) // widening value in range: fine
    assert(t.toDF.as[Int].collect().sorted.toSeq == Seq(7, 123))
  }

  test("legal lossy casts still pass: fractional truncation is ANSI-sanctioned") {
    val schema = StructType(Seq(StructField("i", IntegerType, nullable = true)))
    val seed = spark.createDataFrame(
      java.util.List.of(Row(Integer.valueOf(0))), schema)
    val t = GraftTable.create(spark, tmpDir("frac-"), seed)
    t.append(Seq(3.7d).toDF("i")) // CAST(3.7 AS INT) = 3 under ANSI
    assert(t.toDF.as[Int].collect().sorted.toSeq == Seq(0, 3))
  }

  // ---- foreign timestamp stats ----------------------------------------

  test("convert() normalizes MILLIS footer stats to micros; skipping stays sound") {
    val dir = tmpDir("millis-")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        (2L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
        .toDF("id", "ts").coalesce(1).write.mode("overwrite").parquet(dir)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val t = GraftTable.convert(spark, dir)
    val f = t.snapshot.files.head
    // stats must be MICROS despite millis storage: 2024-06-01T00:00:00Z
    val expectMax = java.time.Instant.parse("2024-06-01T00:00:00Z")
      .toEpochMilli * 1000L
    assert(f.maxValues.get("ts").contains(expectMax.toString),
      s"expected micros-normalized max $expectMax, got ${f.maxValues.get("ts")}")
    // and a predicate matching the real data must NOT prune the file
    val hits = t.toDF.filter(col("ts") === lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))).count()
    assert(hits == 1L)
  }

  test("convert() keeps identity-normalized stats for MICROS foreign files") {
    val dir = tmpDir("nanosrc-")
    // Spark cannot write NANOS parquet; exercise the normalization unit
    // through a MICROS file (identity) to pin the plumbing end-to-end.
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      Seq((1L, java.sql.Timestamp.valueOf("2030-01-02 03:04:05")))
        .toDF("id", "ts").coalesce(1).write.mode("overwrite").parquet(dir)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val t = GraftTable.convert(spark, dir)
    val f = t.snapshot.files.head
    val expect = java.time.Instant.parse("2030-01-02T03:04:05Z").toEpochMilli * 1000L
    assert(f.maxValues.get("ts").contains(expect.toString))
  }

  // ---- retention-boundary vacuum + corrupt _log_start ------------------

  test("vacuum with retainVersions spanning a pruned log boundary clamps, not aborts") {
    val dir = tmpDir("vacclamp-")
    val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"))
    (2 to 12).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    // versions 0..11 — the automatic checkpoint at 10 lets cleanup prune
    t.cleanupExpiredLogs(retentionMs = 0)
    val floor = new GraftLog(dir).earliestVersion
    assert(floor > 0, "cleanup must have pruned something for this test to bite")
    // retainVersions far beyond the remaining history: would previously
    // call snapshotAt(latest - retain) on a deleted version and abort
    val dry = t.vacuumDryRun(retainVersions = 1000)
    assert(dry.isEmpty, "every file is referenced by the retained range")
    assert(t.vacuum(retainVersions = 1000) == 0)
    assert(t.toDF.count() == 12)
  }

  test("corrupt _log_start recovers the floor from commit files") {
    val dir = tmpDir("logstart-")
    val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"))
    (2 to 12).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    t.cleanupExpiredLogs(retentionMs = 0)
    val log = new GraftLog(dir)
    val floor = log.earliestVersion
    assert(floor > 0)
    Files.write(Paths.get(dir, "_delta_log", "_log_start"),
      "not-a-number".getBytes(StandardCharsets.UTF_8))
    val log2 = new GraftLog(dir)
    assert(log2.earliestVersion == floor,
      "corrupt pointer must recover the true floor by listing, not assume 0")
    assert(log2.exists, "an intact cleaned table must remain readable")
    val t2 = GraftTable.forPath(spark, dir)
    assert(t2.toDF.count() == 12)
  }

  // ---- staged CTAS/RTAS write invariants --------------------------------

  private lazy val wh = tmpDir("r11-wh-")
  private lazy val registered: Unit =
    graft.sources.GraftCatalog.register(spark, wh, name = "r11cat")

  test("CTAS with a violated CHECK constraint fails and creates nothing") {
    registered
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE r11cat.default.ctaschk USING graft " +
        "TBLPROPERTIES ('constraint.pos' = 'x > 0') " +
        "AS SELECT -1 AS x")
    }
    assert(raisedMessages(ex).exists(_.contains("CHECK constraint")),
      s"expected CHECK raise, got: ${raisedMessages(ex).mkString(" | ")}")
    assert(!Files.exists(Paths.get(wh, "default", "ctaschk", "_delta_log")),
      "a failed staged CTAS must not leave a table behind")
  }

  test("CTAS constraint lands in metaData.constraints and gates later writes") {
    registered
    spark.sql("CREATE TABLE r11cat.default.ctasok USING graft " +
      "TBLPROPERTIES ('constraint.pos' = 'x > 0') " +
      "AS SELECT 5 AS x")
    val t = GraftTable.forPath(spark, s"$wh/default/ctasok")
    assert(t.snapshot.metaData.constraints == Map("pos" -> "x > 0"),
      "constraint.* props must become real constraints, not dead properties")
    assert(!t.snapshot.metaData.properties.contains("constraint.pos"))
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO r11cat.default.ctasok VALUES (-3)")
    }
    assert(raisedMessages(ex).exists(_.contains("CHECK constraint")))
    assert(spark.table("r11cat.default.ctasok").count() == 1)
  }

  test("RTAS carries constraints through the replace commit") {
    registered
    spark.sql("CREATE TABLE r11cat.default.rtaschk (id INT) USING graft")
    spark.sql("INSERT INTO r11cat.default.rtaschk VALUES (1)")
    spark.sql("REPLACE TABLE r11cat.default.rtaschk USING graft " +
      "TBLPROPERTIES ('constraint.big' = 'y >= 100') " +
      "AS SELECT 100 AS y")
    val t = GraftTable.forPath(spark, s"$wh/default/rtaschk")
    assert(t.snapshot.metaData.constraints == Map("big" -> "y >= 100"))
    intercept[Exception] {
      spark.sql("INSERT INTO r11cat.default.rtaschk VALUES (5)")
    }
  }

  test("guardedProjection (the staged write seam) raises on overflow too") {
    val schema = StructType(Seq(StructField("b", ByteType, nullable = true)))
    val df = Seq(300).toDF("b")
    val guarded = GraftTable.guardedProjection(df, schema)
    val ex = intercept[Exception](guarded.collect())
    assert(raisedMessages(ex).exists(_.contains("not castable")))
  }

  test("large writes distribute their footer harvest (301-file create)") {
    val t = GraftTable.create(spark, tmpDir("wrbig-"),
      spark.range(3010).selectExpr("id", "id * 3 as w").repartition(301))
    assert(t.snapshot.files.size >= 257, "need the distributed harvest branch")
    assert(t.toDF.count() == 3010)
    assert(t.snapshot.files.forall(f =>
      f.numRecords > 0 && f.minValues.contains("id") && f.nullCounts.contains("id")))
  }

  test("convert distributes the footer harvest beyond the small-table threshold") {
    val dir = tmpDir("convbig-")
    // 300 files crosses the 256-file threshold → the executor-job branch
    spark.range(3000).selectExpr("id", "id * 2 as v").repartition(300)
      .write.mode("overwrite").parquet(dir)
    val t = GraftTable.convert(spark, dir)
    assert(t.snapshot.files.size >= 257, "need the distributed branch")
    assert(t.toDF.count() == 3000)
    // every file harvested full stats through the job
    assert(t.snapshot.files.forall(f =>
      f.numRecords > 0 && f.minValues.contains("id") && f.nullCounts.contains("id")))
    // and skipping works off those stats immediately
    assert(t.prunedFiles(t.snapshot, org.apache.spark.sql.functions.col("id") === 7L)
      .size < t.snapshot.files.size)
  }
}
