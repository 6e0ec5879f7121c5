package graft.table

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Metadata cleanup (`cleanupExpiredLogs`): the log must not grow one file
  * per write forever. Pruning keeps every version from the boundary
  * checkpoint forward fully readable (snapshot, time travel, history,
  * timestamp resolution) and kills older time travel — the same retention
  * trade VACUUM makes for data files. */
class LogRetentionSpec extends SparkTestBase {
  import spark.implicits._

  private def build(n: Int): GraftTable = {
    val t = GraftTable.create(spark, tmpDir("logret-"),
      Seq((0, "seed")).toDF("id", "v"))
    (1 to n).foreach(i => t.append(Seq((i, s"row$i")).toDF("id", "v")))
    t
  }

  test("prunes to the newest in-retention checkpoint; everything after still works") {
    val t = build(25) // versions 0..25, checkpoints at 10 and 20
    val removed = t.cleanupExpiredLogs(retentionMs = 0)
    assert(removed > 0)
    assert(t.log.earliestVersion == 20)
    (0L until 20L).foreach(v =>
      assert(!Files.exists(t.log.versionFile(v)), s"commit $v must be pruned"))
    // fresh reader: head fold, tail time travel, history, ts search all live
    val fresh = GraftTable.forPath(spark, t.path)
    assert(fresh.toDF.count() == 26)
    assert(fresh.versionAsOf(22).count() == 23)
    assert(fresh.versionAsOf(20).count() == 21)
    assert(fresh.history().count() == 6) // 20..25
    // pruned versions are gone, loudly
    intercept[Exception](fresh.versionAsOf(5).collect())
    // and the table still writes + reads normally afterwards
    fresh.append(Seq((99, "after")).toDF("id", "v"))
    assert(fresh.toDF.count() == 27)
  }

  test("no checkpoint inside retention -> nothing pruned") {
    val t = build(5) // only commits 0..5, no checkpoint yet
    assert(t.cleanupExpiredLogs(retentionMs = 0) == 0)
    assert(t.log.earliestVersion == 0)
    assert(t.versionAsOf(0).count() == 1)
  }

  test("retention window keeps recent history") {
    val t = build(25)
    // everything is younger than an hour — nothing may be pruned
    assert(t.cleanupExpiredLogs(retentionMs = 3600L * 1000) == 0)
    assert(t.versionAsOf(0).count() == 1)
  }

  test("CALL graft.system.cleanup_logs prunes through SQL") {
    val t = build(25)
    val cat = "lrcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("lr-wh-"))
    try {
      val r = spark.sql(
        s"CALL $cat.system.cleanup_logs(`table` => '${t.path}', retention_ms => 0)").head()
      assert(r.getLong(0) > 0)
      assert(t.log.earliestVersion == 20)
      assert(GraftTable.forPath(spark, t.path).toDF.count() == 26)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("CALL graft.system.clone branches a version as a zero-copy table") {
    val t = build(3) // versions 0..3
    val cat = "clcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("cl-wh-"))
    try {
      val dest = tmpDir("cl-dest-") + "/t"
      val r = spark.sql(s"CALL $cat.system.clone(`table` => '${t.path}', " +
        s"target => '$dest', version => 2)").head()
      assert(r.getLong(0) == 2 && r.getString(1) == dest)
      val c = GraftTable.forPath(spark, dest)
      assert(c.toDF.count() == 3) // seed + rows 1..2
      // diverge the clone; source untouched
      c.append(Seq((77, "clone-only")).toDF("id", "v"))
      assert(c.toDF.count() == 4 && t.toDF.count() == 4) // t has rows 0..3
      assert(t.toDF.filter(col("id") === 77).count() == 0)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("cleanup sweeps crash-stranded staging tmps, never a live one") {
    val t = build(12) // crosses a checkpoint so cleanup has work
    val logDir = t.log.logDir
    val stale = logDir.resolve(".dead-writer.commit.tmp")
    val fresh = logDir.resolve(".live-writer.commit.tmp")
    java.nio.file.Files.write(stale, "torn".getBytes)
    java.nio.file.Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200_000L))
    java.nio.file.Files.write(fresh, "in-flight".getBytes)
    t.cleanupExpiredLogs(retentionMs = 60_000L)
    assert(!java.nio.file.Files.exists(stale), "hour-old tmp is crash debris")
    assert(java.nio.file.Files.exists(fresh), "a recent tmp may be a live commit")
    java.nio.file.Files.delete(fresh)
  }

  test("a lost _last_checkpoint after cleanup still resolves the head") {
    val t = build(25)
    t.cleanupExpiredLogs(retentionMs = 0) // earliest = 20
    Files.delete(t.log.lastCheckpointFile) // the documented always-safe loss
    val fresh = GraftTable.forPath(spark, t.path)
    assert(fresh.latestVersion == 25,
      "pointer loss must fall back to earliestVersion, not version 0")
    assert(fresh.toDF.count() == 26)
  }

  test("timestamp resolution clamps to the pruned boundary") {
    val t = build(25)
    val bornTs = t.history().orderBy(col("version"))
      .select("timestamp").head().getTimestamp(0).getTime
    t.cleanupExpiredLogs(retentionMs = 0)
    val fresh = GraftTable.forPath(spark, t.path)
    // an instant before the boundary resolves to no version below it
    val resolved = fresh.versionAt(
      fresh.history().orderBy(col("version").desc)
        .select("timestamp").head().getTimestamp(0).getTime)
    assert(resolved >= 20)
    assert(bornTs > 0)
  }
}
