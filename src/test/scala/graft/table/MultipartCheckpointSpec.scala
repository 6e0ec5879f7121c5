package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Multipart parquet checkpoints (Delta's classic parts scheme): above
  * `checkpoint.partSize` live files, the checkpoint lands as N part files
  * written and read CONCURRENTLY — the single-threaded 1M-row parquet
  * encode was the measured bottleneck of checkpointing at real file
  * counts. The `_last_checkpoint` pointer carries `parts` so the common
  * read constructs part names with zero listing; a torn part set is
  * treated as absent (fold falls back to an older seed — always correct). */
class MultipartCheckpointSpec extends SparkTestBase {

  private def build(dir: String): GraftTable = {
    import spark.implicits._
    val t = GraftTable.create(spark, dir, Seq((0, "seed")).toDF("id", "v").coalesce(1))
    t.setProperty("checkpoint.format", "parquet")   // v1
    t.setProperty("checkpoint.partSize", "3")       // v2
    (1 to 8).foreach(i =>                            // v3..v10
      t.append(Seq((i, s"row$i")).toDF("id", "v").coalesce(1)))
    t
  }

  test("checkpoint splits into parts; fresh log folds the same snapshot") {
    val dir = tmpDir("mpcp-")
    val t = build(dir)
    assert(t.latestVersion === 10L)
    val log = new GraftLog(dir)
    // v10 checkpoint: 9 files / partSize 3 = 3 parts, no single-file twin
    val parts = (0 until 3).map(i => log.multipartCheckpointFile(10, i))
    assert(parts.forall(Files.exists(_)), s"expected 3 parts at v10")
    assert(!Files.exists(log.parquetCheckpointFile(10)))
    assert(Files.readString(log.multipartManifestFile(10)).contains(""""parts":3"""))
    assert(Files.readString(log.lastCheckpointFile)
      .contains(""""version":10,"parts":3"""))
    // a FRESH log (no caches) seeds from the multipart checkpoint
    val s = new GraftLog(dir).snapshotAt(10L)
    assert(s.files.size === 9)
    assert(s.metaData.properties("checkpoint.partSize") === "3")
    val t2 = GraftTable.forPath(spark, dir)
    assert(t2.toDF.count() === 9)
    assert(t2.toDF.agg(sum(col("id"))).head().getLong(0) === 36L)
  }

  test("time travel across and below a multipart checkpoint") {
    val dir = tmpDir("mpcp-tt-")
    val t = build(dir)
    assert(t.versionAsOf(10).count() === 9)
    assert(t.versionAsOf(5).count() === 4)  // seed + rows 1..3
    // a torn part set is ignored: delete one part, fold still correct
    val log = new GraftLog(dir)
    Files.delete(log.multipartCheckpointFile(10, 1))
    val s = new GraftLog(dir).snapshotAt(10L)
    assert(s.files.size === 9, "torn multipart must fall back, not misfold")
  }

  test("log retention cleanup removes expired multipart parts") {
    val dir = tmpDir("mpcp-clean-")
    val t = build(dir)
    (9 to 18).foreach(i =>                           // v11..v20: next checkpoint
      t.append(spark.range(1).selectExpr(s"cast($i as int) as id", "'x' as v").coalesce(1)))
    val log = new GraftLog(dir)
    assert((0 until 7).exists(i => Files.exists(log.multipartCheckpointFile(20, i))))
    t.cleanupExpiredLogs(retentionMs = 0L)
    // v10's parts are expired history now
    assert((0 until 3).forall(i => !Files.exists(log.multipartCheckpointFile(10, i))))
    assert(!Files.exists(log.multipartManifestFile(10)))
    // head still reads fine
    assert(GraftTable.forPath(spark, dir).toDF.count() === 19)
  }
  test("a crashed multipart publish completes on retry instead of abandoning") {
    val dir = tmpDir("mpcp-retry-")
    build(dir)
    // simulate the crash: version 10's checkpoint half-published — the
    // manifest and one part are gone, two survivor parts remain on disk
    val log = new GraftLog(dir)
    Files.delete(log.multipartManifestFile(10))
    Files.delete(log.multipartCheckpointFile(10, 1))
    assert(Files.exists(log.multipartCheckpointFile(10, 0)),
      "survivor parts stay — the exact state that used to block completion")
    // retry: survivor parts must be tolerated (contents are deterministic
    // for a given version), the missing part re-published, and the
    // manifest must LAND — never permanently-incomplete debris
    log.writeCheckpoint(10)
    assert(Files.exists(log.multipartManifestFile(10)))
    assert((0 until 3).forall(i => Files.exists(log.multipartCheckpointFile(10, i))))
    // a FRESH log folds from the completed checkpoint
    val s = new GraftLog(dir).snapshotAt(10L)
    assert(s.files.size === 9)
  }

  test("a stale checkpoint retry cannot regress _last_checkpoint") {
    // A straggler retrying an OLD checkpoint after another writer already
    // checkpointed a newer version must not move the pointer backwards —
    // log cleanup keyed to the newer checkpoint may have deleted the files
    // the stale pointer references.
    val dir = tmpDir("mpcp-ptr-")
    val t = build(dir)
    val log = new GraftLog(dir)
    log.writeCheckpoint(10)
    assert(Files.readString(log.lastCheckpointFile).contains(""""version":10"""))
    log.writeCheckpoint(5) // straggler retry of an older version
    assert(Files.readString(log.lastCheckpointFile).contains(""""version":10"""),
      "the pointer must stay at the newest checkpoint")
    // the v5 checkpoint itself may land (harmless); re-publishing the
    // NEWEST version still refreshes the pointer (crash-repair path)
    log.writeCheckpoint(10)
    assert(Files.readString(log.lastCheckpointFile).contains(""""version":10"""))
    assert(new GraftLog(dir).snapshotAt(10L).files.size === 9)
  }
}
