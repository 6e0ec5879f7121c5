package graft.table

import java.nio.file.{Files, Path}

import graft.SparkTestBase

/** The LogStore seam: the commit protocol's storage contract is
  * (1) publishIfAbsent = atomic putIfAbsent, (2) read-after-publish
  * visibility. These tests swap in stores that VIOLATE each clause and
  * prove the protocol detects the violation loudly (typed concurrency
  * error) instead of folding a corrupt log — the property an object-store
  * deployment without a proper putIfAbsent shim would otherwise lose
  * silently. */
class LogStoreSpec extends SparkTestBase {

  private def seedActions(log: GraftLog): Seq[Action] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    Seq(
      MetaData(java.util.UUID.randomUUID().toString, schema.json,
        System.currentTimeMillis(), Nil, Map.empty, Map.empty),
      CommitInfo(0L, log.nextTimestamp(), "CREATE", Map.empty))
  }

  /** Delegates everything to the POSIX store; subclasses break one clause. */
  private class DelegatingStore extends LogStore {
    override def readLines(p: Path): Seq[String] = PosixLogStore.readLines(p)
    override def readString(p: Path): String = PosixLogStore.readString(p)
    override def writeTmp(p: Path, bytes: Array[Byte]): Unit = PosixLogStore.writeTmp(p, bytes)
    override def publishIfAbsent(src: Path, dst: Path): Unit = PosixLogStore.publishIfAbsent(src, dst)
    override def publishOverwrite(src: Path, dst: Path): Unit = PosixLogStore.publishOverwrite(src, dst)
    override def exists(p: Path): Boolean = PosixLogStore.exists(p)
    override def isRegularFile(p: Path): Boolean = PosixLogStore.isRegularFile(p)
    override def isDirectory(p: Path): Boolean = PosixLogStore.isDirectory(p)
    override def list(dir: Path, glob: String): Seq[Path] = PosixLogStore.list(dir, glob)
    override def deleteIfExists(p: Path): Boolean = PosixLogStore.deleteIfExists(p)
    override def mtimeMs(p: Path): Long = PosixLogStore.mtimeMs(p)
    override def createDirectories(p: Path): Unit = PosixLogStore.createDirectories(p)
  }

  test("non-atomic publish (racing loser overwrites winner) is detected") {
    // A store whose "publish" is copy-with-replace — the S3 plain-PUT
    // failure mode: both racers' PUTs succeed, last writer wins. Simulate
    // the interleaving deterministically: the loser's body lands on top of
    // this writer's publish before its read-back.
    val store = new DelegatingStore {
      override def publishIfAbsent(src: Path, dst: Path): Unit = {
        Files.copy(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING) // no CAS!
        // the racing loser's commit lands right after ours
        Files.write(dst, "{\"commitInfo\":{\"version\":0,\"timestamp\":1,\"operation\":\"EVIL\",\"operationMetrics\":{}}}\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    val log = new GraftLog(tmpDir("logstore-nonatomic-"), store)
    val e = intercept[java.util.ConcurrentModificationException] {
      log.commit(0L, seedActions(log))
    }
    assert(e.getMessage.contains("not atomic"),
      s"expected the non-atomic-publish diagnostic, got: ${e.getMessage}")
  }

  test("lost publish visibility is detected") {
    // a store that acknowledges the publish but never makes it readable —
    // delayed/lost visibility, the other half of the contract
    val store = new DelegatingStore {
      override def publishIfAbsent(src: Path, dst: Path): Unit = () // dropped
    }
    val log = new GraftLog(tmpDir("logstore-lost-"), store)
    val e = intercept[java.util.ConcurrentModificationException] {
      log.commit(0L, seedActions(log))
    }
    assert(e.getMessage.contains("visibility"),
      s"expected the lost-visibility diagnostic, got: ${e.getMessage}")
  }

  test("a conforming custom store carries the full commit/fold cycle") {
    val publishes = new java.util.concurrent.atomic.AtomicInteger
    val reads = new java.util.concurrent.atomic.AtomicInteger
    val store = new DelegatingStore {
      override def publishIfAbsent(src: Path, dst: Path): Unit = {
        publishes.incrementAndGet(); super.publishIfAbsent(src, dst)
      }
      override def readLines(p: Path): Seq[String] = {
        reads.incrementAndGet(); super.readLines(p)
      }
    }
    val dir = tmpDir("logstore-ok-")
    val log = new GraftLog(dir, store)
    log.commit(0L, seedActions(log))
    log.commit(1L, Seq(
      CommitInfo(1L, log.nextTimestamp(), "WRITE", Map.empty),
      AddFile("part-0.parquet", 10L, 1L, 1L, Map.empty, Map.empty)))
    // a FRESH instance (cold caches) folds through the same seam
    val replay = new GraftLog(dir, store)
    val s = replay.snapshotAt(1L)
    assert(s.files.map(_.path) == Seq("part-0.parquet"))
    assert(publishes.get() == 2, "both commits must publish through the seam")
    assert(reads.get() >= 2, "the fold must read commits through the seam")
    // racing a second writer through the DEFAULT store on the same dir:
    // the posix CAS rejects the duplicate version with the typed error
    intercept[java.util.ConcurrentModificationException] {
      new GraftLog(dir).commit(1L, Seq(
        CommitInfo(1L, 999L, "WRITE", Map.empty)))
    }
  }
}
