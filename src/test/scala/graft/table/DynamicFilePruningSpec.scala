package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Dynamic file pruning: a join against a small build side reads only the
  * fact files whose stats can serve the build keys — and gives the same
  * rows as the unpruned join. */
class DynamicFilePruningSpec extends SparkTestBase {

  private lazy val fact: GraftTable = {
    import spark.implicits._
    // 8 files range-clustered by key: each holds one contiguous key slice
    val df = (0 until 4000).map(i => (i, i % 97, s"v$i")).toDF("k", "grp", "v")
    GraftTable.create(spark, tmpDir("dfp-"), df.repartitionByRange(8, $"k"))
  }

  test("ingest-window keys read a strict subset of files; rows match the full join") {
    import spark.implicits._
    val keys = Seq(1200, 1201, 1207, 1333, 1499).toDF("k")
    val full = fact.toDF.join(keys, "k").select($"k", $"v")
    val pruned = fact.scanForKeys("k", keys).join(keys, "k").select($"k", $"v")
    assert(pruned.collect().map(_.getInt(0)).sorted.toSeq ===
      full.collect().map(_.getInt(0)).sorted.toSeq)
    // the window spans ~1/13 of the key range → at most 2 of 8 files
    val read = fact.prunedFiles(fact.snapshot,
      col("k").isInCollection(Seq(1200, 1201, 1207, 1333, 1499)))
    assert(read.size <= 2, s"expected <= 2 files read, got ${read.size} of 8")
  }

  test("empty and oversized build sides degrade safely") {
    import spark.implicits._
    assert(fact.scanForKeys("k", Seq.empty[Int].toDF("k")).count() === 0)
    // above maxKeys: falls back to the FULL scan (no key filter applied)
    val big = (0 until 50).toDF("k")
    assert(fact.scanForKeys("k", big, maxKeys = 10).count() === 4000)
    // null keys never match and never poison the probe
    val withNull = Seq[Option[Int]](Some(7), None).toDF("k")
    assert(fact.scanForKeys("k", withNull).collect().map(_.getInt(0)).toSeq === Seq(7))
    intercept[IllegalArgumentException](fact.scanForKeys("nope", big))
  }

  test("large key sets range-prune with sorted binary search, same rows") {
    import spark.implicits._
    // > 256 keys forces the O(files * log keys) path; keys cluster in one
    // range slice so pruning still fires
    val keyVals = (1000 until 1400)
    val keys = keyVals.toDF("k")
    val got = fact.scanForKeys("k", keys).collect().map(_.getInt(0)).sorted.toSeq
    assert(got === keyVals.toSeq, "large-key path must return exactly the matching rows")
    // and a scattered large key set (every 7th id) still returns exact rows
    val scattered = (0 until 4000 by 7).toDF("k")
    assert(fact.scanForKeys("k", scattered).count() === (0 until 4000 by 7).size)
  }

  test("large key sets prune on PARTITION columns too (partitionValues as bounds)") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dfp-part-"),
      (0 until 2000).map(i => (i, i % 10)).toDF("id", "bucket"),
      partitionBy = Seq("bucket"))
    // 300 keys (> 256: the sorted-binary-search path) hitting 1 of 10 partitions
    val keys = Seq.fill(300)(7).zipWithIndex.map(_._1).toDF("bucket")
    val pruned = GraftTable.sortedKeyPruneOf(t.snapshot, "bucket", (0 until 300).map(_ => 7))
    assert(pruned.exists(_.size < t.snapshot.files.size),
      "partition values must serve as bounds on the large-key path")
    assert(t.scanForKeys("bucket", keys).count() === 200)
  }
}
