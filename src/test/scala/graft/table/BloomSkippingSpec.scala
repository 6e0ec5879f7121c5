package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom-filter file skipping: native parquet blooms (written per the
  * table's `bloom.columns` property) must prune point lookups that min/max
  * stats cannot, never drop a matching row, and survive DML rewrites.
  */
class BloomSkippingSpec extends SparkTestBase {

  private def bloomTable(dir: String): GraftTable = {
    // md5 keys + repartition: every file spans ~the whole key range, so
    // min/max pruning is provably useless and any skipping is the bloom's
    val df = spark.range(0, 8000)
      .selectExpr("id", "md5(cast(id as string)) AS k")
      .repartition(8)
    GraftTable.create(spark, dir, df, bloomFilterOn = Seq("k"), bloomNdv = 2000L)
  }

  test("point lookup prunes via bloom where min/max keeps every file") {
    val t = bloomTable(tmpDir("bloom-"))
    val s = t.snapshot
    assert(s.files.size === 8)
    val key = spark.sql("SELECT md5('123')").head().getString(0)
    val pred = col("k") === key
    // min/max alone cannot prune a single file
    val resolved = DataSkipping.resolve(spark, s.schema, pred)
    assert(DataSkipping.prune(resolved, s.files).size === 8,
      "overlapping ranges must defeat min/max pruning (the bloom's job)")
    val pruned = t.prunedFiles(s, pred)
    assert(pruned.size < 8, "bloom must drop files for a point lookup")
    // pruning never drops the matching row
    assert(t.scan(pred).collect().map(_.getLong(0)).toSeq === Seq(123L))
    // an absent key prunes (almost) everything; scan stays empty-correct
    val absent = col("k") === "0123456789abcdef0123456789abcdef"
    assert(t.prunedFiles(s, absent).size <= 2,
      "absent key must prune to at most bloom false positives")
    assert(t.scan(absent).count() === 0)
  }

  test("IN-list probes prune conservatively and read all listed keys") {
    val t = bloomTable(tmpDir("bloom-"))
    val keys = Seq("5", "4999", "7321").map(v =>
      spark.sql(s"SELECT md5('$v')").head().getString(0))
    val pred = col("k").isin(keys: _*)
    val pruned = t.prunedFiles(t.snapshot, pred)
    assert(pruned.size < 8)
    assert(t.scan(pred).collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(5L, 4999L, 7321L))
  }

  test("range predicates never consult the bloom (no probe, no skip)") {
    val t = bloomTable(tmpDir("bloom-"))
    val s = t.snapshot
    // a range on k has no equality probe: bloom must not prune anything
    assert(t.prunedFiles(s, col("k") >= "8").size ===
      DataSkipping.prune(DataSkipping.resolve(spark, s.schema, col("k") >= "8"),
        s.files).size)
  }

  test("DML rewrites keep the bloom property and rebuild filters") {
    val t = bloomTable(tmpDir("bloom-"))
    t.delete(col("id") % 100 === 0) // rewrites every file (all contain multiples)
    val reloaded = GraftTable.forPath(spark, t.path)
    assert(GraftTable.bloomColumns(reloaded.snapshot.metaData) === Seq("k"),
      "bloom.columns must persist in table properties across DML")
    val key = spark.sql("SELECT md5('123')").head().getString(0)
    val pruned = reloaded.prunedFiles(reloaded.snapshot, col("k") === key)
    assert(pruned.size < reloaded.snapshot.files.size,
      "rewritten files must carry fresh blooms")
    assert(reloaded.scan(col("k") === key).collect().map(_.getLong(0)).toSeq === Seq(123L))
    // deleted keys are gone AND their bloom lookups stay correct
    val deletedKey = spark.sql("SELECT md5('100')").head().getString(0)
    assert(reloaded.scan(col("k") === deletedKey).count() === 0)
  }

  test("metaData properties round-trip through action JSON") {
    val m = MetaData("id1", "{}", 1L, Nil, Map.empty, Map("bloom.columns" -> "k"))
    assert(Actions.fromJson(Actions.toJson(m)) === m)
    // absent properties parse to empty (backward compatibility)
    val legacy = """{"metaData":{"id":"x","schemaString":"{}","createdTime":1,"partitionColumns":[],"constraints":{}}}"""
    assert(Actions.fromJson(legacy).asInstanceOf[MetaData].properties === Map.empty)
  }
}
