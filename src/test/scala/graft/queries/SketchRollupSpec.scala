package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the HLL rollup (q58) that the rows-only driver
  * check can't make: the union-of-partials estimate must (a) be close to
  * the exact distinct count and (b) EQUAL the single-pass sketch of the
  * same data — the mergeability property that makes sketch partials safe
  * to pre-aggregate and roll up. */
class SketchRollupSpec extends SparkTestBase {

  test("q58: union of per-nation sketches ~ exact, == unpartitioned sketch") {
    import spark.implicits._
    val customer = graft.Tables.customer(spark, sfDir)
    val nation = graft.Tables.nation(spark, sfDir)

    val est = graft.SparkEntry.queries("q58_hll_rollup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val exact = customer
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .join(graft.Tables.region(spark, sfDir), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name").agg(countDistinct($"c_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(est.keySet === exact.keySet)
    exact.foreach { case (region, n) =>
      val e = est(region)
      assert(math.abs(e - n).toDouble / n < 0.02,
        s"$region: estimate $e vs exact $n beyond 2%")
    }

    // mergeability: rolling up per-nation partials must give the SAME
    // sketch state as sketching the region's rows in one pass
    val onePass = customer
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(c_custkey, 12))").cast("long").as("e1"))
    val viaPartials = customer
      .groupBy($"c_nationkey")
      .agg(expr("hll_sketch_agg(c_custkey, 12)").as("sk"))
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("e2"))
    val cmp = onePass.join(viaPartials, "n_regionkey").collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getAs[Long]("e1") === r.getAs[Long]("e2"),
        s"region ${r.get(0)}: one-pass != merged-partials estimate")
    }
  }
}
