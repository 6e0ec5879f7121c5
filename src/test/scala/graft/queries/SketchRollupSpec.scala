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

  test("q101: portable HLL ~ exact at sf0.01, register-exact mergeability") {
    import spark.implicits._
    // sf0.01 deliberately: with m=64 registers and no small-range
    // correction (needs ln — not portable), estimates are only meaningful
    // above ~2.5m ≈ 160 distinct keys per group; sf0.001 has ~30.
    val dir = "/root/testdata/sf0.01"
    val est = graft.SparkEntry.queries("q101_portable_hll")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val exact = graft.Tables.customer(spark, dir)
      .join(graft.Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .join(graft.Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name").agg(countDistinct($"c_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(est.keySet === exact.keySet)
    exact.foreach { case (region, n) =>
      val e = est(region)
      // m=64 ⇒ theoretical rel. stderr 1.04/√64 = 13%; allow 3σ.
      assert(math.abs(e - n) / n < 0.4,
        s"$region: portable-HLL estimate $e vs exact $n beyond 40%")
    }

    // Mergeability is REGISTER-exact, not just estimate-close: rolling
    // up per-nation MAX(rho) partials by MAX must reproduce the
    // registers of a single pass over the region's rows.
    val h = "cast(conv(substring(md5(cast(c_custkey as string)), 1, 15), 16, 10) as bigint)"
    val hashed = graft.Tables.customer(spark, dir)
      .select($"c_nationkey", expr(h).as("hh"))
      .select($"c_nationkey", ($"hh" % 64).cast("int").as("bucket"),
        expr("shiftright(hh, 6)").as("w"))
      .withColumn("rho",
        when($"w" === 0, lit(55)).otherwise(lit(55) - length(expr("bin(w)"))))
      .join(graft.Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
    val onePass = hashed.groupBy($"n_regionkey", $"bucket")
      .agg(max($"rho").as("r1"))
    val viaPartials = hashed.groupBy($"n_regionkey", $"c_nationkey", $"bucket")
      .agg(max($"rho").as("r"))
      .groupBy($"n_regionkey", $"bucket").agg(max($"r").as("r2"))
    val diff = onePass.join(viaPartials, Seq("n_regionkey", "bucket"))
      .where($"r1" =!= $"r2").count()
    assert(diff === 0L, s"$diff (region,bucket) registers differ between one-pass and merged partials")
  }
}
