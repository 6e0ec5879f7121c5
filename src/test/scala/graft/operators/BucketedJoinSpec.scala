package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffling data at write time: two tables bucketed by the
  * same key into the same bucket count join WITHOUT a shuffle exchange —
  * the co-located join strategy for repeatedly-joined 100-TB fact tables. */
class BucketedJoinSpec extends SparkTestBase {

  test("bucketed fact-fact join plans without shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))

    // force a sort-merge plan (broadcast would hide the point at test scale)
    val smj = joined.hint("merge")
    val plan = smj.queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e } ++
      (plan match {
        case a: AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case e: ShuffleExchangeExec => e }
        case _ => Nil
      })
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle; got:\n${plan.treeString}")

    // and it is still correct
    val expected = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(smj.count() === expected)
  }
}
