package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** As-of join edge semantics: inclusivity at equal timestamps, no-match
  * nulls, per-key isolation. */
class AsOfJoinSpec extends SparkTestBase {

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("equal timestamps match (at-or-before); missing matches yield null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts(5)),   // before any right row  -> null
      (2L, 10L, ts(10)),  // equal ts              -> matches r@10
      (3L, 10L, ts(20)),  // after                 -> latest r@15
      (4L, 99L, ts(50))   // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(10), 1.0),
      (10L, ts(15), 2.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", Seq("value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq === Seq((1L, null), (2L, 1.0), (3L, 2.0), (4L, null)))
  }

  test("keys never leak across groups") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(100)), (2L, 2L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(50), 7.0)).toDF("user_id", "ts", "value")
    val out = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", Seq("value"))
      .orderBy("event_id").collect()
    assert(out(0).getDouble(3) === 7.0)
    assert(out(1).isNullAt(3))
  }

  test("randomized equivalence with the quadratic reference formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, ts(rnd.nextInt(500)))).toDF("event_id", "user_id", "ts")
    val right = (1 to 200).map(i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(500)), rnd.nextInt(1000).toDouble))
      .toDF("user_id", "ts", "value")
      .dropDuplicates("user_id", "ts") // unique (key, ts) → both formulations total

    val fast = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", Seq("value"))
      .select($"event_id", $"asof_value")

    // reference: candidate join + keep the max right ts per left row
    val naive = left.as("l")
      .join(right.as("r"), $"l.user_id" === $"r.user_id" && $"l.ts" >= $"r.ts", "left")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy($"event_id").orderBy($"r.ts".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"event_id", $"r.value".as("asof_value"))

    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("multiple carried right columns") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(5), 7.0, "x")).toDF("user_id", "ts", "value", "tag")
    val out = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", Seq("value", "tag"))
      .collect()(0)
    assert(out.getDouble(3) === 7.0 && out.getString(4) === "x")
  }
}
