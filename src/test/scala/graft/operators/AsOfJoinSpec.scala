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

  test("multiple carried right columns") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(5), 7.0, "x")).toDF("user_id", "ts", "value", "tag")
    val out = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", Seq("value", "tag"))
      .collect()(0)
    assert(out.getDouble(3) === 7.0 && out.getString(4) === "x")
  }
}
