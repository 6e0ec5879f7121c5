package graft.streaming

import graft.SparkTestBase
import graft.streaming.EventStreams.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics the oracle can't check: multi-batch stateful
  * sessionization (state carried across micro-batches) and batch/stream
  * agreement of the tumbling transform. */
class StreamingSpec extends SparkTestBase {

  import EventStreams._

  private def ev(id: Long, user: Long, minute: Long, value: Double = 1.0): Event =
    Event(id, new java.sql.Timestamp(minute * 60000L), user, "click", value, "{}")

  test("flatMapGroupsWithState sessionization carries state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val sessions = sessionize(input.toDS())
    val q = sessions.writeStream.format("memory")
      .queryName("sess_test").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 events at minute 0,5 (one session, still open)
      input.addData(ev(1, 1, 0), ev(2, 1, 5))
      q.processAllAvailable()
      assert(spark.table("sess_test").count() === 0, "open session must not emit")

      // batch 2: minute 90 (>= 30min gap) closes the first session
      input.addData(ev(3, 1, 90))
      q.processAllAvailable()
      val closed = spark.table("sess_test").as[SessionOut].collect()
      assert(closed.length === 1)
      assert(closed.head.user_id === 1 && closed.head.n_events === 2)
      assert(closed.head.session_start.getTime === 0L)

      // batch 3: another user interleaved + user 1 closes session 2
      input.addData(ev(4, 2, 91), ev(5, 1, 200))
      q.processAllAvailable()
      val all = spark.table("sess_test").as[SessionOut].collect().sortBy(_.session_start.getTime)
      assert(all.length === 2)
      assert(all(1).user_id === 1 && all(1).n_events === 1 &&
             all(1).session_start.getTime === 90 * 60000L)
    } finally q.stop()
  }

  test("sessionization within one batch splits on the gap and sorts by event time") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS()).writeStream.format("memory")
      .queryName("sess_test2").outputMode(OutputMode.Append()).start()
    try {
      // out-of-order arrival within the batch; two closed + one open session
      input.addData(ev(3, 7, 100, 3.0), ev(1, 7, 0, 1.0), ev(2, 7, 5, 2.0), ev(4, 7, 210, 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess_test2").as[SessionOut].collect().sortBy(_.session_start.getTime)
      assert(closed.map(c => (c.session_start.getTime / 60000, c.n_events, c.sum_value)).toSeq ===
        Seq((0L, 2L, 3.0), (100L, 1L, 3.0)))
    } finally q.stop()
  }

  test("transformWithState carries typed ValueState across batches (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = runningUserStats(input.toDS()).writeStream.format("memory")
        .queryName("tws_test").outputMode(OutputMode.Update()).start()
      try {
        input.addData(ev(1, 1, 0, 2.50), ev(2, 1, 5, 1.25))
        q.processAllAvailable()
        assert(spark.table("tws_test").as[UserStatsOut].collect().toSet ===
          Set(UserStatsOut(1, 2, 3.75)))

        // second batch: user 1's emission must INCLUDE batch-1 state;
        // user 2 starts fresh — update mode emits only touched keys
        input.addData(ev(3, 1, 10, 0.25), ev(4, 2, 0, 9.99))
        q.processAllAvailable()
        assert(spark.table("tws_test").as[UserStatsOut].collect().toSet ===
          Set(UserStatsOut(1, 2, 3.75), UserStatsOut(1, 3, 4.00), UserStatsOut(2, 1, 9.99)))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("event-time timer closes the trailing session with no further input for that user") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = timerSessions(input.toDS()).writeStream.format("memory")
        .queryName("timer_sess").outputMode(OutputMode.Append()).start()
      try {
        // batch 1: user 1's open session (minutes 60, 65 — past the initial
        // watermark at epoch 0, which drops rows at/before it); timer armed
        // at 95min
        input.addData(ev(1, 1, 60, 1.0), ev(2, 1, 65, 2.0))
        q.processAllAvailable()
        assert(spark.table("timer_sess").count() === 0, "open session must not emit yet")

        // batch 2: only OTHER-user traffic advances the watermark past the
        // timer; batch 3 fires it — user 1's session emits with NO user-1 event
        input.addData(ev(3, 2, 180, 1.0))
        q.processAllAvailable()
        input.addData(ev(4, 2, 181, 1.0))
        q.processAllAvailable()
        val emitted = spark.table("timer_sess").as[SessionOut].collect()
        val u1 = emitted.filter(_.user_id == 1L)
        assert(u1.length === 1, s"timer must close user 1's trailing session, got ${emitted.toSeq}")
        assert(u1.head.n_events === 2 && u1.head.session_start.getTime === 60 * 60000L
          && u1.head.sum_value === 3.0)
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming ingestion into GraftTable: one version per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmpDir("sink-")
    val seedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType, false)))
    val table = graft.table.GraftTable.create(spark, dir,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], seedSchema))

    val input = MemoryStream[(Long, Double)]
    val q = EventStreams.streamIntoTable(
      input.toDF().toDF("event_id", "value"), table,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      assert(table.toDF.count() === 2)
      val v1 = table.latestVersion
      input.addData((3L, 3.0))
      q.processAllAvailable()
      assert(table.toDF.count() === 3)
      assert(table.latestVersion > v1, "each batch commits a new version")
      // versioned ingestion: pre-batch state is still readable
      assert(table.versionAsOf(v1).count() === 2)
    } finally q.stop()
  }

  test("streaming tumbling counts equal the batch aggregation (file source)") {
    val streamed = runToMemory(spark,
      tumblingCounts(readEventStream(spark, sfDir)))
    val batch = tumblingCounts(graft.Tables.events(spark, sfDir))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stream-stream join buffers a click until its purchase arrives later") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = clickPurchaseJoin(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory")
      .queryName("ssj_test").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: only the click — nothing can join yet, but it must be
      // buffered in the join state, not dropped
      val t0 = 1704067200000L // 2024-01-01, away from the epoch-0 watermark floor
      clicks.addData(Event(1, new java.sql.Timestamp(t0), 7, "click", 1.0, "{}"))
      q.processAllAvailable()
      assert(spark.table("ssj_test").count() === 0, "no purchase yet")
      // batch 2: one purchase inside the 30-min window, one outside
      purchases.addData(
        Event(2, new java.sql.Timestamp(t0 + 10 * 60000L), 7, "purchase", 5.0, "{}"),
        Event(3, new java.sql.Timestamp(t0 + 50 * 60000L), 7, "purchase", 9.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("ssj_test").collect()
      assert(rows.length === 1, "exactly the in-window purchase joins")
      assert(rows.head.getAs[Double]("p_value") === 5.0)
    } finally q.stop()
  }

  test("left outer stream-stream join: unmatched row emits ONLY after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = clickPurchaseJoin(clicks.toDF(), purchases.toDF(), "leftOuter")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_outer_test").outputMode(OutputMode.Append()).start()
    try {
      val t0 = 1704067200000L
      // a click with NO purchase ever — the outer row under test — plus a
      // matched pair so the inner behavior is visible in the same run
      clicks.addData(
        Event(1, new java.sql.Timestamp(t0), 7, "click", 1.0, "{}"),
        Event(2, new java.sql.Timestamp(t0), 8, "click", 2.0, "{}"))
      purchases.addData(
        Event(3, new java.sql.Timestamp(t0 + 10 * 60000L), 8, "purchase", 5.0, "{}"))
      q.processAllAvailable()
      val afterB1 = spark.table("ssj_outer_test").collect()
      assert(afterB1.length === 1 && afterB1.head.getAs[Long]("user_id") === 8L,
        "matched pair emits immediately; the unmatched click must NOT null-pad " +
          "while a matching purchase could still arrive")
      // advance BOTH watermarks past the click's entire join range
      // (c_ts + 30 min) + 30 min delay → watermark beyond eviction point
      val far = t0 + 100 * 60000L
      clicks.addData(Event(4, new java.sql.Timestamp(far), 9, "click", 3.0, "{}"))
      purchases.addData(Event(5, new java.sql.Timestamp(far), 9, "purchase", 6.0, "{}"))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer_test").collect()
      val outer = rows.filter(_.isNullAt(rows.head.fieldIndex("p_us")))
      assert(outer.length === 1, s"exactly the evicted unmatched click null-pads: ${rows.toSeq}")
      assert(outer.head.getAs[Long]("user_id") === 7L)
      assert(outer.head.getAs[Double]("c_value") === 1.0)
    } finally q.stop()
  }
}
