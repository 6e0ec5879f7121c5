package graft.queries

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming parity queries: the streaming engine must reproduce the batch
  * answer on a finite replay of the events table. q80 runs a real
  * Structured Streaming query (file source → tumbling event-time agg →
  * memory sink) and is oracle-checked against the same SQL as the batch
  * tumbling window — streaming vs DuckDB batch equality.
  */
object Streaming {
  import Exact.sqlSumExact

  /** One upsert-target table per (JVM, sfDir): the stream MERGEs into it
    * via foreachBatch; re-running the stream (Verify + smoke determinism
    * both do) must be a no-op — that idempotence is part of the check. */
  private val upsertTargets =
    new java.util.concurrent.ConcurrentHashMap[String, graft.table.GraftTable]()

  /** q135's source table: orders loaded across THREE commits, so the
    * streaming read has a real commit tail to consume, not just commit 0. */
  private val streamSources =
    new java.util.concurrent.ConcurrentHashMap[String, graft.table.GraftTable]()

  /** Build q135's per-dir source table without draining the stream —
    * Bench warms it untimed so the timed run measures the streaming read,
    * not the one-time table load. */
  def warmFixtures(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import s.implicits._
    streamSources.computeIfAbsent(dir, _ => {
      val o = graft.Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val tb = graft.table.GraftTable.create(s,
        graft.Scratch.dir("graft-streamsrc-").toString,
        o.filter($"o_orderkey" % 3 === 0))
      tb.append(o.filter($"o_orderkey" % 3 === 1))
      tb.append(o.filter($"o_orderkey" % 3 === 2))
      tb
    })
    ()
  }

  val all: Seq[(String, Q)] = Seq(

    // ---- Streaming MERGE upsert sink (foreachBatch -> GraftTable.merge) ----------
    // The Delta streaming-upsert shape: each micro-batch of first-touch
    // keys MERGEs into a versioned table (insert-if-absent), so re-delivery
    // and replays are idempotent — re-running the whole stream inserts
    // nothing. The oracle checks the final table: exactly the batch
    // DISTINCT key set (n_rows == n_users per type — no duplicate row can
    // survive a keyed merge). At scale each micro-batch is one atomic
    // commit; the merge's touched-file semi-join keeps the rewrite
    // proportional to matched files, not table size.
    "q78_stream_upsert_sink" -> Q(
      (s, dir) => {
        import s.implicits._
        val t = upsertTargets.computeIfAbsent(dir, _ => {
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType, nullable = false)))
          val empty = s.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
          graft.table.GraftTable.create(
            s, graft.Scratch.dir("graft-upsert-").toString, empty)
        })
        val stream = EventStreams.streamingFirstTouch(
          EventStreams.readEventStream(s, dir))
        val chk = graft.Scratch.dir("graft-upsert-chk-")
        EventStreams.scopedStreamRun(s) {
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              t.merge(batch, "t.user_id = s.user_id AND t.event_type = s.event_type")
                .whenNotMatchedInsert(Map(
                  "user_id" -> "s.user_id", "event_type" -> "s.event_type"))
                .execute()
            }
            .option("checkpointLocation", chk.resolve("chk").toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        t.toDF.groupBy($"event_type")
          .agg(countDistinct($"user_id").as("n_users"),
               count(lit(1)).as("n_rows"))
          .orderBy($"event_type")
      },
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(DISTINCT user_id) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- transformWithState: per-user cumulative stats (modern state API) --------
    // The Spark-4 arbitrary-state successor to flatMapGroupsWithState:
    // typed ValueState[UserStats] per user on a RocksDB store, Update-mode
    // emissions of the running (n_events, total). Because the cumulative
    // figures are MONOTONE (counts and positive cents only grow), the final
    // per-user state is max() over all emissions — correct under any
    // micro-batch split of the replay. Values accumulate as exact cents
    // (longs), so the stream total equals the batch decimal aggregate
    // exactly; the oracle is that batch rollup. StreamingSpec drives the
    // same processor over a 2-batch replay and asserts cross-batch state.
    "q79_stream_running_stats" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = EventStreams.readEventStream(s, dir)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
          .as[EventStreams.Event]
        EventStreams.runUpdateToMemory(s, EventStreams.runningUserStats(ev).toDF)
          .groupBy($"user_id")
          .agg(max($"n_events").as("n_events"), max($"total_value").as("total_value"))
          .orderBy($"user_id")
      },
      s"""SELECT user_id, COUNT(*) AS n_events,
         |  ${sqlSumExact("value")} AS total_value
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    "q80_stream_tumbling" -> Q(
      (s, dir) => {
        import s.implicits._
        val streamed = EventStreams.tumblingCounts(EventStreams.readEventStream(s, dir))
        EventStreams.runToMemory(s, streamed)
          .orderBy($"w_start", $"event_type")
          .limit(500)
      },
      s"""SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  event_type, COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type LIMIT 500""".stripMargin),

    // ---- Watermarked Append-mode streaming (the scale-safe shape) -------------
    // withWatermark bounds state: a window is emitted once, when the watermark
    // (max event time - 30 min) passes its end, then evicted. The oracle is
    // the batch answer under the same cutoff: windows with
    // end_ms <= max(ts)_ms - 30*60*1000 (Spark tracks event time at ms
    // precision, hence the epoch_ms arithmetic in the twin).
    "q81_stream_watermarked" -> Q(
      (s, dir) => {
        import s.implicits._
        val streamed = EventStreams.watermarkedTumblingCounts(
          EventStreams.readEventStream(s, dir), delay = "30 minutes")
        EventStreams.runAppendToFiles(s, streamed)
          .orderBy($"w_start", $"event_type")
          .limit(500)
      },
      s"""WITH m AS (SELECT epoch_ms(max(ts)) - 30 * 60 * 1000 AS wm_ms FROM events)
         |SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  event_type, COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM events, m
         |WHERE (floor(epoch(ts) / 600) * 600 + 600) * 1000 <= wm_ms
         |GROUP BY 1, 2 ORDER BY w_start, event_type LIMIT 500""".stripMargin),

    // ---- Streaming ingest dedup (dropDuplicatesWithinWatermark) ----------------
    // First-touch per (user, event_type) during ingest, state bounded by the
    // watermark. On a finite single-batch replay no state evicts mid-stream,
    // so the emitted key set is exactly the batch DISTINCT — which is what
    // the oracle checks (summarized per type; the full key set is the
    // file-sink content).
    "q82_stream_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val deduped = EventStreams.streamingFirstTouch(
          EventStreams.readEventStream(s, dir))
        EventStreams.runAppendToFiles(s, deduped)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_first_touch"))
          .orderBy($"event_type")
      },
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_first_touch
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- Stream-stream join (clicks → purchases within 30 min, per user) --------
    // Two independent watermarked streams joined on key + event-time range —
    // the canonical funnel/attribution shape. On a finite replay the inner
    // join emits exactly the batch answer, which is what the DuckDB batch
    // self-join checks. State is bounded by watermark + time-range predicate
    // (see EventStreams.clickPurchaseJoin); the sink is files, nothing
    // materializes on the driver.
    "q83_stream_stream_join" -> Q(
      (s, dir) => {
        import s.implicits._
        // self-join on ONE source stream: Spark plans a single file source
        // scanned once per micro-batch, halving source-side work vs two
        // independent readers of the same files
        val src = EventStreams.readEventStream(s, dir)
        val joined = EventStreams.clickPurchaseJoin(src, src)
        EventStreams.runAppendToFiles(s, joined)
          .orderBy($"user_id", $"c_us", $"p_us", $"c_value", $"p_value")
      },
      """SELECT c.user_id, epoch_us(c.ts) AS c_us, epoch_us(p.ts) AS p_us,
        |  c.value AS c_value, p.value AS p_value
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) >= epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800 * 1000000
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin),

    // ---- Stream-stream LEFT OUTER join (watermark-gated null padding) --------------
    // The outer variant of q83 — the semantics users get wrong: matched
    // pairs emit as soon as both rows are in state (inner behavior), but a
    // click with NO purchase in its 30-minute window emits null-padded
    // ONLY once the global watermark (min over both sides' max event time,
    // minus the 30-minute delay) passes the click's entire join range —
    // before that Spark cannot know a matching purchase won't still
    // arrive. AvailableNow's trailing no-data batch finalizes eviction, so
    // the emitted set is a pure function of the input and the DuckDB twin
    // replays it exactly: inner matches UNION ALL null-padded clicks whose
    // join window closed under the final watermark. Clicks still inside
    // the watermark horizon are withheld — the twin must NOT emit them.
    "q173_stream_left_outer_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val src = EventStreams.readEventStream(s, dir)
        val joined = EventStreams.clickPurchaseJoin(src, src, "leftOuter")
        EventStreams.runAppendToFiles(s, joined)
          .orderBy($"user_id", $"c_us", $"p_us", $"c_value", $"p_value")
      },
      """WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(epoch_us(ts)) FROM c),
        |                    (SELECT max(epoch_us(ts)) FROM p))
        |         - 1800 * 1000000 AS wm_us),
        |matched AS (
        |  SELECT c.user_id, epoch_us(c.ts) AS c_us, epoch_us(p.ts) AS p_us,
        |    c.value AS c_value, p.value AS p_value
        |  FROM c JOIN p ON c.user_id = p.user_id
        |    AND epoch_us(p.ts) >= epoch_us(c.ts)
        |    AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800 * 1000000),
        |unmatched AS (
        |  SELECT c.user_id, epoch_us(c.ts) AS c_us, CAST(NULL AS BIGINT) AS p_us,
        |    c.value AS c_value, CAST(NULL AS DOUBLE) AS p_value
        |  FROM c, wm
        |  WHERE NOT EXISTS (
        |      SELECT 1 FROM p WHERE p.user_id = c.user_id
        |        AND epoch_us(p.ts) >= epoch_us(c.ts)
        |        AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800 * 1000000)
        |    AND epoch_us(c.ts) + 1800 * 1000000 < wm.wm_us)
        |SELECT * FROM matched
        |UNION ALL SELECT * FROM unmatched
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin),

    // ---- Stream-stream FULL OUTER join (both sides watermark-evicted) -------------
    // q83 inner, q173 left outer — this is the remaining sibling, with
    // BOTH sides null-padding on watermark eviction: an unmatched click
    // emits (c, null) once the watermark passes its whole join range
    // (c_us + 30min < wm, as in q173), and an unmatched purchase emits
    // (null, p) once no eligible click can still arrive — matching clicks
    // need c_ts ∈ [p_ts − 30min, p_ts], and new rows below the watermark
    // are late-dropped, so the purchase finalizes once p_us < wm. The
    // user_id column coalesces across sides (a purchase-only row has no
    // click-side key). AvailableNow's trailing no-data batch finalizes
    // both evictions, so the emitted set is a pure function of the input
    // and the DuckDB twin replays it exactly: inner matches UNION ALL
    // closed-window unmatched clicks UNION ALL closed-window unmatched
    // purchases, each side's cutoff stated explicitly.
    "q182_stream_full_outer_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val src = EventStreams.readEventStream(s, dir)
        val joined = EventStreams.clickPurchaseJoin(src, src, "fullOuter")
        EventStreams.runAppendToFiles(s, joined)
          .orderBy($"user_id", $"c_us", $"p_us", $"c_value", $"p_value")
      },
      """WITH c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(epoch_us(ts)) FROM c),
        |                    (SELECT max(epoch_us(ts)) FROM p))
        |         - 1800 * 1000000 AS wm_us),
        |matched AS (
        |  SELECT c.user_id, epoch_us(c.ts) AS c_us, epoch_us(p.ts) AS p_us,
        |    c.value AS c_value, p.value AS p_value
        |  FROM c JOIN p ON c.user_id = p.user_id
        |    AND epoch_us(p.ts) >= epoch_us(c.ts)
        |    AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800 * 1000000),
        |c_unmatched AS (
        |  SELECT c.user_id, epoch_us(c.ts) AS c_us, CAST(NULL AS BIGINT) AS p_us,
        |    c.value AS c_value, CAST(NULL AS DOUBLE) AS p_value
        |  FROM c, wm
        |  WHERE NOT EXISTS (
        |      SELECT 1 FROM p WHERE p.user_id = c.user_id
        |        AND epoch_us(p.ts) >= epoch_us(c.ts)
        |        AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800 * 1000000)
        |    AND epoch_us(c.ts) + 1800 * 1000000 < wm.wm_us),
        |p_unmatched AS (
        |  SELECT p.user_id, CAST(NULL AS BIGINT) AS c_us, epoch_us(p.ts) AS p_us,
        |    CAST(NULL AS DOUBLE) AS c_value, p.value AS p_value
        |  FROM p, wm
        |  WHERE NOT EXISTS (
        |      SELECT 1 FROM c WHERE c.user_id = p.user_id
        |        AND epoch_us(p.ts) >= epoch_us(c.ts)
        |        AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800 * 1000000)
        |    AND epoch_us(p.ts) < wm.wm_us)
        |SELECT * FROM matched
        |UNION ALL SELECT * FROM c_unmatched
        |UNION ALL SELECT * FROM p_unmatched
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin),

    // ---- Stream-static broadcast enrichment ---------------------------------------
    // The stream joins a small static dimension (event_type -> category,
    // an in-memory relation — §2-A.5 shape) under a broadcast hint, then
    // aggregates per category. No join state, no watermark needed for the
    // join itself; the oracle is the batch CASE-mapping aggregate.
    "q84_stream_static_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val dim = Seq(
          ("click", "engagement"), ("view", "engagement"),
          ("purchase", "conversion"), ("signup", "conversion"),
          ("error", "ops")).toDF("event_type", "category")
        val enriched = EventStreams.streamStaticEnrich(
          EventStreams.readEventStream(s, dir), dim)
        EventStreams.runToMemory(s, enriched)
          .orderBy($"category")
      },
      s"""SELECT CASE event_type
         |    WHEN 'click' THEN 'engagement' WHEN 'view' THEN 'engagement'
         |    WHEN 'purchase' THEN 'conversion' WHEN 'signup' THEN 'conversion'
         |    ELSE 'ops' END AS category,
         |  COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY category""".stripMargin),

    // ---- Streaming session windows (watermark + Append) --------------------------
    // Dynamic-length windows in streaming: session_window merges events
    // within the 30-min gap; Append emits a session once the watermark
    // (max event time - 30 min, ms precision) passes its end (last event
    // + gap). The oracle rebuilds sessions batch-side (q23's lag/cumsum
    // formulation) and applies the same µs-exact cutoff.
    "q85_stream_session" -> Q(
      (s, dir) => {
        import s.implicits._
        val streamed = EventStreams.watermarkedSessionCounts(
          EventStreams.readEventStream(s, dir))
        EventStreams.runAppendToFiles(s, streamed)
          .orderBy($"user_id", $"session_start")
      },
      s"""WITH flagged AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |              >= INTERVAL 30 MINUTE OR
         |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |sessions AS (
         |  SELECT user_id, ts, value,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged),
         |agg AS (
         |  SELECT user_id, min(ts) AS st, max(ts) AS en,
         |    COUNT(*) AS n_events, ${sqlSumExact("value")} AS sum_value
         |  FROM sessions GROUP BY user_id, sid),
         |m AS (SELECT (epoch_ms(max(ts)) - 30 * 60 * 1000) * 1000 AS wm_us FROM events)
         |SELECT user_id, strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
         |  n_events, sum_value
         |FROM agg, m
         |WHERE epoch_us(en) + 1800 * 1000000 <= wm_us
         |ORDER BY user_id, session_start""".stripMargin),

    // ---- Streaming sliding windows (watermark + Append) --------------------------
    // Overlapping 10-min/5-min windows under the same emission rule as q81:
    // a window appears once its end passes the watermark. The oracle
    // expands each event to its two covering window starts (q22's batch
    // formulation) and applies the identical ms-precision cutoff.
    "q86_stream_sliding" -> Q(
      (s, dir) => {
        import s.implicits._
        val streamed = EventStreams.watermarkedSlidingCounts(
          EventStreams.readEventStream(s, dir))
        EventStreams.runAppendToFiles(s, streamed)
          .orderBy($"w_start")
          .limit(500)
      },
      s"""WITH expanded AS (
         |  SELECT unnest([floor(epoch(ts) / 300) * 300,
         |                 floor(epoch(ts) / 300) * 300 - 300]) AS w, value
         |  FROM events),
         |m AS (SELECT epoch_ms(max(ts)) - 30 * 60 * 1000 AS wm_ms FROM events)
         |SELECT strftime(to_timestamp(w), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM expanded, m
         |WHERE (w + 600) * 1000 <= wm_ms
         |GROUP BY 1 ORDER BY w_start LIMIT 500""".stripMargin),

    // ---- Streaming SOURCE over a GraftTable (readStream.format("graft")) ----------
    // The other half of table streaming (q78 streams INTO a table; this
    // streams FROM one): a commit log consumed as micro-batches, offsets =
    // commit versions (streaming/GraftTableStream.scala). The source table
    // is built across THREE commits; the streaming aggregate over the
    // drained stream must equal the batch aggregate over all orders — the
    // oracle. Exactly-once across restarts, append-only enforcement, and
    // maintenance-commit skipping are pinned by GraftTableStreamSpec.
    // Scale shape: batch planning is a driver-side metadata fold; each
    // added file is one InputPartition decoded on executors.
    "q135_stream_table_source" -> Q(
      (s, dir) => {
        import s.implicits._
        warmFixtures(s, dir) // memoized per-dir source table
        val t = streamSources.get(dir)
        val streamed = s.readStream.format("graft").load(t.path)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
               Exact.sumExact($"o_totalprice").as("total_price"))
        EventStreams.runToMemory(s, streamed).orderBy($"o_orderstatus")
      },
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  ${sqlSumExact("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // ---- NATIVE graft streaming sink under the oracle -----------------------------
    // q81's watermarked Append aggregation, but the sink is the TABLE
    // itself: `writeStream.format("graft")` commits one epoch-identified
    // version per micro-batch (no foreachBatch, no parquet-dir sink) and
    // the oracle checks the final TABLE state against the batch answer
    // under the same watermark cutoff — closing the loop q78 (foreachBatch
    // upsert) and q135 (streaming SOURCE) leave: graft tables now sit on
    // BOTH ends of a stream natively.
    "q140_stream_sink_tumbling" -> Q(
      (s, dir) => {
        import s.implicits._
        val t = sinkTables.computeIfAbsent(dir, _ => {
          val streamed = EventStreams.watermarkedTumblingCounts(
            EventStreams.readEventStream(s, dir), delay = "30 minutes")
          val tbl = graft.table.GraftTable.create(s,
            graft.Scratch.dir("graft-sinktbl-").toString,
            s.createDataFrame(java.util.Collections.emptyList[
              org.apache.spark.sql.Row](), streamed.schema))
          val chk = graft.Scratch.dir("graft-sinktbl-chk-")
          EventStreams.scopedStreamRun(s) {
            val q = streamed.writeStream.format("graft")
              .option("path", tbl.path)
              .option("checkpointLocation", chk.resolve("chk").toString)
              .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          tbl
        })
        t.toDF.orderBy($"w_start", $"event_type").limit(500)
      },
      s"""WITH m AS (SELECT epoch_ms(max(ts)) - 30 * 60 * 1000 AS wm_ms FROM events)
         |SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  event_type, COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM events, m
         |WHERE (floor(epoch(ts) / 600) * 600 + 600) * 1000 <= wm_ms
         |GROUP BY 1, 2 ORDER BY w_start, event_type LIMIT 500""".stripMargin),

    // ---- STREAMING change data feed ----------------------------------------------
    // `readStream.option("readChangeFeed")` over the golden DML scenario
    // with CDF enabled: DML commits wrote `_cdc/` row-delta sidecars, and
    // the stream tails them per commit — REWRITE commits feed the stream
    // (plain table streaming aborts on them). The drained feed must equal
    // q74's batch `changes()` semantics exactly, pinned by the same
    // literal-VALUES oracle. Scale shape: each micro-batch plans only the
    // commit's sidecar files (sized by changes, not by table); nothing is
    // ever diffed at read time.
    "q143_stream_cdf" -> Q(
      (s, _) => {
        import s.implicits._
        val fed = cdfFeeds.computeIfAbsent("golden", _ => {
          val t = graft.table.GraftTable.create(s,
            graft.Scratch.dir("graft-cdf143-").toString,
            s.createDataFrame(java.util.List.of(
              org.apache.spark.sql.Row(1, "James", "Bond"),
              org.apache.spark.sql.Row(2, "Alice", "Rogers"),
              org.apache.spark.sql.Row(3, "Joe", "Bloggs")),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id",
                  org.apache.spark.sql.types.IntegerType, nullable = false),
                org.apache.spark.sql.types.StructField("firstname",
                  org.apache.spark.sql.types.StringType, nullable = false),
                org.apache.spark.sql.types.StructField("lastname",
                  org.apache.spark.sql.types.StringType, nullable = false)))))
          t.setProperty("changeDataFeed.enabled", "true")
          t.merge(s.createDataFrame(java.util.List.of(
              org.apache.spark.sql.Row(2, "Alice", "Smith"),
              org.apache.spark.sql.Row(4, "New", "Person")), t.snapshot.schema),
              "t.id = s.id")
            .whenMatchedUpdate(Map("firstname" -> "s.firstname", "lastname" -> "s.lastname"))
            .whenNotMatchedInsert(Map(
              "id" -> "s.id", "firstname" -> "s.firstname", "lastname" -> "s.lastname"))
            .execute()
          t.delete(col("id").isin(1, 3))
          val feed = s.readStream.format("graft")
            .option("readChangeFeed", "true")
            .option("startingVersion", 2)
            .load(t.path)
          EventStreams.scopedStreamRun(s) {
            val q = feed.writeStream.format("memory").queryName("graft_cdf143")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          }
          s.table("graft_cdf143")
        })
        // sidecar tier: the MERGE's update arrives as a PAIRED
        // update_preimage/update_postimage (Delta's CDF representation);
        // `_commit_timestamp` presence is pinned here, its equality with
        // history() by q74/q138
        fed.select($"id", $"firstname", $"lastname", $"_change_type",
            $"_commit_version", $"_commit_timestamp".isNotNull.as("has_ts"))
          .orderBy($"_commit_version", $"_change_type", $"id")
      },
      """SELECT * FROM (VALUES
        |  (2, 'Alice', 'Rogers', 'update_preimage',  CAST(2 AS BIGINT), TRUE),
        |  (2, 'Alice', 'Smith',  'update_postimage', CAST(2 AS BIGINT), TRUE),
        |  (4, 'New',   'Person', 'insert', CAST(2 AS BIGINT), TRUE),
        |  (1, 'James', 'Bond',   'delete', CAST(3 AS BIGINT), TRUE),
        |  (3, 'Joe',   'Bloggs', 'delete', CAST(3 AS BIGINT), TRUE))
        |AS t(id, firstname, lastname, _change_type, _commit_version, has_ts)
        |ORDER BY _commit_version, _change_type, id""".stripMargin),
  )

  /** q143's drained CDF feed, memoized per JVM. */
  private val cdfFeeds =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  /** q140's drained sink tables, one per (JVM, dir). */
  private val sinkTables =
    new java.util.concurrent.ConcurrentHashMap[String, graft.table.GraftTable]()
}
