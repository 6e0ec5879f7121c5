package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table (SURVEY.md §2-D "event
  * analytics"): per-type rollups, tumbling / sliding / session windows,
  * JSON property extraction, and lag-based sessionization with revenue.
  *
  * Batch event-time semantics use the same expressions Structured Streaming
  * would (`window()`, `session_window()`) — see graft.streaming for the
  * streaming twins. All timestamps are formatted to second precision on
  * output: the driver testdata stores events as TIMESTAMP(ns), which Spark
  * reads at µs and DuckDB at ns — formatting removes the sub-second
  * representation gap from the hash compare.
  *
  * 100-TB notes: every query here is scan → (optional window fn) → hash agg;
  * partial aggregation bounds the shuffle by group count, and sessionization
  * shuffles once on user_id (the natural partitioning key for event data).
  * Reference grounding: the reference has no event analytics (SURVEY.md §0);
  * this is the north-star extension surface over TESTDATA's events table.
  */
object Events {
  import Exact._

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  val all: Seq[(String, Q)] = Seq(

    // ---- Per-type rollup ----------------------------------------------------
    "q20_event_type_rollup" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
               countDistinct($"user_id").as("n_users"),
               sumExact($"value").as("sum_value"),
               avgExact($"value").as("avg_value"))
          .orderBy($"event_type")
      },
      s"""SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
         |  ${sqlSumExact("value")} AS sum_value, ${sqlAvgExact("value")} AS avg_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- Tumbling window (10 minutes) ----------------------------------------
    // window() buckets rows map-side; the agg shuffles #buckets × #types keys.
    "q21_tumbling_window" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(window($"ts", "10 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), sumExact($"value").as("sum_value"))
          .select(date_format($"window.start", fmt).as("w_start"),
                  $"event_type", $"n", $"sum_value")
          .orderBy($"w_start", $"event_type")
          .limit(500)
      },
      s"""SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  event_type, COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type LIMIT 500""".stripMargin),

    // ---- Sliding window (10 min size / 5 min slide) ---------------------------
    // Each event lands in exactly size/slide = 2 windows; Spark expands rows
    // map-side before the agg (same shape as streaming).
    "q22_sliding_window" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(window($"ts", "10 minutes", "5 minutes"))
          .agg(count(lit(1)).as("n"), sumExact($"value").as("sum_value"))
          .select(date_format($"window.start", fmt).as("w_start"), $"n", $"sum_value")
          .orderBy($"w_start")
          .limit(500)
      },
      s"""WITH expanded AS (
         |  SELECT unnest([floor(epoch(ts) / 300) * 300,
         |                 floor(epoch(ts) / 300) * 300 - 300]) AS w, value
         |  FROM events)
         |SELECT strftime(to_timestamp(w), '%Y-%m-%d %H:%M:%S') AS w_start,
         |  COUNT(*) AS n, ${sqlSumExact("value")} AS sum_value
         |FROM expanded GROUP BY 1 ORDER BY w_start LIMIT 500""".stripMargin),

    // ---- Session window (30-minute gap) ---------------------------------------
    // session_window merges per-user event ranges [ts, ts+gap); a new session
    // starts when the gap to the previous event is >= 30 minutes. The oracle
    // reproduces exactly that with lag + a running break-count.
    "q23_session_window" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id", session_window($"ts", "30 minutes"))
          .agg(count(lit(1)).as("n_events"), sumExact($"value").as("sum_value"))
          .select($"user_id",
                  date_format($"session_window.start", fmt).as("session_start"),
                  $"n_events", $"sum_value")
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
         |  FROM flagged)
         |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  COUNT(*) AS n_events, ${sqlSumExact("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin),

    // ---- JSON property extraction ----------------------------------------------
    "q24_json_props" -> Q(
      (s, dir) => {
        import s.implicits._
        // both JSON surfaces: path extraction AND schema-full from_json;
        // the two must agree (asserted by the shared oracle columns)
        Tables.events(s, dir)
          .withColumn("k", get_json_object($"props", "$.k").cast("long"))
          .withColumn("k2",
            from_json($"props", org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType)))).getField("k"))
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), min($"k").as("min_k"), max($"k").as("max_k"),
               count($"k").as("n_k"), sum($"k2").as("sum_k2"))
          .orderBy($"event_type")
      },
      // CAST(SUM(..)) needed: DuckDB SUM(BIGINT) yields HUGEINT (renders N.0)
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k, COUNT(k) AS n_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k2
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- Map functions: build / filter / transform / lookup ---------------------
    // The version-keyed-map surface (reference api.py:67 keeps a
    // version -> DataFrame JSON map): per-type event counts assembled into a
    // MapType column with map_from_entries, then exercised end-to-end —
    // element_at lookup, map_filter, map_keys/map_values, transform_values,
    // map_concat. Output is scalars only (the driver's comparator can't hash
    // map cells); the DuckDB twin computes the same scalars relationally —
    // the oracle checks the semantics, not the container. Collecting the map
    // is safe at any scale: its size is the event-type cardinality, not the
    // row count.
    "q37_map_funcs" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
          .agg(map_from_entries(array_sort(collect_list(struct($"event_type", $"n")))).as("m"))
          .select(
            size($"m").as("n_types"),
            element_at($"m", "click").as("click_n"),
            array_join(array_sort(map_keys(map_filter($"m", (_, v) => v > 2000))), ",")
              .as("big_types"),
            expr("aggregate(map_values(m), 0L, (acc, x) -> acc + x)").as("total_events"),
            element_at(transform_values($"m", (_, v) => v * 2), "view").as("view_doubled"),
            size(map_concat($"m", map(lit("__sentinel"), lit(0L)))).as("n_concat"))
      },
      """WITH t AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM t) AS n_types,
        |  (SELECT n FROM t WHERE event_type = 'click') AS click_n,
        |  coalesce((SELECT array_to_string(list_sort(list(event_type)), ',')
        |            FROM t WHERE n > 2000), '') AS big_types,
        |  (SELECT CAST(SUM(n) AS BIGINT) FROM t) AS total_events,
        |  (SELECT n * 2 FROM t WHERE event_type = 'view') AS view_doubled,
        |  (SELECT COUNT(*) + 1 FROM t) AS n_concat""".stripMargin),

    // ---- Sessionization via window functions + top sessions by revenue ----------
    // Same session semantics as q23 but built from lag/cumsum (the portable
    // formulation), then ranked. Shuffle: one exchange on user_id for the
    // window, one for the final top-k (TakeOrderedAndProject).
    "q25_session_revenue" -> Q(
      (s, dir) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts")
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("prev_ts", lag($"ts", 1).over(byUser))
          .withColumn("brk",
            when($"prev_ts".isNull ||
                 unix_timestamp($"ts") - unix_timestamp($"prev_ts") >= 1800, 1)
              .otherwise(0))
          .withColumn("sid", sum($"brk").over(cum))
          .groupBy($"user_id", $"sid")
          .agg(count(lit(1)).as("n_events"),
               sum(dec($"value")).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"user_id", $"sid")
          .limit(20)
          .select($"user_id", $"n_events", $"revenue")
      },
      s"""WITH flagged AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR
         |              CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) >= 1800
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |sessions AS (
         |  SELECT user_id, value,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged),
         |per_session AS (
         |  SELECT user_id, sid, COUNT(*) AS n_events,
         |    ${sqlSumExact("value")} AS revenue
         |  FROM sessions GROUP BY user_id, sid)
         |SELECT user_id, n_events, revenue FROM per_session
         |ORDER BY revenue DESC, user_id, sid LIMIT 20""".stripMargin),

    // ---- As-of join: each purchase joined to the user's latest prior click -------
    // graft.operators.AsOfJoin union-merge formulation (one shuffle on the
    // key, no candidate-pair blowup); DuckDB's native ASOF JOIN is the
    // oracle — an operator-level cross-engine equivalence check.
    "q26_asof_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts", $"value")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"value")
        graft.operators.AsOfJoin.asof(
            purchases, clicks, keys = Seq("user_id"),
            leftTs = "ts", rightTs = "ts", rightVal = Seq("value"))
          .select($"event_id", $"user_id",
                  date_format($"ts", fmt).as("pts"),
                  $"value", $"asof_value")
          .orderBy($"event_id")
      },
      """SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS pts,
        |  l.value, r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin),

    // ---- PIVOT: long → wide (day-of-week × event-type count matrix) ---------------
    // pivot() with an EXPLICIT value list — the scale-safe form: without it
    // Spark first runs a distinct scan to discover values and the column
    // set becomes data-dependent (schema drift at 100 TB). Fixed columns →
    // single 2-phase hash agg, 7 groups. The dow is cast to BIGINT so both
    // engines agree on the column dtype.
    "q49_pivot" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .withColumn("dow", dayofweek($"ts").cast("long"))
          .groupBy($"dow")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0)
          .orderBy($"dow")
      },
      """SELECT dayofweek(ts) + 1 AS dow,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY dow""".stripMargin),

    // ---- UNPIVOT: wide → long (melt), the inverse of q49 --------------------------
    // Dataset.unpivot melts the five type columns back to (event_type, n)
    // rows. The oracle is the zero-filled direct tall aggregate, so the
    // pivot → unpivot round trip is verified lossless (absent combos must
    // come back as explicit n=0 rows, not disappear).
    "q54_unpivot" -> Q(
      (s, dir) => {
        import s.implicits._
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(s, dir)
          .withColumn("dow", dayofweek($"ts").cast("long"))
          .groupBy($"dow")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .na.fill(0)
          .unpivot(Array($"dow"), types.map(col).toArray, "event_type", "n")
          .orderBy($"dow", $"event_type")
      },
      """WITH d AS (SELECT DISTINCT dayofweek(ts) + 1 AS dow FROM events),
        |t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |a AS (SELECT dayofweek(ts) + 1 AS dow, event_type, COUNT(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT d.dow, t.event_type, COALESCE(a.n, 0) AS n
        |FROM d CROSS JOIN t LEFT JOIN a ON a.dow = d.dow AND a.event_type = t.event_type
        |ORDER BY d.dow, t.event_type""".stripMargin),

    // ---- Gap-fill + forward-fill (time-series regularization) ---------------------
    // The metrics/feature-pipeline staple: per user, a dense daily spine
    // from first to last active day (sequence + explode — generated
    // DISTRIBUTED, per row, not from a driver-side calendar), left-joined
    // daily aggregates, missing days as explicit n=0 rows, and the value
    // forward-filled with last_value(ignoreNulls) over an ordered window.
    // Scale shape: one narrow agg on (user, day), spine fan-out bounded by
    // each user's own span, one window partitioned by user — no shuffle
    // wider than the daily rollup.
    "q56_gap_fill" -> Q(
      (s, dir) => {
        import s.implicits._
        val daily = Tables.events(s, dir)
          .groupBy($"user_id", to_date($"ts").as("d"))
          .agg(count(lit(1)).as("n_events"), sumExact($"value").as("day_value"))
        val spine = daily.groupBy($"user_id")
          .agg(min($"d").as("mn"), max($"d").as("mx"))
          .select($"user_id", explode(sequence($"mn", $"mx", expr("interval 1 day"))).as("d"))
        val w = Window.partitionBy($"user_id").orderBy($"d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "d"), "left")
          .select($"user_id", date_format($"d", "yyyy-MM-dd").as("day"),
            coalesce($"n_events", lit(0L)).as("n_events"),
            last($"day_value", ignoreNulls = true).over(w).as("ff_value"))
          .orderBy($"user_id", $"day")
      },
      s"""WITH daily AS (
         |  SELECT user_id, date_trunc('day', ts) AS d,
         |    COUNT(*) AS n_events, ${sqlSumExact("value")} AS day_value
         |  FROM events GROUP BY 1, 2),
         |spine AS (
         |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d
         |  FROM (SELECT user_id, min(d) AS mn, max(d) AS mx FROM daily GROUP BY 1)),
         |j AS (SELECT s.user_id, s.d, dd.n_events, dd.day_value
         |      FROM spine s LEFT JOIN daily dd ON dd.user_id = s.user_id AND dd.d = s.d)
         |SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
         |  COALESCE(n_events, 0) AS n_events,
         |  last_value(day_value IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY d
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_value
         |FROM j ORDER BY user_id, day""".stripMargin),

    // ---- Time-RANGE rolling window (trailing 1 hour per user) --------------------
    // The window-frame shape q09's ROWS frames can't express: the frame is
    // every event within the trailing HOUR, however many rows that is —
    // rolling rate-limit / velocity features. Ordering key is whole epoch
    // seconds on BOTH engines (Spark's long cast floors µs, DuckDB floors
    // ns — same integer), which also makes equal-second rows frame PEERS
    // sharing one aggregate, so no cross-engine tie-break exists. The sum
    // goes through the decimal discipline (exact within any frame order).
    // Scale shape: one shuffle on user_id + an in-partition sort; frame
    // state is the trailing window only.
    "q96_rolling_range_window" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".cast("long"))
          .rangeBetween(-3600, 0)
        Tables.events(s, dir)
          .select($"event_id", $"user_id",
            count(lit(1)).over(w).as("n_1h"),
            sum(dec($"value")).over(w).cast("double").as("v_1h"))
          .orderBy($"event_id")
      },
      """SELECT event_id, user_id, COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY floor(epoch(ts))
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),

    // ---- Cohort retention (weekly) -----------------------------------------------
    // The product-analytics staple: users grouped by the week they first
    // appeared (their cohort), activity counted per whole-week offset from
    // that cohort. Shape: one window-min on user_id (the natural event
    // partitioning) to tag every row with its user's cohort week, then one
    // hash agg on (cohort, offset) — two narrow shuffles, no join-back.
    // Week arithmetic stays integer-exact cross-engine: both engines
    // date_trunc to Monday-start weeks, and the offset is an integer
    // division of epoch-second deltas (exact multiples of 604800 in UTC).
    "q112_cohort_retention" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        Tables.events(s, dir)
          .select($"user_id", $"ts")
          .withColumn("cohort", date_trunc("week", min($"ts").over(w)))
          .withColumn("week", date_trunc("week", $"ts"))
          .groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort_week"),
            expr("(cast(week as long) - cast(cohort as long)) div 604800").as("week_offset"))
          .agg(countDistinct($"user_id").as("n_active"))
          .orderBy($"cohort_week", $"week_offset")
      },
      """WITH c AS (
        |  SELECT user_id, ts,
        |    date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort,
        |    date_trunc('week', ts) AS week
        |  FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  (CAST(epoch(week) AS BIGINT) - CAST(epoch(cohort) AS BIGINT)) // 604800 AS week_offset,
        |  COUNT(DISTINCT user_id) AS n_active
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ---- Ordered funnel (signup → view → purchase) ---------------------------------
    // Stage k is reached only by a stage-(k-1) user with a strictly later
    // event of stage k's type — the min-timestamp chaining form, which a
    // naive per-type GROUP BY gets wrong (it ignores order). Three window
    // mins share ONE user_id shuffle (same partitioning, no ordering
    // needed); per-user flags then collapse in a single tiny aggregate.
    // Timestamps compare as raw instants on both engines (events are
    // minutes apart, so the µs-vs-ns representation gap cannot flip a
    // strict inequality — same precedent as the q26 as-of join).
    "q113_funnel_stages" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        val staged = Tables.events(s, dir)
          .select($"user_id", $"event_type", $"ts")
          .withColumn("t1", min(when($"event_type" === "signup", $"ts")).over(w))
          .withColumn("t2", min(when($"event_type" === "view" && $"ts" > $"t1", $"ts")).over(w))
          .withColumn("t3", min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
        staged.groupBy($"user_id")
          .agg(max($"t1").as("t1"), max($"t2").as("t2"), max($"t3").as("t3"))
          .select(
            count(when($"t1".isNotNull, 1)).as("s1"),
            count(when($"t2".isNotNull, 1)).as("s2"),
            count(when($"t3".isNotNull, 1)).as("s3"))
          .selectExpr("stack(3, '1_signup', s1, '2_view', s2, '3_purchase', s3) AS (stage, n_users)")
          .orderBy($"stage")
      },
      """WITH s1 AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
        |                   OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |                   OVER (PARTITION BY user_id) AS t3 FROM s2),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3 FROM s3 GROUP BY 1)
        |SELECT '1_signup' AS stage, COUNT(t1) AS n_users FROM u
        |UNION ALL SELECT '2_view', COUNT(t2) FROM u
        |UNION ALL SELECT '3_purchase', COUNT(t3) FROM u
        |ORDER BY stage""".stripMargin),

    // ---- Conversion latency distribution (signup → first purchase) -----------------
    // The time-to-convert percentiles product teams read next to the
    // funnel: per converting user, seconds from first signup to the first
    // LATER purchase, summarized as min/median/p90/max over users.
    // Latencies are integer second differences (both engines floor the
    // timestamp to epoch seconds — same integer), and the percentile runs
    // over one value per user (bounded by the user population). Same
    // single-shuffle window chaining as q113.
    "q132_conversion_latency" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        val staged = Tables.events(s, dir)
          .select($"user_id", $"event_type", $"ts")
          .withColumn("t1", min(when($"event_type" === "signup", $"ts")).over(w))
          .withColumn("tp", min(when($"event_type" === "purchase" && $"ts" > $"t1", $"ts")).over(w))
        staged.groupBy($"user_id")
          .agg(max($"t1".cast("long")).as("t1s"), max($"tp".cast("long")).as("tps"))
          .filter($"tps".isNotNull)
          .select(($"tps" - $"t1s").as("latency_s"))
          .agg(count(lit(1)).as("n_converted"),
               min($"latency_s").as("min_s"),
               expr("percentile(latency_s, 0.5)").as("med_s"),
               expr("percentile(latency_s, 0.9)").as("p90_s"),
               max($"latency_s").as("max_s"))
      },
      """WITH staged AS (
        |  SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |staged2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
        |              OVER (PARTITION BY user_id) AS tp
        |  FROM staged),
        |chained AS (
        |  SELECT user_id,
        |    max(CAST(floor(epoch(t1)) AS BIGINT)) AS t1s,
        |    max(CAST(floor(epoch(tp)) AS BIGINT)) AS tps
        |  FROM staged2 GROUP BY 1),
        |lat AS (SELECT tps - t1s AS latency_s FROM chained WHERE tps IS NOT NULL)
        |SELECT COUNT(*) AS n_converted, MIN(latency_s) AS min_s,
        |  quantile_cont(latency_s, 0.5) AS med_s,
        |  quantile_cont(latency_s, 0.9) AS p90_s,
        |  MAX(latency_s) AS max_s
        |FROM lat""".stripMargin),

    // ---- Last-touch attribution ----------------------------------------------------
    // Each purchase is credited to the user's most recent PRECEDING
    // non-purchase event (marketing attribution / feature provenance).
    // last(ignoreNulls) over an ordered frame ending at -1 excludes the
    // purchase itself; (ts, event_id) ordering makes the frame total, so
    // no cross-engine tie exists. One shuffle on user_id + one tiny agg.
    "q114_last_touch" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .withColumn("attr",
            last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .groupBy(coalesce($"attr", lit("none")).as("touch"))
          .agg(count(lit(1)).as("n_purchases"), sumExact($"value").as("revenue"))
          .orderBy($"touch")
      },
      s"""SELECT COALESCE(attr, 'none') AS touch, COUNT(*) AS n_purchases,
         |  ${sqlSumExact("value")} AS revenue
         |FROM (
         |  SELECT event_type, value,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
         |  FROM events)
         |WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY touch""".stripMargin),

    // ---- SCD-2 validity-interval join ----------------------------------------------
    // The slowly-changing-dimension lookup the as-of join (q26) can't
    // express: each signup OPENS a status period [ts, next-signup), built
    // with one lead() window, and every purchase lands in the period
    // covering its timestamp — the bounded-interval variant of temporal
    // join, with empty periods preserved (LEFT join on the interval
    // condition, COUNT over the nullable side). Scale shape: the join is
    // EQUI on user_id with the interval predicate as a post-join filter —
    // candidate fan-out is purchases × periods of one user, bounded per
    // key, never cross-user; both sides shuffle once on user_id.
    "q125_scd2_interval_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val wp = Window.partitionBy($"user_id").orderBy($"p_from", $"p_id")
        val periods = ev.filter($"event_type" === "signup")
          .select($"user_id", $"ts".as("p_from"), $"event_id".as("p_id"))
          .withColumn("p_to", lead($"p_from", 1).over(wp))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("b_user"), $"ts".as("b_ts"), $"value")
        periods.join(purchases,
            $"user_id" === $"b_user" && $"b_ts" >= $"p_from" &&
              ($"p_to".isNull || $"b_ts" < $"p_to"), "left")
          .groupBy($"user_id", $"p_from", $"p_to")
          .agg(count($"b_ts").as("n_purchases"), sumExact($"value").as("revenue"))
          .select($"user_id",
            date_format($"p_from", fmt).as("period_start"),
            date_format($"p_to", fmt).as("period_end"),
            $"n_purchases", $"revenue")
          // period_end tiebreak: two same-second periods of one user stay
          // in a deterministic order (groups are distinct on (from, to))
          .orderBy($"user_id", $"period_start", $"period_end")
      },
      s"""WITH sp AS (
         |  SELECT user_id, ts AS p_from, event_id,
         |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p_to
         |  FROM events WHERE event_type = 'signup'),
         |pur AS (SELECT user_id AS b_user, ts AS b_ts, value
         |        FROM events WHERE event_type = 'purchase'),
         |g AS (
         |  SELECT sp.user_id, p_from, p_to,
         |    COUNT(b_ts) AS n_purchases, ${sqlSumExact("value")} AS revenue
         |  FROM sp LEFT JOIN pur
         |    ON b_user = sp.user_id AND b_ts >= p_from
         |       AND (p_to IS NULL OR b_ts < p_to)
         |  GROUP BY 1, 2, 3)
         |SELECT user_id, strftime(p_from, '%Y-%m-%d %H:%M:%S') AS period_start,
         |  strftime(p_to, '%Y-%m-%d %H:%M:%S') AS period_end,
         |  n_purchases, revenue
         |FROM g ORDER BY user_id, period_start, period_end NULLS FIRST""".stripMargin),

    // ---- Time-decayed activity score -----------------------------------------------
    // The recency-weighted feature-store aggregate: each event contributes
    // value · 0.95^age_days toward its user's score, anchored at the
    // corpus's last day (data-derived, so the query is deterministic at
    // every SF). The decay power is an explicit multiplicative fold —
    // (((1·0.95)·0.95)…) — NOT libm pow(): both engines run the identical
    // IEEE multiply chain, so weights are bit-equal cross-engine where a
    // pow() ULP could diverge. The weight then becomes the exact integer
    // floor(w*1e6) — floor of identical doubles is identical, where a 6dp
    // round() is NOT (Spark rounds the exact binary expansion, DuckDB
    // rounds doubles via float multiply; observed 1-ulp flips) — and the
    // weighted sum runs wholly in decimal*integer arithmetic, divided once
    // at the end. Shape: one broadcast scalar (max ts), pure map-side
    // weighting, one partial+final agg on user_id.
    "q130_decayed_score" -> Q(
      (s, dir) => {
        import s.implicits._
        val ref = Tables.events(s, dir).agg(max(to_date($"ts")).as("ref_day"))
        Tables.events(s, dir)
          .crossJoin(broadcast(ref))
          .withColumn("age", datediff($"ref_day", to_date($"ts")))
          .withColumn("w", expr(
            "if(age = 0, 1.0d, aggregate(transform(sequence(1, age), x -> 0.95d), 1.0d, (acc, x) -> acc * x))"))
          .withColumn("w6", floor($"w" * 1e6).cast("long"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
               (sum(dec($"value") * $"w6").cast("double") / 1e6).as("decayed_score"))
          .orderBy($"user_id")
      },
      """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
        |aged AS (
        |  SELECT user_id, value,
        |    datediff('day', CAST(ts AS DATE), ref_day) AS age
        |  FROM events CROSS JOIN ref),
        |weighted AS (
        |  SELECT user_id, value,
        |    CAST(floor((CASE WHEN age = 0 THEN 1.0::DOUBLE
        |         ELSE list_reduce(list_prepend(1.0::DOUBLE,
        |                list_transform(range(age), x -> 0.95::DOUBLE)),
        |              (acc, x) -> acc * x) END) * 1000000.0) AS BIGINT) AS w6
        |  FROM aged)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * w6) AS DOUBLE) / 1000000.0 AS decayed_score
        |FROM weighted GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- Z-score anomaly detection -------------------------------------------------
    // Flags events whose value deviates > 3σ from their type's mean — the
    // monitoring/data-quality outlier gate. Mean and variance come from
    // decimal-exact SUM and SUM-of-squares (order-independent), so the
    // derived doubles are bit-identical cross-engine; the remaining
    // arithmetic ((v-μ)/σ with σ = sqrt(E[x²]−μ²)) is the same IEEE ops in
    // the same order on both sides, and z is rounded before the filter so
    // the cut is on the rounded value. Shape: one partial+final agg (5
    // groups) broadcast back over the scan — no second shuffle.
    "q115_anomaly_zscore" -> Q(
      (s, dir) => {
        import s.implicits._
        val stats = Tables.events(s, dir).groupBy($"event_type").agg(
            count(lit(1)).cast("double").as("n"),
            sum(dec($"value")).cast("double").as("sm"),
            sum(dec($"value") * dec($"value")).cast("double").as("sq"))
          .withColumn("mean", $"sm" / $"n")
          .withColumn("sd", sqrt($"sq" / $"n" - $"mean" * $"mean"))
        Tables.events(s, dir)
          .join(broadcast(stats), Seq("event_type"))
          .withColumn("z", round(($"value" - $"mean") / $"sd", 6))
          .filter(abs($"z") > 3.0d)
          .select($"event_id", $"event_type", $"value", $"z")
          .orderBy($"event_id")
      },
      """WITH s AS (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sm,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq
        |  FROM events GROUP BY 1),
        |z AS (
        |  SELECT event_id, e.event_type, value,
        |    round((value - sm / n) / sqrt(sq / n - (sm / n) * (sm / n)), 6) AS z
        |  FROM events e JOIN s USING (event_type))
        |SELECT event_id, event_type, value, z
        |FROM z WHERE abs(z) > 3.0 ORDER BY event_id""".stripMargin),
  )
}
