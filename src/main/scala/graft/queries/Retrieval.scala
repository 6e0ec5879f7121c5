package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Ranked retrieval + frequency sketching over `documents` (north-star
  * LLM-pipeline surface): BM25 keyword search and count-min-sketch heavy
  * hitters.
  *
  * Determinism strategy: BM25 uses the rational idf (N - df + .5)/(df + .5)
  * instead of its log — same ranking monotonicity, but a pure arithmetic
  * function of integer counts, so Spark and DuckDB agree bit-for-bit (libm
  * log bits differ across engines — the q36 lesson). Per-term scores are
  * rounded then summed in DECIMAL (the repo's Exact discipline), so the
  * 2-3-term sum has no accumulation-order dependence.
  *
  * 100-TB notes (BM25): doc length is a map-side expression; the only
  * corpus-wide shuffles are the (doc, term) tf aggregation — FILTERED to the
  * query terms before the shuffle, so shuffle volume is O(matching
  * postings), not O(corpus) — and a vocabulary-bounded df aggregation whose
  * result broadcasts. Top-k is TakeOrderedAndProject. This is the
  * scatter-gather shape of a distributed inverted index probe.
  */
object Retrieval {

  /** Fixed query terms (present across the synthetic corpus at every SF). */
  private val Terms = Seq("join", "filter", "window")
  private val K1 = 1.2
  private val B = 0.75

  val all: Seq[(String, Q)] = Seq(

    // ---- BM25 ranked keyword search (top-20) -----------------------------------
    "q91_bm25_search" -> Q(
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val dl = docs.select($"doc_id", size(split($"text", " ")).cast("long").as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"),
          (sum($"dl").cast("double") / count(lit(1))).as("avgdl"))
        // tf feeds the df aggregation AND the scoring join — materialize
        // the tokenize + term filter + count once (guide §1.2)
        val tf = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
          .filter($"token".isin(Terms: _*)) // prune BEFORE the shuffle
          .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
        val dfT = tf.groupBy($"token").agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfT), "token")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("tsc", round(
            (($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5))) *
              ($"tf" * lit(K1 + 1)) /
              ($"tf" + lit(K1) * (lit(1 - B) + lit(B) * $"dl" / $"avgdl")), 9))
          .groupBy($"doc_id")
          .agg(round(sum($"tsc".cast("decimal(28,9)")).cast("double"), 6).as("bm25"),
               count(lit(1)).as("n_terms"))
          .orderBy($"bm25".desc, $"doc_id")
          .limit(20)
      },
      s"""WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
         |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
         |tf AS (
         |  SELECT doc_id, token, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |  WHERE token IN ('join', 'filter', 'window') GROUP BY 1, 2),
         |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT doc_id,
         |    ROUND((n_docs - df + 0.5) / (df + 0.5) * (tf * ${K1 + 1}) /
         |          (tf + $K1 * (${1 - B} + $B * dl / avgdl)), 9) AS tsc
         |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats)
         |SELECT doc_id,
         |  ROUND(CAST(SUM(CAST(tsc AS DECIMAL(28,9))) AS DOUBLE), 6) AS bm25,
         |  COUNT(*) AS n_terms
         |FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin),

    // ---- Count-min-sketch heavy hitters (top-20 by estimate) --------------------
    // The streaming-frequency sketch: depth x width counter grid, cell
    // (r, h_r(token) % W) accumulates the token's occurrences; the estimate
    // is the min over rows (never an undercount). Built here in its
    // map-side-partial form — per-token exact counts first (that IS the
    // map-side combine), then summed into cells — which is algebraically the
    // per-occurrence increment stream. The grid is D x W counters TOTAL
    // regardless of corpus size: that fixed memory bound (vs the unbounded
    // exact vocabulary) is the whole point at 100 TB, and cell grids from
    // disjoint partitions merge by addition (mergeability spec'd). Hashes
    // are the portable md5-60bit (row-salted), so the DuckDB twin rebuilds
    // the identical grid — sketch contents, estimates and ranking are fully
    // oracle-checked, unlike typical impl-defined sketches.
    "q93_heavy_hitters" -> Q(
      (s, dir) => {
        import s.implicits._
        val (d, w) = (4, 1024)
        val cellExpr = s"""transform(sequence(0, ${d - 1}), i ->
          cast(conv(substring(md5(concat(cast(i as string), ':', token)), 1, 15), 16, 10) as bigint) % $w)"""
        val exact = Tables.documents(s, dir)
          .select(explode(split($"text", " ")).as("token"))
          .filter(length($"token") > 0)
          .groupBy($"token").agg(count(lit(1)).as("n_exact"))
        // NOT materialized (round 17, measured): cells does feed two plan
        // references, but a localCheckpoint benched SLOWER (0.48 → 0.57 s
        // at sf0.1) — the vocab-sized md5 recompute is cheaper than the
        // materialization + lost scan parallelism at this shape
        val cells = exact.select($"token", $"n_exact", posexplode(expr(cellExpr)))
          .withColumnsRenamed(Map("pos" -> "r", "col" -> "cell"))
        val counters = cells.groupBy($"r", $"cell").agg(sum($"n_exact").as("cnt"))
        cells.join(counters, Seq("r", "cell"))
          .groupBy($"token", $"n_exact").agg(min($"cnt").as("est"))
          .select($"token", $"est", $"n_exact", ($"est" - $"n_exact").as("overcount"))
          .orderBy($"est".desc, $"token")
          .limit(20)
      },
      """WITH ft AS (
        |  SELECT token FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE length(token) > 0),
        |exact AS (SELECT token, COUNT(*) AS n_exact FROM ft GROUP BY 1),
        |cells AS (
        |  SELECT token, n_exact, r,
        |    CAST(('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || token), 1, 15)) AS BIGINT) % 1024 AS cell
        |  FROM exact, (SELECT unnest(range(4)) AS r)),
        |counters AS (SELECT r, cell, CAST(SUM(n_exact) AS BIGINT) AS cnt
        |             FROM cells GROUP BY 1, 2),
        |est AS (
        |  SELECT token, n_exact, MIN(cnt) AS est
        |  FROM cells JOIN counters USING (r, cell) GROUP BY 1, 2)
        |SELECT token, est, n_exact, est - n_exact AS overcount
        |FROM est ORDER BY est DESC, token LIMIT 20""".stripMargin),
  )
}
