package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic properties of the round-4 operators that the hash-equality
  * oracle can't express: BM25's ranking invariants, the count-min sketch's
  * overestimate + mergeability guarantees, PageRank's mass conservation and
  * centrality ordering, k-anonymity's cohort floor, and the quantizer's
  * reconstruction quality bound.
  */
class RetrievalGraphSpec extends SparkTestBase {

  test("bm25: results rank by score, and every hit contains a query term") {
    import spark.implicits._
    val rows = SparkEntry_q("q91_bm25_search").collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sortBy(-_)), "not sorted by score desc")
    assert(rows.forall(_.getAs[Long]("n_terms") <= 3))
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = graft.Tables.documents(spark, sfDir)
      .filter($"doc_id".isin(hitIds.toSeq: _*))
      .filter(size(array_intersect(split($"text", " "),
        typedLit(Seq("join", "filter", "window")))) > 0)
      .count()
    assert(withTerm === hitIds.size, "a ranked doc contains no query term")
  }

  test("cms: estimate never undercounts (the count-min guarantee)") {
    val rows = SparkEntry_q("q93_heavy_hitters").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("overcount") >= 0L),
      "count-min produced an undercount")
  }

  test("cms: grids from disjoint corpus halves merge by addition") {
    import spark.implicits._
    val toks = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
    def grid(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      df.select($"token",
          posexplode(expr("""transform(sequence(0, 3), i ->
            cast(conv(substring(md5(concat(cast(i as string), ':', token)), 1, 15), 16, 10) as bigint) % 1024)""")))
        .groupBy($"pos", $"col").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val half1 = grid(toks.filter($"doc_id" < 250))
    val half2 = grid(toks.filter($"doc_id" >= 250))
    val whole = grid(toks)
    val merged = (half1.keySet ++ half2.keySet).map(k =>
      k -> (half1.getOrElse(k, 0L) + half2.getOrElse(k, 0L))).toMap
    assert(merged === whole, "sketch grids are not additive")
  }

  test("pagerank: mass conserved and deterministic across evaluations") {
    import spark.implicits._
    val edges = Dedup.lshCandidates(spark, sfDir)
      .filter($"est_jaccard" >= 0.3).select($"a", $"b")
    val nodes = graft.Tables.documents(spark, sfDir).select($"doc_id".as("id"))
    val pr = GraphQueries.pagerank(nodes, edges)
    val total = pr.agg(sum($"pr")).first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total drifted from 1")
    val a = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = GraphQueries.pagerank(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b, "pagerank not deterministic")
  }

  test("pagerank: a planted hub outranks its spokes") {
    import spark.implicits._
    val nodes = (0L to 10L).toDF("id")
    // star: node 0 linked to every other node
    val edges = (1L to 10L).map(i => (0L, i)).toDF("a", "b")
    val pr = GraphQueries.pagerank(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 10L).forall(i => pr(0L) > pr(i)),
      s"hub does not dominate: $pr")
  }

  test("k-anonymity: every released cohort has >= k members, ids only hashed") {
    val released = SparkEntry_q("q94_k_anonymity").collect()
    assert(released.nonEmpty)
    assert(released.forall(_.getAs[Long]("n") >= 5L), "cohort below k released")
    assert(released.forall(r => r.getAs[Long]("n_pids") <= r.getAs[Long]("n")))
    assert(released.forall(_.getAs[String]("sample_pid").matches("[0-9a-f]{32}")),
      "pseudonym is not a bare md5")
  }

  test("quantize: max element saturates to 127 and reconstruction stays tight") {
    val rows = SparkEntry_q("q95_embedding_quantize").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("max_abs_q") === 127),
      "symmetric scaling must map max|x| to 127")
    assert(rows.forall(_.getAs[Double]("recon_cos") >= 0.999),
      "int8 reconstruction cosine below 0.999")
  }

  test("incremental CDF aggregate equals the full head recompute") {
    import spark.implicits._
    val incremental = SparkEntry_q("q76_incremental_agg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = TableQueries.ivmTable(spark).toDF
      .groupBy($"category")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(incremental === recomputed,
      "delta-maintained aggregate diverged from recompute")
  }

  test("range window: frame peers share aggregates; frames bounded by the hour") {
    import spark.implicits._
    val rows = SparkEntry_q("q96_rolling_range_window").limit(5000).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_1h") >= 1L), "a row must be in its own frame")
  }

  test("histogram quantiles land within one bin width of the exact percentile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val est = SparkEntry_q("q99_histogram_quantiles")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
           expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val binW = 1100.0
    for ((flag, (e50, e95)) <- est) {
      assert(math.abs(e50 - exact(flag)._1) <= binW,
        s"$flag p50 est $e50 vs exact ${exact(flag)._1}")
      assert(math.abs(e95 - exact(flag)._2) <= binW,
        s"$flag p95 est $e95 vs exact ${exact(flag)._2}")
    }
  }

  test("streaming upsert sink is idempotent: a replay inserts nothing") {
    val first = SparkEntry_q("q78_stream_upsert_sink").collect()
    val again = SparkEntry_q("q78_stream_upsert_sink").collect()
    assert(first.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "replaying the stream changed the upsert target")
    assert(first.forall(r => r.getAs[Long]("n_users") === r.getAs[Long]("n_rows")),
      "duplicate rows survived the keyed merge")
  }

  private def SparkEntry_q(name: String, dir: String = sfDir) =
    graft.SparkEntry.queries(name)(spark, dir)
}
