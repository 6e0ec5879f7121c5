package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the document near-dup graph (the q42 LSH
  * candidate pairs): PageRank, complementing q57's connected components.
  * Ranking near-dup neighborhoods is how a curation pipeline picks the
  * canonical document of a cluster by centrality rather than min-id.
  *
  * Determinism strategy: per-edge contributions are rounded to 12dp and
  * summed in DECIMAL (order-independent), each iteration's rank is rounded
  * to 12dp — so three iterations stay bit-identical between Spark's
  * parallel aggregation and DuckDB's serial one (the Exact discipline
  * applied to an iterative fixpoint).
  *
  * 100-TB notes: one iteration = one equi-join of ranks to the edge list
  * (both hash-partitioned on src — the join reuses one partitioning) + a
  * narrow (dst, contribution) shuffle + a broadcast-sized dangling-mass
  * scalar. State per iteration is one rank row per node. The edge list is
  * localCheckpoint'd once: iterating on a live lineage would re-derive the
  * whole LSH pipeline every round and re-plan ever-growing DAGs (the q57
  * lesson); a real deployment checkpoints to cluster storage instead.
  */
object GraphQueries {

  private val Damping = 0.85
  private val Iters = 3

  /** Spark-side PageRank over (nodes, undirected edges), `Iters` rounds. */
  private[queries] def pagerank(nodes: DataFrame, edgesUndir: DataFrame): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    val edges = edgesUndir.select($"a".as("src"), $"b".as("dst"))
      .union(edgesUndir.select($"b".as("src"), $"a".as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    // node count as ONE driver scalar (round 17, guide §1.2): as a plan
    // fragment it re-aggregated the node scan inside every iteration's
    // checkpoint (2·iters + 1 subtree executions); the literal carries the
    // identical double (exact integer count) through the same arithmetic
    val n = lit(nodes.count().toDouble)
    var pr = nodes
      .select($"id", (lit(1.0) / n).as("pr")).localCheckpoint(true)
    for (_ <- 1 to Iters) {
      val withDeg = pr.join(deg, pr("id") === deg("src"), "left")
      val contribs = withDeg.filter($"deg".isNotNull)
        .join(edges, "src")
        .select($"dst".as("id"), round($"pr" / $"deg", 12).cast("decimal(38,12)").as("c"))
        .groupBy($"id").agg(sum($"c").cast("double").as("cs"))
      val dangling = withDeg.filter($"deg".isNull)
        .agg(coalesce(sum(round($"pr", 12).cast("decimal(38,12)")).cast("double"), lit(0.0)).as("dg"))
      pr = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select($"id",
          round(lit(1 - Damping) / n +
            lit(Damping) * (coalesce($"cs", lit(0.0)) + $"dg" / n), 12).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** One DuckDB iteration k (reads pr{k-1}, emits pr{k}) — the serial twin
    * of the loop body above, with identical rounding points. */
  private def sqlIter(k: Int): String = {
    val p = s"pr${k - 1}"
    s"""c$k AS (
       |  SELECT e.dst AS id,
       |    CAST(SUM(CAST(ROUND(p.pr / deg.deg, 12) AS DECIMAL(38,12))) AS DOUBLE) AS cs
       |  FROM $p p JOIN deg ON deg.src = p.id JOIN edges e ON e.src = p.id
       |  GROUP BY 1),
       |d$k AS (
       |  SELECT COALESCE(CAST(SUM(CAST(ROUND(p.pr, 12) AS DECIMAL(38,12))) AS DOUBLE), 0.0) AS dg
       |  FROM $p p LEFT JOIN deg ON deg.src = p.id WHERE deg.src IS NULL),
       |pr$k AS (
       |  SELECT p.id,
       |    ROUND(${1 - Damping} / n + $Damping * (COALESCE(c.cs, 0.0) + dg / n), 12) AS pr
       |  FROM $p p LEFT JOIN c$k c ON c.id = p.id, nn, d$k)""".stripMargin
  }

  val all: Seq[(String, Q)] = Seq(

    // ---- PageRank over the LSH near-dup graph (top-20 by rank) ----------------
    "q92_pagerank" -> Q(
      (s, dir) => {
        import s.implicits._
        val edges = Dedup.lshPairGraph(s, dir)
          .filter($"est_jaccard" >= 0.3)
          .select($"a", $"b")
        val nodes = Tables.documents(s, dir).select($"doc_id".as("id"))
        pagerank(nodes, edges)
          .select($"id".as("doc_id"), $"pr")
          .orderBy($"pr".desc, $"doc_id")
          .limit(20)
      },
      s"""WITH ${Dedup.sqlLshPairs},
         |edges AS (SELECT a AS src, b AS dst FROM lsh_pairs
         |          UNION ALL SELECT b, a FROM lsh_pairs),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
         |pr0 AS (SELECT doc_id AS id, 1.0 / n AS pr FROM documents, nn),
         |${(1 to Iters).map(sqlIter).mkString(",\n")}
         |SELECT id AS doc_id, pr FROM pr$Iters
         |ORDER BY pr DESC, doc_id LIMIT 20""".stripMargin),
  )
}
