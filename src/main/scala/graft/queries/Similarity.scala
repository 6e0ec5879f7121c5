package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star surface):
  * brute-force cosine top-k as the exactness baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path.
  *
  * The query vector is taken from the data itself (vec_id = 0) so the
  * queries are deterministic at every scale factor without external input.
  *
  * 100-TB notes: brute-force top-k is scan → per-partition heap top-k →
  * k-row driver merge (`TakeOrderedAndProject`) — O(k) memory at any scale,
  * but reads every vector. The LSH path buckets vectors by hyperplane sign
  * bits (map-side, no shuffle to build), and probes only the query's bucket
  * (+ optional hamming-1 neighbors): a partition-pruned equi-lookup instead
  * of a full scan. Hyperplane components derive from xxhash64(plane, dim) —
  * deterministic across the cluster, no driver-side randomness to ship.
  */
object Similarity {

  /** embeddings with the vector cast to double + its L2 norm (norm via the
    * native codegen'd vec_dot — graft.functions.DotProduct). */
  private[queries] def normed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.VectorFunctions.vecDot
    Tables.embeddings(s, dir)
      .select($"vec_id", $"label", expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(vecDot($"v", $"v")))
  }

  private val Planes = 6 // 64 buckets

  /** Sign-bit bucket id from `Planes` pseudo-random hyperplanes.
    * Plane p's d-th component is ±1 from the parity of xxhash64(p, d) —
    * deterministic, computed inline per row (nothing broadcast). */
  private[queries] def lshBucket(v: Column): Column =
    expr(s"""aggregate(
      transform(sequence(0, ${Planes - 1}), p ->
        if(aggregate(zip_with(v, sequence(0, size(v) - 1),
             (x, d) -> if(pmod(xxhash64(p, d), 2) = 0, x, -x)),
           0d, (acc, x) -> acc + x) > 0d, shiftleft(1, p), 0)),
      0, (acc, x) -> acc + x)""")

  val all: Seq[(String, Q)] = Seq(

    // ---- Brute-force cosine top-k --------------------------------------------
    "q50_knn_brute" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = normed(s, dir)
        val q = e.filter($"vec_id" === 0)
          .select($"v".as("qv"), $"nrm".as("qn"))
        e.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("dot", graft.functions.VectorFunctions.vecDot($"v", $"qv"))
          .withColumn("cos_sim", round($"dot" / ($"nrm" * $"qn"), 6))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
          .select($"vec_id", $"label", $"cos_sim")
      },
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(list_inner_product(v, qv) / (nrm * qn), 6) AS cos_sim
        |FROM n, q WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),

    // ---- Centroid stats per label (embedding aggregation) ----------------------
    // Element-wise mean vector per label via posexplode → (label, dim)
    // partial sums: one narrow shuffle of label x dim rows. Exactness: each
    // element is normalized to DECIMAL(25,9) per row (same rounding in both
    // engines), summed exactly in decimal (order-independent), and the
    // decimal total — exactly representable as a double at these magnitudes —
    // is divided once in double by the exact count. No order-dependent
    // double accumulation remains, so the query is oracle-checked like every
    // other aggregate (the Exact.dec discipline, at embedding precision).
    "q52_label_centroids" -> Q(
      (s, dir) => {
        import s.implicits._
        val dims = normed(s, dir)
          .select($"label", posexplode($"v"))
          .groupBy($"label", $"pos")
          .agg(sum($"col".cast("decimal(25,9)")).cast("double").as("s"),
               count(lit(1)).as("n"))
        dims.groupBy($"label")
          .agg(count(lit(1)).as("n_dims"),
               round(max($"s" / $"n"), 6).as("max_mean_dim"),
               round(min($"s" / $"n"), 6).as("min_mean_dim"))
          .orderBy($"label")
      },
      """WITH e AS (
        |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT label, i AS pos, CAST(v[i] AS DECIMAL(25,9)) AS c
        |  FROM e, (SELECT unnest(range(1, 65)) AS i)),
        |dims AS (
        |  SELECT label, pos, CAST(SUM(c) AS DOUBLE) AS s, COUNT(*) AS n
        |  FROM d GROUP BY 1, 2)
        |SELECT label, COUNT(*) AS n_dims,
        |  round(MAX(s / n), 6) AS max_mean_dim,
        |  round(MIN(s / n), 6) AS min_mean_dim
        |FROM dims GROUP BY label ORDER BY label""".stripMargin),

    // ---- LSH-bucketed ANN (scale path; no SQL twin: xxhash64 buckets) -----------
    // Probes only the query vector's bucket; recall vs q50 checked in
    // SimilaritySpec rather than an oracle.
    "q51_ann_lsh" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = normed(s, dir).withColumn("bucket", lshBucket($"v"))
        val q = e.filter($"vec_id" === 0)
          .select($"v".as("qv"), $"nrm".as("qn"), $"bucket".as("qbucket"))
        e.filter($"vec_id" =!= 0)
          .join(broadcast(q), $"bucket" === $"qbucket")
          .withColumn("dot", graft.functions.VectorFunctions.vecDot($"v", $"qv"))
          .withColumn("cos_sim", round($"dot" / ($"nrm" * $"qn"), 6))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
          .select($"vec_id", $"label", $"bucket", $"cos_sim")
      },
      None),

    // ---- IVF-probe ANN (coarse quantizer + nprobe=1) ------------------------------
    // Inverted-file search: centroids from one aggregation pass (mean vector
    // per label — the coarse quantizer), the query probes only its nearest
    // centroid's list. At scale the lists are Hive partitions of a vector
    // table and probing is partition pruning. Spec-checked recall vs q50.
    "q53_ann_ivf" -> Q(
      (s, dir) => {
        import s.implicits._
        import graft.functions.VectorFunctions.vecDot
        val e = normed(s, dir)
        // coarse quantizer: element-wise mean per label (one narrow shuffle)
        val centroids = e.select($"label", posexplode($"v"))
          .groupBy($"label", $"pos").agg(avg($"col").as("m"))
          .groupBy($"label").agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
          .select($"label".as("c_label"), expr("transform(pm, x -> x.m)").as("centroid"))
        val q = e.filter($"vec_id" === 0).select($"v".as("qv"), $"nrm".as("qn"))
        // probe = nearest centroid to the query (tiny cross join, k rows)
        val probe = centroids.crossJoin(broadcast(q))
          .withColumn("cd", vecDot($"centroid", $"qv"))
          .orderBy($"cd".desc, $"c_label").limit(1)
          .select($"c_label", $"qv", $"qn")
        // scan ONLY the probed inverted list
        e.filter($"vec_id" =!= 0)
          .join(broadcast(probe), $"label" === $"c_label")
          .withColumn("cos_sim", round(vecDot($"v", $"qv") / ($"nrm" * $"qn"), 6))
          .orderBy($"cos_sim".desc, $"vec_id")
          .limit(10)
          .select($"vec_id", $"label", $"cos_sim")
      },
      None),
  )
}
