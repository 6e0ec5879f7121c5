package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (the PII-handling stage of a
  * training-data pipeline): pseudonymization (identifier → one-way hash),
  * generalization (quasi-identifier → coarse band) and k-anonymity
  * suppression (cohorts smaller than k never leave the engine).
  *
  * 100-TB notes: all three steps are one hash-aggregation keyed by the
  * generalized quasi-identifiers — map-side partial aggregation carries the
  * per-cohort counts, so no raw identifier ever crosses the shuffle wider
  * than its fixed-width md5. The HAVING-style suppression is a post-agg
  * filter on the (small) cohort table.
  */
object Privacy {

  private val K = 5

  val all: Seq[(String, Q)] = Seq(

    // ---- Pseudonymize + generalize + k-suppress (customer) ---------------------
    "q94_k_anonymity" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .select($"c_mktsegment",
            floor($"c_acctbal" / 5000).cast("bigint").as("bal_band"),
            md5($"c_name").as("pid"))
          .groupBy($"c_mktsegment", $"bal_band")
          .agg(count(lit(1)).as("n"),
               countDistinct($"pid").as("n_pids"),
               min($"pid").as("sample_pid"))
          .filter($"n" >= K)
          .orderBy($"c_mktsegment", $"bal_band")
      },
      s"""SELECT c_mktsegment, CAST(FLOOR(c_acctbal / 5000) AS BIGINT) AS bal_band,
         |  COUNT(*) AS n, COUNT(DISTINCT md5(c_name)) AS n_pids,
         |  MIN(md5(c_name)) AS sample_pid
         |FROM customer
         |GROUP BY 1, 2 HAVING COUNT(*) >= $K
         |ORDER BY c_mktsegment, bal_band""".stripMargin),
  )
}
