package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators (the PII-handling stage of a
  * training-data pipeline): pseudonymization (identifier → one-way hash),
  * generalization (quasi-identifier → coarse band), k-anonymity
  * suppression (cohorts smaller than k never leave the engine), and
  * text scrubbing (regex PII patterns + literal blocklist terms redacted
  * in place before the corpus leaves the pipeline).
  *
  * 100-TB notes: all three release steps are one hash-aggregation keyed by
  * the generalized quasi-identifiers — map-side partial aggregation carries
  * the per-cohort counts, so no raw identifier ever crosses the shuffle
  * wider than its fixed-width md5. The HAVING-style suppression is a
  * post-agg filter on the (small) cohort table. Scrubbing is pure map-side
  * string work (regexp_replace/replace are codegen'd); only the per-source
  * audit counts and a 48-bit text checksum cross the shuffle.
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

    // ---- PII / blocklist scrubbing audit ----------------------------------------
    // The scrub stage every released corpus passes: a regex rule for
    // email-shaped spans (→ <EMAIL>) and a literal term blocklist
    // (→ <TERM>), applied in place. Emitted per source: docs touched,
    // per-rule hit counts, and a 48-bit md5 checksum of every scrubbed
    // text — so the oracle certifies the redacted BYTES, not just the
    // counts. Term hits are counted by length delta (exact integers);
    // the email count is regexp-based on the raw text. All string work
    // is map-side; the audit rollup is the only (tiny) shuffle. The
    // checksum sums 48-bit values — even 10^4 docs per source stay 10^3
    // below the int64 ceiling (2^48 * 10^4 < 2^62), and at larger
    // per-source cardinality the same sum routes through DECIMAL(38,0)
    // unchanged.
    "q108_pii_scrub" -> Q(
      (s, dir) => {
        import s.implicits._
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        Tables.documents(s, dir)
          .withColumn("r1", regexp_replace($"text", email, "<EMAIL>"))
          .withColumn("scrubbed",
            expr("replace(replace(r1, 'customer', '<TERM>'), 'vector', '<TERM>')"))
          .withColumn("n_email", regexp_count($"text", lit(email)).cast("long"))
          .withColumn("n_term",
            (((length($"r1") - length(expr("replace(r1, 'customer', '')"))) / 8) +
             ((length($"r1") - length(expr("replace(r1, 'vector', '')"))) / 6)).cast("long"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
               count(when($"scrubbed" =!= $"text", 1)).as("n_docs_scrubbed"),
               sum($"n_email").as("n_email_hits"),
               sum($"n_term").as("n_term_hits"),
               sum(expr("cast(conv(substring(md5(scrubbed), 1, 12), 16, 10) as bigint)"))
                 .as("scrubbed_checksum"))
          .orderBy($"source")
      },
      """WITH r AS (
        |  SELECT source, text,
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                   '<EMAIL>', 'g') AS r1
        |  FROM documents),
        |scrub AS (
        |  SELECT source, text, r1,
        |    replace(replace(r1, 'customer', '<TERM>'), 'vector', '<TERM>') AS scrubbed,
        |    len(regexp_extract_all(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    (length(r1) - length(replace(r1, 'customer', ''))) // 8 +
        |    (length(r1) - length(replace(r1, 'vector', ''))) // 6 AS n_term
        |  FROM r)
        |SELECT source, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (scrubbed != text) AS n_docs_scrubbed,
        |  CAST(SUM(n_email) AS BIGINT) AS n_email_hits,
        |  CAST(SUM(n_term) AS BIGINT) AS n_term_hits,
        |  CAST(SUM(CAST(('0x' || substring(md5(scrubbed), 1, 12)) AS BIGINT)) AS BIGINT)
        |    AS scrubbed_checksum
        |FROM scrub GROUP BY source ORDER BY source""".stripMargin),
  )
}
