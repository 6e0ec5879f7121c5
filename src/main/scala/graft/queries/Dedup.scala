package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (north-star LLM-
  * pipeline surface): exact dedup, normalized-content-hash dedup, MinHash+LSH
  * candidate pairs, SimHash, exact n-gram Jaccard, and embedding-cosine
  * near-dup pairs.
  *
  * Oracle policy: md5-based fingerprints and integer set arithmetic are
  * bit-identical in DuckDB → oracle-checked. MinHash/SimHash build on Spark's
  * xxhash64 (no DuckDB twin) → rows-only check + scalatest properties
  * (DedupSpec): planted duplicates must be found, signatures are stable.
  *
  * 100-TB notes: every dedup here is one shuffle keyed by a fixed-width hash
  * (64-bit or md5), so shuffle rows are narrow regardless of document size;
  * map-side partial aggregation absorbs token skew. LSH banding turns the
  * quadratic all-pairs problem into an equi-join on (band, band_signature) —
  * the join fans out only within buckets, which banding keeps small; this is
  * the standard scale path when a brute self-join is impossible.
  */
object Dedup {

  /** doc_id + distinct token set, the base for shingle/minhash ops. */
  private def docTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("token"))
      .filter(length($"token") > 0)
  }

  /** doc_id + distinct 3-token shingle (order-preserving n-grams). */
  private def docShingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("toks")) // tokenize once
      .filter(size($"toks") >= 3)
      .select($"doc_id",
        explode(array_distinct(
          // shingle i = toks[i..i+2] joined; sequence over 0..n-3
          expr("transform(sequence(0, size(toks) - 3), " +
               "i -> concat_ws(' ', slice(toks, i + 1, 3)))")
        )).as("shingle"))
  }

  private val MinhashK = 32 // 8 bands x 4 rows
  private val Bands = 8
  private val RowsPerBand = MinhashK / Bands

  /** MinHash signature per doc over its 3-gram SHINGLE set:
    * sig[i] = min over shingles of xxhash64(i, shingle). Shingles (not
    * unigrams) keep signatures discriminative even over a small shared
    * vocabulary — with unigram sets nearly every doc would collide into
    * every LSH bucket and the candidate join would go quadratic.
    * One narrow shuffle on doc_id; the K mins fold map-side. */
  private[queries] def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigCols = (0 until MinhashK).map(i => min(xxhash64(lit(i), $"shingle")).as(s"h$i"))
    docShingles(s, dir)
      .groupBy($"doc_id")
      .agg(sigCols.head, sigCols.tail: _*)
      .select($"doc_id", array((0 until MinhashK).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs (a < b) sharing at least one band, with the
    * signature-estimated Jaccard. Pairs travel as bare (a, b) ids through
    * the dedup; the (small) signature table joins back afterwards — wide
    * signature arrays never enter the shuffle of the pair join. */
  private[queries] def lshCandidates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = minhashSignatures(s, dir)
    val banded = sigs.select($"doc_id",
        posexplode(expr(s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> xxhash64(b, slice(sig, b * $RowsPerBand + 1, $RowsPerBand)))")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_sig"))
    val l = banded.select($"band", $"band_sig", $"doc_id".as("a"))
    val r = banded.select($"band", $"band_sig", $"doc_id".as("b"))
    val pairs = l.join(r, Seq("band", "band_sig"))
      .filter($"a" < $"b")
      .select($"a", $"b").distinct()
    pairs
      .join(sigs.select($"doc_id".as("a"), $"sig".as("sig_a")), "a")
      .join(sigs.select($"doc_id".as("b"), $"sig".as("sig_b")), "b")
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), t -> t)) / cast($MinhashK as double)"))
      .select($"a", $"b", $"est_jaccard")
  }

  /** 64-bit SimHash per doc as a bit array: per bit, +1 if the token hash
    * has it set else -1, summed over tokens; bit = sign of the sum. */
  private[queries] def simhashBits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val th = docTokens(s, dir).withColumn("h", xxhash64($"token"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    th.groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select($"doc_id",
        array((0 until 64).map(i => (col(s"b$i") > 0).cast("int")): _*).as("bits"))
  }

  val all: Seq[(String, Q)] = Seq(

    // ---- Exact dedup: keep min doc_id per identical text ------------------------
    "q40_exact_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"text").orderBy($"doc_id")
        Tables.documents(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_survivors"))
          .orderBy($"lang")
      },
      """SELECT lang, COUNT(*) AS n_survivors FROM (
        |  SELECT lang, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1
        |GROUP BY lang ORDER BY lang""".stripMargin),

    // ---- Normalized bag-of-words hash dedup --------------------------------------
    // Fingerprint = md5 of the sorted token multiset: catches reordered /
    // re-whitespaced near-copies. Fixed-width md5 keys keep the shuffle narrow.
    "q41_bow_hash_dedup" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .withColumn("fp", md5(concat_ws(" ", array_sort(split(lower(trim($"text")), " ")))))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), countDistinct($"fp").as("n_unique_bow"))
          .orderBy($"source")
      },
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique_bow
        |FROM (SELECT source,
        |        md5(array_to_string(list_sort(string_split(lower(trim(text)), ' ')), ' ')) AS fp
        |      FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin),

    // ---- MinHash + LSH banding candidate pairs (no SQL twin: xxhash64) ------------
    "q42_minhash_lsh" -> Q(
      (s, dir) => {
        import s.implicits._
        lshCandidates(s, dir)
          .filter($"est_jaccard" >= 0.3)
          .orderBy($"a", $"b")
      },
      None),

    // ---- Exact n-gram (3-shingle) Jaccard via inverted-index join ------------------
    // Candidates = pairs sharing >= 1 shingle (the inverted index bounds the
    // quadratic blowup); Jaccard from integer intersection/union counts.
    "q43_ngram_jaccard" -> Q(
      (s, dir) => {
        import s.implicits._
        val sh = docShingles(s, dir)
        val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        val a = sh.select($"shingle", $"doc_id".as("a"))
        val b = sh.select($"shingle", $"doc_id".as("b"))
        val inter = a.join(b, "shingle").filter($"a" < $"b")
          .groupBy($"a", $"b").agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnsRenamed(Map("doc_id" -> "a", "n" -> "n_a")), "a")
          .join(sizes.withColumnsRenamed(Map("doc_id" -> "b", "n" -> "n_b")), "b")
          .withColumn("jaccard", $"n_inter".cast("double") / ($"n_a" + $"n_b" - $"n_inter"))
          .filter($"jaccard" >= 0.02)
          .select($"a", $"b", $"n_inter", $"jaccard")
          .orderBy($"a", $"b")
      },
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(sh)) AS shingle FROM (
        |    SELECT doc_id,
        |      [array_to_string(toks[i:i+2], ' ')
        |       FOR i IN range(1, len(toks) - 1)] AS sh
        |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_inter
        |  FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, n_inter,
        |  CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.02
        |ORDER BY a, b""".stripMargin),

    // ---- SimHash (64-bit, as bit array + hex) — no SQL twin: xxhash64 --------------
    "q44_simhash" -> Q(
      (s, dir) => {
        import s.implicits._
        simhashBits(s, dir)
          .withColumn("simhash_hex",
            expr("conv(concat_ws('', transform(reverse(bits), b -> cast(b as string))), 2, 16)"))
          // hex only: the raw bits array would crash the driver's pandas
          // comparator (arrays are unhashable when it sorts rows)
          .select($"doc_id", $"simhash_hex")
          .orderBy($"doc_id")
      },
      None),

    // ---- SimHash near-dup pairs: banded buckets + native hamming filter -----------
    // 64 bits in 4 bands of 16: any pair within hamming distance 3 shares
    // at least one identical band (pigeonhole), so the equi-join on
    // (band, band bits) finds all close pairs without an all-pairs scan;
    // the codegen'd hamming() then filters exactly.
    "q46_simhash_pairs" -> Q(
      (s, dir) => {
        import s.implicits._
        import graft.functions.VectorFunctions.hamming
        val bits = simhashBits(s, dir)
        val banded = bits.select($"doc_id", $"bits",
            posexplode(expr("transform(sequence(0, 3), b -> slice(bits, b * 16 + 1, 16))")))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_bits"))
        val l = banded.select($"band", $"band_bits", $"doc_id".as("a"))
        val r = banded.select($"band", $"band_bits", $"doc_id".as("b"))
        val pairs = l.join(r, Seq("band", "band_bits")).filter($"a" < $"b")
          .select($"a", $"b").distinct()
        pairs
          .join(bits.select($"doc_id".as("a"), $"bits".as("bits_a")), "a")
          .join(bits.select($"doc_id".as("b"), $"bits".as("bits_b")), "b")
          .withColumn("hamming_dist", hamming($"bits_a", $"bits_b"))
          .filter($"hamming_dist" <= 3)
          .select($"a", $"b", $"hamming_dist")
          .orderBy($"a", $"b")
      },
      None),

    // ---- Embedding-cosine near-dup pairs --------------------------------------------
    // Brute all-pairs at test scale; the LSH-bucketed scale path is
    // q51_ann_lsh (Similarity). Dot products fold in index order in both
    // engines; output rounded to 6 dp to absorb the last-bit difference
    // between (a·b)/(|a||b|) evaluation orders.
    "q45_embedding_neardup" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = Tables.embeddings(s, dir)
          .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
        import graft.functions.VectorFunctions.vecDot
        val withNorm = e.withColumn("nrm", sqrt(vecDot($"v", $"v")))
        val l = withNorm.select($"vec_id".as("a"), $"v".as("va"), $"nrm".as("na"))
        val r = withNorm.select($"vec_id".as("b"), $"v".as("vb"), $"nrm".as("nb"))
        l.crossJoin(r).filter($"a" < $"b")
          .withColumn("dot", vecDot($"va", $"vb"))
          .withColumn("cos_sim", round($"dot" / ($"na" * $"nb"), 6))
          .filter($"cos_sim" >= 0.3)
          .select($"a", $"b", $"cos_sim")
          .orderBy($"a", $"b")
      },
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e)
        |SELECT x.vec_id AS a, y.vec_id AS b,
        |  round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos_sim
        |FROM n x JOIN n y ON x.vec_id < y.vec_id
        |WHERE round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.3
        |ORDER BY a, b""".stripMargin),
  )
}
