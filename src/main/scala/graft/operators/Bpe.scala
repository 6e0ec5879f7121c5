package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair encoding, trained DISTRIBUTED — the real subword-tokenizer
  * construction (Sennrich et al. 2016), not a regex stand-in.
  *
  * Train: each document starts as its character sequence; every round one
  * Spark aggregation counts all adjacent token pairs corpus-wide, the
  * driver takes the argmax (ties break to the lexicographically smallest
  * pair — the determinism tests and the oracle depend on it), and a
  * map-side pass merges that pair everywhere. The driver loop is bounded
  * by `numMerges` (the vocab budget), exactly like the IVF trainer's
  * k-means rounds; the corpus itself never collects.
  *
  * Apply: a learned merge table encodes any text by replaying merges in
  * rank order — pure per-row Scala inside a typed map (map-side, no UDF
  * in the SQL sense, no shuffle). Decode is concatenation, so
  * decode(encode(x)) == x holds by construction — the property BpeSpec
  * pins on real documents.
  *
  * 100-TB notes: each training round is one shuffle on pair keys (narrow
  * pair strings, never documents) + a 1-row collect; applying is
  * embarrassingly parallel. `cache()` on the evolving token corpus keeps
  * rounds from replaying the whole merge history (the plan would
  * otherwise deepen linearly with rounds). For production vocab sizes the
  * O(numMerges)-job loop is the wrong shape — `trainHistogram` is the
  * production path: ONE corpus pass builds the (word, count) histogram,
  * and the whole merge loop runs driver-side on that vocab-bounded table
  * (Sennrich 2016's actual procedure), proven bit-identical to the
  * distributed word-level trainer by BpeSpec.
  */
object Bpe {

  /** One learned merge: concatenate `left + right` wherever adjacent. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Initial tokenization: one token per character (char-level BPE; a
    * byte-level variant only changes this seed). */
  def seed(text: String): IndexedSeq[String] = text.map(_.toString)

  private def mergeOnce(tokens: IndexedSeq[String], left: String, right: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < tokens.length) {
      if (i + 1 < tokens.length && tokens(i) == left && tokens(i + 1) == right) {
        out += (left + right); i += 2
      } else { out += tokens(i); i += 1 }
    }
    out.result()
  }

  /** Learn up to `numMerges` merges from `corpus`. Stops early when no
    * adjacent pair is left. Deterministic: max count, then lexicographic
    * (left, right). */
  def train(corpus: Dataset[String], numMerges: Int): Seq[Merge] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    trainLoop(corpus.map(t => seed(t): Seq[String]), numMerges)
  }

  /** Distributed word-level trainer: merges never cross a whitespace
    * boundary (Sennrich's formulation — each word occurrence is its own
    * sequence). Still O(numMerges) Spark aggregations; exists as the
    * reference computation the histogram trainer below is proven
    * bit-identical to (BpeSpec). */
  def trainWords(corpus: Dataset[String], numMerges: Int): Seq[Merge] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    trainLoop(corpus.flatMap(_.split(' ').iterator.filter(_.nonEmpty)
      .map(w => seed(w): Seq[String]).toSeq), numMerges)
  }

  private def trainLoop(seqs: Dataset[Seq[String]], numMerges: Int): Seq[Merge] = {
    val spark = seqs.sparkSession
    import spark.implicits._
    var toks = seqs.cache()
    toks.count() // materialize the seed before the loop mutates lineage
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = toks.flatMap(ts => ts.iterator.zip(ts.iterator.drop(1)).map {
          case (a, b) => (a, b) })
        .toDF("left", "right")
        .groupBy($"left", $"right").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"left", $"right")
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(rank, l, r)
        val prev = toks
        toks = toks.map(ts => mergeOnce(ts.toIndexedSeq, l, r): Seq[String]).cache()
        toks.count() // pin THIS round's state; then drop the previous cache
        prev.unpersist()
        rank += 1
      }
    }
    toks.unpersist()
    merges.result()
  }

  /** PRODUCTION training shape (Sennrich et al. 2016's actual procedure):
    * ONE corpus pass collects the (word, count) histogram — vocab-bounded,
    * safe to hold driver-side — and the entire merge loop runs on the
    * histogram with occurrence counts as weights. Job count drops from
    * O(numMerges) corpus-wide aggregations (50k sequential Spark jobs for
    * a 50k vocab) to O(1) corpus passes; each driver round touches only
    * the distinct-word table, not the corpus. Bit-identical to
    * `trainWords` by BpeSpec — same pair counts (a pair's corpus count is
    * Σ per-word count × word frequency), same argmax, same tie-break. */
  def trainHistogram(corpus: Dataset[String], numMerges: Int): Seq[Merge] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val histo = corpus.flatMap(_.split(' ').iterator.filter(_.nonEmpty).toSeq)
      .groupBy($"value").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    trainFromHistogram(histo.toSeq, numMerges)
  }

  /** Driver-side merge loop over a weighted word histogram. The
    * tie-break comparator matches Spark's string ordering exactly
    * (unsigned UTF-8 bytes), so the result is bit-identical to the
    * distributed trainer even on non-ASCII vocabularies where UTF-16
    * code-unit order (plain String.compareTo) diverges. */
  def trainFromHistogram(histo: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    import java.nio.charset.StandardCharsets.UTF_8
    def lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8)) < 0
    var words: Array[(IndexedSeq[String], Long)] =
      histo.map { case (w, c) => (seed(w), c) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((toks, c) <- words; i <- 0 until toks.length - 1)
        counts.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) done = true
      else {
        val (l, r) = counts.foldLeft(("", "", Long.MinValue)) {
          case (best @ (bl, br, bn), ((cl, cr), cn)) =>
            if (cn > bn || (cn == bn &&
                (lt(cl, bl) || (cl == bl && lt(cr, br))))) (cl, cr, cn)
            else best
        } match { case (bl, br, _) => (bl, br) }
        merges += Merge(rank, l, r)
        words = words.map { case (toks, c) =>
          if (toks.indices.exists(i => i + 1 < toks.length &&
              toks(i) == l && toks(i + 1) == r)) (mergeOnce(toks, l, r), c)
          else (toks, c)
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one string with a learned merge table (rank order). */
  def encode(text: String, merges: Seq[Merge]): IndexedSeq[String] = {
    var toks = seed(text)
    merges.sortBy(_.rank).foreach(m => toks = mergeOnce(toks, m.left, m.right))
    toks
  }

  /** Tokenize a corpus column map-side with a learned merge table:
    * (doc_id, n_tokens, tokens). Decode == concatenation, so
    * `concat_ws("", tokens) == text` always. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        var toks = seed(text)
        ms.foreach { case (l, r) => toks = mergeOnce(toks, l, r) }
        (id, toks.length, toks: Seq[String])
      }.toDF(idCol, "n_tokens", "tokens")
  }
}
