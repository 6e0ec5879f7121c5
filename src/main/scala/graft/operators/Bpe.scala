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
  * otherwise deepen linearly with rounds).
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
    var toks: Dataset[Seq[String]] = corpus.map(t => seed(t): Seq[String]).cache()
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
