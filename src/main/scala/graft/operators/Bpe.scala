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

  /** Driver-side merge loop over a weighted word histogram, with
    * INCREMENTAL pair-count maintenance (Sennrich's actual loop shape):
    * the pair-count table builds once, and each merge touches only the
    * words that CONTAIN the merged pair (found via a pair→words index) —
    * subtracting their old adjacent pairs and adding the new ones. Per
    * round that is O(distinct pairs) for the argmax + O(touched tokens)
    * for the update, NOT a rescan of the whole histogram; 50k merges over
    * a web-scale vocabulary stay driver-tractable. The tie-break
    * comparator matches Spark's string ordering exactly (unsigned UTF-8
    * bytes), so the result is bit-identical to the distributed trainer
    * even on non-ASCII vocabularies where UTF-16 code-unit order (plain
    * String.compareTo) diverges. */
  def trainFromHistogram(histo: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    import java.nio.charset.StandardCharsets.UTF_8
    import scala.collection.mutable
    def lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8)) < 0
    val words: Array[(IndexedSeq[String], Long)] =
      histo.map { case (w, c) => (seed(w), c) }.toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair → indices of words where the pair OCCURRED at some point; grows
    // only (a merge can remove occurrences elsewhere in a word) — probes
    // re-check actual containment, so staleness is an over-approximation
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def adjust(wi: Int, toks: IndexedSeq[String], c: Long, sign: Long): Unit = {
      var i = 0
      while (i + 1 < toks.length) {
        val p = (toks(i), toks(i + 1))
        val n = counts.getOrElse(p, 0L) + sign * c
        if (n <= 0L) counts.remove(p) else counts(p) = n
        if (sign > 0L) index.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }
    words.zipWithIndex.foreach { case ((toks, c), wi) => adjust(wi, toks, c, 1L) }
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        val (l, r) = counts.foldLeft(("", "", Long.MinValue)) {
          case (best @ (bl, br, bn), ((cl, cr), cn)) =>
            if (cn > bn || (cn == bn &&
                (lt(cl, bl) || (cl == bl && lt(cr, br))))) (cl, cr, cn)
            else best
        } match { case (bl, br, _) => (bl, br) }
        merges += Merge(rank, l, r)
        index.getOrElse((l, r), mutable.Set.empty).toSeq.sorted.foreach { wi =>
          val (toks, c) = words(wi)
          val has = toks.indices.exists(i => i + 1 < toks.length &&
            toks(i) == l && toks(i + 1) == r)
          if (has) {
            adjust(wi, toks, c, -1L)
            val merged = mergeOnce(toks, l, r)
            words(wi) = (merged, c)
            adjust(wi, merged, c, 1L)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one string with a learned merge table: the REFERENCE
    * computation — one full left-to-right pass per merge in rank order.
    * O(merges × len): fine as the spec oracle, NOT the production path
    * (a 50k-merge vocabulary means 50k sequential scans per document);
    * `encodeFast` is the apply path and is proven bit-identical. */
  def encode(text: String, merges: Seq[Merge]): IndexedSeq[String] = {
    var toks = seed(text)
    merges.sortBy(_.rank).foreach(m => toks = mergeOnce(toks, m.left, m.right))
    toks
  }

  /** Pair-rank lookup for `encodeFast`, built once per merge table and
    * shared (broadcast-sized: one map entry per merge). */
  def rankMap(merges: Seq[Merge]): java.util.HashMap[(String, String), java.lang.Integer] = {
    // values box explicitly: a primitive-valued java map would turn a
    // missing key into 0 — a phantom rank that merges everything
    val m = new java.util.HashMap[(String, String), java.lang.Integer](merges.size * 2)
    merges.foreach(mg => m.put((mg.left, mg.right), Integer.valueOf(mg.rank)))
    m
  }

  /** PRODUCTION encode (the shape every real BPE tokenizer uses): instead
    * of replaying the merge table pass-by-pass — O(vocab) scans per
    * document — keep the token sequence as a doubly-linked list and a
    * min-heap of (rank, position) candidates, always merging the
    * lowest-rank pair present (leftmost on ties) and pushing only the two
    * pairs the merge created. O(len·log len) per document, INDEPENDENT of
    * vocabulary size; heap entries validate lazily on pop (a merge can
    * orphan a queued candidate), so no decrease-key is needed.
    *
    * Bit-identical to `encode` for LEARNED merge tables (BpeSpec pins it
    * at ≥5k merges on real documents): training can only form a pair from
    * tokens that already exist, so every pair containing merge k's output
    * has rank > k — the global-minimum-rank order and the sequential
    * rank-by-rank replay therefore perform the same merges. */
  def encodeFast(text: String,
      ranks: java.util.Map[(String, String), java.lang.Integer]): IndexedSeq[String] = {
    val n = text.length
    if (n == 0) return IndexedSeq.empty
    val toks = new Array[String](n)
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    val alive = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      toks(i) = String.valueOf(text.charAt(i))
      prev(i) = i - 1
      next(i) = if (i + 1 < n) i + 1 else -1
      alive(i) = true
      i += 1
    }
    // (rank, leftPos) min-heap; Long packs both so comparison is primitive
    val pq = new java.util.PriorityQueue[java.lang.Long](16)
    def push(p: Int): Unit = {
      val nx = next(p)
      if (nx >= 0) {
        val r = ranks.get((toks(p), toks(nx)))
        if (r != null) pq.add((r.longValue() << 32) | p.toLong)
      }
    }
    i = 0
    while (i < n) { push(i); i += 1 }
    while (!pq.isEmpty) {
      val packed = pq.poll().longValue()
      val rank = (packed >>> 32).toInt
      val p = (packed & 0xffffffffL).toInt
      val nx = if (alive(p)) next(p) else -1
      // lazy validation: the queued pair must still be adjacent AND still
      // spell the rank it was queued under (either side may have merged)
      if (nx >= 0 && alive(nx) && {
            val r = ranks.get((toks(p), toks(nx)))
            r != null && r.intValue() == rank
          }) {
        toks(p) = toks(p) + toks(nx)
        alive(nx) = false
        val nn = next(nx)
        next(p) = nn
        if (nn >= 0) prev(nn) = p
        if (prev(p) >= 0) push(prev(p))
        push(p)
      }
    }
    val out = IndexedSeq.newBuilder[String]
    var p = 0
    while (p >= 0) { if (alive(p)) out += toks(p); p = next(p) }
    out.result()
  }

  /** Tokenize a corpus column map-side with a learned merge table:
    * (doc_id, n_tokens, tokens). Decode == concatenation, so
    * `concat_ws("", tokens) == text` always.
    *
    * Scale shape: encoding is `encodeFast` (vocab-size-independent) and,
    * when the table was trained word-level (no merge touches a space —
    * merges then never cross space boundaries, so a document encodes as
    * its words encoded independently), each DISTINCT word encodes once
    * per partition through a per-partition memo — the q119 discipline
    * without the join back. ONE Spark job for the whole corpus regardless
    * of vocabulary size (BpeSpec pins the job count with a listener). */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges.sortBy(_.rank).map(m => (m.left, m.right, m.rank))
    val wordLevel = merges.forall(m => !m.left.contains(' ') && !m.right.contains(' '))
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = new java.util.HashMap[(String, String), java.lang.Integer](table.size * 2)
        table.foreach { case (l, r, k) => ranks.put((l, r), Integer.valueOf(k)) }
        val memo = new java.util.HashMap[String, IndexedSeq[String]]()
        def word(w: String): IndexedSeq[String] = {
          var t = memo.get(w)
          if (t == null) { t = encodeFast(w, ranks); memo.put(w, t) }
          t
        }
        val space = IndexedSeq(" ")
        rows.map { case (id, text) =>
          val toks =
            if (!wordLevel) encodeFast(text, ranks)
            else {
              // split preserves empty segments: "a  b" → two space tokens
              val segs = text.split(" ", -1)
              val out = IndexedSeq.newBuilder[String]
              var i = 0
              while (i < segs.length) {
                if (i > 0) out ++= space
                out ++= word(segs(i))
                i += 1
              }
              out.result()
            }
          (id, toks.length, toks: Seq[String])
        }
      }.toDF(idCol, "n_tokens", "tokens")
  }
}
