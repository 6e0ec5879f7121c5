package graft.operators

import graft.SparkTestBase

/** Real BPE on the real corpus: the distributed trainer learns merges
  * whose application is lossless (decode == concat), deterministic, and
  * actually compresses the token stream. */
class BpeSpec extends SparkTestBase {

  private val testSf = "/root/testdata/sf0.001"

  test("classic corpus learns the hand-derivable merge sequence") {
    import spark.implicits._
    val merges = Bpe.train(Seq("aaabdaaabac").toDS(), numMerges = 3)
    // pairs of "aaabdaaabac": (a,a) x4 wins; then "aa,ab..." rounds follow
    assert(merges.head.left == "a" && merges.head.right == "a")
    assert(merges.map(_.rank) == (1 to merges.length))
  }

  test("documents corpus: roundtrip lossless, deterministic, compressive") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, testSf)
      .select($"doc_id", $"text").limit(80).cache()
    val corpus = docs.select($"text").as[String]
    val merges = Bpe.train(corpus, numMerges = 24)
    assert(merges.length == 24, "a text corpus must sustain 24 merges")
    // determinism: an independent training run learns the identical table
    assert(Bpe.train(corpus, numMerges = 24) == merges)
    // apply map-side; decode == concatenation must reproduce every text
    val toks = Bpe.tokenize(docs.toDF(), "doc_id", "text", merges)
    val joined = toks.join(docs, "doc_id")
    import org.apache.spark.sql.functions._
    val broken = joined.filter(concat_ws("", col("tokens")) =!= col("text")).count()
    assert(broken == 0, "decode(encode(x)) must equal x for every document")
    // merges exist because pairs repeat — the stream must shrink vs chars
    val sums = joined.agg(sum(col("n_tokens")), sum(length(col("text")))).head()
    assert(sums.getLong(0) < sums.getLong(1),
      s"BPE must compress: ${sums.getLong(0)} tokens vs ${sums.getLong(1)} chars")
    docs.unpersist()
  }

  test("histogram trainer is bit-identical to the distributed word trainer") {
    import spark.implicits._
    // pinned corpus: repeated words force weighted pair counts, a shared
    // top pair forces the tie-break, multi-space forces empty-token filter
    val corpus = Seq(
      "low low low lower lowest", "new newer newest  new",
      "wide wider widest low", "er er er est").toDS()
    val dist = Bpe.trainWords(corpus, numMerges = 16)
    val histo = Bpe.trainHistogram(corpus, numMerges = 16)
    assert(histo == dist, s"histogram merges diverged:\n$histo\nvs\n$dist")
  }

  test("histogram trainer matches distributed on real documents") {
    import spark.implicits._
    val corpus = graft.Tables.documents(spark, testSf)
      .select($"text").as[String].limit(60).cache()
    val dist = Bpe.trainWords(corpus, numMerges = 12)
    val histo = Bpe.trainHistogram(corpus, numMerges = 12)
    assert(histo == dist)
    assert(histo.length == 12)
    corpus.unpersist()
  }

  test("histogram training runs O(1) Spark jobs regardless of merge count") {
    import spark.implicits._
    val corpus = graft.Tables.documents(spark, testSf)
      .select($"text").as[String].limit(60)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Bpe.trainHistogram(corpus, numMerges = 48)
      Thread.sleep(300) // listener events are async; jobs post well within this
      // one histogram collect (+ possibly an AQE sub-job) — NOT one per
      // merge; the distributed loop would have run ≥48 jobs here
      assert(jobs.get() <= 4,
        s"histogram training must be O(1) corpus passes, ran ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
  test("encodeFast is bit-identical to sequential replay at production vocab scale (>=5k merges)") {
    // The real testdata corpus has ~31 distinct words — far too small to
    // sustain a production-sized merge table — so the vocabulary here is
    // synthetic but DETERMINISTIC (seeded): ~1000 distinct random words
    // whose histogram sustains >5k merges, the scale where the old
    // O(vocab) per-document replay stopped being viable.
    val rnd = new scala.util.Random(42)
    val words = (0 until 1000).map(_ => (0 until (8 + rnd.nextInt(9)))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).distinct
    val histo = words.map(w => (w, 1L + rnd.nextInt(9)))
    val merges = Bpe.trainFromHistogram(histo, numMerges = 5200)
    assert(merges.length === 5200,
      s"vocabulary must sustain 5200 merges, got ${merges.length}")
    val ranks = Bpe.rankMap(merges)
    // documents assembled from the vocabulary (plus runs of spaces)
    val docs = (0 until 30).map { _ =>
      (0 until 20).map(_ => words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    docs.foreach { text =>
      val ref = Bpe.encode(text, merges)
      val fast = Bpe.encodeFast(text, ranks)
      assert(fast === ref, s"encodeFast diverged on: ${text.take(60)}…")
    }
    // and through the DataFrame path (per-partition word memo + space
    // reassembly), including the roundtrip invariant
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.tokenize(df, "doc_id", "text", merges)
      .select($"doc_id", $"tokens").as[(Long, Seq[String])].collect().toMap
    docs.zipWithIndex.foreach { case (text, i) =>
      assert(got(i.toLong) === (Bpe.encode(text, merges): Seq[String]))
    }
  }

  test("tokenize runs O(1) Spark jobs regardless of vocabulary size") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = (0 until 400).map(_ => (0 until (6 + rnd.nextInt(8)))
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).distinct
    val merges = Bpe.trainFromHistogram(words.map((_, 1L)), numMerges = 2000)
    assert(merges.length >= 1500)
    val df = (0 until 50).map(i => (i.toLong,
      (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Bpe.tokenize(df, "doc_id", "text", merges).collect()
      Thread.sleep(300)
      assert(jobs.get() <= 3,
        s"encode must be one corpus pass independent of vocab, ran ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("char-level tables (merges crossing spaces) take the whole-text fast path, still bit-identical") {
    import spark.implicits._
    // Bpe.train is CHAR-level: spaces are tokens and merges may span
    // word boundaries — the word-split memo would be unsound, so tokenize
    // must fall back to whole-text encodeFast and still match encode.
    val corpus = Seq("ab ab ab", "ab cd ab", "cd cd ab ab")
    val merges = Bpe.train(corpus.toDS(), numMerges = 8)
    assert(merges.exists(m => m.left.contains(" ") || m.right.contains(" ")),
      s"fixture must learn a space-crossing merge, got $merges")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.tokenize(df, "doc_id", "text", merges)
      .select($"doc_id", $"tokens").as[(Long, Seq[String])].collect().toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      assert(got(i.toLong) === (Bpe.encode(text, merges): Seq[String]))
    }
  }

  test("q177 corpus encode: planted words tokenize to the hand-derived counts") {
    import spark.implicits._
    val dir = tmpDir("planted-bpe-")
    // pinned merges: (a,b) (ab,ab) (ab,c) (abc,d) — hand-encodable words:
    // abab->[abab]=1, abcd->[abcd]=1, xabay->[x,ab,a,y]=4, aaaa->[a,a,a,a]=4,
    // ababababab->[abab,ab,abab]=3 (pass-based leftmost-greedy application)
    val text = "abab abcd xabay aaaa ababababab"
    val docs = graft.Tables.documents(spark, sfDir)
    docs.unionByName(Seq((96001L, text, "en", "srcBpe", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = graft.SparkEntry.queries("q177_bpe_encode")(spark, dir)
      .filter($"doc_id" === 96001L).head()
    assert(r.getAs[Long]("n_words") === 5L)
    assert(r.getAs[Long]("n_bpe_tokens") === (1L + 1 + 4 + 4 + 3))
    assert(r.getAs[Long]("max_word_tokens") === 4L)
    // corpus-wide sanity on the real sfDir: every word yields >= 1 token
    // and no more tokens than characters
    val all = graft.SparkEntry.queries("q177_bpe_encode")(spark, sfDir).collect()
    assert(all.forall(x => x.getAs[Long]("n_bpe_tokens") >= x.getAs[Long]("n_words")))
  }

  test("LEARNED table drives the codegen'd encode end-to-end: train → encode → decode == identity") {
    // q177 encodes with a PINNED 4-merge table (oracle determinism); the
    // production tokenize path is trainHistogram's LEARNED table feeding
    // the same replace-to-fixpoint expression chain — this closes that
    // composition: train on the corpus, encode the corpus with the learned
    // merges through the codegen'd chain (no UDF), and prove the encode is
    // lossless and compressive.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, testSf)
      .select($"doc_id", $"text").limit(80).cache()
    val merges = Bpe.trainHistogram(docs.select($"text").as[String], numMerges = 16)
    assert(merges.nonEmpty && merges.map(_.rank) == (1 to merges.length))
    val D = ""
    // learned tokens must be delimiter-free or the expression encoding is unsound
    assert(merges.forall(m => !m.left.contains(D) && !m.right.contains(D)))
    val docw = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
    val seed = concat(lit(D), regexp_replace($"w", "(.)", "$1" + D))
    // 8 fixpoint passes cover 2^8-token words — far past this corpus; the
    // pass count is kept low because each (merge, pass) nests one replace
    // node and Catalyst's column conversion recurses over the whole tree
    val encoded = merges.foldLeft(seed) { case (st, m) =>
      val pat = lit(s"$D${m.left}$D${m.right}$D"); val rep = lit(s"$D${m.left}${m.right}$D")
      (1 to 8).foldLeft(st)((acc, _) => replace(acc, pat, rep))
    }
    val tokw = docw.select($"w").distinct()
      .withColumn("enc", encoded)
      .withColumn("toks", expr("filter(split(enc, '\\u0001'), x -> x != '')"))
    // decode == identity: concatenating a word's BPE tokens reproduces it
    val broken = tokw.filter(concat_ws("", $"toks") =!= $"w").count()
    assert(broken === 0L, "learned-table expression encode must be lossless")
    // expression encode ≡ the reference encode (Bpe.tokenize's merge loop)
    // per distinct word
    val wordDf = tokw.select($"w")
      .withColumn("wid", monotonically_increasing_id())
    val ref = Bpe.tokenize(wordDf, "wid", "w", merges)
      .join(wordDf, "wid")
      .select($"w", $"n_tokens".cast("long")).as[(String, Long)].collect().toMap
    val exprCounts = tokw.select($"w", size($"toks").cast("long")).as[(String, Long)]
      .collect().toMap
    assert(exprCounts == ref,
      "codegen'd replace-chain must agree with the reference merge loop per word")
    // the learned merges actually compress the token stream
    val sums = docw.join(tokw, "w")
      .agg(sum(size($"toks")).cast("long"), sum(length($"w")).cast("long")).head()
    assert(sums.getLong(0) < sums.getLong(1),
      s"learned BPE must compress: ${sums.getLong(0)} tokens vs ${sums.getLong(1)} chars")
    docs.unpersist()
  }
}
