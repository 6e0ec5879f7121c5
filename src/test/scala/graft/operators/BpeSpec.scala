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
}
