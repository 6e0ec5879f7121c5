package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 curation operators (q103/q104/q105)
  * beyond the DuckDB hash compare: the oracle proves Spark and DuckDB
  * agree, these prove the shared answer means what it claims, by
  * recomputing each signal through an independent formulation.
  */
class CurationSpec extends SparkTestBase {

  test("q103: each stratum yields exactly k=10 ranked rows, biased toward heavy docs") {
    val out = graft.SparkEntry.queries("q103_priority_sample")(spark, sfDir).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.size === 20)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to 10L),
        s"$src: ranks must be exactly 1..10")
    }
    // weighted sampling must overrepresent heavy (large n_chars) docs
    val sampleAvg = out.map(_.getAs[Long]("n_chars")).sum.toDouble / out.length
    val corpusAvg = graft.Tables.documents(spark, sfDir)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleAvg > corpusAvg,
      s"priority sample avg n_chars $sampleAvg should exceed corpus avg $corpusAvg")
  }

  test("q104: flagged docs verified by an independent raw-string shingle join; bench excluded") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q104_decontaminate")(spark, sfDir).collect()
    assert(out.nonEmpty, "sf0.001 plants 4-gram overlap; result must be non-empty")
    assert(out.forall(_.getAs[Long]("doc_id") % 97 != 0),
      "benchmark docs must never appear in the contamination list")

    // independent formulation: join on the raw shingle STRING (no hash)
    val sh = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 4)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t) - 4), i -> concat_ws(' ', slice(t, i + 1, 4)))")).as("s"))
      .distinct()
    val bench = sh.filter($"doc_id" % 97 === 0).select($"s").distinct()
    val expected = sh.filter($"doc_id" % 97 =!= 0).join(bench, "s")
      .groupBy($"doc_id").agg(countDistinct($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_shingles")).toMap
    assert(got === expected,
      "hash-keyed contamination must equal the raw-string formulation")
  }

  test("q179: removal agrees with q104's flags — contaminated and benchmark docs never ship") {
    import spark.implicits._
    val flagged = graft.SparkEntry.queries("q104_decontaminate")(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val out = graft.SparkEntry.queries("q179_decontaminate_rewrite")(spark, sfDir)
      .collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val perSource = docs.groupBy(_._2)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val ids = perSource(src).map(_._1)
      val expectKept = ids.count(id => id % 97 != 0 && !flagged.contains(id))
      assert(r.getAs[Long]("n_docs") === ids.length.toLong, s"$src doc count")
      assert(r.getAs[Long]("n_kept") === expectKept.toLong,
        s"$src: kept must equal non-benchmark non-flagged docs")
      assert(r.getAs[Long]("n_dropped") === ids.length - expectKept)
    }
    // something must actually drop: sf0.001 plants contamination + bench docs
    assert(out.map(_.getAs[Long]("n_dropped")).sum > 0)
  }

  test("q111: exactly one keep per cluster, and it is the longest (min-id on ties)") {
    val out = graft.SparkEntry.queries("q111_canonical_select")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_rep"),
        r.getAs[Long]("kept_doc"), r.getAs[Long]("n_chars"), r.getAs[Boolean]("keep")))
    assert(out.length === graft.Tables.documents(spark, sfDir).count(),
      "every document gets a verdict")
    out.groupBy(_._2).foreach { case (rep, rows) =>
      val kept = rows.filter(_._5)
      assert(kept.length === 1, s"cluster $rep: exactly one keep")
      // the winner is the longest doc, ties broken toward the smaller id
      val winner = rows.minBy { case (id, _, _, n, _) => (-n, id) }
      assert(kept.head._1 === winner._1, s"cluster $rep keeps the longest doc")
      assert(rows.forall(_._3 === winner._1), s"cluster $rep: kept_doc is uniform")
    }
    // clusters must agree with q57's closure (same pair graph, same labels)
    val q57 = graft.SparkEntry.queries("q57_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep")).toMap
    assert(out.forall { case (id, rep, _, _, _) => q57(id) === rep })
  }

  test("q105: signals match a plain-Scala recomputation over every document") {
    val out = graft.SparkEntry.queries("q105_repetition_quality")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("dup_frac"),
          r.getAs[Long]("top_bigram_n"), r.getAs[Long]("max_run"),
          r.getAs[Boolean]("keep")))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    assert(docs.length === out.size)
    docs.foreach { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).split(" ")
      val n = toks.length.toLong
      val dupFrac = (n - toks.distinct.length).toDouble / n
      val topBigram =
        if (n < 2) 0L
        else toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toLong
      val maxRun = {
        var best = 1; var cur = 1
        for (i <- 1 until toks.length) {
          if (toks(i) == toks(i - 1)) cur += 1 else cur = 1
          best = math.max(best, cur)
        }
        best.toLong
      }
      val (gn, gd, gb, gr, gk) = out(id)
      assert(gn === n && gd === dupFrac && gb === topBigram && gr === maxRun,
        s"doc $id: got ($gn,$gd,$gb,$gr) want ($n,$dupFrac,$topBigram,$maxRun)")
      val keep = dupFrac <= 0.30 && 2.0 * topBigram / n <= 0.18 && maxRun <= 3
      assert(gk === keep, s"doc $id keep flag")
    }
  }
}
