package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q171 — exact substring dedup EXECUTION (Lee et al. 2021): duplicated
  * ≥20-token spans are REMOVED from every doc except the first occurrence
  * (min doc_id). The oracle hash-compare proves Spark == DuckDB on the
  * reconstruction; these tests prove the shared answer implements the
  * paper's semantics: keep-first, later-docs-stripped, and exact token
  * conservation everywhere else.
  */
class SubstringDedupSpec extends SparkTestBase {

  private val boiler = (0 until 25).map(i => f"boilertok$i%02d").mkString(" ")

  /** corpus + two planted docs sharing a 25-token boilerplate tail. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = tmpDir("planted-boiler-")
    val docs = graft.Tables.documents(spark, sfDir)
    def doc(id: Long, prefix: String) = {
      val text = (0 until 30).map(i => s"$prefix$i").mkString(" ") + " " + boiler
      (id, text, "en", "srcBoiler", text.length.toLong)
    }
    val planted = Seq(doc(95001L, "uniqA"), doc(95002L, "uniqB"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(planted).coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("boilerplate is stripped from the LATER doc only; the first survives verbatim") {
    val out = graft.SparkEntry.queries("q171_substring_dedup_rewrite")(spark, plantedDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept")))).toMap
    val (tokA, keptA) = out(95001L)
    val (tokB, keptB) = out(95002L)
    assert(tokA === 55L && tokB === 55L)
    assert(keptA === 55L, "first occurrence (min doc_id) must keep every token")
    assert(keptB === 55L - 25L,
      s"later doc must lose exactly the 25 boilerplate tokens, kept $keptB")
  }

  test("token conservation: docs without cross-doc spans are untouched") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q171_substring_dedup_rewrite")(spark, sfDir)
    // q152's scorer tells us which docs carry cross-doc duplicated windows —
    // exactly those (and only those) may lose tokens
    val dupDocs = graft.SparkEntry.queries("q152_substring_dup")(spark, sfDir)
      .filter($"n_dup" > 0).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val rows = out.collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, k) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"))
      if (!dupDocs.contains(id))
        assert(k === n, s"doc $id has no cross-doc window but lost ${n - k} tokens")
    }
    // keep-first: for every duplicated window hash, the minimal doc keeps it,
    // so at least one doc per duplicate group must be fully intact among
    // the planted-free corpus — spot-proof: total kept > 0 and SOME dup doc
    // lost tokens (sf0.001 plants cross-doc overlap by construction)
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_tokens")),
      "sf0.001 contains cross-doc 20-token spans; something must be stripped")
  }

  test("cleaned_md5 reconstructs: stripped doc equals its prefix (boilerplate gone)") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q171_substring_dedup_rewrite")(spark, plantedDir)
      .filter($"doc_id" === 95002L).head().getAs[String]("cleaned_md5")
    val expected = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      (0 until 30).map(i => s"uniqB$i").mkString(" "))
    assert(got === expected,
      "cleaned text must be exactly the doc minus the duplicated span")
  }
}
