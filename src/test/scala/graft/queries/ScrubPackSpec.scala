package graft.queries

import graft.SparkTestBase

/** Semantic checks for the scrub (q108) and sequence-packing (q109)
  * operators beyond the DuckDB hash compare: each output is re-derived
  * through an independent plain-Scala formulation over the raw corpus.
  */
class ScrubPackSpec extends SparkTestBase {

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def countOcc(hay: String, needle: String): Long =
    ((hay.length - hay.replace(needle, "").length) / needle.length).toLong

  test("q108: email rule redacts planted addresses; term rule is literal") {
    val planted = "mail bob.smith+x@sub.example.org or ann@ex.io for the customer vector"
    assert(planted.replaceAll(emailRe, "<EMAIL>") ===
      "mail <EMAIL> or <EMAIL> for the customer vector")
    assert(planted.replaceAll(emailRe, "<EMAIL>")
      .replace("customer", "<TERM>").replace("vector", "<TERM>") ===
      "mail <EMAIL> or <EMAIL> for the <TERM> <TERM>")
  }

  test("q108: per-source audit equals a plain-Scala scrub of every document") {
    val out = graft.SparkEntry.queries("q108_pii_scrub")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_scrubbed"),
          r.getAs[Long]("n_email_hits"), r.getAs[Long]("n_term_hits"),
          r.getAs[Long]("scrubbed_checksum")))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val scrubbed = rows.map { case (_, text) =>
        val r1 = text.replaceAll(emailRe, "<EMAIL>")
        val s2 = r1.replace("customer", "<TERM>").replace("vector", "<TERM>")
        (text, r1, s2)
      }
      src -> ((rows.length.toLong,
        scrubbed.count { case (t, _, s2) => s2 != t }.toLong,
        scrubbed.map { case (t, _, _) => emailRe.r.findAllIn(t).length.toLong }.sum,
        scrubbed.map { case (_, r1, _) =>
          countOcc(r1, "customer") + countOcc(r1, "vector") }.sum,
        scrubbed.map { case (_, _, s2) =>
          java.lang.Long.parseLong(md5Hex(s2).take(12), 16) }.sum))
    }
    assert(out === expected)
    // the corpus genuinely exercises the term rule — not a vacuous all-zero audit
    assert(out.values.map(_._4).sum > 0, "blocklist terms must hit in the corpus")
  }

  test("q109: manifest equals an independent packing and conserves every token") {
    val budget = 1024
    val out = graft.SparkEntry.queries("q109_sequence_packing")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ", -1).length.toLong))
    val expected = docs.groupBy { case (lang, id, _) => (lang, id % 8) }
      .flatMap { case ((lang, shard), rows) =>
        var offset = 0L
        rows.sortBy(_._2).map { case (_, id, n) =>
          val bin = offset / budget; offset += n; (lang, shard, bin, id, n)
        }.groupBy { case (_, _, bin, _, _) => bin }
          .map { case (bin, g) =>
            (lang, shard, bin) -> ((g.length.toLong, g.map(_._5).sum,
              g.map(_._4).min, g.map(_._4).max))
          }
      }
    assert(out === expected)
    // conservation: the manifest accounts for every token exactly once
    assert(out.values.map(_._2).sum === docs.map(_._3).sum)
    // bins within a (lang, shard) group are consecutive from 0
    out.keys.groupBy { case (l, s, _) => (l, s) }.foreach { case (_, ks) =>
      val bins = ks.map(_._3).toSeq.sorted
      assert(bins === (0L until bins.length).toSeq, s"bins not contiguous: $bins")
    }
  }
}
