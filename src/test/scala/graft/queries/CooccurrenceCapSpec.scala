package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q121's scale guard: pair generation is a self-join WITHIN doc_id, so one
  * pathological document with a huge distinct vocabulary would otherwise emit
  * ~n²/2 pairs into a single task (a straggler/spill at web scale). The
  * participation caps (top-V corpus vocab + per-doc top-K) must bound that
  * fan-out without changing the answer on well-behaved corpora.
  */
class CooccurrenceCapSpec extends SparkTestBase {

  /** corpus + one planted "book": 2000 distinct tokens in a single doc. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = tmpDir("planted-book-")
    val docs = graft.Tables.documents(spark, sfDir)
    val bookText = (0 until 2000).map(i => f"booktok$i%04d").mkString(" ")
    val planted = Seq((91001L, bookText, "en", "srcBook", bookText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(planted).coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("per-doc cap bounds a pathological document's participation at K") {
    import spark.implicits._
    val perDoc = Text.cooccurrenceParticipants(spark, plantedDir)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc(91001L) <= 512L,
      s"planted 2000-distinct-token doc must cap at K=512, got ${perDoc(91001L)}")
    assert(perDoc.values.forall(_ <= 512L), "no document may exceed the cap")
  }

  test("pair fan-out from the planted doc is bounded by K·(K−1)/2, not vocab²") {
    import spark.implicits._
    val part = Text.cooccurrenceParticipants(spark, plantedDir)
    val pairsFromBook = part.as("x")
      .join(part.as("y"), $"x.doc_id" === $"y.doc_id" && $"x.token" < $"y.token")
      .filter($"x.doc_id" === 91001L)
      .count()
    assert(pairsFromBook <= 512L * 511L / 2,
      s"book doc emitted $pairsFromBook pairs — cap must bound it at K(K−1)/2")
    assert(pairsFromBook < 2000L * 1999L / 2,
      "uncapped fan-out (vocab²/2) must be impossible")
  }

  test("generous caps leave the normal corpus untouched (q121 answer unchanged)") {
    import spark.implicits._
    // On sf0.001 every doc's distinct-token count is far below K and the
    // vocab is far below V, so the capped participant set must equal the
    // raw distinct (doc, token) set — the caps are pure scale insurance.
    val raw = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("token"))
      .filter(length($"token") > 0)
    val capped = Text.cooccurrenceParticipants(spark, sfDir)
    assert(capped.count() === raw.count(),
      "caps must be no-ops on the well-behaved corpus")
    assert(capped.exceptAll(raw).isEmpty && raw.exceptAll(capped).isEmpty,
      "capped participants must equal the raw distinct (doc, token) set")
  }
}
