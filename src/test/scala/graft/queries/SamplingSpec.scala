package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structural properties of the deterministic stratified split that the
  * DuckDB oracle (which recomputes the same hash) doesn't state explicitly:
  * the split is a partition of the corpus, and the observed rates sit in
  * the band the thresholds imply. */
class SamplingSpec extends SparkTestBase {

  test("q48 split is exhaustive and disjoint, with rates near the thresholds") {
    val docs = graft.Tables.documents(spark, sfDir)
    val total = docs.count()
    val rows = graft.SparkEntry.queries("q48_stratified_split")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split"),
                 r.getAs[Long]("n_docs")))

    // exhaustive: every doc lands in exactly one (source, split) cell
    assert(rows.map(_._3).sum === total)
    // disjoint cells: at most train+test per source
    assert(rows.groupBy(_._1).forall(_._2.length <= 2))

    // rates: low sources target 80% train, high sources 50%; with 25-500
    // docs per stratum the multiplicative hash should land within ±25pp
    val bySource = rows.groupBy(_._1).map { case (src, cells) =>
      val n = cells.map(_._3).sum.toDouble
      val train = cells.collect { case (_, "train", c) => c }.sum.toDouble
      (src, train / n)
    }
    bySource.foreach { case (src, frac) =>
      val target = if (src.stripPrefix("src").toInt < 10) 0.8 else 0.5
      assert(math.abs(frac - target) < 0.25,
        s"$src train fraction $frac far from $target")
    }
  }

  test("q48 assignment is a pure function of doc_id (repartition-stable)") {
    import spark.implicits._
    val assign = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("pct", expr("((doc_id * 2654435761 + 12345) % 1000000007) % 100"))
      .select($"doc_id", $"pct")
    val base = assign(graft.Tables.documents(spark, sfDir))
    val shuffled = assign(graft.Tables.documents(spark, sfDir).repartition(7))
    assert(base.exceptAll(shuffled).count() === 0)
    assert(shuffled.exceptAll(base).count() === 0)
  }
}
