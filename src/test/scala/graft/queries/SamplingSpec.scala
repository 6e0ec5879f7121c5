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

  test("q89 mixing multiplies each stratum by its weight and is reproducible") {
    import spark.implicits._
    // the full weighted stream (pre-limit): n_rows per source = docs * w
    val docs = graft.Tables.documents(spark, sfDir)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weighted = graft.Tables.documents(spark, sfDir)
      .withColumn("w",
        when(expr("cast(substring(source, 4, 10) as int)") < 5, lit(3))
          .when(expr("cast(substring(source, 4, 10) as int)") < 10, lit(2))
          .otherwise(lit(1)))
      .select($"source", explode(expr("sequence(1, w)")).as("copy"))
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    weighted.foreach { case (src, n) =>
      val tier = src.stripPrefix("src").toInt
      val w = if (tier < 5) 3 else if (tier < 10) 2 else 1
      assert(n === docs(src) * w, s"$src mixed to $n, expected ${docs(src)} * $w")
    }
    // epoch order is a pure function of (doc_id, copy): two evaluations agree
    val q = graft.SparkEntry.queries("q89_data_mixing")
    assert(q(spark, sfDir).collect().toSeq === q(spark, sfDir).collect().toSeq)
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
