package graft.plans

import graft.SparkTestBase
import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** The metadata-only COUNT(*) rule: a bare global count over a graft
  * relation folds from the log (LocalRelation in the optimized plan, zero
  * Spark jobs), stays exact under deletion vectors and time travel, and
  * never fires where it would be unsound (filters, grouping, CDF). */
class MetadataOnlyCountSpec extends SparkTestBase {
  import spark.implicits._

  private def jobsDuring[A](f: => A): (A, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      Thread.sleep(300) // listener events are async; jobs post well within this
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private lazy val path: String = {
    val t = GraftTable.create(spark, tmpDir("moc-"),
      (1 to 100).map(i => (i, s"v$i")).toDF("id", "v").coalesce(2))
    t.append((101 to 120).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.path
  }

  test("bare COUNT(*) folds from the log: LocalRelation plan, zero jobs") {
    val df = spark.read.format("graft").load(path).groupBy().count()
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      s"expected a LocalRelation-only plan, got:\n$optimized")
    val (rows, jobs) = jobsDuring(df.collect())
    assert(rows.head.getLong(0) === 120L)
    assert(jobs === 0, s"metadata count must run zero Spark jobs, ran $jobs")
    // SQL spelling through the catalog hits the same rule
    spark.conf.set("spark.sql.catalog.mocat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mocat.warehouse", tmpDir("moc-wh-"))
    try {
      spark.sql(s"CREATE TABLE mocat.default.moc USING graft LOCATION '$path'")
      val sdf = spark.sql("SELECT COUNT(*) FROM mocat.default.moc")
      assert(sdf.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
      assert(sdf.head().getLong(0) === 120L)
    } finally {
      spark.conf.unset("spark.sql.catalog.mocat")
      spark.conf.unset("spark.sql.catalog.mocat.warehouse")
    }
  }

  test("exact under deletion vectors and time travel") {
    val t = GraftTable.forPath(spark, path)
    val vBefore = t.latestVersion
    t.setProperty("deletionVectors.enabled", "true")
    t.delete(col("id") <= 10) // merge-on-read: tombstones only
    val df = spark.read.format("graft").load(path).groupBy().count()
    assert(df.head().getLong(0) === 110L,
      "log-folded count must subtract DV tombstones")
    val tt = spark.read.format("graft").option("versionAsOf", vBefore)
      .load(path).groupBy().count()
    assert(tt.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
    assert(tt.head().getLong(0) === 120L, "pinned snapshot counts its own era")
  }

  test("never fires where it would be unsound; opt-out honored") {
    val r = spark.read.format("graft").load(path)
    def hasScanLeaf(df: org.apache.spark.sql.DataFrame): Boolean =
      !df.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(hasScanLeaf(r.filter(col("id") > 150).groupBy().count()),
      "filtered count must scan")
    assert(r.filter(col("id") > 150).count() === 0L)
    assert(hasScanLeaf(r.groupBy(col("v")).count()), "grouped count must scan")
    assert(hasScanLeaf(r.groupBy().agg(count(lit(1)), sum(col("id")))),
      "mixed aggregates must scan")
    spark.conf.set("spark.graft.metadataOnlyCount", "false")
    try assert(hasScanLeaf(r.groupBy().count()), "opt-out must disable the rule")
    finally spark.conf.unset("spark.graft.metadataOnlyCount")
  }

  test("MIN/MAX fold from stats; DVs and truncated strings disable them") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("mocmm-"),
      (1 to 50).map(i => (i, i * 1.5, s"name$i")).toDF("id", "score", "name")
        .coalesce(2))
    val r = spark.read.format("graft").load(t.path)
    def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val mm = r.groupBy().agg(min(col("id")), max(col("id")),
      min(col("score")), max(col("score")), max(col("name")), count(lit(1)))
    assert(isLocal(mm), s"min/max must fold from stats:\n${mm.queryExecution.optimizedPlan}")
    val row = mm.head()
    assert(row.getInt(0) === 1 && row.getInt(1) === 50)
    assert(row.getDouble(2) === 1.5 && row.getDouble(3) === 75.0)
    assert(row.getString(4) === "name9") // lexicographic max
    assert(row.getLong(5) === 50L)
    // a deletion vector could hide the extremum: min/max must scan again
    t.setProperty("deletionVectors.enabled", "true")
    t.delete(col("id") === 50)
    val afterDv = spark.read.format("graft").load(t.path)
      .groupBy().agg(max(col("id")))
    assert(!isLocal(afterDv), "min/max over DV files must scan")
    assert(afterDv.head().getInt(0) === 49)
    // ...while bare COUNT(*) stays metadata-only (liveRecords is exact)
    assert(isLocal(spark.read.format("graft").load(t.path).groupBy().count()))
    // long strings truncate in the log -> max(name) must scan, not serve a prefix
    val t2 = GraftTable.create(spark, tmpDir("mocmm2-"),
      Seq((1, "z" * 40), (2, "a" * 40)).toDF("id", "t").coalesce(1))
    val longStr = spark.read.format("graft").load(t2.path).groupBy().agg(max(col("t")))
    assert(!isLocal(longStr), "possibly-truncated string stats must not serve MIN/MAX")
    assert(longStr.head().getString(0) === "z" * 40)
  }

  test("review regressions: shadowing alias and null partitions never misbind") {
    import spark.implicits._
    def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    // an alias that SHADOWS a real column name: min/max must follow the
    // alias (scan), never the same-named stored column's stats
    val t = GraftTable.create(spark, tmpDir("moc-shadow-"),
      Seq(("a", "x", "zzz"), ("b", "y", "qqq")).toDF("a", "b", "c"))
    val r = spark.read.format("graft").load(t.path)
    val shadowed = r.select(concat(col("a"), col("b")).as("c"))
      .groupBy().agg(min(col("c")), max(col("c")))
    val row = shadowed.head()
    assert((row.getString(0), row.getString(1)) === ("ax", "by"),
      "aggregate must bind to the alias, not the stored column c")
    // null partition: MIN over the partition column ignores the null
    // partition's sentinel instead of serving it as a value
    val p = GraftTable.create(spark, tmpDir("moc-nullpart-"),
      Seq((1, Some("a")), (2, Some("b")), (3, None: Option[String]))
        .toDF("id", "part"), partitionBy = Seq("part"))
    val pr = spark.read.format("graft").load(p.path).groupBy()
      .agg(min(col("part")).as("mn"), max(col("part")).as("mx"))
    assert(isLocal(pr), "known-all-null partition files skip exactly")
    assert((pr.head().getString(0), pr.head().getString(1)) === ("a", "b"),
      "the __HIVE_DEFAULT_PARTITION__ sentinel is not a value")
  }
}
