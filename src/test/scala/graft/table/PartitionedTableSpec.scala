package graft.table

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hive-partitioned GraftTable: layout, partition pruning through the
  * skipping path, partition-preserving DML. */
class PartitionedTableSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  private def df(rows: (Int, String, String)*): DataFrame =
    spark.createDataFrame(rows.map { case (i, n, l) => Row(i, n, l) }.asJava, schema)

  private def state(d: DataFrame): Set[(Int, String, String)] =
    d.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  private def freshTable(): GraftTable =
    GraftTable.create(spark, tmpDir("pt-"),
      df((1, "a", "en"), (2, "b", "en"), (3, "c", "de"), (4, "d", "fr")),
      partitionBy = Seq("lang"))

  test("create lays out Hive dirs and records partitionValues in the log") {
    val t = freshTable()
    val s = t.snapshot
    assert(s.metaData.partitionColumns === Seq("lang"))
    assert(s.files.forall(f => f.path.startsWith("lang=")))
    assert(s.files.map(_.partitionValues("lang")).toSet === Set("en", "de", "fr"))
    assert(state(t.toDF) ===
      Set((1, "a", "en"), (2, "b", "en"), (3, "c", "de"), (4, "d", "fr")))
  }

  test("partition pruning: equality on partition column reads only its files") {
    val t = freshTable()
    val kept = t.prunedFiles(t.snapshot, col("lang") === "de")
    assert(kept.map(_.partitionValues("lang")).toSet === Set("de"))
    assert(state(t.scan(col("lang") === "de")) === Set((3, "c", "de")))
    // IN over partition values
    val kept2 = t.prunedFiles(t.snapshot, col("lang").isin("en", "fr"))
    assert(kept2.map(_.partitionValues("lang")).toSet === Set("en", "fr"))
  }

  test("DELETE in one partition leaves other partitions' files untouched") {
    val t = freshTable()
    val before = t.snapshot.files.map(_.path).toSet
    assert(t.delete(col("lang") === "en" && col("id") === 1) === 1)
    val after = t.snapshot.files.map(_.path).toSet
    // de and fr files survive identically
    assert(before.filter(p => p.startsWith("lang=de") || p.startsWith("lang=fr"))
      .subsetOf(after))
    assert(state(t.toDF) === Set((2, "b", "en"), (3, "c", "de"), (4, "d", "fr")))
  }

  test("MERGE preserves partitioning; inserts land in their partition dirs") {
    val t = freshTable()
    t.merge(df((2, "b2", "en"), (9, "z", "zh")), "t.id = s.id")
      .whenMatchedUpdate(Map("name" -> "s.name"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "name" -> "s.name", "lang" -> "s.lang"))
      .execute()
    assert(state(t.toDF) ===
      Set((1, "a", "en"), (2, "b2", "en"), (3, "c", "de"), (4, "d", "fr"), (9, "z", "zh")))
    val s = t.snapshot
    assert(s.files.forall(f => f.path.startsWith("lang=")))
    assert(s.files.exists(_.partitionValues("lang") == "zh"))
    // time travel to v0 still shows the pre-merge state
    assert(state(t.versionAsOf(0)).size === 4)
  }

  test("replaceWhere backfills one partition; others survive byte-identical") {
    val t = freshTable()
    val before = t.snapshot.files.map(f => f.path -> f).toMap
    t.overwriteWhere(col("lang") === "en",
      df((10, "A", "en"), (11, "B", "en")))
    assert(state(t.toDF) ===
      Set((10, "A", "en"), (11, "B", "en"), (3, "c", "de"), (4, "d", "fr")))
    // out-of-scope files: same paths, same bytes, never rewritten
    val after = t.snapshot.files.map(f => f.path -> f).toMap
    val untouched = before.keys.filterNot(_.startsWith("lang=en")).toSet
    assert(untouched.subsetOf(after.keySet), "non-en files must survive in the log")
    untouched.foreach { p =>
      assert(after(p) === before(p), s"$p must be the SAME AddFile action") }
    // replacement rows escaping the predicate are rejected up front
    intercept[IllegalArgumentException] {
      t.overwriteWhere(col("lang") === "en", df((12, "x", "de")))
    }
    // the history records a single predicate-scoped OVERWRITE
    assert(t.history().select("operation").first().getString(0) === "OVERWRITE")
  }

  test("replaceWhere carries non-matching rows of partially-overlapping files") {
    // unpartitioned table, one file mixing in- and out-of-scope rows
    val t = GraftTable.create(spark, tmpDir("pt-rw-"),
      df((1, "a", "en"), (2, "b", "de")).repartition(1))
    t.overwriteWhere(col("lang") === "en", df((9, "z", "en")))
    assert(state(t.toDF) === Set((9, "z", "en"), (2, "b", "de")),
      "the de row must be carried through the rewrite")
  }

  test("dynamic partition overwrite replaces exactly the partitions written") {
    val t = freshTable()
    val before = t.snapshot.files.map(f => f.path -> f).toMap
    t.overwritePartitions(df((20, "x", "en"), (21, "y", "fr")))
    assert(state(t.toDF) ===
      Set((20, "x", "en"), (21, "y", "fr"), (3, "c", "de")))
    val after = t.snapshot.files.map(f => f.path -> f).toMap
    val deFiles = before.keys.filter(_.startsWith("lang=de")).toSet
    deFiles.foreach { p =>
      assert(after(p) === before(p), s"$p (untouched partition) must survive") }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("pt-np-"), df((1, "a", "en")))
        .overwritePartitions(df((2, "b", "en")))
    }
  }

  test("append routes rows into partition dirs; special chars decode") {
    val dir = tmpDir("pt-")
    val t = GraftTable.create(spark, dir, df((1, "a", "with space")), Seq("lang"))
    t.append(df((2, "b", "en/us")))
    val vals = t.snapshot.files.map(_.partitionValues("lang")).toSet
    assert(vals === Set("with space", "en/us"))
    assert(state(t.toDF) === Set((1, "a", "with space"), (2, "b", "en/us")))
    assert(state(t.scan(col("lang") === "en/us")) === Set((2, "b", "en/us")))
  }
  test("optimizeWrite.enabled: a many-task partitioned append lands one file per partition value") {
    import spark.implicits._
    val rows = (0 until 4000).map(i => (i.toLong, s"g${i % 5}", i * 1.0))
    // WITHOUT the property: every input task writes into every value's dir
    val plain = GraftTable.create(spark, tmpDir("optw-off-"),
      rows.toDF("id", "grp", "v").repartition(8), partitionBy = Seq("grp"))
    assert(plain.snapshot.files.size > 5,
      s"fixture: an 8-task write must fan out past 5 files, got ${plain.snapshot.files.size}")
    // WITH it: the pre-shuffle collapses each value to one writer task
    val t = GraftTable.create(spark, tmpDir("optw-on-"),
      rows.toDF("id", "grp", "v").limit(0), partitionBy = Seq("grp"))
    t.setProperty("optimizeWrite.enabled", "true")
    t.append(rows.toDF("id", "grp", "v").repartition(8))
    assert(t.snapshot.files.size === 5,
      s"optimized write must emit one file per partition value, got ${t.snapshot.files.size}")
    assert(t.toDF.count() === 4000L)
    // stats/pruning intact after the pre-shuffle
    assert(t.prunedFiles(t.snapshot, $"grp" === "g3").size === 1)
  }
}
