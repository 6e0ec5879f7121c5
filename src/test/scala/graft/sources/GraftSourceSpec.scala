package graft.sources

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** format("graft") read/write parity with the table API, incl. time-travel
  * options, save modes, pruning correctness. */
class GraftSourceSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false)))

  private def df(rows: (Int, String)*): DataFrame =
    spark.createDataFrame(rows.map { case (i, n) => Row(i, n) }.asJava, schema)

  private def ids(d: DataFrame): Set[Int] = d.collect().map(_.getInt(0)).toSet

  test("write then read round-trips; append and overwrite modes") {
    val dir = tmpDir("src-")
    df((1, "a"), (2, "b")).write.format("graft").save(dir)
    assert(ids(spark.read.format("graft").load(dir)) === Set(1, 2))

    df((3, "c")).write.format("graft").mode(SaveMode.Append).save(dir)
    assert(ids(spark.read.format("graft").load(dir)) === Set(1, 2, 3))

    intercept[Exception] {
      df((9, "x")).write.format("graft").mode(SaveMode.ErrorIfExists).save(dir)
    }

    df((7, "z")).write.format("graft").mode(SaveMode.Overwrite).save(dir)
    assert(ids(spark.read.format("graft").load(dir)) === Set(7))
    val t = GraftTable.forPath(spark, dir)
    // overwrite is ONE atomic commit (readers never see the empty middle),
    // and versioned: pre-overwrite state still time-travels
    assert(t.history().select("operation").first().getString(0) === "OVERWRITE")
    assert(ids(t.versionAsOf(t.latestVersion - 1)) === Set(1, 2, 3))
  }

  test("writer replaceWhere option scopes the overwrite; dynamic mode replaces partitions") {
    val dir = tmpDir("src-rw-")
    val part = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("lang", StringType, nullable = false)))
    def pdf(rows: (Int, String)*): DataFrame =
      spark.createDataFrame(rows.map { case (i, l) => Row(i, l) }.asJava, part)
    GraftTable.create(spark, dir,
      pdf((1, "en"), (2, "de"), (3, "fr")), partitionBy = Seq("lang"))

    // replaceWhere: only the en slice is replaced
    pdf((10, "en"), (11, "en")).write.format("graft")
      .mode(SaveMode.Overwrite).option("replaceWhere", "lang = 'en'").save(dir)
    assert(ids(spark.read.format("graft").load(dir)) === Set(10, 11, 2, 3))
    // escaping rows are rejected before any commit
    intercept[IllegalArgumentException] {
      pdf((12, "de")).write.format("graft")
        .mode(SaveMode.Overwrite).option("replaceWhere", "lang = 'en'").save(dir)
    }

    // dynamic partition overwrite: exactly the partitions written replace
    pdf((20, "de")).write.format("graft")
      .mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic").save(dir)
    assert(ids(spark.read.format("graft").load(dir)) === Set(10, 11, 20, 3))
  }

  test("versionAsOf / timestampAsOf options time travel (reference read shape)") {
    val dir = tmpDir("src-")
    df((1, "a")).write.format("graft").save(dir)
    df((2, "b")).write.format("graft").mode(SaveMode.Append).save(dir)
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(dir)
    assert(ids(v0) === Set(1))
    val t = GraftTable.forPath(spark, dir)
    val ts1 = new java.sql.Timestamp(t.log.commitInfos(1).timestamp).toString
    val atTs = spark.read.format("graft").option("timestampAsOf", ts1).load(dir)
    assert(ids(atTs) === Set(1, 2))
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 9).load(dir).collect()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", 0)
        .option("timestampAsOf", ts1).load(dir).collect()
    }
  }

  test("filters and projections through the source equal full-scan results") {
    import spark.implicits._
    val dir = tmpDir("src-")
    val big = (0 until 400).map(i => (i, s"n$i"))
    spark.createDataFrame(big.map { case (i, n) => Row(i, n) }.asJava, schema)
      .repartitionByRange(4, $"id")
      .write.format("graft").save(dir)

    val src = spark.read.format("graft").load(dir)
    assert(src.filter($"id" === 42).collect().map(_.getInt(0)).toSeq === Seq(42))
    assert(src.filter($"id" >= 390 && $"id" < 395).count() === 5)
    assert(src.select($"name").filter($"name" === "n7").count() === 1)
    // filter no skipping can help with still returns exact rows
    assert(src.filter($"id" % 100 === 0).count() === 4)
  }
}
