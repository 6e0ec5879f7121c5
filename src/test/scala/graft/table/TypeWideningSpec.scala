package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type widening (`ALTER TABLE ... ALTER COLUMN ... TYPE`): a
  * metadata-only commit — zero data files rewrite, old narrow-typed files
  * read through the scan's declared (wider) schema via the parquet
  * vectorized reader's native upcast. The only affordable schema
  * lifecycle on a table too big to rewrite. Narrowing and lossy
  * conversions reject.
  */
class TypeWideningSpec extends SparkTestBase {
  import spark.implicits._

  private def dataFileCount(t: GraftTable): Int = t.snapshot.files.size

  test("int → long widens metadata-only; old files read and aggregate correctly") {
    val t = GraftTable.create(spark, tmpDir("tw-"),
      Seq((1, 10), (2, 20)).toDF("id", "v"))
    val filesBefore = t.snapshot.files.map(_.path).toSet
    t.alterColumnType("v", LongType)
    // no rewrite happened
    assert(t.snapshot.files.map(_.path).toSet == filesBefore)
    assert(t.snapshot.schema("v").dataType == LongType)
    // old int32 files serve the long read
    assert(t.toDF.agg(sum("v")).as[Long].head() == 30L)
    // values beyond Int.MaxValue now append
    t.append(Seq((3L, 10000000000L)).toDF("id", "v")
      .select(col("id").cast(IntegerType), col("v")))
    assert(t.toDF.agg(sum("v")).as[Long].head() == 10000000030L)
    assert(t.toDF.schema("v").dataType == LongType)
  }

  test("float → double and int → double widen") {
    val t = GraftTable.create(spark, tmpDir("tw2-"),
      Seq((1, 1.5f, 7)).toDF("id", "f", "i"))
    t.alterColumnType("f", DoubleType)
    t.alterColumnType("i", DoubleType)
    val row = t.toDF.select("f", "i").head()
    assert(row.getDouble(0) == 1.5d && row.getDouble(1) == 7.0d)
  }

  test("decimal precision growth widens; shrink rejects") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("amt", DecimalType(5, 2))))
    val t = GraftTable.create(spark, tmpDir("tw3-"),
      spark.createDataFrame(java.util.List.of(
        Row(Integer.valueOf(1), new java.math.BigDecimal("123.45"))), schema))
    t.alterColumnType("amt", DecimalType(10, 2))
    assert(t.toDF.agg(sum("amt")).head().getDecimal(0)
      .compareTo(new java.math.BigDecimal("123.45")) == 0)
    intercept[IllegalArgumentException](t.alterColumnType("amt", DecimalType(5, 2)))
    // scale growth without integer-digit growth also rejects (would shrink
    // the representable integer range)
    intercept[IllegalArgumentException](t.alterColumnType("amt", DecimalType(10, 8)))
  }

  test("narrowing and lossy conversions reject; identity/generated pinned") {
    val t = GraftTable.create(spark, tmpDir("tw4-"),
      Seq((1L, 5)).toDF("big", "small"))
    intercept[IllegalArgumentException](t.alterColumnType("big", IntegerType))
    intercept[IllegalArgumentException](t.alterColumnType("big", DoubleType)) // lossy
    intercept[IllegalArgumentException](t.alterColumnType("small", StringType))
    val ti = GraftTable.create(spark, tmpDir("tw5-"),
      Seq(("x")).toDF("name"), identity = Map("rid" -> (1L, 1L)))
    intercept[IllegalArgumentException](ti.alterColumnType("rid", DoubleType))
  }

  test("time travel across the widen boundary reads the era's schema") {
    val t = GraftTable.create(spark, tmpDir("tw6-"),
      Seq((1, 10)).toDF("id", "v"))
    val preWiden = t.latestVersion
    t.alterColumnType("v", LongType)
    t.append(Seq((2, 20L)).toDF("id", "v").select(col("id"), col("v")))
    assert(t.snapshotAt(preWiden).schema("v").dataType == IntegerType)
    assert(t.versionAsOf(preWiden).agg(sum("v")).head().getLong(0) == 10L)
    assert(t.toDF.agg(sum("v")).as[Long].head() == 30L)
  }

  test("stats-based skipping still prunes through a widened column") {
    val t = GraftTable.create(spark, tmpDir("tw7-"),
      Seq((1, 5)).toDF("id", "v"))
    t.append(Seq((2, 500)).toDF("id", "v"))
    t.alterColumnType("v", LongType)
    t.append(Seq((3L, 5000000000L)).toDF("id", "v")
      .select(col("id").cast(IntegerType), col("v")))
    assert(dataFileCount(t) == 3)
    // old-file stats ("5", "500") and new-file stats compare as longs:
    // a > 1e9 predicate must prune down to the one wide file
    val pruned = t.prunedFiles(t.snapshot, col("v") > 1000000000L)
    assert(pruned.size == 1, s"expected 1 file, got ${pruned.size}")
    assert(t.scan(col("v") > 1000000000L).count() == 1)
  }

  test("SQL ALTER COLUMN TYPE routes through the catalog") {
    val cat = "twcat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("tw-wh-"))
    try {
      spark.sql(s"CREATE TABLE $cat.default.w (id INT, v INT) USING graft")
      spark.sql(s"INSERT INTO $cat.default.w VALUES (1, 10)")
      spark.sql(s"ALTER TABLE $cat.default.w ALTER COLUMN v TYPE BIGINT")
      spark.sql(s"INSERT INTO $cat.default.w VALUES (2, 10000000000)")
      assert(spark.sql(s"SELECT sum(v) FROM $cat.default.w").as[Long].head()
        == 10000000010L)
      val ex = intercept[Exception](
        spark.sql(s"ALTER TABLE $cat.default.w ALTER COLUMN v TYPE INT"))
      // Spark's analyzer rejects the narrowing before the catalog does
      // (NOT_SUPPORTED_CHANGE_COLUMN); the engine-side guard covers the
      // API path (previous test)
      assert(ex.getMessage.contains("not a supported widening") ||
        ex.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }
}
