package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NOT NULL column invariants (Delta "Column Invariants"): a table whose
  * schema declares `nullable = false` rejects a null bound for that column
  * on EVERY write path, at write time, before any commit lands — and the
  * non-ANSI cast can no longer smuggle a bad-typed value in as a silent
  * null. `ALTER COLUMN DROP NOT NULL` (setNullability) is the escape
  * hatch; SET NOT NULL validates existing rows first.
  */
class NullInvariantSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = true)))

  private def rows(vs: (Integer, String)*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(vs.map(v => Row(v._1, v._2)): _*), schema.copy(
        fields = schema.fields.map(_.copy(nullable = true))))

  private def freshTable(): GraftTable = {
    val seed = spark.createDataFrame(
      java.util.List.of(Row(Integer.valueOf(1), "a")), schema)
    GraftTable.create(spark, tmpDir("nn-"), seed)
  }

  private def assertNullRejected(body: => Unit): Unit = {
    val ex = intercept[Exception](body)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m => m.contains("NOT NULL") || m.contains("null")),
      s"expected a NOT NULL violation, got: ${messages(ex).mkString(" | ")}")
  }

  test("nullability survives the log round-trip") {
    val t = freshTable()
    assert(!GraftTable.forPath(spark, t.path).snapshot.schema("id").nullable)
    assert(GraftTable.forPath(spark, t.path).snapshot.schema("name").nullable)
  }

  test("append with a null in a NOT NULL column throws; nothing commits") {
    val t = freshTable()
    val v0 = t.latestVersion
    assertNullRejected(t.append(rows((null, "ghost"))))
    assert(t.latestVersion == v0)
    assert(t.toDF.count() == 1)
  }

  test("overwrite and COPY-style batch paths enforce the invariant") {
    val t = freshTable()
    assertNullRejected(t.overwrite(rows((2, "x"), (null, "y"))))
    assert(t.toDF.count() == 1)
  }

  test("MERGE insert images enforce the invariant") {
    val t = freshTable()
    assertNullRejected(
      t.merge(rows((null, "new")), "t.id = s.id")
        .whenNotMatchedInsert(Map("id" -> "s.id", "name" -> "s.name"))
        .execute())
  }

  test("UPDATE to null in a NOT NULL column throws") {
    val t = freshTable()
    assertNullRejected(t.update("id = 1", Map("id" -> "cast(null as int)")))
    assert(t.toDF.select("id").as[Int].collect().toSeq == Seq(1))
  }

  test("un-castable values raise instead of silently nulling") {
    val t = freshTable()
    val bad = Seq(("12x", "oops")).toDF("id", "name") // "12x" → int nulls under non-ANSI cast
    val ex = intercept[Exception](t.append(bad))
    def messages(th: Throwable): Seq[String] =
      if (th == null) Nil else Option(th.getMessage).toSeq ++ messages(th.getCause)
    assert(messages(ex).exists(m => m.contains("not castable") || m.contains("cannot be cast")),
      s"expected a cast error, got: ${messages(ex).mkString(" | ")}")
    // a CASTABLE string still writes (store-assignment casts are fine)
    t.append(Seq(("7", "ok")).toDF("id", "name"))
    assert(t.toDF.filter(col("id") === 7).count() == 1)
  }

  test("DROP NOT NULL is the escape hatch; SET NOT NULL validates existing rows") {
    val t = freshTable()
    t.setNullability("id", nullable = true)
    t.append(rows((null, "now-legal")))
    assert(t.toDF.filter(col("id").isNull).count() == 1)
    // existing null blocks re-tightening
    val ex = intercept[IllegalArgumentException](
      t.setNullability("id", nullable = false))
    assert(ex.getMessage.contains("existing rows contain nulls"))
    // clean the null out, then tightening succeeds and enforces again
    t.delete(col("id").isNull)
    t.setNullability("id", nullable = false)
    assertNullRejected(t.append(rows((null, "again"))))
  }

  test("streaming sink rejects nulls row-side (raw writer path)") {
    val t = freshTable()
    val src = tmpDir("nn-src-")
    val checkpoint = tmpDir("nn-ck-")
    rows((null, "streamed")).write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(StructType(schema.fields.map(_.copy(nullable = true))))
      .parquet(src)
      .writeStream.format("graft")
      .option("path", t.path)
      .option("checkpointLocation", checkpoint)
      .start()
    val ex = intercept[Exception](stream.processAllAvailable())
    stream.stop()
    def messages(th: Throwable): Seq[String] =
      if (th == null) Nil else Option(th.getMessage).toSeq ++ messages(th.getCause)
    assert(messages(ex).exists(_.contains("NOT NULL")),
      s"expected NOT NULL from sink, got: ${messages(ex).take(3).mkString(" | ")}")
    assert(t.toDF.count() == 1)
  }

  test("SQL INSERT through the catalog enforces the invariant") {
    val cat = "nncat"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", tmpDir("nn-wh-"))
    try {
      spark.sql(s"CREATE TABLE $cat.default.people (id INT NOT NULL, name STRING) USING graft")
      spark.sql(s"INSERT INTO $cat.default.people VALUES (1, 'Ada')")
      // Spark's own store-assignment layer or the engine guard must stop it
      val ex = intercept[Exception](
        spark.sql(s"INSERT INTO $cat.default.people VALUES (CAST(NULL AS INT), 'x')"))
      def messages(th: Throwable): Seq[String] =
        if (th == null) Nil else Option(th.getMessage).toSeq ++ messages(th.getCause)
      assert(messages(ex).exists(m =>
        m.contains("NOT NULL") || m.toLowerCase.contains("null")))
      assert(spark.sql(s"SELECT * FROM $cat.default.people").count() == 1)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }
}
