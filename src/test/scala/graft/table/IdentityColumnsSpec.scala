package graft.table

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Identity columns (`GENERATED ALWAYS AS IDENTITY`): engine-assigned ids,
  * sparse-but-unique across appends/merges/overwrites, frontier advanced
  * in the allocating commit itself, explicit values rejected everywhere,
  * and the metadata bump that makes concurrent allocation a typed conflict
  * instead of silent id duplication. */
class IdentityColumnsSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("v", IntegerType, nullable = false)))

  private def df(rows: (String, Int)*): DataFrame =
    spark.createDataFrame(rows.map { case (n, v) => Row(n, v) }.asJava, schema)

  private def mk(): GraftTable =
    GraftTable.create(spark, tmpDir("ident-"),
      df(("a", 1), ("b", 2), ("c", 3)),
      identity = Map("row_id" -> (100L, 1L)))

  private def ids(t: GraftTable): Seq[Long] =
    t.toDF.select("row_id").collect().map(_.getLong(0)).toSeq

  test("create assigns unique ids at/above start and records the frontier") {
    val t = mk()
    val got = ids(t)
    assert(got.distinct.size == 3)
    assert(got.forall(_ >= 100L))
    val hwm = t.snapshot.metaData.properties(IdentityColumns.hwmKey("row_id")).toLong
    assert(hwm == got.max)
    assert(t.snapshot.protocol.writerFeatures.contains("identityColumns"))
    // declaration survives a log round-trip
    assert(IdentityColumns.of(GraftTable.forPath(spark, t.path).snapshot.schema) ==
      Seq(IdentityColumns.Spec("row_id", 100L, 1L)))
  }

  test("append allocates strictly above the previous frontier; supplied values rejected") {
    val t = mk()
    val before = ids(t)
    t.append(df(("d", 4), ("e", 5)))
    val after = ids(t)
    assert(after.distinct.size == 5)
    assert((after.toSet -- before.toSet).forall(_ > before.max))
    // the rejection rides the write projection (raise_error on a non-null
    // input — no separate validation pass), so it surfaces as the write
    // job's failure
    val e = intercept[Exception](
      t.append(df(("x", 9)).withColumn("row_id", lit(1L))))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("GENERATED ALWAYS")))
    // an all-null column means "assign" (the SQL default-filled shape)
    t.append(df(("y", 7)).withColumn("row_id", lit(null).cast("long")))
    assert(ids(t).distinct.size == 6)
  }

  test("MERGE inserts get fresh ids; matched rows keep theirs; naming the column fails") {
    val t = mk()
    val keptId = t.toDF.filter(col("name") === "b").select("row_id").head().getLong(0)
    t.merge(df(("b", 22), ("f", 6)), "t.name = s.name")
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert(Map("name" -> "s.name", "v" -> "s.v"))
      .execute()
    assert(t.toDF.filter(col("name") === "b").select("row_id").head().getLong(0) == keptId)
    assert(ids(t).distinct.size == 4)
    assert(t.toDF.filter(col("name") === "f").select("row_id").head().getLong(0) >
      keptId)
    val e = intercept[IllegalArgumentException](
      t.merge(df(("z", 0)), "t.name = s.name")
        .whenNotMatchedInsert(Map("name" -> "s.name", "v" -> "s.v", "row_id" -> "7"))
        .execute())
    assert(e.getMessage.contains("identity"))
    val u = intercept[IllegalArgumentException](
      t.update("name = 'b'", Map("row_id" -> "9")))
    assert(u.getMessage.contains("identity"))
  }

  test("overwrite and replaceWhere reassign through the frontier — never reuse") {
    val t = mk()
    val before = ids(t)
    t.overwrite(df(("p", 7), ("q", 8)))
    val after = ids(t)
    assert(after.distinct.size == 2)
    assert(after.forall(_ > before.max)) // old ids are never reissued
    val hwm = t.snapshot.metaData.properties(IdentityColumns.hwmKey("row_id")).toLong
    assert(hwm == after.max)
  }

  test("the allocating commit carries the frontier bump as a MetaData action") {
    val t = mk()
    t.append(df(("d", 4)))
    val actions = t.log.readVersion(t.latestVersion)
    assert(actions.exists(_.isInstanceOf[MetaData]),
      "identity append must bump the frontier IN its own commit — that is " +
        "what makes a concurrent allocation a typed MetadataChanged conflict")
  }

  test("with CDF on, change rows carry the SAME ids as the written data") {
    val t = mk()
    t.setProperty("changeDataFeed.enabled", "true")
    t.merge(df(("x", 10)), "t.name = s.name")
      .whenMatchedUpdate(Map("v" -> "s.v"))
      .whenNotMatchedInsert(Map("name" -> "s.name", "v" -> "s.v"))
      .execute()
    val v = t.latestVersion
    val dataId = t.toDF.filter(col("name") === "x").select("row_id").head().getLong(0)
    val cdcId = t.changes(v - 1, v)
      .filter(col("_change_type") === "insert" && col("name") === "x")
      .select("row_id").head().getLong(0)
    assert(cdcId == dataId,
      "the CDC sidecar must describe the ids that were actually written")
    // replaceWhere path too
    t.overwriteWhere(col("name") === "x", df(("x", 99)))
    val v2 = t.latestVersion
    val dataId2 = t.toDF.filter(col("name") === "x").select("row_id").head().getLong(0)
    val cdcId2 = t.changes(v2 - 1, v2)
      .filter(col("_change_type") === "insert" && col("name") === "x")
      .select("row_id").head().getLong(0)
    assert(cdcId2 == dataId2)
  }

  test("streaming sink refuses identity tables") {
    val t = mk()
    val e = intercept[IllegalArgumentException](
      new graft.sources.GraftStreamingWrite(t, t.snapshot.schema, "q")
        .createStreamingWriterFactory(null))
    assert(e.getMessage.contains("identity"))
  }
}
