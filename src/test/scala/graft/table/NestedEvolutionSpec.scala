package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-struct schema evolution: `addColumn("a.b.c", t)` and
  * mergeSchema appends that add fields INSIDE structs — metadata-only
  * commits; files written before the evolution read the nested field as
  * null (parquet missing-column semantics reach inside structs). */
class NestedEvolutionSpec extends SparkTestBase {

  private def seed(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, (s"n$i", i * 10L))).toDF("id", "meta")
      .select($"id", $"meta".cast("struct<name:string,score:bigint>").as("meta"))
  }

  test("addColumn(a.b): metadata-only commit; old files read the nested field as null") {
    import spark.implicits._
    val dir = tmpDir("nested-add-")
    val t = GraftTable.create(spark, dir, seed(0 until 5))
    val v0 = t.latestVersion
    val filesBefore = t.snapshot.files.map(_.path).toSet
    t.addColumn("meta.grade", StringType)
    // metadata-only: same files, one more version
    assert(t.latestVersion === v0 + 1)
    assert(t.snapshot.files.map(_.path).toSet === filesBefore)
    assert(t.snapshot.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("name", "score", "grade"))
    // old rows read null through the evolved schema
    val rows = t.toDF.select($"id", $"meta.grade").collect()
    assert(rows.length === 5 && rows.forall(_.isNullAt(1)))
    // new-shape append: both generations coexist
    val more = Seq((100L, ("n100", 1000L, "A")))
      .toDF("id", "meta")
      .select($"id",
        $"meta".cast("struct<name:string,score:bigint,grade:string>").as("meta"))
    t.append(more)
    val byId = t.toDF.select($"id", $"meta.grade").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(byId(100L) === "A" && byId(0L) === null)
    // time travel below the evolution serves the OLD schema
    assert(!t.versionAsOf(v0).schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.contains("grade"))
    // deep path + error shapes
    intercept[IllegalArgumentException](t.addColumn("id.x", LongType))
    intercept[IllegalArgumentException](t.addColumn("nosuch.x", LongType))
  }

  test("old-shaped appends after nested evolution fill the missing field with null") {
    import spark.implicits._
    val dir = tmpDir("nested-fill-")
    val t = GraftTable.create(spark, dir, seed(0 until 3))
    t.addColumn("meta.grade", StringType)
    // writer still supplies the PRE-evolution struct shape — the conform
    // projection aligns it, the nested twin of a missing top-level column
    t.append(seed(10 until 13))
    val rows = t.toDF.select($"id", $"meta.name", $"meta.grade").collect()
    assert(rows.length === 6)
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.map(_.getString(1)).toSet === Set("n0", "n1", "n2", "n10", "n11", "n12"))
    // a null struct stays null — never becomes a struct of nulls
    val withNull = Seq((50L, None: Option[(String, Long)])).toDF("id", "meta")
      .select($"id", $"meta".cast("struct<name:string,score:bigint>").as("meta"))
    t.append(withNull)
    val r50 = t.toDF.filter($"id" === 50L).select($"meta").head
    assert(r50.isNullAt(0))
    // extra nested fields reject, mirroring the top-level extra-column check
    val extra = Seq((60L, ("x", 1L, "g", true))).toDF("id", "meta")
      .select($"id", $"meta"
        .cast("struct<name:string,score:bigint,grade:string,bogus:boolean>").as("meta"))
    val e = intercept[Exception](t.append(extra))
    assert(e.getMessage.contains("bogus") || e.getMessage.contains("extra"))
  }

  test("mergeSchema append adds nested fields inside existing structs") {
    import spark.implicits._
    val dir = tmpDir("nested-merge-")
    val t = GraftTable.create(spark, dir, seed(0 until 3))
    val evolvedDf = Seq((20L, ("n20", 200L, 7L))).toDF("id", "meta")
      .select($"id",
        $"meta".cast("struct<name:string,score:bigint,rank:bigint>").as("meta"))
    t.append(evolvedDf, mergeSchema = true)
    assert(t.snapshot.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.contains("rank"))
    val byId = t.toDF.select($"id", $"meta.rank").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(byId(20L) === 7L && byId(0L) === -1L)
  }

  test("column mapping: a nested add gets a fresh physical name; round-trip intact") {
    import spark.implicits._
    val dir = tmpDir("nested-cm-")
    val t = GraftTable.create(spark, dir, seed(0 until 3))
    t.setProperty("columnMapping.mode", "name")
    t.addColumn("meta.grade", StringType)
    val metaType = t.snapshot.schema("meta").dataType.asInstanceOf[StructType]
    val leaf = metaType("grade")
    val phys1 = ColumnMapping.physicalName(leaf)
    assert(phys1 != "grade", s"nested add under mapping must get a fresh physical name")
    // data written under the physical nested name reads back logically
    val more = Seq((30L, ("n30", 300L, "B"))).toDF("id", "meta")
      .select($"id",
        $"meta".cast("struct<name:string,score:bigint,grade:string>").as("meta"))
    t.append(more)
    val byId = t.toDF.select($"id", $"meta.grade").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(byId(30L) === "B" && byId(0L) === null)
    // the parquet file itself carries the PHYSICAL nested name
    val newest = t.snapshot.files.maxBy(_.modificationTime)
    val raw = spark.read.parquet(s"$dir/${newest.path}")
    val fileMeta = raw.schema.fields.find(f =>
      ColumnMapping.physicalName(t.snapshot.schema("meta")) == f.name).get
    assert(fileMeta.dataType.asInstanceOf[StructType].fieldNames.contains(phys1))
    // a re-added nested field never reuses the old physical slot: rename
    // away, re-add the same logical name, physical names must differ
    t.renameColumn("meta", "m2")
    t.addColumn("m2.grade2", StringType)
    val phys2 = ColumnMapping.physicalName(
      t.snapshot.schema("m2").dataType.asInstanceOf[StructType]("grade2"))
    assert(phys2 != "grade2" && phys2 != phys1)
  }

  test("MERGE withSchemaEvolution adds nested source fields") {
    import spark.implicits._
    val dir = tmpDir("nested-merge-ev-")
    val t = GraftTable.create(spark, dir, seed(0 until 3))
    val src = Seq((1L, ("n1x", 111L, true))).toDF("id", "meta")
      .select($"id",
        $"meta".cast("struct<name:string,score:bigint,vip:boolean>").as("meta"))
    t.merge(src, "t.id = s.id")
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("id" -> "s.id", "meta" -> "s.meta"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "meta" -> "s.meta"))
      .execute()
    assert(t.snapshot.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.contains("vip"))
    val byId = t.toDF.select($"id", $"meta.vip").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(byId(1L) === true && byId(0L) === null)
  }
}
