package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Collated string columns (Spark 4 `STRING COLLATE ...`) as first-class
  * graft schema types. The load-bearing property is NEGATIVE: byte-ordered
  * file statistics are MEANINGLESS under a non-binary collation ('GERMANY'
  * and 'germany' are equal under UTF8_LCASE but sort a byte-range apart),
  * so every stats consumer — min/max pruning, prefix pruning, bloom
  * probes, metadata-only MIN/MAX — must refuse to act on a collated
  * column. A pruner that treated collated bounds as ordered would
  * silently DROP matching rows at 100 TB; these tests plant exactly that
  * trap (a file whose byte-range excludes the probe value but whose rows
  * match under the collation) and require the scan to survive it. */
class CollationSpec extends SparkTestBase {
  import spark.implicits._

  private val ci: StringType = StringType("UTF8_LCASE")

  private def ciSchema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("name", ci, nullable = true)))

  test("collated schema round-trips the log; equality matches case-insensitively through the scan") {
    val dir = tmpDir("collate-")
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "GERMANY"),
        org.apache.spark.sql.Row(2L, "germany"),
        org.apache.spark.sql.Row(3L, "France")),
      ciSchema)
    val t = GraftTable.create(spark, dir, rows)
    // a FRESH load re-parses the schemaString: the collation must survive
    val fresh = GraftTable.forPath(spark, dir)
    assert(fresh.snapshot.schema("name").dataType === ci,
      s"collation must round-trip the log, got ${fresh.snapshot.schema("name").dataType}")
    // collation-aware equality through the scan (both case variants match)
    assert(fresh.toDF.filter(col("name") === "Germany").count() === 2)
    // and collation-aware grouping
    assert(fresh.toDF.select(countDistinct(col("name"))).head().getLong(0) === 2)
    t.append(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(4L, "FRANCE")), ciSchema))
    assert(GraftTable.forPath(spark, dir).toDF
      .filter(col("name") === "france").count() === 2)
  }

  test("byte-ordered stats never prune a collated column: planted case-variant trap") {
    val dir = tmpDir("collate-prune-")
    // file 1 holds ONLY uppercase: min = max = 'GERMANY' (0x47...) — a
    // byte-ordered pruner probing 'germany' (0x67...) would skip it
    val t = GraftTable.create(spark, dir, spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "GERMANY")), ciSchema))
    t.append(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(2L, "zzz")), ciSchema))
    assert(t.snapshot.files.size === 2)
    // equality: the uppercase file MUST be read (its row matches)
    assert(t.toDF.filter(col("name") === "germany").count() === 1)
    // range: 'a' < name < 'h' matches 'GERMANY' under LCASE but the byte
    // range ['GERMANY','GERMANY'] misses ['a','h'] entirely
    assert(t.toDF.filter(col("name") > "a" && col("name") < "h").count() === 1)
    // prefix: LIKE 'germ%' matches case-insensitively under LCASE
    assert(t.toDF.filter(col("name").startsWith("germ")).count() === 1)
    // the pruner itself reports both files as may-match for the probes
    val resolved = DataSkipping.resolve(spark, t.snapshot.schema,
      col("name") === "germany")
    assert(DataSkipping.prune(resolved, t.snapshot.files).size === 2,
      "a collated equality must not consult byte-ordered bounds")
    // while a sibling BINARY-collated column still prunes normally
    val idResolved = DataSkipping.resolve(spark, t.snapshot.schema,
      col("id") === 2L)
    assert(DataSkipping.prune(idResolved, t.snapshot.files).size === 1,
      "binary columns must keep pruning alongside a collated sibling")
  }

  test("bloom probes skip collated columns; metadata MIN/MAX refuses them") {
    val dir = tmpDir("collate-bloom-")
    val t = GraftTable.create(spark, dir, spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "GERMANY"),
        org.apache.spark.sql.Row(2L, "France")),
      ciSchema), bloomFilterOn = Seq("name"))
    t.append(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(3L, "spain")), ciSchema))
    // the bloom holds bytes of 'GERMANY'; probing bytes of 'germany'
    // would miss — the probe must not consult the bloom at all
    assert(t.toDF.filter(col("name") === "germany").count() === 1)
    // metadata-only MIN/MAX: a byte extremum is not the collation's
    // extremum — must refuse (fall back to the scan path)
    assert(t.metadataMinMax("name").isEmpty,
      "metadataMinMax must refuse a collated column")
    assert(t.metadataMinMax("id").nonEmpty)
  }

  test("collated schema gates the protocol; compat.delta.write refuses it") {
    val dir = tmpDir("collate-gate-")
    val t = GraftTable.create(spark, dir, spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "X")), ciSchema))
    // the creating commit stamps the gate — a build that predates
    // collations must refuse at load, never compare by binary order
    assert(t.snapshot.protocol.readerFeatures.contains("graft.collations"))
    assert(t.snapshot.protocol.writerFeatures.contains("graft.collations"))
    // delta has no graft-emitted collation spelling: enabling compat
    // must refuse naming the problem (binary-order delta readers would
    // silently change equality/sort semantics)
    val e = intercept[GraftProtocolException](
      t.setProperty(DeltaWriteCompat.Prop, "true"))
    assert(e.getMessage.toLowerCase.contains("collat"), e.getMessage)
    // a plain-string table is unaffected by the gate
    val t2 = GraftTable.create(spark, tmpDir("collate-plain-"),
      spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "X")),
        StructType(Seq(
          StructField("id", LongType, nullable = true),
          StructField("name", StringType, nullable = true)))))
    assert(!t2.snapshot.protocol.readerFeatures.contains("graft.collations"))
  }

  test("DML through a collated predicate: DELETE removes BOTH case variants") {
    val dir = tmpDir("collate-dml-")
    // same trap layout as the pruning test: the uppercase-only file's byte
    // bounds exclude the lowercase probe — a pruner that consulted them
    // would leave the GERMANY row alive after DELETE (silent wrong data)
    val t = GraftTable.create(spark, dir, spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "GERMANY"),
        org.apache.spark.sql.Row(2L, "France")),
      ciSchema))
    t.append(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(3L, "germany")), ciSchema))
    t.delete(col("name") === "Germany")
    val left = t.toDF.collect().map(_.getLong(0)).toSet
    assert(left === Set(2L), s"DELETE must hit both case variants, kept $left")
    // UPDATE through the same machinery
    t.update(col("name") === "france", Map("name" -> "'FR'"))
    assert(t.toDF.head().getString(1) === "FR")
  }

  test("SQL front door: CREATE ... COLLATE, INSERT, collation-aware GROUP BY") {
    graft.sources.GraftCatalog.register(spark, tmpDir("collate-wh-"), name = "colc")
    spark.sql("CREATE TABLE colc.default.langs (id BIGINT, lang STRING COLLATE UTF8_LCASE) USING graft")
    spark.sql("INSERT INTO colc.default.langs VALUES (1, 'EN'), (2, 'en'), (3, 'fr')")
    val grouped = spark.sql(
      "SELECT count(DISTINCT lang) AS n FROM colc.default.langs").head().getLong(0)
    assert(grouped === 2, s"UTF8_LCASE distinct must merge case variants, got $grouped")
    assert(spark.sql("SELECT count(*) AS n FROM colc.default.langs WHERE lang = 'En'")
      .head().getLong(0) === 2)
  }
}
