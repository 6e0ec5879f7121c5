package graft.table

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Symlink-manifest export (Delta's GENERATE symlink_format_manifest) and
  * the `graft_detail` SQL TVF. */
class ManifestDetailSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  private def mk(partitioned: Boolean): GraftTable =
    GraftTable.create(spark, tmpDir("man-"),
      spark.createDataFrame(java.util.List.of(
        Row(1, "en"), Row(2, "en"), Row(3, "de"), Row(4, "fr")), schema),
      partitionBy = if (partitioned) Seq("lang") else Nil)

  private def manifestUris(t: GraftTable): Set[String] = {
    val root = java.nio.file.Paths.get(t.path, "_symlink_format_manifest")
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .flatMap(p => new String(java.nio.file.Files.readAllBytes(p)).split("\n"))
      .filter(_.nonEmpty).toSet
  }

  test("manifest lists exactly the live files, one manifest per partition dir") {
    val t = mk(partitioned = true)
    val n = t.generateManifest()
    assert(n == 3) // en, de, fr
    val expected = t.snapshot.files
      .map(f => java.nio.file.Paths.get(t.path, f.path).toUri.toString).toSet
    assert(manifestUris(t) == expected)
    // DML then regenerate: the dropped partition's manifest disappears
    t.delete(col("lang") === "de")
    val n2 = t.generateManifest()
    assert(n2 == 2)
    val expected2 = t.snapshot.files
      .map(f => java.nio.file.Paths.get(t.path, f.path).toUri.toString).toSet
    assert(manifestUris(t) == expected2)
    assert(!manifestUris(t).exists(_.contains("lang=de")))
  }

  test("unpartitioned manifest is a single file readable as a plain listing") {
    val t = mk(partitioned = false)
    assert(t.generateManifest() == 1)
    // every listed URI points at an existing parquet file
    manifestUris(t).foreach { uri =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(java.net.URI.create(uri))))
    }
  }

  test("graft_detail TVF serves the one-row log summary through SQL") {
    val t = mk(partitioned = false)
    val r = spark.sql(
      s"SELECT version, numFiles, numRows, sizeInBytes FROM graft_detail('${t.path}')")
      .head()
    assert(r.getLong(0) == t.latestVersion)
    assert(r.getLong(1) == t.snapshot.files.size.toLong)
    assert(r.getLong(2) == 4L)
    assert(r.getLong(3) > 0L)
  }
}
