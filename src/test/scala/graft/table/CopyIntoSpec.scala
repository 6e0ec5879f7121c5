package graft.table

import scala.jdk.CollectionConverters._

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** COPY INTO idempotent ingestion, RESTORE TO TIMESTAMP, CLONE VERSION AS
  * OF, and VACUUM DRY RUN. */
class CopyIntoSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("v", StringType, nullable = false)))

  private def df(rows: (Int, String)*) =
    spark.createDataFrame(rows.map { case (i, s) => Row(i, s) }.asJava, schema)

  private def landFile(dir: String, name: String, rows: (Int, String)*): Unit =
    df(rows: _*).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/.stage-$name")
      .ensuring { _ =>
        val part = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/.stage-$name"))
          .iterator().asScala
          .find(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")).get
        java.nio.file.Files.move(part, java.nio.file.Paths.get(dir, name))
        true
      }

  test("copyInto loads each source file exactly once; new files load incrementally") {
    val landing = tmpDir("land-")
    landFile(landing, "a.parquet", 1 -> "a", 2 -> "b")
    val t = GraftTable.create(spark, tmpDir("copy-"), df())
    assert(t.copyInto(landing) == 2L)
    assert(t.copyInto(landing) == 0L) // re-run: nothing new
    assert(t.toDF.count() == 2)
    landFile(landing, "b.parquet", 3 -> "c")
    assert(t.copyInto(landing) == 1L) // only the new file
    assert(t.copyInto(landing) == 0L)
    assert(t.toDF.orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // the ingestion ledger is in the snapshot fold, not a history rescan
    assert(t.snapshot.transactions.keys.count(_.startsWith("copyInto:")) == 2)
  }

  test("a source file that changed (newer mtime) re-ingests") {
    val landing = tmpDir("land2-")
    landFile(landing, "a.parquet", 1 -> "a")
    val t = GraftTable.create(spark, tmpDir("copy2-"), df())
    assert(t.copyInto(landing) == 1L)
    Thread.sleep(5)
    java.nio.file.Files.delete(java.nio.file.Paths.get(landing, "a.parquet"))
    landFile(landing, "a.parquet", 1 -> "a", 9 -> "z")
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(landing, "a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 1000))
    assert(t.copyInto(landing) == 2L)
    assert(t.toDF.count() == 3)
  }

  test("restore to timestamp resolves like time-travel reads") {
    val t = GraftTable.create(spark, tmpDir("rts-"), df(1 -> "a"))
    val tsAfterV0 = new java.sql.Timestamp(t.log.commitInfos(0).timestamp)
    t.append(df(2 -> "b"))
    t.restore(tsAfterV0)
    assert(t.toDF.count() == 1)
    assert(t.history().head().getString(2) == "RESTORE")
  }

  test("clone VERSION AS OF branches the earlier snapshot") {
    val t = GraftTable.create(spark, tmpDir("cav-"), df(1 -> "a"))
    t.append(df(2 -> "b"))
    val c = t.cloneTo(tmpDir("cav-clone-"), asOfVersion = Some(0L))
    assert(c.toDF.count() == 1)
    assert(t.toDF.count() == 2) // source untouched
  }

  test("vacuum dry run lists exactly what vacuum would delete, touching nothing") {
    val t = GraftTable.create(spark, tmpDir("vdr-"), df(1 -> "a", 2 -> "b"))
    t.delete(col("id") === 1) // rewrites the file; old one becomes unreferenced
    val listed = t.vacuumDryRun(retainVersions = 0, retentionMs = 0L)
    assert(listed.nonEmpty)
    listed.foreach(f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, f)),
        "dry run must not delete"))
    t.setProperty("vacuum.retentionDurationCheck", "false")
    val deleted = t.vacuum(retainVersions = 0, retentionMs = 0L)
    assert(deleted == listed.size)
    listed.foreach(f =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, f))))
  }
}
