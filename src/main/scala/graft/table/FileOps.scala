package graft.table

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.DataFrame

/** Data-file plumbing: stage a DataFrame write, move the part files into the
  * table directory under fresh UUID names, and harvest per-file footer stats
  * (row count + column min/max) into AddFile actions for data skipping.
  *
  * Local-filesystem moves are used here; at cluster scale the same protocol
  * runs over any store with rename — the log, not the file system, provides
  * atomicity (files are invisible until their commit lands).
  */
object FileOps {

  /** Write `df` as parquet files inside `tablePath` (Hive-style partition
    * dirs when `partitionCols` is non-empty), returning AddFiles with footer
    * stats + partition values. Zero-row part files are dropped. */
  def writeDataFiles(df: DataFrame, tablePath: String,
                     partitionCols: Seq[String] = Nil): Seq[AddFile] = {
    val staging = Paths.get(tablePath, s".staging-${UUID.randomUUID()}")
    val writer = if (partitionCols.nonEmpty) df.write.partitionBy(partitionCols: _*)
                 else df.write
    writer.parquet(staging.toString)
    val parts = Files.walk(staging).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    val adds = parts.flatMap { part =>
      val relDir = staging.relativize(part.getParent) // "" or "lang=en/..."
      val partVals = relDir.toString.split('/').filter(_.contains("=")).map { seg =>
        val Array(k, v) = seg.split("=", 2)
        // partition dir names are URL-encoded by the writer
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
      val relTarget =
        (if (relDir.toString.isEmpty) "" else s"$relDir/") +
          s"part-${UUID.randomUUID()}.parquet"
      val target = Paths.get(tablePath, relTarget)
      Files.createDirectories(target.getParent)
      Files.move(part, target)
      val (rows, mins, maxs) = footerStats(target)
      if (rows == 0L) { Files.delete(target); None }
      else Some(AddFile(relTarget, Files.size(target),
        System.currentTimeMillis(), rows, mins, maxs, partVals))
    }
    // best-effort cleanup of the staging dir (_SUCCESS, .crc, ...)
    Files.walk(staging).iterator().asScala.toSeq.reverse.foreach(p =>
      try Files.deleteIfExists(p) catch { case _: Exception => () })
    adds
  }

  /** Row count + min/max per top-level primitive column from the parquet
    * footer. Only stat types with a total order both here and in predicate
    * literals are kept: int32/int64/float/double and UTF-8 binary. */
  def footerStats(file: Path): (Long, Map[String, String], Map[String, String]) = {
    val in = HadoopInputFile.fromPath(new HPath(file.toString), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val mins = scala.collection.mutable.Map[String, String]()
      val maxs = scala.collection.mutable.Map[String, String]()
      val undecided = scala.collection.mutable.Set[String]()
      for (block <- blocks; col <- block.getColumns.asScala) {
        if (col.getPath.size == 1) {
          val name = col.getPath.iterator().next()
          val st = col.getStatistics
          val pt = col.getPrimitiveType
          if (st == null || st.isEmpty || !st.hasNonNullValue || undecided(name)) {
            undecided += name; mins.remove(name); maxs.remove(name)
          } else {
            val isString = pt.getLogicalTypeAnnotation != null &&
              pt.getLogicalTypeAnnotation.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
            val mm: Option[(String, String)] = pt.getPrimitiveTypeName match {
              case INT32 | INT64 | FLOAT | DOUBLE =>
                Some((st.genericGetMin.toString, st.genericGetMax.toString))
              case BINARY if isString =>
                Some((st.minAsString, st.maxAsString))
              case _ => None
            }
            mm match {
              case Some((lo, hi)) =>
                mins(name) = mins.get(name).map(m => minOf(m, lo, isString || pt.getPrimitiveTypeName == BINARY)).getOrElse(lo)
                maxs(name) = maxs.get(name).map(m => maxOf(m, hi, isString || pt.getPrimitiveTypeName == BINARY)).getOrElse(hi)
              case None =>
                undecided += name
            }
          }
        }
      }
      (rows, mins.toMap, maxs.toMap)
    } finally reader.close()
  }

  private def minOf(a: String, b: String, str: Boolean): String =
    if (str) { if (a <= b) a else b }
    else { if (BigDecimal(a) <= BigDecimal(b)) a else b }

  private def maxOf(a: String, b: String, str: Boolean): String =
    if (str) { if (a >= b) a else b }
    else { if (BigDecimal(a) >= BigDecimal(b)) a else b }
}
