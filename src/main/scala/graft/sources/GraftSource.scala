package graft.sources

import graft.table.{GraftTable, Snapshot}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `format("graft")` — the data-source integration matching the reference's
  * read shape exactly (api.py:77-80 reads Delta with
  * `spark.read.format("delta").option("versionAsOf", n).load(path)`):
  *
  * {{{
  *   spark.read.format("graft").option("versionAsOf", 2).load(path)
  *   spark.read.format("graft").option("timestampAsOf", "2026-01-01 00:00:00").load(path)
  *   df.write.format("graft").mode("append").save(path)
  * }}}
  *
  * Read side is a PrunedFilteredScan: Spark pushes column pruning and
  * filters here; filters drive the table layer's stats/partition skipping
  * (files whose min/max exclude the predicate never reach the scan), and
  * Spark re-evaluates every filter on the surviving rows, so pruning can
  * never change results.
  */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path: spark.read.format(\"graft\").load(path)"))

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val table = GraftTable.forPath(ctx.sparkSession, path(parameters))
    val snapshot = (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(v), None) => table.snapshotAt(v.toLong)
      case (None, Some(ts)) =>
        table.snapshotAt(table.versionAt(java.sql.Timestamp.valueOf(ts).getTime))
      case (None, None) => table.snapshot
      case _ => throw new IllegalArgumentException(
        "specify at most one of versionAsOf / timestampAsOf")
    }
    new GraftRelation(ctx, table, snapshot)
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val p = path(parameters)
    val exists = GraftTable.isGraftTable(p)
    mode match {
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(s"$p is already a GraftTable")
        GraftTable.create(ctx.sparkSession, p, data,
          parameters.get("partitionBy").map(_.split(",").toSeq).getOrElse(Nil))
      case SaveMode.Ignore =>
        if (!exists) GraftTable.create(ctx.sparkSession, p, data)
      case SaveMode.Append =>
        if (exists) GraftTable.forPath(ctx.sparkSession, p).append(data)
        else GraftTable.create(ctx.sparkSession, p, data)
      case SaveMode.Overwrite =>
        if (exists) {
          val t = GraftTable.forPath(ctx.sparkSession, p)
          t.delete(lit(true)) // truncate as one commit
          t.append(data)
        } else GraftTable.create(ctx.sparkSession, p, data)
    }
    createRelation(ctx, parameters - "partitionBy")
  }
}

/** Versioned snapshot exposed as a V1 relation with pruning + skipping. */
class GraftRelation(ctx: SQLContext, table: GraftTable, snapshot: Snapshot)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx

  override def schema: StructType = snapshot.schema

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val files = filterColumn(filters) match {
      // one shared pruning path with GraftTable.scan: min/max + partition
      // stats, then bloom probes for =/IN on the table's bloom columns
      case Some(pred) => table.prunedFiles(snapshot, pred)
      case None       => snapshot.files
    }
    val df = table.readFiles(snapshot, files)
    val projected =
      if (requiredColumns.isEmpty) df
      else df.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }

  /** Best-effort translation of source filters into one Column for the
    * skipping layer; untranslatable filters are simply not used for
    * pruning (Spark still applies them row-level). */
  private def filterColumn(filters: Array[Filter]): Option[Column] = {
    def convert(f: Filter): Option[Column] = f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs) if vs.nonEmpty => Some(col(a).isin(vs.toSeq: _*))
      case And(l, r) => (convert(l), convert(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b)             => a.orElse(b) // one side still prunes
      }
      case _ => None
    }
    val cols = filters.flatMap(convert)
    cols.reduceOption(_ && _)
  }
}
