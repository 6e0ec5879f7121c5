package graft.sources

import scala.jdk.CollectionConverters._

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
    with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path: spark.read.format(\"graft\").load(path)"))

  // ---- DSv2 TableProvider: batch reads resolve through the same
  // GraftSqlTable as the catalog (pushdown + pruning via the V1Scan
  // bridge); batch WRITES deliberately stay on the V1 createRelation
  // below (the table only advertises V1_BATCH_WRITE, so DataFrameWriter
  // falls back — every SaveMode keeps its proven semantics). The payoff
  // is `readStream.format("graft")`: the DSv2 path is what makes the
  // table a streaming SOURCE (MicroBatchStream over commit versions).

  override def supportsExternalMetadata(): Boolean = false

  private def resolve(options: Map[String, String]): (GraftTable, Snapshot) = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    val table = GraftTable.forPath(
      org.apache.spark.sql.SparkSession.active, path(lower))
    val snapshot = (lower.get("versionasof"), lower.get("timestampasof")) match {
      case (Some(v), None) => table.snapshotAt(v.toLong)
      case (None, Some(ts)) =>
        table.snapshotAt(table.versionAt(java.sql.Timestamp.valueOf(ts).getTime))
      case (None, None) => table.snapshot
      case _ => throw new IllegalArgumentException(
        "specify at most one of versionAsOf / timestampAsOf")
    }
    (table, snapshot)
  }

  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val opts = options.asCaseSensitiveMap().asScala.toMap
    // A first write probes the provider BEFORE the V1 fallback decision:
    // a nonexistent path must not throw here (the V1 createRelation below
    // performs the creation once DataFrameWriter falls back).
    if (!GraftTable.isGraftTable(path(opts.map { case (k, v) => k.toLowerCase -> v })))
      new StructType()
    else {
      val base = resolve(opts)._2.schema
      val cdf = opts.exists { case (k, v) =>
        k.equalsIgnoreCase("readChangeFeed") && v.toBoolean }
      if (!cdf) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType, nullable = true)))
    }
  }

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table = {
    val opts = properties.asScala.toMap
    val p = path(opts.map { case (k, v) => k.toLowerCase -> v })
    if (!GraftTable.isGraftTable(p))
      // capability-less stub: DataFrameWriter falls back to the V1 write
      // (which creates the table); reads of a missing table still error.
      new UncreatedGraftTable(p)
    else {
      val (table, snapshot) = resolve(opts)
      val pin = if (snapshot.version == table.latestVersion) None else Some(snapshot)
      val cdf = opts.exists { case (k, v) =>
        k.equalsIgnoreCase("readChangeFeed") && v.toBoolean }
      new GraftSqlTable(table, s"graft.`${table.path}`", pin, cdf)
    }
  }

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
          val caseMap = parameters.map { case (k, v) => k.toLowerCase -> v }
          val dynamic = caseMap.get("partitionoverwritemode")
            .orElse(Option(ctx.sparkSession.conf
              .get("spark.sql.sources.partitionOverwriteMode", "static")))
            .exists(_.equalsIgnoreCase("dynamic"))
          caseMap.get("replacewhere") match {
            // Delta's replaceWhere writer option: predicate-scoped atomic
            // overwrite instead of a truncate
            case Some(pred) =>
              t.overwriteWhere(org.apache.spark.sql.functions.expr(pred), data)
            case None
                if dynamic && t.snapshot.metaData.partitionColumns.nonEmpty =>
              t.overwritePartitions(data)
            // full truncating rewrite as ONE atomic commit — readers see
            // old or new state, never the empty middle
            case None => t.overwrite(data)
          }
        } else GraftTable.create(ctx.sparkSession, p, data)
    }
    createRelation(ctx, parameters - "partitionBy" - "replaceWhere" - "partitionOverwriteMode")
  }
}

/** Placeholder for a path that is not (yet) a GraftTable: no read/write
  * capabilities, so `DataFrameWriter.save` falls back to the V1 create
  * path and reads fail with a clear error. */
class UncreatedGraftTable(p: String)
    extends org.apache.spark.sql.connector.catalog.Table {
  override def name(): String = s"graft.`$p` (not yet created)"
  override def schema(): StructType = new StructType()
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.Collections.emptySet()
}

/** Versioned snapshot exposed as a V1 relation with pruning + skipping. */
class GraftRelation(ctx: SQLContext, table: GraftTable, snapshot: Snapshot)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx

  override def schema: StructType = snapshot.schema

  // log-derived size: lets Catalyst auto-broadcast a small graft table in
  // a join (BaseRelation's default is spark.sql.defaultSizeInBytes —
  // effectively "never broadcast")
  override def sizeInBytes: Long = snapshot.files.map(_.size).sum

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

/** `format("delta")` — the literal spelling the reference uses
  * (api.py:77-80 reads, spark_project.py:36 writes). Registering the
  * graft source under it lets REFERENCE CODE RUN VERBATIM: reads (with
  * versionAsOf/timestampAsOf options) of both graft-written tables and
  * real delta-spark logs (the round-13 read-interop), writes that create/
  * append GRAFT tables on fresh paths, and `readStream` tailing. Writes
  * to a REAL delta-spark log still refuse through the foreign-log gate —
  * this alias changes spelling, never semantics.
  *
  * If REAL delta-spark is ALSO on the classpath, the alias yields: two
  * DataSourceRegister providers answering one short name would make
  * Spark throw "Multiple sources found" on every `format("delta")` call,
  * converting a working Delta deployment into a broken one. Probing for
  * Delta's provider class at registration time keeps exactly one owner
  * of the name in either world — graft alone: alias active; graft beside
  * delta-spark: delta-spark keeps its name, graft stays reachable as
  * `format("graft")`. */
class GraftDeltaSource extends GraftSource {
  override def shortName(): String =
    if (GraftDeltaSource.realDeltaPresent) "graft-delta-shadowed"
    else "delta"
}

object GraftDeltaSource {
  private lazy val realDeltaPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource",
        false, Thread.currentThread().getContextClassLoader)
      true
    } catch { case _: Throwable => false }
}
