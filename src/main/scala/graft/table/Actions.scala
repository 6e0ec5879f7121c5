package graft.table

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Transaction-log actions for GraftTable — the same shape as the public
  * Delta Lake protocol (Delta Lake VLDB 2020; PAPERS.md): a table version is
  * the fold of `metaData` / `add` / `remove` actions of commits 0..v, and
  * `commitInfo` carries audit metadata that powers `history()`
  * (reference: api.py:63,75 exposes it via DeltaTable.history()).
  *
  * Serialization is one JSON object per line, tagged by action name, e.g.
  * `{"add":{"path":...}}` — hand-assembled via Jackson (ships with Spark).
  */
sealed trait Action

/** Table-wide metadata; the latest metaData in the log wins. `schemaString`
  * is Spark's own StructType JSON (DataType.fromJson round-trips it);
  * `partitionColumns` fixes the physical layout (Hive-style dirs);
  * `properties` carries free-form table configuration (e.g. the bloom-filter
  * column list) — absent in old logs, defaulting to empty (backward
  * compatible, same as the Delta protocol's configuration map). */
final case class MetaData(id: String, schemaString: String, createdTime: Long,
                          partitionColumns: Seq[String] = Nil,
                          constraints: Map[String, String] = Map.empty,
                          properties: Map[String, String] = Map.empty) extends Action

/** A live data file with footer-derived stats for data skipping.
  * `path` is relative to the table root (may contain partition dirs);
  * `partitionValues` are the file's Hive partition values — they join the
  * min/max stats as exact (min = max = value) bounds during pruning.
  * min/max are stringified per-column values (numeric/string only); absent
  * entries mean "unknown — never skip on this column". */
final case class AddFile(
    path: String,
    size: Long,
    modificationTime: Long,
    numRecords: Long,
    minValues: Map[String, String],
    maxValues: Map[String, String],
    partitionValues: Map[String, String] = Map.empty,
    dvPath: Option[String] = None,
    dvCount: Long = 0L,
    baseRowId: Option[Long] = None,
    /** Per-column null counts from the parquet footers (absent = unknown,
      * never assumed): powers IS [NOT] NULL file skipping and the
      * stats-only SET NOT NULL validation. Sound over-approximation under
      * a deletion vector, like min/max. */
    nullCounts: Map[String, Long] = Map.empty,
    /** Free-form file tags (Delta's AddFile.tags). `clustered` records the
      * clustering spec the file was written under — incremental OPTIMIZE
      * skips files whose tag matches the table's current clustering. */
    tags: Map[String, String] = Map.empty) extends Action {
  /** Rows served by this file = physical rows minus deletion-vector
    * tombstones (`numRecords` stays the parquet footer count — min/max
    * stats remain sound over-approximations under a DV). */
  def liveRecords: Long = numRecords - dvCount
}

/** Tombstone: the file is no longer part of the snapshot from this commit. */
final case class RemoveFile(path: String, deletionTimestamp: Long) extends Action

/** Change-data file (Delta's AddCDCFile): a `_cdc/` parquet holding THIS
  * commit's row-level deltas (full rows + `_change_type`), written by DML
  * when `changeDataFeed.enabled` is set. Not part of the snapshot state —
  * the fold ignores it; `changes()` and the CDF stream read it instead of
  * re-diffing the commit's files. */
final case class CdcFile(path: String, numRecords: Long,
    size: Long = 0L) extends Action

/** Idempotent-transaction marker (Delta's SetTransaction): the latest
  * `version` committed by application `appId` folds into the snapshot, so
  * a streaming sink's exactly-once epoch guard is an O(1) map lookup
  * instead of a scan of every commit file. */
final case class Txn(appId: String, version: Long) extends Action

/** Protocol feature gate (the Delta protocol's reader/writer versioning):
  * a snapshot whose protocol lists a reader feature this build does not
  * support fails LOUDLY at load instead of silently misreading the table
  * (e.g. a deletion-vector table opened by a pre-DV reader would
  * resurrect deleted rows). Feature-enabling operations commit a protocol
  * upgrade in the same version that first uses the feature. */
final case class Protocol(minReaderVersion: Int = 1, minWriterVersion: Int = 1,
    readerFeatures: Seq[String] = Nil, writerFeatures: Seq[String] = Nil) extends Action

object Protocol {
  /** Features THIS build can read/write correctly. `generatedColumns` is
    * writer-only (readers see plain materialized data; only writers must
    * honor the generation rule), mirroring the Delta feature split. */
  val supportedReaderFeatures: Set[String] =
    Set("deletionVectors", "columnMapping", "changeDataFeed", "rowTracking",
      "variantType")
  val supportedWriterFeatures: Set[String] =
    supportedReaderFeatures + "generatedColumns" + "identityColumns" +
      "appendOnly"
}

/** Named protocol-gate failure: the table requires a capability this
  * reader predates. */
final class GraftProtocolException(msg: String) extends RuntimeException(msg)

/** Commit audit record; one per commit, drives history()/timestampAsOf. */
final case class CommitInfo(
    version: Long,
    timestamp: Long,
    operation: String,
    operationMetrics: Map[String, String]) extends Action

object Actions {
  private val mapper = new ObjectMapper()

  private def strMap(node: JsonNode, field: String): Map[String, String] =
    Option(node.get(field)).map { m =>
      m.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)

  private def putMap(node: ObjectNode, field: String, m: Map[String, String]): Unit = {
    val o = node.putObject(field)
    m.foreach { case (k, v) => o.put(k, v) }
  }

  def toJson(a: Action): String = {
    val root = mapper.createObjectNode()
    a match {
      case MetaData(id, schema, created, partCols, constraints, properties) =>
        val n = root.putObject("metaData")
        n.put("id", id); n.put("schemaString", schema); n.put("createdTime", created)
        val arr = n.putArray("partitionColumns")
        partCols.foreach(arr.add)
        putMap(n, "constraints", constraints)
        if (properties.nonEmpty) putMap(n, "properties", properties)
      case AddFile(path, size, mtime, rows, mins, maxs, partVals, dvPath, dvCount, baseRowId, nullCounts, tags) =>
        val n = root.putObject("add")
        n.put("path", path); n.put("size", size); n.put("modificationTime", mtime)
        n.put("numRecords", rows)
        putMap(n, "minValues", mins); putMap(n, "maxValues", maxs)
        putMap(n, "partitionValues", partVals)
        if (tags.nonEmpty) putMap(n, "tags", tags)
        if (nullCounts.nonEmpty) {
          val nc = n.putObject("nullCounts")
          nullCounts.toSeq.sortBy(_._1).foreach { case (k, v) => nc.put(k, v) }
        }
        dvPath.foreach { p =>
          val dv = n.putObject("deletionVector")
          dv.put("path", p); dv.put("cardinality", dvCount)
        }
        baseRowId.foreach(b => n.put("baseRowId", b))
      case RemoveFile(path, ts) =>
        val n = root.putObject("remove")
        n.put("path", path); n.put("deletionTimestamp", ts)
      case CdcFile(path, rows, size) =>
        val n = root.putObject("cdc")
        n.put("path", path); n.put("numRecords", rows); n.put("size", size)
      case Txn(appId, v) =>
        val n = root.putObject("txn")
        n.put("appId", appId); n.put("version", v)
      case Protocol(minR, minW, rFeat, wFeat) =>
        val n = root.putObject("protocol")
        n.put("minReaderVersion", minR); n.put("minWriterVersion", minW)
        val ra = n.putArray("readerFeatures"); rFeat.foreach(ra.add)
        val wa = n.putArray("writerFeatures"); wFeat.foreach(wa.add)
      case CommitInfo(v, ts, op, metrics) =>
        val n = root.putObject("commitInfo")
        n.put("version", v); n.put("timestamp", ts); n.put("operation", op)
        putMap(n, "operationMetrics", metrics)
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(line: String): Action = {
    val root = mapper.readTree(line)
    if (root.has("metaData")) {
      val n = root.get("metaData")
      val partCols = Option(n.get("partitionColumns"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      MetaData(n.get("id").asText(), n.get("schemaString").asText(),
        n.get("createdTime").asLong(), partCols, strMap(n, "constraints"),
        strMap(n, "properties"))
    } else if (root.has("add")) {
      val n = root.get("add")
      val (dvPath, dvCount) = Option(n.get("deletionVector")) match {
        case Some(dv) => (Some(dv.get("path").asText()), dv.get("cardinality").asLong())
        case None => (None, 0L)
      }
      val nullCounts = Option(n.get("nullCounts")).map { nc =>
        nc.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      }.getOrElse(Map.empty[String, Long])
      AddFile(n.get("path").asText(), n.get("size").asLong(),
        n.get("modificationTime").asLong(), n.get("numRecords").asLong(),
        strMap(n, "minValues"), strMap(n, "maxValues"), strMap(n, "partitionValues"),
        dvPath, dvCount, Option(n.get("baseRowId")).map(_.asLong()), nullCounts,
        strMap(n, "tags"))
    } else if (root.has("remove")) {
      val n = root.get("remove")
      RemoveFile(n.get("path").asText(), n.get("deletionTimestamp").asLong())
    } else if (root.has("cdc")) {
      val n = root.get("cdc")
      // size is absent in pre-round-11 logs — 0 degrades byte-capped CDF
      // admission to file-count caps for those commits, never an error
      CdcFile(n.get("path").asText(), n.get("numRecords").asLong(),
        Option(n.get("size")).map(_.asLong()).getOrElse(0L))
    } else if (root.has("txn")) {
      val n = root.get("txn")
      Txn(n.get("appId").asText(), n.get("version").asLong())
    } else if (root.has("protocol")) {
      val n = root.get("protocol")
      def feats(field: String): Seq[String] = Option(n.get(field))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      Protocol(n.get("minReaderVersion").asInt(), n.get("minWriterVersion").asInt(),
        feats("readerFeatures"), feats("writerFeatures"))
    } else if (root.has("commitInfo")) {
      val n = root.get("commitInfo")
      CommitInfo(n.get("version").asLong(), n.get("timestamp").asLong(),
        n.get("operation").asText(), strMap(n, "operationMetrics"))
    } else {
      throw new IllegalArgumentException(s"unknown action: $line")
    }
  }
}
