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
    partitionValues: Map[String, String] = Map.empty) extends Action

/** Tombstone: the file is no longer part of the snapshot from this commit. */
final case class RemoveFile(path: String, deletionTimestamp: Long) extends Action

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
      case AddFile(path, size, mtime, rows, mins, maxs, partVals) =>
        val n = root.putObject("add")
        n.put("path", path); n.put("size", size); n.put("modificationTime", mtime)
        n.put("numRecords", rows)
        putMap(n, "minValues", mins); putMap(n, "maxValues", maxs)
        putMap(n, "partitionValues", partVals)
      case RemoveFile(path, ts) =>
        val n = root.putObject("remove")
        n.put("path", path); n.put("deletionTimestamp", ts)
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
      AddFile(n.get("path").asText(), n.get("size").asLong(),
        n.get("modificationTime").asLong(), n.get("numRecords").asLong(),
        strMap(n, "minValues"), strMap(n, "maxValues"), strMap(n, "partitionValues"))
    } else if (root.has("remove")) {
      val n = root.get("remove")
      RemoveFile(n.get("path").asText(), n.get("deletionTimestamp").asLong())
    } else if (root.has("commitInfo")) {
      val n = root.get("commitInfo")
      CommitInfo(n.get("version").asLong(), n.get("timestamp").asLong(),
        n.get("operation").asText(), strMap(n, "operationMetrics"))
    } else {
      throw new IllegalArgumentException(s"unknown action: $line")
    }
  }
}
