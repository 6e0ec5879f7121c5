package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._

/** WRITE-side Delta compatibility — the mirror of the round-13 read-interop.
  *
  * Under the `compat.delta.write` table property, every commit (and every
  * checkpoint) this engine writes lands in genuine delta-1.0 action shape:
  * adds carry `dataChange` and a nested `stats` JSON string, metaData
  * carries a `format` block and a `configuration` map, protocol says
  * (minReader 1, minWriter 2), commitInfo names no version, paths are
  * URI-encoded, null partition values serialize as JSON null. A real
  * delta-spark / Trino / standalone-Delta reader pointed at the table's
  * `_delta_log` replays it natively — closing the "Delta-shaped directory
  * that real Delta readers cannot read" foot-gun from the other side.
  *
  * Graft keeps OWNERSHIP visible to itself: the emitted metaData
  * configuration carries `graft.writer=true` and every commitInfo carries
  * `engineInfo=graft` (a field delta itself writes), so the foreign-log
  * probe never mistakes a compat table for a delta-spark one — compat
  * tables stay fully writable by graft while being readable by Delta.
  *
  * The property REFUSES features whose on-disk semantics a delta-1.0
  * reader cannot honor: graft deletion vectors (delta would resurrect the
  * deleted rows), change data feed (graft cdc actions are not delta cdc),
  * column mapping (physical names would not resolve), and VARIANT columns
  * (parquet layout delta 1.x predates). Generated/identity columns,
  * row tracking and constraints are reader-safe (materialized values /
  * ignorable fields) and stay allowed; constraints travel as
  * `constraint.*` configuration entries and fold back natively.
  *
  * Stats fidelity note: numeric/boolean stat values emit as JSON numbers/
  * booleans (typed from the table schema); timestamp stats emit as the
  * epoch numbers the native harvest records — a delta reader that expects
  * ISO strings simply skips them (stats are advisory, never correctness).
  */
object DeltaWriteCompat {
  /** Table property switching the log to delta-1.0 action shape. */
  val Prop = "compat.delta.write"
  /** Configuration key marking a delta-SHAPED log as graft-authored. */
  val WriterMarker = "graft.writer"
  /** commitInfo engineInfo value — the per-commit ownership marker (the
    * earliest retained commit may carry no metaData after log cleanup). */
  val EngineInfo = "graft"

  def enabled(meta: MetaData): Boolean =
    meta.properties.get(Prop).exists(_.equalsIgnoreCase("true"))

  /** Table state a delta-1.0 reader cannot honor; checked at every compat
    * commit (including the one that tries to ENABLE the property). */
  def refusal(meta: MetaData, actions: Seq[Action]): Option[String] = {
    def on(k: String) = meta.properties.get(k).exists(v =>
      v.equalsIgnoreCase("true") || v.equalsIgnoreCase("name"))
    def hasVariant(dt: DataType): Boolean = dt match {
      case _: VariantType => true
      case s: StructType => s.fields.exists(f => hasVariant(f.dataType))
      case a: ArrayType => hasVariant(a.elementType)
      case m: MapType => hasVariant(m.keyType) || hasVariant(m.valueType)
      case _ => false
    }
    // substring is only the cheap PRE-filter; the schema parse decides —
    // a column merely NAMED "variant" must not trip the refusal
    def variantSchema: Boolean =
      meta.schemaString.contains("\"variant\"") &&
        (try hasVariant(DataType.fromJson(meta.schemaString))
         catch { case _: Exception => false })
    if (on("deletionVectors.enabled")) Some("deletionVectors.enabled")
    else if (on("changeDataFeed.enabled")) Some("changeDataFeed.enabled")
    else if (on("columnMapping.mode")) Some("columnMapping.mode")
    else if (variantSchema) Some("VARIANT columns")
    else if (actions.exists { case a: AddFile => a.dvPath.isDefined; case _ => false })
      Some("deletion-vector file references")
    else if (actions.exists(_.isInstanceOf[CdcFile])) Some("cdc actions")
    else None
  }

  /** Checkpoint parquet layout of delta 1.x: one nullable struct column
    * per action. Explicit (never inferred) — inference over a batch whose
    * partition values are all null would produce an unwritable NullType. */
  val checkpointSchema: StructType = StructType(Seq(
    StructField("txn", StructType(Seq(
      StructField("appId", StringType), StructField("version", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, valueContainsNull = true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("baseRowId", LongType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType))))))
}

/** Serializer for one table's actions in delta-1.0 shape. Stat values are
  * typed from the table SCHEMA (delta stats are typed JSON, graft's native
  * log stores strings); paths URI-encode; the Hive null-partition sentinel
  * maps back to JSON null — the exact inverses of what `Actions.fromJson`'s
  * foreign branch decodes, so a compat log round-trips through graft's own
  * reader AND reads natively in delta. */
final class DeltaShapeWriter(meta: MetaData) {
  private val mapper = new ObjectMapper()
  private val numericish: Set[String] = {
    val schema =
      try DataType.fromJson(meta.schemaString).asInstanceOf[StructType]
      catch { case _: Exception => new StructType() }
    schema.fields.collect {
      case f if (f.dataType match {
        case _: NumericType | BooleanType | DateType | TimestampType => true
        case _ => false
      }) => f.name
    }.toSet
  }
  private val sentinel =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  private def encodePath(p: String): String =
    try new java.net.URI(null, null, p, null).toASCIIString
    catch { case _: java.net.URISyntaxException => p }

  private def statVal(node: ObjectNode, k: String, v: String): Unit =
    if (numericish(k))
      try node.put(k, new java.math.BigDecimal(v))
      catch { case _: NumberFormatException =>
        if (v == "true" || v == "false") node.put(k, v.toBoolean)
        else node.put(k, v)
      }
    else node.put(k, v)

  /** One delta-1.0 JSON log line for `a`. */
  def line(a: Action): String = {
    val root = mapper.createObjectNode()
    a match {
      case m: MetaData =>
        val n = root.putObject("metaData")
        n.put("id", m.id)
        n.putObject("format").put("provider", "parquet").putObject("options")
        n.put("schemaString", m.schemaString)
        val pc = n.putArray("partitionColumns"); m.partitionColumns.foreach(pc.add)
        val conf = n.putObject("configuration")
        m.properties.foreach { case (k, v) => conf.put(k, v) }
        m.constraints.foreach { case (k, v) => conf.put(s"constraint.$k", v) }
        conf.put(DeltaWriteCompat.WriterMarker, "true")
        n.put("createdTime", m.createdTime)
      case f: AddFile =>
        val n = root.putObject("add")
        n.put("path", encodePath(f.path))
        val pv = n.putObject("partitionValues")
        f.partitionValues.foreach { case (k, v) =>
          if (v == sentinel) pv.putNull(k) else pv.put(k, v)
        }
        n.put("size", f.size)
        n.put("modificationTime", f.modificationTime)
        n.put("dataChange", true)
        val st = mapper.createObjectNode()
        st.put("numRecords", f.numRecords)
        val mins = st.putObject("minValues")
        f.minValues.toSeq.sortBy(_._1).foreach { case (k, v) => statVal(mins, k, v) }
        val maxs = st.putObject("maxValues")
        f.maxValues.toSeq.sortBy(_._1).foreach { case (k, v) => statVal(maxs, k, v) }
        val nc = st.putObject("nullCount")
        f.nullCounts.toSeq.sortBy(_._1).foreach { case (k, v) => nc.put(k, v) }
        n.put("stats", mapper.writeValueAsString(st))
        if (f.tags.nonEmpty) {
          val tg = n.putObject("tags")
          f.tags.foreach { case (k, v) => tg.put(k, v) }
        }
        f.baseRowId.foreach(b => n.put("baseRowId", b))
      case r: RemoveFile =>
        val n = root.putObject("remove")
        n.put("path", encodePath(r.path))
        n.put("deletionTimestamp", r.deletionTimestamp)
        n.put("dataChange", true)
      case _: Protocol =>
        // delta-1.0's whole protocol surface — graft feature names are
        // engine-private and refusal() already excluded the unsafe ones
        val n = root.putObject("protocol")
        n.put("minReaderVersion", 1); n.put("minWriterVersion", 2)
      case c: CommitInfo =>
        // versionless, like delta (the commit FILE names the version;
        // readVersion patches it back); engineInfo is the ownership marker
        val n = root.putObject("commitInfo")
        n.put("timestamp", c.timestamp)
        n.put("operation", c.operation)
        val om = n.putObject("operationMetrics")
        c.operationMetrics.foreach { case (k, v) => om.put(k, v) }
        n.put("engineInfo", DeltaWriteCompat.EngineInfo)
      case t: Txn =>
        val n = root.putObject("txn")
        n.put("appId", t.appId); n.put("version", t.version)
      case other =>
        throw new GraftProtocolException(
          s"action $other has no delta-1.0 shape — compat refusal missed it")
    }
    mapper.writeValueAsString(root)
  }
}
