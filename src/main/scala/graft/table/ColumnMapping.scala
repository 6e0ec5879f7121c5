package graft.table

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column mapping (Delta's `columnMapping.mode = name`): each field's
  * PHYSICAL parquet column name is pinned in the field metadata, so the
  * LOGICAL name can change freely — RENAME COLUMN is a metadata-only
  * commit (files keep their physical columns), and DROP COLUMN merely
  * removes the logical binding (a later re-ADD of the same name gets a
  * fresh physical name, so dropped data can never resurrect). Absent
  * metadata means physical == logical (every pre-mapping file ever
  * written), which keeps enabling the feature a pure metadata operation.
  *
  * Reference: the Delta protocol's columnMapping table feature — the
  * reference's tables (delta 1.0.0) predate it, but its stack grew into
  * it; the Protocol gate (Actions.scala) fails old readers loudly.
  */
object ColumnMapping {
  val PhysKey = "graft.physicalName"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** Any field whose physical name diverges from its logical name? While
    * false (including always for pre-mapping tables), every translation
    * below is the identity and costs nothing. */
  def active(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** The schema as the parquet files spell it. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = physicalName(f), metadata = Metadata.empty)))

  def physicalOf(schema: StructType, logical: String): String =
    schema.fields.find(_.name == logical).map(physicalName).getOrElse(logical)

  /** physical → logical for the CURRENT schema. Injective: stale physical
    * keys (of dropped columns) are simply absent, which is what stops a
    * dropped column's stats or data binding to a same-named successor. */
  def physToLog(schema: StructType): Map[String, String] =
    schema.fields.map(f => physicalName(f) -> f.name).toMap

  /** Stamp `f` with an explicit physical name (no-op key update if equal). */
  def withPhysical(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysKey, physical).build())
}
