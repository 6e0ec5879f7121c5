package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StructType

/** Generated columns (Delta's `GENERATED ALWAYS AS (expr)`): a column whose
  * value is a deterministic SQL expression over the row's other columns,
  * declared at CREATE and materialized into the data files by every write.
  * The canonical 100-TB use is a time-partitioned table — partition by
  * `day = cast(date_trunc('DAY', ts) as date)` and the layout clusters by
  * day while queries keep filtering on raw `ts`.
  *
  * The generation expression travels IN the schema: a StructField metadata
  * entry (`graft.generationExpression`, mirroring Delta's
  * `delta.generationExpression`), so `schemaString` round-trips it through
  * the log, checkpoints, and schema evolution with zero new action shapes.
  *
  * Divergence from Delta, chosen deliberately: generated columns are ALWAYS
  * recomputed by the engine at write time — a writer-supplied value is
  * replaced, not validated-then-trusted. Delta validates explicit values
  * with a synthesized CHECK constraint (an extra counting pass per write);
  * recomputing instead makes the invariant `col == expr(base)` hold by
  * construction on every path — including MERGE/UPDATE post-images whose
  * BASE columns just changed, where trusting the carried value would be
  * silently wrong — and costs nothing (the projection fuses into the
  * write). Directly SETting a generated column in UPDATE/MERGE is rejected
  * loudly (Delta parity).
  *
  * Scale note: Delta needs dedicated machinery to translate a predicate on
  * `ts` into partition filters on `day`. Here that machinery is
  * unnecessary — every data file carries footer min/max for ALL columns
  * (partitioned or not), so a `ts` predicate prunes files directly and the
  * day-directory layout just makes those ranges tight per file.
  */
object GeneratedColumns {
  /** StructField metadata key holding the generation expression (SQL). */
  val MetadataKey = "graft.generationExpression"

  /** (column, expression) pairs declared in `schema`, in field order. */
  def of(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(MetadataKey) =>
        f.name -> f.metadata.getString(MetadataKey)
    }

  /** Compute every generated column of `schema` over `df` — adding absent
    * ones, replacing present ones (see divergence note above). */
  def fill(df: DataFrame, schema: StructType): DataFrame =
    of(schema).foldLeft(df) { case (d, (name, e)) =>
      d.withColumn(name, expr(e))
    }

  /** Columns a writer must not SET directly. */
  def names(schema: StructType): Set[String] = of(schema).map(_._1).toSet
}
