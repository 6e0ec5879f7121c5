package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Identity columns (Delta's `GENERATED ALWAYS AS IDENTITY`): a LongType
  * column whose values the ENGINE assigns — writers never supply it.
  *
  * Declaration travels in schema field metadata (start/step), like
  * generated columns; the allocation frontier (high-water mark) lives in
  * table properties (`identity.<col>.highWaterMark`) and advances with the
  * SAME commit that uses it.
  *
  * Allocation is sparse-but-increasing with ZERO extra jobs, the only
  * shape that survives 100 TB: `hwm + (monotonically_increasing_id()+1) *
  * step` assigns strictly-increasing values within a write without any
  * global ordering shuffle, and the post-write high-water mark is read
  * from the written files' FOOTER STATS (max of the column) — no counting
  * pass. Values therefore may have gaps (Delta documents the same
  * property); they are unique and monotone per commit.
  *
  * Concurrency is delegated to the conflict resolver: the hwm bump is a
  * MetaData action, and a concurrent writer that raced it gets a typed
  * MetadataChanged conflict instead of silently double-allocating — two
  * identity appends can never both land from the same frontier.
  */
object IdentityColumns {
  val StartKey = "graft.identity.start"
  val StepKey = "graft.identity.step"

  final case class Spec(name: String, start: Long, step: Long)

  def of(schema: StructType): Seq[Spec] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(StartKey) =>
        Spec(f.name, f.metadata.getLong(StartKey), f.metadata.getLong(StepKey))
    }

  def names(schema: StructType): Set[String] = of(schema).map(_.name).toSet

  def hwmKey(name: String): String = s"identity.$name.highWaterMark"

  def hwm(props: Map[String, String], spec: Spec): Long =
    props.get(hwmKey(spec.name)).map(_.toLong).getOrElse(spec.start - spec.step)

  /** Strictly-increasing sparse ids above the frontier, no shuffle/job. */
  def assignExpr(spec: Spec, frontier: Long): Column =
    lit(frontier) + (monotonically_increasing_id() + 1L) * lit(spec.step)

  /** Replace/add each identity column of `schema` in `df` with fresh
    * values above the current frontier. */
  def assign(df: DataFrame, schema: StructType, props: Map[String, String]): DataFrame =
    of(schema).foldLeft(df) { (d, spec) =>
      d.withColumn(spec.name, assignExpr(spec, hwm(props, spec)))
    }

  /** Properties with every identity frontier advanced to the max value the
    * commit's AddFiles actually carry (footer stats — no read-back job);
    * None when nothing moved. */
  def bumpedProps(props: Map[String, String], schema: StructType,
      adds: Seq[AddFile]): Option[Map[String, String]] = {
    val moved = of(schema).flatMap { spec =>
      // an identity append whose data file lacks a max footer stat would
      // silently skip the frontier bump and the NEXT append would re-issue
      // the same ids — fail loudly instead (int64 footer stats are always
      // written by parquet-mr; absence means a corrupted/foreign file)
      val statless = adds.filter(a =>
        a.numRecords > 0 && !a.maxValues.contains(spec.name))
      require(statless.isEmpty,
        s"identity column '${spec.name}': data file(s) " +
          s"${statless.map(_.path).mkString(", ")} carry rows but no max " +
          "footer stat — cannot advance the identity frontier safely")
      val seen = adds.flatMap(_.maxValues.get(spec.name))
        .flatMap(v => scala.util.Try(v.toLong).toOption)
      if (seen.isEmpty) None
      else {
        val next = math.max(hwm(props, spec), seen.max)
        if (next > hwm(props, spec)) Some(hwmKey(spec.name) -> next.toString) else None
      }
    }
    if (moved.isEmpty) None else Some(props ++ moved)
  }
}
