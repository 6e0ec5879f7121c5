package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `SELECT COUNT(*) / MIN(col) / MAX(col) FROM graft_table` answered from
  * the transaction log — zero data files opened, zero Spark jobs (Delta's
  * metadata-only query optimization, here as a Catalyst
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`).
  *
  * Every AddFile carries its footer row count, per-column min/max, and
  * its deletion-vector tombstone count, so these aggregates are a
  * driver-side fold — at 100 TB the difference between a millisecond and
  * a cluster-wide scan. The rewrite fires ONLY on the sound shape:
  *
  *  - a GLOBAL aggregate (no grouping) whose every expression is an
  *    undistincted, unfiltered `count(*)`, `min(col)`, or `max(col)`
  *    over a bare graft relation — no Filter below (a filtered aggregate
  *    must scan; row-preserving Projects look through, but every min/max
  *    attribute must bind BY exprId to the relation's own output, so an
  *    alias shadowing a column name never misbinds), no CDF relation
  *    (its row multiset is commit deltas, not the snapshot);
  *  - ONE snapshot is captured for the whole rewrite — counts and
  *    extremes can never mix versions under a racing commit;
  *  - COUNT is always exact from the log (`liveRecords` subtracts DV
  *    tombstones);
  *  - MIN/MAX additionally require: ZERO deletion vectors in the
  *    snapshot (a tombstoned row could BE the extremum — stats are only
  *    over-approximations under a DV), complete stats on every file
  *    (null-partition files are known all-null and skip exactly), a
  *    directly supported stat type, and — for strings — bounds below the
  *    truncation length (a truncated stat is a bound, not an extremum).
  *    Any doubt → no rewrite, the scan answers.
  *
  * Time travel composes: a pinned relation folds its pinned snapshot.
  * `spark.graft.metadataOnlyCount` = false opts out. */
case class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  private sealed trait MetaAgg
  private case object CountStar extends MetaAgg
  private final case class MinOf(attr: AttributeReference) extends MetaAgg
  private final case class MaxOf(attr: AttributeReference) extends MetaAgg

  /** Stat strings convert to InternalRow values exactly for these types
    * (decimals carry a scale the raw stat string lacks — excluded). */
  private def statType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampType => true
    case _ => false
  }

  private def classify(e: NamedExpression): Option[MetaAgg] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) =>
      Some(CountStar)
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _)
        if statType(a.dataType) => Some(MinOf(a))
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _)
        if statType(a.dataType) => Some(MaxOf(a))
    case _ => None
  }

  private def decode(v: String, dt: DataType): Any = dt match {
    case ByteType      => v.toByte
    case ShortType     => v.toShort
    case IntegerType   => v.toInt
    case LongType      => v.toLong
    case FloatType     => v.toFloat
    case DoubleType    => v.toDouble
    case StringType    => UTF8String.fromString(v)
    case DateType      => v.toInt   // epoch days (INT32 stat)
    case TimestampType => v.toLong  // epoch micros (INT64 stat)
    case other => throw new IllegalStateException(s"unexpected stat type $other")
  }

  /** The relation under the aggregate, looking through Projects — a
    * Project is 1:1 on rows, so it never changes these aggregates; the
    * optimizer interleaves this rule with ColumnPruning, which wraps the
    * relation in a pruning Project mid-batch. Attribute IDENTITY is
    * checked separately: every min/max attr must be in the relation's own
    * output (a Project alias with a shadowing name must not misbind). */
  private def bareRelation(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation => Some(r)
    case Project(_, child) => bareRelation(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.metadataOnlyCount", "true").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, exprs, child, _)
          if exprs.nonEmpty && exprs.forall(classify(_).isDefined) &&
            bareRelation(child).exists(r =>
              r.table.isInstanceOf[graft.sources.GraftSqlTable] &&
              r.table.asInstanceOf[graft.sources.GraftSqlTable].supportsMetadataCount) =>
        val rel = bareRelation(child).get
        val t = rel.table.asInstanceOf[graft.sources.GraftSqlTable]
        val metas = exprs.map(e => classify(e).get)
        val relIds = rel.output.map(_.exprId).toSet
        val boundOk = metas.forall {
          case MinOf(a) => relIds.contains(a.exprId)
          case MaxOf(a) => relIds.contains(a.exprId)
          case CountStar => true
        }
        // ONE snapshot for the entire answer; per-column folds memoized
        // (min(a), max(a) share one pass over the file list)
        val answered: Option[Seq[Any]] =
          if (!boundOk) None
          else scala.util.Try {
            val sn = t.metadataSnapshot
            val needsMinMax = metas.exists(!_.isInstanceOf[CountStar.type])
            val dvFree = sn.files.forall(f => f.dvPath.isEmpty && f.dvCount == 0L)
            if (needsMinMax && !dvFree) None
            else {
              val extremes = scala.collection.mutable.Map[String, Option[(String, String)]]()
              def boundsOf(c: String) = extremes.getOrElseUpdate(c,
                graft.table.GraftTable.metadataMinMaxOf(sn, c))
              val vals = metas.map {
                // a foreign (delta-spark) add without stats parses as
                // numRecords = -1 — unknown, so the scan must answer
                case CountStar if sn.files.forall(_.numRecords >= 0) =>
                  Some(sn.files.map(_.liveRecords).sum: Any)
                case CountStar => None
                case MinOf(a) => boundsOf(a.name).map(b => decode(b._1, a.dataType))
                case MaxOf(a) => boundsOf(a.name).map(b => decode(b._2, a.dataType))
              }
              if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
            }
          }.toOption.flatten
        answered match {
          case Some(row) => LocalRelation(agg.output, Seq(InternalRow.fromSeq(row)))
          case None      => agg // incomplete/unsound stats: the scan answers
        }
    }
  }
}
