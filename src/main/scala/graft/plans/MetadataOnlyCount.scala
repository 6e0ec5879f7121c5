package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** `SELECT COUNT(*) FROM graft_table` answered from the transaction log —
  * zero data files opened, zero Spark jobs (Delta's metadata-only query
  * optimization, here as a Catalyst `Rule[LogicalPlan]` injected through
  * `SparkSessionExtensions`).
  *
  * Every AddFile carries its footer row count and its deletion-vector
  * tombstone count, so the snapshot's live total is a driver-side fold —
  * at 100 TB the difference between a millisecond and a cluster-wide
  * scan. The rewrite fires ONLY on the exact sound shape: a global
  * aggregate whose every expression is an undistincted, unfiltered
  * `count(1)` / `count(*)` directly over a bare graft relation (no
  * Filter below — a filtered count must scan; no CDF relation — its row
  * multiset is commit deltas, not the snapshot; grouping or any other
  * aggregate disables it). Time travel composes: a pinned relation
  * counts its pinned snapshot. `spark.graft.metadataOnlyCount` = false
  * opts out. */
case class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isCountStar(e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean =
    e match {
      case Alias(AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _), _) => true
      case _ => false
    }

  /** The relation under the aggregate, looking through Projects — a
    * Project is 1:1 on rows, so it never changes a count; anything else
    * (Filter, Generate, joins...) disqualifies the rewrite. The optimizer
    * interleaves this rule with ColumnPruning, which wraps the relation
    * in a pruning Project mid-batch. */
  private def bareRelation(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation => Some(r)
    case org.apache.spark.sql.catalyst.plans.logical.Project(_, child) => bareRelation(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.metadataOnlyCount", "true").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, exprs, child, _)
          if exprs.nonEmpty && exprs.forall(isCountStar) &&
            bareRelation(child).exists(r =>
              r.table.isInstanceOf[graft.sources.GraftSqlTable] &&
              r.table.asInstanceOf[graft.sources.GraftSqlTable].supportsMetadataCount) =>
        val n = bareRelation(child).get.table
          .asInstanceOf[graft.sources.GraftSqlTable].metadataRowCount
        LocalRelation(agg.output, Seq(InternalRow.fromSeq(exprs.map(_ => n))))
    }
  }
}
