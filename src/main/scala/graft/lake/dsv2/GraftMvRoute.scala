package graft.lake.dsv2

import graft.lake.{LakeTable, MaterializedAgg}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Automatic materialized-view query routing: an aggregate query whose
  * shape a maintained [[MaterializedAgg]] already answers reads the
  * (fresh) view state instead of scanning the base table — the feature
  * that makes MV maintenance pay rent on a 100 TB base, where the state
  * table is group-count-sized and the scan it replaces is the dominant
  * cost. Classic query rewrite over materialized aggregates (Goldstein &
  * Larson, SIGMOD'01), scoped to exact-match single-table views.
  *
  * Matches `Aggregate(groupCols, aggExprs, <graft base relation>)` where:
  *   - the base table's `graft.ivm.views` index names a view whose
  *     recorded spec has exactly the query's group columns and whose
  *     AggCols cover every aggregate expression (COUNT(*) / count / sum /
  *     avg / min / max over a plain column, no DISTINCT, no FILTER);
  *   - the view is dimension-free (star views need a join-shape match —
  *     out of scope) and its base-location records THIS table;
  *   - **freshness**: the view's watermark equals the base's current
  *     snapshot id — a stale or mid-refresh view never routes;
  *   - the presented column's dataType equals the query expression's
  *     (AVG over DECIMAL presents as DOUBLE and is rejected here);
  *   - the relation is not a write/DML target and carries no time-travel
  *     pin or branch (the view reflects main's head only).
  *
  * The rewrite preserves the Aggregate's output names and exprIds (an
  * aliased Project over the finalized-state plan), so parent operators
  * stay bound. Validation cost when no index entry exists: one property
  * lookup on cached metadata.
  *
  * Caveat: SUM/COUNT over integral types route bit-exactly; AVG routes
  * only when both sides are DOUBLE, where the state's sum/count division
  * can differ from a fresh scan's in the last float ulp (any two scan
  * orders differ the same way).
  */
object GraftMvRoute {

  /** Some(rewritten plan) when `agg` is answerable by a registered fresh
    * view of the graft relation under it. */
  def route(spark: SparkSession, agg: Aggregate,
            unwrap: LogicalPlan => Option[(DataSourceV2Relation, GraftTable)],
            isWriteTarget: DataSourceV2Relation => Boolean): Option[LogicalPlan] = {
    if (!agg.resolved) return None
    // a WAP session redirects un-pinned reads to the audit branch
    // (LakeTable.resolveSnapshot) — the view reflects MAIN's head, so
    // routing would silently answer from the wrong lineage
    if (spark.conf.getOption("spark.wap.branch").exists(_.nonEmpty) ||
        spark.conf.getOption("spark.wap.id").exists(_.nonEmpty)) return None
    for {
      (r, gt) <- unwrap(agg.child)
      if !isWriteTarget(r) && gt.metaKind.isEmpty && gt.pinnedSnapshotId.isEmpty &&
        gt.pinnedTimestampMs.isEmpty && gt.pinnedBranch.isEmpty
      base = gt.lakeTable
      viewsProp <- base.meta.properties.get(MaterializedAgg.ViewsKey)
      // group expressions must be plain columns
      groupNames <- attrNames(agg.groupingExpressions)
      if groupNames.nonEmpty
      plan <- viewsProp.split(";").iterator.filter(_.nonEmpty)
        .flatMap(loc => tryRoute(spark, agg, base, groupNames, loc))
        .nextOption()
    } yield plan
  }

  private def attrNames(es: Seq[Expression]): Option[Seq[String]] = {
    val names = es.collect { case a: AttributeReference => a.name }
    if (names.length == es.length) Some(names) else None
  }

  /** The view AggCol shape `(func, column)` of a query aggregate
    * expression, or None when unroutable. */
  private def classify(ae: AggregateExpression): Option[(String, String)] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => Some(("count", "*"))
      case Count(Seq(a: AttributeReference)) => Some(("count", a.name))
      case Sum(a: AttributeReference, _) => Some(("sum", a.name))
      case Average(a: AttributeReference, _) => Some(("avg", a.name))
      case Min(a: AttributeReference) => Some(("min", a.name))
      case Max(a: AttributeReference) => Some(("max", a.name))
      case _ => None
    }

  private def tryRoute(spark: SparkSession, agg: Aggregate, base: LakeTable,
                       groupNames: Seq[String], loc: String): Option[LogicalPlan] =
    try {
      val state = LakeTable.at(spark, loc)
      val props = state.meta.properties
      val (mvGroup, mvAggs) = MaterializedAgg.viewSpec(props).getOrElse(return None)
      // spec match: same base, no dims, same group-column set
      if (!props.get("graft.ivm.base-location").contains(base.location)) return None
      if (props.contains(MaterializedAgg.DimsKey)) return None
      if (mvGroup.sorted != groupNames.sorted) return None
      // freshness: the view must reflect exactly the base's current head
      val head = base.meta.currentSnapshot.map(_.snapshotId)
      if (head.isEmpty || MaterializedAgg.watermarkOf(state) != head) return None
      // map every output expression onto a presented view column
      val presented = MaterializedAgg.presentState(state.toDF, mvGroup, mvAggs)
        .queryExecution.analyzed
      val byName = presented.output.map(a => a.name -> a).toMap
      val mapped: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
        case a: AttributeReference if groupNames.contains(a.name) =>
          byName.get(a.name).map(attr => Alias(attr, a.name)(exprId = a.exprId))
        case al @ Alias(a: AttributeReference, name) if groupNames.contains(a.name) =>
          byName.get(a.name).map(attr => Alias(attr, name)(exprId = al.exprId))
        case al @ Alias(ae: AggregateExpression, name) =>
          for {
            (func, colName) <- classify(ae)
            mv <- mvAggs.find(m => m.func == func && m.column == colName)
            attr <- byName.get(mv.alias)
            // exact type equality or no deal: the state's finalized type
            // must be what the query's aggregate would produce
            if attr.dataType == ae.dataType
          } yield Alias(attr, name)(exprId = al.exprId)
        case _ => None
      }
      if (mapped.exists(_.isEmpty)) None
      else Some(Project(mapped.map(_.get), presented))
    } catch { case scala.util.control.NonFatal(_) => None }
}
