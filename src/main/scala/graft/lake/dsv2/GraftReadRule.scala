package graft.lake.dsv2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule: substitute a [[GraftTable]] DSv2 relation with the
  * LakeTable read plan (parquet scan over the snapshot's pruned file
  * list, with the rename/widen schema mapping). SQL reads thereby get
  * the exact semantics and pushdown of the Scala read path without a
  * custom DSv2 Scan/Batch implementation — Catalyst sees a plain parquet
  * relation and applies its own filter/column pushdown below our
  * projection.
  *
  * Write/DML targets keep the DSv2 relation (AppendData needs
  * SupportsWrite, DELETE needs SupportsDelete), so those relations are
  * excluded by reference identity.
  *
  * Also rewrites unfiltered, ungrouped COUNT(*) / MIN(col) / MAX(col)
  * over a graft relation to a metadata lookup (snapshot row counts and
  * integer-domain column bounds from parquet footers) — zero data files
  * touched, any table size. Filters, grouping, DISTINCT, null-sensitive
  * COUNT(col), and columns the stats layer can't vouch for (float/
  * double/decimal/string, missing bounds) all fall through to the
  * normal scan.
  */
case class GraftReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // act only on FULLY-resolved plans: substitution preserves exprIds so
    // nothing here is needed FOR resolution, and rewriting early destroys
    // information later resolution steps still read (a Sort over `d.seg`
    // resolves its qualifier against the aggregate's output; the MV
    // routing pre-pass must also see the relation BEFORE the scan
    // substitution consumes it). The analyzer's fixed point re-runs this
    // rule the iteration after the plan resolves.
    if (!plan.resolved) return plan
    // relations serving as write/DML targets must stay DSv2 — register
    // every relation under the target plan (DML targets arrive wrapped in
    // SubqueryAlias layers, so the top node alone is not enough)
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def addTarget(p: LogicalPlan): Unit = p.foreach {
      case r: DataSourceV2Relation => writeTargets.add(r); ()
      case _ => ()
    }
    plan.foreach {
      case w: V2WriteCommand => addTarget(w.table)
      case d: DeleteFromTable => addTarget(d.table)
      case u: UpdateTable => addTarget(u.table)
      case m: MergeIntoTable => addTarget(m.targetTable)
      case _ => ()
    }
    // metadata-only COUNT(*): an unfiltered, ungrouped count over a graft
    // relation reads the answer from snapshot metadata (footer row counts)
    // instead of scanning data files — the lakehouse classic. Pre-pass
    // (transformDown) because the transformUp below substitutes the
    // relation out from under the Aggregate before it would match.
    // child must be exactly the relation, optionally behind aliases or an
    // attribute-only Project — any Filter/Generate/… breaks the match and
    // the count scans normally
    def unwrapScan(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] = p match {
      case SubqueryAlias(_, c) => unwrapScan(c)
      case Project(projectList, c) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        unwrapScan(c)
      case r: DataSourceV2Relation => r.table match {
        case gt: GraftTable => Some((r, gt))
        case _ => None
      }
      case _ => None
    }
    // metadata-answerable aggregate shapes: COUNT(*), and MIN/MAX of a
    // plain column (the stats layer vouches only for integer-domain
    // columns — metadataMinMax returns None otherwise and the scan runs)
    sealed trait MetaAgg
    case object CountStar extends MetaAgg
    case class CountOf(col: String) extends MetaAgg
    case class MinOf(col: String) extends MetaAgg
    case class MaxOf(col: String) extends MetaAgg
    def classify(e: Expression): Option[MetaAgg] = e match {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) => Some(CountStar)
          case Count(Seq(a: AttributeReference)) => Some(CountOf(a.name))
          case Min(a: AttributeReference) => Some(MinOf(a.name))
          case Max(a: AttributeReference) => Some(MaxOf(a.name))
          case _ => None
        }
      case _ => None
    }
    def toTableAgg(a: MetaAgg): GraftTable.MetaAgg = a match {
      case CountStar => GraftTable.MetaCountStar
      case CountOf(c) => GraftTable.MetaCountCol(c)
      case MinOf(c) => GraftTable.MetaMin(c)
      case MaxOf(c) => GraftTable.MetaMax(c)
    }
    // internal value for a stats bound in the agg output's type domain
    def internal(v: Long, dt: org.apache.spark.sql.types.DataType): Any = dt match {
      case org.apache.spark.sql.types.ByteType => v.toByte
      case org.apache.spark.sql.types.ShortType => v.toShort
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType => v.toInt
      case _ => v // LongType, TimestampType (micros), TimestampNTZType
    }
    // materialized-view routing pre-pass: an aggregate a maintained MV
    // already answers reads the (fresh) view state instead of scanning
    // the base — see GraftMvRoute for the match/freshness contract. Runs
    // before the metadata-count pass (a routed plan has no relation left
    // for it) and leaves non-matching aggregates untouched for it.
    val routed = plan.transformDown {
      case agg: Aggregate =>
        GraftMvRoute.route(spark, agg, unwrapScan, writeTargets.contains)
          .getOrElse(agg)
    }
    val counted = routed.transformDown {
      // metadata-only GROUP BY partition-column aggregation: a grouped
      // COUNT(*) / COUNT(col) / MIN(col) / MAX(col) keyed by an IDENTITY
      // partition column reads the answer from the per-file partition
      // values + footer stats (the `partitions` metadata table as a query
      // plan) — zero data files at any table size. COUNT(*) stays exact
      // under merge-on-read POSITION deletes (per-file masked counts
      // subtract); everything else bails (→ normal scan) under any mask,
      // partition evolution gaps, non-identity transforms, or stats that
      // can't vouch (GraftTable.metadataGroupedAgg).
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
          if agg.resolved && aggExprs.nonEmpty && aggExprs.forall {
            case a: AttributeReference => a.exprId == g.exprId
            case Alias(a: AttributeReference, _) => a.exprId == g.exprId
            case e => classify(e).isDefined
          } =>
        unwrapScan(child) match {
          case Some((r, gt)) if !writeTargets.contains(r) =>
            val aggOnly = aggExprs.flatMap(classify(_))
            gt.metadataGroupedAgg(g.name, aggOnly.map(toTableAgg)) match {
              case Some(rows) =>
                LocalRelation(agg.output.map(_.toAttribute), rows.map {
                  case (v, vals) =>
                    var i = -1
                    InternalRow.fromSeq(aggExprs.map {
                      case _: AttributeReference => v
                      case Alias(_: AttributeReference, _) => v
                      case e =>
                        i += 1
                        (classify(e).get, vals(i)) match {
                          case (CountStar | CountOf(_), n: java.lang.Long) =>
                            n.longValue()
                          case (_, bound: Option[_]) => bound
                            .map(b => internal(b.asInstanceOf[Long], e.dataType))
                            .orNull
                          case (_, other) => other
                        }
                    })
                })
              case None => agg
            }
          case _ => agg
        }
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if agg.resolved && groupings.isEmpty && aggExprs.nonEmpty &&
            aggExprs.forall(e => classify(e).isDefined) =>
        unwrapScan(child) match {
          case Some((r, gt)) if !writeTargets.contains(r) =>
            val answered = aggExprs.map { e =>
              classify(e).get match {
                case CountStar => gt.metadataRowCount
                case CountOf(c) => gt.metadataCountCol(c)
                case MinOf(c) => gt.metadataMinMax(c).map(mm =>
                  mm._1.map(internal(_, e.dataType)).orNull)
                case MaxOf(c) => gt.metadataMinMax(c).map(mm =>
                  mm._2.map(internal(_, e.dataType)).orNull)
              }
            }
            if (answered.forall(_.isDefined))
              LocalRelation(agg.output.map(_.toAttribute),
                Seq(InternalRow.fromSeq(answered.map(_.get))))
            else agg
          case _ => agg
        }
    }
    // transformUp (not resolveOperatorsUp): the substitution must also
    // apply to already-analyzed subtrees (e.g. cached plan fragments);
    // the pattern is idempotent — once substituted there is no relation
    // left to match
    counted.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !writeTargets.contains(r) &&
            // storage-partitioned-join mode: bucket-partitioned tables stay
            // DSv2 so the batch scan can report KeyGroupedPartitioning and
            // the join plans with no Exchange (GraftSpj scaladoc)
            !(GraftSpj.active(spark) && GraftSpj.eligible(r.table.asInstanceOf[GraftTable])) =>
        val gt = r.table.asInstanceOf[GraftTable]
        val child = gt.readDataFrame().queryExecution.analyzed
        // preserve the relation's output attribute ids so parent operator
        // references stay bound
        val aliased = r.output.zip(child.output).map { case (ro, co) =>
          Alias(co, ro.name)(exprId = ro.exprId)
        }
        Project(aliased, child)
      // SQL MERGE INTO on a graft target: translate the equality-key shape
      // to the distributed mergeByKeys command (GraftMerge scaladoc)
      case m: MergeIntoTable if GraftMerge.unwrapGraftTarget(m.targetTable).isDefined =>
        GraftMerge.translate(m).getOrElse(m)
      // SQL UPDATE … SET on a graft target: translate to the copy-on-write
      // LakeTable.update command (GraftUpdate scaladoc)
      case u: UpdateTable if GraftMerge.unwrapGraftTarget(u.table).isDefined =>
        GraftUpdate.translate(u).getOrElse(u)
      // SQL DELETE FROM on a graft target: translate to the LakeTable
      // .delete command — arbitrary predicates, not just V1-translatable
      // Filters (GraftDelete scaladoc)
      case d: DeleteFromTable if GraftMerge.unwrapGraftTarget(d.table).isDefined =>
        GraftDelete.translate(d).getOrElse(d)
    }
  }
}
