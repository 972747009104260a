package graft.lake.dsv2

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL `UPDATE … SET` for graft lake tables — D10's SQL spelling (ref:
  * Getting Started.ipynb:210, cell 18, `UPDATE nyc.taxis SET
  * fare_per_distance_unit = fare/distance`). A resolved [[UpdateTable]]
  * over a graft target is rewritten to a command over
  * [[graft.lake.LakeTable.update]]: a copy-on-write rewrite that
  * stats-prunes untouched files and applies the assignments under
  * WHEN(condition) per row.
  *
  * Translatable shape: top-level column assignments whose values (and
  * the optional WHERE condition) reference only target columns, with no
  * subqueries. Anything else is left in place for Spark to reject.
  */
object GraftUpdate {

  /** Rebase resolved target attributes to name-based references so the
    * expression re-resolves against the LakeTable read DataFrame (whose
    * attribute ids differ from the DSv2 relation's). */
  private[dsv2] def rebase(e: Expression): Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** Rewrite if translatable; None leaves the plan for Spark to reject.
    * Metadata tables and time-travel pins are NOT updatable — without the
    * guard an `UPDATE db.t.snapshots SET …` would run against the base
    * table's data files. */
  def translate(u: UpdateTable): Option[LogicalPlan] =
    for {
      gt <- GraftMerge.unwrapGraftTarget(u.table)
      if gt.metaKind.isEmpty &&
        gt.pinnedSnapshotId.isEmpty && gt.pinnedTimestampMs.isEmpty &&
        u.resolved &&
        u.assignments.nonEmpty &&
        u.assignments.forall(_.key.isInstanceOf[Attribute]) &&
        !(u.assignments.map(_.value) ++ u.condition).exists(SubqueryExpression.hasSubquery)
    } yield UpdateGraftCommand(gt,
      u.assignments.map(a => a.key.asInstanceOf[Attribute].name -> a.value),
      u.condition)
}

case class UpdateGraftCommand(
    gt: GraftTable,
    assignments: Seq[(String, Expression)],
    condition: Option[Expression]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    // branch-suffixed targets (db.t.branch_x) pin the write branch —
    // without it the UPDATE would silently rewrite main; an active SQL
    // transaction routes to its staged branch instead (fork recorded)
    graft.lake.LakeTable.withConflictRetry() {
      val asg = assignments.map { case (n, e) => n -> GraftUpdate.rebase(e) }.toMap
      val cond = condition.map(GraftUpdate.rebase)
      gt.txnRoute match {
        case Some(tt) => tt.update(asg, cond)
        case None => gt.lakeTable.update(asg, cond, toBranch = gt.pinnedBranch)
      }
    }
    Seq.empty
  }
}
