package graft.lake.dsv2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `DELETE FROM … WHERE` for graft lake tables with ARBITRARY
  * predicates (ref: WAP.ipynb c64 `DELETE … WHERE log LIKE '%'`; Getting
  * Started.ipynb DML cells). The SupportsDelete V1 filter bridge only
  * accepts predicates expressible as source Filters (comparisons, IN,
  * NULL tests, prefix/suffix LIKE, AND/OR/NOT) — a modulo, arithmetic,
  * function call, or bare `LIKE '%'` predicate made Spark fail with
  * "Cannot delete from table". Like [[GraftUpdate]], a resolved
  * [[DeleteFromTable]] over a graft target is rewritten to a command on
  * [[graft.lake.LakeTable.delete]], whose Column condition carries the
  * full Catalyst expression — identical CoW/metadata-only/WAP-staging/
  * branch-routing semantics, no translatability limit.
  *
  * Guards mirror GraftUpdate: metadata tables and time-travel pins are
  * not deletable (left untranslated; the V1 path then raises the same
  * errors as before), and subqueries are left for Spark to reject.
  */
object GraftDelete {

  def translate(d: DeleteFromTable): Option[LogicalPlan] =
    for {
      gt <- GraftMerge.unwrapGraftTarget(d.table)
      if gt.metaKind.isEmpty &&
        gt.pinnedSnapshotId.isEmpty && gt.pinnedTimestampMs.isEmpty &&
        d.resolved &&
        !SubqueryExpression.hasSubquery(d.condition)
    } yield DeleteGraftCommand(gt, d.condition)
}

case class DeleteGraftCommand(
    gt: GraftTable,
    condition: Expression) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    // branch-suffixed targets (db.t.branch_x) pin the write branch —
    // without it the DELETE would silently rewrite main; an active SQL
    // transaction routes to its staged branch instead (fork recorded)
    graft.lake.LakeTable.withConflictRetry() {
      gt.txnRoute match {
        case Some(tt) => tt.delete(GraftUpdate.rebase(condition))
        case None => gt.lakeTable.delete(GraftUpdate.rebase(condition),
          toBranch = gt.pinnedBranch)
      }
    }
    Seq.empty
  }
}
