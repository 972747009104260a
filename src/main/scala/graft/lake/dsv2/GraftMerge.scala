package graft.lake.dsv2

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL `MERGE INTO` for graft lake tables (SURVEY §2.9 / the reference's
  * equality-delete upsert semantics, IcebergStream.java:118), without the
  * SupportsRowLevelOperations machinery: a resolved [[MergeIntoTable]]
  * whose shape is an equality-key merge with source-only action
  * expressions is rewritten to a command over
  * [[graft.lake.LakeTable.mergeByKeys]] — keys stay distributed, files
  * are stats-pruned, survivors are anti-joined.
  *
  * Translatable shape (everything else is left for Spark to reject):
  *   - ON target.k = <expr over source>
  *   - WHEN MATCHED [AND cond] THEN UPDATE SET <all columns> | DELETE
  *   - WHEN NOT MATCHED [AND cond] THEN INSERT <all columns>
  *   - WHEN NOT MATCHED BY SOURCE [AND cond-over-target] THEN DELETE
  *     (the full-sync idiom: target rows absent from the source are
  *     dropped in the SAME atomic commit; cond may reference only
  *     TARGET columns — it is evaluated on a branch-correct target scan)
  *   - matched/not-matched action conditions/values reference only
  *     source columns
  *
  * Semantics: a matched target row is deleted iff SOME matched action
  * wins for a matching source row (first-true-condition wins, SQL order);
  * winning UPDATE/INSERT actions contribute replacement rows. Target rows
  * whose matched source rows win no action are left untouched.
  */
object GraftMerge {

  def unwrapGraftTarget(plan: LogicalPlan): Option[GraftTable] = plan match {
    case SubqueryAlias(_, child) => unwrapGraftTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case gt: GraftTable => Some(gt)
      case _ => None
    }
    case _ => None
  }

  /** Extract (targetKeyName, sourceKeyExpression) from `ON t.k = <src expr>`. */
  private def keyOf(m: MergeIntoTable): Option[(String, Expression)] = {
    val targetAttrs = m.targetTable.outputSet
    val sourceAttrs = m.sourceTable.outputSet
    m.mergeCondition match {
      case EqualTo(a: AttributeReference, b)
          if targetAttrs.contains(a) && b.references.subsetOf(sourceAttrs) =>
        Some((a.name, b))
      case EqualTo(b, a: AttributeReference)
          if targetAttrs.contains(a) && b.references.subsetOf(sourceAttrs) =>
        Some((a.name, b))
      case _ => None
    }
  }

  private def sourceOnly(m: MergeIntoTable, e: Expression): Boolean =
    e.references.subsetOf(m.sourceTable.outputSet)

  private def actionsOk(m: MergeIntoTable): Boolean = {
    val targetCols = m.targetTable.output.map(_.name).toSet
    def assignsOk(assigns: Seq[Assignment]): Boolean =
      assigns.nonEmpty &&
        assigns.forall(a => a.key.isInstanceOf[Attribute] && sourceOnly(m, a.value)) &&
        assigns.map(_.key.asInstanceOf[Attribute].name).toSet == targetCols
    m.matchedActions.forall {
      case UpdateAction(cond, assigns, _) =>
        cond.forall(sourceOnly(m, _)) && assignsOk(assigns)
      case DeleteAction(cond) => cond.forall(sourceOnly(m, _))
      case _ => false
    } && m.notMatchedActions.forall {
      case InsertAction(cond, assigns) =>
        cond.forall(sourceOnly(m, _)) && assignsOk(assigns)
      case _ => false
    } && (m.notMatchedBySourceActions match {
      // full-sync DELETE: at most one clause, condition over target only
      case Seq() => true
      case Seq(DeleteAction(cond)) =>
        cond.forall(_.references.subsetOf(m.targetTable.outputSet))
      case _ => false
    })
  }

  /** Rewrite if translatable; None leaves the plan for Spark to reject.
    * Metadata tables and time-travel pins can never be merge targets. */
  def translate(m: MergeIntoTable): Option[LogicalPlan] =
    for {
      gt <- unwrapGraftTarget(m.targetTable)
      if gt.metaKind.isEmpty &&
        gt.pinnedSnapshotId.isEmpty && gt.pinnedTimestampMs.isEmpty &&
        m.resolved && actionsOk(m)
      (keyName, keyExpr) <- keyOf(m)
    } yield MergeIntoGraftCommand(gt, m.sourceTable, keyName, keyExpr,
      m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)

  /** Target-key scan for matched-ness, pruned to data files whose key
    * stats overlap the source batch's [lo, hi] key bounds — the same
    * footer-stats trick mergeByKeys uses for the rewrite set. A MERGE
    * whose source touches one partition reads one partition's files for
    * the matched-ness join, not the whole table. Reads the same branch
    * the merge will commit to. */
  def matchedKeyScan(lt: graft.lake.LakeTable, key: String, lo: Any, hi: Any,
                     branch: Option[String] = None): DataFrame =
    lt.read(branch = branch, filter = Some(col(key) >= lit(lo) && col(key) <= lit(hi)))
      .select(col(key).as("_tk")).distinct()
}

case class MergeIntoGraftCommand(
    gt: GraftTable,
    source: LogicalPlan,
    targetKeyName: String,
    sourceKeyExpr: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction] = Seq.empty)
  extends LeafRunnableCommand {

  // conflict-retry: the matched-ness scan and file pruning are planned
  // against a snapshot; a concurrent rewrite re-plans the whole merge
  override def run(spark: SparkSession): Seq[Row] =
    graft.lake.LakeTable.withConflictRetry() { runOnce(spark) }

  private def runOnce(spark: SparkSession): Seq[Row] = {
    def c(e: Expression): Column = ColumnBridge.column(e)
    val src = ColumnBridge.ofRows(spark, source)
    // matched-ness per source row: semi-style left join against the
    // target's distinct keys (distributed; no key collection). One 1-row
    // agg fetches the source's key bounds first so the key scan reads
    // only stats-overlapping files instead of the whole table.
    val kb = src.agg(min(c(sourceKeyExpr)).as("lo"), max(c(sourceKeyExpr)).as("hi")).head()
    // matched-ness MUST read the branch the merge commits to (a
    // branch-suffixed target merged against main's keys would rewrite the
    // wrong rows)
    val tgtKeys =
      if (kb.isNullAt(0)) // no non-null source keys → nothing can match
        gt.lakeTable.read(branch = gt.effectiveBranch)
          .select(col(targetKeyName).as("_tk")).filter(lit(false))
      else GraftMerge.matchedKeyScan(gt.lakeTable, targetKeyName, kb.get(0), kb.get(1),
        branch = gt.effectiveBranch)
    // cached: `marked` (source query + matched-ness join) is consumed once
    // per winning action branch plus once for the delete-key set — without
    // the cache an expensive source query re-executes 3-5 times
    val marked = src.join(tgtKeys, c(sourceKeyExpr) === col("_tk"), "left")
      .withColumn("_matched", col("_tk").isNotNull)
      .cache()
    def condOf(a: MergeAction): Column =
      a.condition.map(e => coalesce(c(e), lit(false))).getOrElse(lit(true))
    // first-true-condition-wins per SQL MERGE order
    def winFilter(actions: Seq[MergeAction], i: Int): Column =
      actions.take(i).map(condOf).foldLeft(condOf(actions(i)))((acc, p) => acc && !p)
    def branches(actions: Seq[MergeAction], base: Column): Seq[DataFrame] =
      actions.zipWithIndex.collect {
        case (UpdateAction(_, assigns, _), i) =>
          marked.filter(base && winFilter(actions, i))
            .select(assigns.map(a =>
              c(a.value).as(a.key.asInstanceOf[Attribute].name)): _*)
        case (InsertAction(_, assigns), i) =>
          marked.filter(base && winFilter(actions, i))
            .select(assigns.map(a =>
              c(a.value).as(a.key.asInstanceOf[Attribute].name)): _*)
      }
    try {
      val upserts = (branches(matchedActions, col("_matched")) ++
          branches(notMatchedActions, !col("_matched")))
        .reduceOption(_ unionByName _)
        .getOrElse(spark.emptyDataFrame)
      // delete a matched key iff some matched action wins for its source row
      val anyMatchedWin = matchedActions.map(condOf)
        .reduceOption(_ || _).getOrElse(lit(false))
      val matchedDeleteKeys = marked.filter(col("_matched") && anyMatchedWin)
        .select(c(sourceKeyExpr).as(targetKeyName))
      // NOT MATCHED BY SOURCE DELETE (full sync): target keys with no
      // source match, condition evaluated on a branch-correct target
      // scan (the cond's target attributes are re-bound by NAME onto the
      // scan — the plan's attribute ids don't resolve against a fresh
      // read). The key scan is column-pruned to the key + cond columns;
      // the rewrite set stays key-bound-pruned via mergeByKeys. NULL-keyed
      // target rows never equi-match, so they too are not-matched-by-
      // source and SQL requires them deleted — but equality-key machinery
      // cannot express "delete WHERE key IS NULL" (mergeByKeys' key set
      // is null-filtered and its anti-join is null-rejecting), so they
      // route through mergeByKeys' dedicated `nullKeyDelete` condition
      // instead of the key set. Cost is honest to the semantics: full
      // sync must at least read every target key.
      val nmbsKeys = notMatchedBySourceActions.headOption.map {
        case DeleteAction(cond) =>
          val tdf = gt.lakeTable.read(branch = gt.effectiveBranch)
          val condCol = cond.map(e => coalesce(ColumnBridge.column(e.transform {
            case a: AttributeReference => ColumnBridge.expression(tdf(a.name))
          }), lit(false))).getOrElse(lit(true))
          val srcKeys = src.select(c(sourceKeyExpr).as("_sk")).distinct()
          tdf.filter(condCol).select(col(targetKeyName))
            .join(srcKeys, col(targetKeyName) === col("_sk"), "left_anti")
        case other =>
          throw new IllegalStateException(s"untranslatable NMBS action $other")
      }
      // NMBS null-key condition, rebound by NAME so it resolves against
      // mergeByKeys' internal live scan (TRUE when the clause has no cond)
      val nullCond = notMatchedBySourceActions.headOption.map {
        case DeleteAction(cond) =>
          cond.map(e => ColumnBridge.column(e.transform {
            case a: AttributeReference =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                .quoted(a.name)
          })).getOrElse(lit(true))
        case other =>
          throw new IllegalStateException(s"untranslatable NMBS action $other")
      }
      val keyDf = nmbsKeys.foldLeft(matchedDeleteKeys)(_ unionByName _)
      gt.txnRoute match {
        case Some(tt) => tt.mergeByKeys(targetKeyName, keyDf, upserts,
          Map("merged-by" -> "sql-merge-into"), nullKeyDelete = nullCond)
        case None => gt.lakeTable.mergeByKeys(targetKeyName, keyDf, upserts,
          Map("merged-by" -> "sql-merge-into"), toBranch = gt.pinnedBranch,
          nullKeyDelete = nullCond)
      }
    } finally { marked.unpersist(); () }
    Seq.empty
  }
}
