package graft.lake.dsv2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL surface for catalog views on graft catalogs. Stock Spark 4 ships
  * the [[org.apache.spark.sql.connector.catalog.ViewCatalog]] API but no
  * SQL wiring — `ResolveSessionCatalog` rejects view DDL on any
  * non-session catalog ("does not support views"), which is why Iceberg
  * ships its own view analyzer rules. Same approach here, applied at
  * PARSE time from [[GraftSqlParser]] (ResolveSessionCatalog rejects
  * v2-catalog view DDL before any injected resolution rule runs, so the
  * rewrite must happen before the analyzer sees the plan), translating
  * view plans to commands on [[GraftViews]]:
  *
  *   - `CREATE [OR REPLACE] VIEW lake.db.v AS <query>` → persist the
  *     ORIGINAL query text + resolution context + analyzed schema;
  *   - `SELECT … FROM lake.db.v` → parse the stored text and substitute
  *     (re-resolved per read — views track base-table changes);
  *   - `DROP VIEW` / `SHOW VIEWS IN` / `ALTER VIEW … RENAME TO`.
  *
  * Stored view text is parsed in the CURRENT session context; write view
  * queries with catalog-qualified table names (the notebook convention)
  * for full portability. Table/view namespaces are disjoint by
  * construction (createView refuses an existing table name and the DSv2
  * relation resolution wins for tables). */
case class GraftViewRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def asGraft(name: String): Option[GraftCatalog] =
    scala.util.Try(spark.sessionState.catalogManager.catalog(name)).toOption
      .collect { case g: GraftCatalog => g }

  /** (catalog, catalogName, Identifier) for catalog-qualified name parts;
    * 2-part names resolve against the CURRENT catalog when it is a graft
    * catalog (the `USE lake` notebook convention). */
  private def viewTarget(parts: Seq[String]): Option[(GraftCatalog, String, Identifier)] =
    parts match {
      case Seq(cat, db, v) =>
        asGraft(cat).map(g => (g, cat, Identifier.of(Array(db), v)))
      case Seq(db, v) =>
        val cm = spark.sessionState.catalogManager
        cm.currentCatalog match {
          case g: GraftCatalog => Some((g, g.name(), Identifier.of(Array(db), v)))
          case _ => None
        }
      case _ => None
    }

  private def viewExists(t: (GraftCatalog, String, Identifier)): Boolean =
    t._1.viewExists(t._3)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val top = plan match {
      case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _, props,
          originalText, _, allowExisting, replace, _) =>
        viewTarget(parts) match {
          case Some((g, cat, ident)) =>
            require(cols.isEmpty, "user-specified view column lists are not supported")
            val sql = originalText.getOrElse(
              throw new IllegalArgumentException("persisted view requires query text"))
            CreateGraftViewCommand(g, cat, ident, sql,
              comment.map(c => Map("comment" -> c)).getOrElse(Map.empty) ++ props,
              allowExisting, replace)
          case None => cv
        }
      case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        // intercept whenever the identifier targets a graft catalog — the
        // command handles IF EXISTS (falling through would hit the stock
        // "catalog does not support views" rejection even for IF EXISTS)
        viewTarget(parts) match {
          case Some((g, _, ident)) => DropGraftViewCommand(g, ident, ifExists)
          case _ => dv
        }
      case rn @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true) =>
        viewTarget(parts) match {
          case Some(t @ (g, cat, ident)) if viewExists(t) =>
            val toIdent = newName match {
              case Seq(c2, db2, v2) if c2 == cat => Identifier.of(Array(db2), v2)
              case Seq(db2, v2) => Identifier.of(Array(db2), v2)
              case other => throw new IllegalArgumentException(
                s"cannot rename view across catalogs: ${other.mkString(".")}")
            }
            RenameGraftViewCommand(g, ident, toIdent)
          case _ => rn
        }
      case sv @ ShowViews(UnresolvedNamespace(ns, _), pattern, output) =>
        ns match {
          case Seq(cat, db) if asGraft(cat).isDefined =>
            ShowGraftViewsCommand(asGraft(cat).get, db, pattern, output)
          case Seq(db) =>
            spark.sessionState.catalogManager.currentCatalog match {
              case g: GraftCatalog => ShowGraftViewsCommand(g, db, pattern, output)
              case _ => sv
            }
          case _ => sv
        }
      case other => other
    }
    // read path: substitute stored view text for relations naming a view.
    // Parsing the stored text re-enters this rule (nested views resolve
    // naturally); the depth guard turns a view CYCLE into a clear error
    // instead of a stack overflow.
    top.transformUp {
      case u @ UnresolvedRelation(parts, _, false) =>
        viewTarget(parts) match {
          case Some(t @ (g, _, ident)) if viewExists(t) =>
            val d = GraftViewRule.depth.get()
            require(d < 10, s"view nesting deeper than 10 (cycle?) at ${parts.mkString(".")}")
            GraftViewRule.depth.set(d + 1)
            try {
              val v = g.loadView(ident)
              val parsed = spark.sessionState.sqlParser.parsePlan(v.query())
              // Re-resolve 1-/2-part table references against the view's
              // STORED creation context (currentCatalog/currentNamespace —
              // persisted exactly for this, like Iceberg's ViewCatalog):
              // a view created under `USE lake` must read the same tables
              // from a session sitting in another catalog. CTE aliases and
              // session temp views keep their local meaning.
              val qualified = qualify(parsed, v.currentCatalog,
                v.currentNamespace.toSeq)
              // nested views referencing stored-context names only become
              // visible after qualification — run the rule once more
              SubqueryAlias(ident.name(),
                if (qualified.fastEquals(parsed)) parsed else apply(qualified))
            } finally GraftViewRule.depth.set(d)
          case _ => u
        }
    }
  }

  /** Prefix under-qualified relation names with the view's stored context:
    * 1-part `t` → `<catalog>.<namespace>.t`, 2-part `db.t` →
    * `<catalog>.db.t`. Skips CTE aliases (scoped to the view text) and
    * session temp views (session-local by definition). */
  private def qualify(parsed: LogicalPlan, storedCatalog: String,
                      storedNamespace: Seq[String]): LogicalPlan = {
    val cteNames = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    def isTemp(parts: Seq[String]): Boolean =
      scala.util.Try(spark.sessionState.catalog.isTempView(parts)).getOrElse(false)
    parsed.transformUpWithSubqueries {
      case u @ UnresolvedRelation(parts, _, _)
          if parts.length <= 2 &&
            !(parts.length == 1 && cteNames.contains(parts.head.toLowerCase)) &&
            !isTemp(parts) =>
        val full =
          if (parts.length == 1) storedCatalog +: (storedNamespace ++ parts)
          else storedCatalog +: parts
        u.copy(multipartIdentifier = full)
    }
  }
}

object GraftViewRule {
  private[dsv2] val depth: ThreadLocal[Int] = ThreadLocal.withInitial(() => 0)
}

case class CreateGraftViewCommand(g: GraftCatalog, catalogName: String,
    ident: Identifier, sql: String, props: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (g.viewExists(ident) && allowExisting && !replace) return Seq.empty
    // analyze the view text NOW: schema persists with the definition, and
    // an invalid query fails CREATE, not the first read
    val analyzed = spark.sql(sql)
    val j = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => j.put(k, v) }
    val info = new ViewInfo(ident, sql, catalogName, ident.namespace(),
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String], j)
    if (replace) g.replaceView(info, orCreate = true)
    else g.createView(info)
    Seq.empty
  }
}

case class DropGraftViewCommand(g: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = g.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Seq.empty
  }
}

case class RenameGraftViewCommand(g: GraftCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    g.renameView(from, to); Seq.empty
  }
}

case class ShowGraftViewsCommand(g: GraftCatalog, db: String,
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // Spark's SHOW ... LIKE pattern language: '*' = any chars, '|' = OR of
    // alternatives; everything else is a LITERAL (quote it — '.', '+',
    // '(' etc. in a view name must not be treated as regex syntax).
    val re = pattern.map { p =>
      val alts = p.split("\\|", -1).map(f =>
        f.split("\\*", -1).map {
          case "" => ""
          case lit => java.util.regex.Pattern.quote(lit)
        }.mkString(".*"))
      java.util.regex.Pattern.compile(alts.mkString("|"),
        java.util.regex.Pattern.CASE_INSENSITIVE)
    }
    g.listViews(db).toSeq
      .filter(i => re.forall(_.matcher(i.name()).matches()))
      .map(i => Row(db, i.name(), false))
  }
}
