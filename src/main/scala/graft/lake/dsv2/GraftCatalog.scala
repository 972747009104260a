package graft.lake.dsv2

import graft.lake.{LakeCatalog, LakeTable, MetadataTables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.jdk.CollectionConverters._

/** DSv2 `TableCatalog` over the graft lake — registered as e.g.
  * {{{
  *   spark.sql.catalog.lake           = graft.lake.dsv2.GraftCatalog
  *   spark.sql.catalog.lake.warehouse = /path/to/warehouse
  * }}}
  * so the reference's dominant `%%sql` surface works verbatim
  * (spark-defaults.conf:22-29 registers Iceberg's catalog the same way):
  * CREATE DATABASE / CREATE TABLE ... PARTITIONED BY (days(ts)) /
  * INSERT INTO / DELETE FROM / ALTER TABLE / DROP TABLE, `spark.table`,
  * `VERSION AS OF` & `TIMESTAMP AS OF`, branch-suffix identifiers
  * (`db.t.branch_etl_job_42` — WAP….ipynb:440-443), metadata-table
  * suffixes (`db.t.snapshots` — Getting Started.ipynb:353), and SQL
  * `CALL lake.system.rollback_to_snapshot(...)` (Getting
  * Started.ipynb:429) via [[GraftProcedures]].
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog
  with FunctionCatalog with StagingTableCatalog with ViewCatalog {

  private var catalogName: String = _
  private[dsv2] var lake: LakeCatalog = _

  /** Opt into Spark 4's constraints + column-defaults frameworks:
    * without these capabilities the analyzer rejects `ALTER TABLE … ADD
    * CONSTRAINT` / `… DEFAULT …` before the catalog ever sees the
    * TableChange. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
    // spark.sql.catalog.<name>.uri → wire-protocol client mode: metadata
    // authority is the CatalogServer at that uri, data stays on the
    // warehouse (the reference's REST-catalog split,
    // spark-defaults.conf:22-29)
    lake = Option(options.get("uri")) match {
      case Some(uri) => new graft.lake.RemoteLakeCatalog(spark, wh, uri)
      case None => new LakeCatalog(spark, wh)
    }
  }

  override def name(): String = catalogName

  private def identString(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  // ---- tables --------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] =
    lake.listTables(namespace.mkString("."))
      .map(t => Identifier.of(namespace, t)).toArray

  override def tableExists(ident: Identifier): Boolean =
    lake.tableExists(identString(ident)) || resolveSpecial(ident).isDefined

  /** Branch-suffix (`db.t.branch_x`) and metadata-table (`db.t.snapshots`)
    * identifiers: the suffix rides in the name position with the base
    * table as the namespace tail. */
  private def resolveSpecial(ident: Identifier): Option[GraftTable] = {
    if (ident.namespace().isEmpty) return None
    val base = ident.namespace().mkString(".")
    if (!lake.tableExists(base)) return None
    val t = lake.loadTable(base)
    val n = ident.name()
    if (n.startsWith("branch_")) {
      val branch = n.stripPrefix("branch_")
      if (t.meta.refs.contains(branch))
        Some(GraftTable(t, s"$base.$n", pinnedBranch = Some(branch)))
      else None
    } else if (MetadataTables.kinds.contains(n)) {
      Some(GraftTable(t, s"$base.$n", metaKind = Some(n)))
    } else None
  }

  override def loadTable(ident: Identifier): Table = {
    val s = identString(ident)
    if (lake.tableExists(s)) GraftTable(lake.loadTable(s), s)
    else resolveSpecial(ident).getOrElse(throw new NoSuchTableException(ident))
  }

  /** SQL `VERSION AS OF v`: numeric → snapshot id; string → branch name,
    * or a wap.id recorded in a snapshot summary (WAP….ipynb:279). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val s = identString(ident)
    if (!lake.tableExists(s)) throw new NoSuchTableException(ident)
    val t = lake.loadTable(s)
    val m = t.meta
    // toLongOption, not toLong: an all-digit string can still overflow
    // Long (20-digit numeric wap.ids are common timestamp+jobid
    // concatenations) and "" is vacuously all-digits — both must fall
    // through to the ref/wap.id lookups instead of throwing
    // NumberFormatException before they are tried
    val asSnapshotId = version.toLongOption.filter(id => m.snapshot(id).isDefined)
    if (asSnapshotId.isDefined)
      GraftTable(t, s, pinnedSnapshotId = asSnapshotId)
    else if (m.refs.contains(version))
      GraftTable(t, s, pinnedBranch = Some(version))
    else m.snapshots.find(_.summary.get("wap.id").contains(version)) match {
      case Some(snap) => GraftTable(t, s, pinnedSnapshotId = Some(snap.snapshotId))
      case None => throw new IllegalArgumentException(
        s"no snapshot, branch, or wap.id '$version' on $s")
    }
  }

  /** SQL `TIMESTAMP AS OF ts` (micros since epoch). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val s = identString(ident)
    if (!lake.tableExists(s)) throw new NoSuchTableException(ident)
    GraftTable(lake.loadTable(s), s, pinnedTimestampMs = Some(timestamp / 1000L))
  }

  /** Column-array CREATE (the path Spark actually calls): the default
    * StructType conversion DROPS generation expressions (defaults survive
    * as CURRENT_DEFAULT metadata, generated columns don't) — capture them
    * here into the same field-metadata key the rest of the stack reads. */
  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val withGen = StructType(columns.toIndexedSeq.map { c =>
      val b = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.comment()).foreach(b.putString("comment", _))
      Option(c.defaultValue()).foreach { dv =>
        b.putString("CURRENT_DEFAULT", dv.getSql)
        b.putString("EXISTS_DEFAULT", dv.getSql)
      }
      Option(c.generationExpression()).foreach(b.putString("GENERATION_EXPRESSION", _))
      Option(c.identityColumnSpec()).foreach { is =>
        b.putLong("IDENTITY_START", is.getStart)
        b.putLong("IDENTITY_STEP", is.getStep)
        b.putBoolean("IDENTITY_ALLOW_EXPLICIT", is.isAllowExplicitInsert)
      }
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable(), b.build())
    })
    createTable(ident, withGen, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val s = identString(ident)
    if (lake.tableExists(s)) throw new TableAlreadyExistsException(ident)
    requireNotViewStore(ident)
    requireNoSuchView(ident)
    val partitionBy = partitions.toSeq.map(transformToPair)
    val props = properties.asScala.toMap -- Seq("provider", "owner", "location")
    lake.createTable(s, schema, partitionBy, props)
    GraftTable(lake.loadTable(s), s)
  }

  /** Table/view disjointness, both directions (createView already refuses
    * an existing TABLE name): a table may not take a name an existing VIEW
    * holds — the parse-time GraftViewRule substitution would silently
    * shadow the table on every read. And `_views` is the view-store
    * directory (`<warehouse>/<db>/_views/`), so a table by that name would
    * share its storage location — reserved at creation. */
  private def requireNotViewStore(ident: Identifier): Unit =
    require(ident.name() != "_views",
      "'_views' is a reserved identifier (the catalog's view-store directory)")

  private def requireNoSuchView(ident: Identifier): Unit =
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)

  private def transformToPair(t: Transform): (String, String) = {
    val colName = t.references().head.fieldNames().mkString(".")
    t.name() match {
      case "identity" => (colName, "identity")
      case n @ ("days" | "hours" | "months" | "years") => (colName, n)
      case "bucket" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] => l.value().toString
        }.getOrElse(throw new IllegalArgumentException(s"bucket without count: $t"))
        (colName, s"bucket[$n]")
      case other => throw new IllegalArgumentException(s"unsupported transform $other")
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val s = identString(ident)
    if (!lake.tableExists(s)) throw new NoSuchTableException(ident)
    val t = lake.loadTable(s)
    changes.foreach(applyChange(t, _))
    GraftTable(t, s)
  }

  private def applyChange(t: LakeTable, change: TableChange): Unit = change match {
    case c: TableChange.RenameColumn =>
      t.renameColumn(c.fieldNames.mkString("."), c.newName); ()
    case c: TableChange.AddColumn =>
      val after = c.position() match {
        case a: TableChange.After => Some(a.column())
        case _: TableChange.First => Some("")
        case _ => None
      }
      t.addColumn(c.fieldNames.mkString("."), c.dataType(), after,
        Option(c.comment()),
        defaultSql = Option(c.defaultValue()).map(_.getSql)); ()
    case c: TableChange.UpdateColumnDefaultValue =>
      // SET DEFAULT sends the new SQL; DROP DEFAULT sends an empty string
      t.setColumnDefault(c.fieldNames.mkString("."),
        Option(c.newCurrentDefault()).map(_.getSql).filter(_.nonEmpty)); ()
    case c: TableChange.DeleteColumn =>
      t.dropColumn(c.fieldNames.mkString(".")); ()
    case c: TableChange.UpdateColumnType =>
      t.updateColumnType(c.fieldNames.mkString("."), c.newDataType()); ()
    case c: TableChange.UpdateColumnComment =>
      t.updateColumnComment(c.fieldNames.mkString("."), c.newComment()); ()
    case c: TableChange.UpdateColumnPosition =>
      val after = c.position() match {
        case a: TableChange.After => Some(a.column())
        case _: TableChange.First => Some("")
        case _ => None
      }
      t.moveColumn(c.fieldNames.mkString("."), after); ()
    case c: TableChange.SetProperty =>
      t.setProperties(Map(c.property() -> c.value())); ()
    case c: TableChange.RemoveProperty =>
      t.unsetProperties(Seq(c.property())); ()
    // ALTER TABLE … ADD CONSTRAINT <name> CHECK (<pred>): Spark's
    // AddCheckConstraintExec has already VALIDATED existing data (one
    // predicate scan) by the time this change arrives — persist the
    // predicate SQL; GraftTable.constraints() surfaces it and Spark's
    // analyzer enforces it on every subsequent SQL write.
    case c: TableChange.AddConstraint => c.constraint() match {
      case ch: org.apache.spark.sql.connector.catalog.constraints.Check =>
        val key = s"graft.constraint.${ch.name()}"
        if (t.meta.properties.contains(key))
          throw new IllegalArgumentException(s"constraint ${ch.name()} already exists")
        val status = if (c.validatedTableVersion() != null) "VALID" else "UNVALIDATED"
        t.setProperties(Map(key -> ch.predicateSql(),
          s"graft.constraint-status.${ch.name()}" -> status)); ()
      case other => throw new UnsupportedOperationException(
        s"only CHECK constraints are supported: ${other.toDDL}")
    }
    case c: TableChange.DropConstraint =>
      val key = s"graft.constraint.${c.name()}"
      if (t.meta.properties.contains(key)) {
        t.unsetProperties(Seq(key, s"graft.constraint-status.${c.name()}")); ()
      } else if (!c.ifExists())
        throw new IllegalArgumentException(s"no constraint ${c.name()}")
    case other =>
      throw new UnsupportedOperationException(s"unsupported table change $other")
  }

  override def dropTable(ident: Identifier): Boolean = {
    val s = identString(ident)
    if (!lake.tableExists(s)) false
    else { lake.dropTable(s); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    // catalog-level hand-over (metadata moves, data stays in place,
    // sibling references fixed up) — see [[LakeCatalog.renameTable]]
    lake.renameTable(identString(oldIdent), identString(newIdent))
    ()
  }

  // ---- namespaces ----------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    // delegate to the catalog so wire mode (`RemoteLakeCatalog`) can merge
    // the server's table list — an empty remote namespace has no warehouse
    // directory and a pure filesystem walk under-reports it
    lake.listNamespaces().map(n => Array(n)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    lake.namespaceExists(namespace.mkString("."))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    lake.createNamespace(namespace.mkString("."))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val ns = namespace.mkString(".")
    if (!lake.namespaceExists(ns)) false
    else if (!cascade && lake.listTables(ns).nonEmpty)
      throw new IllegalStateException(s"namespace $ns is not empty")
    else {
      // cascade drops each table THROUGH the catalog first: in uri mode
      // the metadata authority is the server — deleting only the
      // warehouse directory would orphan every table's server-side
      // metadata (r12, wire-mode DROP completeness)
      if (cascade) lake.listTables(ns).foreach(t => lake.dropTable(s"$ns.$t"))
      val nsPath = new org.apache.hadoop.fs.Path(s"${lake.warehouse}/$ns")
      val fs = nsPath.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(nsPath, true)
    }
  }

  // ---- procedures (CALL lake.system.<proc>(...)) ---------------------------

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${identString(ident)}")
    GraftProcedures.load(lake, ident.name()).getOrElse(
      throw new IllegalArgumentException(s"unknown procedure ${ident.name()}"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray

  // ---- atomic RTAS (StagingTableCatalog) -----------------------------------
  //
  // CREATE OR REPLACE TABLE … AS SELECT through GraftStagedTable: the
  // SELECT writes pending files, commitStagedChanges publishes schema +
  // spec + content in one metadata version (see GraftStagedTable scaladoc).

  private def stage(ident: Identifier, info: TableInfo,
                    allowExisting: Boolean, requireExisting: Boolean): StagedTable = {
    val s = identString(ident)
    val exists = lake.tableExists(s)
    if (!allowExisting && exists) throw new TableAlreadyExistsException(ident)
    if (requireExisting && !exists) throw new NoSuchTableException(ident)
    requireNotViewStore(ident)
    requireNoSuchView(ident)
    val partitionBy = info.partitions().toSeq.map(transformToPair)
    val props = info.properties().asScala.toMap -- Seq("provider", "owner", "location")
    new GraftStagedTable(lake, s, info.schema(), partitionBy, props, exists)
  }

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, allowExisting = false, requireExisting = false)
  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, allowExisting = true, requireExisting = true)
  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, allowExisting = true, requireExisting = false)

  // ---- views (ViewCatalog) -------------------------------------------------
  //
  // SQL CREATE/DROP/SHOW VIEW against the lake catalog — view text +
  // resolution context persist as warehouse JSON (GraftViews scaladoc),
  // so views are engine-agnostic metadata like the table format itself.

  private def warehouse: String = lake.warehouse

  override def loadView(ident: Identifier): View =
    GraftViews.load(spark, warehouse, ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))

  override def createView(info: ViewInfo): View = {
    val ident = info.ident()
    if (GraftViews.exists(spark, warehouse, ident))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    if (tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    GraftViews.create(spark, warehouse, info, orReplace = false)
    loadView(ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident()
    if (!orCreate && !GraftViews.exists(spark, warehouse, ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    GraftViews.create(spark, warehouse, info, orReplace = true)
    loadView(ident)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View =
    throw new UnsupportedOperationException(
      "ALTER VIEW: drop and re-create (views are immutable documents)")

  override def dropView(ident: Identifier): Boolean =
    GraftViews.drop(spark, warehouse, ident)

  override def renameView(from: Identifier, to: Identifier): Unit =
    GraftViews.rename(spark, warehouse, from, to)

  override def listViews(namespace: String*): Array[Identifier] =
    GraftViews.list(spark, warehouse, namespace.toArray).toArray

  override def viewExists(ident: Identifier): Boolean =
    GraftViews.exists(spark, warehouse, ident)

  // ---- functions (v2 FunctionCatalog) --------------------------------------
  //
  // Serves the partition transforms as resolvable functions — the piece
  // that lets Catalyst equate two tables' `bucket[n]` partitionings in
  // storage-partitioned joins (GraftSpj scaladoc). Spark resolves a bucket
  // Transform by loading "bucket" from the ROOT namespace of the
  // relation's catalog.

  private val functionNames = Set("bucket", "days", "hours", "months", "years")
  private def functionNamespaceOk(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("system"))

  override def loadFunction(ident: Identifier): functions.UnboundFunction =
    if (functionNamespaceOk(ident.namespace()) && ident.name() == "bucket")
      GraftBucketFunction
    else if (functionNamespaceOk(ident.namespace()) && functionNames(ident.name()))
      GraftTimeTransformFunction(ident.name())
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
      name(), ident.name())

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    functionNames.toArray.sorted.map(n => Identifier.of(Array.empty, n))

  override def functionExists(ident: Identifier): Boolean =
    functionNames(ident.name()) && functionNamespaceOk(ident.namespace())
}
