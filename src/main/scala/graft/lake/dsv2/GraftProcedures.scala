package graft.lake.dsv2

import graft.lake.LakeCatalog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{ArrayType, BooleanType, ByteType, DataType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import java.util.Collections

/** SQL `CALL lake.system.<proc>(...)` — the reference's maintenance
  * procedures (Getting Started.ipynb:429 `rollback_to_snapshot`,
  * Integrated Audits….ipynb:398 `cherrypick_snapshot`, :580 + Table
  * Maintenance….ipynb:165 `expire_snapshots`, :123 `rewrite_data_files`,
  * :193 `rewrite_manifests`), mapped to the [[graft.lake.LakeTable]]
  * maintenance methods through Spark 4's ProcedureCatalog. Procedures
  * return no rows; their effect is a new metadata version. */
object GraftProcedures {

  val names: Seq[String] = Seq("rollback_to_snapshot", "cherrypick_snapshot",
    "expire_snapshots", "rewrite_data_files", "rewrite_manifests",
    "rewrite_blooms",
    "rewrite_position_deletes", "convert_equality_deletes",
    "rewrite_delete_files", "binpack", "auto_maintain", "export_scan",
    "add_files", "migrate", "attach_table", "detach_table",
    "fast_forward", "remove_orphan_files", "recover_transactions",
    "begin_transaction", "commit_transaction", "rollback_transaction",
    "clone_table",
    "ttl_expire", "list_transactions", "verify_table", "analyze_table",
    "create_branch", "drop_branch", "create_tag", "drop_tag",
    "build_ivf_index", "build_pq_index", "create_changelog_view",
    "create_vector_index", "refresh_vector_index", "rebuild_vector_index",
    "create_text_index", "refresh_text_index",
    "search_vector_index", "search_text_index")

  private def param(name: String, dt: DataType, default: Option[String] = None) = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  def load(lake: LakeCatalog, name: String): Option[UnboundProcedure] = name match {
    case "rollback_to_snapshot" => Some(proc(name,
      Array(param("table", StringType), param("snapshot_id", LongType)),
      row => lake.loadTable(row.getString(0)).rollbackTo(row.getLong(1))))
    case "cherrypick_snapshot" => Some(proc(name,
      Array(param("table", StringType), param("snapshot_id", LongType)),
      row => lake.loadTable(row.getString(0)).cherrypick(row.getLong(1))))
    case "analyze_table" => Some(proc(name,
      Array(param("table", StringType),
        param("columns", StringType, Some("''")),
        param("exact_ndv", BooleanType, Some("false")),
        param("incremental", BooleanType, Some("false"))),
      row => {
        val t = lake.loadTable(row.getString(0))
        if (!row.isNullAt(3) && row.getBoolean(3)) {
          // Incremental re-analyze merges the prior stamp's column set and
          // sketch mode; a caller also passing columns/exact_ndv would get
          // neither honored — fail loudly (ANALYZE's bad-column style)
          // rather than silently ignore the arguments.
          if (!row.isNullAt(1) && row.getString(1).nonEmpty)
            throw new IllegalArgumentException(
              "analyze_table: incremental => true re-analyzes the column set " +
              "of the prior stamp; the 'columns' argument is not honored — " +
              "run a full analyze_table(columns => ...) instead")
          if (!row.isNullAt(2) && row.getBoolean(2))
            throw new IllegalArgumentException(
              "analyze_table: incremental => true merges persisted HLL/KLL " +
              "sketches; 'exact_ndv => true' is not honored — run a full " +
              "analyze_table(exact_ndv => true) instead")
          graft.lake.Analyze.incremental(t)
        } else {
          val cols = if (row.isNullAt(1) || row.getString(1).isEmpty) Seq.empty[String]
                     else row.getString(1).split(",").toSeq.map(_.trim)
          t.analyzeTable(cols, exactNdv = !row.isNullAt(2) && row.getBoolean(2))
        }
      }))
    case "expire_snapshots" => Some(proc(name,
      Array(param("table", StringType),
        param("older_than", LongType, Some("-1")),
        param("retain_last", LongType, Some("1"))),
      row => {
        val olderThan =
          if (row.isNullAt(1) || row.getLong(1) < 0) System.currentTimeMillis()
          else row.getLong(1)
        val retain = if (row.isNullAt(2)) 1 else row.getLong(2).toInt
        lake.loadTable(row.getString(0)).expireSnapshots(olderThan, retain)
      }))
    case "rewrite_data_files" => Some(proc(name,
      Array(param("table", StringType),
        param("target_file_size_bytes", LongType, Some((512L * 1024 * 1024).toString)),
        param("sort_by", StringType, Some("''")),
        param("where", StringType, Some("''"))),
      row => {
        val target = if (row.isNullAt(1)) 512L * 1024 * 1024 else row.getLong(1)
        val sortBy =
          if (row.isNullAt(2) || row.getString(2).isEmpty) Seq.empty[String]
          else row.getString(2).split(",").toSeq.map(_.trim)
        // where: a full SQL predicate (r16, Iceberg's rewrite where) —
        // scopes the rewrite to files whose stats MAY match; content is
        // unchanged whatever the predicate (whole-file granularity)
        val where =
          if (row.isNullAt(3) || row.getString(3).isEmpty) None
          else Some(org.apache.spark.sql.functions.expr(row.getString(3)))
        lake.loadTable(row.getString(0))
          .rewriteDataFiles(target, sortBy, where = where)
      }))
    // selective small-files compaction (rewrite_data_files strategy=binpack
    // as its own named procedure): `where` scopes to a partition tuple
    // ("col=val[,col=val]"), `sort_by` keeps clustering through the pack
    case "binpack" => Some(proc(name,
      Array(param("table", StringType),
        param("target_file_size_bytes", LongType, Some((512L * 1024 * 1024).toString)),
        param("where", StringType, Some("''")),
        param("sort_by", StringType, Some("''"))),
      row => {
        val target = if (row.isNullAt(1)) 512L * 1024 * 1024 else row.getLong(1)
        val where =
          if (row.isNullAt(2) || row.getString(2).isEmpty) Map.empty[String, String]
          else graft.lake.LakeTable.parsePartitionWhere(row.getString(2))
        val sortBy =
          if (row.isNullAt(3) || row.getString(3).isEmpty) Seq.empty[String]
          else row.getString(3).split(",").toSeq.map(_.trim)
        lake.loadTable(row.getString(0)).binPack(target,
          partitionFilter = where, sortBy = sortBy)
      }))
    // full ingest-cadence maintenance (LakeTable.autoMaintain): binpack
    // every N commits + threshold-gated delete-mask upkeep; non-positive
    // args resolve from graft.maintenance.* TBLPROPERTIES so the policy
    // is SQL-configurable and travels with the table
    case "auto_maintain" => Some(proc(name,
      Array(param("table", StringType),
        param("every_commits", LongType, Some("-1")),
        param("max_eq_delete_files", LongType, Some("-1")),
        param("max_delete_files", LongType, Some("-1"))),
      row => {
        def i(idx: Int) = if (row.isNullAt(idx)) -1 else row.getLong(idx).toInt
        lake.loadTable(row.getString(0)).autoMaintain(
          everyCommits = i(1), maxEqDeleteFiles = i(2), maxDeleteFiles = i(3))
      }))
    // second-engine export (LakeTable.exportScan): writes the standalone
    // DuckDB view DDL for the current (or pinned) snapshot to a file —
    // the SQL-surface route to handing a scan to another engine
    case "export_scan" => Some(proc(name,
      Array(param("table", StringType),
        param("output", StringType),
        param("view_name", StringType, Some("''")),
        param("snapshot_id", LongType, Some("-1"))),
      row => {
        val t = lake.loadTable(row.getString(0))
        val snapId =
          if (row.isNullAt(3) || row.getLong(3) < 0) None else Some(row.getLong(3))
        val view =
          if (row.isNullAt(2) || row.getString(2).isEmpty)
            row.getString(0).replace('.', '_')
          else row.getString(2)
        val ddl = t.exportScan(snapId).viewDdl(view)
        val path = new org.apache.hadoop.fs.Path(row.getString(1))
        val fs = path.getFileSystem(
          lake.spark.sessionState.newHadoopConf())
        val out = fs.create(path, true)
        try out.write((ddl + "\n").getBytes("UTF-8")) finally out.close()
      }))
    case "rewrite_manifests" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake.loadTable(row.getString(0)).rewriteManifests()))
    // manifest-bloom coverage for files added without blooms (compaction
    // output, imports, pre-declaration appends)
    case "rewrite_blooms" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake.loadTable(row.getString(0)).rewriteBlooms()))
    case "rewrite_position_deletes" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake.loadTable(row.getString(0)).rewritePositionDeletes()))
    case "convert_equality_deletes" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake.loadTable(row.getString(0)).convertEqualityDeletes()))
    case "rewrite_delete_files" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake.loadTable(row.getString(0)).rewriteDeleteFiles()))
    // foreign-parquet import (LakeTable.addFiles): register existing
    // files as table data in place — footer stats, zero data movement
    case "add_files" => Some(proc(name,
      Array(param("table", StringType), param("source", StringType)),
      row => lake.loadTable(row.getString(0)).addFiles(row.getString(1))))
    // Iceberg migrate-shape import: derive the table from the files
    // (merged footer schema + hive key=value identity partitions), then
    // delegate to addFiles — no pre-declared schema needed
    case "migrate" => Some(proc(name,
      Array(param("table", StringType), param("source", StringType)),
      row => lake.migrate(row.getString(0), row.getString(1)).meta.name))
    // wire-catalog authority hand-over (r12): adopt an existing
    // filesystem table into the catalog service / release it back
    case "attach_table" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake match {
        case r: graft.lake.RemoteLakeCatalog => r.attachTable(row.getString(0)).meta.name
        case _ => throw new UnsupportedOperationException(
          "attach_table needs a wire catalog (spark.sql.catalog.<name>.uri)")
      }))
    case "detach_table" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake match {
        case r: graft.lake.RemoteLakeCatalog => r.detachTable(row.getString(0)).meta.name
        case _ => throw new UnsupportedOperationException(
          "detach_table needs a wire catalog (spark.sql.catalog.<name>.uri)")
      }))
    case "verify_table" => Some(proc(name,
      Array(param("table", StringType),
        param("view_name", StringType, Some("''"))),
      row => {
        val view = if (row.isNullAt(1) || row.getString(1).isEmpty)
          row.getString(0).replace('.', '_') + "_verify"
        else row.getString(1)
        val report = lake.loadTable(row.getString(0)).verifyIntegrity()
        report.createOrReplaceTempView(view)
        report.count()
      }))
    case "ttl_expire" => Some(proc(name,
      Array(param("table", StringType)),
      row => lake.loadTable(row.getString(0)).ttlExpire()))
    case "list_transactions" => Some(proc(name,
      Array(param("view_name", StringType, Some("'transactions'"))),
      row => {
        val view = if (row.isNullAt(0) || row.getString(0).isEmpty)
          "transactions" else row.getString(0)
        lake.listTransactions().createOrReplaceTempView(view)
      }))
    // SQL multi-table transactions (D40 via session-conf routing — see
    // [[graft.lake.SqlTransactions]]): begin pins `spark.graft.txn.id`;
    // every INSERT/UPDATE/DELETE/MERGE then stages on the txn branch and
    // reads-your-writes; commit publishes all-or-nothing or raises the
    // protocol's conflict error; rollback discards.
    case "begin_transaction" => Some(proc(name,
      Array(param("id", StringType, Some("''"))),
      row => {
        val id = if (row.isNullAt(0)) "" else row.getString(0)
        val txnId = graft.lake.SqlTransactions.begin(lake, id)
        System.err.println(s"[graft] transaction $txnId begun " +
          s"(session conf ${graft.lake.SqlTransactions.ConfKey})")
      }))
    case "commit_transaction" => Some(proc(name,
      Array.empty[ProcedureParameter],
      _ => graft.lake.SqlTransactions.commit(lake.spark)))
    case "rollback_transaction" => Some(proc(name,
      Array.empty[ProcedureParameter],
      _ => graft.lake.SqlTransactions.rollback(lake.spark)))
    // zero-copy shallow clone (Delta CLONE / Iceberg snapshot-procedure
    // shape): one metadata commit, data in place, GC-safe via clone
    // registration — see [[graft.lake.LakeCatalog.cloneTable]]
    case "clone_table" => Some(proc(name,
      Array(param("source", StringType), param("target", StringType),
        param("snapshot_id", LongType, Some("-1"))),
      row => {
        val asOf = if (row.isNullAt(2) || row.getLong(2) < 0) None
          else Some(row.getLong(2))
        lake.cloneTable(row.getString(0), row.getString(1), asOf)
      }))
    case "recover_transactions" => Some(proc(name,
      Array.empty[ProcedureParameter],
      _ => {
        val resolved = lake.recoverTransactions()
        if (resolved.nonEmpty) System.err.println(
          s"[graft] recovered transactions: " + resolved.map {
            case (id, outcome) => s"$id=$outcome" }.mkString(", "))
        resolved.size.toLong
      }))
    case "fast_forward" => Some(proc(name,
      Array(param("table", StringType), param("branch", StringType),
        param("to", StringType)),
      row => lake.loadTable(row.getString(0))
        .fastForward(row.getString(1), row.getString(2))))
    case "remove_orphan_files" => Some(proc(name,
      Array(param("table", StringType), param("older_than", LongType, Some("-1"))),
      row => {
        val cutoff =
          if (row.isNullAt(1) || row.getLong(1) < 0)
            System.currentTimeMillis() - 3600_000L
          else row.getLong(1)
        lake.loadTable(row.getString(0)).removeOrphanFiles(cutoff)
      }))
    // branch/tag DDL (D14, WAP….ipynb cells 16/60/71): the Iceberg spelling
    // is `ALTER TABLE … CREATE BRANCH`, which needs a parser extension; the
    // procedure form gives the same capability through stock SQL
    case "create_branch" => Some(proc(name,
      Array(param("table", StringType), param("branch", StringType),
        param("snapshot_id", LongType, Some("-1"))),
      row => {
        val at = if (row.isNullAt(2) || row.getLong(2) < 0) None else Some(row.getLong(2))
        lake.loadTable(row.getString(0)).createBranch(row.getString(1), at)
      }))
    case "drop_branch" => Some(proc(name,
      Array(param("table", StringType), param("branch", StringType)),
      row => lake.loadTable(row.getString(0)).dropBranch(row.getString(1))))
    case "create_tag" => Some(proc(name,
      Array(param("table", StringType), param("tag", StringType),
        param("snapshot_id", LongType, Some("-1"))),
      row => {
        val at = if (row.isNullAt(2) || row.getLong(2) < 0) None else Some(row.getLong(2))
        lake.loadTable(row.getString(0)).createTag(row.getString(1), at)
      }))
    case "drop_tag" => Some(proc(name,
      Array(param("table", StringType), param("tag", StringType)),
      row => lake.loadTable(row.getString(0)).dropTag(row.getString(1))))
    // IVF index build as a NAMED offline step (like rewrite_data_files):
    // k-means centroids + per-vector list assignment are computed once and
    // persisted — probes then pay only the bucket-pruned scan, never an
    // implicit query-time index build
    // persistent incremental IVF index (graft.operators.VectorIndex):
    // unlike build_ivf_index's one-shot aux table, this index is durable
    // (posting lists = identity partitions, centroids snapshot-pinned)
    // and maintained through the base changelog — refresh costs O(batch)
    case "create_vector_index" => Some(proc(name,
      Array(param("index", StringType),
        param("base_table", StringType),
        param("id_col", StringType, Some("'vec_id'")),
        param("vec_col", StringType, Some("'embedding'")),
        param("nlist", LongType, Some("16")),
        param("iters", LongType, Some("3")),
        param("include_cols", StringType, Some("''"))),
      row => {
        val idCol = if (row.isNullAt(2)) "vec_id" else row.getString(2)
        val vecCol = if (row.isNullAt(3)) "embedding" else row.getString(3)
        val nlist = if (row.isNullAt(4)) 16 else row.getLong(4).toInt
        val iters = if (row.isNullAt(5)) 3 else row.getLong(5).toInt
        // include_cols (CSV): covered attribute columns for filtered search
        val includes =
          if (row.isNullAt(6) || row.getString(6).isEmpty) Seq.empty[String]
          else row.getString(6).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        graft.operators.VectorIndex.create(lake, row.getString(0),
          lake.loadTable(row.getString(1)), idCol, vecCol, nlist, iters,
          includeCols = includes)
      }))
    case "refresh_vector_index" => Some(proc(name,
      Array(param("index", StringType)),
      row => graft.operators.VectorIndex.load(lake, row.getString(0)).refresh()))
    case "rebuild_vector_index" => Some(proc(name,
      Array(param("index", StringType),
        param("nlist", LongType, Some("0")),
        param("iters", LongType, Some("3"))),
      row => {
        val nlist = if (row.isNullAt(1)) 0 else row.getLong(1).toInt
        val iters = if (row.isNullAt(2)) 3 else row.getLong(2).toInt
        graft.operators.VectorIndex.load(lake, row.getString(0))
          .rebuild(nlist, iters)
      }))
    // persistent incremental BM25 text index (graft.operators.TextIndex):
    // postings = bucket[n](term) partitions, corpus constants delta-
    // maintained on the docs sibling — the text twin of the vector index
    case "create_text_index" => Some(proc(name,
      Array(param("index", StringType),
        param("base_table", StringType),
        param("id_col", StringType, Some("'doc_id'")),
        param("text_col", StringType, Some("'text'")),
        param("n_buckets", LongType, Some("32")),
        param("include_cols", StringType, Some("''"))),
      row => {
        val idCol = if (row.isNullAt(2)) "doc_id" else row.getString(2)
        val textCol = if (row.isNullAt(3)) "text" else row.getString(3)
        val nBuckets = if (row.isNullAt(4)) 32 else row.getLong(4).toInt
        // comma-separated covered columns for filtered search (q97 shape)
        val include =
          if (row.isNullAt(5)) Seq.empty
          else row.getString(5).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        graft.operators.TextIndex.create(lake, row.getString(0),
          lake.loadTable(row.getString(1)), idCol, textCol, nBuckets, include)
      }))
    case "refresh_text_index" => Some(proc(name,
      Array(param("index", StringType)),
      row => graft.operators.TextIndex.load(lake, row.getString(0)).refresh()))
    // SQL-facing index SEARCH (r14): procedures register the probe's
    // result as a temp view (the create_changelog_view pattern — Spark 4
    // procedures return no rows, so the view is the SQL result surface),
    // bit-identical to the Scala search by construction (it IS the Scala
    // search). `query` = CSV floats; `filter` = a SQL predicate over the
    // index's covered columns, evaluated BEFORE scoring.
    case "search_vector_index" => Some(proc(name,
      Array(param("index", StringType),
        param("query", StringType),
        param("k", LongType, Some("10")),
        param("nprobe", LongType, Some("4")),
        param("view_name", StringType, Some("''")),
        param("filter", StringType, Some("''"))),
      row => {
        val idx = graft.operators.VectorIndex.load(lake, row.getString(0))
        val qv = row.getString(1).split(",").toSeq.map(_.trim.toFloat)
        val k = if (row.isNullAt(2)) 10 else row.getLong(2).toInt
        val nprobe = if (row.isNullAt(3)) 4 else row.getLong(3).toInt
        val view =
          if (row.isNullAt(4) || row.getString(4).isEmpty)
            row.getString(0).replace('.', '_') + "_search"
          else row.getString(4)
        val pred =
          if (row.isNullAt(5) || row.getString(5).isEmpty) None
          else Some(org.apache.spark.sql.functions.expr(row.getString(5)))
        idx.search(qv, k, nprobe, pred).createOrReplaceTempView(view)
      }))
    // `queries` = one query per ';'-separated group of whitespace terms;
    // qid = the group's 1-based position (matching the Scala
    // TextIndex.search (qid, term) pairs it expands to).
    case "search_text_index" => Some(proc(name,
      Array(param("index", StringType),
        param("queries", StringType),
        param("k", LongType, Some("5")),
        param("view_name", StringType, Some("''")),
        param("filter", StringType, Some("''"))),
      row => {
        val idx = graft.operators.TextIndex.load(lake, row.getString(0))
        val qs = row.getString(1).split(";").toSeq.map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.flatMap { case (q, i) =>
            q.split("\\s+").toSeq.filter(_.nonEmpty).map(t => (i + 1, t))
          }
        require(qs.nonEmpty, "search_text_index needs at least one term")
        val k = if (row.isNullAt(2)) 5 else row.getLong(2).toInt
        val view =
          if (row.isNullAt(3) || row.getString(3).isEmpty)
            row.getString(0).replace('.', '_') + "_search"
          else row.getString(3)
        // SQL predicate over the covered doc columns (includeCols at
        // create_text_index) — same semantics as the Scala filter
        val pred =
          if (row.isNullAt(4) || row.getString(4).isEmpty) None
          else Some(org.apache.spark.sql.functions.expr(row.getString(4)))
        idx.search(qs, k, pred).createOrReplaceTempView(view)
      }))
    case "build_ivf_index" => Some(proc(name,
      Array(param("table", StringType),
        param("vector_col", StringType, Some("'embedding'")),
        param("id_col", StringType, Some("'vec_id'")),
        param("nlist", LongType, Some("16")),
        param("iters", LongType, Some("3"))),
      row => {
        val tName = row.getString(0)
        val vecCol = if (row.isNullAt(1)) "embedding" else row.getString(1)
        val idCol = if (row.isNullAt(2)) "vec_id" else row.getString(2)
        val nlist = if (row.isNullAt(3)) 16 else row.getLong(3).toInt
        val iters = if (row.isNullAt(4)) 3 else row.getLong(4).toInt
        val t = lake.loadTable(tName)
        val df = t.toDF
        val (assigned, centroids) =
          graft.operators.Similarity.ivfAssign(df, nlist, iters, idCol, vecCol)
        // assignment lands in the aux table <table>_ivf_index; centroids in
        // the source table's properties (nlist×dim floats — small)
        val aux = s"${tName}_ivf_index"
        if (lake.tableExists(aux)) lake.dropTable(aux)
        val auxT = lake.createTable(aux, StructType(Seq(
          StructField(idCol, df.schema(idCol).dataType),
          StructField("list_id", IntegerType))))
        auxT.append(assigned.select(idCol, "list_id"))
        t.setProperties(Map(
          "ivf.vector-col" -> vecCol,
          "ivf.nlist" -> nlist.toString,
          "ivf.centroids" -> centroids.map(_.mkString("[", ",", "]"))
            .mkString("[", ",", "]")))
      }))
    // PQ index build (graft.operators.ProductQuantization): trains the
    // per-subspace codebooks and writes the compressed representation as
    // the aux table <table>_pq_index (idCol, norm FLOAT, codes
    // ARRAY<TINYINT>); codebooks ride in the source table's properties
    // (m×k×subDim floats — small). Consumers score with adcDot/adcCosine
    // against the aux table, touching only code bytes.
    case "build_pq_index" => Some(proc(name,
      Array(param("table", StringType),
        param("dim", LongType),
        param("vector_col", StringType, Some("'embedding'")),
        param("id_col", StringType, Some("'vec_id'")),
        param("m", LongType, Some("16")),
        param("k", LongType, Some("16")),
        param("iters", LongType, Some("3"))),
      row => {
        val tName = row.getString(0)
        val dim = row.getLong(1).toInt
        val vecCol = if (row.isNullAt(2)) "embedding" else row.getString(2)
        val idCol = if (row.isNullAt(3)) "vec_id" else row.getString(3)
        val m = if (row.isNullAt(4)) 16 else row.getLong(4).toInt
        val k = if (row.isNullAt(5)) 16 else row.getLong(5).toInt
        val iters = if (row.isNullAt(6)) 3 else row.getLong(6).toInt
        val t = lake.loadTable(tName)
        val df = t.toDF
        import graft.operators.ProductQuantization
        import org.apache.spark.sql.functions.col
        val cb = ProductQuantization.train(df, dim, m, k, iters, idCol, vecCol)
        val aux = s"${tName}_pq_index"
        if (lake.tableExists(aux)) lake.dropTable(aux)
        val auxT = lake.createTable(aux, StructType(Seq(
          StructField(idCol, df.schema(idCol).dataType),
          StructField("norm", FloatType),
          StructField("codes", ArrayType(ByteType)))))
        val enc = ProductQuantization.encodeTable(df, cb, vecCol)
        auxT.append(enc.select(col(idCol), col("pq.norm").as("norm"),
          col("pq.codes").as("codes")))
        t.setProperties(Map(
          "pq.vector-col" -> vecCol,
          "pq.m" -> m.toString, "pq.k" -> k.toString,
          "pq.sub-dim" -> cb.subDim.toString,
          "pq.codebooks" -> cb.books.map(_.map(_.mkString("[", ",", "]"))
            .mkString("[", ",", "]")).mkString("[", ",", "]")))
      }))
    // Iceberg's create_changelog_view spelling AND output contract:
    // register the row-level CDC diff ([[graft.lake.LakeTable.changelog]])
    // as a temp view with `_change_type` INSERT|DELETE|UPDATE_BEFORE|
    // UPDATE_AFTER, `_change_ordinal`, `_commit_snapshot_id` — SQL ported
    // from Iceberg docs runs unchanged. `identifier_columns` (CSV) turns
    // on compute-updates pairing, like Iceberg's identifier-field mode
    case "create_changelog_view" => Some(proc(name,
      Array(param("table", StringType),
        param("start_snapshot", LongType, Some("-1")),
        param("end_snapshot", LongType, Some("-1")),
        param("view_name", StringType, Some("''")),
        param("identifier_columns", StringType, Some("''"))),
      row => {
        val tName = row.getString(0)
        val t = lake.loadTable(tName)
        val from = if (row.isNullAt(1) || row.getLong(1) < 0) None else Some(row.getLong(1))
        val to =
          if (row.isNullAt(2) || row.getLong(2) < 0)
            t.meta.currentSnapshot.map(_.snapshotId).getOrElse(
              throw new IllegalArgumentException(s"$tName has no snapshots to diff"))
          else row.getLong(2)
        val view =
          if (row.isNullAt(3) || row.getString(3).isEmpty)
            tName.replace('.', '_') + "_changes"
          else row.getString(3)
        val idCols =
          if (row.isNullAt(4) || row.getString(4).isEmpty) Seq.empty[String]
          else row.getString(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        t.changelog(from, to, idCols).createOrReplaceTempView(view)
      }))
    case _ => None
  }

  private def proc(procName: String, params: Array[ProcedureParameter],
                   body: InternalRow => Any): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft lake procedure $procName"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"graft lake procedure $procName"
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          body(input)
          Collections.emptyIterator[Scan]()
        }
      }
    }
}
