package graft.lake

import graft.lake.catalog.CatalogServer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Catalog-as-a-service across a wire (r11): the engine resolves
  * versions, chunks, and COMMITS through [[CatalogServer]] over HTTP
  * while data files go straight to shared storage — the reference's
  * REST-catalog boundary (docker-compose.yml:35-48). The honesty of the
  * wire claim is STRUCTURAL: the server's metadata root is a private
  * directory disjoint from the warehouse, so a client that can read the
  * table has provably fetched every metadata byte over the protocol —
  * the table location contains NO metadata directory at all. */
class CatalogServiceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def newEnv(): (CatalogServer, String, String) = {
    val metaRoot = Files.createTempDirectory("graft-cat-meta").toString
    val warehouse = Files.createTempDirectory("graft-cat-wh").toString
    (new CatalogServer(metaRoot).start(), metaRoot, warehouse)
  }

  test("full table lifecycle through the wire; zero metadata under the table location") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.wt", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t.append(Seq((3L, "c")).toDF("id", "v"))
      val snap1 = t.meta.snapshots.head.snapshotId
      t.delete(col("id") === 2L)
      // reads resolve through the wire; data comes from the warehouse
      assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
      // time travel still works — versions are served, not local
      assert(t.read(snapshotId = Some(snap1)).count() === 2)
      // THE structural proof: table location holds data only, all
      // metadata lives under the server's private root
      assert(!Files.exists(Paths.get(warehouse, "db", "wt", "metadata")),
        "no metadata may exist under the table location in wire mode")
      assert(Files.exists(Paths.get(metaRoot, "db", "wt", "v1.json")))
      assert(Files.list(Paths.get(metaRoot, "db", "wt")).count() >= 4)
      // metadata_log_entries stats each version via the /stat endpoint
      // (one round trip per file, not a listing per lookup — r12)
      assert(MetadataTables(t, "metadata_log_entries").count() >= 4)
      // path-mode addressing with an explicit authority (r12): the
      // DataSource reconstructs the table from string options — uri +
      // ident — and resolves snapshots over the wire
      assert(spark.read.format("graft")
        .option("uri", srv.uri).option("ident", "db.wt")
        .load(s"$warehouse/db/wt").count() === 2)
      // a SECOND client handle (fresh caches) resolves by uri alone
      val cat2 = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      assert(cat2.listTables("db") === Seq("wt"))
      assert(cat2.loadTable("db.wt").toDF.count() === 2)
      // racing CREATE of the same ident: exactly one winner
      val e = intercept[Exception](cat2.createTable("db.wt", StructType(Seq(
        StructField("id", LongType)))))
      assert(e.getMessage.contains("already exists"))
      // DROP clears both authorities
      cat.dropTable("db.wt")
      assert(!cat2.tableExists("db.wt"))
      assert(!Files.exists(Paths.get(metaRoot, "db", "wt", "v1.json")))
    } finally srv.stop()
  }

  test("secondary indexes over the wire: create, routing refresh, and " +
    "search resolve every metadata byte through the catalog service") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      def txt(i: Long) = s"alpha beta w$i gamma w${i % 7}"
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val base = cat.createTable("db.corpus", docSchema)
      base.append((0L until 40L).map(i => (i, txt(i))).toDF("doc_id", "text"))
      graft.operators.TextIndex.create(cat, "db.tidx", base, nBuckets = 4)
      // structural wire proof for all three tables: postings and the docs
      // sibling hold ZERO metadata under the warehouse
      for (t <- Seq("corpus", "tidx", "tidx_docs")) {
        assert(!Files.exists(Paths.get(warehouse, "db", t, "metadata")),
          s"wire table $t must keep no filesystem metadata")
        assert(Files.exists(Paths.get(metaRoot, "db", t, "v1.json")))
      }
      // churn + the ingest loop's routing entry point: the registered
      // index resolves THROUGH the wire base (sibling authority stays
      // wire) and catches up
      base.append((40L until 60L).map(i => (i, txt(i))).toDF("doc_id", "text"))
      graft.streaming.Changelog.refreshRegisteredIndexes(base)
      val reloaded = graft.operators.TextIndex.load(cat, "db.tidx")
      assert(reloaded.watermark === base.meta.currentSnapshot.map(_.snapshotId))
      // bit parity: the wire index answers exactly like a filesystem
      // index built fresh over the same corpus
      val queries = Seq(1 -> "alpha", 1 -> "w3", 2 -> "gamma")
      val fsCat = new LakeCatalog(spark,
        Files.createTempDirectory("graft-wirefs").toString)
      val fsBase = fsCat.createTable("db.corpus", docSchema)
      fsBase.append((0L until 60L).map(i => (i, txt(i))).toDF("doc_id", "text"))
      val fsIdx = graft.operators.TextIndex.create(fsCat, "db.tidx", fsBase,
        nBuckets = 4)
      assert(reloaded.search(queries, 5).collect().toSeq ===
        fsIdx.search(queries, 5).collect().toSeq)
      // the `indexes` metadata table resolves the sibling over the wire
      val listing = MetadataTables(cat.loadTable("db.corpus"), "indexes").collect()
      assert(listing.length === 1 && listing.head.getString(2) === "text"
        && listing.head.getBoolean(5))
      // drop through the wire removes both tables and the registration
      graft.operators.TextIndex.drop(cat, "db.tidx")
      assert(!cat.tableExists("db.tidx") && !cat.tableExists("db.tidx_docs"))
      assert(!base.meta.properties.contains("graft.tindex.indexes"))
    } finally srv.stop()
  }

  test("vector index over the wire: create, routing refresh, filtered and " +
    "full-probe search bit-match a filesystem index; zero warehouse metadata") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      // deterministic clustered vectors (same shape as VectorIndexSpec)
      def vec(id: Long): Seq[Float] = {
        val c = (id % 5).toInt
        (0 until 8).map { d =>
          (if (d == c) 10f else 0f) + ((id * 2654435761L + d * 97) % 7).toFloat * 0.1f
        }
      }
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      def df(s: SparkSession, ids: Seq[Long]) = s.createDataFrame(
        java.util.Arrays.asList(ids.map(i =>
          org.apache.spark.sql.Row(i, vec(i), (i % 3).toInt)): _*), schema)
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val base = cat.createTable("db.vecs", schema)
      base.append(df(spark, 0L until 40L))
      val idx = graft.operators.VectorIndex.create(cat, "db.vidx", base,
        "id", "embedding", nlist = 4, iters = 2, includeCols = Seq("label"))
      // structural wire proof for all three tables
      for (t <- Seq("vecs", "vidx", "vidx_centroids")) {
        assert(!Files.exists(Paths.get(warehouse, "db", t, "metadata")),
          s"wire table $t must keep no filesystem metadata")
        assert(Files.exists(Paths.get(metaRoot, "db", t, "v1.json")))
      }
      // churn through the ingest loop's routing entry point: the sibling
      // authority stays wire, the index catches up to the base head
      base.append(df(spark, 40L until 60L))
      graft.streaming.Changelog.refreshRegisteredIndexes(base)
      val reloaded = graft.operators.VectorIndex.load(cat, "db.vidx")
      assert(reloaded.watermark === base.meta.currentSnapshot.map(_.snapshotId))
      assert(reloaded.state.toDF.count() === 60)
      // bit parity at full probe (exactness gate — centroid layouts may
      // differ between the two indexes, full probe cancels that): the
      // wire index answers exactly like a filesystem index built fresh
      // over the same 60 vectors, filtered search included
      val fsCat = new LakeCatalog(spark,
        Files.createTempDirectory("graft-wirevec").toString)
      val fsBase = fsCat.createTable("db.vecs", schema)
      fsBase.append(df(spark, 0L until 60L))
      val fsIdx = graft.operators.VectorIndex.create(fsCat, "db.vidx", fsBase,
        "id", "embedding", nlist = 4, iters = 2, includeCols = Seq("label"))
      val q = vec(7L)
      def hits(i: graft.operators.VectorIndex,
               filter: Option[org.apache.spark.sql.Column]) =
        i.search(q, k = 10, nprobe = 4, filter = filter)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(hits(reloaded, None) === hits(fsIdx, None))
      assert(hits(reloaded, Some(col("label") === 1)) ===
        hits(fsIdx, Some(col("label") === 1)))
      // the `indexes` metadata table resolves the sibling over the wire
      val listing = MetadataTables(cat.loadTable("db.vecs"), "indexes").collect()
      assert(listing.length === 1 && listing.head.getString(2) === "vector"
        && listing.head.getBoolean(5))
      // drop through the wire removes both tables and the registration
      graft.operators.VectorIndex.drop(cat, "db.vidx")
      assert(!cat.tableExists("db.vidx") && !cat.tableExists("db.vidx_centroids"))
      assert(!base.meta.properties.contains("graft.vindex.indexes"))
    } finally srv.stop()
  }

  test("deletion vectors over the wire: refs ride the served delete manifest, " +
    "bundles stay data-plane, masked reads probe without a join") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.dvw", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
      t.append((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
      t.delete(col("id") === 7L)
      t.delete(col("id") === 8L)
      // refs committed through the wire authority; bundle bytes in the
      // warehouse (data plane), ZERO metadata under the table location
      val dels = t.meta.currentSnapshot.get.deleteFiles
      assert(dels.size === 2 && dels.forall(d => d.vectors.keySet == d.counts.keySet))
      dels.flatMap(_.vectors.values).foreach { r =>
        assert(r.bundle.contains(warehouse), s"bundle must live in the warehouse: ${r.bundle}")
        assert(Files.exists(Paths.get(
          new org.apache.hadoop.fs.Path(r.bundle).toUri.getPath)))
      }
      assert(!Files.exists(Paths.get(warehouse, "db", "dvw", "metadata")))
      // a FRESH client (metadata only via the server) reads through the probe
      val cat2 = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val df = cat2.loadTable("db.dvw").toDF
      assert(df.count() === 98L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dv_is_deleted") && !plan.toLowerCase.contains("join"), plan)
    } finally srv.stop()
  }

  test("SQL surface: a catalog configured with uri runs DDL/DML/reads through the service") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      spark.conf.set("spark.sql.catalog.rlake", classOf[graft.lake.dsv2.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.rlake.warehouse", warehouse)
      spark.conf.set("spark.sql.catalog.rlake.uri", srv.uri)
      org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
      spark.sql("CREATE DATABASE IF NOT EXISTS rlake.db")
      spark.sql("CREATE TABLE rlake.db.st (g STRING, v BIGINT)")
      spark.sql("INSERT INTO rlake.db.st VALUES ('a', 1), ('b', 2)")
      assert(spark.sql("SELECT sum(v) FROM rlake.db.st").head.getLong(0) === 3L)
      assert(Files.exists(Paths.get(metaRoot, "db", "st", "v1.json")),
        "SQL DDL must have committed through the service")
      assert(!Files.exists(Paths.get(warehouse, "db", "st", "metadata")))
      spark.sql("DROP TABLE rlake.db.st")
    } finally {
      srv.stop()
      spark.conf.unset("spark.sql.catalog.rlake.uri")
    }
  }

  test("8 writers racing commits through the service: linear history, no commit lost") {
    val (srv, _, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      cat.createTable("db.race", StructType(Seq(
        StructField("id", LongType), StructField("src", StringType))))
      val writers = 8; val perWriter = 4
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until writers).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            // each writer its own handle — no shared version cache
            val t = new RemoteLakeCatalog(spark, warehouse, srv.uri).loadTable("db.race")
            (0 until perWriter).foreach { i =>
              t.append(Seq((w * 100L + i, s"w$w-$i")).toDF("id", "src"))
            }
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
      val t = cat.loadTable("db.race")
      assert(t.toDF.count() === (writers * perWriter).toLong)
      assert(t.toDF.select("src").distinct().count() === (writers * perWriter).toLong)
      // linear history: versions 1..N, one per commit, no gaps
      val versions = t.metadataVersions.map(_._1)
      assert(versions === (1 to (writers * perWriter + 1)))
    } finally srv.stop()
  }

  test("streaming CDC ingest commits every micro-batch through the service") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      // the streaming checkpoint manager keeps the test snappy (see
      // ChangelogSpec — FileContext forks readlink per rename otherwise)
      spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.ing", StructType(Seq(
        StructField("block_number", IntegerType),
        StructField("hash", StringType),
        StructField("timestamp", TimestampType))))
      val mem = MemoryStream[String]
      val parsed = graft.streaming.Changelog.parseCsvLines(mem.toDF())
      val ckpt = Files.createTempDirectory("graft-wire-ckpt").toString
      val q = graft.streaming.Changelog.startIngest(t, parsed,
        "block_number", "timestamp", ckpt, triggerMs = 200L)
      try {
        mem.addData("I,1,aa", "I,2,bb")
        q.processAllAvailable()
        mem.addData("D,1,aa", "I,3,cc")
        q.processAllAvailable()
        assert(t.toDF.orderBy("block_number").collect().map(_.getInt(0)).toSeq
          === Seq(2, 3))
        // every batch's merge committed through the wire: versions exist
        // on the server, none under the table location
        assert(Files.list(Paths.get(metaRoot, "db", "ing")).count() >= 3)
        assert(!Files.exists(Paths.get(warehouse, "db", "ing", "metadata")))
      } finally q.stop()
    } finally srv.stop()
  }

  test("MV surface over the wire: SQL create/route/refresh/listing with zero " +
      "metadata under the warehouse (r12)") {
    val (srv, metaRoot, warehouse) = newEnv()
    // routing needs GraftExtensions — build a dedicated session (create(),
    // not getOrCreate: a shared session would lack the routing rule) and
    // restore the default/active slots for later suites
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .create()
    prevDefault match {
      case Some(d) => SparkSession.setDefaultSession(d)
      case None => SparkSession.clearDefaultSession()
    }
    prevActive match {
      case Some(a) => SparkSession.setActiveSession(a)
      case None => SparkSession.clearActiveSession()
    }
    try {
      s.conf.set("spark.sql.catalog.rmv", classOf[graft.lake.dsv2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.rmv.warehouse", warehouse)
      s.conf.set("spark.sql.catalog.rmv.uri", srv.uri)
      org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(s)
      s.sql("CREATE DATABASE IF NOT EXISTS rmv.db")
      s.sql("CREATE TABLE rmv.db.mb (g STRING, v BIGINT)")
      s.sql("INSERT INTO rmv.db.mb VALUES ('a', 1), ('a', 2), ('b', 10)")
      s.sql("""CREATE MATERIALIZED VIEW rmv.db.mmv AS
              |SELECT g, COUNT(*) AS n, sum(v) AS t
              |FROM rmv.db.mb GROUP BY g""".stripMargin)
      def run(q: String) = {
        val df = s.sql(q)
        (df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq,
          !df.queryExecution.executedPlan.toString.contains("Aggregate"))
      }
      val q = "SELECT g, count(*) AS n, sum(v) AS t FROM rmv.db.mb GROUP BY g ORDER BY g"
      val (rows1, routed1) = run(q)
      assert(routed1, "a fresh view must answer with zero aggregation in uri mode")
      assert(rows1 === Seq(("a", 2L, 3L), ("b", 1L, 10L)))
      // the listing resolves the state table through the base's authority
      val listing = s.sql(
        "SELECT view, fresh, refresh_failures FROM rmv.db.mb.materialized_views").collect()
      assert(listing.exists(r => r.getString(0) == "db.mmv" && r.getBoolean(1)
        && r.getLong(2) == 0L), listing.mkString(","))
      // stale: rows stay correct (compensation aggregates the churn);
      // wire REFRESH restores the zero-aggregation route
      s.sql("INSERT INTO rmv.db.mb VALUES ('c', 7), ('b', 5)")
      val (rows2, routed2) = run(q)
      assert(!routed2 && rows2 === Seq(("a", 2L, 3L), ("b", 2L, 15L), ("c", 1L, 7L)))
      s.sql("REFRESH MATERIALIZED VIEW rmv.db.mmv")
      val (rows3, routed3) = run(q)
      assert(routed3, "a refreshed view must route again over the wire")
      assert(rows3 === rows2)
      // THE structural proof: base AND state metadata live only on the server
      assert(!Files.exists(Paths.get(warehouse, "db", "mb", "metadata")))
      assert(!Files.exists(Paths.get(warehouse, "db", "mmv", "metadata")))
      assert(Files.exists(Paths.get(metaRoot, "db", "mmv", "v1.json")))
      // DROP deregisters through the state table's authority (the base's
      // routing index is an RMW on the SERVER's copy, not a local file)
      s.sql("DROP MATERIALIZED VIEW rmv.db.mmv")
      val (rows4, routed4) = run(q)
      assert(!routed4 && rows4 === rows2)
    } finally srv.stop() // the session shares the JVM-wide SparkContext — never stop it
  }

  test("streaming auto-refresh resolves MV state over the wire (r12)") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.sb", StructType(Seq(
        StructField("block_number", IntegerType),
        StructField("hash", StringType),
        StructField("timestamp", TimestampType))))
      MaterializedAgg.create(cat, "db.sb_agg", t,
        Seq("hash"), Seq(MaterializedAgg.AggCol("count", "*", "n")))
      val mem = MemoryStream[String]
      val parsed = graft.streaming.Changelog.parseCsvLines(mem.toDF())
      val ckpt = Files.createTempDirectory("graft-wire-mv-ckpt").toString
      val q = graft.streaming.Changelog.startIngest(t, parsed,
        "block_number", "timestamp", ckpt, triggerMs = 200L, refreshViews = true)
      try {
        mem.addData("I,1,aa", "I,2,aa", "I,3,bb")
        q.processAllAvailable()
        val mv = MaterializedAgg.load(cat, "db.sb_agg")
        assert(mv.watermark === t.meta.currentSnapshot.map(_.snapshotId),
          "per-batch refresh must have tracked the stream head over the wire")
        assert(mv.read().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          === Map("aa" -> 2L, "bb" -> 1L))
        // refresh committed through the service, nothing on the filesystem
        assert(!Files.exists(Paths.get(warehouse, "db", "sb_agg", "metadata")))
        assert(Files.list(Paths.get(metaRoot, "db", "sb_agg")).count() >= 2)
      } finally q.stop()
    } finally srv.stop()
  }

  test("streaming changelog read-back resolves snapshots over the wire (r12)") {
    val (srv, _, warehouse) = newEnv()
    try {
      import spark.implicits._
      spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.sr", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val ckpt = Files.createTempDirectory("graft-wire-read-ckpt").toString
      val q = graft.streaming.Changelog.streamChangelog(t).writeStream
        .format("memory").queryName("wire_cdc")
        .option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        assert(spark.table("wire_cdc").count() === 2)
        // a post-start commit is discovered through the SERVER (no
        // metadata exists under the location to poll)
        t.delete(col("id") === 1L)
        q.processAllAvailable()
        val rows = spark.table("wire_cdc").select("id", "_change_type")
          .as[(Long, String)].collect().toSet
        assert(rows === Set((1L, "INSERT"), (2L, "INSERT"), (1L, "DELETE")))
        assert(!Files.exists(Paths.get(warehouse, "db", "sr", "metadata")))
      } finally q.stop()
    } finally srv.stop()
  }

  test("multi-table transactions over the wire: manifest/decision slots are " +
    "server-side conditional puts, publish is all-or-nothing, and a dead " +
    "coordinator's transaction rolls forward with zero warehouse metadata") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      def df(rows: (Long, String)*) = rows.toDF("id", "v")
      def ids(t: LakeTable) =
        t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val a = cat.createTable("db.wa", schema)
      val b = cat.createTable("db.wb", schema)
      a.append(df(1L -> "a")); b.append(df(2L -> "b"))
      // happy path through the wire protocol end-to-end
      val t1 = cat.beginTransaction()
      t1.table("db.wa").append(df(5L -> "n"))
      t1.table("db.wb").delete(col("id") === 2L)
      t1.commit()
      assert(ids(a) === Seq(1L, 5L) && ids(b) === Seq())
      // the structural wire proof extends to the TRANSACTION LOG: the
      // warehouse holds no metadata for the tables NOR for _system/txnlog
      for (p <- Seq("db/wa/metadata", "db/wb/metadata", "_system")) {
        assert(!Files.exists(Paths.get(warehouse, p)),
          s"wire mode must keep no filesystem metadata at $p")
      }
      assert(Files.list(Paths.get(metaRoot, "_system", "txnlog")).count() >= 3,
        "manifest + decision + done must live in the server's private root")
      // `_system` stays invisible to the namespace surface
      assert(!cat.listNamespaces().contains("_system"))
      // coordinator death AFTER the decision, zero publishes: a foreign
      // commit on one participant (TTL elapsed) rolls the transaction
      // forward on BOTH — entirely over the wire
      a.setProperties(Map(LakeTransaction.FenceTtlKey -> "0"))
      b.setProperties(Map(LakeTransaction.FenceTtlKey -> "0"))
      val t2 = cat.beginTransaction()
      t2.table("db.wa").append(df(7L -> "x"))
      t2.table("db.wb").append(df(8L -> "y"))
      val parts = t2.participants
      t2.writeManifest(parts); t2.fenceAll(parts)
      assert(t2.decide("commit"))
      b.append(df(9L -> "z")) // blocked → recovers the whole transaction
      assert(ids(a) === Seq(1L, 5L, 7L), "other participant rolled forward")
      assert(ids(b) === Seq(8L, 9L))
      assert(cat.recoverTransactions() === Map.empty, "log finalized")
    } finally srv.stop()
  }

  test("verify_table over the wire: the fsck resolves metadata existence " +
    "through the service and data bytes on shared storage") {
    val (srv, _, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.vt", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
      t.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))
      assert(t.verifyIntegrity().count() === 0, "clean wire table is clean")
      // remove a DATA file behind the table's back (data plane is shared
      // storage, not the server) — the report names it precisely
      val victim = t.meta.currentSnapshot.get.files.head.path
      Files.delete(Paths.get(victim.stripPrefix("file:")))
      val report = t.verifyIntegrity().collect()
      assert(report.length === 1 && report.head.getString(0) === "data"
        && report.head.getString(1) === victim
        && report.head.getString(2) === "missing")
    } finally srv.stop()
  }

  test("zero-copy clone over the wire (r15): the clone's metadata — " +
    "manifest chunks AND copied bloom bundles — lands server-side, data " +
    "stays in place on shared storage, and the source's GC spares the " +
    "clone's bytes through the wire-resolved registration") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val src = cat.createTable("db.cs", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))),
        properties = Map("graft.bloom.columns" -> "v"))
      src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
      src.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))
      val t = cat.cloneTable("db.cs", "db.ct")
      assert(t.toDF.orderBy("id").collect().map(_.getLong(0)).toSeq ===
        Seq(1L, 2L, 3L))
      // structural wire proof: the clone has ZERO metadata under its
      // location; its chunks + copied bloom bundles live at the server
      assert(!Files.exists(Paths.get(warehouse, "db", "ct", "metadata")))
      assert(Files.exists(Paths.get(metaRoot, "db", "ct", "v1.json")))
      val serverObjs = {
        val st = Files.list(Paths.get(metaRoot, "db", "ct"))
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      }
      assert(serverObjs.exists(_.startsWith("manifest-")), "chunks server-side")
      assert(serverObjs.exists(_.startsWith("bloom-")), "bloom bundles copied server-side")
      assert(t.verifyIntegrity().count() === 0, "fsck-clean from birth")
      // hostile source GC through the wire: clone bytes must survive
      src.delete(col("id") === 1L)
      src.expireSnapshots(System.currentTimeMillis() + 3600000L, retainLast = 1)
      src.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 3600000L)
      assert(t.toDF.count() === 3, "clone survives wire-mode source GC")
      assert(t.verifyIntegrity().count() === 0)
      // drop refused while the clone lives; freed after
      intercept[IllegalStateException](cat.dropTable("db.cs"))
      cat.dropTable("db.ct")
      cat.dropTable("db.cs")
      assert(!cat.tableExists("db.cs") && !cat.tableExists("db.ct"))
    } finally srv.stop()
  }

  test("maintenance over the wire: expire/rewrite_manifests/binpack commit through " +
      "the service — chunk deletes server-side, data-file GC client-side (r12)") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.mt", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      (0 until 4).foreach(i =>
        t.append(Seq((i.toLong, s"r$i")).toDF("id", "v")))
      def serverFiles: Set[String] = {
        val dir = Paths.get(metaRoot, "db", "mt")
        val st = Files.list(dir)
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      }
      def dataFiles: Set[String] = {
        val dir = Paths.get(warehouse, "db", "mt", "data")
        if (!Files.exists(dir)) Set.empty
        else {
          val st = Files.list(dir)
          try st.iterator().asScala.map(_.getFileName.toString).toSet
          finally st.close()
        }
      }
      // compact 4 one-row files into 1 (replace snapshot over the wire)
      t.rewriteDataFiles()
      assert(t.toDF.count() === 4)
      val dataBefore = dataFiles
      val serverBefore = serverFiles
      // expire everything but the compacted head: the 4 small files are
      // CLIENT-side deletes on shared storage; the dropped snapshots'
      // manifest chunks are SERVER-side deletes through the protocol
      t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
      assert(t.toDF.count() === 4, "expire must not change the presented rows")
      val dataAfter = dataFiles
      assert(dataAfter.size < dataBefore.size,
        s"pre-compaction files must be GC'd from the warehouse: $dataBefore -> $dataAfter")
      val serverAfter = serverFiles
      assert((serverBefore -- serverAfter).exists(!_.startsWith("v")),
        s"expire must delete dead manifest chunks ON THE SERVER: " +
          s"${(serverBefore -- serverAfter).mkString(",")}")
      // rewrite_manifests commits a new chunk layout through the service
      (0 until 3).foreach(i =>
        t.append(Seq((100L + i, s"m$i")).toDF("id", "v")))
      t.rewriteManifests()
      assert(t.toDF.count() === 7)
      // orphan sweep: a stray data file (client-side bytes) goes away
      val stray = Paths.get(warehouse, "db", "mt", "data", "stray.parquet")
      Files.write(stray, Array[Byte](1, 2, 3))
      val removed = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
      assert(!Files.exists(stray) &&
        removed.exists(_.endsWith("stray.parquet")))
      // the whole tier ran with zero metadata under the table location
      assert(!Files.exists(Paths.get(warehouse, "db", "mt", "metadata")))
    } finally srv.stop()
  }

  test("wire-mode DROP completeness: table drop clears server metadata AND " +
      "warehouse bytes; cascade namespace drop leaves no server orphans (r12)") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("dc.t1", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t.append(Seq((1L, "a")).toDF("id", "v"))
      cat.createTable("dc.t2", StructType(Seq(StructField("id", LongType))))
      assert(Files.exists(Paths.get(warehouse, "dc", "t1", "data")))
      cat.dropTable("dc.t1")
      assert(!Files.exists(Paths.get(metaRoot, "dc", "t1")) ||
        Files.list(Paths.get(metaRoot, "dc", "t1")).count() === 0,
        "drop must clear the server-side metadata")
      assert(!Files.exists(Paths.get(warehouse, "dc", "t1")),
        "drop must clear the warehouse data directory")
      assert(cat.listTables("dc") === Seq("t2"))
      // cascade namespace drop: t2 has never written data (no warehouse
      // dir) — its server metadata must still be dropped, not orphaned
      val sqlCat = new graft.lake.dsv2.GraftCatalog()
      sqlCat.initialize("dcat", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("warehouse", warehouse, "uri", srv.uri)))
      assert(sqlCat.dropNamespace(Array("dc"), true))
      assert(!cat.tableExists("dc.t2"), "cascade must drop through the catalog")
      assert(!Files.exists(Paths.get(metaRoot, "dc", "t2")) ||
        Files.list(Paths.get(metaRoot, "dc", "t2")).count() === 0,
        "cascade drop must leave no server-side orphan metadata")
    } finally srv.stop()
  }

  test("attach/detach: an existing filesystem table moves under the service's " +
      "authority and back, data in place, history intact (r12)") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      // born as a plain filesystem table: metadata beside the data
      val fsCat = new LakeCatalog(spark, warehouse)
      val t0 = fsCat.createTable("db.mv2w", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t0.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t0.append(Seq((3L, "c")).toDF("id", "v"))
      val snap1 = t0.meta.snapshots.head.snapshotId
      assert(Files.exists(Paths.get(warehouse, "db", "mv2w", "metadata")))

      // ATTACH: the service becomes the sole commit authority
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.attachTable("db.mv2w")
      assert(!Files.exists(Paths.get(warehouse, "db", "mv2w", "metadata")),
        "filesystem metadata must not survive the hand-over")
      assert(Files.exists(Paths.get(metaRoot, "db", "mv2w", "v1.json")))
      assert(t.toDF.count() === 3)
      // full history moved: time travel to the pre-attach snapshot works
      assert(t.read(snapshotId = Some(snap1)).count() === 2)
      // new commits go through the service
      t.append(Seq((4L, "d")).toDF("id", "v"))
      assert(cat.loadTable("db.mv2w").toDF.count() === 4)
      // re-attach is idempotent (r13): the filesystem copy is gone and
      // the service owns the ident — indistinguishable from a crash after
      // the hand-over's delete, so the call returns the attached table
      assert(cat.attachTable("db.mv2w").toDF.count() === 4)

      // DETACH: back to plain filesystem authority, post-attach commits kept
      val back = cat.detachTable("db.mv2w")
      assert(Files.exists(Paths.get(warehouse, "db", "mv2w", "metadata")))
      assert(!Files.exists(Paths.get(metaRoot, "db", "mv2w", "v1.json")),
        "the service must release the ident on detach")
      assert(back.toDF.count() === 4)
      assert(fsCat.loadTable("db.mv2w").read(snapshotId = Some(snap1)).count() === 2)
    } finally srv.stop()
  }

  test("attach_table is crash-safe: a partial copy is invisible and a retry " +
      "resumes it; a concurrent commit is fenced; a foreign ident rolls back (r13)") {
    val (srv, metaRoot, warehouse) = newEnv()
    try {
      import spark.implicits._
      val fsCat = new LakeCatalog(spark, warehouse)
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)

      // -- 1. resume after a crash mid-copy ---------------------------------
      val t0 = fsCat.createTable("db.cr", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      t0.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t0.append(Seq((3L, "c")).toDF("id", "v"))
      val snap1 = t0.meta.snapshots.head.snapshotId
      // simulate the crash state: every metadata file EXCEPT v1.json made
      // it to the server before the process died
      val metaDir = Paths.get(warehouse, "db", "cr", "metadata")
      val remote = new HttpMetaStore(srv.uri, "db.cr")
      Files.list(metaDir).iterator().asScala
        .filter(p => p.getFileName.toString != "v1.json")
        .foreach(p => remote.putIfAbsent(p.getFileName.toString, Files.readAllBytes(p)))
      // the half-copy is INVISIBLE: v1.json keys existence at the catalog
      assert(!cat.tableExists("db.cr"),
        "a crashed partial attach must not be visible as an existing table")
      // retry completes the hand-over over the byte-identical files
      val t = cat.attachTable("db.cr")
      assert(t.toDF.count() === 3)
      assert(t.read(snapshotId = Some(snap1)).count() === 2)
      assert(!Files.exists(metaDir))

      // -- 2. fence: a commit landing during the copy aborts the hand-over --
      val f0 = fsCat.createTable("db.fence", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      f0.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      val fenceLoc = s"$warehouse/db/fence"
      var raced = false
      val racingCat = new RemoteLakeCatalog(spark, warehouse, srv.uri) {
        override protected def beforeHandOver(ident: String): Unit =
          if (ident == "db.fence" && !raced) {
            raced = true // a writer still holding the location commits now
            new LakeTable(spark, fenceLoc).append(Seq((4L, "d")).toDF("id", "v"))
          }
      }
      val e = intercept[CommitConflictException](racingCat.attachTable("db.fence"))
      assert(e.getMessage.contains("concurrent commit during attach"))
      // the filesystem copy survives (nothing destroyed), the server-side
      // half-copy went invisible again, and a retry lands EVERY commit
      assert(Files.exists(Paths.get(warehouse, "db", "fence", "metadata")))
      assert(!cat.tableExists("db.fence"))
      assert(racingCat.attachTable("db.fence").toDF.count() === 4)

      // -- 3. mismatch: the ident belongs to a different table → rollback ---
      val own = cat.createTable("db.clash", StructType(Seq(
        StructField("k", LongType))))
      own.append(Seq(Tuple1(7L)).toDF("k"))
      val before = new HttpMetaStore(srv.uri, "db.clash").list().map(_._1).toSet
      val c0 = fsCat.createTable("db.clash", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      c0.append(Seq((1L, "a")).toDF("id", "v"))
      val e2 = intercept[Exception](cat.attachTable("db.clash"))
      assert(e2.getMessage.contains("different content"))
      // every file THIS attach won was deleted: the server holds exactly
      // the foreign table's files, and that table still reads
      assert(new HttpMetaStore(srv.uri, "db.clash").list().map(_._1).toSet === before)
      assert(cat.loadTable("db.clash").toDF.count() === 1)

      // -- 4. detach resumes a partial copy the same way --------------------
      // simulate the crash: every file except v1.json already written back
      val dMeta = Paths.get(warehouse, "db", "cr", "metadata")
      Files.createDirectories(dMeta)
      remote.list().map(_._1).filterNot(_ == "v1.json").foreach { n =>
        Files.write(dMeta.resolve(n), remote.read(n).getBytes("UTF-8")); ()
      }
      val back = cat.detachTable("db.cr")
      assert(back.toDF.count() === 3)
      assert(!cat.tableExists("db.cr"), "detach must release the ident")
      assert(fsCat.loadTable("db.cr").read(snapshotId = Some(snap1)).count() === 2)
      // re-detach after completion is an idempotent no-op
      assert(cat.detachTable("db.cr").toDF.count() === 3)
    } finally srv.stop()
  }

  test("server restart: a new CatalogServer over the same metadata root " +
      "serves every table — the root IS the durable state (r12)") {
    val (srv, metaRoot, warehouse) = newEnv()
    import spark.implicits._
    val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
    val t = cat.createTable("db.dur", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    srv.stop()
    // a FRESH server process (new port) over the same private root
    val srv2 = new CatalogServer(metaRoot).start()
    try {
      val cat2 = new RemoteLakeCatalog(spark, warehouse, srv2.uri)
      assert(cat2.listTables("db") === Seq("dur"))
      val t2 = cat2.loadTable("db.dur")
      assert(t2.toDF.count() === 2)
      t2.append(Seq((3L, "c")).toDF("id", "v")) // commits keep flowing
      assert(t2.toDF.count() === 3)
    } finally srv2.stop()
  }

  test("two JVMs racing through the service: every commit survives exactly once") {
    val (srv, _, warehouse) = newEnv()
    try {
      import spark.implicits._
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("xp.t", StructType(Seq(
        StructField("id", LongType), StructField("src", StringType))))
      t.append(Seq((0L, "seed")).toDF("id", "src"))

      val nCommits = 6; val nAppends = 3
      val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = (Seq(javaBin, "-cp", System.getProperty("java.class.path"),
        "-Xmx2g", "-Dspark.ui.enabled=false") ++ addOpens ++
        Seq("graft.lake.CatalogRacerMain", srv.uri, warehouse, "xp.t", "w1",
          nCommits.toString, nAppends.toString)).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(Paths.get(warehouse, "racer.log").toFile)
      val child = pb.start()
      try {
        val ready = Paths.get(warehouse, "racer-ready")
        val deadline = System.nanoTime() + 120_000_000_000L
        while (!Files.exists(ready) && child.isAlive && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(Files.exists(ready), "child never became ready; log:\n" +
          new String(Files.readAllBytes(Paths.get(warehouse, "racer.log"))))
        Files.write(Paths.get(warehouse, "racer-go"), "go".getBytes)
        // parent races its own commits through the same service
        (0 until nCommits).foreach(i => t.createBranch(s"parent-$i"))
        (0 until nAppends).foreach(i =>
          t.append(Seq((2000L + i, s"parent-$i")).toDF("id", "src")))
        assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
          "child did not finish")
        assert(child.exitValue() === 0, "child failed; log:\n" +
          new String(Files.readAllBytes(Paths.get(warehouse, "racer.log"))))
        val m = t.meta
        // every branch from both sides exists
        (0 until nCommits).foreach { i =>
          assert(m.refs.contains(s"parent-$i"))
          assert(m.refs.contains(s"child-w1-$i"))
        }
        // every append from both sides landed exactly once
        val srcs = t.toDF.select("src").as[String].collect().toSeq
        assert(srcs.length === 1 + 2 * nAppends)
        assert(srcs.distinct.length === srcs.length)
        // linear version history with no gaps
        assert(t.metadataVersions.map(_._1) === (1 to t.meta.version))
      } finally if (child.isAlive) child.destroyForcibly()
    } finally srv.stop()
  }

  test("namespace listing asks the server: an empty remote namespace with " +
      "ZERO warehouse footprint is listed (r13)") {
    val (srv, _, warehouse) = newEnv()
    try {
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      cat.createTable("nsx.empty", StructType(Seq(StructField("id", LongType))))
      // never written to: the warehouse holds NO directory at all, so a
      // directory walk alone would report zero namespaces
      assert(Files.list(Paths.get(warehouse)).count() === 0)
      assert(cat.listNamespaces() === Seq("nsx"))
      assert(cat.namespaceExists("nsx") && !cat.namespaceExists("nope"))
      assert(cat.listTables("nsx") === Seq("empty"))
      // union with directory-backed namespaces (created but table-less)
      cat.createNamespace("fsonly")
      assert(cat.listNamespaces() === Seq("fsonly", "nsx"))
      // the DSv2 surface (SHOW NAMESPACES) sees the server-only namespace
      spark.conf.set("spark.sql.catalog.rns", classOf[graft.lake.dsv2.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.rns.warehouse", warehouse)
      spark.conf.set("spark.sql.catalog.rns.uri", srv.uri)
      org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
      assert(spark.sql("SHOW NAMESPACES IN rns").collect()
        .map(_.getString(0)).sorted.toSeq === Seq("fsonly", "nsx"))
    } finally {
      srv.stop()
      spark.conf.unset("spark.sql.catalog.rns.uri")
    }
  }

  test("half-attached MV pair: a base attached without its state table " +
      "declines to route (cold scan, correct rows), the listing reports the " +
      "unresolvable sibling; attaching the state too restores the route (r13)") {
    val (srv, _, warehouse) = newEnv()
    // routing needs GraftExtensions — dedicated session (create(), not
    // getOrCreate), default/active slots restored for later suites
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .create()
    prevDefault match {
      case Some(d) => SparkSession.setDefaultSession(d)
      case None => SparkSession.clearDefaultSession()
    }
    prevActive match {
      case Some(a) => SparkSession.setActiveSession(a)
      case None => SparkSession.clearActiveSession()
    }
    try {
      // born filesystem-mode: base + MV state side by side in the warehouse
      s.conf.set("spark.sql.catalog.hfs", classOf[graft.lake.dsv2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.hfs.warehouse", warehouse)
      s.conf.set("spark.sql.catalog.hw", classOf[graft.lake.dsv2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.hw.warehouse", warehouse)
      s.conf.set("spark.sql.catalog.hw.uri", srv.uri)
      org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(s)
      s.sql("CREATE DATABASE IF NOT EXISTS hfs.db")
      s.sql("CREATE TABLE hfs.db.hb (g STRING, v BIGINT)")
      s.sql("INSERT INTO hfs.db.hb VALUES ('a', 1), ('a', 2), ('b', 10)")
      s.sql("""CREATE MATERIALIZED VIEW hfs.db.hmv AS
              |SELECT g, count(*) AS n, sum(v) AS t FROM hfs.db.hb GROUP BY g""".stripMargin)

      // attach ONLY the base: the pair is now split across authorities
      new RemoteLakeCatalog(s, warehouse, srv.uri).attachTable("db.hb")

      def run(q: String) = {
        val df = s.sql(q)
        (df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq,
          !df.queryExecution.executedPlan.toString.contains("Aggregate"))
      }
      val q = "SELECT g, count(*) AS n, sum(v) AS t FROM hw.db.hb GROUP BY g ORDER BY g"
      val expected = Seq(("a", 2L, 3L), ("b", 1L, 10L))
      // DECLINES to route — the state location has no identity at the wire
      // authority — but the cold aggregation still answers correctly
      val (rows1, routed1) = run(q)
      assert(!routed1, "a half-attached pair must NOT route (authority mixing)")
      assert(rows1 === expected)
      // the listing REPORTS the unresolvable sibling instead of throwing
      val listing = s.sql(
        "SELECT view, fresh, last_error FROM hw.db.hb.materialized_views").collect()
      assert(listing.length === 1)
      assert(listing(0).isNullAt(0) && !listing(0).getBoolean(1))
      assert(listing(0).getString(2).startsWith("unreachable"), listing(0).toString)

      // attach the state table too: one authority again, the route resumes
      new RemoteLakeCatalog(s, warehouse, srv.uri).attachTable("db.hmv")
      val (rows2, routed2) = run(q)
      assert(routed2, "with both halves attached the view must route again")
      assert(rows2 === expected)
    } finally srv.stop()
  }
}
