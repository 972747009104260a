package graft.streaming

import graft.lake.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Changelog ingestion scenarios (M7) mirroring the reference's Flink jobs:
  * CSV parse with malformed-line drop (IcebergStream.java:90-93), equality-
  * field upsert (:118), last-wins dedup (PaimonStream.java:91), -U/+U
  * retract-insert pairs (:41-42), idempotent batch replay (T4). */
class ChangelogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // see EventTimeSpec: in-JVM checkpoint renames, no checksum await
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()

  def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-stream").toString)

  val tableSchema: StructType = StructType(Seq(
    StructField("block_number", IntegerType),
    StructField("hash", StringType),
    StructField("seq", LongType)))

  def batchDF(rows: Seq[(String, Int, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("op", "block_number", "hash", "seq")
  }

  test("CSV changelog parse drops malformed lines (IcebergStream.java:90-93)") {
    import spark.implicits._
    val lines = Seq("I,3,abc", "D,4,def", "garbage", "I,5", "I,notanint,xyz",
      "U,6,ggg", "-U,6,old").toDF("value")
    val parsed = Changelog.parseCsvLines(lines)
    assert(parsed.columns.toSeq === Seq("op", "block_number", "hash", "timestamp"))
    assert(parsed.count() === 4)
    assert(parsed.select("block_number").collect().map(_.getInt(0)).sorted === Array(3, 4, 6, 6))
  }

  test("equality-field upsert: I appends, D deletes, last-wins per key (J2/J3)") {
    val cat = freshCatalog()
    val t = cat.createTable("test.blocks", tableSchema)
    // batch 1: inserts for keys 1..3
    Changelog.mergeChangelog(t, batchDF(Seq(
      ("I", 1, "h1", 1L), ("I", 2, "h2", 2L), ("I", 3, "h3", 3L))),
      key = "block_number", seqCol = "seq", batchId = 0L)
    assert(t.toDF.count() === 3)
    // batch 2: update key 2 (two versions — later seq wins), delete key 3,
    // insert key 4
    Changelog.mergeChangelog(t, batchDF(Seq(
      ("U", 2, "h2-old", 10L), ("U", 2, "h2-new", 11L),
      ("D", 3, "h3", 12L), ("I", 4, "h4", 13L))),
      key = "block_number", seqCol = "seq", batchId = 1L)
    val out = t.toDF.orderBy("block_number").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 4))
    assert(out(1).getString(1) === "h2-new")
  }

  test("-U/+U retract-insert pair collapses to the +U row (PaimonStream J4)") {
    val cat = freshCatalog()
    val t = cat.createTable("test.blocks", tableSchema)
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 7, "old", 1L))),
      key = "block_number", seqCol = "seq")
    Changelog.mergeChangelog(t, batchDF(Seq(("-U", 7, "old", 2L), ("U", 7, "new", 3L))),
      key = "block_number", seqCol = "seq")
    val out = t.toDF.collect()
    assert(out.length === 1 && out(0).getString(1) === "new")
    // a trailing -U with no +U removes the key
    Changelog.mergeChangelog(t, batchDF(Seq(("-U", 7, "new", 4L))),
      key = "block_number", seqCol = "seq")
    assert(t.toDF.count() === 0)
  }

  test("batch replay is idempotent on batchId (T4 exactly-once)") {
    val cat = freshCatalog()
    val t = cat.createTable("test.blocks", tableSchema)
    val b = batchDF(Seq(("I", 1, "h1", 1L)))
    Changelog.mergeChangelog(t, b, "block_number", "seq", batchId = 5L)
    val snapCount = t.meta.snapshots.size
    Changelog.mergeChangelog(t, b, "block_number", "seq", batchId = 5L) // replay
    assert(t.meta.snapshots.size === snapCount)
    assert(t.toDF.count() === 1)
  }

  test("two streaming writers with distinct writerIds don't skip each other's batches") {
    val cat = freshCatalog()
    val t = cat.createTable("test.blocks", tableSchema)
    val widA = Changelog.writerIdFor("/ckpt/query-a")
    val widB = Changelog.writerIdFor("/ckpt/query-b")
    assert(widA !== widB)
    // writer A applies batches 0..3; writer B then starts at ITS batch 0 —
    // under the old unscoped marker, A's marker (3) would silently swallow
    // every B batch below 4
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 1, "a0", 1L))),
      "block_number", "seq", batchId = 3L, writerId = widA)
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 2, "b0", 2L))),
      "block_number", "seq", batchId = 0L, writerId = widB)
    assert(t.toDF.count() === 2, "writer B's batch 0 must apply despite A's higher marker")
    // replay WITHIN a writer still skips
    val snapCount = t.meta.snapshots.size
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 3, "b0r", 3L))),
      "block_number", "seq", batchId = 0L, writerId = widB)
    assert(t.meta.snapshots.size === snapCount, "B's replayed batch 0 must be skipped")
    assert(t.toDF.count() === 2)
  }

  test("legacy unscoped marker floors a scoped writer's replay until any scoped marker exists") {
    val cat = freshCatalog()
    val t = cat.createTable("test.blocks", tableSchema)
    // pre-upgrade deployment: single writer, unscoped marker at batch 5
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 1, "legacy", 1L))),
      "block_number", "seq", batchId = 5L)
    // in-place upgrade: same logical writer resumes its checkpoint with a
    // scoped id and the recovery replays batch 5 — the legacy floor must
    // make it skip, not re-apply
    val wid = Changelog.writerIdFor("/ckpt/upgraded")
    val snapCount = t.meta.snapshots.size
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 1, "replay", 2L))),
      "block_number", "seq", batchId = 5L, writerId = wid)
    assert(t.meta.snapshots.size === snapCount,
      "pre-upgrade marker must floor the upgraded writer's replayed batch")
    // the writer advances past the replay; its scoped marker now exists
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 1, "b6", 3L))),
      "block_number", "seq", batchId = 6L, writerId = wid)
    assert(t.toDF.filter(col("hash") === "b6").count() === 1)
    // a NEW second writer starting at ITS batch 0 must NOT be floored by
    // the legacy marker once any scoped marker exists in history
    val widB = Changelog.writerIdFor("/ckpt/new-writer")
    Changelog.mergeChangelog(t, batchDF(Seq(("I", 2, "b0", 4L))),
      "block_number", "seq", batchId = 0L, writerId = widB)
    assert(t.toDF.filter(col("hash") === "b0").count() === 1,
      "new writer's batch 0 must apply despite the high legacy marker")
  }

  test("kafka seam fails with an actionable error naming the twin sources (jar absent here)") {
    val ex = intercept[IllegalStateException](
      Changelog.kafkaSource(spark, "localhost:9092", "clickstream"))
    assert(ex.getMessage.contains("spark-sql-kafka"), "must name the missing jar")
    assert(ex.getMessage.contains("clickstreamSource"), "must name the rate twin")
    assert(ex.getMessage.contains("socketLines"), "must name the socket twin")
  }

  test("merge rewrites only files whose key bounds overlap the batch") {
    val cat = freshCatalog()
    val t = cat.createTable("test.blocks", tableSchema)
    import spark.implicits._
    // two disjoint key-range files
    t.append(Seq((1, "a", 1L), (2, "b", 2L)).toDF("block_number", "hash", "seq").coalesce(1))
    t.append(Seq((100, "x", 3L), (200, "y", 4L)).toDF("block_number", "hash", "seq").coalesce(1))
    Changelog.mergeChangelog(t, batchDF(Seq(("U", 1, "a2", 9L))),
      key = "block_number", seqCol = "seq")
    val snap = t.meta.currentSnapshot.get
    assert(snap.summary("rewritten-data-files") === "1") // high-range file untouched
    assert(t.toDF.count() === 4)
    assert(t.toDF.filter($"block_number" === 1).head.getString(1) === "a2")
  }

  test("faker source schema matches the reference record shape (S8)") {
    val df = Changelog.fakerSource(spark)
    assert(df.columns.toSeq === Seq("op", "block_number", "hash", "timestamp"))
    assert(df.schema("block_number").dataType === IntegerType)
    assert(df.isStreaming)
  }

  test("clickstream generator round-trips its JSON schema (S9/F13)") {
    import spark.implicits._
    // exercise the parse path on a batch analog of the generator output
    val sample = Seq(
      """{"timestamp":"2024-01-01 10:00:00","event":"purchase","user_id":"user_3","site_id":"meh-store.com","url":"/item/7","on_site_seconds":42,"viewed_percent":99}""")
      .toDF("value")
    val parsed = Changelog.parseJsonLines(sample)
    assert(parsed.columns.toSeq === Changelog.clickstreamSchema.fieldNames.toSeq)
    val r = parsed.head
    assert(r.getString(1) === "purchase" && r.getInt(5) === 42)
    val stream = Changelog.clickstreamSource(spark)
    assert(stream.isStreaming && stream.columns.toSeq === Changelog.clickstreamSchema.fieldNames.toSeq)
  }

  test("end-to-end micro-batch ingest via foreachBatch + trigger (T1)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = freshCatalog()
    val t = cat.createTable("test.stream", StructType(Seq(
      StructField("block_number", IntegerType),
      StructField("hash", StringType),
      StructField("timestamp", TimestampType))))
    val mem = MemoryStream[String]
    val parsed = Changelog.parseCsvLines(mem.toDF())
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = parsed.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Changelog.mergeChangelog(t, batch, "block_number", "timestamp", batchId = id)
      }.start()
    try {
      mem.addData("I,1,aa", "I,2,bb", "bogus line")
      q.processAllAvailable()
      assert(t.toDF.count() === 2)
      mem.addData("D,1,aa", "I,3,cc")
      q.processAllAvailable()
      assert(t.toDF.orderBy("block_number").collect().map(_.getInt(0)).toSeq === Seq(2, 3))
    } finally q.stop()
  }

  test("startIngest(refreshViews): materialized views track the stream head batch-by-batch (r10)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = freshCatalog()
    val t = cat.createTable("test.mvstream", StructType(Seq(
      StructField("block_number", IntegerType),
      StructField("hash", StringType),
      StructField("timestamp", TimestampType))))
    import graft.lake.MaterializedAgg
    val mv = MaterializedAgg.create(cat, "test.mvstream_agg", t,
      Seq("hash"), Seq(MaterializedAgg.AggCol("count", "*", "n")))
    val mem = MemoryStream[String]
    val parsed = Changelog.parseCsvLines(mem.toDF())
    val ckpt = Files.createTempDirectory("graft-mvstream-ckpt").toString
    val q = Changelog.startIngest(t, parsed, "block_number", "timestamp",
      ckpt, triggerMs = 200L, refreshViews = true)
    def fresh(): Boolean =
      MaterializedAgg.load(cat, "test.mvstream_agg").watermark ==
        t.meta.currentSnapshot.map(_.snapshotId)
    def viewRows(): Map[String, Long] =
      MaterializedAgg.load(cat, "test.mvstream_agg").read().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      mem.addData("I,1,aa", "I,2,aa", "I,3,bb")
      q.processAllAvailable()
      assert(fresh(), "view watermark must equal the stream head after the batch")
      assert(viewRows() === Map("aa" -> 2L, "bb" -> 1L))
      // second batch: an update (last-wins) moves a key between groups
      mem.addData("U,2,bb", "I,4,cc")
      q.processAllAvailable()
      assert(fresh(), "view stays at head across batches")
      assert(viewRows() === Map("aa" -> 1L, "bb" -> 2L, "cc" -> 1L))
    } finally q.stop()
    val _ = mv // created above; loaded fresh per assertion
  }

  test("pending failure counters prune when a view leaves the routing " +
      "index — a new view at the same location starts from zero (r13)") {
    import spark.implicits._
    import graft.lake.MaterializedAgg
    val cat = freshCatalog()
    val t = cat.createTable("test.prune_base", StructType(Seq(
      StructField("block_number", IntegerType),
      StructField("hash", StringType))))
    val dim = cat.createTable("test.prune_dim", StructType(Seq(
      StructField("h2", StringType), StructField("grp", StringType))))
    dim.append(Seq(("aa", "g1")).toDF("h2", "grp"))
    t.updateProperties(_ + ("graft.mv.health.record-every" -> "16"))
    def mkView() = MaterializedAgg.create(cat, "test.prune_agg", t,
      Seq("grp"), Seq(MaterializedAgg.AggCol("count", "*", "n")),
      dims = Seq(MaterializedAgg.DimJoin("test.prune_dim", "hash", "h2")))
    mkView()
    def failures: Option[Long] = cat.loadTable("test.prune_agg")
      .meta.properties.get(MaterializedAgg.FailuresKey).map(_.toLong)
    // mutate the dim → every refresh refuses; accrue UNCOMMITTED pending
    dim.append(Seq(("bb", "g2")).toDF("h2", "grp"))
    Changelog.refreshRegisteredViews(t) // 1st failure commits, pending→0
    Changelog.refreshRegisteredViews(t) // pending 1, below cadence
    Changelog.refreshRegisteredViews(t) // pending 2, below cadence
    assert(failures === Some(1L))
    // the view is dropped while failing: deregister + drop the state
    // table; the next refresh pass prunes its driver-side counter
    t.updateProperties(_ - MaterializedAgg.ViewsKey)
    Changelog.refreshRegisteredViews(t)
    // a NEW view created at the SAME state location fails afresh: its
    // first record must say 1, not inherit the dead view's pending tail
    cat.dropTable("test.prune_agg")
    mkView()
    dim.append(Seq(("cc", "g3")).toDF("h2", "grp"))
    Changelog.refreshRegisteredViews(t)
    assert(failures === Some(1L),
      "a stale pending count from a dropped view must not inflate the " +
        "new view's first failure record")
  }

  test("failing per-batch view refresh records health on the state table; rebuild clears it (r11)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = freshCatalog()
    val t = cat.createTable("test.hstream", StructType(Seq(
      StructField("block_number", IntegerType),
      StructField("hash", StringType),
      StructField("timestamp", TimestampType))))
    val dim = cat.createTable("test.hdim", StructType(Seq(
      StructField("h2", StringType), StructField("grp", StringType))))
    dim.append(Seq(("aa", "g1"), ("bb", "g2")).toDF("h2", "grp"))
    // r12: bound the health-record commit cadence (default 16; 4 here so
    // the every-Nth commit is observable within a short test)
    t.updateProperties(_ + ("graft.mv.health.record-every" -> "4"))
    import graft.lake.MaterializedAgg
    MaterializedAgg.create(cat, "test.hstream_agg", t,
      Seq("grp"), Seq(MaterializedAgg.AggCol("count", "*", "n")),
      dims = Seq(MaterializedAgg.DimJoin("test.hdim", "hash", "h2")))
    val mem = MemoryStream[String]
    val parsed = Changelog.parseCsvLines(mem.toDF())
    val ckpt = Files.createTempDirectory("graft-hstream-ckpt").toString
    val q = Changelog.startIngest(t, parsed, "block_number", "timestamp",
      ckpt, triggerMs = 200L, refreshViews = true)
    def stateProps: Map[String, String] =
      cat.loadTable("test.hstream_agg").meta.properties
    try {
      mem.addData("I,1,aa", "I,2,bb")
      q.processAllAvailable()
      assert(stateProps.get(MaterializedAgg.FailuresKey).isEmpty,
        "healthy refresh must leave no failure record")
      // mutate the dimension: every later refresh refuses until rebuild
      dim.append(Seq(("cc", "g3")).toDF("h2", "grp"))
      mem.addData("I,3,aa")
      q.processAllAvailable()
      val n1 = stateProps.get(MaterializedAgg.FailuresKey).map(_.toLong)
      assert(n1.exists(_ >= 1L),
        s"the FIRST refused refresh must record a failure: $stateProps")
      assert(stateProps.get(MaterializedAgg.LastErrorKey).exists(_.contains("dimension")))
      assert(stateProps.contains(MaterializedAgg.LastErrorAtKey))
      // r12: repeated identical failures do NOT commit per attempt — the
      // record stays visible while the state table's history stays flat
      // until the every-Nth (record-every=4) cadence point
      def stateSnapshots: Int = // metadata version: every commit bumps it
        cat.loadTable("test.hstream_agg").meta.version
      val s1 = stateSnapshots
      for (i <- 4 to 6) { // three more identical failures: pending 1..3 < 4
        // r13: mutate the dim again mid-failure — the refusal message now
        // embeds a DIFFERENT current snapshot id each time; the
        // error-changed trigger compares digit-normalized messages, so a
        // varying embedded value must not defeat the cadence bound
        if (i == 5) dim.append(Seq(("dd", "g4")).toDF("h2", "grp"))
        mem.addData(s"I,$i,bb")
        q.processAllAvailable()
      }
      assert(stateSnapshots === s1,
        "repeat failures below the cadence must not commit — even when " +
          "the error embeds a value that advances per attempt")
      assert(stateProps(MaterializedAgg.FailuresKey).toLong === n1.get,
        "the health record must stay visible between cadence commits")
      mem.addData("I,7,aa") // 4th identical repeat: pending hits record-every
      q.processAllAvailable()
      assert(stateSnapshots === s1 + 1,
        "the every-Nth failure must commit exactly one catch-up record")
      assert(stateProps(MaterializedAgg.FailuresKey).toLong === n1.get + 4,
        "the catch-up record must account for the quiet attempts")
      // 5 failed batches -> 2 state commits total (first + one cadence)
      // the base table's materialized_views listing surfaces it
      val row = t.metadataTable("materialized_views")
        .where("view = 'test.hstream_agg'").collect().head
      assert(row.getAs[Long]("refresh_failures") >= 2L)
      assert(row.getAs[String]("last_error").contains("dimension"))
      assert(!row.getAs[Boolean]("fresh"))
    } finally q.stop()
    // rebuild() recreates the state against the new dim contents: the
    // failure record is gone and the view is fresh again
    MaterializedAgg.load(cat, "test.hstream_agg").rebuild()
    assert(stateProps.get(MaterializedAgg.FailuresKey).isEmpty)
    val after = t.metadataTable("materialized_views")
      .where("view = 'test.hstream_agg'").collect().head
    assert(after.getAs[Long]("refresh_failures") === 0L)
    assert(after.getAs[Boolean]("fresh"))
    assert(after.getAs[String]("last_error") == null)
  }

  test("socket text stream feeds the changelog parse (S7, IcebergStream.java:87-88)") {
    // a local server stands in for the reference's `nc localhost 9999` peer
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("I,1,aa")
      out.println("D,2,bb")
      out.println("garbage line")
      out.println("I,3,cc")
      out.flush()
      // keep the connection open until the test is done reading
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    val parsed = Changelog.parseCsvLines(Changelog.socketLines(spark, "localhost", port))
    val q = parsed.writeStream.format("memory").queryName("sock_sink").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("sock_sink").count()
        if (n < 3) Thread.sleep(200)
      }
      assert(n === 3, "expected 3 well-formed changelog rows from the socket")
      val rows = spark.table("sock_sink").select("op", "block_number")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows === Set(("I", 1), ("D", 2), ("I", 3)))
    } finally { q.stop(); server.close() }
  }

  test("streaming read-back: appends arrive across triggers, rewrites don't re-deliver (S10/T6)") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("test.readback", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    val out = Changelog.streamRead(t)
    assert(out.isStreaming)
    val ckpt = Files.createTempDirectory("graft-rb-ckpt").toString
    val q = out.writeStream
      .format("memory").queryName("rb_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // append 1 arrives on the next trigger (StreamRead.java:31-34 semantics)
      t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("rb_sink").count() === 2)
      // append 2 arrives incrementally
      t.append(Seq((3, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("rb_sink").count() === 3)
      // a CoW rewrite (DELETE rewriting a file) must NOT re-deliver rows —
      // append-only stream semantics, like Iceberg's streaming read
      t.delete(col("id") === 1)
      q.processAllAvailable()
      assert(spark.table("rb_sink").count() === 3)
      // and appends after the rewrite still flow
      t.append(Seq((4, "d")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("rb_sink").select("id").collect().map(_.getInt(0)).sorted
        === Array(1, 2, 3, 4))
    } finally q.stop()
  }

  test("streaming read-back sees only committed MAIN snapshots: branch and staged WAP appends are invisible until published") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("test.rbmain", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))),
      properties = Map("write.wap.enabled" -> "true"))
    val out = Changelog.streamRead(t)
    val ckpt = Files.createTempDirectory("graft-rbm-ckpt").toString
    val q = out.writeStream
      .format("memory").queryName("rbm_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("rbm_sink").count() === 2)
      // a side-branch append writes app-* files into the SAME data dir —
      // the old directory-glob source delivered them as main rows
      t.createBranch("etl")
      t.append(Seq((90, "branch-only")).toDF("id", "v"), toBranch = Some("etl"))
      q.processAllAvailable()
      assert(spark.table("rbm_sink").count() === 2,
        "branch-only append must not reach a main-branch stream")
      // a staged WAP append is invisible until cherry-picked (D15)
      spark.conf.set("spark.wap.id", "rb-wap-1")
      val staged = try {
        t.append(Seq((91, "staged")).toDF("id", "v"))
        t.meta.snapshots.find(_.staged).get
      } finally spark.conf.unset("spark.wap.id")
      q.processAllAvailable()
      assert(spark.table("rbm_sink").count() === 2,
        "staged WAP append must not reach the stream before publish")
      // publish: the cherry-pick commit lands the staged rows on main,
      // and only THEN do they flow to the stream
      t.cherrypick(staged.snapshotId)
      q.processAllAvailable()
      assert(spark.table("rbm_sink").select("id").collect().map(_.getInt(0)).sorted
        === Array(1, 2, 91))
    } finally q.stop()
  }

  test("changelog stream delivers insert AND delete events per commit (toChangelogStream parity)") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("test.cdcstream", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    val out = Changelog.streamChangelog(t)
    assert(out.isStreaming)
    assert(out.columns.takeRight(3).toSeq ===
      Seq("_change_type", "_change_ordinal", "_commit_snapshot_id"))
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = out.writeStream
      .format("memory").queryName("cdc_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
      q.processAllAvailable()
      val afterAppend = spark.table("cdc_sink")
        .select("id", "_change_type").collect().map(r => (r.getInt(0), r.getString(1)))
      assert(afterAppend.sorted.toSeq === Seq((1, "INSERT"), (2, "INSERT")))
      // a DELETE arrives as a delete EVENT (the append-only streamRead
      // silently skips it — that is exactly what changelog mode adds)
      t.delete(col("id") === 1)
      q.processAllAvailable()
      val afterDelete = spark.table("cdc_sink")
        .select("id", "_change_type").collect().map(r => (r.getInt(0), r.getString(1)))
      assert(afterDelete.count(_ == ((1, "DELETE"))) === 1,
        s"delete event must stream: ${afterDelete.toSeq}")
      // an UPDATE arrives as its delete+insert pair in one batch
      t.update(Map("v" -> lit("b2")), Some(col("id") === 2))
      q.processAllAvailable()
      val events = spark.table("cdc_sink")
        .select("id", "v", "_change_type").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      assert(events.contains((2, "b", "DELETE")) && events.contains((2, "b2", "INSERT")),
        s"update must stream as delete+insert: ${events.toSeq}")
    } finally q.stop()
  }

  test("CDC replication: changelog stream + keyed merge maintain an exact replica") {
    import spark.implicits._
    val cat = freshCatalog()
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    val src = cat.createTable("test.cdcsrc", schema)
    val replica = cat.createTable("test.cdcrep", schema)
    // the reference's CDC pipeline shape (changelog in → equality-field
    // upsert out): insert events map to I, delete events to D; within one
    // commit an update's delete+insert pair shares a snapshot id, so the
    // sequence key is 2*snapshot+isInsert — the insert half wins last-wins
    val events = Changelog.streamChangelog(src)
    val ckpt = Files.createTempDirectory("graft-repl-ckpt").toString
    val q = events.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch
          .withColumn("op", when(col("_change_type") === "INSERT", "I").otherwise("D"))
          .withColumn("seq", col("_commit_snapshot_id") * 2 +
            when(col("_change_type") === "INSERT", 1).otherwise(0))
          .drop("_change_type", "_change_ordinal", "_commit_snapshot_id")
        Changelog.mergeChangelog(replica, b, key = "id", seqCol = "seq",
          batchId = id, writerId = "repl")
      }
      .start()
    def replicaRows() = replica.toDF.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    try {
      src.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a"), (2, "b"), (3, "c")))
      src.delete(col("id") === 2)
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a"), (3, "c")),
        "replica must apply the delete event")
      src.update(Map("v" -> lit("c2")), Some(col("id") === 3))
      src.append(Seq((4, "d")).toDF("id", "v"))
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a"), (3, "c2"), (4, "d")),
        "replica must apply update pairs (insert half wins) and later inserts")
    } finally q.stop()
  }

  test("CDC replication from a MERGE-ON-READ source: masked DML streams as " +
    "exact changelog events") {
    import spark.implicits._
    val cat = freshCatalog()
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType)))
    val src = cat.createTable("test.morsrc", schema)
    src.setProperties(Map(
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read",
      "write.merge.mode" -> "merge-on-read"))
    val replica = cat.createTable("test.morrep", schema)
    val events = Changelog.streamChangelog(src)
    val ckpt = Files.createTempDirectory("graft-morrepl-ckpt").toString
    val q = events.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch
          .withColumn("op", when(col("_change_type") === "INSERT", "I").otherwise("D"))
          .withColumn("seq", col("_commit_snapshot_id") * 2 +
            when(col("_change_type") === "INSERT", 1).otherwise(0))
          .drop("_change_type", "_change_ordinal", "_commit_snapshot_id")
        Changelog.mergeChangelog(replica, b, key = "id", seqCol = "seq",
          batchId = id, writerId = "morrepl")
      }
      .start()
    def replicaRows() = replica.toDF.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    try {
      src.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v").coalesce(1))
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a"), (2, "b"), (3, "c")))
      // positional MoR delete: no file change at the source — the
      // changelog must still emit the DELETE transition exactly once
      src.delete(col("id") === 2)
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a"), (3, "c")),
        "replica must apply the positional-mask delete")
      // MoR update: delete entries + new row version → UPDATE pair
      src.update(Map("v" -> lit("c2")), Some(col("id") === 3))
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a"), (3, "c2")))
      // equality-delete upsert (CDC merge): key 1 updated, key 4 inserted
      src.mergeByKey("id", Seq[Any](1), Seq((1, "a2"), (4, "d")).toDF("id", "v"))
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a2"), (3, "c2"), (4, "d")),
        "equality-masked upsert must replicate as update + insert")
      // source-side compaction is changelog-silent: replica unchanged
      src.convertEqualityDeletes()
      src.rewritePositionDeletes()
      q.processAllAvailable()
      assert(replicaRows() === Seq((1, "a2"), (3, "c2"), (4, "d")))
      // final parity: replica == masked source read
      assert(src.toDF.orderBy("id").collect().map(r =>
        (r.getInt(0), r.getString(1))).toSeq === replicaRows())
    } finally q.stop()
  }

  test("streamed MoR changelog events EQUAL the batch changelog() over the same range (r10)") {
    import spark.implicits._
    val cat = freshCatalog()
    val src = cat.createTable("test.morpar", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    src.setProperties(Map(
      "write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read",
      "write.merge.mode" -> "merge-on-read"))
    val ckpt = Files.createTempDirectory("graft-morpar-ckpt").toString
    val q = Changelog.streamChangelog(src).writeStream
      .format("memory").queryName("morpar_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // the full MoR commit mix: append, positional delete, MoR update
      // (delete entries + new versions), equality-delete upsert, and a
      // changelog-silent delete-file compaction
      src.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v").coalesce(1))
      src.delete(col("id") === 2)
      src.update(Map("v" -> lit("c2")), Some(col("id") === 3))
      src.mergeByKey("id", Seq[Any](1), Seq((1, "a2"), (4, "d")).toDF("id", "v"))
      src.convertEqualityDeletes()
      q.processAllAvailable()
      val head = src.meta.currentSnapshot.get.snapshotId
      def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).sorted.toSeq
      val streamed = canon(spark.table("morpar_sink")
        .select("id", "v", "_change_type", "_commit_snapshot_id").collect())
      // batch changelog over the SAME range; _change_ordinal is range-
      // local by contract, so the comparison key excludes it
      val batch = canon(src.changelog(None, head)
        .select("id", "v", "_change_type", "_commit_snapshot_id").collect())
      assert(streamed === batch,
        s"streamed events must equal the batch changelog:\n$streamed\nvs\n$batch")
      // sanity on content: exactly the MoR transitions, each exactly once
      assert(streamed.count(e => e._3 == "DELETE" && e._1 == 2) === 1)
      assert(streamed.count(e => e._3 == "DELETE" && e._1 == 3 && e._2 == "c") === 1)
      assert(streamed.count(e => e._3 == "INSERT" && e._1 == 3 && e._2 == "c2") === 1)
      assert(streamed.count(e => e._3 == "DELETE" && e._1 == 1 && e._2 == "a") === 1)
      assert(streamed.count(e => e._3 == "INSERT" && e._1 == 1 && e._2 == "a2") === 1)
      assert(!streamed.exists(_._4 == head),
        "convert_equality_deletes is logically content-free and must emit nothing")
    } finally q.stop()
  }

  test("CDC ingest into an identity + CHECK table: ids unique across batches, " +
    "violating batch rejected without corrupting the stream (r10)") {
    val cat = freshCatalog()
    val idMeta = new MetadataBuilder()
      .putLong("IDENTITY_START", 100L).putLong("IDENTITY_STEP", 1L).build()
    val t = cat.createTable("test.identcdc", StructType(Seq(
      StructField("rid", LongType, nullable = true, metadata = idMeta),
      StructField("block_number", IntegerType),
      StructField("hash", StringType),
      StructField("seq", LongType))))
    t.setProperties(Map("graft.constraint.hash_ok" -> "hash != 'bad'"))
    def merge(b: DataFrame, id: Long): Unit =
      Changelog.mergeChangelog(t, b, key = "block_number", seqCol = "seq",
        batchId = id, writerId = "identw")
    // batches 0-1: the ingest schema has NO rid column — the merge path
    // must system-assign it, advancing the high-water across batches
    merge(batchDF(Seq(("I", 1, "h1", 1L), ("I", 2, "h2", 2L))), 0L)
    merge(batchDF(Seq(("I", 3, "h3", 3L), ("U", 1, "h1b", 4L))), 1L)
    val rids0 = t.toDF.select("rid").collect().map(_.getLong(0)).toSeq
    assert(rids0.size === 3 && rids0.distinct.size === 3,
      s"identity values must be unique across CDC batches: $rids0")
    assert(rids0.forall(_ >= 100L), s"identity values start at the declared base: $rids0")
    // a batch violating the CHECK constraint fails loudly and commits
    // nothing — neither rows nor the batch-id marker
    val contentBefore = t.toDF.collect().map(r => (r.getInt(1), r.getString(2))).toSet
    intercept[Exception] {
      merge(batchDF(Seq(("I", 4, "bad", 5L))), 2L)
    }
    assert(t.toDF.collect().map(r => (r.getInt(1), r.getString(2))).toSet === contentBefore,
      "violating batch must commit nothing")
    // the stream is NOT corrupted: the corrected replay of batch 2 applies
    // (the marker was never advanced), and later batches keep unique ids
    merge(batchDF(Seq(("I", 4, "h4", 5L))), 2L)
    merge(batchDF(Seq(("I", 5, "h5", 6L))), 3L)
    val rids1 = t.toDF.select("rid").collect().map(_.getLong(0)).toSeq
    assert(rids1.size === 5 && rids1.distinct.size === 5,
      s"identity uniqueness must survive the rejected batch: $rids1")
    // same contract on the merge-on-read upsert path
    t.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    merge(batchDF(Seq(("I", 6, "h6", 7L), ("U", 5, "h5b", 8L))), 4L)
    val rids2 = t.toDF.select("rid").collect().map(_.getLong(0)).toSeq
    assert(rids2.size === 6 && rids2.distinct.size === 6,
      s"identity uniqueness must hold on the MoR merge path too: $rids2")
  }

  test("CALL create_changelog_view registers the CDC diff as a SQL temp view") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-cdcview").toString
    spark.conf.set("spark.sql.catalog.lakecdc", "graft.lake.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lakecdc.warehouse", wh)
    spark.sql("CREATE DATABASE IF NOT EXISTS lakecdc.db")
    spark.sql("CREATE TABLE lakecdc.db.cv (id BIGINT, v STRING)")
    spark.sql("INSERT INTO lakecdc.db.cv VALUES (1, 'a'), (2, 'b')")
    spark.sql("DELETE FROM lakecdc.db.cv WHERE id = 1")
    spark.sql("CALL lakecdc.system.create_changelog_view(table => 'db.cv')")
    val rows = spark.sql(
      "SELECT id, _change_type FROM db_cv_changes " +
        "ORDER BY _change_ordinal, _change_type, id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "INSERT"), (2L, "INSERT"), (1L, "DELETE")))
    // explicit start pin + custom view name
    val cat2 = new graft.lake.LakeCatalog(spark, wh)
    val snaps = cat2.loadTable("db.cv").meta.snapshots.map(_.snapshotId).sorted
    spark.sql(s"CALL lakecdc.system.create_changelog_view(table => 'db.cv', " +
      s"start_snapshot => ${snaps.head}, view_name => 'cv_tail')")
    assert(spark.sql("SELECT _change_type FROM cv_tail").collect()
      .map(_.getString(0)).toSeq === Seq("DELETE"))
    // identifier_columns flips same-commit delete+insert pairs to
    // UPDATE_BEFORE/UPDATE_AFTER (Iceberg's compute-updates mode)
    val updT = cat2.loadTable("db.cv")
    val preUpd = updT.meta.currentSnapshot.get.snapshotId
    updT.update(Map("v" -> lit("b2")), Some(col("id") === 2))
    spark.sql(s"CALL lakecdc.system.create_changelog_view(table => 'db.cv', " +
      s"start_snapshot => $preUpd, identifier_columns => 'id', view_name => 'cv_upd')")
    assert(spark.sql("SELECT v, _change_type FROM cv_upd ORDER BY _change_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("b2", "UPDATE_AFTER"), ("b", "UPDATE_BEFORE")))
  }

  test("unresolvable checkpointed offset fails with an actionable recovery message") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val cat = freshCatalog()
    val t = cat.createTable("test.wedge", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    t.append(Seq((1, "a")).toDF("id", "v"))
    val head = t.meta.currentSnapshot.get.snapshotId
    val src = new LakeStreamSource(spark.sqlContext, t.location)
    // a checkpointed start offset whose snapshot is gone (expired) or off
    // main's ancestry (rollback then re-advance) previously wedged the
    // stream with a bare `not an ancestor` require failure every trigger
    val ex = intercept[IllegalStateException](
      src.getBatch(Some(LongOffset(head + 500)), LongOffset(head)))
    assert(ex.getMessage.contains("expire_snapshots"), "must name the expiry cause")
    assert(ex.getMessage.contains("checkpoint directory"), "must name the recovery path")
    assert(ex.getMessage.contains("rollback"), "must name the rollback cause")
  }
}
