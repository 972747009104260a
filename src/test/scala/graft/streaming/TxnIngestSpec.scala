package graft.streaming

import graft.lake.{CommitConflictException, LakeCatalog, LakeTransaction}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Transactional multi-table streaming ingest (T7,
  * [[Changelog.applyTransactionalBatch]]): every micro-batch lands on a
  * raw table AND its derived table inside one [[LakeTransaction]], so no
  * reader ever sees one without the other — and exactly-once survives a
  * crash in EVERY protocol window, including the nastiest one
  * (decision=commit durable, nothing published, coordinator dead). */
class TxnIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()

  private val rawSchema = StructType(Seq(
    StructField("op", StringType), StructField("id", LongType),
    StructField("v", StringType), StructField("seq", LongType)))

  private def batch(rows: (String, Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("op", "id", "v", "seq")
  }

  /** raw = every changelog row appended verbatim; cur = last-wins keyed
    * current state — the classic raw+derived pair whose consistency a
    * per-table sink cannot guarantee. */
  private def mkSinks(cat: LakeCatalog,
                      props: Map[String, String] = Map.empty): Seq[Changelog.TxnSink] = {
    cat.createTable("s.raw", rawSchema, properties = props)
    cat.createTable("s.cur", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("seq", LongType))), properties = props)
    Seq(
      Changelog.TxnSink("s.raw", b => b),
      Changelog.TxnSink("s.cur", b => b, mergeKey = Some(("id", "seq"))))
  }

  private def counts(cat: LakeCatalog): (Long, Long) =
    (cat.loadTable("s.raw").toDF.count(), cat.loadTable("s.cur").toDF.count())

  test("atomic raw+derived apply; replayed batch ids are skipped on BOTH " +
    "sinks via one marker") {
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-tis").toString)
    val sinks = mkSinks(cat)
    val b0 = batch(("I", 1L, "a", 1L), ("I", 2L, "b", 2L), ("U", 1L, "a2", 3L))
    Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1")
    assert(counts(cat) === (3L, 2L))
    val cur = cat.loadTable("s.cur").toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(cur === Seq(1L -> "a2", 2L -> "b"), "last-wins derived state")
    // checkpoint-recovery replay of the SAME batch: zero duplicates
    Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1")
    assert(counts(cat) === (3L, 2L))
    // a later batch applies, an OLDER id is skipped too
    Changelog.applyTransactionalBatch(cat, sinks,
      batch(("I", 3L, "c", 4L)), 1L, "w1")
    Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1")
    assert(counts(cat) === (4L, 3L))
    // no residue on either table
    for (t <- Seq("s.raw", "s.cur")) {
      val m = cat.loadTable(t).meta
      assert(!m.refs.keys.exists(_.startsWith("txn-")))
      assert(!m.properties.contains(LakeTransaction.FenceKey))
    }
  }

  test("crash while STAGING (no commit): the replay drops the stale " +
    "attempt's branches and applies exactly once") {
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-tis").toString)
    val sinks = mkSinks(cat)
    val b0 = batch(("I", 1L, "a", 1L))
    // a coordinator that staged BOTH sinks and died pre-commit — branch
    // names carry the ingest writer prefix, like a real attempt's
    val dead = cat.beginTransaction("igst-w1-b0-deadbeef")
    dead.table("s.raw").append(b0, Map("streaming.batch-id.w1" -> "0"))
    dead.table("s.cur").append(batch(("I", 9L, "zzz", 9L))
      .selectExpr("id", "v", "seq"))
    assert(cat.loadTable("s.raw").meta.refs.keys
      .exists(_.startsWith("txn-igst-w1-")), "test premise: stale branch")
    Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1")
    assert(counts(cat) === (1L, 1L), "staged-only rows must NOT leak")
    assert(cat.loadTable("s.cur").toDF.select("id").head().getLong(0) === 1L)
    for (t <- Seq("s.raw", "s.cur"))
      assert(!cat.loadTable(t).meta.refs.keys.exists(_.startsWith("txn-")))
  }

  test("crash AFTER the commit decision with zero publishes: the replay " +
    "rolls the attempt forward through the fence recovery and skips — " +
    "exactly once, both sinks") {
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-tis").toString)
    val sinks = mkSinks(cat, Map(LakeTransaction.FenceTtlKey -> "0"))
    val b0 = batch(("I", 1L, "a", 1L), ("I", 2L, "b", 2L))
    // replicate the sink's own staging exactly, then die post-decision
    val dead = cat.beginTransaction("igst-w1-b0-cafebabe")
    dead.table("s.raw").append(b0, Map("streaming.batch-id.w1" -> "0"))
    dead.table("s.cur").mergeByKeys("id",
      b0.select(col("id")), b0.selectExpr("id", "v", "seq"),
      Map("streaming.batch-id.w1" -> "0"))
    val parts = dead.participants
    dead.writeManifest(parts)
    dead.fenceAll(parts)
    assert(dead.decide("commit"))
    // coordinator dead. Main shows nothing yet:
    assert(counts(cat) === (0L, 0L))
    // the replay: cleanup meets the fence → TTL recovery rolls FORWARD →
    // marker re-check skips the batch
    Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1")
    assert(counts(cat) === (2L, 2L), "exactly once — rolled forward, not reapplied")
    for (t <- Seq("s.raw", "s.cur")) {
      val m = cat.loadTable(t).meta
      assert(!m.properties.contains(LakeTransaction.FenceKey))
      assert(!m.refs.keys.exists(_.startsWith("txn-")))
    }
    // and the next batch proceeds normally
    Changelog.applyTransactionalBatch(cat, sinks,
      batch(("D", 1L, null, 3L)), 1L, "w1")
    assert(counts(cat) === (3L, 1L))
  }

  test("a FRESH fence (coordinator presumed live) fails the batch loudly " +
    "instead of corrupting it; the stream's retry succeeds once resolved") {
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-tis").toString)
    val sinks = mkSinks(cat) // default TTL: 5 min
    val b0 = batch(("I", 1L, "a", 1L))
    val dead = cat.beginTransaction("igst-w1-b0-feedface")
    dead.table("s.raw").append(b0, Map("streaming.batch-id.w1" -> "0"))
    val parts = dead.participants
    dead.writeManifest(parts); dead.fenceAll(parts)
    val e = intercept[CommitConflictException](
      Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1"))
    assert(e.getMessage.contains("fenced"))
    // operator (or TTL) resolves it; the retried batch then applies.
    // recoverTransactions aborts the undecided attempt.
    assert(cat.recoverTransactions().values.toSeq === Seq("abort"))
    Changelog.applyTransactionalBatch(cat, sinks, b0, 0L, "w1")
    assert(counts(cat) === (1L, 1L))
  }

  test("end-to-end streaming: startTransactionalIngest keeps raw and " +
    "derived consistent across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-tis").toString)
    val sinks = mkSinks(cat)
    val mem = MemoryStream[String]
    val parsed = mem.toDF().select(
      split(col("value"), ",").getItem(0).as("op"),
      split(col("value"), ",").getItem(1).cast(LongType).as("id"),
      split(col("value"), ",").getItem(2).as("v"),
      split(col("value"), ",").getItem(3).cast(LongType).as("seq"))
    val q = Changelog.startTransactionalIngest(cat, parsed, sinks,
      Files.createTempDirectory("graft-tis-ckpt").toString, triggerMs = 100L)
    try {
      mem.addData("I,1,a,1", "I,2,b,2")
      q.processAllAvailable()
      assert(counts(cat) === (2L, 2L))
      mem.addData("U,1,a2,3", "I,3,c,4")
      q.processAllAvailable()
      assert(counts(cat) === (4L, 3L))
      val cur = cat.loadTable("s.cur").toDF.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(cur === Seq(1L -> "a2", 2L -> "b", 3L -> "c"))
    } finally q.stop()
  }
}
