package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Event-time semantics: windows close on watermark advance, late data
  * is dropped, session gaps split sessions, dedup state is bounded. */
class EventTimeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FileContext-based checkpoint IO forks a `readlink` subprocess per
    // rename (hadoop Shell), which can hang under constrained sandboxes;
    // the FileSystem-based manager renames in-JVM. Checksum writes add an
    // async close-await on the same path — off for local-FS checkpoints.
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Run a streaming frame to a memory sink in append mode, feeding
    * batches and returning the collected rows after each addData. */
  def runAppend(mem: MemoryStream[(Timestamp, String, String, Int)],
                out: DataFrame, name: String,
                feeds: Seq[Seq[(Timestamp, String, String, Int)]]): Seq[org.apache.spark.sql.Row] = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feeds.foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("watermarked tumbling window: closes when watermark passes, late rows dropped") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String, Int)]
    val events = mem.toDF().toDF("ts", "event", "user_id", "on_site_seconds")
    val counts = EventTime.windowedCounts(events, width = "1 minute",
      watermarkDelay = "1 minute")
    val rows = runAppend(mem, counts, "win_counts", Seq(
      Seq((ts("2024-01-01 10:00:10"), "view_item", "u1", 5),
          (ts("2024-01-01 10:00:20"), "view_item", "u2", 5)),
      // advance event time far enough to close the 10:00 window
      Seq((ts("2024-01-01 10:05:00"), "login", "u3", 1)),
      // this row is 4+ minutes behind the watermark → dropped
      Seq((ts("2024-01-01 10:00:30"), "view_item", "u4", 5)),
      Seq((ts("2024-01-01 10:10:00"), "logout", "u3", 1))))
    val viewWindow = rows.filter(_.getAs[String]("event") == "view_item")
    assert(viewWindow.size === 1)
    assert(viewWindow.head.getAs[Long]("n") === 2) // late u4 row not counted
    assert(viewWindow.head.getAs[Timestamp]("window_start") === ts("2024-01-01 10:00:00"))
  }

  test("session windows split on gap") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String, Int)]
    val events = mem.toDF().toDF("ts", "event", "user_id", "on_site_seconds")
    val sessions = EventTime.sessionized(events, gap = "30 seconds",
      watermarkDelay = "10 seconds")
    val rows = runAppend(mem, sessions, "sessions", Seq(
      Seq((ts("2024-01-01 10:00:00"), "login", "u1", 10),
          (ts("2024-01-01 10:00:20"), "view_item", "u1", 20),
          // > 30s gap → second session
          (ts("2024-01-01 10:02:00"), "purchase", "u1", 30)),
      Seq((ts("2024-01-01 10:30:00"), "login", "u9", 1)))) // advance watermark
    val u1 = rows.filter(_.getAs[String]("user_id") == "u1")
    assert(u1.size === 2)
    assert(u1.map(_.getAs[Long]("n_events")).sorted.toSeq === Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark dedups repeated event ids") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String, Int)]
    val events = mem.toDF().toDF("ts", "event_id", "user_id", "v")
    val dedup = EventTime.dedupWithinWatermark(events, Seq("event_id"),
      watermarkDelay = "1 minute")
    val rows = runAppend(mem, dedup, "dedup", Seq(
      Seq((ts("2024-01-01 10:00:00"), "e1", "u1", 1),
          (ts("2024-01-01 10:00:01"), "e1", "u1", 1), // dup in same batch
          (ts("2024-01-01 10:00:02"), "e2", "u1", 1)),
      Seq((ts("2024-01-01 10:00:03"), "e1", "u1", 1)))) // dup across batches
    assert(rows.map(_.getAs[String]("event_id")).sorted.toSeq === Seq("e1", "e2"))
  }

  test("mapGroupsWithState keeps running per-user aggregates") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String, Int)]
    val events = mem.toDF().toDF("ts", "event", "user_id", "v")
      .select(col("user_id"), col("event"), col("ts"))
    val state = EventTime.runningUserState(events)
    val q = state.writeStream.format("memory").queryName("ustate")
      .outputMode("update").start()
    try {
      mem.addData((ts("2024-01-01 10:00:00"), "login", "u1", 1),
        (ts("2024-01-01 10:00:01"), "view_item", "u1", 1))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 10:00:02"), "purchase", "u1", 1))
      q.processAllAvailable()
      val last = spark.table("ustate").filter(col("userId") === "u1")
        .orderBy(col("nEvents").desc).head
      assert(last.getAs[Long]("nEvents") === 3L)
      assert(last.getAs[String]("lastEvent") === "purchase")
    } finally q.stop()
  }
}
