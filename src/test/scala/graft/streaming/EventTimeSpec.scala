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

  test("streaming gap-sessions match q54's batch sessionization on the same clickstream data") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // 1. Drive the LIVE clickstream source (rate-based datagen) to get real
    //    generated rows — the "same data" both sides will sessionize.
    val src = Changelog.clickstreamSource(spark, rowsPerSecond = 500)
    val raw = {
      val q = src.writeStream.format("memory").queryName("cs_sess_raw")
        .outputMode("append").start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        while (spark.table("cs_sess_raw").count() < 100 &&
               System.currentTimeMillis() < deadline) {
          Thread.sleep(300); q.processAllAvailable()
        }
        spark.table("cs_sess_raw")
          .select("user_id", "event", "site_id", "url", "on_site_seconds",
            "viewed_percent", "timestamp")
          .collect().toSeq
      } finally q.stop()
    }
    assert(raw.size >= 100, s"clickstream source produced only ${raw.size} rows")
    // 2. Remap event times deterministically (the datagen stamps wall-clock
    //    seconds — useless for gap analysis): sort for a stable order, then
    //    ts_us(i) = hour-scale pseudo-random spread + i seconds. Injective
    //    (same hour bucket → second offsets differ by < 1h), and a per-user
    //    delta can NEVER equal the gap exactly (delta = whole hours + a
    //    nonzero sub-hour remainder), so the batch break rule (diff > gap)
    //    and session_window's merge rule (diff < gap) agree on every pair.
    val gapUs = 24L * 3600 * 1000000 // 24h, q54's shape at test scale
    val base = 1700000000000000L
    val evs = raw.sortBy(_.toString).take(150).zipWithIndex.map { case (r, i) =>
      (base + ((i * 37) % 1000).toLong * 3600000000L + i * 1000000L,
        r.getAs[String]("user_id"))
    }
    // 3. Batch side: q54's LAG-break + running-sum session ids + per-user
    //    summary, on the remapped rows.
    evs.toDF("ts_us", "user_id").createOrReplaceTempView("cs_sess_ev")
    val batch = spark.sql(
      s"""WITH o AS (
         |  SELECT user_id, ts_us,
         |    CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
         |      > $gapUs THEN 1 ELSE 0 END AS brk
         |  FROM cs_sess_ev),
         |s AS (
         |  SELECT user_id, ts_us,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
         |      ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o),
         |g AS (
         |  SELECT user_id, sess, COUNT(*) AS n_ev,
         |    MAX(ts_us) - MIN(ts_us) AS dur_us
         |  FROM s GROUP BY user_id, sess)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
         |  CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
         |  CAST(MAX(dur_us) AS BIGINT) AS max_session_dur_us
         |FROM g GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 4. Stream side: the same rows through session_window, fed out of
    //    order across three micro-batches, plus a far-future sentinel user
    //    whose row pushes the watermark past every session so append mode
    //    emits them all. Watermark delay covers the full remapped span, so
    //    cross-batch disorder drops nothing.
    val mem = MemoryStream[(Long, String)]
    val events = mem.toDF()
      .select(timestamp_micros(col("_1")).as("ts"), col("_2").as("user_id"),
        lit(0).as("on_site_seconds"))
    val sessions = EventTime.sessionized(events, gap = "24 hours",
      watermarkDelay = "2000 hours")
    val q = sessions.writeStream.format("memory").queryName("cs_sess_stream")
      .outputMode("append").start()
    try {
      (0 until 3).foreach { b =>
        mem.addData(evs.zipWithIndex.collect { case (e, i) if i % 3 == b => e }: _*)
        q.processAllAvailable()
      }
      mem.addData((base + 10000L * 3600000000L, "zz_flush"))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("cs_sess_stream")
      .filter(col("user_id") =!= "zz_flush")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"),
        // session_window end = last event + gap; subtract it back out so
        // duration means max(ts)-min(ts), the batch definition
        max(unix_micros(col("session_end")) - unix_micros(col("session_start"))
          - lit(gapUs)).as("max_session_dur_us"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(stream === batch,
      s"stream/batch session summaries diverge: stream=$stream batch=$batch")
    // the data must actually exercise gap semantics: some user has >1
    // session and some session has >1 event
    assert(batch.values.exists(_._1 > 1), "no user split into multiple sessions")
    assert(batch.values.exists(_._3 > 1), "no session merged multiple events")
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

  test("transformWithState: per-user running aggregate on RocksDB state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(String, Double)]
      val events = mem.toDF().toDF("user_id", "value")
      val out = EventTime.runningUserAggTws(events)
      val q = out.writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      try {
        mem.addData(("u1", 10.0), ("u1", 5.0), ("u2", 1.0))
        q.processAllAvailable()
        mem.addData(("u1", 2.5), ("u2", 1.5))
        q.processAllAvailable()
        val last = spark.table("tws").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
        // state carried across micro-batches: running totals, not per-batch
        assert(last("u1") === ("u1", 3L, 17.5))
        assert(last("u2") === ("u2", 2L, 2.5))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join: attribution within the window, state bounded") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // impressions (user, imp_ts, imp_id) ⋈ clicks (user, click_ts, click_id):
    // click attributes to impressions within 1 minute BEFORE it
    val imps = MemoryStream[(Timestamp, String, String)]
    val clicks = MemoryStream[(Timestamp, String, String)]
    val l = imps.toDF().toDF("imp_ts", "imp_user", "imp_id")
    val r = clicks.toDF().toDF("click_ts", "click_user", "click_id")
    val joined = EventTime.intervalJoin(l, r,
      leftKey = "imp_user", rightKey = "click_user",
      leftTs = "imp_ts", rightTs = "click_ts",
      within = "1 minute", watermarkDelay = "30 seconds")
      .select("imp_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // out-of-order across micro-batches: clicks arrive before their
      // impressions land in a later batch
      clicks.addData((ts("2024-01-01 10:00:30"), "u1", "c1"), // attributes to i1
        (ts("2024-01-01 10:02:00"), "u2", "c2"))             // no impression in window
      q.processAllAvailable()
      imps.addData((ts("2024-01-01 10:00:00"), "u1", "i1"),
        (ts("2024-01-01 10:00:40"), "u1", "i2"),  // AFTER c1 → no match
        (ts("2024-01-01 9:59:00"), "u2", "i3"))   // 3 min before c2 → outside window
      q.processAllAvailable()
      // a second click inside i2's window: one impression, two windows
      clicks.addData((ts("2024-01-01 10:01:10"), "u1", "c3")) // matches i1+i2? i1 is 70s before → out; i2 30s before → in
      q.processAllAvailable()
      // advance both watermarks far beyond i1's horizon so its state expires
      imps.addData((ts("2024-01-01 10:30:00"), "u9", "i_adv"))
      clicks.addData((ts("2024-01-01 10:30:00"), "u9", "c_adv"))
      q.processAllAvailable()
      // this click would match i1 by time, but i1's state is expired AND
      // the click is far behind the click watermark → dropped, no output
      clicks.addData((ts("2024-01-01 10:00:50"), "u1", "c_late"))
      q.processAllAvailable()
      val got = spark.table("attrib").collect()
        .map(row => (row.getString(0), row.getString(1))).toSet
      val expected = Set(("i1", "c1"), ("i2", "c3"), ("i_adv", "c_adv"))
      assert(got === expected)
      // batch parity for the in-window feeds (late row excluded — batch
      // has no watermark to drop it)
      val li = Seq((ts("2024-01-01 10:00:00"), "u1", "i1"),
        (ts("2024-01-01 10:00:40"), "u1", "i2"),
        (ts("2024-01-01 9:59:00"), "u2", "i3"),
        (ts("2024-01-01 10:30:00"), "u9", "i_adv"))
        .toDF("imp_ts", "imp_user", "imp_id")
      val rc = Seq((ts("2024-01-01 10:00:30"), "u1", "c1"),
        (ts("2024-01-01 10:02:00"), "u2", "c2"),
        (ts("2024-01-01 10:01:10"), "u1", "c3"),
        (ts("2024-01-01 10:30:00"), "u9", "c_adv"))
        .toDF("click_ts", "click_user", "click_id")
      val batch = li.join(rc, col("imp_user") === col("click_user") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr("INTERVAL 1 minute"))
        .select("imp_id", "click_id").collect()
        .map(row => (row.getString(0), row.getString(1))).toSet
      assert(got === batch)
    } finally q.stop()
  }
}
