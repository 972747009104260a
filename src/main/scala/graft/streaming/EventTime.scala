package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Event-time streaming extensions (beyond the reference's
  * processing-time-only jobs — SURVEY.md §2.10 notes the reference has no
  * watermarks/windows; these are the Spark-first additions a clickstream
  * pipeline needs): watermarked tumbling/sliding windows, session windows,
  * watermark-bounded dedup, and custom per-key state.
  *
  * Scale notes: all of these keep state in the state store partitioned by
  * key/window — the watermark bounds state size (expired windows are
  * dropped), which is what makes them runnable indefinitely at high
  * event rates.
  */
object EventTime {

  /** Tumbling (or sliding, if slide != width) event-time window counts
    * with late-data tolerance `watermarkDelay`. Input needs an event-time
    * column `ts` (TimestampType) — late rows beyond the watermark are
    * dropped instead of corrupting closed windows. */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     width: String = "1 minute", slide: Option[String] = None,
                     watermarkDelay: String = "2 minutes"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), width, s)
      case None => window(col(tsCol), width)
    }
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(win.as("w"), col("event"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event"), col("n"))
  }

  /** Session windows: events within `gap` of each other (per user)
    * collapse into one session row. */
  def sessionized(events: DataFrame, tsCol: String = "ts",
                  gap: String = "30 seconds",
                  watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("on_site_seconds")).as("total_on_site"))
      .select(col("s.start").as("session_start"), col("s.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_on_site"))

  /** Exactly-once-per-id dedup bounded by the watermark — the streaming
    * analog of exact dedup (state for ids older than the watermark is
    * dropped, so state size stays bounded). */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           tsCol: String = "ts",
                           watermarkDelay: String = "2 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  case class UserRunning(userId: String, nEvents: Long, lastEvent: String,
                         lastTsMicros: Long)

  /** Custom keyed state via mapGroupsWithState: per-user running event
    * count + last event type (the KeyValueGroupedDataset custom-state
    * shape). "Last" is BY EVENT TIME, not iterator order —
    * mapGroupsWithState presents a group's rows in shuffle/arrival order,
    * so taking the iterator's last element would store whichever row a
    * task happened to see last (nondeterministic), and the wrong value
    * would then seed every subsequent batch through the state. The
    * event-time max also carries across batches via `lastTsMicros`, so a
    * late-arriving old event can never overwrite a newer state.
    * NoTimeout: with a timeout configured Spark schedules continuous
    * empty timeout-check batches even when no data arrives — wasteful in
    * micro-batch pipelines; expire idle keys with a TTL state store
    * policy or a watermark instead. */
  def runningUserState(events: DataFrame): Dataset[UserRunning] = {
    implicit val enc = Encoders.product[UserRunning]
    implicit val tupleEnc =
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.scalaLong)
    events.selectExpr("user_id", "event", "unix_micros(ts) AS tsu")
      .as[(String, String, Long)](tupleEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout) { (userId, rows, state) =>
        val batch = rows.toSeq
        val prev = state.getOption.getOrElse(UserRunning(userId, 0L, "", Long.MinValue))
        // deterministic winner: max (ts, event) — event breaks exact-ts ties
        val winner = batch.maxByOption(r => (r._3, r._2))
        val next =
          if (winner.exists(w => w._3 >= prev.lastTsMicros))
            UserRunning(userId, prev.nEvents + batch.size,
              winner.get._2, winner.get._3)
          else prev.copy(nEvents = prev.nEvents + batch.size)
        state.update(next)
        next
      }
  }

  case class UserAgg(userId: String, nEvents: Long, revenue: Double)

  /** Per-user running aggregate on Spark 4's transformWithState — the
    * successor to mapGroupsWithState ([[runningUserState]]) and the shape
    * to prefer going forward: typed named state handles with BUILT-IN TTL
    * (state for idle users expires without the timeout-batch churn the
    * old API forced — see runningUserState's NoTimeout note), multiple
    * independent state variables per key, and timer support, all on the
    * RocksDB state store (the provider the API requires; the store that
    * actually holds 100 TB-scale keyed state, spilling off-heap instead
    * of growing the executor heap).
    *
    * Input: (user_id, value) pairs; output per input batch and key: the
    * updated running (event count, revenue sum). */
  class UserAggProcessor(ttl: Option[java.time.Duration])
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Double), UserAgg] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        ttl.map(org.apache.spark.sql.streaming.TTLConfig(_))
          .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserAgg] = {
      val (n0, r0) = Option(state.get()).getOrElse((0L, 0.0))
      var n = n0; var r = r0
      rows.foreach { case (_, v) => n += 1; r += v }
      state.update((n, r))
      Iterator.single(UserAgg(key, n, r))
    }
  }

  /** transformWithState pipeline: requires the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass`). With a TTL the
    * query runs in processing-time mode, which schedules continuous
    * eviction micro-batches even when idle (the same churn the old API's
    * timeouts caused — accept it only when state EVICTION is the point);
    * `ttl = None` runs TimeMode.None — data-driven batches only. */
  def runningUserAggTws(events: DataFrame,
                        ttl: Option[java.time.Duration] = None
                       ): Dataset[UserAgg] = {
    implicit val outEnc = Encoders.product[UserAgg]
    implicit val inEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
    events.selectExpr("user_id", "value").as[(String, Double)](inEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new UserAggProcessor(ttl),
        if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Stream-stream event-time interval join (click attribution shape):
    * every right-side row joins left-side rows with the same key whose
    * event time lies in `[right.ts − within, right.ts]` — e.g. a click
    * attributes to impressions up to `within` before it.
    *
    * BOTH sides are watermarked and the join condition bounds event time
    * in BOTH directions, which is what lets Spark expire join state: a
    * left row can only ever match right rows in `[l.ts, l.ts + within]`,
    * so once the right watermark passes that horizon the row is dropped
    * from the state store. Without the time bound a stream-stream join
    * must buffer both sides forever — the unbounded-state trap this
    * operator exists to avoid. At scale, state is partitioned by key and
    * bounded by (rate × within), independent of stream lifetime.
    *
    * Column names must be fully disjoint between the two sides (alias
    * before calling) — the output carries both sides' columns. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   within: String = "1 minute",
                   watermarkDelay: String = "2 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }
}
