package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B for VERDICT r17 item 3 — q22's prefix-join exchange payload.
  *
  * SHIPPED form (q22): the prefix explode CARRIES (ws, ids) so candidate
  * pairs verify inside the join — ONE reused exchange, but every group's
  * payload rides it p(n) = n−ceil(.9n)+1 times (once per prefix token).
  *
  * SLIM form (PPJoin/VernicaJoin-style): the prefix exchange ships only
  * (lang, tok, gid, n); candidates dedupe by (gid_a, gid_b) on slim rows
  * (the aggregation the emit-once filter removed — but now over 4-long
  * rows, not payloads), then TWO fetch joins back to the collapsed groups
  * attach (ws, ids) for verification — each group's payload crosses the
  * network twice total, independent of p(n).
  *
  * Scale math: payload-bytes shipped = p̄ × |g| (shipped) vs 2 × |g| +
  * slim candidates (slim) — the slim form wins whenever the mean prefix
  * length p̄ > 2, i.e. docs with ≳ 10 distinct tokens. The sf0.1 bench
  * corpus sits near that break-even AND adds two join stages of fixed
  * cost, which is why r12 measured fetch-joins slower; this tool prints
  * both forms' wall clock + shuffle bytes/records so the decision is a
  * number, not a memory. Both forms must produce identical pair sets
  * (asserted).
  *
  * Usage: runMain graft.tools.PrefixJoinAB <sfDir> [reps]
  */
object PrefixJoinAB {

  /** The slim pipeline, result-identical to TextOps.q22. */
  def q22Slim(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    val w = s.table("documents").select(
      col("doc_id"), col("lang"),
      graft.functions.TokenSetHash.of(col("text")).as("ws"))
    val g = w.groupBy("lang", "ws")
      .agg(min("doc_id").as("gid"), collect_list("doc_id").as("ids"))
      .withColumn("n", size(col("ws")))
    val p = col("n") - floor((col("n") * 9 + 9) / 10.0).cast("int") + 1
    val prefSlim = g.select(col("lang"), col("gid"), col("n"),
      explode(slice(col("ws"), lit(1), p)).as("tok"))
    val cand = prefSlim.select(col("lang"), col("tok"), col("gid").as("gid_a"),
        col("n").as("na"))
      .hint("SHUFFLE_HASH")
      .join(prefSlim.select(col("lang"), col("tok"), col("gid").as("gid_b"),
        col("n").as("nb")).hint("SHUFFLE_HASH"), Seq("lang", "tok"))
      .filter(col("gid_a") <= col("gid_b"))
      .filter(col("na") * 10 >= col("nb") * 9 && col("nb") * 10 >= col("na") * 9)
      // the slim rows can't run the emit-once filter (no arrays) — dedupe
      // multi-prefix collisions with a distinct on the 3-long key instead
      .select(col("lang"), col("gid_a"), col("gid_b")).distinct()
    val ga = g.select(col("lang"), col("gid").as("gid_a"), col("ws").as("wa"),
      col("n").as("na"), col("ids").as("ids_a"))
    val gb = g.select(col("lang"), col("gid").as("gid_b"), col("ws").as("wb"),
      col("n").as("nb"), col("ids").as("ids_b"))
    val gp = cand
      .join(ga, Seq("lang", "gid_a"))
      .join(gb, Seq("lang", "gid_b"))
      .select(col("gid_a"), col("gid_b"), col("ids_a"), col("ids_b"),
        graft.functions.SortedIntersectCount.count(col("wa"), col("wb")).as("i"),
        col("na"), col("nb"))
      .select(col("gid_a"), col("gid_b"), col("ids_a"), col("ids_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    val cross = gp
      .select(col("gid_a"), col("gid_b"),
        explode(col("ids_a")).as("da"), col("ids_b"), col("jaccard"))
      .select(col("gid_a"), col("gid_b"), col("da"),
        explode(col("ids_b")).as("db"), col("jaccard"))
      .filter(col("gid_a") =!= col("gid_b") || col("da") < col("db"))
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("jaccard"))
    cross.orderBy("id_a", "id_b")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var bytes = 0L
    @volatile var records = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
    })
    val shipped = graft.QueryRegistry.byName("q22_jaccard_pairs")
    // identical results first (the experiment is void otherwise)
    val a = shipped.fn(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
    val b = q22Slim(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9)))
    require(a.sameElements(b),
      s"slim variant diverged: ${a.length} vs ${b.length} rows")
    println(s"[ab] parity OK over ${a.length} pairs")
    def once(tag: String, fn: () => DataFrame): Double = {
      org.apache.spark.sql.graftbridge.ListenerBridge.flush(spark.sparkContext)
      val (b0, r0) = (bytes, records)
      val t0 = System.nanoTime()
      fn().count()
      val s = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.ListenerBridge.flush(spark.sparkContext)
      println(f"[ab] $tag run: $s%.2f s shuffle_bytes=${bytes - b0}%,d records=${records - r0}%,d")
      s
    }
    // interleave to absorb box drift
    val (ts, tl) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      ts += once("shipped", () => shipped.fn(spark, sfDir))
      tl += once("slim   ", () => q22Slim(spark, sfDir))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ab] MEDIANS shipped=${med(ts.result())}%.2f s slim=${med(tl.result())}%.2f s")
    spark.stop()
  }
}
