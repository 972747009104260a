package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B for q64 — the SQL self-join form plans the fingerprint
  * pipeline (Generate → Exchange(h) → Sort → Window(df) → Filter) under
  * BOTH join branches; runtime ReusedExchange (r17-gated) dedups the
  * shuffle write, but each branch re-runs the post-shuffle Sort + Window
  * + Filter, and one branch feeds a BroadcastExchange whose build is
  * corpus-sized (scale-adaptive at sf0.1 only because the size estimate
  * is small). The MAT form materializes the filtered fingerprint stream
  * (doc_id BIGINT, h BIGINT — the q77 narrow-cut-point criterion) behind
  * an eager localCheckpoint; LogicalRDD keeps the checkpointed plan's
  * output partitioning+ordering (hash(h) / h ASC), so the self-join can
  * zip the two reads with NO further exchange, sort, or broadcast.
  * Results must be identical (asserted). Prints both plans + interleaved
  * medians. Usage: runMain graft.tools.WinnowAB <sfDir> [reps]
  */
object WinnowAB {

  private val fltSql = """WITH fp AS (
    |  SELECT doc_id, explode(winnow_fingerprints_long(text, 8, 4)) AS h FROM documents)
    |SELECT doc_id, h FROM (
    |  SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM fp) t
    |WHERE df <= 10""".stripMargin

  /** Materialized-fingerprint variant, result-identical to TextOps.q64. */
  def q64Mat(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    val flt = s.sql(fltSql).localCheckpoint() // eager; (doc_id, h) longs
    val a = flt.select(col("doc_id").as("a"), col("h"))
    val b = flt.select(col("doc_id").as("b"), col("h"))
    a.join(b, Seq("h")).where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).cast("long").as("shared"))
      .where(col("shared") >= 5)
      .orderBy(col("shared").desc, col("a"), col("b"))
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
    val sql = graft.QueryRegistry.byName("q64_winnow_overlap")
    val x = sql.fn(spark, sfDir).collect().map(_.toString)
    val y = q64Mat(spark, sfDir).collect().map(_.toString)
    require(x.sameElements(y),
      s"mat variant diverged (${x.length} vs ${y.length} rows):\n${x.take(3).mkString("\n")}\nvs\n${y.take(3).mkString("\n")}")
    println(s"[ab] parity OK over ${x.length} rows")
    println("[ab] === MAT plan (join stage only; checkpoint job excluded) ===")
    q64Mat(spark, sfDir).explain("formatted")
    def once(tag: String, fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag run: $s%.2f s")
      s
    }
    val (ts, tm) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      ts += once("sql", () => sql.fn(spark, sfDir))
      tm += once("mat", () => q64Mat(spark, sfDir))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ab] MEDIANS sql=${med(ts.result())}%.2f s mat=${med(tm.result())}%.2f s")
    spark.stop()
  }
}
