package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B for VERDICT r17 item 6 — q77's top/bot UNION statically plans
  * the whole scoring pipeline twice (runtime ReusedExchange dedups the
  * final per-doc aggregate, PlanSpec-gated r17). The MAT form computes
  * the tiny per-doc score table once behind an eager localCheckpoint,
  * then runs both TakeOrdered passes over the materialized rows — half
  * the static plan, at the price of materialization + lost stage fusion
  * (r12 measured that trade NEGATIVE for q22's collapse at sf0.1).
  * Results must be identical (asserted). Prints interleaved wall-clock
  * medians. Usage: runMain graft.tools.FluencyAB <sfDir> [reps]
  */
object FluencyAB {

  private val scoreSql = """WITH t AS (
    |  SELECT doc_id, split(lower(trim(text)), '\\s+') AS w FROM documents),
    |tok AS (SELECT wx AS w FROM t LATERAL VIEW explode(w) e AS wx),
    |c1 AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
    |bg AS (SELECT doc_id, element_at(w, pos) AS w1,
    |         concat(element_at(w, pos), ' ', element_at(w, pos + 1)) AS b
    |       FROM t LATERAL VIEW explode(sequence(1, size(w) - 1)) e AS pos
    |       WHERE size(w) >= 2),
    |bgc AS (SELECT doc_id, w1, COUNT(*) OVER (PARTITION BY b) AS c2 FROM bg),
    |p AS (SELECT bgc.doc_id,
    |        (((bgc.c2 + 1) * 1000000) DIV (c1.c + v.v)) AS p_fp
    |      FROM bgc JOIN c1 ON bgc.w1 = c1.w CROSS JOIN v)
    |SELECT doc_id, SUM(p_fp) DIV COUNT(*) AS fluency_fp
    |FROM p GROUP BY doc_id""".stripMargin

  /** Materialized-score variant, result-identical to TextOps.q77. */
  def q77Mat(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    val sc = s.sql(scoreSql).localCheckpoint() // eager, tiny (one row/doc)
    val top = sc.orderBy(col("fluency_fp").desc, col("doc_id")).limit(10)
      .select(lit("fluent").as("band"), col("doc_id"), col("fluency_fp"))
    val bot = sc.orderBy(col("fluency_fp").asc, col("doc_id")).limit(10)
      .select(lit("junk").as("band"), col("doc_id"), col("fluency_fp"))
    top.unionAll(bot)
      .select(col("band"), col("doc_id"), col("fluency_fp").cast("long").as("fluency_fp"))
      .orderBy("band", "doc_id")
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
    val union = graft.QueryRegistry.byName("q77_bigram_fluency")
    val a = union.fn(spark, sfDir).collect().map(_.toString)
    val b = q77Mat(spark, sfDir).collect().map(_.toString)
    require(a.sameElements(b), s"mat variant diverged:\n${a.take(3).mkString("\n")}\nvs\n${b.take(3).mkString("\n")}")
    println(s"[ab] parity OK over ${a.length} rows")
    def once(tag: String, fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag run: $s%.2f s")
      s
    }
    val (tu, tm) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      tu += once("union", () => union.fn(spark, sfDir))
      tm += once("mat  ", () => q77Mat(spark, sfDir))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ab] MEDIANS union=${med(tu.result())}%.2f s mat=${med(tm.result())}%.2f s")
    spark.stop()
  }
}
