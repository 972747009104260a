package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

/** Dev A/B for the r18 q62 change — the old Decontaminate form planned
  * the eval key pipeline (scan + md5 + DISTINCT exchange) twice: once in
  * the eager bloom-build job and once, re-planned from source, as the
  * verify anti-join's right side. The new form materializes the distinct
  * key set once behind an eager localCheckpoint and feeds both
  * consumers. OLD below is an inline replica of the pre-r18 operator
  * body wrapped in q62's aggregate; NEW is the registry q62. Results
  * must be identical (asserted). Prints interleaved wall-clock medians.
  * Usage: runMain graft.tools.DeconAB <sfDir> [reps]
  */
object DeconAB {

  /** Pre-r18 operator form, result-identical to q62. */
  def q62Old(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    val docs = s.table("documents")
    val eval = docs.filter(col("doc_id") % 97 < 5)
      .select(md5(lower(col("text"))).as("fp"))
    val corpusKey = md5(lower(col("text")))
    val bloom = Decontaminate.bloomBytes(eval.select(col("fp")).distinct(),
      "fp", expectedItems = 1L << 16, numBits = 1L << 20)
    val hit = Decontaminate.mightContain(bloom, corpusKey)
    val clean = docs.filter(!hit)
    val verified = docs.filter(hit)
      .join(eval.select(col("fp").as("_decon_key")).distinct(),
        corpusKey === col("_decon_key"), "left_anti")
    clean.unionByName(verified)
      .groupBy("lang", "source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("total_chars"))
      .orderBy("lang", "source")
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
    val nw = graft.QueryRegistry.byName("q62_bloom_decontaminate")
    val a = q62Old(spark, sfDir).collect().map(_.toString)
    val b = nw.fn(spark, sfDir).collect().map(_.toString)
    require(a.sameElements(b),
      s"shared-checkpoint variant diverged:\n${a.take(3).mkString("\n")}\nvs\n${b.take(3).mkString("\n")}")
    println(s"[ab] parity OK over ${a.length} rows")
    def once(tag: String, fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag run: $s%.2f s")
      s
    }
    val (to, tn) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      to += once("old", () => q62Old(spark, sfDir))
      tn += once("new", () => nw.fn(spark, sfDir))
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ab] MEDIANS old=${med(to.result())}%.2f s new=${med(tn.result())}%.2f s")
    spark.stop()
  }
}
