package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev utility: time q22 design variants in one JVM (warm loops) to find a
  * stable formulation. Not part of the query surface. */
object J22Probe {

  def variantB(s: SparkSession): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    val tok = s.table("documents").select(
      col("doc_id"), col("lang"),
      explode(array_distinct(transform(split(col("text"), "\\s+"), w => xxhash64(w)))).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
    val ranked = tok.join(broadcast(freq), "tok")
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("tf", "tok")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val pref = ranked
      .filter(col("rn") <= col("n") - floor((col("n") * 9 + 9) / 10.0).cast("int") + 1)
      .select("lang", "tok", "doc_id")
    val cand = pref.select(col("lang"), col("tok"), col("doc_id").as("id_a"))
      .join(pref.select(col("lang"), col("tok"), col("doc_id").as("id_b")), Seq("lang", "tok"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // arrays need no particular order for intersect/union; build once,
    // groupBy barrier prevents lambda inlining past the join
    val w = tok.groupBy("doc_id").agg(collect_list("tok").as("ws"), count(lit(1)).as("n"))
    val j = cand.repartition(cores)
      .join(w.select(col("doc_id").as("id_a"), col("ws").as("wa"), col("n").as("na")), Seq("id_a"))
      .join(w.select(col("doc_id").as("id_b"), col("ws").as("wb"), col("n").as("nb")), Seq("id_b"))
      .filter(col("na") * 10 >= col("nb") * 9 && col("nb") * 10 >= col("na") * 9)
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    j.orderBy("id_a", "id_b")
  }

  /** B but verify via sorted-merge counts instead of array_intersect. */
  def variantC(s: SparkSession): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    val tok = s.table("documents").select(
      col("doc_id"), col("lang"),
      explode(array_distinct(transform(split(col("text"), "\\s+"), w => xxhash64(w)))).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
    val ranked = tok.join(broadcast(freq), "tok")
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("tf", "tok")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val pref = ranked
      .filter(col("rn") <= col("n") - floor((col("n") * 9 + 9) / 10.0).cast("int") + 1)
      .select("lang", "tok", "doc_id")
    val cand = pref.select(col("lang"), col("tok"), col("doc_id").as("id_a"))
      .join(pref.select(col("lang"), col("tok"), col("doc_id").as("id_b")), Seq("lang", "tok"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val w = tok.groupBy("doc_id").agg(sort_array(collect_list("tok")).as("ws"), count(lit(1)).as("n"))
    val j = cand.repartition(cores)
      .join(w.select(col("doc_id").as("id_a"), col("ws").as("wa"), col("n").as("na")), Seq("id_a"))
      .join(w.select(col("doc_id").as("id_b"), col("ws").as("wb"), col("n").as("nb")), Seq("id_b"))
      .filter(col("na") * 10 >= col("nb") * 9 && col("nb") * 10 >= col("na") * 9)
      .select(col("id_a"), col("id_b"),
        graft.functions.SortedIntersectCount.count(col("wa"), col("wb")).as("i"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    j.orderBy("id_a", "id_b")
  }

  /** Staged timings: where does variant C spend its time? */
  def stages(s: SparkSession): Unit = {
    val cores = s.sparkContext.defaultParallelism
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[j22-stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tok = s.table("documents").select(
      col("doc_id"), col("lang"),
      explode(array_distinct(transform(split(col("text"), "\\s+"), w => xxhash64(w)))).as("tok"))
    t("tok.count")(println("tok=" + tok.count()))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
    t("freq.count")(println("freq=" + freq.count()))
    val ranked = tok.join(broadcast(freq), "tok")
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("tf", "tok")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val pref = ranked
      .filter(col("rn") <= col("n") - floor((col("n") * 9 + 9) / 10.0).cast("int") + 1)
      .select("lang", "tok", "doc_id")
    t("pref.count")(println("pref=" + pref.count()))
    val candRaw = pref.select(col("lang"), col("tok"), col("doc_id").as("id_a"))
      .join(pref.select(col("lang"), col("tok"), col("doc_id").as("id_b")), Seq("lang", "tok"))
      .filter(col("id_a") < col("id_b"))
    t("candRaw.count")(println("candRaw=" + candRaw.count()))
    val cand = candRaw.select("id_a", "id_b").distinct()
    t("cand.count")(println("cand=" + cand.count()))
    val w = tok.groupBy("doc_id").agg(sort_array(collect_list("tok")).as("ws"), count(lit(1)).as("n"))
    t("w.count")(println("w=" + w.count()))
    val j = cand.repartition(cores)
      .join(w.select(col("doc_id").as("id_a"), col("ws").as("wa"), col("n").as("na")), Seq("id_a"))
      .join(w.select(col("doc_id").as("id_b"), col("ws").as("wb"), col("n").as("nb")), Seq("id_b"))
      .filter(col("na") * 10 >= col("nb") * 9 && col("nb") * 10 >= col("na") * 9)
      .select(col("id_a"), col("id_b"),
        graft.functions.SortedIntersectCount.count(col("wa"), col("wb")).as("i"),
        col("na"), col("nb"))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    t("full")(println("rows=" + j.orderBy("id_a", "id_b").count()))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants = if (args.length > 1) args(1).split(",").toSeq else Seq("reg", "B", "C")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerAll(spark, sfDir)
    def run(name: String, f: SparkSession => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f(spark).count()
        println(f"[j22] $name#$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    variants.foreach {
      case "reg" => run("registry", s => graft.QueryRegistry.byName("q22_jaccard_pairs").fn(s, sfDir))
      case "B" => run("B", variantB)
      case "C" => run("C", variantC)
      case "stages" => stages(spark)
    }
    spark.stop()
  }
}
