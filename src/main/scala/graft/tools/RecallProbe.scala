package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure ANN recall@k against exact brute force on the
  * driver testdata, across parameter grids. Not part of the query surface.
  * Usage: runMain graft.tools.RecallProbe /root/testdata/sf0.001 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L)
    val k = 10
    def recallOf(approx: Set[Long], exact: Set[Long]): Double =
      if (exact.isEmpty) 1.0 else approx.intersect(exact).size.toDouble / exact.size

    val exactTop: Map[Long, Set[Long]] = queryIds.map { qid =>
      val qv = emb.filter(col("vec_id") === qid).select("embedding").head.getSeq[Float](0)
      qid -> Similarity.topK(emb, qv, k).collect().map(_.getLong(0)).toSet
    }.toMap

    println(s"== n=$n k=$k ==")
    for (planes <- Seq(3, 4, 5, 6); tables <- Seq(4, 8, 12)) {
      val recalls = queryIds.map { qid =>
        val qv = emb.filter(col("vec_id") === qid).select("embedding").head.getSeq[Float](0)
        val approx = Similarity.annTopK(emb, qv, k, planes, tables)
          .collect().map(_.getLong(0)).toSet
        recallOf(approx, exactTop(qid))
      }
      println(f"LSH planes=$planes%2d tables=$tables%2d recall=${recalls.sum / recalls.size}%.2f (min ${recalls.min}%.2f)")
    }
    for (nlist <- Seq(8, 16); nprobe <- Seq(2, 4, 8)) {
      val (assigned, centroids) = Similarity.ivfAssign(emb, nlist)
      val a = assigned.cache(); a.count()
      val recalls = queryIds.map { qid =>
        val qv = emb.filter(col("vec_id") === qid).select("embedding").head.getSeq[Float](0)
        val approx = Similarity.ivfTopK(a, centroids, qv, k, nprobe)
          .collect().map(_.getLong(0)).toSet
        recallOf(approx, exactTop(qid))
      }
      println(f"IVF nlist=$nlist%2d nprobe=$nprobe%2d recall=${recalls.sum / recalls.size}%.2f (min ${recalls.min}%.2f)")
      a.unpersist()
    }
    spark.stop()
  }
}
