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

    // SemDeDup pair recall (r18, the q68 re-baseline): within-cluster
    // pairing finds exactly the above-threshold pairs k-means co-locates —
    // the accepted approximation of the method (Abbas et al. 2023). This
    // measures it: |within-cluster pairs| / |global brute-force pairs| at
    // q68's threshold, across cluster counts. Any future q68 rewrite that
    // can move borderline pairs (quantized prescreens, norm bounds) must
    // hold this number, not just the within-assignment exactness
    // SemDedupSpec gates.
    val thr = 0.35
    val allVecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    def cosL(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / math.sqrt(na * nb)
    }
    val brute = (for {
      i <- allVecs.indices.iterator
      j <- (i + 1 until allVecs.length).iterator
      if cosL(allVecs(i)._2, allVecs(j)._2) >= thr
    } yield (allVecs(i)._1, allVecs(j)._1)).toSet
    println(s"== semdedup pair recall: n=$n thr=$thr brute_pairs=${brute.size} ==")
    for (nlist <- Seq(8, 16, 32)) {
      val (assigned, _) = Similarity.ivfAssign(emb, nlist)
      val found = graft.operators.SemDedup.withinClusterPairs(assigned, thr)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val extra = found -- brute // must be empty: cosine is exact
      val pr = if (brute.isEmpty) 1.0
        else found.intersect(brute).size.toDouble / brute.size
      println(f"SEMDEDUP nlist=$nlist%2d pair_recall=$pr%.3f " +
        f"found=${found.size}%d false_pairs=${extra.size}%d")
    }
    spark.stop()
  }
}
