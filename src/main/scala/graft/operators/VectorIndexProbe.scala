package graft.operators

import graft.lake.LakeCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growth-shape probe for the persistent IVF index (results in
  * SCALEPROBE.md): the claim that must hold at 100 TB is that index
  * MAINTENANCE is batch-bound and index PROBES are nprobe/nlist-bound —
  * neither may grow with corpus size.
  *
  *   1. Fixed batch (append 25 k vectors, then update 25 k existing
  *      ones), measured over a 10× corpus-size spread: refresh wall must
  *      stay ~flat. Both tables run `write.merge.mode=merge-on-read`, the
  *      high-churn configuration the scaladoc prescribes — an update
  *      batch whose key bounds span the corpus would otherwise CoW-rewrite
  *      every posting-list file.
  *   2. Search at nprobe=4 of nlist=32: wall and the scanned file
  *      fraction vs a full index scan.
  *
  * Run: sbt "runMain graft.operators.VectorIndexProbe" (env
  * SPARK_GRAFT_CPUS; never concurrently with another Spark main). */
object VectorIndexProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 32
    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id").as("vec_id"),
      array((0 until dim).map(d =>
        (pmod(xxhash64(col("id"), lit(d)), lit(1000)).cast(FloatType) / 500f - 1f)): _*)
        .as("embedding"))

    val batch = 25000L
    for (n <- Seq(250000L, 2500000L)) {
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("graft-vidxprobe").toString)
      val base = cat.createTable("p.vecs", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))),
        properties = Map("write.merge.mode" -> "merge-on-read"))
      base.append(vecs(spark.range(n).toDF("id")))
      val t0 = System.nanoTime()
      val idx = VectorIndex.create(cat, "p.vidx", base, nlist = 32, iters = 2)
      val buildS = (System.nanoTime() - t0) / 1e9
      idx.state.updateProperties(_ + ("write.merge.mode" -> "merge-on-read"))

      // fixed-size churn: append NEW ids, then update EXISTING random ids
      base.append(vecs(spark.range(n, n + batch).toDF("id")))
      val tA = System.nanoTime()
      idx.refresh()
      val appendS = (System.nanoTime() - tA) / 1e9
      val updIds = spark.range(batch).select(
        pmod(xxhash64(col("id"), lit(7L)), lit(n)).as("id")).distinct()
      base.mergeByKeys("vec_id",
        updIds.select(col("id").as("vec_id")),
        vecs(updIds.select((col("id") + 31L).as("id")))
          .withColumn("vec_id", col("vec_id") - 31L))
      val tU = System.nanoTime()
      idx.refresh()
      val updateS = (System.nanoTime() - tU) / 1e9

      // probe: nprobe/nlist of the files, wall vs a brute scan of the index
      val q = (0 until dim).map(d => ((d * 37) % 100) / 50f - 1f)
      val tS = System.nanoTime()
      val top = idx.search(q, k = 10, nprobe = 4).collect()
      val searchS = (System.nanoTime() - tS) / 1e9
      require(top.length == 10)
      val probe = Similarity.probeLists(idx.centroids, q, 4)
      val scanned = idx.state.read(filter =
        Some(col("list_id").isin(probe.map(Int.box): _*))).inputFiles.length
      val total = idx.state.toDF.inputFiles.length
      println(f"""{"probe":"vector_index","n":$n,"batch":$batch,""" +
        f""""build_s":$buildS%.2f,"refresh_append_s":$appendS%.2f,""" +
        f""""refresh_update_s":$updateS%.2f,"search_s":$searchS%.2f,""" +
        f""""scanned_files":$scanned,"total_files":$total}""")
      cat.dropTable("p.vidx"); cat.dropTable("p.vidx_centroids"); cat.dropTable("p.vecs")
    }
    spark.stop()
  }
}
