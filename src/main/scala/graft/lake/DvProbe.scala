package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growth-shape probe for deletion vectors (results in SCALEPROBE.md).
  * The 100 TB claims:
  *
  *   1. The anti-join mask has a CLIFF: past the ~4M-entry broadcast
  *      cap, every read of a masked file shuffles the full scan side on
  *      (file, pos). The DV probe has no cliff — masking stays a per-row
  *      bitmap lookup inside the scan at any churn level.
  *   2. Below the cliff the probe is at least competitive with the
  *      broadcast anti-join (and skips the per-query delete-parquet
  *      read + broadcast build).
  *   3. The byte cost is ~1/16 of the delete parquet (bitmaps vs
  *      (name, pos) rows), loaded lazily per scanned file, LRU-cached
  *      per executor.
  *
  * Measured on one table at two churn levels (100 k, then stacked to
  * 6.5 M outstanding positions — beyond the broadcast cap) by re-reading
  * the same snapshot with `spark.graft.dv.read.enabled` on vs off.
  *
  * Run: sbt "runMain graft.lake.DvProbe" (never concurrently with
  * another Spark main). */
object DvProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rowsPerFile = 200000L
    val nFiles = 64
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", LongType),
      StructField("v", DoubleType)))
    def batch(b: Long) = spark.range(b * rowsPerFile, (b + 1) * rowsPerFile)
      .select(col("id"), (col("id") % 97).as("grp"),
        (col("id") % 1000 / 7.0).as("v"))
      .coalesce(1)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-dvprobe").toString)
    val t = cat.createTable("p.dv", schema,
      properties = Map("write.delete.mode" -> "merge-on-read"))
    for (b <- 0L until nFiles) t.append(batch(b))
    val totalRows = rowsPerFile * nFiles

    def measure(label: String, expectRows: Long): Unit = {
      // warmup once (row-parity checked), then best-of-3 per mode on the
      // SAME snapshot — the full-scan aggregate is the masked-read cost
      def best(dvOn: Boolean): Double = {
        spark.conf.set(DeleteVectors.ReadConf, dvOn.toString)
        try {
          val n = t.toDF.count()
          require(n == expectRows, s"$label dvOn=$dvOn: got $n want $expectRows")
          (1 to 3).map { _ =>
            timed(t.toDF.groupBy("grp").count().count())._2
          }.min
        } finally spark.conf.unset(DeleteVectors.ReadConf)
      }
      val dv = best(dvOn = true)
      val aj = best(dvOn = false)
      val snap = t.meta.currentSnapshot.get
      val delBytes = snap.deleteFiles.map(_.sizeBytes).sum
      val dvBytes = snap.deleteFiles.flatMap(_.vectors.values.map(_.len.toLong)).sum
      val outstanding = snap.deleteFiles.map(_.rowCount).sum
      println(f"DVPROBE $label outstanding=$outstanding%,d dv_scan_s=$dv%.3f " +
        f"antijoin_scan_s=$aj%.3f delete_parquet_bytes=$delBytes%,d " +
        f"dv_bitmap_bytes=$dvBytes%,d")
    }

    // churn level 1: 100 k positions — under the broadcast cap
    t.delete(col("id") % 128 === 0) // 100 k spread over every file
    measure("small_churn", totalRows - totalRows / 128)

    // churn level 2: stack to ~6.5 M outstanding — past the broadcast cap
    t.delete(col("id") % 2 === 1)
    // live = evens minus multiples of 128 (which are all even)
    val live2 = totalRows / 2 - totalRows / 128
    measure("large_churn", live2)

    spark.stop()
  }
}
