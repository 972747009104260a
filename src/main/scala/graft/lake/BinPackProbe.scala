package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bin-pack compaction scale probe: is routine small-files maintenance
  * O(small-file bytes) or O(table bytes)?
  *
  * Builds a table with a big data plane (N target-size files) plus a
  * FIXED set of 8 small streaming-ingest-shaped files, at N and 10×N,
  * and measures [[LakeTable.binPack]] wall time and bytes rewritten at
  * both sizes. Contrast: the whole-table [[LakeTable.rewriteDataFiles]]
  * at the same sizes. The claim under test: binPack cost is flat as the
  * table grows 10× (it never reads or writes the big files), while the
  * full rewrite grows linearly — which is why binpack, not full rewrite,
  * is the routine maintenance tier at 100 TB.
  *
  * Run: sbt "runMain graft.lake.BinPackProbe"; results → SCALEPROBE.md.
  */
object BinPackProbe {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def table(nBig: Int): LakeTable = {
      val cat = new LakeCatalog(spark,
        java.nio.file.Files.createTempDirectory("graft-bp-probe").toString)
      val t = cat.createTable("p.t", schema)
      // big plane: nBig files of 400k rows each (~3 MB parquet)
      (0 until nBig).foreach(i =>
        t.append(spark.range(i * 400000L, (i + 1) * 400000L)
          .select(col("id"), (col("id") * 1.5).as("v")).coalesce(1)))
      // small plane: 8 single-trigger streaming-ingest-shaped files
      (0 until 8).foreach(i =>
        t.append(spark.range(100000000L + i * 100, 100000000L + (i + 1) * 100)
          .select(col("id"), (col("id") * 1.5).as("v")).coalesce(1)))
      t
    }

    def fileStats(t: LakeTable): (Int, Long) = {
      val fs = t.meta.currentSnapshot.map(_.files).getOrElse(Seq.empty)
      (fs.size, fs.map(_.sizeBytes).sum)
    }

    for (nBig <- Seq(4, 40)) {
      val t = table(nBig)
      val (files0, bytes0) = fileStats(t)
      val bigSize = t.meta.currentSnapshot.get.files.map(_.sizeBytes).max

      val t0 = System.nanoTime()
      t.binPack(targetSizeBytes = bigSize)
      val binSecs = (System.nanoTime() - t0) / 1e9
      val sum = t.meta.currentSnapshot.get.summary
      val binBytes = sum("binpack-rewritten-bytes").toLong
      val (files1, _) = fileStats(t)

      val t1 = System.nanoTime()
      t.rewriteDataFiles(targetSizeBytes = bigSize)
      val fullSecs = (System.nanoTime() - t1) / 1e9
      val fullBytes = bytes0 // the full rewrite reads+writes everything

      println(f"""{"n_big":$nBig,"table_bytes":$bytes0,"files_before":$files0,""" +
        f""""binpack_secs":$binSecs%.2f,"binpack_rewritten_bytes":$binBytes,""" +
        f""""files_after_binpack":$files1,""" +
        f""""full_rewrite_secs":$fullSecs%.2f,"full_rewrite_bytes":$fullBytes}""")
    }
    spark.stop()
  }
}
