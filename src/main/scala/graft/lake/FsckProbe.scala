package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growth-shape probe for `verify_table` (results in SCALEPROBE.md).
  * The 100 TB claim: fsck cost is one executor-fanned getFileStatus per
  * referenced file plus one executor-fanned hash per DISTINCT retained
  * content-addressed metadata object (r16 — previously the metadata
  * hashing serialized on the driver), so wall grows far below the 10×
  * growth of either axis on a 32-thread box and the shape survives a
  * real cluster (both fan-outs are plain RDD stages).
  *
  * Axes probed, each table fsck'd end-to-end (report fully collected):
  *   - retained metadata objects: many small commits with snapshot
  *     retention keeping every manifest chunk alive, 1× vs 10× commits;
  *   - referenced data files: one snapshot over 1× vs 10× files.
  *
  * Run: sbt "runMain graft.lake.FsckProbe" (never concurrently with
  * another Spark main). */
object FsckProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-fsckprobe").toString)

    // axis 1: retained content-addressed metadata objects (manifest
    // chunks + lists accumulate one set per commit; nothing expired)
    for (commits <- Seq(12, 120)) {
      val t = cat.createTable(s"p.meta$commits", schema)
      for (i <- 0 until commits)
        t.append(spark.range(i * 100L, i * 100L + 100)
          .select(col("id"), (col("id") % 13 / 7.0).as("v")).coalesce(1))
      val objects = t.metaStore.list().count(_._1.contains("-"))
      // warm fs/jit once, then measure
      t.verifyIntegrity().count()
      val (bad, secs) = timed(t.verifyIntegrity().count())
      require(bad == 0L, s"clean table reported $bad problems")
      println(f"[fsckprobe] commits=$commits%4d metadata_objects=$objects%5d " +
        f"fsck=$secs%.3f s")
    }

    // axis 2: referenced data files in ONE snapshot
    for (nFiles <- Seq(400, 4000)) {
      val t = cat.createTable(s"p.files$nFiles", schema)
      t.append(spark.range(0, nFiles.toLong * 50)
        .select(col("id"), (col("id") % 13 / 7.0).as("v"))
        .repartition(nFiles))
      val got = t.meta.currentSnapshot.get.files.size
      t.verifyIntegrity().count()
      val (bad, secs) = timed(t.verifyIntegrity().count())
      require(bad == 0L, s"clean table reported $bad problems")
      println(f"[fsckprobe] data_files=$got%5d fsck=$secs%.3f s")
    }

    spark.stop()
  }
}
