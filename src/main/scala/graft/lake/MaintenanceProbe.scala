package graft.lake

import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** Growth-shape probe for ingest-cadence delete maintenance
  * ([[LakeTable.autoMaintain]]): drives N merge-on-read CDC upsert
  * batches into two tables — one with per-batch autoMaintain, one raw —
  * and samples the full-scan read wall + live mask counts along the way.
  *
  * The claim under test: WITHOUT maintenance the read plan fans out one
  * equality-mask scan branch per batch (plan size, planning time, and
  * read wall all grow with stream LENGTH); WITH the maintenance cadence
  * the mask counts are bounded by the thresholds, so the read wall stays
  * flat in stream length (it may still grow with data volume — that part
  * is honest). Results recorded in SCALEPROBE.md.
  *
  * Run: sbt "runMain graft.lake.MaintenanceProbe" (env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_MAINT_BATCHES). */
object MaintenanceProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_MAINT_BATCHES", "150").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-maintprobe").toString)
    val samples = Set(25, 50, 100, nBatches)

    for (mode <- Seq("maintained", "raw")) {
      val t = cat.createTable(s"p.$mode",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType))))
      t.setProperties(Map("write.merge.mode" -> "merge-on-read"))
      for (b <- 0 until nBatches) {
        val df = ((b * 50) until (b * 50 + 100))
          .map(k => (k.toLong, s"v$b")).toDF("id", "v")
        t.mergeByKeys("id", df.select("id"), df)
        if (mode == "maintained")
          t.autoMaintain(everyCommits = 10, maxEqDeleteFiles = 4, maxDeleteFiles = 8)
        if (samples.contains(b + 1)) {
          // median-of-3 full-scan wall (plans rebuilt each time — planning
          // cost of the mask fan-out is part of what we're measuring)
          val walls = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            t.toDF.count()
            (System.nanoTime() - t0) / 1e9
          }.sorted
          val snap = t.meta.currentSnapshot.get
          println(f"""{"mode":"$mode","batches":${b + 1},""" +
            f""""read_wall_s":${walls(1)}%.3f,"eq_delete_files":${snap.eqDeleteFiles.size},""" +
            f""""pos_delete_files":${snap.deleteFiles.size},""" +
            f""""data_files":${snap.files.size},"rows":${t.toDF.count()}}""")
        }
      }
    }
    spark.stop()
  }
}
