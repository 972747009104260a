package graft.lake

import graft.lake.catalog.CatalogServer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import java.nio.file.Files

/** Two growth-shape probes for the r11 catalog features (results in
  * SCALEPROBE.md):
  *
  *   1. `add_files` import cost is FILE-COUNT-bound, not byte-bound: the
  *      same 200-file directory imports in ~the same wall whether each
  *      file holds 1 k or 100 k rows (footer reads only — the "N TB
  *      import = N footer reads" claim, measured).
  *   2. Wire-catalog commit overhead: the same tiny-append sequence
  *      against a filesystem-metadata table vs a [[CatalogServer]]-backed
  *      table — the delta per commit is the HTTP round-trip cost of the
  *      metadata authority, the number a deployment trades for
  *      serialized commits without a shared filesystem.
  *
  * Run: sbt "runMain graft.lake.ImportWireProbe" (env SPARK_GRAFT_CPUS). */
object ImportWireProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. add_files: file-count-bound ---------------------------------
    val nFiles = 200
    for (rowsPerFile <- Seq(1000L, 100000L)) {
      val dir = Files.createTempDirectory("graft-impprobe").toString + "/src"
      // range partitioning → disjoint per-file id bounds, so the pruning
      // readout below is meaningful (round-robin would smear every file
      // across the whole domain)
      spark.range(nFiles * rowsPerFile)
        .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("id"))
        .write.parquet(dir)
      val bytes = {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        LakeTable.listParquet(fs, p).map(fs.getFileStatus(_).getLen).sum
      }
      val cat = new LakeCatalog(spark, Files.createTempDirectory("graft-impwh").toString)
      val t = cat.createTable("p.imp", StructType(Seq(StructField("id", LongType))))
      val t0 = System.nanoTime()
      t.addFiles(dir)
      val wall = (System.nanoTime() - t0) / 1e9
      // sanity: registered in place, pruning live
      require(t.toDF.count() == nFiles * rowsPerFile)
      val pruned = t.read(filter = Some(org.apache.spark.sql.functions.col("id") < rowsPerFile / 2))
        .inputFiles.length
      println(f"""{"probe":"add_files","files":$nFiles,"rows_per_file":$rowsPerFile,""" +
        f""""total_mb":${bytes / 1e6}%.1f,"import_wall_s":$wall%.2f,"pruned_files":$pruned}""")
    }

    // ---- 2. wire-catalog commit overhead --------------------------------
    val nCommits = 30
    def appendRun(cat: LakeCatalog, ident: String): Double = {
      import spark.implicits._
      val t = cat.createTable(ident, StructType(Seq(StructField("id", LongType))))
      val t0 = System.nanoTime()
      (0 until nCommits).foreach(i => t.append(Seq(i.toLong).toDF("id").coalesce(1)))
      (System.nanoTime() - t0) / 1e9
    }
    val fsWall = appendRun(
      new LakeCatalog(spark, Files.createTempDirectory("graft-fswh").toString), "p.fs")
    val srv = new CatalogServer(Files.createTempDirectory("graft-catmeta").toString).start()
    try {
      val wireWall = appendRun(new RemoteLakeCatalog(spark,
        Files.createTempDirectory("graft-wirewh").toString, srv.uri), "p.wire")
      println(f"""{"probe":"wire_commit","commits":$nCommits,""" +
        f""""fs_wall_s":$fsWall%.2f,"wire_wall_s":$wireWall%.2f,""" +
        f""""overhead_ms_per_commit":${(wireWall - fsWall) * 1000 / nCommits}%.1f}""")
    } finally srv.stop()
    spark.stop()
  }
}
