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

    // ---- 1b. hive-layout import: partition-count growth shape (r12) -----
    // Import wall must stay file-count-bound when every file sits in its
    // own key=value directory, and a partition filter must prune to one
    // file regardless of how many partitions the table has.
    for (nParts <- Seq(50, 400)) {
      val dir = Files.createTempDirectory("graft-hiveprobe").toString + "/src"
      spark.range(nParts.toLong * 1000)
        .selectExpr("id", s"id % $nParts AS p")
        .repartitionByRange(nParts, org.apache.spark.sql.functions.col("p"))
        .write.partitionBy("p").parquet(dir)
      // the reference's corpus shape: one DISTINCTLY-NAMED file per
      // partition (monthly taxi files) — Spark's writer reuses task file
      // names across partition dirs, which add_files refuses (positional
      // masks key on basename), so stamp the partition into each name
      locally {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        LakeTable.listParquet(fs, p).foreach { f =>
          val part = f.getParent.getName.replace('=', '_')
          fs.rename(f, new org.apache.hadoop.fs.Path(f.getParent, s"$part-${f.getName}"))
        }
      }
      val cat = new LakeCatalog(spark, Files.createTempDirectory("graft-hivewh").toString)
      val t = cat.createTable("p.himp", StructType(Seq(
        StructField("id", LongType), StructField("p", LongType))),
        partitionBy = Seq("p" -> "identity"))
      val t0 = System.nanoTime()
      t.addFiles(dir)
      val wall = (System.nanoTime() - t0) / 1e9
      require(t.toDF.count() == nParts.toLong * 1000)
      val t1 = System.nanoTime()
      val prunedDf = t.read(filter = Some(org.apache.spark.sql.functions.col("p") === 7L))
      val prunedFiles = prunedDf.inputFiles.length
      require(prunedDf.count() == 1000)
      val readWall = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"add_files_hive","partitions":$nParts,""" +
        f""""import_wall_s":$wall%.2f,"ms_per_file":${wall * 1000 / nParts}%.1f,""" +
        f""""pruned_files":$prunedFiles,"pruned_read_s":$readWall%.2f}""")
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

      // ---- 3. MV state resolution over the wire (r12) --------------------
      // The exact path SQL routing and auto-refresh take: resolve the
      // state table through the BASE's authority (sibling), present the
      // committed state. Report per-read wall fs vs wire — the delta is a
      // handful of metadata GETs, base-size-independent.
      import spark.implicits._
      def mvReadRun(cat: LakeCatalog, baseIdent: String, viewIdent: String): Double = {
        val base = cat.createTable(baseIdent, StructType(Seq(
          StructField("id", LongType), StructField("g", org.apache.spark.sql.types.StringType))))
        base.append((0 until 10000).map(i => (i.toLong, s"g${i % 8}")).toDF("id", "g"))
        MaterializedAgg.create(cat, viewIdent, base,
          Seq("g"), Seq(MaterializedAgg.AggCol("count", "*", "n"))).refresh()
        val loc = base.meta.properties(MaterializedAgg.ViewsKey).split(";").head
        val reps = 20
        val t0 = System.nanoTime()
        (0 until reps).foreach { _ =>
          require(MaterializedAgg.loadVia(base, loc).read().count() == 8)
        }
        (System.nanoTime() - t0) / 1e9 / reps
      }
      val fsRead = mvReadRun(
        new LakeCatalog(spark, Files.createTempDirectory("graft-mvfs").toString), "p.b1", "p.v1")
      val req0 = srv.requestCount.get()
      val wireRead = mvReadRun(new RemoteLakeCatalog(spark,
        Files.createTempDirectory("graft-mvwire").toString, srv.uri), "p.b2", "p.v2")
      val reqPerRead = (srv.requestCount.get() - req0) / 20.0
      println(f"""{"probe":"mv_route_wire","fs_read_s":$fsRead%.3f,""" +
        f""""wire_read_s":$wireRead%.3f,"server_requests_per_read":$reqPerRead%.1f,""" +
        f""""overhead_ms_per_routed_read":${(wireRead - fsRead) * 1000}%.1f}""")
    } finally srv.stop()
    spark.stop()
  }
}
