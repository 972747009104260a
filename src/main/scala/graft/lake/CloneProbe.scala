package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growth-shape probe for zero-copy CLONE (results in SCALEPROBE.md).
  * The 100 TB claims:
  *
  *   1. `cloneTable` is a METADATA commit: cost scales with the source's
  *      file COUNT (one manifest re-chunk into the clone's store), never
  *      its byte size — and stays sub-second into the 10^4-file range.
  *   2. Clone-aware GC is a per-sweep driver-side union over registered
  *      clones' retained metadata: `expireSnapshots` /
  *      `removeOrphanFiles` on a source with N clones pay O(N × clone
  *      metadata) extra — no data reads, no executor work — so sweeps
  *      stay in the same order of magnitude as on a clone-free table.
  *   3. Reading through a clone costs the same as reading the source
  *      (the scan plans over the identical file list).
  *
  * Run: sbt "runMain graft.lake.CloneProbe" (never concurrently with
  * another Spark main). */
object CloneProbe {

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
      Files.createTempDirectory("graft-cloneprobe").toString)

    // claim 1: clone commit vs source file count (files via addFiles-style
    // many small appends would be slow to CREATE; instead append in bulk
    // with repartition so the snapshot carries many files cheaply)
    for (nFiles <- Seq(512, 4096)) {
      val ident = s"p.src$nFiles"
      val t = cat.createTable(ident, schema)
      t.append(spark.range(0, nFiles.toLong * 100)
        .select(col("id"), (col("id") % 13 / 7.0).as("v"))
        .repartition(nFiles))
      val got = t.meta.currentSnapshot.get.files.size
      val (_, cloneS) = timed(cat.cloneTable(ident, s"p.cl$nFiles"))
      println(f"[cloneprobe] source files=$got%5d clone_commit=$cloneS%.3f s")

      // claim 3: read through clone ≡ read source (same file list)
      val (n1, srcRead) = timed(cat.loadTable(ident).toDF.count())
      val (n2, clRead) = timed(cat.loadTable(s"p.cl$nFiles").toDF.count())
      require(n1 == n2)
      println(f"[cloneprobe] files=$got%5d read source=$srcRead%.3f s clone=$clRead%.3f s")
    }

    // claim 2: sweep overhead vs number of registered clones on one source
    val src = cat.createTable("p.many", schema)
    for (_ <- 0 until 8)
      src.append(spark.range(0, 40000).select(col("id"),
        (col("id") % 13 / 7.0).as("v")).repartition(8))
    def sweep(): (Double, Double) = {
      val (_, e) = timed(src.expireSnapshots(
        System.currentTimeMillis() + 3600000L, retainLast = 1))
      val (_, o) = timed(src.removeOrphanFiles(
        olderThanMs = System.currentTimeMillis() + 3600000L))
      (e, o)
    }
    val (e0, o0) = sweep()
    println(f"[cloneprobe] sweep clones=0  expire=$e0%.3f s orphan=$o0%.3f s")
    for (n <- Seq(4, 16)) {
      val have = src.meta.properties.getOrElse(LakeCatalog.CloneLocationsKey, "")
        .split(";").count(_.nonEmpty)
      for (i <- have until n) cat.cloneTable("p.many", s"p.mcl$i")
      src.append(spark.range(0, 40000).select(col("id"),
        (col("id") % 13 / 7.0).as("v")).repartition(8)) // churn to expire
      val (e, o) = sweep()
      println(f"[cloneprobe] sweep clones=$n%2d expire=$e%.3f s orphan=$o%.3f s")
    }
    // GC honesty: every clone still fully servable after the sweeps
    val bad = (0 until 16).map(i =>
      cat.loadTable(s"p.mcl$i").verifyIntegrity().count()).sum
    println(s"[cloneprobe] post-sweep clone fsck findings=$bad (expect 0)")

    spark.stop()
  }
}
