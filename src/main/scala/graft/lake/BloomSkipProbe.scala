package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growth-shape probe for manifest bloom skipping (results in
  * SCALEPROBE.md). The 100 TB claims:
  *
  *   1. A point lookup on a hash-like column scans O(1) files regardless
  *      of file count (min/max never prunes such a column — without the
  *      bloom the scan is O(files)).
  *   2. The costs are bounded and amortized: the write-side pays one
  *      aggregate over just-written data per append; the read side pays
  *      one bundle load per commit the first time, then cached; the
  *      metadata cost is a few bits per row.
  *
  * Measured at two file counts (16 and 128 single-file appends of 50 k
  * rows each) against a bloom-less twin of the large table.
  *
  * Run: sbt "runMain graft.lake.BloomSkipProbe" (never concurrently with
  * another Spark main). */
object BloomSkipProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rowsPerFile = 50000L
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", StringType),
      StructField("v", DoubleType)))
    def batch(b: Long) = spark.range(b * rowsPerFile, (b + 1) * rowsPerFile)
      .select(col("id"), md5(col("id").cast(StringType)).as("k"),
        (col("id") % 1000 / 7.0).as("v"))
      .coalesce(1)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    for (nFiles <- Seq(16, 128)) {
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("graft-bloomprobe").toString)
      val t = cat.createTable("p.bl", schema, properties = Map(
        BloomSkip.ColumnsKey -> "k", BloomSkip.FppKey -> "0.01"))
      val twin = cat.createTable("p.nobl", schema)
      var appendBloomS = 0.0; var appendPlainS = 0.0
      for (b <- 0L until nFiles) {
        appendBloomS += timed(t.append(batch(b)))._2
        appendPlainS += timed(twin.append(batch(b)))._2
      }
      // metadata cost: total bundle bytes vs data bytes
      val metaDir = new org.apache.hadoop.fs.Path(t.location, "metadata")
      val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
      val bundleBytes = {
        val it = fs.listFiles(metaDir, false)
        var s = 0L
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.startsWith("bloom-")) s += st.getLen
        }
        s
      }
      val dataBytes = t.meta.currentSnapshot.get.files.map(_.sizeBytes).sum
      def key(i: Long) = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val probeId = nFiles * rowsPerFile / 2 + 17
      // cold: first lookup loads + deserializes every bundle; warm: cached
      val (hit, coldS) = timed(
        t.read(filter = Some(col("k") === key(probeId))).collect())
      val (_, warmS) = timed(
        t.read(filter = Some(col("k") === key(probeId))).collect())
      val scanned = t.read(filter = Some(col("k") === key(probeId)))
        .inputFiles.length
      val (hit2, plainS) = timed(
        twin.read(filter = Some(col("k") === key(probeId))).collect())
      val scannedPlain = twin.read(filter = Some(col("k") === key(probeId)))
        .inputFiles.length
      require(hit.length == 1 && hit2.length == 1)
      println(f"""{"probe":"bloom_skip","files":$nFiles,""" +
        f""""rows":${nFiles * rowsPerFile},""" +
        f""""append_bloom_s":$appendBloomS%.1f,"append_plain_s":$appendPlainS%.1f,""" +
        f""""bundle_mb":${bundleBytes / 1e6}%.1f,"data_mb":${dataBytes / 1e6}%.1f,""" +
        f""""lookup_cold_s":$coldS%.2f,"lookup_warm_s":$warmS%.2f,""" +
        f""""lookup_plain_s":$plainS%.2f,""" +
        f""""files_scanned":$scanned,"files_scanned_plain":$scannedPlain}""")
      cat.dropTable("p.bl"); cat.dropTable("p.nobl")
    }
    spark.stop()
  }
}
