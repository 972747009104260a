package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Integrity audit ([[LakeTable.verifyIntegrity]] / CALL verify_table):
  * a clean table reports nothing; every class of missing or mangled
  * byte the metadata references is reported precisely. */
class VerifyTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("clean table: zero findings across data, MoR masks, DV bundles, " +
    "blooms and the version spine; corruption is reported per class") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-fsck").toString
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("db.t", StructType(Seq(
      StructField("id", LongType), StructField("k", StringType))),
      properties = Map(
        "write.delete.mode" -> "merge-on-read",
        "graft.bloom.columns" -> "k"))
    t.append((0L until 50L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(1))
    t.append((50L until 100L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(1))
    t.delete(col("id") % 7 === 0) // MoR positional mask + DV bundle
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty)
    assert(t.verifyIntegrity().count() === 0, "clean table must be clean")
    // corrupt: remove one data file, truncate another, remove the most
    // recent bloom bundle — three distinct finding classes
    val snap = t.meta.currentSnapshot.get
    val files = snap.files.map(_.path).sorted
    Files.delete(Paths.get(files.head.stripPrefix("file:")))
    val second = Paths.get(files.last.stripPrefix("file:"))
    Files.write(second, Array[Byte](1, 2, 3))
    val bloom = t.meta.snapshots.reverse
      .flatMap(_.summary.get(BloomSkip.BundleSummaryKey)).head
    Files.delete(Paths.get(wh, "db", "t", "metadata", bloom))
    val report = t.verifyIntegrity().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(report.length === 3, s"expected 3 findings, got:\n${report.mkString("\n")}")
    assert(report.exists(f => f._1 == "data" && f._2 == files.head
      && f._3 == "missing"))
    assert(report.exists(f => f._1 == "data" && f._2 == files.last
      && f._3.startsWith("size 3 B !=")))
    assert(report.exists(f => f._1 == "bloom-bundle" && f._2 == bloom))
    // SQL surface: CALL registers the report view and returns the count
    spark.conf.set("spark.sql.catalog.fsck",
      classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fsck.warehouse", wh)
    org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
    spark.sql("CALL fsck.system.verify_table('db.t')")
    assert(spark.table("db_t_verify").count() === 3)
  }

  test("content verification (r15): a truncated manifest chunk and a " +
    "bit-flipped bloom bundle are each reported precisely — the name's " +
    "content hash no longer matches the bytes") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-fsck").toString
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("db.c", StructType(Seq(
      StructField("id", LongType), StructField("k", StringType))),
      properties = Map("graft.bloom.columns" -> "k"))
    t.append((0L until 40L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(1))
    t.append((40L until 80L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(1))
    assert(t.verifyIntegrity().count() === 0)
    val metaDir = Paths.get(wh, "db", "c", "metadata")
    val chunk = t.meta.currentSnapshot.get.manifests.head
    val bloom = t.meta.snapshots.reverse
      .flatMap(_.summary.get(BloomSkip.BundleSummaryKey)).head
    // truncate the chunk (drop the trailing half)
    val chunkBytes = Files.readAllBytes(metaDir.resolve(chunk))
    Files.write(metaDir.resolve(chunk),
      java.util.Arrays.copyOf(chunkBytes, chunkBytes.length / 2))
    // flip one bit inside the bloom bundle (length unchanged — an
    // existence/size check would miss this entirely)
    val bloomBytes = Files.readAllBytes(metaDir.resolve(bloom))
    bloomBytes(bloomBytes.length / 2) =
      (bloomBytes(bloomBytes.length / 2) ^ 0x01).toByte
    Files.write(metaDir.resolve(bloom), bloomBytes)
    // fresh handle so the chunk cache can't mask the damage
    LakeTable.invalidateLocation(t.location)
    val report = new LakeTable(spark, t.location).verifyIntegrity().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter(f => f._1 == "manifest" || f._1 == "bloom-bundle")
    assert(report.exists(f => f._1 == "manifest" && f._2 == chunk &&
      f._3.contains("content hash")), s"truncated chunk not caught:\n${report.mkString("\n")}")
    assert(report.exists(f => f._1 == "bloom-bundle" && f._2 == bloom &&
      f._3.contains("content hash")), s"bit-flip not caught:\n${report.mkString("\n")}")
  }

  test("stats sketches object (r17): a bit-flipped ANALYZE sketches " +
    "object is reported by content hash; GC spares the live one and " +
    "sweeps a superseded one") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-fsck").toString
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("db.s", StructType(Seq(
      StructField("id", LongType), StructField("k", StringType))))
    t.append((0L until 60L).map(i => (i, s"k${i % 7}")).toDF("id", "k").coalesce(1))
    val ref0 = t.analyzeTable().sketchRef.get
    assert(t.verifyIntegrity().count() === 0)
    // supersede: new data, re-analyze → new object, old one unreferenced
    t.append((60L until 90L).map(i => (i, s"k${i % 11}")).toDF("id", "k").coalesce(1))
    val ref1 = t.analyzeTable().sketchRef.get
    assert(ref1 !== ref0, "different content must address a different object")
    val metaDir = Paths.get(wh, "db", "s", "metadata")
    assert(Files.exists(metaDir.resolve(ref0)) && Files.exists(metaDir.resolve(ref1)))
    // orphan sweep: superseded object goes, live one stays
    val swept = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    assert(swept.exists(_.endsWith(ref0)), s"superseded $ref0 not swept: $swept")
    assert(!Files.exists(metaDir.resolve(ref0)))
    assert(Files.exists(metaDir.resolve(ref1)), "live sketches object swept!")
    assert(t.verifyIntegrity().count() === 0, "sweep must not break the table")
    // bit-flip the live object: fsck reports it, the planner degrades
    // to scalar-only stats instead of crashing
    val bytes = Files.readAllBytes(metaDir.resolve(ref1))
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x01).toByte
    Files.write(metaDir.resolve(ref1), bytes)
    LakeTable.invalidateLocation(t.location)
    val t2 = new LakeTable(spark, t.location)
    val report = t2.verifyIntegrity().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter(_._1 == "stats-sketches")
    assert(report.exists(f => f._2 == ref1 && f._3.contains("content hash")),
      s"flipped stats object not caught:\n${report.mkString("\n")}")
    val degraded = Analyze.hydrated(t2).get
    assert(degraded.columns.nonEmpty &&
      degraded.columns.forall(c => c.ndv.isDefined))
  }

  test("DV bundle content (r15): a bit-flipped deletion-vector bundle at " +
    "UNCHANGED length — which serves wrong masks past every range check — " +
    "is caught by the content hash its name claims") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-fsck").toString
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("db.dv", StructType(Seq(
      StructField("id", LongType), StructField("k", StringType))),
      properties = Map("write.delete.mode" -> "merge-on-read"))
    t.append((0L until 100L).map(i => (i, s"k$i")).toDF("id", "k").coalesce(1))
    t.delete(org.apache.spark.sql.functions.col("id") % 7 === 0)
    val bundles = t.meta.currentSnapshot.get.deleteFiles
      .flatMap(_.vectors.values.map(_.bundle)).distinct
    assume(bundles.nonEmpty, "setup must produce a DV bundle")
    assert(t.verifyIntegrity().count() === 0)
    val bp = Paths.get(bundles.head.stripPrefix("file:"))
    val bytes = Files.readAllBytes(bp)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x01).toByte
    Files.write(bp, bytes)
    // drop the local-FS CRC sidecar: on an object store there is none,
    // and the point is that OUR content hash catches the flip — not
    // Hadoop's ChecksumFileSystem (which would preempt it here)
    val crc = bp.getParent.resolve("." + bp.getFileName.toString + ".crc")
    Files.deleteIfExists(crc)
    val report = t.verifyIntegrity().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(report.exists(f => f._1 == "dv-bundle" &&
      f._2 == bundles.head && f._3.contains("content hash")),
      s"DV bit-flip not caught:\n${report.mkString("\n")}")
  }
}
