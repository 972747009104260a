package graft.lake

import graft.lake.catalog.CatalogServer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Manifest-level bloom skipping ([[BloomSkip]]): point lookups on a
  * declared high-cardinality column prune whole files from metadata —
  * the tier between min/max stats (useless on hash-like columns, every
  * file overlaps) and parquet row-group blooms (paid only after a task
  * opened the file). Every case asserts BOTH the files-scanned shape AND
  * row parity with an unpruned read — skipping may degrade, never lie. */
class BloomSkipSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-bloom").toString)

  /** Hash-like keys: every append's key set spans the full hex domain, so
    * min/max stats overlap across ALL files and can prune nothing — the
    * bloom is the only thing that can tell the files apart. */
  private def batch(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"${java.util.UUID.nameUUIDFromBytes(
      BigInt(i).toByteArray)}", i % 10)).toDF("id", "k", "bucket")
  }

  private def schema = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("bucket", IntegerType)))

  private def props = Map(
    BloomSkip.ColumnsKey -> "k",
    BloomSkip.FppKey -> "0.001")

  private def keyOf(i: Int): String =
    java.util.UUID.nameUUIDFromBytes(BigInt(i).toByteArray).toString

  test("point lookups prune to the one matching file; stats alone cannot") {
    val cat = freshCatalog()
    val t = cat.createTable("db.bl", schema, properties = props)
    for (b <- 0 until 4) t.append(batch(b * 1000 until (b + 1) * 1000).coalesce(1))
    assert(t.toDF.inputFiles.length === 4)

    // the control: stats CANNOT separate these files (hash-domain overlap)
    val statsOnly = t.meta.currentSnapshot.get.files.count { f =>
      Pruning.mayMatch(Pruning.Eq("k", keyOf(2500)), t.fileBounds(t.meta, f))
    }
    assert(statsOnly === 4, "test premise: min/max must be useless here")

    // bloom prunes the lookup to the single file holding the key
    val hit = t.read(filter = Some(col("k") === keyOf(2500)))
    assert(hit.inputFiles.length === 1, hit.inputFiles.mkString(","))
    assert(hit.select("id").head.getLong(0) === 2500L)

    // an ABSENT key scans zero files and returns zero rows
    val miss = t.read(filter = Some(col("k") === "no-such-key"))
    assert(miss.inputFiles.isEmpty)
    assert(miss.count() === 0)

    // IN over two keys from different files opens exactly those two
    val in2 = t.read(filter = Some(col("k").isin(keyOf(10), keyOf(3990))))
    assert(in2.inputFiles.length === 2)
    assert(in2.select("id").collect().map(_.getLong(0)).sorted === Array(10L, 3990L))

    // conjunction with a non-bloom predicate keeps the bloom verdict
    val conj = t.read(filter = Some(col("k") === keyOf(2500) && col("bucket") === 0))
    assert(conj.inputFiles.length === 1)
    assert(conj.count() === 1)

    // NOT and OR-with-a-range stay conservative: no pruning, full parity
    val not = t.read(filter = Some(col("k") =!= keyOf(2500)))
    assert(not.inputFiles.length === 4)
    assert(not.count() === 3999)
    val or = t.read(filter = Some(col("k") === keyOf(2500) || col("id") > 3500))
    assert(or.inputFiles.length === 4)
    assert(or.count() === 500)
  }

  test("DML classification: a point DELETE and a small-batch merge rewrite " +
      "ONLY the files that can hold the key — the rest survive by reference") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("db.bld", schema, properties = props)
    for (b <- 0 until 4) t.append(batch(b * 1000 until (b + 1) * 1000).coalesce(1))
    val files0 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert(files0.size === 4)

    // CoW DELETE of one key: three files ride into the new snapshot
    // UNREWRITTEN (same paths); only the key's file is replaced
    t.delete(col("k") === keyOf(1500))
    val files1 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert((files0 & files1).size === 3, "three files must survive by reference")
    assert(t.toDF.count() === 3999)
    assert(t.read(filter = Some(col("k") === keyOf(1500))).count() === 0)

    // small-batch DF merge (the CDC shape): keys collect into an exact In
    // predicate, the bloom clears the other files — again 3 survive
    val files2 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    t.mergeByKeys("k", Seq(keyOf(2500)).toDF("k"),
      Seq((2500L, keyOf(2500), 9.9)).toDF("id", "k", "bucket_x")
        .select(col("id"), col("k"), lit(99).as("bucket")))
    val files3 = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert((files2 & files3).size >= 3,
      s"merge must rewrite only the matching file: ${files2.size} -> ${files3.size}")
    assert(t.toDF.filter(col("id") === 2500L).select("bucket").head.getInt(0) === 99)
    assert(t.toDF.count() === 3999)
  }

  test("rename keeps blooms (column-id keyed); compaction output carries " +
      "coverage through commitReplace") {
    val cat = freshCatalog()
    val t = cat.createTable("db.blm", schema, properties = props)
    for (b <- 0 until 4) t.append(batch(b * 1000 until (b + 1) * 1000).coalesce(1))

    // rename: blooms are keyed by column id, not name
    t.renameColumn("k", "doc_key")
    assert(t.read(filter = Some(col("doc_key") === keyOf(1500)))
      .inputFiles.length === 1)

    // compaction rewrites every file; the output gets ITS OWN bundle in
    // the same commit, so the lookup stays file-pruned afterwards
    t.rewriteDataFiles(targetSizeBytes = 96L * 1024)
    val total = t.toDF.inputFiles.length
    assert(total >= 2, "premise: the small target must produce several files")
    val lookup = t.read(filter = Some(col("doc_key") === keyOf(1500)))
    assert(lookup.inputFiles.length < total,
      s"compacted output must keep pruning: ${lookup.inputFiles.length}/$total")
    assert(lookup.select("id").head.getLong(0) === 1500L)
  }

  test("late declaration: rewrite_blooms backfills coverage; expire loses " +
      "it honestly and the orphan sweep GCs dead bundles") {
    val cat = freshCatalog()
    // born WITHOUT bloom columns — appends record nothing
    val t = cat.createTable("db.bll", schema)
    for (b <- 0 until 4) t.append(batch(b * 1000 until (b + 1) * 1000).coalesce(1))
    t.updateProperties(_ ++ props)
    assert(t.read(filter = Some(col("k") === keyOf(1500)))
      .inputFiles.length === 4, "no coverage yet — unpruned but correct")

    // backfill: one aggregate over the uncovered files, pruning resumes
    t.rewriteBlooms()
    val again = t.read(filter = Some(col("k") === keyOf(1500)))
    assert(again.inputFiles.length === 1)
    assert(again.select("id").head.getLong(0) === 1500L)
    // idempotent: full coverage → no new commit
    val v = t.meta.version
    t.rewriteBlooms()
    assert(t.meta.version === v)

    // a later append records its own bundle; expiring down to that append
    // retires the backfill bundle — old keys lose pruning (never
    // correctness), new keys keep it, the sweep reclaims the dead object
    t.append(batch(4000 until 5000).coalesce(1))
    val metaDir = Paths.get(t.location, "metadata")
    def bundles() = Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("bloom-")).toSet
    assert(bundles().size === 2)
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    val live = t.meta.snapshots.flatMap(_.summary.get(BloomSkip.BundleSummaryKey)).toSet
    assert(live.size === 1)
    assert(bundles() === live, "sweep must keep exactly the live bundles")
    // the 4 uncovered old files all scan; the NEW file's surviving bloom
    // still clears it for an old key — partial coverage composes
    val old = t.read(filter = Some(col("k") === keyOf(1500)))
    assert(old.inputFiles.length === 4, "old files lost coverage — unpruned")
    assert(old.select("id").head.getLong(0) === 1500L)
    // a key of the covered file cannot clear the UNCOVERED files (blooms
    // prune negatives only) — all 5 scan, rows stay right
    val fresh = t.read(filter = Some(col("k") === keyOf(4500)))
    assert(fresh.inputFiles.length === 5)
    assert(fresh.select("id").head.getLong(0) === 4500L)
    // rewrite_blooms restores the rest
    t.rewriteBlooms()
    assert(t.read(filter = Some(col("k") === keyOf(1500))).inputFiles.length === 1)
  }

  test("type widening detaches stale blooms (narrow-type hashes would " +
      "wrongly prune) until rewrite_blooms re-covers under the new type") {
    import spark.implicits._
    val cat = freshCatalog()
    // bloom on an INT column: xxhash64 of int and long DIFFER in Spark,
    // so a bloom built pre-widening must never be probed under LONG
    val t = cat.createTable("db.blw2", StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType))),
      properties = Map(BloomSkip.ColumnsKey -> "n", BloomSkip.FppKey -> "0.001"))
    // n = odd-multiplier scramble mod 2^16: injective over the 4k ids
    // (exactly one row matches any probed value) AND every file spans
    // nearly the whole range, so min/max stats can prune nothing — the
    // bloom is the only separator, which is what this test must isolate
    def scr(i: Int): Int = (i * 40503) & 0xffff
    for (b <- 0 until 4)
      t.append((b * 1000 until (b + 1) * 1000)
        .map(i => (i.toLong, scr(i))).toDF("id", "n").coalesce(1))
    assert(t.read(filter = Some(col("n") === scr(2500))).inputFiles.length === 1)
    t.updateColumnType("n", LongType)
    // stale blooms no longer match the (id, type) key: unpruned, CORRECT
    val after = t.read(filter = Some(col("n") === scr(2500).toLong))
    assert(after.inputFiles.length === 4,
      "post-widening the narrow-type blooms must detach, not mis-prune")
    assert(after.select("id").head.getLong(0) === 2500L)
    // re-cover under the widened type: pruning resumes
    t.rewriteBlooms()
    val again = t.read(filter = Some(col("n") === scr(2500).toLong))
    assert(again.inputFiles.length === 1)
    assert(again.select("id").head.getLong(0) === 2500L)
  }

  test("wire mode: bundles flow through the catalog service, pruning " +
      "works with zero metadata under the table location") {
    val metaRoot = Files.createTempDirectory("graft-bloom-meta").toString
    val warehouse = Files.createTempDirectory("graft-bloom-wh").toString
    val srv = new CatalogServer(metaRoot).start()
    try {
      val cat = new RemoteLakeCatalog(spark, warehouse, srv.uri)
      val t = cat.createTable("db.blw", schema, properties = props)
      for (b <- 0 until 3) t.append(batch(b * 500 until (b + 1) * 500).coalesce(1))
      // the bundle objects live on the SERVER, not under the table
      assert(Files.list(Paths.get(metaRoot, "db", "blw")).iterator().asScala
        .exists(_.getFileName.toString.startsWith("bloom-")))
      assert(!Files.exists(Paths.get(warehouse, "db", "blw", "metadata")))
      val hit = t.read(filter = Some(col("k") === keyOf(700)))
      assert(hit.inputFiles.length === 1)
      assert(hit.select("id").head.getLong(0) === 700L)
    } finally srv.stop()
  }

  test("DSv2 SQL path: a pushed equality filter engages the manifest bloom") {
    val warehouse = Files.createTempDirectory("graft-bloom-sql").toString
    spark.conf.set("spark.sql.catalog.blc", classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blc.warehouse", warehouse)
    org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
    val cat = new LakeCatalog(spark, warehouse)
    val t = cat.createTable("db.bls", schema, properties = props)
    for (b <- 0 until 4) t.append(batch(b * 1000 until (b + 1) * 1000).coalesce(1))
    val df = spark.sql(s"SELECT id FROM blc.db.bls WHERE k = '${keyOf(2500)}'")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(2500L))
    // the pushed filter reaches LakeTable.read → pruneFiles → BloomSkip:
    // one surviving file ⇒ one scan partition (a full scan has four)
    assert(spark.sql("SELECT id FROM blc.db.bls").rdd.getNumPartitions === 4,
      "test premise: the unfiltered scan reads one partition per file")
    assert(df.rdd.getNumPartitions === 1,
      "the pushed lookup must reach the bloom and plan a single file")
  }
}
