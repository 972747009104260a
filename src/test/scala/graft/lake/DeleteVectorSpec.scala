package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Deletion vectors ([[DeleteVectors]]): bitmap-probe positional-delete
  * masking. Contract under test:
  *   - bitmap format: build/contains/cardinality agree with a Set oracle
  *     across container-kind and chunk boundaries,
  *   - every positional-delete commit attaches refs covering exactly its
  *     counted files; rolled delete writes distribute refs correctly,
  *   - DV-masked reads return the same rows as the anti-join (the oracle
  *     is the kill-switch re-read) with NO join and NO delete-parquet
  *     scan in the plan,
  *   - partial coverage (property toggled between commits) splits the
  *     scan: covered files probe, uncovered files anti-join — rows exact,
  *   - refs retire with their delete files (compaction, CoW rewrite,
  *     rewrite_position_deletes) and bundles are GC'd exactly when no
  *     surviving snapshot references them; time travel keeps serving
  *     older snapshots' vectors.
  */
class DeleteVectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-dv").toString)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def rows(ids: Range, grp: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, grp, i * 1.5)).toDF("id", "grp", "v")
  }

  private def threeFileTable(cat: LakeCatalog, name: String): LakeTable = {
    val t = cat.createTable(name, schema)
    t.setProperties(Map("write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read"))
    t.append(rows(0 until 100, "a").coalesce(1))
    t.append(rows(100 until 200, "b").coalesce(1))
    t.append(rows(200 until 300, "c").coalesce(1))
    t
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString // unwrap: AQE's toString elides children
      case p: SparkPlan => p.toString
    }

  private def hasJoin(df: DataFrame): Boolean =
    planString(df).toLowerCase.contains("join")

  private def scannedDeleteParquet(df: DataFrame): Boolean =
    planString(df).contains("del-")

  // ---- bitmap format ------------------------------------------------------

  test("bitmap: build/contains/cardinality vs Set oracle (seeded random)") {
    val rnd = new scala.util.Random(421414L)
    def draw(): Long = rnd.nextInt(4) match {
      case 0 => rnd.nextLong(200001L)                     // spans array containers
      case 1 => rnd.nextLong(70001L)                      // chunk-0/1 boundary
      case 2 => (1L << 32) - 100 + rnd.nextLong(201L)     // high-int edge
      case _ => DvBitmap.MaxPos - 1000 + rnd.nextLong(1000L)
    }
    (0 until 30).foreach { round =>
      val set = Seq.fill(rnd.nextInt(3000))(draw()).toSet
      val sorted = set.toArray.sorted
      val bytes = DvBitmap.build(sorted)
      assert(DvBitmap.cardinality(bytes) === set.size.toLong, s"round $round")
      sorted.foreach(p => assert(DvBitmap.contains(bytes, p), s"round $round missing $p"))
      // non-members around each member
      sorted.take(200).foreach { p =>
        if (!set.contains(p + 1) && p + 1 < DvBitmap.MaxPos)
          assert(!DvBitmap.contains(bytes, p + 1))
        if (p > 0 && !set.contains(p - 1))
          assert(!DvBitmap.contains(bytes, p - 1))
      }
      assert(!DvBitmap.contains(bytes, -1L))
      assert(!DvBitmap.contains(bytes, DvBitmap.MaxPos))
    }
  }

  test("bitmap: dense chunk flips to bitset container") {
    // > 4096 positions in one 65536-chunk → bitmap kind
    val sorted = (0L until 9000L).filter(_ % 2 == 0).toArray
    val bytes = DvBitmap.build(sorted)
    assert(DvBitmap.cardinality(bytes) === sorted.length.toLong)
    sorted.foreach(p => assert(DvBitmap.contains(bytes, p)))
    assert(!DvBitmap.contains(bytes, 1L))
    assert(!DvBitmap.contains(bytes, 8999L))
  }

  // ---- write path ---------------------------------------------------------

  test("MoR DELETE attaches refs covering every counted file") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t1")
    t.delete(col("id") === 3 || col("id") === 150 || col("id") === 250)
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.nonEmpty)
    dels.foreach { d =>
      assert(d.dv.keySet === d.counts.keySet, "a ref per counted file")
      d.dv.values.foreach(r => assert(r.len > 0))
    }
    // ref cardinality equals the metadata count
    val conf = spark.sessionState.newHadoopConf()
    dels.foreach(d => d.dv.foreach { case (n, r) =>
      assert(DvBitmap.cardinality(DeleteVectors.cached(r, conf)) === d.counts(n))
    })
    // observability: delete_files metadata table reports full coverage
    val row = MetadataTables(t, "delete_files")
      .select("content", "referenced_data_files", "dv_covered_files", "dv_bytes")
      .collect().head
    assert(row.getString(0) === "position")
    assert(row.getLong(2) === row.getLong(1), "every referenced file covered")
    assert(row.getLong(3) > 0L)
  }

  test("rolled delete write: refs distributed across the rolled files") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t2")
    t.setProperties(Map("write.delete.target-records" -> "20"))
    t.delete(col("id") % 3 === 0) // 100 positions over 3 data files
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.size > 1, s"expected a rolled write, got ${dels.size}")
    dels.foreach(d => assert(d.dv.keySet === d.counts.keySet))
    // the r16 range roll SPLITS a data file's positions across delete
    // files (5 ranges over 3 files ⇒ at least one file spans two); each
    // owner carries a ref for exactly its own slice and the probe read
    // unions them — no anti-join fallback
    val owners = dels.flatMap(_.counts.keys)
    assert(owners.size > owners.distinct.size,
      s"expected a data file split across delete files, got $owners")
    dels.foreach(d => d.counts.foreach { case (n, c) =>
      assert(DvBitmap.cardinality(DeleteVectors.cached(d.dv(n),
        spark.sessionState.newHadoopConf())) === c,
        s"ref of $n must cover exactly its owner's slice")
    })
    assert(!hasJoin(t.toDF), "full pair coverage must probe, not anti-join")
    assert(ids(t.toDF) === (0L until 300L).filterNot(_ % 3 == 0))
  }

  test("disabled property: no refs, anti-join still correct") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t3")
    t.setProperties(Map(DeleteVectors.EnabledProperty -> "false"))
    t.delete(col("id") === 7)
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.forall(_.dv.isEmpty))
    assert(ids(t.toDF) === (0L until 300L).filterNot(_ == 7))
    assert(hasJoin(t.toDF), "uncovered mask must anti-join")
  }

  // ---- read path ----------------------------------------------------------

  test("DV-masked read: rows match anti-join oracle, no join, no delete-parquet scan") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t4")
    t.delete(col("id") === 3 || col("id") === 150)
    t.delete(col("id") >= 290) // second commit, second delete file
    val expected = (0L until 300L).filterNot(i => i == 3 || i == 150 || i >= 290)
    val dvDf = t.toDF
    assert(ids(dvDf) === expected)
    assert(!hasJoin(dvDf), "DV-covered mask must not join")
    assert(!scannedDeleteParquet(dvDf), "DV read must not scan delete parquet")
    // kill-switch re-read is the oracle
    spark.conf.set(DeleteVectors.ReadConf, "false")
    try {
      val aj = t.toDF
      assert(hasJoin(aj))
      assert(ids(aj) === expected)
    } finally spark.conf.unset(DeleteVectors.ReadConf)
  }

  test("partial coverage: covered files probe, uncovered anti-join, rows exact") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t5")
    t.delete(col("id") === 3) // covered commit
    t.setProperties(Map(DeleteVectors.EnabledProperty -> "false"))
    t.delete(col("id") === 150) // uncovered commit (different data file)
    val df = t.toDF
    assert(ids(df) === (0L until 300L).filterNot(i => i == 3 || i == 150))
    assert(hasJoin(df), "file b's mask must anti-join")
    // file-a probe and file-b anti-join coexist: a second delete on file a
    // WITHOUT a ref demotes file a to the anti-join too
    t.setProperties(Map(DeleteVectors.EnabledProperty -> "true"))
    t.delete(col("id") === 5) // covered again — file a now has covered+covered
    assert(ids(t.toDF) === (0L until 300L).filterNot(i => i == 3 || i == 150 || i == 5))
  }

  test("a file with refs from SOME but not ALL referencing delete files falls back") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t6")
    t.delete(col("id") === 1) // ref'd
    t.setProperties(Map(DeleteVectors.EnabledProperty -> "false"))
    t.delete(col("id") === 2) // same data file, no ref
    val df = t.toDF
    assert(ids(df) === (0L until 300L).filterNot(i => i == 1 || i == 2))
    assert(hasJoin(df), "mixed-coverage file must anti-join (partial bitmap is not the full mask)")
  }

  test("MoR UPDATE path attaches refs; read parity") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t7")
    t.update(Map("v" -> lit(-1.0)), Some(col("id") === 42))
    val snap = t.meta.currentSnapshot.get
    assert(snap.deleteFiles.nonEmpty)
    snap.deleteFiles.foreach(d => assert(d.dv.keySet === d.counts.keySet))
    val got = t.toDF.filter(col("id") === 42).select("v").collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(-1.0))
    assert(t.toDF.count() === 300L)
    assert(!hasJoin(t.toDF.filter(col("id") < 100)))
  }

  // ---- lifecycle ----------------------------------------------------------

  test("compaction retires refs; rewrite_position_deletes re-attaches merged refs") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t8")
    t.delete(col("id") === 3)
    t.delete(col("id") === 4)
    assert(t.meta.currentSnapshot.get.deleteFiles.size === 2)
    t.rewriteDeleteFiles() // fold 2 → 1, refs rebuilt through the same choke point
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.size === 1)
    assert(dels.head.dv.keySet === dels.head.counts.keySet)
    assert(ids(t.toDF) === (0L until 300L).filterNot(i => i == 3 || i == 4))
    assert(!hasJoin(t.toDF))
    t.rewriteDataFiles()
    assert(t.meta.currentSnapshot.get.deleteFiles.isEmpty)
    assert(ids(t.toDF) === (0L until 300L).filterNot(i => i == 3 || i == 4))
  }

  test("time travel reads an older snapshot's vectors; GC keeps referenced bundles") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t9")
    t.delete(col("id") === 3)
    val pinned = t.meta.currentSnapshot.get.snapshotId
    t.delete(col("id") === 4)
    // orphan sweep must not remove live bundles
    t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 3600_000L)
    assert(ids(t.read(snapshotId = Some(pinned))) === (0L until 300L).filterNot(_ == 3))
    assert(ids(t.toDF) === (0L until 300L).filterNot(i => i == 3 || i == 4))
  }

  test("expire + orphan sweep reclaims bundles no surviving snapshot references") {
    val cat = freshCatalog()
    val t = threeFileTable(cat, "dv.t10")
    t.delete(col("id") === 3)
    val bundles0 = t.meta.currentSnapshot.get.deleteFiles
      .flatMap(_.dv.values.map(_.bundle)).toSet
    assert(bundles0.nonEmpty)
    t.rewriteDataFiles() // folds the mask away; delete file + bundle now historical
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(t.location), spark.sessionState.newHadoopConf())
    bundles0.foreach { b =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(b)),
        s"expired bundle $b must be reclaimed")
    }
    assert(ids(t.toDF) === (0L until 300L).filterNot(_ == 3))
  }
}
