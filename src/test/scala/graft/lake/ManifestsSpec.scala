package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Manifest-chunked metadata: the properties that make commit cost O(churn)
  * instead of O(retained-snapshots × files) — the Iceberg manifest-list
  * capability (unchanged manifests REUSED across snapshots) re-expressed
  * for the JSON-root format. SCALEPROBE.md carries the measured bytes. */
class ManifestsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-manifests").toString)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  private def rows(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, i * 1.5)).toDF("id", "v")
  }

  private def metaDir(t: LakeTable) = new Path(t.location, "metadata")

  private def chunkFiles(t: LakeTable): Map[String, Long] = {
    val fs = metaDir(t).getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(metaDir(t))) Map.empty
    else {
      val it = fs.listFiles(metaDir(t), false)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.startsWith("manifest-")) b += st.getPath.getName -> st.getLen
      }
      b.result()
    }
  }

  private def rootJsonSize(t: LakeTable, version: Int): Long = {
    val fs = metaDir(t).getFileSystem(spark.sessionState.newHadoopConf())
    fs.getFileStatus(new Path(metaDir(t), s"v$version.json")).getLen
  }

  test("append reuses all parent chunks: chunk files grow linearly, not quadratically") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t1", schema)
    val n = 6
    (1 to n).foreach(i => t.append(rows(i * 10L, i * 10L + 1)))
    val m = t.meta
    val snaps = m.snapshots.sortBy(_.snapshotId)
    // snapshot k carries k chunk refs (parent's k-1 reused + 1 new)
    assert(snaps.zipWithIndex.forall { case (s, i) => s.manifests.size == i + 1 })
    // each parent chunk is reused BY NAME in the child
    snaps.sliding(2).foreach {
      case Seq(p, c) => assert(c.manifests.startsWith(p.manifests))
      case _ =>
    }
    // on disk: n distinct chunk files total — not n(n+1)/2 — plus one
    // manifest list per snapshot
    assert(chunkFiles(t).count(!_._1.startsWith("manifest-list-")) === n)
    assert(chunkFiles(t).count(_._1.startsWith("manifest-list-")) === n)
    // and the version JSON no longer embeds file lists
    val fs = metaDir(t).getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(new Path(metaDir(t), s"v${m.version}.json"))
    val raw = Meta.fromJson(
      try new String(in.readAllBytes(), "UTF-8") finally in.close())
    assert(raw.snapshots.forall(_.files.isEmpty))
    // the root holds ONE manifest-list pointer per snapshot (O(snapshots)),
    // never the chunk names themselves
    assert(raw.snapshots.forall(_.manifests.isEmpty))
    assert(raw.snapshots.forall(_.manifestList.isDefined))
  }

  test("metadata bytes written per append are O(churn): flat as the table grows") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t2", schema)
    var seen = Set.empty[String]
    val perCommitNewChunkBytes = (1 to 8).map { i =>
      t.append(rows(i * 100L))
      val now = chunkFiles(t).view.filterKeys(!_.startsWith("manifest-list-")).toMap
      val fresh = now.view.filterKeys(k => !seen.contains(k)).values.sum
      seen = now.keySet
      fresh
    }
    // every append writes exactly one new chunk of one file: identical churn
    // ⇒ near-identical CHUNK bytes, regardless of how many files the table
    // holds (the per-snapshot manifest LIST grows by one ~45-byte name per
    // chunk — O(chunks), stats-free, compacted by rewrite_manifests)
    assert(perCommitNewChunkBytes.max <= perCommitNewChunkBytes.min + 16,
      s"append chunk bytes should be flat, got $perCommitNewChunkBytes")
    // root JSON grows only with snapshot count × chunk refs (names), never
    // embedding per-file stats: the increment per snapshot stays small
    val m = t.meta
    assert(rootJsonSize(t, m.version) < 16 * 1024)
  }

  test("fresh handle resolves files from chunks; reads and time travel intact") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t3", schema)
    t.append(rows(1, 2, 3))
    val firstSnap = t.meta.currentSnapshot.get.snapshotId
    t.append(rows(4, 5))
    // a brand-new handle must re-inflate from manifest chunks
    val t2 = cat.loadTable("m.t3")
    assert(t2.toDF.count() === 5)
    assert(t2.read(snapshotId = Some(firstSnap)).count() === 3)
    assert(t2.meta.snapshots.forall(s => s.files.nonEmpty && s.manifests.nonEmpty))
  }

  test("delete rewrites only the touched chunks; untouched chunks reused by name") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t4", schema)
    t.append(rows(1, 2))   // chunk A
    t.append(rows(10, 11)) // chunk B
    t.append(rows(20, 21)) // chunk C
    val before = t.meta.currentSnapshot.get.manifests
    assert(before.size === 3)
    t.delete(col("id") === 10L || col("id") === 11L) // kills chunk B's file entirely
    val after = t.meta.currentSnapshot.get.manifests
    // A and C survive by name; B's file was dropped (metadata-only delete)
    assert(after === Seq(before.head, before.last))
  }

  test("rewrite_manifests compacts fragmented chunks; content unchanged; idempotent") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t5", schema)
    (1 to 5).foreach(i => t.append(rows(i * 10L)))
    val frag = t.meta.currentSnapshot.get
    assert(frag.manifests.size === 5)
    val sumBefore = t.toDF.agg(sum("v")).head.getDouble(0)
    val m1 = t.rewriteManifests()
    val compacted = m1.currentSnapshot.get
    assert(compacted.operation === "rewrite-manifests")
    assert(compacted.manifests.size === 1) // 5 files ≪ target-files per chunk
    assert(compacted.files.map(_.path) === frag.files.map(_.path))
    assert(t.toDF.agg(sum("v")).head.getDouble(0) === sumBefore)
    // second call: already compact — identity transform, no new version
    val v = m1.version
    assert(t.rewriteManifests().version === v)
  }

  test("expire_snapshots reclaims chunks no survivor references, keeps shared ones") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t6", schema)
    t.append(rows(1))
    t.overwrite(rows(7, 8)) // snapshot 2's chunk does NOT share snapshot 1's
    t.append(rows(9))
    val allChunks = chunkFiles(t).keySet
    assert(allChunks.count(!_.startsWith("manifest-list-")) === 3)
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 2)
    val kept = chunkFiles(t).keySet
    val live = t.meta.snapshots.flatMap(s => s.manifests ++ s.manifestList).toSet
    assert(kept === live)           // exactly the referenced chunks+lists survive
    assert(kept.subsetOf(allChunks)) // overwrite+append chunks shared by survivors
    assert(kept.count(_.startsWith("manifest-list-")) === 2)
    assert(kept.count(n => !n.startsWith("manifest-list-")) === 2)
    assert(t.toDF.count() === 3)
  }

  test("remove_orphan_files sweeps chunks from lost commits") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t7", schema)
    t.append(rows(1, 2))
    // simulate a crashed writer's orphan chunk
    val fs = metaDir(t).getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new Path(metaDir(t), "manifest-deadbeefdeadbeef.json")
    val out = fs.create(orphan, true)
    out.write(Meta.chunkToJson(Seq.empty).getBytes("UTF-8")); out.close()
    val removed = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.exists(_.endsWith("manifest-deadbeefdeadbeef.json")))
    assert(!fs.exists(orphan))
    assert(t.toDF.count() === 2) // live chunks untouched
  }

  test("manifests metadata table surfaces real chunks with sharing counts") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t9", schema)
    t.append(rows(1, 2))
    t.append(rows(3))
    val mt = MetadataTables(t, "manifests").collect()
    assert(mt.length === 2) // current snapshot references two chunks
    val byAdded = mt.map(r => r.getAs[Long]("added_snapshot_id") ->
      (r.getAs[Long]("existing_data_files_count"), r.getAs[Long]("shared_by_snapshots"))).toMap
    // chunk from snapshot 1 is SHARED by both snapshots; snapshot 2's is its own
    assert(byAdded(1L)._2 === 2L)
    assert(byAdded(2L)._2 === 1L)
    assert(mt.map(_.getAs[Long]("existing_rows_count")).sum === 3L)
    assert(mt.forall(_.getAs[Long]("length") > 0L))
  }

  test("chunk target-files property bounds chunk size and rewrite honors it") {
    val cat = freshCatalog()
    val t = cat.createTable("m.t8", schema,
      properties = Map("graft.manifest.target-files" -> "2"))
    // one append spread over several data files (empty shuffle partitions
    // produce no file, so assert the invariant against the actual count)
    t.append(rows(1L to 10L: _*).repartition(5))
    val snap = t.meta.currentSnapshot.get
    assert(snap.files.size >= 3)
    assert(snap.manifests.size === (snap.files.size + 1) / 2) // ceil(files/2)
    val resolved = cat.loadTable("m.t8").toDF
    assert(resolved.count() === 10)
  }
}
