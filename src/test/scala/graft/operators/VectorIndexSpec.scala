package graft.operators

import graft.lake.LakeCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Persistent incremental IVF index ([[VectorIndex]]): the invariant
  * under test everywhere is *incremental ≡ rebuilt-from-scratch* — after
  * any base churn, a refreshed index must hold exactly the assignments a
  * full [[Similarity.ivfAssignWith]] pass over the live base produces
  * against the SAME pinned centroids, and probes over the index must
  * equal probes over that fresh assignment. */
class VectorIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-vidx").toString)

  /** Deterministic clustered vectors: cluster id%5 dominates one axis,
    * a hash ripple makes every vector distinct. */
  private def vec(id: Long): Seq[Float] = {
    val c = (id % 5).toInt
    (0 until 8).map { d =>
      (if (d == c) 10f else 0f) + ((id * 2654435761L + d * 97) % 7).toFloat * 0.1f
    }
  }

  private def vecDf(ids: Seq[Long]): DataFrame = {
    val rows = ids.map(i => org.apache.spark.sql.Row(i, vec(i)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType)))))
  }

  private def assignSet(df: DataFrame, cs: Seq[Seq[Float]]): Set[(Long, Int)] =
    Similarity.ivfAssignWith(df, cs, "id", "embedding")
      .select(col("id"), col("list_id").cast(IntegerType))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def indexSet(idx: VectorIndex): Set[(Long, Int)] =
    idx.state.toDF.select("id", "list_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("create + incremental refresh ≡ full reassignment against the " +
      "pinned centroids; watermark rides the commit") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vecs", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 300L))
    val idx = VectorIndex.create(cat, "db.vidx", base, "id", "embedding",
      nlist = 8, iters = 2)
    val cs = idx.centroids
    assert(cs.size === 8)
    assert(indexSet(idx) === assignSet(base.toDF, cs))
    assert(idx.watermark === base.meta.currentSnapshot.map(_.snapshotId))
    // churn: append — refresh assigns ONLY the new vectors, result is
    // indistinguishable from a full pass with the same centroids
    base.append(vecDf(300L until 450L))
    idx.refresh()
    assert(idx.centroids === cs, "refresh must never move centroids")
    assert(indexSet(idx) === assignSet(base.toDF, cs))
    assert(idx.watermark === base.meta.currentSnapshot.map(_.snapshotId))
    // no-op refresh: already at head, no new commit
    val v = idx.state.meta.version
    idx.refresh()
    assert(idx.state.meta.version === v, "a current index must not commit")
  }

  test("deletes, updates, and insert-then-delete inside one window all " +
      "land as the key's FINAL state") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vecs2", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 200L))
    val idx = VectorIndex.create(cat, "db.vidx2", base, "id", "embedding",
      nlist = 8, iters = 2)
    val cs = idx.centroids
    // window with three kinds of churn, refreshed ONCE:
    base.delete(col("id") < 20)                       // deletes
    base.mergeByKey("id", (50L until 60L).map(Long.box),  // updates (new vectors)
      vecDf((50L until 60L).map(i => i + 1000L)).withColumn("id", col("id") - 1000L))
    base.append(vecDf(900L until 910L))               // insert...
    base.delete(col("id") >= 900L)                    // ...then delete, same window
    idx.refresh()
    val got = indexSet(idx)
    assert(got === assignSet(base.toDF, cs))
    assert(!got.exists(_._1 < 20), "deleted keys must leave the index")
    assert(!got.exists(_._1 >= 900), "a key inserted and deleted inside " +
      "the window must not materialize")
    // updated keys present exactly once with the NEW vector's assignment
    val updated = assignSet(vecDf((50L until 60L).map(_ + 1000L))
      .withColumn("id", col("id") - 1000L), cs)
    assert(updated.subsetOf(got))
  }

  test("windowed refresh ≡ one-shot refresh (idempotent, resumable)") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vecs3", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 100L))
    val idx = VectorIndex.create(cat, "db.vidx3", base, "id", "embedding",
      nlist = 4, iters = 1)
    base.append(vecDf(100L until 150L))
    val mid = base.meta.currentSnapshot.get.snapshotId
    base.delete(col("id") % 7 === 0)
    base.append(vecDf(150L until 180L))
    // advance in two windows: (wm, mid], then (mid, head]
    idx.refresh(toSnapshotId = Some(mid))
    assert(idx.watermark === Some(mid))
    idx.refresh()
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))
  }

  test("search probes only the chosen posting-list partitions and equals " +
      "the ephemeral ivfTopK over a fresh full assignment") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vecs4", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 300L))
    val idx = VectorIndex.create(cat, "db.vidx4", base, "id", "embedding",
      nlist = 8, iters = 2)
    base.append(vecDf(300L until 400L))
    idx.refresh()
    val cs = idx.centroids
    val q = vec(123L).map(x => x + 0.05f)
    val got = idx.search(q, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.ivfTopK(
      Similarity.ivfAssignWith(base.toDF, cs, "id", "embedding"),
      cs, q, k = 10, nprobe = 2, "id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
    // physical claim: the probe scan is partition-pruned at the metadata
    // level — it reads strictly fewer files than the whole index
    val probe = Similarity.probeLists(cs, q, 2)
    val prunedFiles = idx.state.read(filter =
      Some(col("list_id").isin(probe.map(Int.box): _*))).inputFiles.length
    val allFiles = idx.state.toDF.inputFiles.length
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"probe must prune posting-list partitions: $prunedFiles of $allFiles")
  }

  test("drift → rebuild: new centroids + full reassignment, pins move " +
      "atomically, a reloaded index serves from the new state") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vecs5", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 200L))
    val idx = VectorIndex.create(cat, "db.vidx5", base, "id", "embedding",
      nlist = 4, iters = 2)
    val pin0 = idx.centroidSnapshot
    // shift the distribution: a new dominant cluster piles onto existing
    // lists (centroids never move incrementally) — imbalance grows
    val shifted = (1000L until 1400L).map(i =>
      org.apache.spark.sql.Row(i, (0 until 8).map(d =>
        (if (d == 6) 25f else 0f) + (i % 5).toFloat * 0.1f)))
    base.append(spark.createDataFrame(java.util.Arrays.asList(shifted: _*),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType))))))
    idx.refresh()
    val skewed = idx.imbalance
    assert(skewed > 1.5, s"piled-on lists must show imbalance, got $skewed")
    idx.rebuild(nlist = 6, iters = 2)
    val cs2 = idx.centroids
    assert(cs2.size === 6)
    assert(idx.centroidSnapshot > pin0, "rebuild must advance the centroid pin")
    assert(indexSet(idx) === assignSet(base.toDF, cs2))
    // reload from the catalog: spec recorded in properties, pins in
    // summaries — the reloaded handle probes identically
    val idx2 = VectorIndex.load(cat, "db.vidx5")
    val q = (0 until 8).map(d => if (d == 6) 25f else 0f)
    assert(idx2.search(q, k = 5, nprobe = 2).collect().toSeq ===
      idx.search(q, k = 5, nprobe = 2).collect().toSeq)
  }

  test("nearDuplicates: a new batch probes the index — exact at full " +
      "probe, near-dup recall at nprobe=1, never a corpus shuffle (r13)") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vnd", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 300L))
    val idx = VectorIndex.create(cat, "db.vnd_idx", base, "id", "embedding",
      nlist = 8, iters = 2)
    // batch = near-duplicates of existing rows (same cluster axis, tiny
    // ripple) plus genuinely new far vectors
    val batchRows = (1000L until 1040L).map { i =>
      val twin = i - 1000L // duplicates vec(twin) up to the ripple
      org.apache.spark.sql.Row(i, vec(twin).map(_ + 0.01f))
    } ++ (2000L until 2010L).map(i =>
      org.apache.spark.sql.Row(i, (0 until 8).map(d => ((i + d) % 5).toFloat - 2f)))
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(batchRows: _*), StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType)))))

    // ground truth: brute-force batch × corpus pairs over the threshold
    val brute = batch.select(col("id").as("batch_id"), col("embedding").as("qv"))
      .crossJoin(base.toDF.select(col("id").as("match_id"), col("embedding").as("mv")))
      .select(col("batch_id"), col("match_id"),
        Similarity.cosine(col("qv"), col("mv")).as("cos"))
      .filter(col("cos") >= 0.995)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("batch_id", "match_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(brute)
    assert(exact.nonEmpty, "test premise: the batch must contain near-dups")

    // full probe is EXACT
    assert(pairs(idx.nearDuplicates(batch, 0.995, nprobe = 8)) === exact)
    // nprobe=1: every returned pair is true (candidates verify exactly),
    // and every batch vector's actual TWIN is found — a near-duplicate
    // lands in its twin's list (SemDeDup's premise). Same-cluster
    // siblings above the loose threshold may be missed across list
    // boundaries — that is the recall IVF trades below full probe.
    val p1 = pairs(idx.nearDuplicates(batch, 0.995, nprobe = 1))
    assert(p1.subsetOf(exact))
    val twins = exact.filter { case (b, m) => b - 1000L == m }
    assert(twins.size === 40, "test premise: every injected twin scores above threshold")
    assert(twins.subsetOf(p1),
      s"nprobe=1 must find every true twin: ${(twins -- p1).take(5)}")
  }

  test("pins survive a maintenance-only retention window: expiry that " +
    "strands the centroid pin falls back to the centroid table's head") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vxp", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 150L))
    val idx = VectorIndex.create(cat, "db.vxp_i", base, "id", "embedding",
      nlist = 5, iters = 2)
    val before = idx.search(vec(7L), k = 5).collect().toSeq
    // a compaction commit carries no pins; expiring everything older
    // leaves ONLY it — the summary walk finds neither pin
    idx.state.rewriteDataFiles()
    idx.state.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    val m = idx.state.meta
    assert(m.snapshots.size === 1 &&
      !m.currentSnapshot.get.summary.contains("graft.vindex.centroids-snapshot"),
      "test premise: the retained snapshot must be pin-less")
    // fallback: centroid table's head is the pinned content (no torn
    // rebuild in flight) — probes keep answering identically
    assert(idx.search(vec(7L), k = 5).collect().toSeq === before)
    // the next refresh re-pins both keys
    base.append(vecDf(150L until 170L))
    idx.refresh()
    val s = idx.state.meta.currentSnapshot.get.summary
    assert(s.contains("graft.vindex.centroids-snapshot") &&
      s.contains("graft.vindex.base-snapshot"))
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))
  }

  test("filtered search over covered columns: maintained through refresh " +
    "and label churn, exact at full probe, recall ≥ 0.8 at two sizes " +
    "with selectivity-scaled nprobe") {
    val cat = freshCatalog()
    def run(tag: String, n: Long): Unit = {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      def df(ids: Seq[Long], lbl: Long => Int = i => (i % 7).toInt): DataFrame = {
        val rows = ids.map(i => org.apache.spark.sql.Row(i, vec(i), lbl(i)))
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      }
      val base = cat.createTable(s"db.vf$tag", schema)
      base.append(df(0L until n / 2))
      val idx = VectorIndex.create(cat, s"db.vf${tag}_i", base, "id", "embedding",
        nlist = 16, iters = 2, includeCols = Seq("label"))
      // the covered column is MAINTAINED: append the other half, flip
      // some labels, refresh — the index must serve the new labels
      base.append(df(n / 2 until n))
      base.mergeByKey("id", (0L until 10L).map(Long.box),
        df(0L until 10L, _ => 3))
      idx.refresh()
      val stateLabels = idx.state.toDF.filter(col("id") < 10)
        .select("label").collect().map(_.getInt(0)).toSet
      assert(stateLabels === Set(3), "refresh must carry covered-column updates")
      // full probe + filter ≡ brute force over the live base (exactness)
      val pred = col("label") === 3
      val q = vec(3L)
      val exact = idx.search(q, k = 10, nprobe = 16, filter = Some(pred))
        .collect().map(_.getLong(0)).toSeq
      val brute = base.toDF.filter(pred)
        .select(col("id"), Similarity.cosine(col("embedding"),
          typedLit(q)).as("cos"))
        .orderBy(col("cos").desc, col("id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
      assert(exact === brute, s"full-probe filtered search must be exact ($tag)")
      // selectivity-scaled pruned probe: nprobe=2 under a ~1/7 filter
      // scales to 14 of 16 lists — recall must hold at BOTH corpus sizes
      val approx = idx.search(q, k = 10, nprobe = 2, filter = Some(pred))
        .collect().map(_.getLong(0)).toSet
      val recall = approx.intersect(brute.toSet).size.toDouble / brute.size
      assert(recall >= 0.8, s"filtered recall $recall < 0.8 at n=$n")
    }
    run("a", 500L)
    run("b", 2000L)
  }

  test("pin_fallback is operator-visible: a stranded centroid pin shows " +
    "up in the `indexes` metadata table detail, and clears on re-pin") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vpf", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 120L))
    val idx = VectorIndex.create(cat, "db.vpf_i", base, "id", "embedding",
      nlist = 4, iters = 1)
    def detail() = graft.lake.MetadataTables(base, "indexes").collect()
      .map(_.getMap[String, String](6)).head
    assert(!idx.pinFallback && !detail().contains("pin_fallback"))
    // strand the pins: compaction commits carry none, expiry cuts the walk
    idx.state.rewriteDataFiles()
    idx.state.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    assert(idx.pinFallback, "test premise: pin stranded")
    assert(detail().get("pin_fallback").contains("true"),
      "the fallback must be surfaced, not only traded off in a scaladoc")
    // the availability fallback keeps serving; the next refresh re-pins
    // and the signal clears
    base.append(vecDf(120L until 140L))
    idx.refresh()
    assert(!idx.pinFallback && !detail().contains("pin_fallback"))
  }

  test("ingest-cadence auto-refresh: registered indexes track the base " +
      "head (the startIngest refreshIndexes hook); drop deregisters (r13)") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vri", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 200L))
    val idx = VectorIndex.create(cat, "db.vri_a", base, "id", "embedding",
      nlist = 6, iters = 2)
    // create registered the state location on the base's routing index
    assert(base.meta.properties.get(VectorIndex.IndexesKey)
      .exists(_.contains(idx.state.location)))

    // churn, then the ingest loop's per-batch call: index lands at head
    base.append(vecDf(200L until 260L))
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    assert(idx.watermark === base.meta.currentSnapshot.map(_.snapshotId))
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))

    // a second registered index refreshes in the same pass
    val idx2 = VectorIndex.create(cat, "db.vri_b", base, "id", "embedding",
      nlist = 4, iters = 1)
    base.append(vecDf(260L until 300L))
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    val head = base.meta.currentSnapshot.map(_.snapshotId)
    assert(idx.watermark === head && idx2.watermark === head)
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))

    // drop: BOTH tables gone and the registration cleared — the next
    // refresh pass touches only the survivor
    VectorIndex.drop(cat, "db.vri_b")
    assert(!cat.tableExists("db.vri_b") && !cat.tableExists("db.vri_b_centroids"))
    assert(!base.meta.properties.get(VectorIndex.IndexesKey)
      .exists(_.contains("vri_b")))
    base.append(vecDf(300L until 320L))
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    assert(idx.watermark === base.meta.currentSnapshot.map(_.snapshotId))
  }

  test("drift-to-rebuild policy: a drifting corpus trips the metadata-only " +
    "signal; the ingest loop records it at bounded cost, or auto-rebuilds") {
    val cat = freshCatalog()
    val base = cat.createTable("db.vdr", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 200L))
    val idx = VectorIndex.create(cat, "db.vdr_i", base, "id", "embedding",
      nlist = 4, iters = 2)
    // exact and metadata-only estimate agree on a fresh CoW index
    assert(math.abs(idx.imbalanceEstimate - idx.imbalance) < 1e-9)
    val balanced = idx.imbalanceEstimate
    idx.state.setProperties(Map(
      VectorIndex.ImbalanceThresholdKey -> "2.0"))
    // drift: one dense new region — every vector lands on the same list
    def driftDf(ids: Seq[Long]): org.apache.spark.sql.DataFrame = {
      val rows = ids.map(i => org.apache.spark.sql.Row(i,
        (0 until 8).map(d =>
          5f + ((i * 31 + d * 7) % 50) * 0.05f + d * 0.001f)))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType)))))
    }
    base.append(driftDf(1000L until 1800L))
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    val p1 = idx.state.meta.properties
    assert(idx.imbalanceEstimate > 2.0 && idx.imbalanceEstimate > balanced,
      "test premise: the drift shows in the estimate")
    assert(p1.contains(VectorIndex.DriftImbalanceKey) &&
      p1.contains(VectorIndex.DriftAtKey),
      "threshold exceeded without auto-rebuild must record the drift")
    // the signal is listed in the `indexes` metadata table detail
    val detail = graft.lake.MetadataTables(base, "indexes").collect()
      .map(_.getMap[String, String](6)).head
    assert(detail.contains("imbalance") && detail.contains("drift_imbalance"))
    // bounded cost: an unchanged estimate re-commits NOTHING per batch
    val v1 = idx.state.meta.version
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    assert(idx.state.meta.version === v1,
      "a steady drift record must not commit once per batch")
    // arm auto-rebuild: the next pass reclusters, clears the record, and
    // the rebuilt index is the exact assignment against its NEW centroids
    idx.state.updateProperties(_ + (VectorIndex.RebuildAutoKey -> "true"))
    val csBefore = idx.centroids
    val estBefore = idx.imbalanceEstimate
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    assert(idx.centroids !== csBefore, "auto-rebuild must recluster")
    assert(!idx.state.meta.properties.contains(VectorIndex.DriftImbalanceKey),
      "the drift record clears with the rebuild")
    assert(idx.imbalanceEstimate < estBefore,
      "reclustering over the drifted corpus must rebalance the lists")
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))
  }

  test("SQL surface: CALL create/refresh/rebuild_vector_index maintain the " +
      "index through the procedure catalog (r13)") {
    val wh = Files.createTempDirectory("graft-vidx-sql").toString
    spark.conf.set("spark.sql.catalog.vxc", classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vxc.warehouse", wh)
    org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
    val cat = new LakeCatalog(spark, wh)
    val base = cat.createTable("db.vb", StructType(Seq(
      StructField("id", LongType), StructField("embedding", ArrayType(FloatType)))))
    base.append(vecDf(0L until 200L))
    spark.sql("CALL vxc.system.create_vector_index('db.vidx_sql', 'db.vb', " +
      "id_col => 'id', nlist => 6, iters => 2)")
    val idx = VectorIndex.load(cat, "db.vidx_sql")
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))
    // churn + CALL refresh: incremental ≡ full reassignment, same pins
    base.append(vecDf(200L until 260L))
    spark.sql("CALL vxc.system.refresh_vector_index('db.vidx_sql')")
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))
    assert(idx.watermark === base.meta.currentSnapshot.map(_.snapshotId))
    // CALL rebuild: recluster at a new width, both pins move atomically
    val pin0 = idx.centroidSnapshot
    spark.sql("CALL vxc.system.rebuild_vector_index('db.vidx_sql', nlist => 4)")
    assert(idx.centroids.size === 4)
    assert(idx.centroidSnapshot > pin0)
    assert(indexSet(idx) === assignSet(base.toDF, idx.centroids))
    // CALL search: the registered view is bit-identical to the Scala
    // search (it IS the Scala search) — plain and filtered
    val q7 = vec(7L).mkString(",")
    spark.sql(s"CALL vxc.system.search_vector_index('db.vidx_sql', '$q7', " +
      "k => 8, nprobe => 3)")
    assert(spark.table("db_vidx_sql_search").collect().toSeq ===
      idx.search(vec(7L), 8, 3).collect().toSeq)
    spark.sql(s"CALL vxc.system.search_vector_index('db.vidx_sql', '$q7', " +
      "k => 8, nprobe => 2, view_name => 'vs_f', filter => 'id % 2 = 0')")
    assert(spark.table("vs_f").collect().toSeq ===
      idx.search(vec(7L), 8, 2,
        Some(org.apache.spark.sql.functions.expr("id % 2 = 0"))).collect().toSeq)
  }
}
