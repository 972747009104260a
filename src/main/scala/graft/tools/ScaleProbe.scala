package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the heaviest pipelines (q21 MinHash-LSH, q22
  * exact-Jaccard, q24 embedding near-dup, q52 dup-ngram-fraction):
  * synthesizes an N× corpus
  * in-memory by unioning sf0.1 with id-offset copies, runs each query at
  * 1× and N×, and records wall time + shuffle read/write bytes.
  *
  * The point is growth SHAPE, not absolute speed: a candidate-generation
  * stage that is secretly all-pairs shows ~N² time/shuffle growth here;
  * the bucketed plans should grow ~linearly. To keep the comparison
  * honest, each copy's content is made disjoint from the others:
  *   - documents: every word in copy i > 0 gets a `_ci` suffix
  *     (regexp_replace), so shingles/word-sets never collide across
  *     copies. Identical docs WITHIN a copy keep their duplicate
  *     structure, so per-copy work is the 1× workload exactly.
  *   - embeddings: labels get a per-copy offset, so the label-blocked
  *     pairing never crosses copies.
  * Without this, every original duplicate cluster of size c becomes one
  * of size N·c and the OUTPUT itself grows ~N² — a property of the data,
  * not the plan, and it would mask the signal the probe exists to catch.
  *
  * Run: sbt "runMain graft.tools.ScaleProbe"  (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_SCALE, SPARK_GRAFT_CPUS). Emits one JSON line per
  * (query, scale) plus a growth summary; results are recorded in
  * SCALEPROBE.md next to the bench numbers.
  */
object ScaleProbe {
  private val IdOffset = 10000000L

  /** The i-th content-disjoint copy of the base documents (i = 0 is the
    * base itself): ids offset per copy, every word suffixed per copy so
    * vocabularies never collide across copies. */
  def docCopy(spark: SparkSession, i: Int): DataFrame = {
    val base = spark.table("documents_base")
    if (i == 0) base
    else base.select(
      (col("doc_id") + lit(i * IdOffset)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", s"$$1_c$i").as("text"),
      col("lang"), col("source"), col("n_chars"))
  }

  def scaledDocuments(spark: SparkSession, copies: Int): DataFrame =
    (1 until copies).foldLeft(docCopy(spark, 0))((acc, i) =>
      acc.unionByName(docCopy(spark, i)))

  def scaledEmbeddings(spark: SparkSession, copies: Int): DataFrame = {
    val base = spark.table("embeddings_base")
    (1 until copies).foldLeft(base) { (acc, i) =>
      acc.unionByName(base.select(
        (col("vec_id") + lit(i * IdOffset)).as("vec_id"),
        col("embedding"),
        (col("label") + lit(i * 100000)).as("label")))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: spark.driver.memory is NOT settable here — the JVM is
      // already running (sbt runMain), and in local mode the driver heap
      // IS the executor heap. Size it via the SPARK_DRIVER_MEM env var,
      // which build.sbt turns into the forked JVM's -Xmx.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    graft.Tables.registerAll(spark, sfDir)
    spark.table("documents").createOrReplaceTempView("documents_base")
    spark.table("embeddings").createOrReplaceTempView("embeddings_base")

    val probes = Seq("q21_minhash_lsh_pairs", "q22_jaccard_pairs",
      "q24_embedding_neardup", "q52_dup_ngram_frac")
    val results = collection.mutable.Map[(String, Int), (Double, Long, Long, Long)]()

    for (scale <- Seq(1, scaleN)) {
      scaledDocuments(spark, scale).createOrReplaceTempView("documents")
      scaledEmbeddings(spark, scale).createOrReplaceTempView("embeddings")
      for (name <- probes) {
        val spec = graft.QueryRegistry.byName(name)
        val t0 = System.nanoTime()
        val rows = spec.fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; a fixed sleep can lose the
        // tail of a busy bus (bleeding this query's bytes into the next
        // query's counters), so poll until the counters are stable across
        // two consecutive samples (capped)
        var stable = 0; var last = (-1L, -1L); var waited = 0
        while (stable < 2 && waited < 10000) {
          Thread.sleep(250); waited += 250
          val cur = (shuffleRead.get(), shuffleWrite.get())
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        val (r, w) = (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
        results((name, scale)) = (secs, rows, r, w)
        println(f"""{"query":"$name","scale":$scale,"secs":$secs%.2f,"rows":$rows,""" +
          f""""shuffle_read_mb":${r / 1e6}%.1f,"shuffle_write_mb":${w / 1e6}%.1f}""")
      }
    }

    // lake-merge growth: a FIXED 500-key changelog merged into a table of
    // 1x vs Nx copies (appended per copy, so data-file key bounds are
    // per-copy). The claim under test: per-batch merge cost scales with
    // the changelog, not the table — bounds pruning must keep the
    // rewritten-file count IDENTICAL at both scales and wall time ~flat.
    for (scale <- Seq(1, scaleN)) {
      val cat = new graft.lake.LakeCatalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft-probe-$scale").toString)
      val t = cat.createTable(s"probe.docs$scale",
        spark.table("documents_base").schema)
      (0 until scale).foreach(i => t.append(docCopy(spark, i)))
      val batch = docCopy(spark, 0).filter(col("doc_id") < 500)
        .withColumn("text", concat(col("text"), lit(" upd")))
      val t0 = System.nanoTime()
      val committed = t.mergeByKeys("doc_id", batch, batch)
      val secs = (System.nanoTime() - t0) / 1e9
      val rewritten = committed.currentSnapshot
        .flatMap(_.summary.get("rewritten-data-files")).getOrElse("?")
      println(f"""{"probe":"lake_merge","table_copies":$scale,"secs":$secs%.2f,""" +
        f""""batch_keys":500,"rewritten_files":$rewritten,"table_rows":${t.toDF.count()}}""")
    }

    // changelog growth: the CDC diff (LakeTable.changelog) is per-commit
    // and file-set-pruned — a FIXED-churn DELETE (copy-0 keys only; other
    // copies' files have disjoint doc_id bounds, so stats-pruning leaves
    // them untouched) into a 1x vs Nx table must produce IDENTICAL event
    // counts and ~flat diff wall time: cost ∝ churn, never table size.
    for (scale <- Seq(1, scaleN)) {
      val cat = new graft.lake.LakeCatalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft-cdcprobe-$scale").toString)
      val t = cat.createTable(s"probe.cdc$scale",
        spark.table("documents_base").schema)
      (0 until scale).foreach(i => t.append(docCopy(spark, i)))
      val before = t.meta.currentSnapshot.get.snapshotId
      t.delete(col("doc_id") < 100)
      val head = t.meta.currentSnapshot.get.snapshotId
      val t0 = System.nanoTime()
      val events = t.changelog(Some(before), head)
        .groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"changelog","table_copies":$scale,"secs":$secs%.2f,""" +
        f""""delete_events":${events.getOrElse("DELETE", 0L)},""" +
        f""""insert_events":${events.getOrElse("INSERT", 0L)},""" +
        f""""table_rows":${t.toDF.count()}}""")
    }

    // distributed-CC growth: q51/q57's 100 TB path (driverMaxEdges = 0
    // forces the min-label loop; the bench exercises the driver union-find
    // below the gate) over the q21 LSH pair graph at 1x vs Nx. Rounds
    // should be scale-INVARIANT (per-copy component structure IS the 1x
    // structure — diameter doesn't grow with disjoint copies) and
    // per-round shuffle ~linear in the edge count. Round 0 = setup (pair
    // pipeline + edge materialization + initial labels).
    for (scale <- Seq(1, scaleN)) {
      scaledDocuments(spark, scale).createOrReplaceTempView("documents")
      val pairs = graft.QueryRegistry.byName("q21_minhash_lsh_pairs").fn(spark, sfDir)
      val rounds = collection.mutable.ArrayBuffer[(Int, Long, Double, Long, Long)]()
      def drain(): (Long, Long) = {
        var stable = 0; var last = (-1L, -1L); var waited = 0
        while (stable < 2 && waited < 3000) {
          Thread.sleep(100); waited += 100
          val cur = (shuffleRead.get(), shuffleWrite.get())
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
      }
      drain() // isolate this run's counters from the previous stage
      val t0 = System.nanoTime()
      val labels = graft.operators.Dedup.connectedComponents(pairs,
        driverMaxEdges = 0L,
        onRound = (i, ch, secs) => { val (r, w) = drain(); rounds += ((i, ch, secs, r, w)) })
      val labeled = labels.count()
      val total = (System.nanoTime() - t0) / 1e9
      val perRound = rounds.map { case (i, ch, s, r, w) =>
        f"""{"round":$i,"changed":$ch,"secs":$s%.2f,""" +
          f""""shuffle_read_mb":${r / 1e6}%.1f,"shuffle_write_mb":${w / 1e6}%.1f}"""
      }.mkString("[", ",", "]")
      println(f"""{"probe":"cc_distributed","scale":$scale,"rounds":${rounds.size - 1},""" +
        f""""labeled":$labeled,"total_secs":$total%.2f,"per_round":$perRound}""")
    }

    // bloom decontamination growth: a FIXED eval set (copy-0 fingerprints;
    // other copies' word-suffixed texts hash differently, so bloom hits
    // stay constant) subtracted from a 1x vs Nx corpus. The claim under
    // test: the exact anti-join's left side is the bloom-hit sliver
    // (constant here), so the Nx run pays only the extra codegen'd scan —
    // wall grows ≪ N and dropped counts are identical.
    for (scale <- Seq(1, scaleN)) {
      val corpus = scaledDocuments(spark, scale)
      val eval = spark.table("documents_base")
        .filter(col("doc_id") % 97 < 5).select(md5(lower(col("text"))).as("fp"))
      val t0 = System.nanoTime()
      val kept = graft.operators.Decontaminate
        .decontaminate(corpus, eval, md5(lower(col("text"))), "fp").count()
      val secs = (System.nanoTime() - t0) / 1e9
      val total = corpus.count()
      println(f"""{"probe":"bloom_decontaminate","scale":$scale,"secs":$secs%.2f,""" +
        f""""corpus_rows":$total,"kept":$kept,"dropped":${total - kept}}""")
    }

    // DSIR growth (r16): a FIXED target corpus scored against a 1x vs Nx
    // pool with hashed bigrams (q101's shape, the bench's heaviest
    // query). The claim under test: the pool pass is the ONLY stage that
    // grows — one tokenize+hash pass feeding both the source model and
    // the scores, with the 4096-row ratio table broadcast — so wall and
    // shuffle grow ~linearly in pool bytes (per-byte flat), never N²
    // (no all-pairs, no pool-side re-pass). top-k is constant output.
    for (scale <- Seq(1, scaleN)) {
      val pool = scaledDocuments(spark, scale)
      val target = spark.table("documents_base")
        .filter(col("doc_id") % 97 < 5).select(col("doc_id"), col("text"))
      var stable = 0; var last = (-1L, -1L); var waited = 0
      while (stable < 2 && waited < 3000) {
        Thread.sleep(100); waited += 100
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      shuffleRead.set(0L); shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val picked = graft.operators.Dsir
        .select(pool, target, k = 200, ngrams = 2).count()
      val secs = (System.nanoTime() - t0) / 1e9
      stable = 0; last = (-1L, -1L); waited = 0
      while (stable < 2 && waited < 10000) {
        Thread.sleep(250); waited += 250
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val (r, w) = (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
      println(f"""{"probe":"dsir_bigram","scale":$scale,"secs":$secs%.2f,""" +
        f""""picked":$picked,"shuffle_read_mb":${r / 1e6}%.1f,""" +
        f""""shuffle_write_mb":${w / 1e6}%.1f}""")
    }

    // k-means growth (r16, q105/q107's operator): FIXED k·dim model
    // trained over a 1x vs Nx vector set. The claim under test: each
    // Lloyd round is ONE codegen'd assignment pass (broadcast centroid
    // literal, no join) + a partial agg whose shuffle payload is k·dim
    // rows PER TASK — so wall grows ~linearly in rows and shuffle bytes
    // stay ~flat (task-count-bound, never row-bound). Driver state is
    // k·dim longs at any size.
    for (scale <- Seq(1, scaleN)) {
      val vecs = scaledEmbeddings(spark, scale)
      shuffleRead.set(0L); shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val model = graft.operators.Clustering.kmeansTrain(
        vecs, "embedding", "vec_id", k = 8, iters = 3)
      val assigned = graft.operators.Clustering.assign(vecs, "embedding", model)
        .groupBy("cluster_id").count().count()
      val secs = (System.nanoTime() - t0) / 1e9
      var stable = 0; var last = (-1L, -1L); var waited = 0
      while (stable < 2 && waited < 10000) {
        Thread.sleep(250); waited += 250
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val (r, w) = (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
      println(f"""{"probe":"kmeans","scale":$scale,"secs":$secs%.2f,""" +
        f""""clusters":$assigned,"inertia_last":${model.inertiaTrace.last},""" +
        f""""shuffle_read_mb":${r / 1e6}%.1f,"shuffle_write_mb":${w / 1e6}%.1f}""")
    }

    // storage-partitioned join: the SAME co-bucketed orders⋈customer
    // aggregate with SPJ off vs on. The claim under test: SPJ removes the
    // join-input shuffles entirely — shuffle bytes collapse to the
    // post-join aggregate's rows, wall follows; the saved volume is the
    // two tables' width, which at 100 TB IS the query cost.
    {
      val wh = java.nio.file.Files.createTempDirectory("graft-spjprobe").toString
      spark.conf.set("spark.sql.catalog.lake", "graft.lake.dsv2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
      org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
      spark.sql("CREATE DATABASE lake.probe")
      spark.sql("""CREATE TABLE lake.probe.o (o_orderkey BIGINT, o_custkey BIGINT,
                  |  o_totalprice DOUBLE) PARTITIONED BY (bucket(16, o_custkey))
                  |TBLPROPERTIES ('write.distribution-mode'='hash')""".stripMargin)
      spark.sql("INSERT INTO lake.probe.o SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
      spark.sql("""CREATE TABLE lake.probe.c (c_custkey BIGINT, c_mktsegment STRING)
                  |PARTITIONED BY (bucket(16, c_custkey))
                  |TBLPROPERTIES ('write.distribution-mode'='hash')""".stripMargin)
      spark.sql("INSERT INTO lake.probe.c SELECT c_custkey, c_mktsegment FROM customer")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def q = spark.sql("""SELECT c_mktsegment, COUNT(*) AS n, SUM(o_totalprice) AS rev
                          |FROM lake.probe.o o JOIN lake.probe.c c
                          |  ON o.o_custkey = c.c_custkey
                          |GROUP BY c_mktsegment""".stripMargin)
      for (spj <- Seq(false, true)) {
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
        shuffleRead.set(0L); shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        val n = q.count()
        val secs = (System.nanoTime() - t0) / 1e9
        var stable = 0; var last = (-1L, -1L); var waited = 0
        while (stable < 2 && waited < 10000) {
          Thread.sleep(250); waited += 250
          val cur = (shuffleRead.get(), shuffleWrite.get())
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
        val (r, w) = (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
        println(f"""{"probe":"spj_join","spj":$spj,"secs":$secs%.2f,"groups":$n,""" +
          f""""shuffle_read_mb":${r / 1e6}%.2f,"shuffle_write_mb":${w / 1e6}%.2f}""")
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    }

    // incremental-dedup growth (r9): a FIXED 1000-doc batch ingested
    // against a signature index of 1x vs Nx accepted docs. The claim
    // under test: per-ingest cost is O(batch + candidates), never
    // O(corpus) — the candidate join broadcasts the batch-sized banded
    // side, so SHUFFLE bytes stay ~flat while the index grows 10x (the
    // index side is scanned, not shuffled; with a bucket-partitioned
    // index it would also file-prune). Word-suffixed copies keep the
    // batch's cross-corpus duplicate structure IDENTICAL at both scales,
    // so dropped/survivor counts must match exactly.
    for (scale <- Seq(1, scaleN)) {
      val cat = new graft.lake.LakeCatalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft-incdedup-$scale").toString)
      val index = cat.createTable(s"probe.idx$scale",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("signature",
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))))
      // seed the index with the accepted corpus (1x or Nx copies)
      (0 until scale).foreach { i =>
        val corpus = docCopy(spark, i).filter(col("doc_id") % 2 === 0)
        val sig = graft.operators.Dedup.minHashSignatures(corpus, "text", "doc_id")
        index.append(graft.operators.IncrementalDedup.banded(sig, "doc_id", 16, 4))
      }
      val indexedRows = index.toDF.count()
      // fixed batch: 1000 copy-0 docs (half already indexed -> real dups)
      val batch = spark.table("documents_base").filter(col("doc_id") < 1000)
      // drain counters, then measure the ingest alone
      var stable = 0; var last = (-1L, -1L); var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      shuffleRead.set(0L); shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val res = graft.operators.IncrementalDedup.ingest(index, batch)
      val survivors = res.survivors.count(); val dropped = res.dropped.count()
      val secs = (System.nanoTime() - t0) / 1e9
      stable = 0; last = (-1L, -1L); waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val (r, w) = (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
      println(f"""{"probe":"incremental_dedup","index_copies":$scale,"indexed_rows":$indexedRows,""" +
        f""""batch":1000,"survivors":$survivors,"dropped":$dropped,"secs":$secs%.2f,""" +
        f""""shuffle_read_mb":${r / 1e6}%.2f,"shuffle_write_mb":${w / 1e6}%.2f}""")
    }

    // materialized-aggregate refresh growth (r9): a FIXED churn (one
    // appended copy-0 slice) refreshed into an MV over a 1x vs Nx base
    // table. The claim under test: refresh reads the file-set-pruned
    // changelog — cost tracks CHURN, so wall stays ~flat while the base
    // grows 10x.
    for (scale <- Seq(1, scaleN)) {
      val cat = new graft.lake.LakeCatalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft-mvprobe-$scale").toString)
      val base = cat.createTable(s"probe.mvbase$scale",
        spark.table("documents_base").schema)
      (0 until scale).foreach(i => base.append(docCopy(spark, i)))
      val mv = graft.lake.MaterializedAgg.create(cat, s"probe.mv$scale", base,
        groupBy = Seq("lang"),
        aggs = Seq(graft.lake.MaterializedAgg.AggCol("sum", "n_chars", "chars"),
          graft.lake.MaterializedAgg.AggCol("count", "doc_id", "docs")))
      mv.refresh() // initial full build (cost O(base), expected to grow)
      // FIXED churn: append 2000 fresh rows, then refresh
      val churn = docCopy(spark, 0).filter(col("doc_id") < 2000)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
      base.append(churn)
      val t0 = System.nanoTime()
      mv.refresh()
      val secs = (System.nanoTime() - t0) / 1e9
      val mvRows = mv.read().count()
      println(f"""{"probe":"mv_refresh","base_copies":$scale,""" +
        f""""base_rows":${base.toDF.count()},"churn_rows":2000,""" +
        f""""refresh_secs":$secs%.2f,"mv_groups":$mvRows}""")
    }

    // star-schema MV refresh growth (r9): same fixed-churn shape, but the
    // view groups by a DIMENSION attribute (broadcast DimJoin enrichment
    // on `source`). The claim under test: the dim broadcast is a
    // constant-size addition to the churn-sized delta aggregation, so
    // star refresh wall stays ~flat under 10x base growth too.
    for (scale <- Seq(1, scaleN)) {
      val cat = new graft.lake.LakeCatalog(spark,
        java.nio.file.Files.createTempDirectory(s"graft-starmv-$scale").toString)
      val base = cat.createTable(s"probe.starbase$scale",
        spark.table("documents_base").schema)
      (0 until scale).foreach(i => base.append(docCopy(spark, i)))
      val dim = cat.createTable("probe.srcdim", new org.apache.spark.sql.types.StructType()
        .add("src_key", "string").add("tier", "string"))
      dim.append(spark.table("documents_base").select(col("source").as("src_key"))
        .distinct().withColumn("tier",
          when(substring(col("src_key"), -1, 1).isin("0", "2", "4", "6", "8"), "even")
            .otherwise("odd")))
      val mv = graft.lake.MaterializedAgg.create(cat, s"probe.starmv$scale", base,
        groupBy = Seq("tier"),
        aggs = Seq(graft.lake.MaterializedAgg.AggCol("sum", "n_chars", "chars"),
          graft.lake.MaterializedAgg.AggCol("count", "doc_id", "docs")),
        dims = Seq(graft.lake.MaterializedAgg.DimJoin("probe.srcdim", "source", "src_key")))
      mv.refresh()
      val churn = docCopy(spark, 0).filter(col("doc_id") < 2000)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
      base.append(churn)
      val t0 = System.nanoTime()
      mv.refresh()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"star_mv_refresh","base_copies":$scale,""" +
        f""""base_rows":${base.toDF.count()},"churn_rows":2000,""" +
        f""""refresh_secs":$secs%.2f,"mv_groups":${mv.read().count()}}""")
    }

    // merge-on-read point delete (r9): DELETE one row out of a 1x vs Nx
    // table, copy-on-write vs merge-on-read. The claim under test: CoW
    // writes bytes proportional to the CONTAINING FILE (at 100 TB, a
    // gigabyte rewrite for a one-row delete); MoR writes a kilobyte
    // positional delete file + O(churn) metadata, independent of file and
    // table size — while scans stay row-identical.
    for (scale <- Seq(1, scaleN); mode <- Seq("copy-on-write", "merge-on-read")) {
      val whDir = java.nio.file.Files.createTempDirectory(s"graft-morprobe-$scale-$mode")
      val cat = new graft.lake.LakeCatalog(spark, whDir.toString)
      val t = cat.createTable(s"probe.mor$scale",
        spark.table("documents_base").schema)
      t.setProperties(Map("write.delete.mode" -> mode))
      (0 until scale).foreach(i => t.append(docCopy(spark, i)))
      def treeBytes(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
      val before = treeBytes(whDir)
      val t0 = System.nanoTime()
      t.delete(col("doc_id") === 7) // one row, one containing file
      val secs = (System.nanoTime() - t0) / 1e9
      val written = treeBytes(whDir) - before
      val rows = t.toDF.count()
      println(f"""{"probe":"mor_delete","table_copies":$scale,"mode":"$mode",""" +
        f""""secs":$secs%.2f,"bytes_written":$written,"rows_after":$rows}""")
    }

    // equality-delete upsert (r9): a FIXED 500-key CDC batch merged into a
    // 1x vs Nx table, copy-on-write vs merge-on-read. The claim under
    // test: CoW rewrites every key-overlapping file (bytes grow with the
    // table), merge-on-read commits ONE equality delete + the appended
    // upserts — bytes ∝ batch, flat in table size, which is what makes
    // continuous CDC ingest survive 100 TB.
    for (scale <- Seq(1, scaleN); mode <- Seq("copy-on-write", "merge-on-read")) {
      val whDir = java.nio.file.Files.createTempDirectory(s"graft-upsprobe-$scale-$mode")
      val cat = new graft.lake.LakeCatalog(spark, whDir.toString)
      val t = cat.createTable(s"probe.ups$scale",
        spark.table("documents_base").schema)
      if (mode == "merge-on-read")
        t.setProperties(Map("write.merge.mode" -> "merge-on-read"))
      (0 until scale).foreach(i => t.append(docCopy(spark, i)))
      def treeBytes(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }
      val batch = docCopy(spark, 0).filter(col("doc_id") < 500)
        .withColumn("text", concat(col("text"), lit(" upd")))
      val before = treeBytes(whDir)
      val t0 = System.nanoTime()
      t.mergeByKeys("doc_id", batch.select(col("doc_id")), batch)
      val secs = (System.nanoTime() - t0) / 1e9
      val written = treeBytes(whDir) - before
      println(f"""{"probe":"upsert_commit","table_copies":$scale,"mode":"$mode",""" +
        f""""batch_keys":500,"secs":$secs%.2f,"bytes_written":$written,""" +
        f""""rows":${t.toDF.count()}}""")
    }

    // BPE training growth (r9): the corpus is scanned ONCE (histogram
    // build); every merge round then shuffles only the vocabulary-sized
    // histogram. The claim under test: per-round shuffle bytes track the
    // HISTOGRAM (vocab), not the corpus — here the word-suffixed copies
    // grow vocab ~linearly, so round cost growing ~linearly (not with
    // corpus bytes × rounds) is the histogram factorization working.
    for (scale <- Seq(1, scaleN)) {
      // PLAIN copies (ids offset, text identical): the vocabulary stays
      // FIXED while the corpus grows Nx — so flat train cost IS the
      // histogram factorization, not a coincidence of vocab growth
      val base = spark.table("documents_base")
      val corpus = (1 until scale).foldLeft(base)((acc, i) =>
        acc.unionByName(base.withColumn("doc_id", col("doc_id") + lit(i * IdOffset))))
      val hist = graft.operators.Bpe.wordHistogram(corpus, "text").cache()
      val t0 = System.nanoTime()
      val vocab = hist.count() // one corpus scan, materialized
      val tHist = (System.nanoTime() - t0) / 1e9
      var stable = 0; var last = (-1L, -1L); var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      shuffleRead.set(0L); shuffleWrite.set(0L)
      val t1 = System.nanoTime()
      val model = graft.operators.Bpe.train(hist, numMerges = 16,
        candidatesPerRound = 8)
      val tTrain = (System.nanoTime() - t1) / 1e9
      stable = 0; last = (-1L, -1L); waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = (shuffleRead.get(), shuffleWrite.get())
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      val (r, w) = (shuffleRead.getAndSet(0L), shuffleWrite.getAndSet(0L))
      hist.unpersist()
      println(f"""{"probe":"bpe_train","corpus_copies":$scale,"vocab":$vocab,""" +
        f""""merges":${model.merges.size},"hist_secs":$tHist%.2f,""" +
        f""""train_secs":$tTrain%.2f,""" +
        f""""train_shuffle_read_mb":${r / 1e6}%.2f,""" +
        f""""train_shuffle_write_mb":${w / 1e6}%.2f}""")
    }

    println(s"""{"summary":"growth ${scaleN}x vs 1x (sub-quadratic bar: ratio << ${scaleN * scaleN})"}""")
    for (name <- probes) {
      val (s1, r1, sr1, _) = results((name, 1))
      val (sn, rn, srn, _) = results((name, scaleN))
      val tRatio = sn / s1
      // a sub-MB 1x baseline means the small run broadcast instead of
      // shuffling — a ratio against ~zero is noise, report absolutes
      val sRatio = if (sr1 >= 1000000L) f"${srn.toDouble / sr1}%.1f"
                   else f""""${sr1 / 1e6}%.1fMB->${srn / 1e6}%.1fMB""""
      println(f"""{"query":"$name","time_ratio":$tRatio%.1f,"shuffle_read_ratio":$sRatio,""" +
        f""""rows_1x":$r1,"rows_${scaleN}x":$rn,"subquadratic":${tRatio < scaleN * scaleN}}""")
    }
    spark.stop()
  }
}
