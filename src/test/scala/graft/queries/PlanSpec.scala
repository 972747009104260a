package graft.queries

import graft.QueryRegistry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (the 100 TB checklist): filters reach the
  * parquet scan, small dims broadcast, aggregations are partial+final,
  * top-k plans as TakeOrderedAndProject, scans prune columns. Runs against
  * sf0.001 — plan shape, not data volume, is what's asserted. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  def planOf(name: String): String = {
    val df = QueryRegistry.byName(name).fn(spark, sfDir)
    // executedPlan string via explain formatted
    val sw = new java.io.StringWriter()
    Console.withOut(new java.io.PrintStream(new java.io.OutputStream {
      override def write(b: Int): Unit = sw.write(b)
    })) { df.explain("formatted") }
    sw.toString
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: aggregation is partial then final (map-side combine)") {
    val p = planOf("q01_pricing_summary")
    val hashAggs = "HashAggregate".r.findAllIn(p).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("q04: star joins broadcast the small dims (no shuffle join for region/nation)") {
    val p = planOf("q04_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q05: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q05_top_customers")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q11: scan prunes to referenced columns only") {
    val p = planOf("q11_string_funcs")
    // documents has 5 columns; text/lang/doc_id/n_chars referenced
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("source"), s"unreferenced column 'source' should be pruned:\n$p")
  }

  test("q12/q13: EXISTS/NOT EXISTS plan as semi/anti joins, not subquery loops") {
    assert(planOf("q12_exists_semi").contains("LeftSemi"))
    assert(planOf("q13_notexists_anti").contains("LeftAnti"))
  }

  test("q23: brute-force knn is scan → project → TakeOrdered (no vector shuffle)") {
    val p = planOf("q23_knn_bruteforce")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), s"knn must not shuffle-join vectors:\n$p")
  }

  test("q79: filtered knn filters BEFORE scoring and plans top-k, no vector shuffle (r9)") {
    val p = planOf("q79_filtered_knn")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), s"filtered knn must not shuffle-join vectors:\n$p")
    // the metadata predicate must sit below the quantized-dot projection:
    // scoring cost ∝ filter selectivity, not corpus size
    val filterIdx = p.indexOf("(label")
    val scoreIdx = p.indexOf("quantized_dot")
    assert(filterIdx >= 0 && scoreIdx >= 0, p)
    // explain-formatted numbers operators leaf-first in the detail
    // section, so "filter below scoring" = filter detail printed EARLIER
    assert(filterIdx < scoreIdx,
      s"predicate must be evaluated before dot-product scoring:\n$p")
  }

  test("q80/q81: funnel and cohort join on user keys — no cartesian, partial aggs (r9)") {
    for (q <- Seq("q80_funnel", "q81_cohort")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must join on equi-keys only:\n$p")
      // per-user MIN / DISTINCT stages are map-side combined
      assert("HashAggregate".r.findAllIn(p).size >= 2, s"$q needs partial+final aggs:\n$p")
    }
  }

  test("q82: star-MV read touches ONLY the state table — no join, no re-aggregation (r10)") {
    val p = planOf("q82_star_mv_sql")
    // the maintained state IS the answer: reading the view must not
    // re-join the dimension or re-aggregate the fact at any scale
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"MV read must not aggregate:\n$p")
    assert(!"Join".r.findAllIn(p).nonEmpty, s"MV read must not join:\n$p")
    assert(p.contains("star_mv"), s"scan must read the MV state table:\n$p")
    assert(!p.contains("star_fact"), s"the fact table must not be scanned:\n$p")
  }

  test("q83: exported-table read prunes columns, no cartesian; mask is a DV bitmap probe (r14), anti-join on fallback (r10)") {
    // the no-extensions session reads through the V1Scan fallback, which
    // hides the mask join inside the scan — assert what IS visible there
    val p = planOf("q83_duckdb_export")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("lake.ops.exp"), p)
    assert(p.contains("struct<p_partkey:bigint,part_name:string,p_retailprice:double>"),
      s"scan must prune to the three referenced columns:\n$p")
    // the mask SHAPE gate runs on the Scala read path, where the plan is
    // transparent: a DV-covered MoR read masks with the deletion-vector
    // bitmap probe INSIDE the scan's filter (r14) — no join at all; with
    // the DV read path off, the fallback anti-joins the broadcast
    // metadata-sized delete set — never a shuffle or nested loop
    val cat = new graft.lake.LakeCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-planspec").toString)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = cat.createTable("p.mor", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    t.append((0L until 100L).toDF("id"))
    t.delete(col("id") === 7L)
    val mp = t.toDF.queryExecution.executedPlan.toString
    assert(mp.contains("dv_is_deleted"), s"DV-covered mask must bitmap-probe:\n$mp")
    assert(!mp.toLowerCase.contains("join"), s"DV-covered mask must not join:\n$mp")
    spark.conf.set(graft.lake.DeleteVectors.ReadConf, "false")
    try {
      val ap = t.toDF.queryExecution.executedPlan.toString
      assert(ap.contains("LeftAnti"), s"fallback mask must plan as an anti-join:\n$ap")
      assert(ap.contains("BroadcastHashJoin") || ap.contains("BroadcastExchange"),
        s"metadata-sized delete set must broadcast:\n$ap")
      assert(!ap.contains("CartesianProduct") && !ap.contains("BroadcastNestedLoopJoin"), ap)
    } finally spark.conf.unset(graft.lake.DeleteVectors.ReadConf)
  }

  test("q21: LSH banding is an equi-join, not a nested-loop over signatures") {
    val p = planOf("q21_minhash_lsh_pairs")
    // the OR-of-band-equalities form planned as BroadcastNestedLoopJoin:
    // quadratic comparisons and a broadcast of the unbounded sig table
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q22: jaccard pairs never cross-join and never broadcast an unbounded side") {
    val p = planOf("q22_jaccard_pairs")
    // prefix-filtered candidates: every join is an equi-join on bounded
    // keys; the full documents table must not be broadcast or all-paired
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21: the banded self-join's two sides share ONE signature pipeline — " +
      "runtime ReusedExchange (r12)") {
    val df = QueryRegistry.byName("q21_minhash_lsh_pairs").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"the symmetric banded sides must reuse one exchange:\n$p")
  }

  test("q58: the self-join's two sides share ONE tokenize+collapse — " +
      "runtime ReusedExchange (r12)") {
    val df = QueryRegistry.byName("q58_jaccard_count").fn(spark, sfDir)
    df.collect() // AQE reuse materializes at runtime, not in the initial plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"the symmetric join sides must reuse one exchange:\n$p")
  }

  test("q58: algebraic group-pair count equals the aggregate over q22's " +
      "expanded doc pairs (r18 — the doc-pair explode no longer runs)") {
    import org.apache.spark.sql.functions._
    val viaExpansion = QueryRegistry.byName("q22_jaccard_pairs").fn(spark, sfDir)
      .agg(count(lit(1)).cast("long"),
        sum(floor(col("jaccard") * 1e6).cast("long")).cast("long")).head
    val direct = QueryRegistry.byName("q58_jaccard_count").fn(spark, sfDir).head
    assert(direct.getLong(0) === viaExpansion.getLong(0))
    assert(direct.getLong(1) === viaExpansion.getLong(1))
    // and the count-only plan must not contain the two-level expansion
    val p = planOf("q58_jaccard_count")
    assert("Generate".r.findAllIn(p).size <= 4, // 2 prefix explodes (tree+detail)
      s"q58 must not expand doc pairs:\n$p")
  }

  test("q22: prefix filtering is complete — matches brute-force jaccard on sf0.001") {
    import org.apache.spark.sql.functions._
    val out = QueryRegistry.byName("q22_jaccard_pairs").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: lang-blocked all-pairs exact jaccard (fine at 500 docs)
    val w = spark.read.parquet(s"$sfDir/documents.parquet").select(
        col("doc_id"), col("lang"),
        array_distinct(transform(split(col("text"), "\\s+"), c => xxhash64(c))).as("ws"))
      .groupBy("doc_id", "lang").agg(first("ws").as("ws"))
    val brute = w.select(col("lang"), col("doc_id").as("id_a"), col("ws").as("wa"))
      .join(w.select(col("lang"), col("doc_id").as("id_b"), col("ws").as("wb")), Seq("lang"))
      .filter(col("id_a") < col("id_b"))
      .filter(size(array_intersect(col("wa"), col("wb"))).cast("double") /
        size(array_union(col("wa"), col("wb"))).cast("double") >= 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === brute, s"missing=${brute -- out} extra=${out -- brute}")
  }

  test("q24: within-label pairing is tiled — shuffle key is (label, u, v), not bare label") {
    val p = planOf("q24_embedding_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the equi-join must carry the tile columns: a bare per-label join
    // (key cardinality = label count) serializes each label into one task
    val joinKeys = "(?s)(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin).{0,400}".r
      .findAllIn(p).mkString("\n")
    assert(joinKeys.contains("label") && joinKeys.contains("u#") && joinKeys.contains("v#"),
      s"join key must include tile columns u,v alongside label:\n$p")
  }

  test("q24: triangle tiling is exact — matches untiled all-pairs on sf0.001") {
    import org.apache.spark.sql.functions._
    graft.Tables.registerAll(spark, sfDir)
    val out = QueryRegistry.byName("q24_embedding_neardup").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"),
        expr("quantized_dot(embedding, embedding)").as("nq"))
    val brute = n.select(col("label"), col("vec_id").as("id_a"),
        col("embedding").as("ea"), col("nq").as("na"))
      .join(n.select(col("label"), col("vec_id").as("id_b"),
        col("embedding").as("eb"), col("nq").as("nb")), Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", expr("CAST(quantized_dot(ea, eb) AS DOUBLE)") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= 0.35)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === brute, s"missing=${brute -- out} extra=${out -- brute}")
  }

  test("q27/IVF: assignment is a pure projection — no join, no window, no exchange before the top-k") {
    val df = QueryRegistry.byName("q27_ann_ivf").fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q37: top-k per group pushes the group limit (no full per-group sort output)") {
    val p = planOf("q37_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q39: decontamination plans as an anti join on the fingerprint") {
    val p = planOf("q39_decontaminate")
    assert(p.contains("LeftAnti") || p.contains("left_anti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q62: bloom decontamination shares one materialized eval key set") {
    val p = planOf("q62_bloom_decontaminate")
    assert(p.contains("might_contain"), s"bloom probe missing:\n$p")
    assert(p.contains("LeftAnti"), p)
    // the verify join's right side reads the checkpointed distinct keys
    // (built once, shared with the eager bloom-build job) — the main
    // plan scans parquet only for the two corpus branches (miss + hit),
    // and carries no eval-side distinct re-aggregation. Formatted dumps
    // mention each node twice (tree + details).
    assert(p.contains("ExistingRDD"), s"checkpointed key scan missing:\n$p")
    assert("Scan parquet".r.findAllIn(p).size <= 4,
      s"expected only the two corpus scans:\n$p")
    assert("HashAggregate".r.findAllIn(p).size <= 4,
      s"only the final groupBy aggregate pair may remain:\n$p")
  }

  test("q42: range join is a bin-bucketed equi-join, not a nested loop") {
    // naive point BETWEEN lo AND hi has no equi-key and plans as
    // BroadcastNestedLoopJoin — quadratic comparisons. Bin bucketing gives
    // the join an equi-key (bin id); the BETWEEN survives only as a
    // post-join filter.
    val p = planOf("q42_range_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q44: batch knn broadcasts the query side and group-limits the top-k") {
    val p = planOf("q44_knn_join")
    assert(!p.contains("SortMergeJoin"), s"query batch must broadcast, not shuffle:\n$p")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q48: trigram counting aggregates partially (map-side combine)") {
    val p = planOf("q48_repetition")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final aggregation at both levels:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q52: dup-ngram fraction joins nothing — df via window, top-k via TakeOrdered") {
    val p = planOf("q52_dup_ngram_frac")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"document frequency must come from a window, not a shingle self-join:\n$p")
  }

  test("q52: the (doc_id, sh) dedup runs INSIDE the generator, before any " +
      "shuffle — no distinct aggregate, one exploded-stream exchange (r18)") {
    val p = planOf("q52_dup_ngram_frac")
    assert(p.contains("word_shingles_distinct"),
      s"per-doc distinct generator expected:\n$p")
    // exactly 2 Exchange NODES (each named twice in formatted output):
    // the sh hash exchange under the df window + nothing else before the
    // TakeOrdered — the r16 plan had 3 (distinct + window + group-by),
    // r17 had 2 with the RAW stream concentrated on hash(sh)
    assert("Exchange".r.findAllIn(p).size <= 4,
      s"expected one sh exchange + one doc_id exchange at most:\n$p")
    // only the final per-doc rollup aggregates (partial+final, each node
    // named twice in formatted output = 4 mentions); the r16/r17 plans
    // carried 2 more HashAggregate nodes for the (doc_id, sh) distinct
    assert("HashAggregate".r.findAllIn(p).size <= 4,
      s"the (doc_id, sh) distinct aggregate should be gone:\n$p")
  }

  test("q52: a hot shingle shuffles its distinct-doc postings only — " +
      "shuffle records == |distinct (doc_id, sh)|, not the raw stream (r18)") {
    import org.apache.spark.sql.functions._
    // synthetic skew: every doc shares one boilerplate shingle, with raw
    // multiplicity ~4x per doc ("hot hot hot hot hot hot" → 4 identical
    // 3-grams per doc)
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, s"hot hot hot hot hot hot unique$i tail$i"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("skew_docs")
    graft.functions.GraftExtensions.register(spark)
    // count shuffle records via a listener (robust to AQE's plan wrapping)
    val written = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        written.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql(
        """SELECT doc_id, sh FROM (
          |  SELECT doc_id, word_shingles_distinct(text, 3) AS sh FROM skew_docs) d
          |DISTRIBUTE BY sh""".stripMargin).collect()
      org.apache.spark.sql.graftbridge.ListenerBridge.flush(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    // 8 words/doc → 6 raw 3-grams, of which "hot hot hot" repeats 4x:
    // distinct = {hot hot hot, hot hot uniqueN, hot uniqueN tailN} = 3
    assert(written.get == 200L * 3,
      s"the sh shuffle must carry deduped rows (got ${written.get}, raw would be ${200L * 6})")
  }

  test("q104: SCD2 history rides ONE data shuffle — all three window " +
    "passes share the user_id exchange and sort (r16)") {
    val p = planOf("q104_scd2_history")
    // 2 Exchange nodes max (each named twice in formatted output): the
    // user_id hash exchange + the final ORDER BY range exchange. A third
    // would mean the run-start LEAD pass re-shuffled instead of reusing
    // the gaps-and-islands pass's (user_id; ts, event_id) ordering.
    assert("Exchange".r.findAllIn(p).size <= 4,
      s"SCD2 must build in one entity-keyed shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"gaps-and-islands, not a self-join:\n$p")
  }

  test("q54: sessionize rides ONE data shuffle — windows and both group-bys share it") {
    val p = planOf("q54_sessionize")
    // 2 Exchange nodes max (each named twice in formatted output: tree +
    // detail): the user_id hash exchange + the final ORDER BY range
    // exchange. A third would mean the (user_id, sess) or user_id
    // group-by failed to reuse the window's partitioning.
    assert("Exchange".r.findAllIn(p).size <= 4,
      s"sessionize must not re-shuffle between windows and group-bys:\n$p")
    assert("Window".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q56: tf-idf top-5 pushes the group limit; scalar doc count broadcasts") {
    val p = planOf("q56_tfidf_terms")
    assert(p.contains("WindowGroupLimit"),
      s"top-5 per source must push the window group limit:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row doc count must broadcast, not cartesian:\n$p")
  }

  test("q57: full dedup resolution is one equi-join over checkpointed labels — no loop replay, no cartesian") {
    val p = planOf("q57_dedup_resolve")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"docs↔labels must be an equi-join:\n$p")
    // the CC loop's labels enter as a materialized checkpoint scan
    // ("Scan ExistingRDD"), NOT as the loop's join tree — lineage is
    // truncated, so re-evaluating q57 can never replay the propagation
    assert(p.contains("ExistingRDD"),
      s"labels must be checkpoint-backed, not a live loop lineage:\n$p")
  }

  test("q59: changelog diff never cartesians; per-commit exceptAll is hash-aggregated") {
    val p = planOf("q59_lake_changelog")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q51: cc maxIter is conf-tunable without a code change (spark.graft.cc.maxIter)") {
    // maxIter=1 cannot converge (round 1 always changes labels when any
    // pair exists), so the loud-failure path must fire through the conf;
    // driverMaxEdges=0 forces the distributed loop (the driver union-find
    // has no rounds, so maxIter only governs the loop)
    spark.conf.set("spark.graft.cc.maxIter", "1")
    spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
    try {
      val ex = intercept[IllegalStateException](
        QueryRegistry.byName("q51_dup_clusters").fn(spark, sfDir))
      assert(ex.getMessage.contains("raise maxIter"))
    } finally {
      spark.conf.unset("spark.graft.cc.maxIter")
      spark.conf.unset("spark.graft.cc.driverMaxEdges")
    }
    // default conf converges
    assert(QueryRegistry.byName("q51_dup_clusters").fn(spark, sfDir).count() > 0)
  }

  test("q61: sequence packing rides one lang exchange — window and group-by share it") {
    val p = planOf("q61_sequence_packing")
    // 2 Exchange nodes max (each named twice in formatted output): the
    // lang hash exchange (window + the (lang,bin) group-by reuse it —
    // hash(lang) satisfies the subset-closed clustered distribution) and
    // the final ORDER BY range exchange
    assert("Exchange".r.findAllIn(p).size <= 4,
      s"packing must not re-shuffle between the window and the group-by:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q64: winnow overlap is an equi-join on the fingerprint, never a cross join") {
    val p = planOf("q64_winnow_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"fingerprint pairing must be an equi-join:\n$p")
    // df cap comes from one COUNT window keyed by fingerprint, not a
    // fingerprint self-join for counting
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(p.contains("Generate"), p) // explode of the native expression's array
  }

  test("q64: the pair join's two sides share ONE fingerprint+window pass — " +
      "runtime ReusedExchange (r17)") {
    val df = QueryRegistry.byName("q64_winnow_overlap").fn(spark, sfDir)
    df.collect() // AQE reuse materializes at runtime, not in the initial plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"the symmetric join sides must reuse one winnow exchange:\n$p")
  }

  test("q77: the top/bot branches read the MATERIALIZED per-doc score " +
      "table — the scoring pipeline exists once, above the checkpoint (r18)") {
    val df = QueryRegistry.byName("q77_bigram_fluency").fn(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the bigram explode/window/join pipeline ran once inside fn() (the
    // eager localCheckpoint); the final plan must only rank checkpointed
    // rows — any Generate/Window here means a branch re-planned scoring
    assert(!p.contains("Generate") && !p.contains("Window"),
      s"fluent/junk bands must not recompute the scoring pipeline:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q65: storage-partitioned join shuffles NEITHER bucketed input") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf("q65_spj_join")
      // the join must consume the v2 batch scans' KeyGroupedPartitioning
      // directly: SortMergeJoin with no Exchange between it and the scans.
      // The only exchanges are ABOVE the join: the group-by hash exchange
      // and the ORDER BY range exchange (each named twice in formatted
      // output).
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("BatchScan"), s"v2 scan path expected:\n$p")
      assert("Exchange".r.findAllIn(p).size <= 4,
        s"SPJ join must not shuffle its inputs:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q66: BM25 scores only queried-term postings, top-k group-limits") {
    val p = planOf("q66_bm25_search")
    // query relation joins the postings by term (equi-joins only, the tiny
    // VALUES side broadcasts); the single BroadcastNestedLoopJoin allowed
    // is the 1-row scalar-totals cross join (the q09-approved shape);
    // top-5 per query pushes WindowGroupLimit
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, // tree + detail
      s"only the 1-row totals may nested-loop:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-k per query must group-limit:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"query terms should broadcast:\n$p")
  }

  test("q70: ngram decontamination broadcasts the benchmark shingles, no cross join") {
    val p = planOf("q70_ngram_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // benchmark shingle set and hit-doc set are both small → broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
  }

  test("q73: substring dedup never all-pairs; dup marking is one keyed window") {
    val p = planOf("q73_substring_dedup")
    // windows meet under a PARTITION BY blk count window — an equality
    // shuffle, never a window-vs-window join — and every join afterwards
    // is doc_id/pos-keyed
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), s"dup marking should be a count window:\n$p")
  }

  test("q73: removal matches a direct local ExactSubstr implementation on sf0.001") {
    // independent local oracle: count every 8-token sliding window across
    // the corpus; a token is removed iff some window covering it occurs
    // >= 2 times (within- or cross-doc, exactly as a suffix array sees it)
    val toks: Map[Long, Array[String]] =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")).toMap
    val winCount = scala.collection.mutable.Map.empty[String, Int]
    for ((_, w) <- toks; p <- 0 to w.length - 8)
      winCount.updateWith(w.slice(p, p + 8).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val expected = toks.map { case (id, w) =>
      val covered = Array.fill(w.length)(false)
      for (p <- 0 to w.length - 8)
        if (winCount(w.slice(p, p + 8).mkString(" ")) > 1)
          (p until p + 8).foreach(covered(_) = true)
      id -> (w.length.toLong, covered.count(identity).toLong)
    }
    val out = QueryRegistry.byName("q73_substring_dedup").fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (id, (nTok, nRem)) =>
      assert(out(id) === ((nTok, nRem)), s"doc $id: expected ($nTok, $nRem), got ${out(id)}")
    }
    assert(expected.values.exists(_._2 > 0), "sf0.001 should contain duplicated spans")
  }

  test("q74: hybrid RRF group-limits every rank window; only bounded sides nested-loop") {
    val p = planOf("q74_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // two allowed cross joins, both BuildRight on bounded sides: the 1-row
    // BM25 totals and the 3-row query-vector set (tree + detail naming)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 4,
      s"only the scalar totals and the query-vector batch may nested-loop:\n$p")
    // rb (BM25 top-20), rv (cosine top-20), rk (fused top-10) all push
    // WindowGroupLimit: k rows per task leave each exchange, never the corpus
    assert("WindowGroupLimit".r.findAllIn(p).size >= 3,
      s"all three rank windows must group-limit:\n$p")
  }

  test("q85: blob build + decode fuse into one documents scan — no UDF, no blob shuffle (r11)") {
    val p = planOf("q85_media_audit")
    // zero UDFs: media composition is codegen'd string functions, decode
    // is a native Catalyst expression
    assert(!p.toLowerCase.contains("python") && !p.contains("BatchEval") &&
      !p.contains("ScalaUDF"), s"media path must not use UDFs:\n$p")
    assert(p.contains("bmp_features") && p.contains("wav_features"),
      s"decode must run through the native expressions:\n$p")
    // ONE pass over documents: build+decode fused in the scan's projection
    assert("documents.parquet".r.findAllIn(p).size <= 1,
      s"blob build + decode must fuse into one scan:\n$p")
    // only the 2-group audit rows shuffle — never the blobs themselves
    // (a single partial/final agg exchange pair, no repartition/join)
    assert(!p.contains("Join"), s"no join may move media bytes:\n$p")
  }

  test("q89: the literal IN pushes to the lake scan (the bloom's entry " +
      "point) and the lookup plans join-free") {
    val p = planOf("q89_bloom_lookup")
    // constant-folded md5 literals must reach pushFilters — a runtime
    // filter would never consult the manifest blooms
    assert(p.contains("In(k,"), s"IN over k must be pushed:\n$p")
    assert(!p.contains("Join"), s"a point lookup must not join:\n$p")
  }

  test("q90: the top-k is served FROM the index table — broadcast 1-row " +
      "query side, TakeOrderedAndProject, probe filter pushed") {
    val p = planOf("q90_vector_index")
    assert(p.contains("vidx"), s"the corpus side must scan the INDEX table:\n$p")
    // list_id is column id 4 (after the covered label column, r14) →
    // physical name c4 in the index table
    assert(p.contains("In(c4,"),
      s"the probe-list filter must reach the index scan:\n$p")
    assert(p.contains("Broadcast"), s"the 1-row query vector must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    // exactly one corpus-sized scan: embeddings appears only as the
    // broadcast 1-row query side
    assert("embeddings.parquet".r.findAllIn(p).size <= 1, p)
  }

  test("q91: BM25 is served FROM the postings index — corpus never " +
      "scanned, term IN pushed, query relation broadcast, rank limited") {
    val p = planOf("q91_bm25_index")
    // THE claim: the documents corpus is not in the plan at all — every
    // byte comes off the index tables
    assert(!p.contains("documents.parquet"),
      s"q91 must answer from the index, never the corpus:\n$p")
    assert(p.contains("tidx"), s"the scan must be the postings table:\n$p")
    // term is column id 2 of the postings table → physical c2; the
    // query terms' IN must reach the parquet scan (bucket pruning
    // happened at file-listing time above it)
    assert(p.contains("In(c2,"),
      s"the query-term filter must push to the index scan:\n$p")
    assert(p.contains("Broadcast"), s"the 7-row query relation must broadcast:\n$p")
    // top-5/query is a rank cut, not a global materialization
    assert(p.contains("WindowGroupLimit"), s"rank cut must limit per group:\n$p")
  }

  test("q92: hybrid fusion runs from the two indexes — corpus never " +
      "scanned, embeddings only as the 3-row query side, no cartesian") {
    val p = planOf("q92_hybrid_index")
    assert(!p.contains("documents.parquet"),
      s"the BM25 side must come from the postings index:\n$p")
    // embeddings.parquet may appear ONCE: the 3-row query-vector side
    // (the corpus vectors come from the vector index's state table)
    assert("embeddings.parquet".r.findAllIn(p).size <= 1,
      s"corpus vectors must come from the index state table:\n$p")
    assert(p.contains("vidx") && p.contains("tidx"),
      s"both index state tables must be the scan sources:\n$p")
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"),
      s"only broadcast joins may appear:\n$p")
  }

  test("q93: filtered search runs from the covered index — base absent, " +
      "label predicate below the dot-product scoring") {
    val p = planOf("q93_vindex_filtered")
    assert(p.contains("vidx"), s"the scan must be the index state table:\n$p")
    // embeddings.parquet may appear ONCE (the 1-row query side); the
    // filtered corpus side comes entirely off the covered index
    assert("embeddings.parquet".r.findAllIn(p).size <= 1,
      s"the filtered side must come from the index, not the base:\n$p")
    // the covered-column predicate must sit below the scoring projection
    // (explain-formatted prints leaf-first: filter detail appears earlier)
    val filterIdx = p.indexOf("(label")
    val scoreIdx = p.indexOf("quantized_dot")
    assert(filterIdx >= 0 && scoreIdx >= 0, p)
    assert(filterIdx < scoreIdx,
      s"predicate must be evaluated before dot-product scoring:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
  }

  test("q105/q107: k-means assignment is a pure projection — centroids ride " +
    "as plan literals, no join or exchange before the per-row assign (r16)") {
    // explain-formatted prints the tree header first, then per-node
    // detail sections in LEAF-FIRST numbering — ordering assertions run
    // on the details substring
    def details(p: String): String = p.substring(math.max(0, p.indexOf("\n(1) ")))
    val p = planOf("q105_kmeans_topics")
    val d = details(p)
    val assignIdx = d.indexOf("nearest_centroid_int")
    val exchangeIdx = d.indexOf("Exchange")
    assert(assignIdx >= 0, p)
    assert(exchangeIdx < 0 || assignIdx < exchangeIdx,
      s"assignment must precede any exchange:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)

    // q107's per-cluster top-2 prunes map-side (WindowGroupLimit before
    // the exchange), so only ≤2 rows per cluster per task shuffle
    val d7 = details(planOf("q107_cluster_sample"))
    val wgl = d7.indexOf("WindowGroupLimit")
    val ex7 = d7.indexOf("Exchange")
    assert(wgl >= 0 && ex7 > wgl,
      s"rank<=2 must prune before the shuffle:\n$d7")
  }

  test("whole-stage codegen covers the relational queries' hot path") {
    val df = QueryRegistry.byName("q01_pricing_summary").fn(spark, sfDir)
    df.collect() // AQE finalizes (and codegens) the plan only on execution
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString // unwrap: AQE's toString elides children
      case p => p.toString
    }
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), plan) // "*(n)" marks codegen stages
  }
}
