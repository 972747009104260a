package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ANALYZE TABLE column statistics ([[Analyze]]): exact-mode values
  * match a first-principles recomputation, approx NDV lands in band,
  * staleness flips on commit, the SQL grammar routes to graft tables
  * only, and the DSv2 scan serves FRESH stats to the planner. */
class AnalyzeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def mk(name: String): LakeTable = {
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-analyze").toString)
    cat.createTable(name, schema)
  }

  private def rows(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"g${i % 5}", i * 1.5)
    }.toDF("id", "grp", "v")
  }

  test("exact mode matches a first-principles recomputation") {
    val t = mk("t.exact")
    t.append(rows(100))
    val st = t.analyzeTable(exactNdv = true)
    assert(st.rowCount === 100L)
    assert(st.exactNdv)
    val byName = st.columns.map(c => c.name -> c).toMap
    assert(byName("id").ndv === Some(100L))
    assert(byName("id").nullCount === 0L)
    assert(byName("id").min === Some("1"))
    assert(byName("id").max === Some("100"))
    assert(byName("id").avgLen === None)
    // grp: 5 distinct non-null values, 14 nulls (7,14,…,98)
    assert(byName("grp").ndv === Some(5L))
    assert(byName("grp").nullCount === 14L)
    assert(byName("grp").min === Some("g0"))
    assert(byName("grp").max === Some("g4"))
    assert(byName("grp").avgLen === Some(2L))
    assert(byName("grp").maxLen === Some(2L))
    assert(byName("v").min === Some("1.5"))
    assert(byName("v").max === Some("150.0"))
    // KLL value distribution rides numeric columns (exact mode included)
    val kll = java.util.Base64.getDecoder.decode(byName("id").kll.get)
    val p = graft.functions.KllQuantilesAgg.quantiles(kll, Array(0.0, 0.5, 1.0))
    assert(p(0) === 1.0 && p(2) === 100.0)
    assert(math.abs(p(1) - 50.0) <= 2.0, s"median drift: ${p(1)}")
    assert(byName("grp").kll === None, "strings carry no quantile sketch")
  }

  test("approx NDV within the HLL++ band; subset + bad columns refuse") {
    val t = mk("t.approx")
    t.append(rows(1000))
    val st = t.analyzeTable(columns = Seq("id", "grp"))
    assert(st.columns.map(_.name) === Seq("id", "grp"))
    val ndv = st.columns.head.ndv.get
    assert(math.abs(ndv - 1000L) <= 100L, s"approx ndv $ndv too far from 1000")
    val e1 = intercept[IllegalArgumentException](t.analyzeTable(Seq("nope")))
    assert(e1.getMessage.contains("no such column"))
  }

  test("sketch blobs live in a content-addressed stats object, not the " +
    "version document (r17)") {
    val t = mk("t.lean")
    t.append(rows(200))
    val st = t.analyzeTable()
    // callers get hydrated stats…
    assert(st.columns.exists(_.sketch.isDefined))
    assert(st.columns.exists(_.kll.isDefined))
    assert(st.sketchRef.exists(r => r.startsWith("stats-") && r.endsWith(".json")))
    // …but the PROPERTY (which rides every version JSON and wire round
    // trip) carries only scalars + the object ref
    val lean = Analyze.fromJson(t.meta.properties(Analyze.PropKey))
    assert(lean.columns.forall(c => c.sketch.isEmpty && c.kll.isEmpty))
    assert(lean.sketchRef === st.sketchRef)
    assert(t.meta.properties(Analyze.PropKey).length < 4096,
      "property must stay O(columns) scalars, not sketch bytes")
    // hydration round-trips the blobs from the object
    val hyd = Analyze.hydrated(t).get
    assert(hyd.columns.map(c => (c.name, c.sketch, c.kll)) ===
      st.columns.map(c => (c.name, c.sketch, c.kll)))
    // version-document size stays flat across repeated re-analyzes: the
    // object is content-addressed and referenced, never inlined
    val len0 = t.meta.properties(Analyze.PropKey).length
    t.append(rows(10)); t.analyzeTable()
    t.append(rows(10)); t.analyzeTable()
    val len2 = t.meta.properties(Analyze.PropKey).length
    assert(math.abs(len2 - len0) < 256, s"property grew $len0 -> $len2")
  }

  test("stats metadata table + staleness flips on commit; NOSCAN runs zero jobs") {
    val t = mk("t.meta")
    t.append(rows(50))
    t.analyzeTable(exactNdv = true)
    val fresh = t.metadataTable("stats")
    assert(fresh.where("stale").count() === 0L)
    assert(fresh.where("column = 'id' AND ndv = 50 AND row_count = 50").count() === 1L)

    t.append(rows(10)) // new snapshot — stats now stale
    assert(t.metadataTable("stats").where("NOT stale").count() === 0L)
    assert(Analyze.fresh(t.meta,
      t.meta.currentSnapshot.map(_.snapshotId)).isEmpty)

    // NOSCAN: zero Spark jobs, row count from file metadata. Count only
    // THIS thread's jobs via a job group (suites share the context).
    val group = "analyze-noscan-probe"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group)) {
          jobs.incrementAndGet(); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "analyze noscan probe")
    try {
      val st = t.analyzeTable(noscan = true)
      Thread.sleep(500) // listener bus is async — let it drain
      assert(st.rowCount === 60L)
      assert(st.columns.isEmpty)
      assert(jobs.get() === 0, "NOSCAN must not launch jobs")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("incremental: pure appends merge at churn cost and equal a full " +
    "re-analyze; fresh stats are a zero-commit no-op; row removal falls " +
    "back to full; autoMaintain rides the cadence") {
    val t = mk("t.incr")
    t.append(rows(400))
    val first = t.analyzeTable() // full, sketch-backed
    assert(first.mode === "full")

    // fresh → no-op: same object back, NO new version
    val v0 = t.meta.version
    assert(Analyze.incremental(t) === first)
    assert(t.meta.version === v0, "fresh incremental must not commit")

    // pure append → incremental merge; everything EXACT equals a full
    // re-analyze, and the union NDV stays inside the sketch's own error
    // band (union adds none — but sparse/dense transitions mean "same
    // bounds", not bit-equality)
    import spark.implicits._
    t.append((401 to 700).map(i =>
      (i.toLong, if (i % 7 == 0) null else s"g${i % 11}", i * 1.5))
      .toDF("id", "grp", "v"))
    val inc = Analyze.incremental(t)
    assert(inc.mode === "incremental")
    assert(inc.snapshotId === t.meta.currentSnapshot.get.snapshotId)
    val fullAgain = t.analyzeTable()
    assert(inc.rowCount === fullAgain.rowCount)
    inc.columns.zip(fullAgain.columns).foreach { case (a, b) =>
      val (ia, ib) = (a.ndv.get, b.ndv.get)
      assert(math.abs(ia - ib) <= math.max(2L, ib / 50),
        s"union ndv $ia outside the full-pass band $ib on ${a.name}")
      assert(a.nullCount === b.nullCount)
      assert(a.min === b.min); assert(a.max === b.max)
      assert(a.sumLen === b.sumLen); assert(a.maxLen === b.maxLen)
      assert(a.avgLen === b.avgLen)
      // merged KLL stays in the sketch's rank-error band of the full pass
      (a.kll, b.kll) match {
        case (Some(ka), Some(kb)) =>
          def p50(s: String) = graft.functions.KllQuantilesAgg.quantiles(
            java.util.Base64.getDecoder.decode(s), Array(0.5))(0)
          val (qa, qb) = (p50(ka), p50(kb))
          assert(math.abs(qa - qb) <= math.max(1.0, math.abs(qb) * 0.05),
            s"merged p50 $qa vs full $qb on ${a.name}")
        case (None, None) =>
        case other => fail(s"kll presence drift on ${a.name}: $other")
      }
    }
    // the true counts: id fully distinct (700), grp 11 non-null values
    assert(math.abs(inc.columns.find(_.name == "id").get.ndv.get - 700L) <= 21L)
    assert(inc.columns.find(_.name == "grp").get.ndv === Some(11L))
    // …and the scan sees them as fresh
    assert(Analyze.fresh(t.meta, t.meta.currentSnapshot.map(_.snapshotId)).isDefined)

    // row removal → sketches cannot subtract → full fallback, still correct
    t.delete(org.apache.spark.sql.functions.col("id") <= 100)
    val afterDelete = Analyze.incremental(t)
    assert(afterDelete.mode === "full")
    assert(afterDelete.rowCount === 600L)
    assert(afterDelete.columns.find(_.name == "id").get.min === Some("101"))

    // autoMaintain hookup: property on + stale stats → refreshed on tick
    t.setProperties(Map(Analyze.AutoKey -> "true",
      "graft.maintenance.every-commits" -> "1"))
    t.append((701 to 720).map(i => (i.toLong, s"x$i", 1.0)).toDF("id", "grp", "v"))
    t.autoMaintain() // may also compact — analyze runs LAST, so stats land fresh
    val auto = Analyze.of(t.meta).get
    assert(auto.snapshotId === t.meta.currentSnapshot.get.snapshotId,
      "autoMaintain must have refreshed the stats to the head")
    assert(auto.columns.find(_.name == "id").get.max === Some("720"))

    // content-preserving maintenance alone → RESTAMP, zero scan jobs
    val group = "analyze-restamp-probe"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group)) {
          jobs.incrementAndGet(); ()
        }
      }
    }
    // two tiny appends (merged into the stats), then compaction: the
    // chain since the stamp is pure "replace"
    t.append(Seq((721L, "y1", 1.0)).toDF("id", "grp", "v"))
    t.append(Seq((722L, "y2", 1.0)).toDF("id", "grp", "v"))
    Analyze.incremental(t)
    t.rewriteDataFiles(targetSizeBytes = 64L * 1024 * 1024) // rows unchanged
    val preStamp = Analyze.hydrated(t).get
    assert(preStamp.snapshotId !== t.meta.currentSnapshot.get.snapshotId)
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "restamp probe")
    val restamped = try {
      val r = Analyze.incremental(t)
      Thread.sleep(500) // listener bus is async
      r
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() === 0, "content-preserving chain must restamp without scanning")
    assert(restamped.snapshotId === t.meta.currentSnapshot.get.snapshotId)
    assert(restamped.columns === preStamp.columns)
  }

  test("SQL grammar routes graft idents to Analyze; others delegate; " +
    "DSv2 scan serves fresh stats and drops stale ones") {
    val wh = Files.createTempDirectory("graft-analyze-ddl").toString
    // the DDL spelling needs the parser extension (like branch DDL)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .create()
    try {
      s.conf.set("spark.sql.catalog.ana",
        classOf[graft.lake.dsv2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.ana.warehouse", wh)
      s.sql("CREATE DATABASE IF NOT EXISTS ana.db")
      s.sql("CREATE TABLE ana.db.astats (id BIGINT, s STRING) USING graft " +
        "PARTITIONED BY (bucket(4, id))")
      s.sql("INSERT INTO ana.db.astats VALUES (1, 'aa'), (2, 'bb'), (3, NULL)")
      s.conf.set("spark.graft.analyze.exact-ndv", "true")
      s.sql("ANALYZE TABLE ana.db.astats COMPUTE STATISTICS FOR ALL COLUMNS")
      val stats = s.sql(
        "SELECT column, ndv, null_count, min, max FROM ana.db.astats.stats ORDER BY column")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getString(4)))
      assert(stats === Array(
        ("id", 3L, 0L, "1", "3"),
        ("s", 2L, 1L, "aa", "bb")))

      // the DSv2 scan reports the fresh stats to the planner
      val gc = s.sessionState.catalogManager.catalog("ana")
        .asInstanceOf[graft.lake.dsv2.GraftCatalog]
      def scanStats() = {
        val gt = gc.loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("db"), "astats")).asInstanceOf[graft.lake.dsv2.GraftTable]
        new graft.lake.dsv2.GraftBatchScanBuilder(s, gt).build()
          .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
          .estimateStatistics()
      }
      val cs = scanStats().columnStats()
      assert(cs.size() === 2)
      val idStat = cs.entrySet().stream()
        .filter(e => e.getKey.fieldNames()(0) == "id").findFirst().get().getValue
      assert(idStat.distinctCount().getAsLong === 3L)
      assert(idStat.min().get() === java.lang.Long.valueOf(1L))
      assert(idStat.max().get() === java.lang.Long.valueOf(3L))
      // equi-height histogram derived from the persisted KLL sketch
      val hist = idStat.histogram()
      assert(hist.isPresent, "numeric column must report a histogram")
      assert(hist.get().bins().length === 16)
      assert(hist.get().bins()(0).lo() === 1.0)
      assert(hist.get().bins()(15).hi() === 3.0)
      val sStat = cs.entrySet().stream()
        .filter(e => e.getKey.fieldNames()(0) == "s").findFirst().get().getValue
      assert(sStat.nullCount().getAsLong === 1L)
      assert(sStat.avgLen().getAsLong === 2L)
      assert(!sStat.min().isPresent, "string bounds are not reported as objects")

      // FOR COLUMNS subset
      s.sql("ANALYZE TABLE ana.db.astats COMPUTE STATISTICS FOR COLUMNS id")
      assert(s.sql("SELECT column FROM ana.db.astats.stats").collect()
        .map(_.getString(0)).toSeq === Seq("id"))
      // NOSCAN
      s.sql("ANALYZE TABLE ana.db.astats COMPUTE STATISTICS NOSCAN")
      assert(s.sql("SELECT count(*) FROM ana.db.astats.stats").head.getLong(0) === 0L)

      // stale after a new commit → scan reports NO column stats
      s.sql("ANALYZE TABLE ana.db.astats COMPUTE STATISTICS FOR ALL COLUMNS")
      s.sql("INSERT INTO ana.db.astats VALUES (4, 'z')")
      assert(scanStats().columnStats().isEmpty)

      // END-TO-END CBO visibility: with SPJ keeping the DSv2 relation and
      // CBO enabled, the optimized plan's attribute stats carry the NDV —
      // the actual consumer of ANALYZE at plan time
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.cbo.enabled", "true")
      try {
        s.sql("ANALYZE TABLE ana.db.astats COMPUTE STATISTICS FOR ALL COLUMNS")
        val stats = s.sql("SELECT id, s FROM ana.db.astats")
          .queryExecution.optimizedPlan.stats
        val idNdv = stats.attributeStats.collectFirst {
          case (a, cs) if a.name == "id" => cs.distinctCount
        }.flatten
        assert(idNdv.exists(_.toLong == 4L),
          s"CBO attribute stats missing the analyzed NDV: $stats")
      } finally {
        s.conf.unset("spark.sql.cbo.enabled")
        s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }

      // a non-graft ident parses to Spark's own ANALYZE plan (delegation)
      val plan = s.sessionState.sqlParser.parsePlan(
        "ANALYZE TABLE spark_catalog.default.nosuch COMPUTE STATISTICS")
      assert(!plan.isInstanceOf[graft.lake.dsv2.GraftAnalyzeCommand])

      // ---- THE PLAN FLIP (r17): fresh stats change a join strategy ----
      // Both join inputs exceed the broadcast threshold by raw size and by
      // CBO's no-stats row-width estimate. The facts side carries a 1%
      // range filter on a DOUBLE column. Without ANALYZE stats,
      // FilterEstimation has no bounds → selectivity 1.0 → shuffle join.
      // With fresh stats, the widened double min/max + histogram put the
      // filtered side at ~1% → under the threshold → broadcast join.
      // This is the gate the feature exists for at 100 TB: it FAILS if
      // estimateStatistics stops reporting column stats, if the
      // double-bounds gate regresses to integral-only, or if the
      // covers-snapshot widening stops serving stats under a residual
      // pushed filter.
      import s.implicits._
      val n = 4000
      // v scattered across insertion order so every written file spans the
      // full value range — file pruning must drop nothing, or the scan
      // (correctly) refuses to serve table-level stats
      val factsSrc = (0 until n).map { i =>
        (i.toLong, ((i * 2654435761L) % n).toDouble, f"p$i%04d" + "x" * 28)
      }.toDF("k", "v", "pad")
        .withColumn("d", org.apache.spark.sql.functions.expr(
          "date_add(date'2020-01-01', cast(k % 100 as int))"))
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestampadd(SECOND, cast(k as int), timestamp'2020-01-01 00:00:00')"))
      factsSrc.createOrReplaceTempView("cbo_facts_src")
      (0 until n).map(i => (i.toLong, f"q$i%04d" + "y" * 28)).toDF("k", "pad")
        .createOrReplaceTempView("cbo_dims_src")
      // bucket-partitioned + v2 bucketing on: the relation stays DSv2
      // (GraftBatchScan), which is where columnStats() serves — the
      // substituted parquet path has no ANALYZE channel
      s.sql("CREATE TABLE ana.db.cfacts (k BIGINT, v DOUBLE, pad STRING, " +
        "d DATE, ts TIMESTAMP) USING graft PARTITIONED BY (bucket(4, k))")
      s.sql("INSERT INTO ana.db.cfacts SELECT * FROM cbo_facts_src")
      s.sql("CREATE TABLE ana.db.cdims (k BIGINT, pad STRING) USING graft " +
        "PARTITIONED BY (bucket(4, k))")
      s.sql("INSERT INTO ana.db.cdims SELECT * FROM cbo_dims_src")

      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false") // isolate the static planner
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", (32 * 1024).toString)
      // 10% selectivity: low enough to flip the broadcast decision, high
      // enough that no file's ~250 scattered v-values can all sit below
      // the cut (file pruning must drop nothing, or the scan correctly
      // refuses to serve whole-table stats under the pruned read)
      def joinPlan() = s.sql(
        "SELECT f.k, f.v, d.pad FROM ana.db.cfacts f " +
          "JOIN ana.db.cdims d ON f.k = d.k WHERE f.v > " + (n - 400) + ".0")
        .queryExecution.executedPlan
      def broadcasts(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect { case b: org.apache.spark.sql.execution.joins
          .BroadcastHashJoinExec => b }
      try {
        assert(broadcasts(joinPlan()).isEmpty,
          s"without stats both sides must exceed the threshold:\n${joinPlan()}")
        s.sql("ANALYZE TABLE ana.db.cfacts COMPUTE STATISTICS FOR ALL COLUMNS")
        s.sql("ANALYZE TABLE ana.db.cdims COMPUTE STATISTICS FOR ALL COLUMNS")
        val flipped = joinPlan()
        assert(broadcasts(flipped).nonEmpty,
          s"fresh ANALYZE stats must flip the join to broadcast:\n$flipped")
      } finally {
        s.conf.unset("spark.sql.cbo.enabled")
        s.conf.unset("spark.sql.adaptive.enabled")
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }

      // widened bounds serve as typed objects: double, date (epoch days),
      // timestamp (epoch micros) — deltas asserted, so the check is
      // timezone-independent
      def boundsOf(table: String, colName: String) = {
        val gt = gc.loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("db"), table)).asInstanceOf[graft.lake.dsv2.GraftTable]
        val cs = new graft.lake.dsv2.GraftBatchScanBuilder(s, gt).build()
          .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
          .estimateStatistics().columnStats()
        val st = cs.entrySet().stream()
          .filter(e => e.getKey.fieldNames()(0) == colName).findFirst().get().getValue
        (st.min().get(), st.max().get())
      }
      val (vmin, vmax) = boundsOf("cfacts", "v")
      assert(vmin === java.lang.Double.valueOf(0.0) &&
        vmax === java.lang.Double.valueOf((n - 1).toDouble))
      val (dmin, dmax) = boundsOf("cfacts", "d")
      assert(dmin.isInstanceOf[java.lang.Integer] &&
        dmax.asInstanceOf[java.lang.Integer] - dmin.asInstanceOf[java.lang.Integer] === 99)
      val (tmin, tmax) = boundsOf("cfacts", "ts")
      assert(tmin.isInstanceOf[java.lang.Long] &&
        tmax.asInstanceOf[java.lang.Long] - tmin.asInstanceOf[java.lang.Long]
          === (n - 1).toLong * 1000000L)
    } finally {
      prevDefault match {
        case Some(d) => SparkSession.setDefaultSession(d)
        case None => SparkSession.clearDefaultSession()
      }
      prevActive match {
        case Some(a) => SparkSession.setActiveSession(a)
        case None => SparkSession.clearActiveSession()
      }
    }
  }
}
