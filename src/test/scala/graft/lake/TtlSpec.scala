package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Row-level TTL retention ([[LakeTable.ttlExpire]]): file-granular
  * metadata-only expiry in `files` mode (the 100 TB path — zero bytes
  * read or written), exact DELETE semantics in `exact` mode, policy
  * properties riding the table, and the ingest-cadence hookup. */
class TtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", LongType),
    StructField("v", StringType)))

  private def df(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    // one file per append — the tests reason about per-file stat bounds
    rows.map { case (id, ts) => (id, ts, s"v$id") }.toDF("id", "ts", "v")
      .coalesce(1)
  }

  private def mk(props: Map[String, String]): LakeTable = {
    val cat = new LakeCatalog(spark,
      Files.createTempDirectory("graft-ttl").toString)
    cat.createTable("t.ev", schema, properties = props)
  }

  private def dataFiles(t: LakeTable): Seq[String] =
    t.meta.currentSnapshot.get.files.map(_.path)

  test("files mode: whole aged-out files drop metadata-only; straddling " +
    "files keep their expired rows until their file ages (stated " +
    "trade-off); idempotent when nothing expired") {
    val now = 1000000L // fixed clock — deterministic cutoffs
    val t = mk(Map("graft.ttl.column" -> "ts", "graft.ttl.ms" -> "1000"))
    t.append(df(1L -> 100L, 2L -> 200L))          // all-expired file
    t.append(df(3L -> 300L, 4L -> 999500L))       // straddles the 999000 cutoff
    t.append(df(5L -> 999500L, 6L -> 999900L))    // all-live file
    val before = dataFiles(t)
    assert(t.ttlExpire(now), "aged-out file must trigger a commit")
    val s = t.meta.currentSnapshot.get
    assert(s.operation === "ttl-expire")
    assert(s.summary("metadata-only") === "true")
    assert(s.summary("deleted-data-files") === "1")
    assert(s.summary("ttl-cutoff") === (now - 1000L).toString)
    // the straddling file survives WHOLE — its expired row included
    // (file-granular semantics; compaction/aging collects it later)
    val dropped = before.toSet -- dataFiles(t).toSet
    assert(dropped.size === 1 && dataFiles(t).size === before.size - 1)
    assert(t.toDF.count() === 4)
    assert(t.toDF.filter("id = 3").count() === 1, "straddler row persists")
    // no data files were written — the expiry is a pure metadata commit
    assert(dataFiles(t).forall(before.contains))
    // nothing more to expire at the same clock: no spurious commit
    val v = t.meta.version
    assert(!t.ttlExpire(now))
    assert(t.meta.version === v)
    // the clock advancing past the straddler's max (999500) drops it too;
    // the third file (999500..999900) now straddles and survives whole
    assert(t.ttlExpire(1000600L))
    assert(t.toDF.count() === 2)
  }

  test("exact mode: a real DELETE through the configured delete mode — " +
    "expired rows gone even inside straddling files; the sweep summary " +
    "records the cutoff") {
    val now = 1000000L
    val t = mk(Map("graft.ttl.column" -> "ts", "graft.ttl.ms" -> "1000",
      "graft.ttl.mode" -> "exact"))
    t.append(df(1L -> 100L, 2L -> 999500L)) // one straddling file
    assert(t.ttlExpire(now))
    assert(t.toDF.collect().map(_.getLong(0)).toSeq === Seq(2L))
    // observability: the DELETE snapshot carries the sweep's identity
    val s = t.meta.currentSnapshot.get
    assert(s.summary("ttl-mode") === "exact")
    assert(s.summary("ttl-cutoff") === (now - 1000L).toString)
    assert(!t.ttlExpire(now), "second sweep at the same clock is a no-op")
  }

  test("exact mode no-op tick (r15): when no file's MIN stat crosses the " +
    "cutoff the sweep skips on the stats pass alone — zero commits AND " +
    "zero scan jobs (a hot table on the autoMaintain cadence must not " +
    "pay a DELETE plan per tick)") {
    val now = 1000000L
    val t = mk(Map("graft.ttl.column" -> "ts", "graft.ttl.ms" -> "1000",
      "graft.ttl.mode" -> "exact"))
    t.append(df(1L -> 999500L, 2L -> 999900L)) // all comfortably young
    t.append(df(3L -> 999600L))
    val v0 = t.meta.version
    // count only THIS thread's jobs (suites share the context and may run
    // in parallel): ttlExpire runs on the calling thread, so any scan it
    // submits inherits the job group set here
    val group = "ttl-noop-probe"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (Option(j.properties)
            .exists(_.getProperty("spark.jobGroup.id") == group)) {
          jobs.incrementAndGet(); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "ttl no-op tick probe")
    try {
      assert(!t.ttlExpire(now), "nothing can have expired")
      Thread.sleep(500) // listener bus is async — let it drain
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(t.meta.version === v0, "no-op tick must not commit")
    assert(jobs.get() === 0, s"no-op tick must not run a scan (ran ${jobs.get()} jobs)")
    // …and once a row CAN have expired, the same table sweeps for real
    assert(t.ttlExpire(now + 1000600L))
    assert(t.toDF.count() === 0)
  }

  test("unit mapping: an epoch-ns column (the events.ts convention) " +
    "expires against a wall-clock-ms policy") {
    val nowMs = 2000000L
    val t = mk(Map("graft.ttl.column" -> "ts", "graft.ttl.ms" -> "1000",
      "graft.ttl.unit" -> "ns"))
    t.append(df(1L -> 100L * 1000000L))            // 100 ms in ns — expired
    t.append(df(2L -> (nowMs - 10L) * 1000000L))   // 10 ms old — live
    assert(t.ttlExpire(nowMs))
    assert(t.toDF.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("SQL surface: CALL ttl_expire sweeps through the procedure catalog") {
    val wh = Files.createTempDirectory("graft-ttl-sql").toString
    spark.conf.set("spark.sql.catalog.ttlc",
      classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ttlc.warehouse", wh)
    org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
    val cat = new LakeCatalog(spark, wh)
    val t = cat.createTable("t.ev", schema, properties = Map(
      "graft.ttl.column" -> "ts", "graft.ttl.ms" -> "1"))
    t.append(df(1L -> 100L))
    t.append(df(2L -> (System.currentTimeMillis() + 3600000L)))
    spark.sql("CALL ttlc.system.ttl_expire('t.ev')")
    assert(t.toDF.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("ingest-cadence hookup: autoMaintain sweeps TTL when the policy " +
    "properties are set, and never commits without them") {
    val t = mk(Map("graft.ttl.column" -> "ts", "graft.ttl.ms" -> "1"))
    t.append(df(1L -> 100L)) // ancient — expires against the real clock
    t.append(df(2L -> (System.currentTimeMillis() + 3600000L)))
    assert(t.autoMaintain(everyCommits = 1000)) // high cadence: only TTL fires
    assert(t.toDF.collect().map(_.getLong(0)).toSeq === Seq(2L))
    // a table WITHOUT the policy is untouched by the same call
    val plain = mk(Map.empty)
    plain.append(df(1L -> 100L))
    val v = plain.meta.version
    plain.autoMaintain(everyCommits = 1000)
    assert(plain.meta.version === v && plain.toDF.count() === 1)
  }
}
