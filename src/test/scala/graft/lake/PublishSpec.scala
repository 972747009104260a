package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}

/** The exclusive-publish seam on a store WITHOUT atomic exclusive create
  * ([[FakeObjectStoreFS]]): first demonstrate both failure modes of the
  * naive `fs.create(p, overwrite=false)` protocol, then prove the
  * [[Publish.TmpRename]] strategy (and the [[Publish.ConditionalPut]]
  * registration seam) close them — the loser path the r8 verdict flagged
  * as never tested. */
class PublishSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fakeFs(): FileSystem = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.fakeos.impl", classOf[FakeObjectStoreFS].getName)
    conf.setBoolean("fs.fakeos.impl.disable.cache", true)
    FileSystem.get(java.net.URI.create("fakeos:///"), conf)
  }

  private def tmpDir(): String =
    Files.createTempDirectory("graft-publish").toString

  test("naive exclusive create: two racing writers BOTH win (check-then-act)") {
    val fs = fakeFs()
    // the double-win needs both threads inside the check-then-act window
    // at once — under a loaded box one thread can finish before the other
    // starts, so retry the schedule with a fresh path until the
    // interleaving materializes (a few tries at most when idle)
    def race(attempt: Int): Int = {
      val p = new Path(s"fakeos://${tmpDir()}/v1-$attempt.json")
      val barrier = new CyclicBarrier(2)
      val pool = Executors.newFixedThreadPool(2)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      (0 until 2).foreach { i =>
        pool.submit(new Runnable { def run(): Unit = {
          barrier.await()
          try {
            val out = fs.create(p, false)
            try out.write(s"writer-$i".getBytes(StandardCharsets.UTF_8)) finally out.close()
            wins.incrementAndGet(); ()
          } catch { case _: java.io.IOException => () }
        }})
      }
      pool.shutdown(); pool.awaitTermination(30, TimeUnit.SECONDS)
      wins.get()
    }
    // the bug this spec exists to pin down: both writers pass the exists
    // check inside create and both believe they committed
    assert((0 until 50).exists(race(_) === 2),
      "the check-then-act double-win never materialized in 50 schedules")
  }

  test("naive exclusive create: the path is visible with ZERO bytes before content lands") {
    val fs = fakeFs()
    val p = new Path(s"fakeos://${tmpDir()}/v2.json")
    val created = new CountDownLatch(1)
    val observed = new CountDownLatch(1)
    val t = new Thread(() => {
      val out = fs.create(p, false)   // file visible NOW
      created.countDown()
      observed.await(10, TimeUnit.SECONDS) // reader looks while we hold the pen
      try out.write("content".getBytes(StandardCharsets.UTF_8)) finally out.close()
    })
    t.start()
    assert(created.await(10, TimeUnit.SECONDS))
    // a concurrent reader (e.g. currentVersion probing v{N}) sees the slot
    // taken but parses an empty document — the torn-read failure mode
    assert(fs.exists(p))
    assert(fs.getFileStatus(p).getLen === 0)
    observed.countDown()
    t.join(10000)
    assert(fs.getFileStatus(p).getLen === "content".length)
  }

  test("TmpRename publish: exactly one winner of 8; content is always complete") {
    val fs = fakeFs()
    val p = new Path(s"fakeos://${tmpDir()}/v3.json")
    val n = 8
    val payloads = (0 until n).map(i => s"""{"writer":$i,"pad":"${"x" * 256}"}""")
    val barrier = new CyclicBarrier(n + 1)
    val pool = Executors.newFixedThreadPool(n)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    (0 until n).foreach { i =>
      pool.submit(new Runnable { def run(): Unit = {
        barrier.await()
        results.put(i, Publish.TmpRename.publish(fs, p,
          payloads(i).getBytes(StandardCharsets.UTF_8)))
        ()
      }})
    }
    barrier.await()
    // torn-read monitor: any observation of the slot must be absent or a
    // COMPLETE payload — never empty, never interleaved
    var torn = false
    val deadline = System.nanoTime() + 10_000_000_000L
    while (results.size < n && System.nanoTime() < deadline) {
      if (fs.exists(p)) {
        val in = fs.open(p)
        val s = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
        if (!payloads.contains(s)) torn = true
      }
    }
    pool.shutdown(); pool.awaitTermination(30, TimeUnit.SECONDS)
    assert(!torn, "observed a partial/empty published file")
    val winners = (0 until n).filter(results.get(_))
    assert(winners.size === 1)
    val in = fs.open(p)
    val content = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    assert(content === payloads(winners.head))
    // losers cleaned their temp files
    val dir = fs.listStatus(p.getParent).map(_.getPath.getName).toSeq
    assert(dir === Seq("v3.json"))
  }

  test("lake commits on the fakeos scheme: concurrent writers, linear history, no loss") {
    // end-to-end: the table's commit protocol runs through Publish.forScheme
    // ("fakeos" → TmpRename) — metadata-only commits from 6 threads
    spark.sparkContext.hadoopConfiguration
      .set("fs.fakeos.impl", classOf[FakeObjectStoreFS].getName)
    val cat = new LakeCatalog(spark, s"fakeos://${tmpDir()}")
    val t0 = cat.createTable("os.t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    import spark.implicits._
    t0.append(Seq(1L).toDF("id")) // branches need a head; also drives the
                                  // parquet write + manifest chunks on fakeos
    assert(cat.loadTable("os.t").toDF.count() === 1)
    val n = 6
    val barrier = new CyclicBarrier(n)
    val pool = Executors.newFixedThreadPool(n)
    (0 until n).foreach { i =>
      pool.submit(new Runnable { def run(): Unit = {
        barrier.await()
        cat.loadTable("os.t").createBranch(s"b$i")
        ()
      }})
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val m = cat.loadTable("os.t").meta
    assert((0 until n).forall(i => m.refs.contains(s"b$i")), s"refs=${m.refs.keySet}")
    assert(m.version === 2 + n) // create + append + one slot per branch commit
  }

  test("full table lifecycle on the fakeos scheme: DML, time travel, manifests, GC") {
    // the object-store confidence test: every metadata artifact (version
    // files, manifest chunks, manifest lists, hints) flows through the
    // per-scheme publish protocol; nothing in the lifecycle assumes local
    // hard links
    spark.sparkContext.hadoopConfiguration
      .set("fs.fakeos.impl", classOf[FakeObjectStoreFS].getName)
    val cat = new LakeCatalog(spark, s"fakeos://${tmpDir()}")
    import spark.implicits._
    val t = cat.createTable("os.life", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    t.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    val firstSnap = t.meta.currentSnapshot.get.snapshotId
    t.append(Seq((3L, 3.0)).toDF("id", "v"))
    t.delete(org.apache.spark.sql.functions.col("id") === 2L)
    assert(t.toDF.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    // time travel re-inflates older snapshots from manifest chunks
    assert(t.read(snapshotId = Some(firstSnap)).count() === 2)
    // manifest compaction + retention + orphan sweep all publish/delete
    // through the fake store
    t.rewriteManifests()
    t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    val removed = t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 1000)
    assert(t.toDF.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    // fresh handle (fresh caches for this location's latest version) agrees
    assert(cat.loadTable("os.life").toDF.count() === 2)
    // surviving metadata is internally consistent: every referenced chunk
    // and list exists on the store
    val fs = fakeFs()
    val m = cat.loadTable("os.life").meta
    m.snapshots.flatMap(s => s.manifests ++ s.manifestList).distinct.foreach { n =>
      assert(fs.exists(new Path(s"${t.location}/metadata/$n")), s"missing $n (removed=$removed)")
    }
  }

  test("ConditionalPut seam: a registered strategy owns its scheme") {
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    val strategy = new Publish.ConditionalPut((fs, p, bytes) => {
      puts.incrementAndGet()
      if (fs.exists(p)) false
      else { val o = fs.create(p, true); try o.write(bytes) finally o.close(); true }
    })
    Publish.register("fakecp", strategy)
    assert(Publish.forScheme("fakecp") eq strategy)
    assert(Publish.forScheme("file") === Publish.HardLink)
    assert(Publish.forScheme("hdfs") === Publish.TmpRename) // non-local default
  }
}
