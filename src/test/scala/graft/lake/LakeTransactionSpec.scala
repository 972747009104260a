package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Multi-table transactions ([[LakeTransaction]]): all-or-nothing
  * visibility across tables, strict conflict aborts, fence semantics,
  * and crash recovery at every protocol window — driven through the
  * package-private step methods exactly the way a real crash would
  * leave the system. */
class LakeTransactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def ids(t: LakeTable): Seq[Long] =
    t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-txn").toString)

  private def mk(cat: LakeCatalog, ident: String,
                 seed: Seq[(Long, String)] = Seq.empty,
                 props: Map[String, String] = Map.empty): LakeTable = {
    val t = cat.createTable(ident, schema, properties = props)
    if (seed.nonEmpty) t.append(df(seed: _*))
    t
  }

  test("happy path: staged writes invisible before commit, visible " +
    "all-or-nothing after; read-your-writes; no residue") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a", 2L -> "b"))
    val b = mk(cat, "db.tb", Seq(10L -> "x"))
    val c = mk(cat, "db.tc") // empty participant
    val txn = cat.beginTransaction()
    txn.table("db.ta").delete(col("id") === 1L)
    txn.table("db.tb").append(df(11L -> "y"))
    txn.table("db.tc").append(df(100L -> "z"))
    // read-your-writes inside the transaction…
    assert(txn.table("db.ta").toDF.count() === 1)
    assert(txn.table("db.tb").toDF.count() === 2)
    // …while main sees nothing
    assert(ids(a) === Seq(1L, 2L) && ids(b) === Seq(10L) && ids(c) === Seq())
    txn.commit()
    assert(ids(a) === Seq(2L) && ids(b) === Seq(10L, 11L) && ids(c) === Seq(100L))
    // no residue: branches and fences gone, log finalized
    for (t <- Seq(a, b, c)) {
      assert(!t.meta.refs.keys.exists(_.startsWith("txn-")))
      assert(!t.meta.properties.contains(LakeTransaction.FenceKey))
    }
    assert(cat.recoverTransactions() === Map.empty)
  }

  test("rollback discards every staged branch; main untouched") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val b = mk(cat, "db.tb", Seq(2L -> "b"))
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    txn.table("db.tb").truncate()
    txn.rollback()
    assert(ids(a) === Seq(1L) && ids(b) === Seq(2L))
    for (t <- Seq(a, b))
      assert(!t.meta.refs.keys.exists(_.startsWith("txn-")))
    val e = intercept[IllegalArgumentException](txn.table("db.ta"))
    assert(e.getMessage.contains("finished"))
  }

  test("strict serializability: a concurrent main commit on ANY " +
    "participant aborts the WHOLE transaction with zero residue; the " +
    "retried transaction succeeds") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val b = mk(cat, "db.tb", Seq(2L -> "b"))
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    txn.table("db.tb").append(df(6L -> "m"))
    // concurrent writer lands on main of ONE participant after staging
    b.append(df(99L -> "concurrent"))
    val e = intercept[CommitConflictException](txn.commit())
    assert(e.getMessage.contains("concurrent commit"))
    // nothing published anywhere, nothing fenced, branches dropped
    assert(ids(a) === Seq(1L) && ids(b) === Seq(2L, 99L))
    for (t <- Seq(a, b)) {
      assert(!t.meta.properties.contains(LakeTransaction.FenceKey))
      assert(!t.meta.refs.keys.exists(_.startsWith("txn-")))
    }
    // the optimistic retry (fresh state) goes through
    val txn2 = cat.beginTransaction()
    txn2.table("db.ta").append(df(5L -> "n"))
    txn2.table("db.tb").append(df(6L -> "m"))
    txn2.commit()
    assert(ids(a) === Seq(1L, 5L) && ids(b) === Seq(2L, 6L, 99L))
  }

  test("a live fence rejects foreign commits naming the transaction; " +
    "the coordinator then completes") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a")) // default TTL: presumed live
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    val parts = txn.participants
    txn.writeManifest(parts)
    txn.fenceAll(parts)
    val e = intercept[CommitConflictException](a.append(df(7L -> "w")))
    assert(e.getMessage.contains(txn.txnId))
    // the (slow, but alive) coordinator finishes normally
    assert(txn.decide("commit"))
    txn.publishAll(parts)
    txn.markDone()
    assert(ids(a) === Seq(1L, 5L))
    a.append(df(7L -> "w")) // unblocked
    assert(ids(a) === Seq(1L, 5L, 7L))
  }

  test("CREATE OR REPLACE during a fence window is refused: a wholesale " +
    "property replace must not drop a foreign fence (r15 guard — the old " +
    "guard only fired when the fence key survived the transform verbatim)") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    val parts = txn.participants
    txn.writeManifest(parts)
    txn.fenceAll(parts)
    // CREATE OR REPLACE TABLE AS SELECT replaces properties wholesale and
    // resets refs — both would destroy the in-flight transaction's state
    val pendingSchema = a.meta.schema.copy(schemaId = a.meta.schema.schemaId + 1)
    val pendingSpec = PartitionSpec(a.meta.defaultSpecId + 1, Seq.empty)
    val e = intercept[CommitConflictException](
      a.replaceTable(pendingSchema, pendingSpec, Map.empty, Seq.empty))
    assert(e.getMessage.contains(txn.txnId))
    // a fence-ALTERING commit that leaves main alone is equally refused
    // (dropping a foreign fence would make the owner's publish a no-op,
    // silently losing its staged writes)
    val e2 = intercept[CommitConflictException](a.commit(m =>
      m.copy(properties = m.properties - LakeTransaction.FenceKey)))
    assert(e2.getMessage.contains(txn.txnId))
    // fence intact; the live coordinator completes normally
    assert(a.meta.properties.get(LakeTransaction.FenceKey)
      .exists(_.startsWith(txn.txnId + "\t")))
    assert(txn.decide("commit"))
    txn.publishAll(parts)
    txn.markDone()
    assert(ids(a) === Seq(1L, 5L))
  }

  test("coordinator death AFTER the commit decision: a blocked writer " +
    "rolls the transaction FORWARD on every participant (TTL elapsed)") {
    val cat = freshCatalog()
    val ttl0 = Map(LakeTransaction.FenceTtlKey -> "0")
    val a = mk(cat, "db.ta", Seq(1L -> "a"), ttl0)
    val b = mk(cat, "db.tb", Seq(2L -> "b"), ttl0)
    val txn = cat.beginTransaction()
    txn.table("db.ta").delete(col("id") === 1L)
    txn.table("db.tb").append(df(6L -> "m"))
    val parts = txn.participants
    txn.writeManifest(parts)
    txn.fenceAll(parts)
    assert(txn.decide("commit"))
    // coordinator dies here — zero tables published, fences held.
    // A foreign commit on ONE participant recovers the whole transaction
    // (decision says commit → roll forward EVERYWHERE), then lands.
    a.append(df(7L -> "w"))
    assert(ids(a) === Seq(7L), "txn delete AND the foreign append")
    assert(ids(b) === Seq(2L, 6L), "the OTHER participant rolled forward too")
    for (t <- Seq(a, b)) {
      assert(!t.meta.properties.contains(LakeTransaction.FenceKey))
      assert(!t.meta.refs.keys.exists(_.startsWith("txn-")))
    }
    assert(cat.recoverTransactions() === Map.empty, "done marker written")
  }

  test("coordinator death BEFORE the decision: a blocked writer resolves " +
    "the decision slot to abort and rolls the transaction BACK") {
    val cat = freshCatalog()
    val ttl0 = Map(LakeTransaction.FenceTtlKey -> "0")
    val a = mk(cat, "db.ta", Seq(1L -> "a"), ttl0)
    val b = mk(cat, "db.tb", Seq(2L -> "b"), ttl0)
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    txn.table("db.tb").append(df(6L -> "m"))
    val parts = txn.participants
    txn.writeManifest(parts)
    txn.fenceAll(parts)
    // dies pre-decision; the breaker aborts via the decision slot
    a.append(df(7L -> "w"))
    assert(ids(a) === Seq(1L, 7L), "txn append rolled back, foreign landed")
    assert(ids(b) === Seq(2L), "other participant rolled back too")
    // the decision slot is settled: even the returned coordinator
    // honors the abort (its own decide('commit') loses)
    assert(!txn.decide("commit"))
  }

  test("explicit recovery sweep resolves a crashed transaction and is " +
    "idempotent; a second transaction meeting a fence aborts itself") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val b = mk(cat, "db.tb", Seq(2L -> "b"))
    val t1 = cat.beginTransaction()
    t1.table("db.ta").append(df(5L -> "n"))
    t1.table("db.tb").append(df(6L -> "m"))
    val parts = t1.participants
    t1.writeManifest(parts)
    t1.fenceAll(parts)
    assert(t1.decide("commit"))
    // a SECOND transaction may STAGE under the fence (branch writes
    // leave main alone) but aborts itself at its own fence step — no
    // waiting, no deadlock, the error names the holder, zero residue
    val t2 = cat.beginTransaction()
    t2.table("db.ta").append(df(50L -> "q"))
    val e = intercept[CommitConflictException](t2.commit())
    assert(e.getMessage.contains("fenced") && e.getMessage.contains(t1.txnId))
    assert(!a.meta.refs.keys.exists(_.startsWith(s"txn-${t2.txnId}")))
    // operator sweep: rolls t1 forward (decision = commit), TTL ignored
    val resolved = cat.recoverTransactions()
    assert(resolved === Map(t1.txnId -> "commit"))
    assert(ids(a) === Seq(1L, 5L) && ids(b) === Seq(2L, 6L))
    assert(cat.recoverTransactions() === Map.empty)
  }

  test("transaction snapshots expose per-table history honestly: main " +
    "history records the publish, and time travel to the pre-txn " +
    "snapshot still answers") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val pre = a.meta.currentSnapshot.get.snapshotId
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    txn.table("db.ta").delete(col("id") === 1L)
    txn.commit()
    assert(ids(a) === Seq(5L))
    assert(a.read(snapshotId = Some(pre)).count() === 1)
    // the published head is the branch's last snapshot (both staged
    // commits visible at once, never one without the other)
    assert(a.toDF.count() === 1)
  }

  test("concurrency stress: racing transfer transactions and plain " +
    "writers conserve the ledger — every transaction fully applied or " +
    "fully absent, no lost updates, no residue") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", (0L until 20L).map(i => i -> "a"))
    val b = mk(cat, "db.tb", (100L until 120L).map(i => i -> "b"))
    // invariant: |ta| + |tb| only changes by the plain writers' appends.
    // Each transfer txn MOVES one specific row id from ta to tb — a torn
    // publish would drop or duplicate it; a lost update would resurrect it.
    val moved = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val plainAppended = new java.util.concurrent.atomic.AtomicLong(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val tasks = (0 until 6).map { worker =>
      pool.submit(new Runnable { def run(): Unit = {
        if (worker < 4) {
          // transfer workers: each owns a disjoint id range — conflicts
          // come from FENCE/commit interleaving on the SHARED tables
          (0 until 5).foreach { j =>
            val id = worker * 5L + j
            var done = false
            var tries = 0
            while (!done && tries < 60) {
              tries += 1
              val txn = cat.beginTransaction()
              try {
                txn.table("db.ta").delete(col("id") === id)
                txn.table("db.tb").append(df(id -> "moved"))
                txn.commit()
                moved.add(id); done = true
              } catch { case _: CommitConflictException =>
                // a STAGING write can hit another transaction's fence too
                // — the contract is rollback-then-retry (commit cleans up
                // after itself; rollback after it is a no-op)
                txn.rollback()
                // optimistic-txn retry with jittered backoff — first to
                // decide wins each round, everyone else re-stages
                Thread.sleep(math.min(200L, 5L * tries) +
                  scala.util.Random.nextInt(20)) }
            }
          }
        } else {
          // plain writers: single-table appends racing the fences
          (0 until 10).foreach { j =>
            val id = 10000L + worker * 100L + j
            var done = false
            while (!done) {
              try { a.append(df(id -> "w")); plainAppended.incrementAndGet(); done = true }
              catch { case _: CommitConflictException => Thread.sleep(10L) }
            }
          }
        }
      }})
    }
    tasks.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    val movedIds = moved.asScala.map(_.longValue).toSet
    assert(movedIds.size === 20,
      s"every transfer must eventually commit (got ${movedIds.size})")
    val aIds = ids(a); val bIds = ids(b)
    // each moved id is gone from ta and present EXACTLY once in tb
    movedIds.foreach { id =>
      assert(!aIds.contains(id), s"moved id $id still in ta")
      assert(bIds.count(_ == id) === 1, s"moved id $id not exactly-once in tb")
    }
    // conservation: nothing else appeared or vanished
    assert(aIds.size === 20 - movedIds.size + plainAppended.get().toInt)
    assert(bIds.size === 20 + movedIds.size)
    for (t <- Seq(a, b)) {
      assert(!t.meta.refs.keys.exists(_.startsWith("txn-")), "branch residue")
      assert(!t.meta.properties.contains(LakeTransaction.FenceKey), "fence residue")
    }
    assert(cat.recoverTransactions() === Map.empty, "txn log fully finalized")
  }

  test("listTransactions surfaces the log's resolved states: done " +
    "transactions, a pending crashed one, and its post-recovery state") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val b = mk(cat, "db.tb", Seq(2L -> "b"))
    val t1 = cat.beginTransaction()
    t1.table("db.ta").append(df(5L -> "n"))
    t1.commit()
    val t2 = cat.beginTransaction()
    t2.table("db.tb").append(df(6L -> "m"))
    val parts = t2.participants
    t2.writeManifest(parts)
    t2.fenceAll(parts) // crashed mid-flight, undecided
    val listed = cat.listTransactions().collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(listed(t1.txnId) === (("commit:done", "db.ta")))
    assert(listed(t2.txnId) === (("pending", "db.tb")))
    assert(cat.listTransactions().filter("age_ms < 0").count() === 0)
    // recovery resolves the pending one; the listing reflects it
    assert(cat.recoverTransactions() === Map(t2.txnId -> "abort"))
    val after = cat.listTransactions().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after(t2.txnId) === "abort:done")
  }

  test("transactionSnapshots gives a cross-table-consistent read even " +
    "mid-publish: pinned reads see the txn on EVERY participant while " +
    "main still shows the other table pre-txn") {
    val cat = freshCatalog()
    val a = mk(cat, "db.ta", Seq(1L -> "a"))
    val b = mk(cat, "db.tb", Seq(2L -> "b"))
    val txn = cat.beginTransaction()
    txn.table("db.ta").append(df(5L -> "n"))
    txn.table("db.tb").append(df(6L -> "m"))
    val parts = txn.participants
    txn.writeManifest(parts)
    txn.fenceAll(parts)
    assert(txn.decide("commit"))
    // publish the FIRST participant only — the mid-publish window a
    // two-table reader can observe (the documented REST-catalog anomaly)
    LakeTransaction.publishOne(parts.head.table, txn.txnId,
      s"txn-${txn.txnId}", parts.head.branchHead.get)
    assert(ids(parts.head.table).size === 2, "first participant visible")
    assert(ids(parts.last.table).size === 1, "second not yet — the anomaly")
    // the consistency primitive: pin every participant to the manifest's
    // snapshot ids — the pair is the TRANSACTION's state on both tables
    val pins = cat.transactionSnapshots(txn.txnId)
    assert(pins.keySet === Set("db.ta", "db.tb"))
    val pinned = pins.map { case (ident, snap) =>
      ident -> cat.loadTable(ident).read(snapshotId = Some(snap))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(pinned("db.ta") === Seq(1L, 5L) && pinned("db.tb") === Seq(2L, 6L))
    // an aborted transaction pins nothing
    assert(cat.transactionSnapshots("nonexistent") === Map.empty)
    // finish the publish so the catalog is clean
    txn.publishAll(parts); txn.markDone()
    assert(ids(b) === Seq(2L, 6L))
  }
}
