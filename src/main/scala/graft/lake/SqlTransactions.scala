package graft.lake

import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentHashMap

/** SQL surface for multi-table ACID transactions (D40): the session-conf
  * routing pattern WAP established (`spark.wap.branch`), applied to
  * [[LakeTransaction]] so a pure-SQL user can stage the same all-or-nothing
  * shapes the Scala API serves — the reference drives everything through
  * notebooook SQL, so a Scala-only transaction API would be a gap.
  *
  * {{{
  *   CALL lake.system.begin_transaction();
  *   INSERT INTO lake.db.ledger VALUES (...);        -- staged, invisible
  *   UPDATE lake.db.accounts SET bal = bal - 10 ...; -- staged, invisible
  *   CALL lake.system.commit_transaction();          -- all-or-nothing
  * }}}
  *
  * `begin_transaction` opens a [[LakeTransaction]], registers it here and
  * pins its id in the session conf (`spark.graft.txn.id`). While the conf
  * is set, every dsv2 write path (INSERT, INSERT OVERWRITE, DELETE,
  * UPDATE, MERGE) routes through the transaction's [[TxnTable]] — fork
  * points recorded, writes staged on the txn branch — and every dsv2
  * READ of a table the transaction has written resolves the staged
  * branch (read-your-writes), while untouched tables and other sessions
  * keep reading main — HONEST per-table snapshot visibility, not
  * repeatable read, by default. Setting
  * `spark.graft.txn.repeatable-read=true` before BEGIN upgrades reads:
  * each untouched table pins the snapshot its FIRST in-transaction read
  * observed ([[readPin]]), so foreign commits stay invisible until
  * COMMIT/ROLLBACK. Writes are unaffected either way: a staged write
  * forks from live main and the commit-time fork-point check rejects
  * conflicting interleavings, so the pin narrows read anomalies without
  * weakening the write-side protocol. `commit_transaction` publishes everywhere or
  * aborts with the protocol's conflict error; `rollback_transaction`
  * discards. A session crash without either leaves the staged branches
  * for `CALL recover_transactions()` / fence-TTL self-healing — exactly
  * the Scala API's story, because it IS the Scala API.
  */
object SqlTransactions {

  /** Session conf carrying the active SQL transaction's id. */
  val ConfKey = "spark.graft.txn.id"

  private val active = new ConcurrentHashMap[String, LakeTransaction]()

  /** The session whose conf owns the transaction: the EXECUTING one.
    * Callers pass whatever handle they hold (a catalog's init-time
    * session, a table's load-time session) — but a catalog initialized
    * under session A and used from session B must bind the transaction
    * to B, or `begin` and the write-path routing would consult different
    * confs and silently disagree. */
  private def sessionOf(s: SparkSession): SparkSession =
    SparkSession.getActiveSession.getOrElse(s)

  private def currentId(spark0: SparkSession): Option[String] = {
    val spark = sessionOf(spark0)
    try spark.conf.getOption(ConfKey).filter(_.nonEmpty)
    catch { case _: Exception => None }
  }

  /** The active transaction, if the session names one that is still live. */
  def current(spark: SparkSession): Option[LakeTransaction] =
    currentId(spark).flatMap(id => Option(active.get(id)))

  /** The transaction id this session's conf names, live or not — write
    * paths key their routing decision on THIS (and then go through
    * [[route]], which fails loudly on a dangling id) rather than on
    * [[current]], which silently reads None for a dangling id. */
  def activeId(spark: SparkSession): Option[String] = currentId(spark)

  def begin(lake: LakeCatalog, id: String = ""): String = {
    val spark = sessionOf(lake.spark)
    current(spark).foreach(t => throw new IllegalStateException(
      s"transaction ${t.txnId} is already active in this session — commit " +
        "or roll it back first (nested transactions are not supported)"))
    val txn = lake.beginTransaction(id)
    active.put(txn.txnId, txn)
    spark.conf.set(ConfKey, txn.txnId)
    txn.txnId
  }

  def commit(spark: SparkSession): Unit = {
    val txn = current(spark).getOrElse(throw new IllegalStateException(
      "no active transaction in this session (CALL begin_transaction first)"))
    try txn.commit()
    finally clear(spark, txn.txnId)
  }

  def rollback(spark: SparkSession): Unit = {
    val txn = current(spark).getOrElse(throw new IllegalStateException(
      "no active transaction in this session (CALL begin_transaction first)"))
    try txn.rollback()
    finally clear(spark, txn.txnId)
  }

  private def clear(spark0: SparkSession, id: String): Unit = {
    active.remove(id)
    try sessionOf(spark0).conf.unset(ConfKey) catch { case _: Exception => () }
  }

  /** WRITE routing: the staged [[TxnTable]] for `ident` when this session
    * has an active transaction (enlists the table on first use).
    *
    * A conf that names a transaction NOT live in this process (the JVM
    * that began it died, or the id leaked across sessions) fails LOUDLY:
    * silently falling through to main would break the all-or-nothing
    * contract the user believes they are inside. Reads ([[readBranch]])
    * stay permissive — reading main is always safe. */
  def route(spark: SparkSession, ident: String): Option[TxnTable] =
    currentId(spark).map { id =>
      Option(active.get(id)).getOrElse(throw new IllegalStateException(
        s"this session names transaction $id (${ConfKey}) but it is not " +
          "live in this process — the writer that began it completed or " +
          "died (its staged branches recover via CALL " +
          "recover_transactions / fence TTL). Unset the conf or CALL " +
          "begin_transaction() to start fresh")).table(ident)
    }

  /** READ routing: the staged branch for `ident` iff the active
    * transaction has WRITTEN it (read-your-writes); None otherwise, so
    * untouched tables keep reading main. `location` guards against a
    * same-named table in a different catalog resolving the enlisted
    * table's branch (which does not exist on it). */
  def readBranch(spark: SparkSession, ident: String,
                 location: Option[String] = None): Option[String] =
    current(spark).flatMap(_.stagedBranchFor(ident, location))

  /** Session conf opting SQL-transaction reads into REPEATABLE READ:
    * while true, the first in-transaction read of each UNTOUCHED table
    * pins its snapshot, and later reads re-use the pin — a foreign commit
    * mid-transaction stays invisible until COMMIT/ROLLBACK. Default
    * (false) keeps the documented per-table live-main visibility. */
  val RepeatableReadKey = "spark.graft.txn.repeatable-read"

  /** REPEATABLE-READ pin for a read of `table` as `ident`: the snapshot
    * id its first in-transaction read observed (0 = table was empty —
    * resolves to the empty pre-snapshot state), or None when no
    * transaction is active, the conf is off, or the transaction has
    * WRITTEN this table (read-your-writes on the staged branch wins —
    * the one case a transaction legitimately sees state newer than its
    * pins). Pins are location-keyed, so two catalogs' same-named tables
    * pin independently. Writes are NOT pinned: a staged write forks from
    * live main and the commit-time fork-point check keeps the published
    * result serializable (documented at [[SqlTransactions]]). */
  def readPin(table: LakeTable, ident: String): Option[Long] = {
    val spark = sessionOf(table.spark)
    current(spark) match {
      case Some(txn) if spark.conf.getOption(RepeatableReadKey).contains("true") &&
          txn.stagedBranchFor(ident, Some(table.location)).isEmpty =>
        Some(txn.pinForRead(table.location,
          table.meta.currentSnapshot.map(_.snapshotId).getOrElse(0L)))
      case _ => None
    }
  }
}
