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
  * keep reading main. `commit_transaction` publishes everywhere or
  * aborts with the protocol's conflict error; `rollback_transaction`
  * discards. A session crash without either leaves the staged branches
  * for `CALL recover_transactions()` / fence-TTL self-healing — exactly
  * the Scala API's story, because it IS the Scala API.
  */
object SqlTransactions {

  /** Session conf carrying the active SQL transaction's id. */
  val ConfKey = "spark.graft.txn.id"

  private val active = new ConcurrentHashMap[String, LakeTransaction]()

  private def currentId(spark: SparkSession): Option[String] =
    try spark.conf.getOption(ConfKey).filter(_.nonEmpty)
    catch { case _: Exception => None }

  /** The active transaction, if the session names one that is still live. */
  def current(spark: SparkSession): Option[LakeTransaction] =
    currentId(spark).flatMap(id => Option(active.get(id)))

  def begin(lake: LakeCatalog, id: String = ""): String = {
    val spark = lake.spark
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

  private def clear(spark: SparkSession, id: String): Unit = {
    active.remove(id)
    try spark.conf.unset(ConfKey) catch { case _: Exception => () }
  }

  /** WRITE routing: the staged [[TxnTable]] for `ident` when this session
    * has an active transaction (enlists the table on first use). */
  def route(spark: SparkSession, ident: String): Option[TxnTable] =
    current(spark).map(_.table(ident))

  /** READ routing: the staged branch for `ident` iff the active
    * transaction has WRITTEN it (read-your-writes); None otherwise, so
    * untouched tables keep reading main. */
  def readBranch(spark: SparkSession, ident: String): Option[String] =
    current(spark).flatMap(_.stagedBranchFor(ident))
}
