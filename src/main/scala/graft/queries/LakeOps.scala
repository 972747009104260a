package graft.queries

import graft.QuerySpec
import graft.QuerySpec._
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentHashMap

/** Oracle-gated lake-layer queries: ingest driver testdata into real lake
  * tables through the DSv2 SQL surface, run the notebook-style operations
  * (INSERT SELECT / DELETE FROM / VERSION AS OF), and compare the result
  * against DuckDB over the ORIGINAL parquet — so the table format, the
  * catalog, CoW DML and time travel are verified by the same exact-hash
  * gate as the relational queries, not just by ScalaTest.
  *
  * Setup is memoized per (session, sfDir): the lake warehouse is built
  * once (deterministic content), queries then only read/rebuild what the
  * scenario needs, so repeated bench runs measure steady-state reads.
  */
object LakeOps {

  private case class Env(warehouse: String, firstRegionSnapshot: Long)
  private val envs = new ConcurrentHashMap[String, Env]()

  private def ensure(s: SparkSession, dir: String): Env = {
    val key = System.identityHashCode(s) + "|" + dir
    envs.computeIfAbsent(key, { _ =>
      graft.Tables.registerAll(s, dir)
      val wh = java.nio.file.Files.createTempDirectory("graft-lakeops").toString
      s.conf.set("spark.sql.catalog.lake", "graft.lake.dsv2.GraftCatalog")
      s.conf.set("spark.sql.catalog.lake.warehouse", wh)
      s.sql("CREATE DATABASE IF NOT EXISTS lake.ops")
      // q31: nation round-trip (INSERT INTO ... SELECT — D13)
      s.sql("""CREATE TABLE lake.ops.nation
              |  (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)""".stripMargin)
      s.sql("INSERT INTO lake.ops.nation SELECT n_nationkey, n_name, n_regionkey FROM nation")
      // q32: supplier copy, then SQL DELETE (CoW / metadata-only paths)
      s.sql("""CREATE TABLE lake.ops.supplier
              |  (s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, s_acctbal DOUBLE)""".stripMargin)
      s.sql("INSERT INTO lake.ops.supplier SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")
      s.sql("DELETE FROM lake.ops.supplier WHERE s_nationkey < 10")
      // q33: region in two commits; remember the first snapshot for AS OF
      s.sql("CREATE TABLE lake.ops.region (r_regionkey BIGINT, r_name STRING)")
      s.sql("INSERT INTO lake.ops.region SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2")
      val cat = new graft.lake.LakeCatalog(s, wh)
      val snap1 = cat.loadTable("ops.region").meta.currentSnapshot.get.snapshotId
      s.sql("INSERT INTO lake.ops.region SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 2")
      Env(wh, snap1)
    })
  }

  /** Parquet → lake table (SQL INSERT SELECT) → aggregate read through the
    * catalog; oracle aggregates the original parquet directly. */
  val q31 = plan("q31_lake_roundtrip",
    fn = (s, dir) => {
      ensure(s, dir)
      s.sql("""SELECT n_regionkey, COUNT(*) AS n,
              |  MIN(n_name) AS first_name, MAX(n_nationkey) AS max_key
              |FROM lake.ops.nation
              |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    },
    duckSql = """SELECT n_regionkey, COUNT(*) AS n,
      |  MIN(n_name) AS first_name, MAX(n_nationkey) AS max_key
      |FROM nation
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)

  /** SQL DELETE FROM applied to the lake copy; oracle filters the rows the
    * delete would have removed. */
  val q32 = plan("q32_lake_delete",
    fn = (s, dir) => {
      ensure(s, dir)
      s.sql("""SELECT s_nationkey, COUNT(*) AS n,
              |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
              |FROM lake.ops.supplier
              |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    },
    duckSql = """SELECT s_nationkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM supplier WHERE s_nationkey >= 10
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)

  /** SQL time travel: VERSION AS OF the first commit sees only batch 1;
    * oracle recomputes batch 1 from the original parquet. */
  val q33 = plan("q33_lake_timetravel",
    fn = (s, dir) => {
      val env = ensure(s, dir)
      s.sql(s"""SELECT r_regionkey, r_name
               |FROM lake.ops.region VERSION AS OF ${env.firstRegionSnapshot}
               |ORDER BY r_regionkey""".stripMargin)
    },
    duckSql = """SELECT r_regionkey, r_name FROM region
      |WHERE r_regionkey < 2 ORDER BY r_regionkey""".stripMargin)

  def specs: Seq[QuerySpec] = Seq(q31, q32, q33)
}
