package graft.lake

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Delta's `OPTIMIZE t [WHERE pred] [ZORDER BY (…)]` DDL spelling over
  * the existing rewrite machinery ([[LakeTable.binPack]] /
  * [[LakeTable.rewriteDataFiles]]): bare = small-file binpack, WHERE =
  * predicate-scoped rewrite (untouched files provably unrewritten),
  * ZORDER BY = clustering rewrite; metrics row returned like Delta's. */
class OptimizeSqlSpec extends AnyFunSuite {

  test("OPTIMIZE: bare binpacks, WHERE scopes, ZORDER clusters; rows survive") {
    val wh = Files.createTempDirectory("graft-optimize").toString
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .create()
    try {
      s.conf.set("spark.sql.catalog.opt", classOf[graft.lake.dsv2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.opt.warehouse", wh)
      s.sql("CREATE DATABASE IF NOT EXISTS opt.db")
      s.sql("CREATE TABLE opt.db.t (id BIGINT, v STRING)")
      (1 to 6).foreach(i =>
        s.sql(s"INSERT INTO opt.db.t VALUES ($i, 'v$i'), (${i + 100}, 'w$i')"))
      val cat = new LakeCatalog(s, wh)
      def files = cat.loadTable("db.t").meta.currentSnapshot.get.files

      val before = files.size
      assert(before >= 6)
      val m = s.sql("OPTIMIZE opt.db.t").collect()
      assert(m.length === 1 && m(0).getLong(0) >= 2L && m(0).getLong(1) >= 1L,
        s"metrics row: ${m.toSeq}")
      assert(files.size < before, "binpack must have merged small files")
      assert(s.sql("SELECT COUNT(*) FROM opt.db.t").head.getLong(0) === 12L)

      // WHERE: only may-match files rewritten — others byte-identical
      val untouched = files.filter(_.path.nonEmpty).map(_.path).toSet
      s.sql("OPTIMIZE opt.db.t WHERE id > 1000") // matches nothing
      assert(files.map(_.path).toSet === untouched,
        "a no-match predicate must rewrite nothing")

      // ZORDER BY: a clustering rewrite commits and keeps every row
      val z = s.sql("OPTIMIZE opt.db.t ZORDER BY (id)").collect()
      assert(z(0).getLong(0) >= 1L)
      assert(cat.loadTable("db.t").meta.currentSnapshot.get
        .summary.get("zorder").contains("id"))
      assert(s.sql("SELECT COUNT(*) FROM opt.db.t").head.getLong(0) === 12L)
      assert(s.sql("SELECT MIN(id), MAX(id) FROM opt.db.t").head.toSeq === Seq(1L, 106L))

      // non-graft ident: loud, named failure
      val e = intercept[Exception](s.sql("OPTIMIZE spark_catalog.default.x"))
      assert(e.getMessage.contains("graft"))
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
