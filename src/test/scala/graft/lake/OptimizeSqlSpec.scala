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
      val w0 = s.sql("OPTIMIZE opt.db.t WHERE id > 1000").collect() // matches nothing
      assert(files.map(_.path).toSet === untouched,
        "a no-match predicate must rewrite nothing")
      assert(w0(0).getLong(0) === 0L, s"no-match WHERE metrics: ${w0.toSeq}")

      // WHERE with matches: the predicate path commits
      // 'where-rewritten-files' — the metrics row must surface it (r17)
      val w1 = s.sql("OPTIMIZE opt.db.t WHERE id <= 6").collect()
      assert(w1.length === 1 && w1(0).getLong(0) >= 1L,
        s"matching WHERE must report rewritten_files > 0: ${w1.toSeq}")
      assert(s.sql("SELECT COUNT(*) FROM opt.db.t").head.getLong(0) === 12L)

      // WHERE predicate containing the literal 'ZORDER BY' in a string:
      // backtracking keeps the whole literal in the WHERE capture (the
      // column-list group can't swallow the closing quote), and the r17
      // parse-time parseExpression validation guarantees any mis-cut
      // capture fails LOUDLY instead of silently mis-scoping. Here the
      // predicate parses whole and matches nothing → no-op.
      val zt = files.map(_.path).toSet
      val wz = s.sql("OPTIMIZE opt.db.t WHERE v = 'has ZORDER BY inside'").collect()
      assert(wz(0).getLong(0) === 0L && files.map(_.path).toSet === zt,
        "string-literal ZORDER BY must stay inside the WHERE predicate")

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

      // parse-level (r17): a backticked ZORDER name containing commas is
      // ONE column (backtick-aware tokenizer, not a raw comma split)…
      val p = s.sessionState.sqlParser
      val zp = graft.lake.dsv2.GraftSqlParser.parseOptimizeDdl(
        "OPTIMIZE opt.db.t ZORDER BY (`a,b`, c)", p).get
        .asInstanceOf[graft.lake.dsv2.OptimizeTableCommand]
      assert(zp.zorderBy === Seq("a,b", "c"))
      // …and a WHERE capture the regex mis-cut fails loudly at parse time
      val bad = intercept[Exception](graft.lake.dsv2.GraftSqlParser
        .parseOptimizeDdl("OPTIMIZE opt.db.t WHERE id > ZORDER BY c", p))
      assert(bad.getMessage.contains("failed to parse"), bad.getMessage)
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
