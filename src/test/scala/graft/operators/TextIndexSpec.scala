package graft.operators

import graft.lake.{LakeCatalog, LakeTable}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Persistent BM25 inverted index ([[TextIndex]]): the invariant under
  * test everywhere is *index answer ≡ from-scratch BM25 over the live
  * corpus* — after create, after incremental churn (append / update /
  * delete / null-text), and across the crash window between the two
  * refresh commits. Scoring parity is BIT-exact (fixed-point integers),
  * so one stale posting, one wrong corpus constant, or one double-counted
  * delta breaks a test. */
class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-tidx").toString)

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Deterministic doc text: 3..12 vocab words keyed by id (repeats
    * common — tf matters), every doc distinct. */
  private def text(id: Long): String = {
    val n = 3 + (id * 7 % 10).toInt
    (0 until n).map(j => vocab(((id * 2654435761L + j * 13) % vocab.size).toInt.abs))
      .mkString(" ")
  }

  private def docsDf(ids: Seq[Long]): DataFrame = {
    val rows = ids.map(i => Row(i, text(i)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))
  }

  private def mkBase(cat: LakeCatalog, ids: Seq[Long]): LakeTable = {
    val t = cat.createTable("tx.base", StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))))
    t.append(docsDf(ids))
    t
  }

  /** From-scratch fixed-point BM25 over the LIVE base — q66's exact
    * arithmetic, query terms injected. The ground truth every index
    * answer must equal bit-for-bit. */
  private def expectedBm25(base: LakeTable, queries: Seq[(Int, String)],
                           k: Int): Seq[Row] = {
    base.toDF.createOrReplaceTempView("tx_corpus")
    val qvals = queries.map { case (q, w) => s"($q,'$w')" }.mkString(", ")
    spark.sql(s"""WITH tok AS (
      |  SELECT doc_id, explode(split(lower(text), '\\\\s+')) AS w FROM tx_corpus),
      |lens AS (SELECT doc_id, COUNT(*) AS len_d FROM tok GROUP BY doc_id),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
      |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |               CAST(SUM(len_d) AS BIGINT) AS total_len FROM lens),
      |q AS (SELECT qid, w FROM VALUES $qvals AS t(qid, w)),
      |hit AS (
      |  SELECT q.qid, tf.doc_id,
      |    (((n_docs - df.df) * 1000000) DIV (df.df + 1)) AS idf_fp,
      |    ((11 * tf.tf * 1000000 * 1000000) DIV
      |      ((5 * 1000000 * tf.tf) +
      |       6 * (250000 + ((3 * 1000000 * lens.len_d * n_docs) DIV (4 * total_len))))) AS tf_fp
      |  FROM q JOIN tf ON q.w = tf.w JOIN df ON q.w = df.w
      |    JOIN lens ON tf.doc_id = lens.doc_id CROSS JOIN tot),
      |sc AS (SELECT qid, doc_id, SUM((idf_fp * tf_fp) DIV 1000000) AS score
      |       FROM hit GROUP BY qid, doc_id),
      |r AS (SELECT qid, doc_id, score,
      |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
      |      FROM sc)
      |SELECT CAST(qid AS BIGINT) AS qid, doc_id, CAST(score AS BIGINT) AS score,
      |  CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin).collect().toSeq
  }

  private val queries = Seq((1, "alpha"), (1, "kappa"), (2, "gamma"),
    (2, "zeta"), (3, "theta"))

  test("create + search == from-scratch fixed-point BM25 (bit parity)") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 200L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 8)
    val got = idx.search(queries, k = 5).collect().toSeq
    val want = expectedBm25(base, queries, 5)
    assert(got === want)
    // corpus constants match a direct recount
    val (n, tl) = idx.corpusStats
    assert(n === 200L)
    val directLen = base.toDF
      .select(explode(split(lower(col("text")), "\\s+"))).count()
    assert(tl === directLen)
  }

  test("incremental refresh (append + update + delete + to-null) == fresh index") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 120L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 8)
    // churn: 40 new docs, 20 rewritten (different text), 10 deleted,
    // 5 updated to NULL text (must leave the index entirely)
    base.append(docsDf(200L until 240L))
    val rewrite = (0L until 20L).map(i => Row(i, text(i + 1000)))
    base.mergeByKeys("doc_id",
      spark.createDataFrame((0L until 20L).map(Tuple1(_))).toDF("doc_id"),
      spark.createDataFrame(java.util.Arrays.asList(rewrite: _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType)))))
    base.delete(col("doc_id").between(30, 39))
    val toNull: Seq[Row] = (50L until 55L).map(i => Row(i, null))
    base.mergeByKeys("doc_id",
      spark.createDataFrame((50L until 55L).map(Tuple1(_))).toDF("doc_id"),
      spark.createDataFrame(java.util.Arrays.asList(toNull: _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType, nullable = true)))))
    assert(idx.refresh() === base.meta.currentSnapshot.map(_.snapshotId))

    val fresh = TextIndex.create(cat, "tx.tidx2", base, nBuckets = 8)
    assert(idx.corpusStats === fresh.corpusStats)
    assert(idx.search(queries, 10).collect().toSeq ===
      fresh.search(queries, 10).collect().toSeq)
    // and both equal ground truth
    assert(idx.search(queries, 10).collect().toSeq ===
      expectedBm25(base, queries, 10))
    // postings content identical row-for-row
    def rows(t: LakeTable) = t.toDF.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows(idx.state) === rows(fresh.state))
    // null-text docs are OUT: no postings, not counted
    assert(idx.state.toDF.filter(col("doc_id").between(50, 54)).count() === 0)
    assert(idx.docsTable.toDF.filter(col("doc_id").between(50, 54)).count() === 0)
  }

  test("crash window between the two refresh commits: retry converges, " +
    "constants never double-count") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 60L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 8)
    base.append(docsDf(100L until 130L))
    base.delete(col("doc_id") < 10)
    val head = base.meta.currentSnapshot.get.snapshotId
    // simulate: docs step committed, then crash before the postings step
    idx.refreshDocsStep(head)
    assert(idx.docsWatermark === Some(head))
    assert(idx.watermark !== Some(head)) // postings still behind
    val statsAfterCrash = idx.corpusStats
    // the docs step is fenced: re-driving it must not re-apply deltas
    idx.refreshDocsStep(head)
    assert(idx.corpusStats === statsAfterCrash)
    // retry of the FULL refresh completes the postings half only
    assert(idx.refresh() === Some(head))
    assert(idx.corpusStats === statsAfterCrash)
    // converged state == fresh index, bit-for-bit
    val fresh = TextIndex.create(cat, "tx.tidx2", base, nBuckets = 8)
    assert(idx.corpusStats === fresh.corpusStats)
    assert(idx.search(queries, 10).collect().toSeq ===
      fresh.search(queries, 10).collect().toSeq)
    // ...and more base churn AFTER the crash-repair still lands right
    base.append(docsDf(300L until 320L))
    idx.refresh()
    assert(idx.search(queries, 10).collect().toSeq ===
      expectedBm25(base, queries, 10))
  }

  test("search scans only the query terms' buckets (partition pruning)") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 300L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 8)
    val all = idx.state.toDF.inputFiles.length
    val one = idx.state.read(filter = Some(col("term") === "alpha"))
      .inputFiles.length
    assert(all >= 4, s"expected several postings files (per-bucket layout), got $all")
    assert(one < all,
      s"single-term read must scan fewer files than the full index ($one vs $all)")
    // pruned read still answers exactly
    assert(idx.search(Seq((1, "alpha")), 5).collect().toSeq ===
      expectedBm25(base, Seq((1, "alpha")), 5))
  }

  test("SQL surface: CALL create/refresh_text_index maintain the index " +
    "through the procedure catalog") {
    val wh = Files.createTempDirectory("graft-tidx-sql").toString
    spark.conf.set("spark.sql.catalog.txc", classOf[graft.lake.dsv2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.txc.warehouse", wh)
    org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
    val cat = new LakeCatalog(spark, wh)
    val base = mkBase(cat, 0L until 100L)
    spark.sql("CALL txc.system.create_text_index('tx.tidx_sql', 'tx.base', " +
      "n_buckets => 8)")
    val idx = TextIndex.load(cat, "tx.tidx_sql")
    assert(idx.search(queries, 5).collect().toSeq === expectedBm25(base, queries, 5))
    base.append(docsDf(100L until 160L))
    spark.sql("CALL txc.system.refresh_text_index('tx.tidx_sql')")
    assert(idx.watermark === base.meta.currentSnapshot.map(_.snapshotId))
    assert(idx.search(queries, 5).collect().toSeq === expectedBm25(base, queries, 5))
    // the `indexes` metadata table is reachable through the SQL suffix
    // surface like every other kind
    val row = spark.sql("SELECT kind, fresh FROM txc.tx.base.`indexes`").collect()
    assert(row.length === 1 && row.head.getString(0) === "text"
      && row.head.getBoolean(1))
    // CALL search: ';'-separated query groups expand to the Scala
    // search's (qid, term) pairs — the view is bit-identical to it
    spark.sql("CALL txc.system.search_text_index('tx.tidx_sql', " +
      "'alpha kappa; gamma zeta; theta', k => 5)")
    assert(spark.table("tx_tidx_sql_search").collect().toSeq ===
      idx.search(queries, 5).collect().toSeq)
    // covered-column round trip through SQL: include_cols at create,
    // a SQL predicate at search — bit-identical to the Scala filter
    val fSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType),
      StructField("lab", StringType)))
    val fBase = cat.createTable("tx.fbase_sql", fSchema)
    fBase.append(spark.createDataFrame(java.util.Arrays.asList(
      (0L until 100L).map(i =>
        Row(i, text(i), if (i % 3 == 0) "de" else "en")): _*), fSchema))
    spark.sql("CALL txc.system.create_text_index('tx.ftidx_sql', " +
      "'tx.fbase_sql', n_buckets => 8, include_cols => 'lab')")
    val fIdx = TextIndex.load(cat, "tx.ftidx_sql")
    assert(fIdx.includeCols === Seq("lab"))
    spark.sql("CALL txc.system.search_text_index('tx.ftidx_sql', " +
      "'alpha kappa; gamma zeta; theta', k => 5, filter => 'lab = \\'de\\'')")
    assert(spark.table("tx_ftidx_sql_search").collect().toSeq ===
      fIdx.search(queries, 5, Some(col("lab") === "de")).collect().toSeq)
  }

  test("windowed refresh (to a mid snapshot, then head) == one-shot; a " +
    ">1024-doc churn takes the semi-join previous-length path") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 100L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 8)
    // 1500 changed ids — above the exact-IN cap, so the previous-length
    // lookup must take the docs-table semi-join and still delta right
    base.append(docsDf(1000L until 2500L))
    val mid = base.meta.currentSnapshot.get.snapshotId
    base.delete(col("doc_id") < 20)
    assert(idx.refresh(Some(mid)) === Some(mid))
    assert(idx.watermark === Some(mid))
    idx.refresh()
    val fresh = TextIndex.create(cat, "tx.tidx2", base, nBuckets = 8)
    assert(idx.corpusStats === fresh.corpusStats)
    assert(idx.search(queries, 10).collect().toSeq ===
      fresh.search(queries, 10).collect().toSeq)
  }

  test("corpus constants survive a maintenance-only retention window: " +
    "expiry that strands the pins falls back to one docs aggregate") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 80L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 4)
    val pinned = idx.corpusStats
    // a compaction commit carries no pins; expiring everything older
    // leaves ONLY that commit — the summary walk finds nothing
    idx.docsTable.rewriteDataFiles()
    idx.docsTable.expireSnapshots(System.currentTimeMillis() + 1000, retainLast = 1)
    val m = idx.docsTable.meta
    assert(m.snapshots.size === 1 &&
      !m.currentSnapshot.get.summary.contains("graft.tindex.n-docs"),
      "test premise: the retained snapshot must be pin-less")
    // fallback recomputes the same constants; search still bit-exact
    assert(idx.corpusStats === pinned)
    assert(idx.search(queries, 5).collect().toSeq ===
      expectedBm25(base, queries, 5))
    // the next refresh re-pins
    base.append(docsDf(80L until 90L))
    idx.refresh()
    assert(idx.docsTable.meta.currentSnapshot.get.summary
      .contains("graft.tindex.n-docs"))
  }

  test("`indexes` metadata table: registered indexes list with freshness " +
    "against the base head") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 60L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 4)
    def listing() = graft.lake.MetadataTables(cat.loadTable("tx.base"), "indexes")
      .collect().map(r => (r.getString(2), r.getBoolean(5),
        r.getMap[String, String](6)))
    val fresh = listing()
    assert(fresh.length === 1)
    assert(fresh.head._1 === "text" && fresh.head._2 === true)
    assert(fresh.head._3.get("n_docs").contains("60"))
    // base churn without refresh: the listing flags the index stale
    base.append(docsDf(60L until 70L))
    val stale = listing()
    assert(stale.head._2 === false, "index must list as stale after churn")
    idx.refresh()
    assert(listing().head._2 === true)
  }

  test("ingest-cadence routing: refreshRegisteredIndexes catches a " +
    "registered text index up to the base head") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 50L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 4)
    base.append(docsDf(50L until 80L))
    graft.streaming.Changelog.refreshRegisteredIndexes(base)
    val reloaded = TextIndex.load(cat, "tx.tidx")
    assert(reloaded.watermark === base.meta.currentSnapshot.map(_.snapshotId))
    assert(reloaded.search(queries, 5).collect().toSeq ===
      expectedBm25(base, queries, 5))
    // drop clears the routing registration and both tables
    TextIndex.drop(cat, "tx.tidx")
    assert(!base.meta.properties.contains("graft.tindex.indexes"))
    assert(!cat.tableExists("tx.tidx") && !cat.tableExists("tx.tidx_docs"))
  }

  test("a row-empty changelog window (compaction-only base commit) still " +
    "pins the watermark on merge-on-read index tables") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 60L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 4)
    // the configuration the class scaladoc prescribes for high churn
    idx.state.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    idx.docsTable.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    base.rewriteDataFiles() // logical no-op: the changelog window is row-empty
    val head = base.meta.currentSnapshot.map(_.snapshotId)
    assert(idx.refresh() === head)
    assert(idx.watermark === head,
      "an empty window must still commit the watermark pin")
    assert(idx.docsWatermark === head)
    // the freshness signal keys off the same pin, and answers stay exact
    val row = graft.lake.MetadataTables(cat.loadTable("tx.base"), "indexes")
      .collect()
    assert(row.length === 1 && row.head.getBoolean(5),
      "the `indexes` listing must report the index fresh, not permanently stale")
    assert(idx.search(queries, 5).collect().toSeq ===
      expectedBm25(base, queries, 5))
  }

  test("a drained corpus (every doc deleted) searches to an empty result " +
    "set, like the from-scratch engine on an empty corpus") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 30L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 4)
    base.delete(lit(true))
    idx.refresh()
    assert(idx.corpusStats === ((0L, 0L)))
    val got = idx.search(queries, 5)
    assert(got.columns.toSeq === Seq("qid", "doc_id", "score", "rk"))
    assert(got.collect().isEmpty)
  }

  test("a search inside the two-commit refresh window reads the constants " +
    "pinned at the POSTINGS watermark — old postings, old constants") {
    val cat = freshCatalog()
    val base = mkBase(cat, 0L until 60L)
    val idx = TextIndex.create(cat, "tx.tidx", base, nBuckets = 4)
    val want = idx.search(queries, 5).collect().toSeq
    // churn that changes the corpus constants, then the docs half only
    // (docs+constants committed, postings not — the reader-visible window)
    base.append(docsDf(100L until 160L))
    base.delete(col("doc_id") < 10)
    idx.refreshDocsStep(base.meta.currentSnapshot.get.snapshotId)
    assert(idx.docsWatermark !== idx.watermark, "test premise: torn window")
    // internally consistent: identical to the answer BEFORE the docs
    // commit (old postings scored with old constants), never a transient
    // mix of new n_docs/total_len over old postings
    assert(idx.search(queries, 5).collect().toSeq === want)
    // completing the refresh converges to the live corpus
    idx.refresh()
    assert(idx.search(queries, 5).collect().toSeq ===
      expectedBm25(base, queries, 5))
  }

  test("filtered search over a covered column: global scoring statistics, " +
    "candidates restricted, covered values maintained through churn and " +
    "pinned across the two-commit window") {
    val cat = freshCatalog()
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType),
      StructField("lab", StringType)))
    def df(ids: Seq[Long], lab: Long => String = i => if (i % 3 == 0) "de" else "en") =
      spark.createDataFrame(java.util.Arrays.asList(
        ids.map(i => Row(i, text(i), lab(i))): _*), schema)
    val base = cat.createTable("tx.fbase", schema)
    base.append(df(0L until 150L))
    val idx = TextIndex.create(cat, "tx.ftidx", base, nBuckets = 8,
      includeCols = Seq("lab"))
    // Lucene/ES filter semantics: a doc's score is IDENTICAL filtered or
    // not (df + constants global), so truth = the full ranking restricted
    // to allowed docs, rank renumbered as the subsequence position
    def expectFiltered(allowed: Long => Boolean, k: Int): Seq[Row] =
      expectedBm25(base, queries, 10000)
        .filter(r => allowed(r.getLong(1)))
        .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .flatMap { case (_, rows) =>
          rows.sortBy(_.getLong(3)).take(k).zipWithIndex.map { case (r, i) =>
            Row(r.getLong(0), r.getLong(1), r.getLong(2), (i + 1).toLong) }
        }
    val pred = col("lab") === "de"
    assert(idx.search(queries, 5, filter = Some(pred)).collect().toSeq ===
      expectFiltered(_ % 3 == 0, 5))
    // churn: new docs, some labels flipped, some deleted — refresh must
    // carry the covered values (a stale label mis-filters silently)
    base.append(df(200L until 260L))
    base.mergeByKey("doc_id", (0L until 12L).map(Long.box),
      df(0L until 12L, _ => "de"))
    base.delete(col("doc_id").between(60, 80))
    idx.refresh()
    def live(i: Long) = (i < 12 || i % 3 == 0) && !(i >= 60 && i <= 80)
    assert(idx.search(queries, 5, filter = Some(pred)).collect().toSeq ===
      expectFiltered(live, 5))
    // torn two-commit window: labels flip in the base, docs half commits,
    // postings half doesn't — the filter must read the DOCS SNAPSHOT
    // pinned at the postings watermark (old labels with old postings),
    // not the docs head (new labels over old postings)
    val before = idx.search(queries, 5, filter = Some(pred)).collect().toSeq
    base.mergeByKey("doc_id", (0L until 150L).filter(live).map(Long.box),
      df((0L until 150L).filter(live), _ => "en"))
    idx.refreshDocsStep(base.meta.currentSnapshot.get.snapshotId)
    assert(idx.docsWatermark !== idx.watermark, "test premise: torn window")
    assert(idx.search(queries, 5, filter = Some(pred)).collect().toSeq === before)
    // completing the refresh serves the new labels
    idx.refresh()
    assert(idx.search(queries, 5, filter = Some(pred)).collect().toSeq ===
      expectFiltered(i => i >= 200 && i % 3 == 0, 5))
    // reload from the catalog round-trips the covered-column spec
    assert(TextIndex.load(cat, "tx.ftidx").includeCols === Seq("lab"))
  }
}
