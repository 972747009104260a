package graft.lake

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance: the materialized aggregate must equal a
  * full recompute after EVERY refresh, across a randomized (seeded)
  * sequence of appends / deletes / keyed merges — including group death
  * and rebirth, NULL group keys, NULL measure values, and min/max
  * extremes leaving the table. */
class MaterializedAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val BaseSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("g", StringType, nullable = true),
    StructField("v", LongType, nullable = true)))

  def freshCatalog(tag: String): LakeCatalog = new LakeCatalog(spark,
    java.nio.file.Files.createTempDirectory(s"graft-ivm-$tag").toString)

  def rows(rs: (Long, String, java.lang.Long)*): DataFrame = {
    val data = rs.map { case (i, g, v) => Row(i, g, v match { case null => null; case x => x.longValue() }) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), BaseSchema)
  }

  val theAggs = Seq(
    MaterializedAgg.AggCol("count", "v", "cnt"),
    MaterializedAgg.AggCol("sum", "v", "total"),
    MaterializedAgg.AggCol("avg", "v", "avg_v"),
    MaterializedAgg.AggCol("min", "v", "lo"),
    MaterializedAgg.AggCol("max", "v", "hi"))

  /** Full recompute straight from the base table — the oracle. */
  def recompute(base: LakeTable): Set[(String, Long, Option[Long], Option[Double], Option[Long], Option[Long])] =
    base.toDF.groupBy("g")
      .agg(count(col("v")).as("cnt"), sum(col("v")).as("total"),
        avg(col("v")).as("avg_v"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map { r =>
        (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))
      }.toSet

  def viewed(mv: MaterializedAgg): Set[(String, Long, Option[Long], Option[Double], Option[Long], Option[Long])] =
    mv.read().collect().map { r =>
      (Option(r.getString(0)).getOrElse("<null>"), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toSet

  test("randomized op sequence: view equals full recompute after every refresh") {
    val cat = freshCatalog("rand")
    val base = cat.createTable("ivm.base", BaseSchema)
    val mv = MaterializedAgg.create(cat, "ivm.mv", base, Seq("g"), theAggs)
    val rnd = new scala.util.Random(42)
    val groups: Seq[String] = Seq("a", "b", "c", "d", null)
    var nextId = 0L
    var refreshes = 0
    for (step <- 0 until 30) {
      rnd.nextInt(3) match {
        case 0 => // append a small random batch
          val batch = (0 until 1 + rnd.nextInt(6)).map { _ =>
            val g = groups(rnd.nextInt(groups.size))
            val v: java.lang.Long = if (rnd.nextInt(5) == 0) null else Long.box(rnd.nextInt(100).toLong)
            nextId += 1; (nextId, g, v)
          }
          base.append(rows(batch: _*))
        case 1 => // delete: sometimes a whole group (death), sometimes a value band
          if (rnd.nextBoolean()) {
            val g = groups(rnd.nextInt(groups.size))
            base.delete(if (g == null) col("g").isNull else col("g") === g)
          } else base.delete(col("v") >= lit(rnd.nextInt(100).toLong))
        case 2 => // keyed merge: rewrite ~2 existing ids with new values
          val ids = (1L to nextId).filter(_ => rnd.nextInt(10) == 0).take(2)
          if (ids.nonEmpty) {
            val ups = ids.map { i =>
              (i, groups(rnd.nextInt(groups.size)), Long.box(rnd.nextInt(100).toLong))
            }
            base.mergeByKey("id", ids, rows(ups: _*))
          }
      }
      if (rnd.nextBoolean()) {
        mv.refresh()
        refreshes += 1
        assert(viewed(mv) === recompute(base), s"diverged after step $step")
        assert(mv.watermark === base.meta.currentSnapshot.map(_.snapshotId))
      }
    }
    mv.refresh()
    assert(viewed(mv) === recompute(base), "diverged at final refresh")
    assert(refreshes > 5, s"seed produced only $refreshes interleaved refreshes")
  }

  test("min/max regress when the extreme leaves; all-null group shows null extremes") {
    val cat = freshCatalog("minmax")
    val base = cat.createTable("ivm.base", BaseSchema)
    val mv = MaterializedAgg.create(cat, "ivm.mv", base, Seq("g"), theAggs)
    base.append(rows((1L, "a", 10L), (2L, "a", 5L), (3L, "a", 99L), (4L, "b", 7L)))
    mv.refresh()
    assert(viewed(mv) === recompute(base))
    // a's min AND max both leave in one commit
    base.delete(col("v") === 5L || col("v") === 99L)
    mv.refresh()
    val a1 = mv.read().filter(col("g") === "a").head()
    assert(a1.getLong(4) === 10L && a1.getLong(5) === 10L, "extremes must regress to 10")
    // leave group a with only NULL measures: extremes become NULL, rows survive
    base.append(rows((5L, "a", null)))
    base.delete(col("v") === 10L)
    mv.refresh()
    val a2 = mv.read().filter(col("g") === "a").head()
    assert(a2.getLong(1) === 0L && a2.isNullAt(4) && a2.isNullAt(5),
      "all-null group: cnt 0, extremes NULL")
    assert(viewed(mv) === recompute(base))
  }

  test("refresh with no base change creates no state commit; group death retires the row") {
    val cat = freshCatalog("noop")
    val base = cat.createTable("ivm.base", BaseSchema)
    val mv = MaterializedAgg.create(cat, "ivm.mv", base, Seq("g"), theAggs)
    base.append(rows((1L, "a", 1L), (2L, "b", 2L)))
    mv.refresh()
    val versions = mv.state.meta.snapshots.size
    mv.refresh() // no-op: same watermark, no commit
    assert(mv.state.meta.snapshots.size === versions)
    base.delete(col("g") === "a") // kill group a entirely
    mv.refresh()
    assert(mv.read().filter(col("g") === "a").count() === 0L, "dead group must vanish")
    assert(viewed(mv) === recompute(base))
  }

  test("base compaction is invisible: refresh advances watermark, view unchanged") {
    val cat = freshCatalog("compact")
    val base = cat.createTable("ivm.base", BaseSchema)
    val mv = MaterializedAgg.create(cat, "ivm.mv", base, Seq("g"), theAggs)
    base.append(rows((1L, "a", 1L)))
    base.append(rows((2L, "a", 2L), (3L, "b", 3L)))
    mv.refresh()
    val before = viewed(mv)
    base.rewriteDataFiles()
    mv.refresh()
    assert(viewed(mv) === before)
    assert(mv.watermark === base.meta.currentSnapshot.map(_.snapshotId))
  }

  test("load() reconstructs the view from table properties and keeps refreshing") {
    val cat = freshCatalog("load")
    val base = cat.createTable("ivm.base", BaseSchema)
    MaterializedAgg.create(cat, "ivm.mv", base, Seq("g"), theAggs)
    base.append(rows((1L, "a", 4L), (2L, "b", 6L)))
    val mv = MaterializedAgg.load(cat, "ivm.mv")
    assert(mv.groupBy === Seq("g") && mv.aggs === theAggs)
    mv.refresh()
    assert(viewed(mv) === recompute(base))
    base.append(rows((3L, "a", 8L)))
    mv.refresh()
    assert(viewed(mv) === recompute(base))
    intercept[IllegalArgumentException] { MaterializedAgg.load(cat, "ivm.base") }
  }

  // ---- star-schema views (r9): broadcast dim enrichment --------------------

  val FactSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rkey", LongType, nullable = true),
    StructField("v", LongType, nullable = true)))
  val DimSchema = StructType(Seq(
    StructField("r_key", LongType, nullable = false),
    StructField("r_name", StringType, nullable = false)))

  def factRows(rs: (Long, java.lang.Long, java.lang.Long)*): DataFrame = {
    val data = rs.map { case (i, rk, v) => Row(i,
      rk match { case null => null; case x => x.longValue() },
      v match { case null => null; case x => x.longValue() }) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), FactSchema)
  }

  /** Oracle: full fact ⋈ dim recompute, grouped by the dim attribute. */
  def starRecompute(fact: LakeTable, dim: LakeTable): Set[(String, Long, Option[Long], Option[Long])] =
    fact.toDF.join(dim.toDF, col("rkey") === col("r_key"))
      .groupBy("r_name")
      .agg(count(col("v")).as("cnt"), sum(col("v")).as("total"),
        min(col("v")).as("lo"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  def starViewed(mv: MaterializedAgg): Set[(String, Long, Option[Long], Option[Long])] =
    mv.read().collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  val starAggs = Seq(
    MaterializedAgg.AggCol("count", "v", "cnt"),
    MaterializedAgg.AggCol("sum", "v", "total"),
    MaterializedAgg.AggCol("min", "v", "lo"))

  def starTables(tag: String): (LakeCatalog, LakeTable, LakeTable) = {
    val cat = freshCatalog(tag)
    val dim = cat.createTable("ivm.region", DimSchema)
    dim.append(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "emea"), Row(2L, "apac"), Row(3L, "amer")), 1), DimSchema))
    val fact = cat.createTable("ivm.fact", FactSchema)
    (cat, dim, fact)
  }

  test("star view: group by a dim attribute tracks full recompute through fact churn") {
    val (cat, dim, fact) = starTables("star")
    val mv = MaterializedAgg.create(cat, "ivm.rev_by_region", fact,
      Seq("r_name"), starAggs,
      dims = Seq(MaterializedAgg.DimJoin("ivm.region", "rkey", "r_key")))
    // unmatched fact (rkey=99) must be dropped by the inner lookup —
    // consistently on insert AND delete
    fact.append(factRows((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 5L), (4L, 99L, 7L)))
    mv.refresh()
    assert(starViewed(mv) === starRecompute(fact, dim))
    assert(starViewed(mv).map(_._1) === Set("emea", "apac"))
    // delete the current min of group emea → rescan path through the dim
    fact.delete(col("id") === 1L)
    // and churn the unmatched row too
    fact.delete(col("id") === 4L)
    mv.refresh()
    assert(starViewed(mv) === starRecompute(fact, dim))
    // group death and rebirth
    fact.delete(col("id") === 3L)
    fact.append(factRows((5L, 3L, 42L)))
    mv.refresh()
    assert(starViewed(mv) === starRecompute(fact, dim))
    assert(starViewed(mv).map(_._1) === Set("emea", "amer"))
  }

  test("star view: dim change is refused until rebuild(); rebuild reflects new dim") {
    val (cat, dim, fact) = starTables("dimchange")
    val mv = MaterializedAgg.create(cat, "ivm.rev_by_region", fact,
      Seq("r_name"), starAggs,
      dims = Seq(MaterializedAgg.DimJoin("ivm.region", "rkey", "r_key")))
    fact.append(factRows((1L, 1L, 10L), (2L, 2L, 20L)))
    mv.refresh()
    assert(starViewed(mv) === starRecompute(fact, dim))
    // dimension mutates (a region is renamed): deltas are now unsound
    dim.mergeByKeys("r_key", dim.toDF.filter(col("r_key") === 1L).select("r_key"),
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(Row(1L, "europe")), 1), DimSchema))
    fact.append(factRows((3L, 1L, 30L)))
    val e = intercept[IllegalStateException] { mv.refresh() }
    assert(e.getMessage.contains("rebuild"))
    // the pre-change state is intact (refusal, not corruption)
    assert(starViewed(mv).map(_._1) === Set("emea", "apac"))
    val fresh = mv.rebuild()
    assert(starViewed(fresh) === starRecompute(fact, dim))
    assert(starViewed(fresh).map(_._1) === Set("europe", "apac"))
    // and the rebuilt view keeps refreshing incrementally
    fact.append(factRows((4L, 3L, 40L)))
    fresh.refresh()
    assert(starViewed(fresh) === starRecompute(fact, dim))
  }

  test("star view: load() restores the dim spec and the snapshot guard") {
    val (cat, dim, fact) = starTables("starload")
    MaterializedAgg.create(cat, "ivm.rev_by_region", fact,
      Seq("r_name"), starAggs,
      dims = Seq(MaterializedAgg.DimJoin("ivm.region", "rkey", "r_key")))
    fact.append(factRows((1L, 1L, 10L), (2L, 3L, 20L)))
    val mv = MaterializedAgg.load(cat, "ivm.rev_by_region")
    mv.refresh()
    assert(starViewed(mv) === starRecompute(fact, dim))
    dim.append(spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(4L, "lunar")), 1), DimSchema))
    intercept[IllegalStateException] { mv.refresh() }
  }

  test("star view: colliding dim column names are rejected at create") {
    val (cat, _, fact) = starTables("collide")
    val bad = cat.createTable("ivm.baddim", StructType(Seq(
      StructField("r_key", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))) // collides with fact.v
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.create(cat, "ivm.mv2", fact, Seq("r_key"),
        Seq(MaterializedAgg.AggCol("count", "id", "cnt")),
        dims = Seq(MaterializedAgg.DimJoin("ivm.baddim", "rkey", "r_key")))
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
