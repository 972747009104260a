package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asof join matches the greatest right ts <= left ts per key") {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("k", "ts", "id")
    val quotes = Seq((1L, 90L), (1L, 100L), (1L, 200L), (2L, 60L))
      .toDF("k", "ts")
    val out = AsofJoin.asofJoin(trades, quotes, "k", "ts")
      .orderBy("k", "ts").collect()
    // t1@100: quote@100 matches (tie inclusive); t2@205 → quote@200;
    // t3@50: no quote <= 50 → null
    assert(out(0).getAs[Long]("asof_ts") === 100L)
    assert(out(1).getAs[Long]("asof_ts") === 200L)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_ts")))
    // left payload columns survive
    assert(out.map(_.getAs[String]("id")).toSeq === Seq("t1", "t2", "t3"))
  }

  test("tiled asof join matches the untiled operator, including across tile boundaries") {
    import spark.implicits._
    // skewed key 1 (many rows), sparse key 2; tileSpan 100 cuts boundaries
    // at 100/200/300 — quote@95 must carry into tiles with no local quote
    val rnd = new scala.util.Random(7)
    val trades = ((1 to 400).map(i => (1L, rnd.nextInt(1000).toLong, s"a$i")) ++
      Seq((2L, 55L, "b1"), (2L, 990L, "b2"))).toDF("k", "ts", "id")
    val quotes = (Seq((1L, 95L), (1L, 350L), (1L, 351L), (2L, 60L)) ++
      (1 to 50).map(_ => (1L, rnd.nextInt(1000).toLong))).toDF("k", "ts")
    val base = AsofJoin.asofJoin(trades, quotes, "k", "ts")
      .groupBy("k", "ts", "id").agg(max("asof_ts").as("asof_ts")) // dedupe equal rows
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val tiled = AsofJoin.asofJoinTiled(trades, quotes, "k", "ts", tileSpan = 100L)
      .groupBy("k", "ts", "id").agg(max("asof_ts").as("asof_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(tiled === base,
      s"missing=${base -- tiled}\nextra=${tiled -- base}")
    // the local window partitions by (key, tile), not bare key
    val plan = AsofJoin.asofJoinTiled(trades, quotes, "k", "ts", tileSpan = 100L)
      .queryExecution.analyzed.toString
    assert(plan.contains("_tile"), plan)
  }

  test("plans as one shuffle + window, not a range join") {
    import spark.implicits._
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "id")
    val r = Seq((1L, 5L)).toDF("k", "ts")
    val plan = AsofJoin.asofJoin(l, r, "k", "ts").queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan) // union+window, no join operator
  }
}
