package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bin-bucketed containment join matches the naive BETWEEN join, pairs exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // negative coordinates exercise floor-division binning (-1/50 must
    // bin to -1, not 0 — truncating division would double-count bin 0)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong - 500L))
      .toDF("pt_id", "x")
    // spans from sub-bin to several bins wide (binWidth 50 below)
    val intervals = (1 to 40).map { i =>
      val s = rnd.nextInt(900).toLong - 500L
      (i.toLong, s, s + rnd.nextInt(180).toLong)
    }.toDF("iv_id", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", binWidth = 50L)
      .select("pt_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pt_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq === naive.sorted.toSeq,
      "same multiset — every qualifying pair exactly once, none duplicated across bins")
  }

  test("plans as a hash equi-join on the bin, not a nested-loop range join") {
    import spark.implicits._
    val p = Seq((1L, 10L)).toDF("pt_id", "x")
    val iv = Seq((1L, 5L, 15L)).toDF("iv_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(p, "x", iv, "lo", "hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
