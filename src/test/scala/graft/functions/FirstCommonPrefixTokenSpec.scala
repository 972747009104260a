package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[FirstCommonPrefixToken]] must equal the expression chain it replaces
  * in q22's emit-once filter (r17):
  * {{{
  *   element_at(array_intersect(
  *     slice(wa, 1, na - CAST(FLOOR((na*9+9)/10.0) AS INT) + 1),
  *     slice(wb, 1, nb - CAST(FLOOR((nb*9+9)/10.0) AS INT) + 1)), 1)
  * }}}
  * over sorted duplicate-free long arrays (null when the prefixes are
  * disjoint — try_element_at semantics). The q22/q58 oracles key on which
  * candidate rows survive this filter, so "close" is failure. */
class FirstCommonPrefixTokenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def prefixLen(c: org.apache.spark.sql.Column) =
    size(c) - floor((size(c) * 9 + 9) / 10.0).cast("int") + 1

  private def chainForm =
    try_element_at(array_intersect(
      slice(col("wa"), lit(1), prefixLen(col("wa"))),
      slice(col("wb"), lit(1), prefixLen(col("wb")))), lit(1))

  test("equals the slice+intersect chain on random sorted arrays") {
    val rnd = new scala.util.Random(17)
    def arr(): Seq[Long] = {
      val n = rnd.nextInt(40)
      Seq.fill(n)(rnd.nextInt(60).toLong).distinct.sorted
    }
    val rows = Seq.tabulate(2000)(_ => (arr(), arr()))
    import spark.implicits._
    val df = rows.toDF("wa", "wb")
      .select(FirstCommonPrefixToken.of(col("wa"), col("wb")).as("fused"),
        chainForm.as("chain"))
    val bad = df.filter(not(col("fused") <=> col("chain"))).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("edge shapes: empty, singleton, disjoint, identical") {
    import spark.implicits._
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L, 3L)),
      (Seq(5L, 6L), Seq.empty[Long]),
      (Seq(1L), Seq(1L)),
      (Seq(1L), Seq(2L)),
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(1L, 2L, 3L, 4L, 5L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      ((1L to 100L), (50L to 150L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, 1L)))
    val df = cases.toDF("wa", "wb")
      .select(FirstCommonPrefixToken.of(col("wa"), col("wb")).as("fused"),
        chainForm.as("chain"))
    val bad = df.filter(not(col("fused") <=> col("chain"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    // na=6 → prefix 1 elem [3]; nb=3 → prefix 1 elem [3] → common = 3
    val wa = Seq(3L, 7L, 9L, 20L, 30L, 31L)
    val wb = Seq(3L, 9L, 40L)
    val df = Seq((wa, wb)).toDF("wa", "wb")
    val viaCodegen = df
      .select(FirstCommonPrefixToken.of(col("wa"), col("wb"))).head.getLong(0)
    val e = FirstCommonPrefixToken(
      org.apache.spark.sql.catalyst.expressions.Literal.create(wa,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(wb,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) === viaCodegen)
    assert(viaCodegen === 3L)
  }

  test("empty input arrays return null on the interpreted path (r18 clamp — " +
      "the unclamped bound read element 0 of a zero-length array)") {
    def lit(xs: Seq[Long]) = org.apache.spark.sql.catalyst.expressions.Literal.create(
      xs, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    assert(FirstCommonPrefixToken(lit(Seq.empty), lit(Seq.empty)).eval(null) == null)
    assert(FirstCommonPrefixToken(lit(Seq.empty), lit(Seq(1L, 2L))).eval(null) == null)
    assert(FirstCommonPrefixToken(lit(Seq(1L, 2L)), lit(Seq.empty)).eval(null) == null)
  }
}
