package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: sign-random-projection LSH bucket of an
  * `array<float>` embedding — `planes` sign bits packed into a long.
  *
  * Hyperplane component (plane p, dim i) is a deterministic splitmix64-
  * derived uniform in [-1, 1): no RNG state, identical across executors,
  * runs, and replays. `seed` gives *independent* hyperplane sets per hash
  * table — two tables only widen recall if their collision events are
  * independent, which requires distinct planes, not a shared projection.
  *
  * Why native (SURVEY.md §7 preference (b)): the composable form walks the
  * vector through interpreted `aggregate(zip_with(...))` lambdas once per
  * plane (planes× array walks, per row). This is one fused loop in
  * whole-stage codegen: a single vector pass accumulating all plane
  * projections.
  */
case class SrpBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1,63], got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "srp_bucket"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = x.getFloat(i).toDouble
        var p = 0
        while (p < planes) {
          proj(p) += v * SrpBucket.component(seed, p, i)
          p += 1
        }
      }
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = SrpBucket.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // fresh names: one projection holds an SrpBucket per hash table —
      // fixed local names would collide and demote it to interpreted mode
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val v = ctx.freshName("v")
      val proj = ctx.freshName("proj"); val bits = ctx.freshName("bits")
      s"""
         |int $n = $a.numElements();
         |double[] $proj = new double[$planes];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = (double) $a.getFloat($i);
         |    for (int $p = 0; $p < $planes; $p++) {
         |      $proj[$p] += $v * $cls.component(${seed}L, $p, $i);
         |    }
         |  }
         |}
         |long $bits = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  if ($proj[$p] >= 0.0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucket {
  /** splitmix64 finalizer over (seed, plane, dim) → uniform double in
    * [-1, 1). Public/static so generated code can call it. */
  def component(seed: Long, plane: Int, dim: Int): Double = {
    var z = seed * 0x9E3779B97F4A7C15L + plane.toLong * 0xBF58476D1CE4E5B9L +
      dim.toLong * 0x94D049BB133111EBL + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    // top 53 bits → [0,1), scale to [-1,1)
    ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def apply(vec: Column, planes: Int, seed: Long): Column =
    ColumnBridge.column(SrpBucket(ColumnBridge.expression(vec), planes, seed))
}
