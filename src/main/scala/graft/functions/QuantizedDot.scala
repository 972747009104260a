package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: quantized dot product of two `array<float>`
  * columns — `Σ FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e6)` as
  * BIGINT, the oracle-parity formulation used by the vector queries
  * (float→double casts and double multiplies are IEEE-exact in both Spark
  * and DuckDB; FLOOR is exact; integer sums are order-independent).
  *
  * Why a custom Expression: the SQL twin
  * `aggregate(zip_with(a, b, (x,y) -> ...), 0L, (acc,v) -> acc+v)` runs the
  * lambda bodies through interpreted dispatch and allocates an intermediate
  * array per row — measured 42% of the whole bench on the kNN query. This
  * emits one fused loop inside whole-stage codegen, same as
  * [[CosineSimilarity]] (SURVEY.md §7 custom-vs-built-in preference (b)).
  *
  * Null semantics: null array → null; null elements contribute 0 (DuckDB's
  * SUM skips the corresponding NULL products). Squared norm = dot(a, a).
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        // (x*y)*1e6 — same association order as the SQL twin
        acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1000000.0).toLong
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: multiple occurrences in one projection (dot + norms)
      // must not collide, else the projection falls back to interpreted
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1000000.0);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDotProduct {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: `quantizedDot($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
