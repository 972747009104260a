package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the FIRST COMMON element of the
  * J ≥ 0.9 prefix windows of two SORTED, duplicate-free `array<bigint>`
  * columns — one merge walk over the two prefixes, zero allocation.
  * Prefix length is the AllPairs bound p(n) = n − ceil(0.9·n) + 1,
  * computed as `n - (9*n + 9) / 10 + 1` in integer arithmetic (identical
  * to the SQL form `n - CAST(FLOOR((n*9 + 9) / 10.0) AS INT) + 1` for
  * every n a 64-element array can have).
  *
  * Replaces q22's emit-once filter term
  * {{{
  *   element_at(array_intersect(slice(wa, 1, pa), slice(wb, 1, pb)), 1)
  * }}}
  * which allocated two sliced arrays and a per-row hash set on EVERY
  * candidate pair of the prefix join — the hottest filter of the
  * Jaccard-pair pipeline. Because both arrays are sorted ascending, the
  * first element of `array_intersect(a_prefix, b_prefix)` (a-ordered) is
  * simply the smallest common element, which the merge walk finds
  * directly. Returns NULL when the prefixes share nothing (the caller's
  * `tok === first_common` filter then rejects the row, exactly as the
  * old form would — though by construction a candidate pair always
  * shares its join token).
  *
  * Null semantics: null array → null; null ELEMENTS are not expected
  * (xxhash64 token hashes) and are skipped like [[SortedIntersectCount]].
  */
case class FirstCommonPrefixToken(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_common_prefix_token requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "first_common_prefix_token"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    // clamp to the array length: for n = 0 the bound evaluates to 1 and
    // the walk would read element 0 of an empty array (r17 advice); for
    // every n >= 1 the bound is already <= n, so the clamp is a no-op
    val px = (nx - (9 * nx + 9) / 10 + 1).min(nx)
    val py = (ny - (9 * ny + 9) / 10 + 1).min(ny)
    var i = 0; var j = 0
    while (i < px && j < py) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) return xv
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val px = ctx.freshName("px"); val py = ctx.freshName("py")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val found = ctx.freshName("found")
      s"""
         |int $px = $a.numElements();
         |$px = java.lang.Math.min($px - (9 * $px + 9) / 10 + 1, $px);
         |int $py = $b.numElements();
         |$py = java.lang.Math.min($py - (9 * $py + 9) / 10 + 1, $py);
         |int $i = 0, $j = 0; boolean $found = false;
         |while (!$found && $i < $px && $j < $py) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    long $xv = $a.getLong($i), $yv = $b.getLong($j);
         |    if ($xv == $yv) { ${ev.value} = $xv; $found = true; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.isNull} = !$found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FirstCommonPrefixToken {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point. */
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(FirstCommonPrefixToken(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
