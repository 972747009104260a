package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expression: EXACT integer k-means assignment — the
  * nearest centroid (squared-L2 over `array<bigint>` fixed-point vectors)
  * plus its exact distance, returned as
  * `struct<cluster_id: int, dist_q: bigint>`.
  *
  * Exists because [[graft.operators.Clustering]]'s Lloyd iterations must
  * be bit-reproducible against a relational oracle: float accumulation is
  * order-dependent, so the operator quantizes vectors to integers once and
  * every subsequent distance/argmin is exact 64-bit arithmetic with a
  * deterministic tie-break (lowest cluster id). [[NearestCentroid]] (the
  * float cosine/L2 twin used by IVF/PQ) cannot provide that guarantee.
  *
  * Same codegen shape as [[NearestCentroid]]: ONE loop over a `long[][]`
  * reference object, so generated code size is constant in k and each
  * Lloyd iteration swaps the matrix without growing the plan. Null array
  * → null; null elements count as 0; a vector shorter than the centroid
  * treats missing dims as 0 (both sides iterate max(len)). The DuckDB
  * oracle mirrors the null-ELEMENT zero-fill with `COALESCE(q, 0)` over
  * an inner join on the dim index — NOT a full outer join — so a
  * zero-length vector has no long-format rows there at all; see
  * `VectorOps.kmeansOracle` for the documented empty-vector asymmetry.
  *
  * Centroids are held as `Seq[Seq[Long]]` (value equality) so identical
  * expressions are `semanticEquals` — see NearestCentroid's note on CSE.
  */
case class NearestCentroidInt(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (centroids.nonEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("nearest_centroid_int requires ≥1 centroid")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_int requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster_id", IntegerType, nullable = false),
    StructField("dist_q", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_centroid_int"

  override def nullSafeEval(input: Any): Any = {
    val (i, d) = NearestCentroidInt.nearest(input.asInstanceOf[ArrayData], matrix)
    new GenericInternalRow(Array[Any](i, d))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("centroids", matrix, "long[][]")
      val n = ctx.freshName("n"); val l = ctx.freshName("l")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val m = ctx.freshName("m"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestI = ctx.freshName("bestI")
      val rowCls = classOf[GenericInternalRow].getName
      s"""
         |int $n = $a.numElements();
         |long $best = java.lang.Long.MAX_VALUE; int $bestI = 0;
         |for (int $l = 0; $l < $cRef.length; $l++) {
         |  long[] $c = $cRef[$l];
         |  int $m = java.lang.Math.max($n, $c.length);
         |  long $d = 0L;
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $x = ($j < $n && !$a.isNullAt($j)) ? $a.getLong($j) : 0L;
         |    long $diff = $x - ($j < $c.length ? $c[$j] : 0L);
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $best) { $best = $d; $bestI = $l; }
         |}
         |${ev.value} = new $rowCls(new Object[] {
         |  java.lang.Integer.valueOf($bestI), java.lang.Long.valueOf($best) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidInt {

  /** (argmin index, exact squared-L2); ties pick the lowest index
    * (strict `<` while scanning in index order). */
  def nearest(v: ArrayData, cs: Array[Array[Long]]): (Int, Long) = {
    val n = v.numElements()
    var best = Long.MaxValue; var bestI = 0; var l = 0
    while (l < cs.length) {
      val c = cs(l)
      val m = math.max(n, c.length)
      var d = 0L; var j = 0
      while (j < m) {
        val x = if (j < n && !v.isNullAt(j)) v.getLong(j) else 0L
        val diff = x - (if (j < c.length) c(j) else 0L)
        d += diff * diff
        j += 1
      }
      if (d < best) { best = d; bestI = l }
      l += 1
    }
    (bestI, best)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(vec: Column, centroids: Seq[Seq[Long]]): Column =
    ColumnBridge.column(NearestCentroidInt(
      ColumnBridge.expression(vec), centroids.map(_.toVector).toVector))
}
