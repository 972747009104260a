package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid for an
  * `array<float>` vector against a fixed centroid matrix — the IVF
  * list-assignment step.
  *
  * `metric`: "cosine" (argmax cosine — IVF/SemDedup, which rank by
  * cosine) or "l2" (argmin squared Euclidean — product quantization,
  * whose codeword must be nearest in the subspace's MAGNITUDE too: a
  * cosine-nearest codeword can differ arbitrarily in norm from the
  * subvector, degrading ADC; Jégou et al. 2011 define PQ over L2).
  *
  * Why a custom Expression: the composable form
  * `greatest(struct(cos(v,c0),-0), struct(cos(v,c1),-1), …)` builds an
  * nlist-branch expression tree whose generated code grows past janino's
  * comfortable method sizes — at nlist=32 the k-means build went from
  * 5 s to 70 s on codegen compilation alone. This is ONE loop over a
  * `float[][]` reference object: generated code size is constant in
  * nlist, and each k-means iteration swaps the matrix without growing
  * the plan.
  *
  * Per-pair cosine accumulates (dot, |v|², |c|²) in the same IEEE order
  * as [[CosineSimilarity]], so assignments match the tree form exactly;
  * ties pick the lowest list id (as `greatest(struct(d, -i))` did).
  * Null array → null; null elements contribute 0; zero-norm pairs score
  * below every real cosine (never selected unless all are degenerate).
  *
  * Centroids are held as `Seq[Seq[Float]]` — a VALUE-equal type — so two
  * identically-built expressions are `semanticEquals` and Catalyst's CSE /
  * plan-cache matching work; an `Array[Array[Float]]` constructor param
  * would give reference equality and defeat canonicalization. The
  * `float[][]` needed by eval/codegen is derived lazily and excluded from
  * equality.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Float]],
                           metric: String = "cosine")
    extends UnaryExpression {

  @transient private lazy val matrix: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (metric == "cosine" || metric == "l2") TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid metric must be 'cosine' or 'l2', got $metric")
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any =
    if (metric == "l2") NearestCentroid.nearestL2(input.asInstanceOf[ArrayData], matrix)
    else NearestCentroid.nearest(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("centroids", matrix, "float[][]")
      val n = ctx.freshName("n"); val l = ctx.freshName("l")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val m = ctx.freshName("m"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nc = ctx.freshName("nc")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom"); val cos = ctx.freshName("cos")
      val best = ctx.freshName("best"); val bestI = ctx.freshName("bestI")
      // score = cosine, or negated squared-L2 (argmax either way; L2
      // accumulates the same (dot, |v|², |c|²) terms — ||v-c||² =
      // |v|² - 2·dot + |c|² — so both metrics share one fused loop)
      val score =
        if (metric == "l2") s"-($na - 2.0 * $dot + $nc)"
        else s"($denom == 0.0) ? -2.0 : $dot / $denom"
      s"""
         |int $n = $a.numElements();
         |double $best = java.lang.Double.NEGATIVE_INFINITY; int $bestI = 0;
         |for (int $l = 0; $l < $cRef.length; $l++) {
         |  float[] $c = $cRef[$l];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0, $na = 0.0, $nc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $x = $a.isNullAt($j) ? 0.0 : (double) $a.getFloat($j);
         |    double $y = (double) $c[$j];
         |    $dot += $x * $y; $na += $x * $x; $nc += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nc);
         |  double $cos = $score;
         |  if ($cos > $best) { $best = $cos; $bestI = $l; }
         |}
         |${ev.value} = $bestI;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  def nearest(v: ArrayData, cs: Array[Array[Float]]): Int = {
    val n = v.numElements()
    var best = -2.0; var bestI = 0; var l = 0
    while (l < cs.length) {
      val c = cs(l)
      val m = math.min(n, c.length)
      var dot = 0.0; var na = 0.0; var nc = 0.0; var j = 0
      while (j < m) {
        val x = if (v.isNullAt(j)) 0.0 else v.getFloat(j).toDouble
        val y = c(j).toDouble
        dot += x * y; na += x * x; nc += y * y
        j += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nc)
      val cos = if (denom == 0.0) -2.0 else dot / denom
      if (cos > best) { best = cos; bestI = l }
      l += 1
    }
    bestI
  }

  /** Argmin squared-L2 (PQ codeword assignment): same accumulated terms,
    * ||v-c||² = |v|² - 2·dot + |c|², compared negated so ties and argmax
    * flow match the cosine path. */
  def nearestL2(v: ArrayData, cs: Array[Array[Float]]): Int = {
    val n = v.numElements()
    var best = Double.NegativeInfinity; var bestI = 0; var l = 0
    while (l < cs.length) {
      val c = cs(l)
      val m = math.min(n, c.length)
      var dot = 0.0; var na = 0.0; var nc = 0.0; var j = 0
      while (j < m) {
        val x = if (v.isNullAt(j)) 0.0 else v.getFloat(j).toDouble
        val y = c(j).toDouble
        dot += x * y; na += x * x; nc += y * y
        j += 1
      }
      val score = -(na - 2.0 * dot + nc)
      if (score > best) { best = score; bestI = l }
      l += 1
    }
    bestI
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry points (two arities — a default here would clash
    * with the case-class apply's own defaults). */
  def apply(vec: Column, centroids: Seq[Seq[Float]]): Column =
    apply(vec, centroids, "cosine")
  def apply(vec: Column, centroids: Seq[Seq[Float]], metric: String): Column =
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(vec), centroids.map(_.toVector).toVector, metric))
}
