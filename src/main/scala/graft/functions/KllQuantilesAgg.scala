package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native KLL quantile-sketch aggregate over a `double` column: returns
  * the serialized `KllDoublesSketch` (binary), the way Spark's own
  * `hll_sketch_agg` returns an HLL sketch.
  *
  * Exists because [[graft.lake.Analyze]] needs MERGEABLE value-
  * distribution stats: a KLL sketch unions losslessly within its own
  * rank-error bound (~1.65% at k=200), so incremental ANALYZE can fold
  * a churn-sized pass into the persisted sketch, and the DSv2 scan can
  * derive equi-height histogram bins for CBO range selectivity at plan
  * time — neither is possible with `approx_percentile`'s scalar output.
  * (Spark bundles datasketches-java but exposes no KLL aggregate.)
  *
  * Null inputs are skipped; the aggregate itself is non-nullable (an
  * all-null or empty group yields an EMPTY sketch, whose bytes
  * deserialize to a sketch with `isEmpty = true` — callers decide).
  */
case class KllQuantilesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles_agg requires double (cast first), got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}

object KllQuantilesAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: aggregate `col` (cast to double by the
    * caller) into a serialized KLL sketch. */
  def apply(col: Column, k: Int): Column =
    ColumnBridge.column(
      KllQuantilesAgg(ColumnBridge.expression(col), k).toAggregateExpression())

  /** Quantile read-out with the INCLUSIVE criteria both engines'
    * median/percentile functions use. */
  def quantiles(bytes: Array[Byte], ranks: Array[Double]): Array[Double] = {
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (s.isEmpty) Array.empty
    else s.getQuantiles(ranks,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
  }

  def merge(a: Array[Byte], b: Array[Byte], k: Int = 200): Array[Byte] = {
    val m = KllDoublesSketch.newHeapInstance(k)
    m.merge(KllDoublesSketch.heapify(Memory.wrap(a)))
    m.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    m.toByteArray
  }

  def isEmpty(bytes: Array[Byte]): Boolean =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).isEmpty

  def count(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}
