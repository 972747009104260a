package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.{col, datediff, lit, max, min, to_date, unix_micros}
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key over up to 4 numeric/temporal columns:
  * each value is normalized into 16 bits against its column's [min, max]
  * and the bits are interleaved, so sorting by the key co-locates rows
  * that are close in EVERY dimension — a sorted compaction by this key
  * gives file min/max bounds that prune range queries on any of the
  * participating columns, not just the leading one (the Delta
  * OPTIMIZE ZORDER / Iceberg multi-dim sort use case).
  *
  * Write-path only (compaction), so CodegenFallback is fine — the cost
  * is the rewrite's shuffle, not this expression.
  */
case class ZOrderKey(inputs: Seq[Expression], los: Seq[Double], his: Seq[Double])
    extends Expression with CodegenFallback {

  require(inputs.nonEmpty && inputs.size <= 4, "zorder supports 1-4 columns")
  require(los.size == inputs.size && his.size == inputs.size)

  override def children: Seq[Expression] = inputs
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = inputs.map(_.dataType).filterNot {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder columns must be numeric/date/timestamp, got ${bad.map(_.simpleString).mkString(",")}")
  }

  private def toDouble(v: Any): Double = v match {
    case null => Double.NaN
    case b: Byte => b.toDouble
    case s: Short => s.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case f: Float => f.toDouble
    case d: Double => d
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  override def eval(input: InternalRow): Any = {
    var out = 0L
    var c = 0
    while (c < inputs.size) {
      val v = toDouble(inputs(c).eval(input))
      val lo = los(c); val hi = his(c)
      // nulls/NaN sort first; degenerate range → 0
      val scaled =
        if (v.isNaN || hi <= lo) 0
        else math.min(65535, math.max(0, ((v - lo) / (hi - lo) * 65535.0).toInt))
      var b = 0
      while (b < 16) {
        if ((scaled & (1 << b)) != 0) out |= 1L << (b * inputs.size + c)
        b += 1
      }
      c += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(inputs = newChildren)
}

object ZOrder {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Z-order key Column for `df` over `cols`: column bounds come from one
    * 1-row min/max aggregate (a documented, tiny driver fetch — the same
    * planning-time statistics any clustering rewrite needs). */
  def zorderKey(df: DataFrame, cols: Seq[String]): Column = {
    // DATE has no direct cast to DOUBLE in Spark — go through epoch days;
    // TIMESTAMP goes through epoch micros (exact, and z-order only needs
    // per-column rank order, which any monotone mapping preserves)
    def numeric(c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType =>
        datediff(col(c), to_date(lit("1970-01-01"))).cast("double")
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp")).cast("double")
      case _ => col(c).cast("double")
    }
    val aggs = cols.flatMap(c => Seq(
      min(numeric(c)).as(s"_lo_$c"), max(numeric(c)).as(s"_hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val los = cols.indices.map(i => Option(r.get(i * 2)).map(_.asInstanceOf[Double]).getOrElse(0.0))
    val his = cols.indices.map(i => Option(r.get(i * 2 + 1)).map(_.asInstanceOf[Double]).getOrElse(0.0))
    ColumnBridge.column(ZOrderKey(
      cols.map(c => ColumnBridge.expression(numeric(c))), los, his))
  }
}
