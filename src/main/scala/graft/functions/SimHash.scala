package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash32(array<string>)` → 32-bit SimHash of a token set as BIGINT.
  *
  * Bit semantics replicate the SQL/oracle formulation exactly so the
  * result is hash-comparable with DuckDB: per token, md5 hex is decoded
  * digit-by-digit (`POSITION(ch IN '0123456789abcdef') - 1`), bit `i`
  * of the signature reads bit `i % 4` of hex digit `i / 4` (the first 8
  * hex chars → 32 bits); each token votes ±1 per position and the sign
  * (>= 0 → 1) forms the signature, packed little-endian (bit i → 2^i).
  *
  * Why a custom Expression: the SQL twin explodes docs × tokens × 32
  * vote rows through a join and two aggregations (~19M rows at sf0.1,
  * 1.8 s); this is one per-row loop — the query becomes a fused
  * projection plus one tiny aggregate on the 32-bit signature space.
  * CodegenFallback: the body is JVM-compiled digest work with no
  * expression-dispatch overhead for codegen to remove.
  *
  * Null array → null; null tokens are skipped.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32.eval(input.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def eval(tokens: ArrayData): Long = {
    val votes = new Array[Int](32)
    val md = digest.get()
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        val h = md.digest(tokens.getUTF8String(t).getBytes)
        // first 8 hex chars = first 4 digest bytes, high nibble first
        var bit = 0
        while (bit < 32) {
          val b = h(bit / 8) & 0xff
          // hex char index bit/4: even → high nibble, odd → low nibble
          val digit = if ((bit / 4) % 2 == 0) b >> 4 else b & 0xf
          val v = (digit >> (bit % 4)) & 1
          votes(bit) += (if (v == 1) 1 else -1)
          bit += 1
        }
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 32) {
      if (votes(i) >= 0) sim |= 1L << i
      i += 1
    }
    sim
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokens)))

  /** Convenience for tests: simhash of a plain Scala token seq. */
  def ofTokens(tokens: Seq[String]): Long =
    eval(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      tokens.map(UTF8String.fromString).toArray))
}
