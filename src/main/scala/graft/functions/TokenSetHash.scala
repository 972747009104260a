package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the SORTED DISTINCT xxhash64 token set of a text
  * column — semantically identical to
  * {{{ sort_array(array_distinct(transform(split(text, '\\s+'), w -> xxhash64(w)))) }}}
  * (the word-set representation every exact-Jaccard stage keys on), in
  * ONE pass per row.
  *
  * Why native, besides the four-operator chain it fuses (regex split →
  * per-element lambda → hash-set distinct → sort, each allocating an
  * intermediate array): higher-order functions carry [[org.apache.spark
  * .sql.catalyst.expressions.NamedLambdaVariable]]s whose ids defeat plan
  * canonicalization, so two occurrences of the HOF form never compare
  * equal and exchange reuse between the two sides of a self-join cannot
  * fire. This expression canonicalizes like any unary function.
  *
  * Exactness contract (oracle-checked end-to-end by q22's brute-force
  * PlanSpec gate and the DuckDB hash match): `String.split("\\s+", -1)`
  * reproduces Spark SQL `split` including kept leading/trailing empties
  * (same approach as [[WordShingles]]), and [[XXH64.hashUTF8String]] with
  * seed 42 IS what Spark's `xxhash64` evaluates for strings. */
case class TokenSetHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_hash requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set_hash"

  override def nullSafeEval(input: Any): Any =
    TokenSetHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = TokenSetHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetHash {
  /** One byte-level pass: tokens are the gaps between maximal ASCII
    * whitespace runs (EXACTLY `String.split("\\s+", -1)` — Java `\s`
    * without the UNICODE flag is the six ASCII chars, and UTF-8
    * continuation bytes are ≥ 0x80, so a byte scan is exact); each token
    * is hashed IN PLACE from the original buffer (seed 42 = Spark's
    * xxhash64 over the same bytes), then sort + in-place dedupe. Zero
    * per-token allocation. */
  def compute(text: UTF8String): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    var hs = new Array[Long](16)
    var cnt = 0
    def add(h: Long): Unit = {
      if (cnt == hs.length) hs = java.util.Arrays.copyOf(hs, cnt * 2)
      hs(cnt) = h; cnt += 1
    }
    def isWs(i: Int): Boolean = {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      b == 32 || (b >= 9 && b <= 13)
    }
    var i = 0
    var segStart = 0
    while (i < n) {
      if (isWs(i)) {
        add(XXH64.hashUnsafeBytes(base, off + segStart, i - segStart, 42L))
        while (i < n && isWs(i)) i += 1
        segStart = i
      } else i += 1
    }
    add(XXH64.hashUnsafeBytes(base, off + segStart, n - segStart, 42L))
    java.util.Arrays.sort(hs, 0, cnt)
    var w = 0
    i = 0
    while (i < cnt) {
      if (w == 0 || hs(w - 1) != hs(i)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry point: `TokenSetHash.of(col("text"))`. */
  def of(c: Column): Column =
    ColumnBridge.column(TokenSetHash(ColumnBridge.expression(c)))
}
