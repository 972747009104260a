package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fingerprints(text, k, w)` → sorted distinct winnowed
  * fingerprints of a document as `array<string>`;
  * `winnow_fingerprints_long(text, k, w)` → the same fingerprints as
  * `array<bigint>` (`asLong = true`).
  *
  * The winnowing scheme (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
  * fingerprinting algorithm): normalize (keep ASCII alphanumerics,
  * lowercase), hash every k-char gram, slide a window of w consecutive
  * gram hashes and select each window's minimum (ties → rightmost
  * position). Guarantees: any substring match of length ≥ w + k − 1
  * between two documents yields at least one shared fingerprint, and no
  * match shorter than k is ever detected; expected density is 2/(w+1).
  *
  * Two hash schemes, selected by the `rolling` flag:
  *  - md5 (default, `rolling = false`): gram hash = first 8 hex chars of
  *    md5(gram). Engine-portable — DuckDB's `substr(md5(s),1,8)` produces
  *    the identical string and lexicographic MIN agrees, so the full
  *    selection is oracle-checkable (q64). O(n·k) digest work per doc.
  *  - Karp-Rabin (`rolling = true`): 32-bit polynomial rolling hash,
  *    O(1) per position / O(n) per doc — the 100 TB hot path. Same
  *    selection algorithm, hashes formatted as 8 hex chars so the output
  *    contract (and lexicographic-vs-unsigned order agreement) is
  *    unchanged. Not SQL-expressible; spec-gated against the same
  *    selection reference instead.
  *
  * Both schemes' hashes live in 32 bits, so the whole selection runs on
  * plain longs (r18): gram hashes are the md5's first 4 bytes (or the
  * Karp-Rabin value) as an unsigned 32-bit value in a long, and because
  * fixed-width lowercase-hex is byte-order-preserving, numeric order on
  * those longs IS the lexicographic order of the 8-hex strings — the
  * deque comparisons and the MIN/dedup/sort semantics are identical, the
  * strings are only materialized (if at all) for the winners.
  * `asLong = true` skips even that and emits the longs, which narrows
  * q64's explode + window + join key from a 16-byte UTF8String payload to
  * 8 fixed bytes with no string hashing anywhere in the pair pipeline;
  * numeric sort of the output array ≡ lexicographic sort of the hex form,
  * element for element.
  *
  * Selection runs in one pass with a monotonic deque (pop `>=` on push,
  * so surviving front = rightmost window minimum), so a doc costs
  * O(grams), not O(grams × w). Fingerprints per doc are deduplicated and
  * sorted, making downstream explode+equi-join deterministic.
  *
  * Fewer than w grams after normalization → empty array (no full
  * window; matches the oracle's `rn >= w` gate). Null text → null.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
    rolling: Boolean = false, asLong: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"winnow_fingerprints k must be >= 1, got $k")
  require(w >= 1, s"winnow_fingerprints w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires string, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(if (asLong) LongType else StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String =
    if (asLong) "winnow_fingerprints_long" else "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.eval(input.asInstanceOf[UTF8String], k, w, rolling, asLong)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  /** Keep ASCII alphanumerics, lowercase A-Z — the oracle's
    * `lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))` (strip first,
    * so lowercasing only ever sees ASCII). */
  private[functions] def normalize(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9' || c >= 'a' && c <= 'z') { out(n) = c.toByte; n += 1 }
      else if (c >= 'A' && c <= 'Z') { out(n) = (c + 32).toByte; n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** 8 lowercase-hex chars of an unsigned 32-bit value — identical to the
    * first 8 hex chars of the md5 whose first 4 bytes the value holds. */
  private def hex8(v: Long): String = {
    val cs = new Array[Char](8)
    var j = 0
    while (j < 8) {
      cs(j) = hexChars(((v >>> (28 - 4 * j)) & 0xf).toInt)
      j += 1
    }
    new String(cs)
  }

  /** Gram hashes for the whole doc as unsigned 32-bit values in longs.
    * md5 scheme: first 4 digest bytes big-endian (≡ first 8 hex chars).
    * Karp-Rabin: h_i = h_{i-1}·B + c_i − c_{i-k}·B^k over Int arithmetic
    * (mod 2^32), taken unsigned. */
  private def gramHashes(norm: Array[Byte], k: Int, rolling: Boolean): Array[Long] = {
    val m = norm.length - k + 1
    val hs = new Array[Long](m)
    if (rolling) {
      val B = 1000003
      var bk = 1 // B^k mod 2^32
      var j = 0
      while (j < k) { bk *= B; j += 1 }
      var h = 0
      j = 0
      while (j < k) { h = h * B + norm(j); j += 1 }
      var i = 0
      while (i < m) {
        hs(i) = h & 0xffffffffL
        if (i + 1 < m) h = h * B + norm(i + k) - bk * norm(i)
        i += 1
      }
    } else {
      val md = digest.get()
      var i = 0
      while (i < m) {
        md.reset()
        md.update(norm, i, k)
        val d = md.digest()
        hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        i += 1
      }
    }
    hs
  }

  /** Winnowed selection over gram hashes: positions of each w-window's
    * rightmost minimum, deduplicated. Monotonic deque: pushing pops all
    * `>=` hashes, so the front is always the window's rightmost min. */
  private[functions] def select(hs: Array[Long], w: Int): Array[Int] = {
    val m = hs.length
    if (m < w) return Array.emptyIntArray
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val picked = new java.util.LinkedHashSet[Integer]()
    var i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) picked.add(deque(head))
      i += 1
    }
    val out = new Array[Int](picked.size)
    val it = picked.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def eval(text: UTF8String, k: Int, w: Int, rolling: Boolean,
      asLong: Boolean = false): ArrayData = {
    val norm = normalize(text.toString)
    if (norm.length < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val hs = gramHashes(norm, k, rolling)
    val positions = select(hs, w)
    // values are 0..2^32-1, so plain long order ≡ unsigned ≡ hex order
    val set = new java.util.TreeSet[java.lang.Long]()
    positions.foreach(p => set.add(hs(p)))
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    if (asLong) while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    else while (it.hasNext) { out(j) = UTF8String.fromString(hex8(it.next())); j += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(text: Column, k: Int, w: Int, rolling: Boolean): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expression(text), k, w, rolling))

  /** Convenience for tests: fingerprints of a plain string. */
  def ofString(s: String, k: Int, w: Int, rolling: Boolean = false): Seq[String] = {
    val arr = eval(UTF8String.fromString(s), k, w, rolling)
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  /** Convenience for tests: long-form fingerprints of a plain string. */
  def ofStringLong(s: String, k: Int, w: Int, rolling: Boolean = false): Seq[Long] = {
    val arr = eval(UTF8String.fromString(s), k, w, rolling, asLong = true)
    (0 until arr.numElements()).map(arr.getLong(_))
  }
}
