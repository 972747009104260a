package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator: the k=4 salted-md5 MinHash signature of a text
  * column in ONE pass — zero or one output row per document, columns
  * `h1..h4`.
  *
  * Exactly mirrors the composable SQL pipeline it replaces (TextOps
  * q20/q21):
  * {{{
  *   WITH g AS (SELECT doc_id, word_shingles(text, n) AS sh FROM documents)
  *   SELECT doc_id, MIN(md5('1' || sh)) AS h1, MIN(md5('2' || sh)) AS h2,
  *          MIN(md5('3' || sh)) AS h3, MIN(md5('4' || sh)) AS h4
  *   FROM g GROUP BY doc_id
  * }}}
  * including [[WordShingles]]' exact shingle contract (split("\s+", -1)
  * with trailing empties kept; texts with < n words emit the raw text as
  * their single shingle; a NULL text emits no row — the GROUP BY form
  * drops those doc_ids, so the generator emits zero rows to match).
  *
  * Hex-min ≡ digest-min: Spark's md5() returns the lowercase hex of the
  * 16-byte digest, and hex encoding is byte-wise order-preserving
  * (each byte maps to two hex chars whose lexicographic order equals the
  * unsigned byte order), so the minimum over hex STRINGS equals the
  * minimum over raw digests compared as unsigned byte arrays. The
  * generator therefore tracks four 16-byte minima and hex-encodes only
  * the four winners — the SQL form materialized one UTF8String shingle
  * row, four concat'd salted strings, and four 32-char hex strings PER
  * SHINGLE, then paid a hash-partitioned group-by to MIN them; here the
  * whole signature is one streaming pass per row with no shuffle at all
  * (the 4 md5 digests per shingle are the irreducible work). Generators
  * run inside GenerateExec, so CodegenFallback costs only the generator
  * call itself.
  */
case class MinHashSig(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string column, got ${other.simpleString}")
  }

  override def elementSchema: StructType =
    StructType((1 to MinHashSig.K).map(i => StructField(s"h$i", StringType)))

  // one digest per task (expressions are deserialized per task, never
  // shared across threads); digest() leaves the instance reset for reuse
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val text = raw.asInstanceOf[UTF8String].toString
      // limit -1 matches Spark SQL split(): trailing empties are kept
      val words = text.split("\\s+", -1)
      val mins = new Array[Array[Byte]](MinHashSig.K)
      def takeMin(s: Int): Unit = {
        val d = md5.digest()
        if (mins(s) == null || MinHashSig.ltUnsigned(d, mins(s))) mins(s) = d
      }
      if (words.length >= n) {
        // r18 (refines the r17 word-by-word feed — its 2n small update()
        // calls per salted shingle cost more than they saved): join the
        // words ONCE into a byte buffer with single 0x20 separators —
        // exactly the UTF-8 of every joined shingle string — so shingle i
        // is the contiguous slice [start(i), start(i+n−1)+len(i+n−1))
        // and each salted digest costs TWO update calls (salt, slice).
        val m = words.length
        val wb = new Array[Array[Byte]](m)
        var total = 0
        var i = 0
        while (i < m) {
          wb(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          total += wb(i).length
          i += 1
        }
        val buf = new Array[Byte](total + m - 1)
        val start = new Array[Int](m)
        var off = 0
        i = 0
        while (i < m) {
          if (i > 0) { buf(off) = ' '; off += 1 }
          start(i) = off
          System.arraycopy(wb(i), 0, buf, off, wb(i).length)
          off += wb(i).length
          i += 1
        }
        i = 0
        val last = m - n
        while (i <= last) {
          val from = start(i)
          val len = start(i + n - 1) + wb(i + n - 1).length - from
          var s = 0
          while (s < MinHashSig.K) {
            md5.update(MinHashSig.Salts(s))
            md5.update(buf, from, len)
            takeMin(s)
            s += 1
          }
          i += 1
        }
      } else {
        // short-text fallback: the raw text, once
        val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var s = 0
        while (s < MinHashSig.K) {
          md5.update(MinHashSig.Salts(s)); md5.update(tb); takeMin(s); s += 1
        }
      }
      Iterator.single(InternalRow.fromSeq(
        mins.toIndexedSeq.map(d => UTF8String.fromString(MinHashSig.hex(d)))))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Signature width; salts '1'..'4' mirror the SQL md5('1' || sh) form. */
  val K = 4
  private val Salts: Array[Byte] = Array('1', '2', '3', '4').map(_.toByte)

  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) & 0xf0) >>> 4)
      out(2 * i + 1) = HexDigits(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }
}
