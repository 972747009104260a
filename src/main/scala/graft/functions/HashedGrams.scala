package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator: the hashed n-gram BUCKET stream of a text column —
  * one output row per n-gram, column `bucket` = the first 3 hex digits of
  * md5(gram) as a BIGINT (4096 buckets, [[graft.operators.Dsir]]'s
  * cross-engine hash idiom).
  *
  * Exactly mirrors the composable HOF form it replaces
  * ([[graft.operators.Dsir.bucketCountsHof]]):
  * {{{
  *   toks  = filter(split(lower(text), "\\s+"), t => length(t) > 0)
  *   feats = n == 1 ? toks
  *         : size(toks) >= n
  *             ? transform(sequence(0, size-n), i -> array_join(slice(toks,i+1,n), " "))
  *             : array()
  *   conv(substring(md5(explode(feats)), 1, 3), 16, 10) :: long
  * }}}
  * i.e. lowercased whitespace tokens with empty split artifacts dropped
  * BEFORE gram construction, grams = n adjacent tokens joined by one
  * space, docs shorter than n tokens contribute nothing (NO short-text
  * fallback — that is [[WordShingles]]' contract, kept separate because
  * q20/q70's oracles depend on it).
  *
  * Why native, and why emit the bucket instead of the gram: the HOF form
  * walks interpreted lambdas per gram and materializes three arrays per
  * row (tokens, filtered tokens, joined grams), then runs md5 → substring
  * → conv → cast as four more expressions over an exploded row stream at
  * n× the corpus token count. Here the whole pipeline is one pass per row
  * emitting a bare long — no per-gram UTF8String, no hex round trip: the
  * first 3 hex digits of the md5 are just the digest's top 12 bits.
  * Generators run inside GenerateExec, so CodegenFallback costs only the
  * generator call itself. The 100 TB shape is unchanged (one explode with
  * map-side-combined counts downstream); this cuts the constant factor of
  * the pool pass, the dominant stage of DSIR at any scale.
  */
case class HashedGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1 && n <= 4, s"gram size must be 1..4, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_grams requires a string column, got ${other.simpleString}")
  }

  override def elementSchema: StructType =
    StructType(Seq(StructField("bucket", LongType)))

  // one digest per task (expressions are deserialized per task, never
  // shared across threads); digest() leaves the instance reset for reuse
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      // UTF8String.toLowerCase matches Spark SQL lower(); limit -1 matches
      // split() (kept empties are then dropped, like the filter() HOF)
      val text = raw.asInstanceOf[UTF8String].toLowerCase.toString
      val split = text.split("\\s+", -1)
      var cnt = 0
      var i = 0
      while (i < split.length) { if (!split(i).isEmpty) cnt += 1; i += 1 }
      val words =
        if (cnt == split.length) split
        else {
          val w = new Array[String](cnt)
          var j = 0
          i = 0
          while (i < split.length) {
            if (!split(i).isEmpty) { w(j) = split(i); j += 1 }
            i += 1
          }
          w
        }
      if (words.length < n) Nil
      else {
        // r18 (refines the r17 word-by-word feed, whose 2n−1 small
        // update() calls per gram cost more than they saved — the r17
        // driver bench flagged q101): the words are joined ONCE per doc
        // into a byte buffer with single 0x20 separators — exactly the
        // UTF-8 of every joined gram string — so gram k is the contiguous
        // slice [start(k), start(k+n−1)+len(k+n−1)) and each gram costs
        // ONE md5.update(buf, off, len) + digest. No per-gram string, no
        // per-gram re-encode, and the digest's internal buffering runs
        // once per gram instead of 2n−1 times.
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
        (0 to m - n).iterator.map { k =>
          val from = start(k)
          val until = start(k + n - 1) + wb(k + n - 1).length
          md5.update(buf, from, until - from)
          val d = md5.digest()
          // first 3 hex digits of the md5 = the digest's top 12 bits
          InternalRow((((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)).toLong)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
