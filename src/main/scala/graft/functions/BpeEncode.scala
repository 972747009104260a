package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_tokens(text)` → the BPE tokenization of a document as
  * `array<string>`, under a TRAINED merge table
  * ([[graft.operators.Bpe.train]]).
  *
  * Standard byte-pair-encoding inference (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — the
  * tokenizer family behind GPT-2/LLaMA vocabularies): each whitespace
  * word starts as its character sequence; repeatedly merge the
  * LOWEST-RANK adjacent pair present until none applies. The merge table
  * rides in the expression as a plan literal (vocabulary-sized, broadcast
  * with the task closure) — encoding is a scan-local, shuffle-free map at
  * any corpus size, the only way a tokenizer survives 100 TB.
  *
  * Same normalization as the trainer: lowercase, split on whitespace.
  * Words are independent (no cross-word merges), matching the trainer's
  * word-histogram factorization. Null text → null; empty text → empty
  * array.
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_tokens"

  // rank lookup built once per task deserialization, not per row
  @transient private lazy val rank: java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => if (!m.containsKey(p)) m.put(p, i) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    // Locale.ROOT: the default-locale toLowerCase would diverge from the
    // trainer's SQL lower() under e.g. a Turkish JVM locale ('I' → 'ı')
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) BpeTokens.encodeWord(text.substring(start, i), rank, out)
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {

  /** Greedy rank-order BPE encode of one word, appending tokens to `out`.
    * O(len × applied-merges) with a linked-list-free two-buffer sweep —
    * fine for natural-language word lengths. */
  private[graft] def encodeWord(word: String,
                                rank: java.util.HashMap[(String, String), Int],
                                out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var symbols = word.map(_.toString).toBuffer
    var done = symbols.size < 2
    while (!done) {
      // find the lowest-rank applicable pair
      var best = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < symbols.size - 1) {
        // getOrDefault: a plain get on a missing key returns null, which
        // would unbox to 0 — the best possible rank
        val rr = rank.getOrDefault((symbols(j), symbols(j + 1)), Int.MaxValue)
        if (rr < best) { best = rr; bestAt = j }
        j += 1
      }
      if (bestAt < 0 || best == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of that pair left-to-right, non-overlapping
        val (a, b) = (symbols(bestAt), symbols(bestAt + 1))
        val next = scala.collection.mutable.ArrayBuffer[String]()
        var k = 0
        while (k < symbols.size) {
          if (k < symbols.size - 1 && symbols(k) == a && symbols(k + 1) == b) {
            next += a + b; k += 2
          } else { next += symbols(k); k += 1 }
        }
        symbols = next
        if (symbols.size < 2) done = true
      }
    }
    symbols.foreach(s => out += UTF8String.fromString(s))
  }

  def tokens(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text), merges))
  }
}
