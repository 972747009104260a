package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native generator: word n-gram shingles of a text column — one output
  * row per shingle, column `sh`.
  *
  * Exactly mirrors the composable SQL form used by the oracle twins
  * (TextOps.sparkShingles):
  * {{{
  *   CASE WHEN size(split(text,'\s+')) >= n
  *     THEN transform(sequence(1, size-… ), i -> concat_ws(' ', slice(words, i, n)))
  *     ELSE array(text) END
  * }}}
  * including Spark's split semantics (limit -1: trailing empty tokens
  * kept) and the short-text fallback (texts with < n words emit the raw
  * text once). Why native: the HOF form allocates a slice array and walks
  * interpreted lambdas per shingle — one java split + rolling mkString
  * here is a single pass per row. Generators run inside GenerateExec, so
  * CodegenFallback costs only the generator call itself.
  *
  * `distinct = true` (`word_shingles_distinct`, r18) additionally emits
  * each shingle ONCE per document (first-occurrence order). Because a
  * source row is one document, this makes `SELECT DISTINCT doc_id, sh`
  * over the exploded stream a per-row no-shuffle rewrite: the distinct
  * AGGREGATE (and its exchange over the full shingle stream — which r17's
  * q52 REPARTITION(sh) form concentrated onto hot shingles) disappears
  * from the plan, and any later shingle-keyed exchange carries exactly
  * one row per (doc, shingle) — the minimum a df window can consume, so
  * a boilerplate shingle's partition holds its distinct-doc postings
  * only, never its raw occurrence stream.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string column, got ${other.simpleString}")
  }

  override def prettyName: String =
    if (distinct) "word_shingles_distinct" else "word_shingles"

  override def elementSchema: StructType =
    StructType(Seq(StructField("sh", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val text = raw.asInstanceOf[UTF8String].toString
      // limit -1 matches Spark SQL split(): trailing empties are kept
      val words = text.split("\\s+", -1)
      if (words.length >= n) {
        val all = (0 to words.length - n).iterator.map { i =>
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
          sb.toString
        }
        if (!distinct) all.map(s => InternalRow(UTF8String.fromString(s)))
        else {
          val seen = new java.util.LinkedHashSet[String]()
          all.foreach(seen.add)
          val it = seen.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = it.hasNext
            override def next(): InternalRow =
              InternalRow(UTF8String.fromString(it.next()))
          }
        }
      } else Iterator.single(InternalRow(raw.asInstanceOf[UTF8String]))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
