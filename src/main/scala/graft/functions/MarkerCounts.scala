package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: per-language marker-word counts of a text column in
  * ONE tokenize pass — a struct with one INT field per marker set.
  *
  * Exactly mirrors the q19 SQL form, per set i:
  * {{{
  *   size(filter(split(lower(text), '\s+'), w -> w IN (markers_i)))
  * }}}
  * i.e. lowercase first (UTF8String.toLowerCase ≡ SQL lower()), split
  * with limit -1 (trailing empties kept — they never match a marker),
  * then count tokens string-equal to any marker of the set. Why native:
  * the HOF form walks an interpreted lambda per (token, set) and
  * re-evaluates the split per set (higher-order functions are
  * CodegenFallback, so the five `filter` calls cannot share the split
  * subexpression); here the text is split once and each token makes one
  * hash-map probe.
  *
  * Null: null text → null struct (size(filter(split(null))) is null in
  * the SQL form too, and q19's CASE treats null scores as 'und' on both
  * forms — null > 0 is false).
  */
case class MarkerCounts(child: Expression, markerSets: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  require(markerSets.nonEmpty, "marker_counts needs at least one marker set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_counts requires a string column, got ${other.simpleString}")
  }

  override def dataType: StructType =
    StructType(markerSets.map { case (name, _) => StructField(name, IntegerType) })
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "marker_counts"

  // word -> index of the marker set it belongs to (marker sets are
  // disjoint by construction here; a shared word would need a bitmask)
  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Integer] = {
    val m = new java.util.HashMap[String, java.lang.Integer]()
    markerSets.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        require(!m.containsKey(w), s"marker '$w' appears in two sets")
        m.put(w, Int.box(i))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val words = text.split("\\s+", -1)
    val counts = new Array[Int](markerSets.length)
    var i = 0
    while (i < words.length) {
      val idx = lookup.get(words(i))
      if (idx != null) counts(idx.intValue()) += 1
      i += 1
    }
    InternalRow.fromSeq(counts.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerCounts {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def of(c: org.apache.spark.sql.Column,
         sets: Seq[(String, Seq[String])]): org.apache.spark.sql.Column =
    ColumnBridge.column(MarkerCounts(ColumnBridge.expression(c), sets))
}
