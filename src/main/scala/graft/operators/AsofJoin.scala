package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, the most recent right row
  * with `rightTs <= leftTs` per key (an operator Spark lacks natively;
  * DuckDB's ASOF JOIN is the oracle twin).
  *
  * Formulation: union both sides tagged, one window sorted by
  * (key) → (ts, tag) carrying the last right timestamp forward
  * (`last(_, ignoreNulls)` over unbounded-preceding). ONE shuffle + sort,
  * linear in |left|+|right| — at 100 TB this beats the per-row
  * "max right where ts <= t" correlated-subquery plan (a quadratic
  * range join) by orders of magnitude; ties (right.ts == left.ts) match
  * because right rows sort before left rows at equal ts.
  */
object AsofJoin {

  /** Returns `left` with an extra `asofCol` column: the greatest
    * `right.tsCol <= left.tsCol` for the same `key`, null when no prior
    * right row exists (filter nulls for inner semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               asofCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol)
    val l = left.select(
      Seq(col(key), col(tsCol).as("_ts"), lit(1).as("_tag"),
        lit(null).cast(left.schema(tsCol).dataType).as("_r_ts")) ++
        leftCols.map(col): _*)
    val r = right.select(
      Seq(col(key), col(tsCol).as("_ts"), lit(0).as("_tag"),
        col(tsCol).as("_r_ts")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asofCol, last(col("_r_ts"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(Seq(col(key), col("_ts").as(tsCol)) ++
        leftCols.map(col) :+ col(asofCol): _*)
  }
}
