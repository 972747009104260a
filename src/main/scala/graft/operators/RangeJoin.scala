package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join — pair every left "point" row with
  * the right "interval" rows containing it (start ≤ pt ≤ end), an
  * operator Spark has no native plan for: the naive `ON pt BETWEEN start
  * AND end` is a BroadcastNestedLoopJoin (quadratic, broadcasts one full
  * side), while DuckDB plans its native IEJoin (the oracle twin).
  *
  * Formulation: bucket the number line into bins of `binWidth`; a point
  * lives in exactly one bin, an interval is exploded to every bin it
  * overlaps, and the join becomes a hash equi-join on the bin id with
  * the exact containment predicate as a residual filter. Each qualifying
  * pair meets in exactly ONE bin (the point's), so no dedup pass is
  * needed.
  *
  * Scale: shuffle is hash-partitioned on bin id — linear, skew-bounded by
  * points-per-bin; interval replication is span/binWidth + 1 rows, so
  * pick `binWidth` near the typical interval span (replication ~2× and
  * bins stay selective). Degenerate long intervals replicate widely —
  * cap them upstream or raise the width.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose [startCol, endCol]
    * contains ptCol (inclusive ends). All three columns must be numeric
    * (cast timestamps to epoch first). Output: every points column plus
    * every intervals column. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("_bin", bin(col(ptCol)))
    val iv = intervals
      .withColumn("_bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(iv, Seq("_bin"))
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }
}
