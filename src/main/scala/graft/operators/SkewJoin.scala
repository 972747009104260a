package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salting for the case AQE's skew-join split
  * cannot fix — a single join key hot enough that every row of the big
  * side lands in one task.
  *
  * `big` rows get a per-row salt in [0, salts); `small` rows are
  * replicated once per salt value; the join key becomes (key, salt), so
  * the hot key's rows spread across `salts` tasks instead of one. The
  * result set is exactly the plain join's (each big row still meets every
  * small row of its key exactly once — through its own salt replica).
  *
  * Cost model: replicates the SMALL side ×salts — use when
  * |small| × salts ≪ |big|, i.e. a fact-to-dim join with a skewed fact.
  * For broadcast-able dims prefer `broadcast()` (no shuffle at all);
  * salting is for dims too big to broadcast but small enough to
  * replicate. AQE's skewedJoin handles moderate skew without help —
  * reach for this when one key dominates a partition by orders of
  * magnitude. (SURVEY §4 / the 100 TB checklist.)
  */
object SkewJoin {

  /** Salted inner/left equi-join of a skewed `big` side with a `small`
    * side on `key`. Salt is derived from a per-row id, not the key, so
    * identical rows of the hot key still spread. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting supports inner/left joins, got $joinType")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
