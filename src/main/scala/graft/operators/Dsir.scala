package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" — public
  * method): pick from a large raw pool the documents whose hashed n-gram
  * profile looks most like a small TARGET corpus, by importance weight
  * under two smoothed bag-of-buckets models.
  *
  *   log w(d) = Σ_b c_b(d) · log( p_target(b) / p_source(b) )
  *
  * with `b` ranging over `buckets` hashed token features, `c_b(d)` the
  * doc's count in bucket b, and add-one smoothing on both models.
  *
  * Engine-exact scoring (the same discipline as q66's BM25, TextOps
  * scaladoc "fixed-point"): the per-bucket log-ratio is quantized ONCE to
  * a BIGINT at scale 10^6 — `FLOOR(LN(p_t(b) / p_s(b)) · 10^6)` with each
  * smoothed probability `(cnt+1)/(tot+B)` its own IEEE double division —
  * and the per-doc score is then an exact integer Σ c_b · logratio_fp.
  * The only float ops are three divisions and one LN per bucket over
  * identical inputs on both engines (each step correctly rounded, so
  * bit-identical; only LN can differ, by ≤1–2 ulp, invisible under the
  * 10^-6 floor except on a measure-zero boundary — and measurement at
  * sf0.01 put every active bucket >1e-6 of a grid unit away from a
  * floor boundary, so LN drift has never been observed in practice);
  * everything downstream (sums, ranking) is BIGINT, so ties and order
  * can't drift. The one cross-engine failure actually observed (r14)
  * was a DTYPE, not a value: DuckDB's un-cast `SUM(BIGINT)` widens to
  * HUGEINT (→ float64 in the comparison frame) while Spark writes
  * int64 — every integer-valued oracle aggregate must `CAST(... AS
  * BIGINT)` (gated repo-wide by tools/check.py's DESCRIBE-based dtype
  * gate, which rejects HUGEINT/DECIMAL/FLOAT oracle columns and any
  * oracle-vs-spark dtype-class mismatch). Bucket hash = first
  * 3 hex digits of md5(token) (the repo's cross-engine hash idiom,
  * PipelineOps SimHash oracle) → 4096 buckets.
  *
  * Scale shape (100 TB pool): tokenize+bucket is one explode with
  * map-side-combined counts; both bucket models are B-row aggregates;
  * the ratio table (B rows) BROADCASTS into the pool-side join; top-k is
  * a TakeOrderedAndProject. No all-pairs stage, no driver state beyond
  * B rows. The target corpus is small by definition (DSIR's premise);
  * the pool pass is embarrassingly parallel.
  */
object Dsir {

  val DefaultBuckets = 4096
  val Scale = 1000000L

  /** (doc_id, bucket, c): hashed n-gram bucket counts per document.
    * Bucket = first 3 hex digits of md5(feature), where a feature is a
    * lowercased whitespace token (`ngrams = 1`) or `ngrams` ADJACENT
    * tokens joined by one space (Xie et al.'s headline config is hashed
    * BIGRAMS — n-gram order carries target-style phrasing a bag of
    * unigrams can't). Empty split artifacts are dropped BEFORE gram
    * construction so both engines build identical windows; a doc shorter
    * than `ngrams` tokens contributes nothing.
    *
    * The gram window runs in the native single-pass
    * [[graft.functions.HashedGrams]] generator, which emits the BUCKET
    * directly (r16; the bucket is the md5 digest's top 12 bits — no hex
    * round trip, no per-gram string materialization). DsirSpec proves it
    * row-identical to the composable-HOF form ([[bucketCountsHof]]),
    * which the DuckDB oracle twins mirror. */
  def bucketCounts(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", ngrams: Int = 1): DataFrame = {
    require(ngrams >= 1 && ngrams <= 4, s"ngrams must be 1..4 (got $ngrams)")
    val buckets = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HashedGrams(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col(textCol)),
        ngrams))
    docs.select(col(idCol), buckets.as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** The composable-HOF twin of [[bucketCounts]] — the form the DuckDB
    * oracles rebuild relationally. Kept as the parity reference (DsirSpec
    * gates native ≡ HOF on every row); the native generator is the hot
    * path. */
  private[graft] def bucketCountsHof(docs: DataFrame, textCol: String = "text",
                                     idCol: String = "doc_id",
                                     ngrams: Int = 1): DataFrame = {
    require(ngrams >= 1 && ngrams <= 4, s"ngrams must be 1..4 (got $ngrams)")
    val toks = filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val feats =
      if (ngrams == 1) toks
      else when(size(toks) >= ngrams,
        transform(sequence(lit(0), size(toks) - ngrams),
          i => array_join(slice(toks, i + 1, lit(ngrams)), " ")))
        .otherwise(array())
    docs.select(col(idCol), explode(feats).as("w"))
      .select(col(idCol),
        conv(substring(md5(col("w")), 1, 3), 16, 10).cast("long").as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** (bucket, logratio_fp): fixed-point per-bucket log importance ratio
    * between the smoothed target and source bucket models. Buckets absent
    * from BOTH corpora are omitted (their smoothed ratio contributes only
    * to docs that contain them — and no doc does). */
  def bucketLogRatios(target: DataFrame, source: DataFrame,
                      textCol: String = "text", idCol: String = "doc_id",
                      buckets: Int = DefaultBuckets,
                      ngrams: Int = 1): DataFrame =
    ratiosFromCounts(bucketCounts(target, textCol, idCol, ngrams),
      bucketCounts(source, textCol, idCol, ngrams), buckets)

  /** Ratio table from PRE-COMPUTED per-doc bucket counts — lets
    * [[select]] feed the same pool aggregate into both the source model
    * and the scoring join (one tokenize+hash pass over the pool, the
    * 100 TB side; the shared (id, bucket) shuffle dedupes via Spark's
    * ReuseExchange). */
  private[operators] def ratiosFromCounts(targetCounts: DataFrame,
                                          sourceCounts: DataFrame,
                                          buckets: Int): DataFrame = {
    def model(counts: DataFrame) =
      counts.groupBy("bucket").agg(sum("c").as("cnt"))
    val t = model(targetCounts).withColumnRenamed("cnt", "cnt_t")
    val s = model(sourceCounts).withColumnRenamed("cnt", "cnt_s")
    val joined = t.join(s, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("cnt_t", "cnt_s"))
    // totals via 1-row aggregates cross-joined in (window-free, exact).
    // The ratio is computed as (p_t) / (p_s) with each probability its
    // own IEEE division — no BIGINT product, so no overflow headroom
    // limit, and both engines round each step identically.
    val tTot = t.agg(sum("cnt_t").as("tot_t"))
    val sTot = s.agg(sum("cnt_s").as("tot_s"))
    val b = lit(buckets.toLong)
    joined.crossJoin(broadcast(tTot)).crossJoin(broadcast(sTot))
      .select(col("bucket"),
        floor(log(
          ((col("cnt_t") + 1).cast("double") / (col("tot_t") + b).cast("double")) /
            ((col("cnt_s") + 1).cast("double") / (col("tot_s") + b).cast("double")))
          * Scale).cast("long").as("logratio_fp"))
  }

  /** (doc_id, score): exact BIGINT importance score per pool document —
    * Σ c_b · logratio_fp over the doc's buckets. The B-row ratio table
    * broadcasts. */
  def importanceScores(pool: DataFrame, ratios: DataFrame,
                       textCol: String = "text",
                       idCol: String = "doc_id",
                       ngrams: Int = 1): DataFrame =
    bucketCounts(pool, textCol, idCol, ngrams)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("c") * col("logratio_fp")).as("score"))

  /** Top-k most target-like pool documents, deterministic
    * (score DESC, id ASC). */
  def select(pool: DataFrame, target: DataFrame, k: Int,
             textCol: String = "text", idCol: String = "doc_id",
             buckets: Int = DefaultBuckets, ngrams: Int = 1): DataFrame = {
    // ONE pool pass (r15): the same (doc_id, bucket, c) aggregate feeds
    // the source model AND the per-doc scores — tokenize+md5 over the
    // pool (the expensive, 100 TB side) runs once instead of twice, and
    // the shared shuffle dedupes via ReuseExchange.
    val poolCounts = bucketCounts(pool, textCol, idCol, ngrams)
    val ratios = ratiosFromCounts(
      bucketCounts(target, textCol, idCol, ngrams), poolCounts, buckets)
    poolCounts.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("c") * col("logratio_fp")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
