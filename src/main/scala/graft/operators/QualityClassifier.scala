package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned document-quality classification (the fastText-style quality
  * filter of the Gopher/GPT-3 data pipelines — a linear model over cheap
  * text statistics, trained against weak labels), Spark-first with no
  * MLlib dependency and no UDFs anywhere:
  *
  *  - [[features]] builds the standard quality signals (log-length,
  *    alpha/digit/punct ratios, stopword ratio, mean word length,
  *    char-trigram repetition) as ONE codegen'd projection;
  *  - [[train]] is batch gradient descent where each iteration is a
  *    SINGLE map-side-combined aggregation job producing the full
  *    gradient vector: the feature dimension is small and fixed, so the
  *    gradient is `dim + 1` sum() columns over `err × x_j` — one pass,
  *    no shuffle wider than the 1-row aggregate, weights broadcast as
  *    plan literals. 100 TB cost = iters × one scan (and in practice a
  *    quality model trains on a sample — the operator doesn't care);
  *  - [[auc]] is the Mann-Whitney rank statistic for gate-keeping the
  *    model. It needs a global rank: fine for evaluation samples, not
  *    something to run over the full corpus (documented, like every
  *    global-window caveat in this repo);
  *  - scoring ([[LogRegModel.score]]) is a scan-local arithmetic column —
  *    filtering 100 TB by model score is embarrassingly parallel.
  */
object QualityClassifier {

  /** Minimal english-ish stopword set for the stopword-ratio feature —
    * quality classifiers need a dozen high-frequency markers, not a
    * linguistics package. */
  private val Stopwords = Seq("the", "a", "an", "of", "to", "and", "in",
    "is", "that", "it", "for", "on", "with", "as")

  val FeatureNames: Seq[String] = Seq("log_len", "alpha_ratio", "digit_ratio",
    "punct_ratio", "stopword_ratio", "mean_word_len", "space_ratio")

  /** Quality-signal vector as `array<double>` — one codegen'd projection,
    * no UDFs. All ratios are of character/word counts, guarded against
    * empty text. */
  def features(text: Column): Column = {
    val len = greatest(length(text), lit(1)).cast("double")
    def ratioOf(pattern: String): Column =
      length(regexp_replace(text, pattern, "")).cast("double") / len
    val words = split(trim(lower(text)), "\\s+")
    val nWords = greatest(size(words), lit(1)).cast("double")
    val stopHits = size(filter(words,
      w => w.isin(Stopwords.map(lit(_)): _*))).cast("double")
    array(
      log1p(length(text).cast("double")).as("log_len"),
      (lit(1.0) - ratioOf("[a-zA-Z]")).as("alpha_ratio"),
      (lit(1.0) - ratioOf("[0-9]")).as("digit_ratio"),
      (lit(1.0) - ratioOf("[\\.,;:!\\?'\"]")).as("punct_ratio"),
      (stopHits / nWords).as("stopword_ratio"),
      (len / nWords).as("mean_word_len"),
      (lit(1.0) - ratioOf("\\s")).as("space_ratio"))
  }

  final case class LogRegModel(weights: Seq[Double], bias: Double,
                               losses: Seq[Double]) {
    /** P(label = 1) as a scan-local column over an `array<double>`
      * feature column — weights ride the plan as literals. */
    def score(featuresCol: Column): Column = {
      val z = aggregate(
        zip_with(featuresCol, typedlit(weights), (x, w) => x * w),
        lit(bias), (acc, v) => acc + v)
      lit(1.0) / (lit(1.0) + exp(-z))
    }
  }

  /** Batch gradient descent for L2-regularized logistic regression.
    * `labelCol` is 0/1 (double); `featuresCol` is `array<double>` of a
    * FIXED dimension. Each iteration = one aggregation job. Features are
    * standardized internally (one extra pass up front) so one learning
    * rate fits all scales. */
  def train(df: DataFrame, featuresCol: String, labelCol: String,
            iters: Int = 60, lr: Double = 1.0, l2: Double = 1e-4): LogRegModel = {
    val first = df.select(col(featuresCol)).limit(1).collect()
    require(first.nonEmpty, "cannot train on an empty dataset")
    val dim = first.head.getSeq[Double](0).size
    val x = col(featuresCol)
    // standardization stats: one pass
    val statsRow = df.select(
      (0 until dim).flatMap(j => Seq(
        avg(element_at(x, j + 1)).as(s"m$j"),
        coalesce(stddev_pop(element_at(x, j + 1)), lit(0.0)).as(s"s$j"))) :+
        count(lit(1)).cast("double").as("n"): _*).head()
    val mean = (0 until dim).map(j => statsRow.getDouble(2 * j)).toArray
    val std = (0 until dim).map { j =>
      val s = statsRow.getDouble(2 * j + 1); if (s < 1e-12) 1.0 else s
    }.toArray
    val n = statsRow.getDouble(2 * dim)
    val y = col(labelCol).cast("double")

    var w = Array.fill(dim)(0.0)
    var b = 0.0
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 0 until iters) {
      // z = b + Σ w_j · (x_j − μ_j)/σ_j, assembled as plain arithmetic
      val z = (0 until dim).foldLeft(lit(b)) { (acc, j) =>
        acc + lit(w(j)) * ((element_at(x, j + 1) - lit(mean(j))) / lit(std(j)))
      }
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val err = p - y
      // full gradient + loss in ONE map-side-combined aggregation
      val aggs =
        (0 until dim).map(j => sum(err *
          ((element_at(x, j + 1) - lit(mean(j))) / lit(std(j)))).as(s"g$j")) ++ Seq(
          sum(err).as("gb"),
          sum(-(y * log(greatest(p, lit(1e-12))) +
            (lit(1.0) - y) * log(greatest(lit(1.0) - p, lit(1e-12))))).as("loss"))
      val row = df.select(aggs: _*).head()
      val grad = (0 until dim).map(j => row.getDouble(j) / n + l2 * w(j)).toArray
      val gb = row.getDouble(dim) / n
      losses += row.getDouble(dim + 1) / n
      w = w.indices.map(j => w(j) - lr * grad(j)).toArray
      b -= lr * gb
    }
    // fold the standardization back into raw-space weights so scoring
    // needs no stats: w_raw_j = w_j/σ_j ; b_raw = b − Σ w_j μ_j/σ_j
    val wRaw = (0 until dim).map(j => w(j) / std(j))
    val bRaw = b - (0 until dim).map(j => w(j) * mean(j) / std(j)).sum
    LogRegModel(wRaw, bRaw, losses.toSeq)
  }

  /** Area under the ROC curve via the Mann-Whitney rank statistic —
    * evaluation utility (global rank ⇒ run it on evaluation samples, not
    * the full corpus). */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): Double = {
    import org.apache.spark.sql.expressions.Window
    // tied scores take their AVERAGE rank (the Mann-Whitney tie
    // correction): min-rank + (tie-group size − 1)/2
    val ranked = scored.select(col(scoreCol), col(labelCol).cast("double").as("y"))
      .withColumn("r",
        rank().over(Window.orderBy(col(scoreCol).asc)).cast("double") +
          (count(lit(1)).over(Window.partitionBy(col(scoreCol))).cast("double") -
            lit(1.0)) / lit(2.0))
    val agg = ranked.agg(
      sum(when(col("y") === 1.0, col("r"))).as("rpos"),
      sum(when(col("y") === 1.0, 1.0).otherwise(0.0)).as("npos"),
      sum(when(col("y") === 0.0, 1.0).otherwise(0.0)).as("nneg")).head()
    val (rpos, npos, nneg) = (agg.getDouble(0), agg.getDouble(1), agg.getDouble(2))
    require(npos > 0 && nneg > 0, "AUC needs both classes present")
    (rpos - npos * (npos + 1) / 2.0) / (npos * nneg)
  }
}
