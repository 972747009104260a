package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native expressions.
  *
  * Two routes:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard SparkSessionExtensions hook, like the reference stack's
  *    `IcebergSparkSessionExtensions` — spark/spark-defaults.conf:22)
  *  - runtime: `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptions.foreach(ext.injectFunction)
    // DSv2 read path: substitute GraftTable relations with the LakeTable
    // read plan (graft.lake.dsv2.GraftReadRule)
    ext.injectResolutionRule(spark => graft.lake.dsv2.GraftReadRule(spark))
    // Iceberg-spelling branch/tag DDL (ALTER TABLE … CREATE BRANCH …)
    ext.injectParser((_, delegate) => new graft.lake.dsv2.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  type Description = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  val descriptions: Seq[Description] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes (array<float>, array<float>)")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDotProduct].getName, "quantized_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantized_dot takes (array<float>, array<float>)")
        QuantizedDotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("wav_features"),
      new ExpressionInfo(classOf[WavFeatures].getName, "wav_features"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "wav_features takes (binary)")
        WavFeatures(args.head)
      }),
    (FunctionIdentifier("bmp_features"),
      new ExpressionInfo(classOf[BmpFeatures].getName, "bmp_features"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bmp_features takes (binary)")
        BmpFeatures(args.head)
      }),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash32 takes (array<string>)")
        SimHash32(args.head)
      }),
    (FunctionIdentifier("image_features"),
      new ExpressionInfo(classOf[ImageFeatures].getName, "image_features"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "image_features takes (binary)")
        ImageFeatures(args.head)
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => winnowFromArgs(args, asLong = false)),
    // array<bigint> twin: identical fingerprints as unsigned-32-bit longs
    // (numeric order ≡ hex lexicographic order) — q64 pairs on 8-byte keys
    (FunctionIdentifier("winnow_fingerprints_long"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints_long"),
      (args: Seq[Expression]) => winnowFromArgs(args, asLong = true)),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig takes (text, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig n must be an integer literal, got $other")
        }
        MinHashSig(args.head, n)
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => shinglesFromArgs(args, distinct = false)),
    // per-document-distinct twin: each shingle once per doc, so the
    // exploded stream IS the (doc_id, sh)-distinct set — no dedup
    // aggregate, no pre-dedup shuffle (q52)
    (FunctionIdentifier("word_shingles_distinct"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles_distinct"),
      (args: Seq[Expression]) => shinglesFromArgs(args, distinct = true)))

  private def shinglesFromArgs(args: Seq[Expression], distinct: Boolean): Expression = {
    require(args.length == 2, "word_shingles takes (text, n)")
    val n = args(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_shingles n must be an integer literal, got $other")
    }
    WordShingles(args.head, n, distinct)
  }

  private def winnowFromArgs(args: Seq[Expression], asLong: Boolean): Expression = {
    require(args.length == 3 || args.length == 4,
      "winnow_fingerprints takes (text, k, w[, rolling])")
    def intLit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"winnow_fingerprints $what must be an integer literal, got $other")
    }
    val rolling = if (args.length < 4) false else args(3) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
      case other => throw new IllegalArgumentException(
        s"winnow_fingerprints rolling must be a boolean literal, got $other")
    }
    WinnowFingerprints(args.head, intLit(args(1), "k"), intLit(args(2), "w"),
      rolling, asLong)
  }

  /** Register on a live session (temp-function registry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.FunctionBridge.register(spark, descriptions)
}
