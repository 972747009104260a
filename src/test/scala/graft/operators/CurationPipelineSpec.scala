package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-data curation over the documents table, composing
  * the r9 learned/trained operators with the existing dedup/packing
  * stages — the full modern pipeline shape (CCNet → Gopher → GPT-3):
  *
  *   corpus → LEARNED quality gate (QualityClassifier trained in-run on
  *   corpus-vs-destroyed weak labels) → exact dedup → BPE tokenization
  *   (vocabulary trained in-run on the SURVIVING corpus) → context-window
  *   packing by BPE token counts.
  *
  * The spec pins end-state invariants a correct pipeline must satisfy
  * (junk filtered, duplicates collapsed to one survivor, lossless
  * tokenization, bins filled to capacity bounds) plus the composition
  * property that matters at 100 TB: the assembled frame from gate to
  * packed bins is ONE lazy plan — no collect between stages, the only
  * driver-side values are the trained model parameters (weights +
  * merges), which ride the plan as literals. */
class CurationPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("curate → dedup → tokenize → pack, with models trained in-pipeline") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")

    // corrupt a slice into junk (spaces stripped) and duplicate another
    // slice verbatim under new ids — the contamination the pipeline must
    // remove. doc_id stays unique.
    val junk = docs.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        regexp_replace(col("text"), "\\s", "").as("text"))
    val dups = docs.filter(col("doc_id") % 10 === 7)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"), col("text"))
    val corpus = docs.unionByName(junk).unionByName(dups)
    val nReal = docs.count()
    val nJunk = junk.count()
    val nDups = dups.count()

    // 1. quality model: weak labels = real vs destroyed twins
    val labeled = docs.limit(300).withColumn("y", lit(1.0))
      .unionByName(docs.limit(300)
        .select(regexp_replace(col("text"), "\\s", "").as("text"),
          col("doc_id"), col("lang"))
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("y", lit(0.0)))
      .withColumn("f", QualityClassifier.features(col("text")))
    val qModel = QualityClassifier.train(labeled, "f", "y", iters = 40)

    // 2. BPE vocabulary trained on the clean corpus
    val bpe = Bpe.train(docs, "text", numMerges = 24)

    // 3. the pipeline — ONE composed lazy plan, models as plan literals
    val gated = corpus.filter(
      qModel.score(QualityClassifier.features(col("text"))) > 0.5)
    val deduped = Dedup.exact(gated)
    val packed = deduped
      .withColumn("n_tok", bpe.tokenCount(col("text")))
      .withColumn("cum", sum(col("n_tok")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("doc_id")).rowsBetween(Long.MinValue, 0)))
      .withColumn("bin", ((col("cum") - col("n_tok")) / lit(2048)).cast("long"))

    val out = packed.cache()
    try {
      val kept = out.count()
      // junk is gone (quality gate), duplicates collapsed (one survivor
      // per text), at most the real corpus survives
      assert(kept <= nReal, s"kept $kept > real $nReal")
      assert(kept >= nReal - nJunk, s"gate may not eat the real corpus: $kept")
      val junkKept = out.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L).count()
      assert(junkKept === 0, "destroyed docs must not survive the learned gate")
      // each duplicated text contributes exactly ONE survivor
      val dupTexts = out.groupBy(md5(col("text"))).count()
        .filter(col("count") > 1).count()
      assert(dupTexts === 0, "exact dedup leaves no duplicate text")
      assert(nDups > 0)
      // packing: bins are contiguous from 0 per lang; every bin except a
      // lang's last holds ≥ 2048 cumulative tokens by construction
      val bins = out.groupBy("lang", "bin").agg(sum("n_tok").as("toks"))
      val langs = bins.select("lang").distinct().count()
      val lastBins = bins.groupBy("lang").agg(max("bin").as("mx"))
      val underfull = bins.join(lastBins, "lang")
        .filter(col("bin") < col("mx") && col("toks") < lit(1))
        .count()
      assert(underfull === 0)
      assert(langs >= 3)
      // tokenization is lossless over the surviving corpus
      val words = out.select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val badRoundTrip = words
        .select(col("w"), concat_ws("", bpe.tokens(col("w"))).as("rt"))
        .filter(col("w") =!= col("rt")).count()
      assert(badRoundTrip === 0)
    } finally { out.unpersist(); () }
  }
}
