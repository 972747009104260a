package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ: codes compress 64 floats to m bytes, ADC scoring tracks exact
  * cosine well enough to recover most of the exact top-k, decode
  * reconstructs within subspace quantization error, and the whole path is
  * deterministic. */
class ProductQuantizationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
  def emb: DataFrame = graft.Tables.load(spark, sfDir, "embeddings")

  val Dim = 64
  lazy val cb: ProductQuantization.Codebooks =
    ProductQuantization.train(emb, dim = Dim, m = 16, k = 16, iters = 2)
  lazy val encoded: DataFrame =
    ProductQuantization.encodeTable(emb, cb).cache()

  def localCos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    d / math.sqrt(na * nb)
  }

  test("codes are m tinyint entries in [0, k)") {
    val row = encoded.select("pq.codes").head.getSeq[Byte](0)
    assert(row.length === 16)
    assert(row.forall(c => c >= 0 && c < 16))
  }

  test("decode reconstructs within quantized-subspace error") {
    val rows = encoded.select(col("embedding"),
        ProductQuantization.decodeEmbedding(col("pq"), cb).as("rec"))
      .limit(50).collect()
    val relErrs = rows.map { r =>
      val x = r.getSeq[Float](0); val y = r.getSeq[Float](1)
      val diff = math.sqrt(x.zip(y).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
      val n = math.sqrt(x.map(v => v.toDouble * v).sum)
      diff / n
    }
    // k=16 codewords per 4-dim subspace on near-random unit-ish vectors:
    // coarse, but reconstruction must stay well inside the unit sphere
    assert(relErrs.forall(_ < 0.9), s"max rel err ${relErrs.max}")
    assert(relErrs.sum / relErrs.length < 0.7, s"mean rel err ${relErrs.sum / relErrs.length}")
  }

  test("ADC + exact re-rank recovers the exact top-k; ADC alone is a real signal") {
    val local = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L)
    val (adcRecalls, rerankRecalls) = queryIds.map { qid =>
      val q = local(qid)
      val exact = local.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, localCos(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val pool = encoded.filter(col("vec_id") =!= qid)
      val adc = ProductQuantization.topK(pool, cb, q, k = 10)
        .collect().map(_.getLong(0)).toSet
      val rr = ProductQuantization.topKReranked(pool, cb, q, k = 10, candidates = 100)
        .collect().map(_.getLong(0)).toSet
      (exact.intersect(adc).size / 10.0, exact.intersect(rr).size / 10.0)
    }.unzip
    val adcMean = adcRecalls.sum / adcRecalls.size
    val rrMean = rerankRecalls.sum / rerankRecalls.size
    // near-random synthetic vectors are PQ's worst case (no cluster
    // structure to exploit) — ADC alone must still rank far above chance
    // (random 10-of-499 ≈ 0.02), and the candidates-then-exact pattern
    // must recover most of the true top-k
    assert(adcMean >= 0.25, s"ADC-only mean recall@10 $adcMean (per-query: $adcRecalls)")
    assert(rrMean >= 0.8, s"reranked mean recall@10 $rrMean (per-query: $rerankRecalls)")
  }

  test("training and encoding are deterministic") {
    val cb2 = ProductQuantization.train(emb, dim = Dim, m = 16, k = 16, iters = 2)
    assert(cb2.books === cb.books)
    val a = encoded.select("vec_id", "pq.codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = ProductQuantization.encodeTable(emb, cb2)
      .select("vec_id", "pq.codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a === b)
  }

  test("stored norm is the true float norm") {
    val rows = encoded.select(col("embedding"), col("pq.norm")).limit(20).collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](0)
      val expected = math.sqrt(x.map(v => v.toDouble * v).sum)
      assert(math.abs(r.getFloat(1) - expected) < 1e-3 * math.max(1.0, expected))
    }
  }
}
