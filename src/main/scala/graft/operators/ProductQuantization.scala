package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the vector-compression tier below int8
  * ([[Quantization]]): split each d-dim vector into `m` subvectors, learn
  * a k-entry codebook per subspace (k ≤ 256 → one byte per subvector),
  * store only the m code bytes + the vector's true norm. 64 float dims
  * (256 B) at m=16 → 16 B codes + 4 B norm ≈ 13×; scoring never
  * decompresses the corpus.
  *
  * Query scoring is ADC (asymmetric distance computation): the query
  * stays float; a per-query m×k lookup table of subspace dot products is
  * computed driver-side (tiny) and becomes plan literals, so scoring a
  * vector is m array lookups + a sum — a fused codegen'd projection over
  * the codes column, no UDF, no join, no shuffle. Cosine ranking divides
  * by the STORED true norm (exact, computed at encode time), so the only
  * approximation is the subspace quantization of the dot product.
  *
  * Training = m independent per-subspace k-means, each reusing
  * [[Similarity.ivfAssign]]'s distributed Lloyd (map-side-combined
  * (code, dim) aggregates; the only driver state is the m×k×(d/m)
  * codebook matrix — plan literals thereafter, exactly like the IVF
  * centroids). Deterministic init (hash-ordered sample), so re-training
  * on the same data reproduces the same books.
  *
  * At 100 TB: train on any sample (one pass per Lloyd iter), encode is
  * one fused projection pass, ADC top-k is scan + TakeOrdered — the
  * corpus is touched once per query wave and in compressed form only.
  */
object ProductQuantization {

  /** Per-subspace codebooks: `books(i)(j)` = centroid j of subspace i
    * (length `subDim`). */
  case class Codebooks(m: Int, subDim: Int, books: Seq[Seq[Seq[Float]]])

  /** Train per-subspace codebooks. `dim` must be divisible by `m`;
    * `k ≤ 128` keeps codes in a signed byte's positive range. */
  def train(embeddings: DataFrame, dim: Int, m: Int = 16, k: Int = 16,
            iters: Int = 3, idCol: String = "vec_id",
            vecCol: String = "embedding"): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    require(k >= 2 && k <= 128, s"k must be in [2, 128], got $k")
    val subDim = dim / m
    val books = (0 until m).map { i =>
      val sub = embeddings.select(col(idCol),
        slice(col(vecCol), i * subDim + 1, subDim).as(vecCol))
      Similarity.ivfAssign(sub, nlist = k, iters = iters, idCol = idCol,
        vecCol = vecCol, metric = "l2")._2
    }
    Codebooks(m, subDim, books)
  }

  /** PQ-encode: struct(norm FLOAT, codes ARRAY<TINYINT>). The norm is the
    * vector's TRUE L2 norm (float math at encode time), so cosine
    * denominators stay exact after compression. Codeword assignment is
    * squared-L2 nearest (Jégou PQ): the codeword must approximate the
    * subvector in magnitude too — cosine-nearest could pick one of
    * arbitrarily different norm, inflating the ADC dot error. Training
    * ([[train]]) runs its Lloyd steps under the same metric. */
  def encodeEmbedding(vec: Column, cb: Codebooks): Column = {
    val codes = array((0 until cb.m).map { i =>
      graft.functions.NearestCentroid(
        slice(vec, i * cb.subDim + 1, cb.subDim), cb.books(i), "l2").cast("tinyint")
    }: _*)
    val norm = sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))).cast("float")
    struct(norm.as("norm"), codes.as("codes"))
  }

  def encodeTable(df: DataFrame, cb: Codebooks, vecCol: String = "embedding",
                  outCol: String = "pq"): DataFrame =
    df.withColumn(outCol, encodeEmbedding(col(vecCol), cb))

  /** Reconstruction (decode): concatenated codebook entries — the lossy
    * inverse, for consumers that need a float vector back. */
  def decodeEmbedding(pq: Column, cb: Codebooks): Column = {
    val parts = (0 until cb.m).map { i =>
      element_at(typedlit(cb.books(i)),
        element_at(pq.getField("codes"), i + 1).cast("int") + 1)
    }
    concat(parts: _*)
  }

  /** ADC dot product of a float query against the codes column: per-query
    * LUT of subspace dots, folded as plan literals. */
  def adcDot(pq: Column, cb: Codebooks, query: Seq[Float]): Column = {
    require(query.length == cb.m * cb.subDim,
      s"query dim ${query.length} != ${cb.m * cb.subDim}")
    val terms = (0 until cb.m).map { i =>
      val qSub = query.slice(i * cb.subDim, (i + 1) * cb.subDim)
      val lut: Seq[Float] = cb.books(i).map(c =>
        c.zip(qSub).map { case (a, b) => a * b }.sum)
      element_at(typedlit(lut),
        element_at(pq.getField("codes"), i + 1).cast("int") + 1)
    }
    terms.map(_.cast("double")).reduce(_ + _)
  }

  /** Approximate cosine: ADC dot over (stored true norm × query norm). */
  def adcCosine(pq: Column, cb: Codebooks, query: Seq[Float]): Column = {
    val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
    adcDot(pq, cb, query) / (pq.getField("norm").cast("double") * lit(qNorm))
  }

  /** PQ top-k by approximate cosine — scan + TakeOrdered over the
    * compressed column only. */
  def topK(encoded: DataFrame, cb: Codebooks, query: Seq[Float], k: Int = 10,
           idCol: String = "vec_id", pqCol: String = "pq"): DataFrame =
    encoded.select(col(idCol), adcCosine(col(pqCol), cb, query).as("cos_adc"))
      .orderBy(desc("cos_adc"), col(idCol)).limit(k)

  /** The production pattern: ADC selects `candidates` cheaply from the
    * compressed corpus, then ONLY those rows are scored exactly on the
    * float column. The full-precision vectors of non-candidates are never
    * read past the scan — with the float column in a separate parquet
    * column (columnar), the exact stage touches `candidates` rows. */
  def topKReranked(encoded: DataFrame, cb: Codebooks, query: Seq[Float],
                   k: Int = 10, candidates: Int = 100,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   pqCol: String = "pq"): DataFrame = {
    val cand = encoded
      .select(col(idCol), col(vecCol), adcCosine(col(pqCol), cb, query).as("cos_adc"))
      .orderBy(desc("cos_adc"), col(idCol)).limit(candidates)
    cand.select(col(idCol),
        Similarity.cosine(col(vecCol), typedlit(query)).as("cos"))
      .orderBy(desc("cos"), col(idCol)).limit(k)
  }
}
