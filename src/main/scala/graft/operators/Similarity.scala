package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — north-star
  * ANN operators. All expression-level (zip_with/aggregate are codegen'd
  * higher-order functions; no UDFs), so the scan→score→top-k pipeline stays
  * in one whole-stage-codegen pass.
  *
  * Scale design:
  *   - brute-force top-k: one map over the table + TakeOrderedAndProject
  *     (no shuffle of vectors; only the per-partition top-k rows move).
  *   - LSH path: sign-random-projection buckets computed from deterministic
  *     hash-derived hyperplanes; candidate generation is an equi-join on
  *     bucket — at 1000 executors the bucket join shuffles candidates only.
  *   - IVF path: k-means-lite centroids via hash-seeded sampling; probe =
  *     broadcast the (tiny) centroid table, prune to nearest `nprobe`
  *     partitions. Same pattern as a partitioned-index scan.
  */
object Similarity {

  /** exact dot product as double (deterministic left-to-right fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via composed higher-order functions (three interpreted array
    * walks — kept for cross-checking the native expression). */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Cosine via the native codegen expression (one fused loop —
    * graft.functions.CosineSimilarity); same null semantics as cosineHof. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Exact brute-force top-k cosine neighbors of `queryVec`.
    * Plans as scan → project(score) → TakeOrderedAndProject: no shuffle of
    * the vector column, only k rows per partition reach the driver. */
  def topK(embeddings: DataFrame, queryVec: Seq[Float], k: Int = 10,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = typedLit(queryVec)
    embeddings
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Sign-random-projection LSH bucket id: `planes` sign bits packed into a
    * long, via the native codegen'd [[graft.functions.SrpBucket]] (one
    * fused vector pass; deterministic splitmix64 hyperplanes). `seed`
    * selects an independent hyperplane set — one seed per hash table, so
    * multi-table probing widens recall with independent collision events
    * (a shared projection re-bucketed per table is a no-op). */
  def srpBucket(vec: Column, planes: Int, seed: Long = 0L): Column =
    graft.functions.SrpBucket(vec, planes, seed)

  /** Per-table bucket ids, namespaced so different tables never collide:
    * bucket_t = srp(vec, planes, seed=t) * tables + t. */
  private def tableBuckets(vec: Column, planes: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      srpBucket(vec, planes, t.toLong) * tables + t): _*)

  /** ANN top-k via SRP-LSH: score only vectors sharing the query's bucket
    * in any of `tables` independent hash tables (multi-probe by table, not
    * by bucket perturbation). Falls back to empty result if no collision —
    * callers can widen with more tables. Approximate by construction. */
  def annTopK(embeddings: DataFrame, queryVec: Seq[Float], k: Int = 10,
              planes: Int = 12, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = typedLit(queryVec)
    val withBuckets = embeddings
      .select(col(idCol), col(vecCol),
        explode(tableBuckets(col(vecCol), planes, tables)).as("bucket"))
    // query buckets (computed once on a 1-row frame, broadcast)
    val qdf = embeddings.sparkSession.range(1)
      .select(explode(tableBuckets(q, planes, tables)).as("bucket"))
    withBuckets
      .join(broadcast(qdf), "bucket")
      .select(col(idCol), cosine(col(vecCol), q).as("cos")).distinct()
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near-duplicate vectors (cosine ≥ threshold), blocked by a
    * coarse SRP bucket so the join is bucket-local (linear-ish, not n²).
    * For exactness within a block family, pairs are generated across the
    * `tables` independent hash tables and deduplicated. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
                   planes: Int = 8, tables: Int = 2,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withBuckets = embeddings
      .select(col(idCol), col(vecCol),
        explode(tableBuckets(col(vecCol), planes, tables)).as("bucket"))
    val a = withBuckets.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = withBuckets.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Assign every vector to its nearest centroid's list — a pure fused
    * projection over literal centroids (no join/window/shuffle). Use with
    * memoized centroids to probe a prebuilt IVF index. */
  def ivfAssignWith(embeddings: DataFrame, centroids: Seq[Seq[Float]],
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    // metadata columns are PRESERVED (withColumn, not a narrow select):
    // filtered vector search predicates them ([[ivfTopKFiltered]]), and
    // the planner prunes unused columns anyway
    embeddings.withColumn("list_id", nearestList(vecCol, centroids))

  /** Nearest-centroid list id via the native [[graft.functions
    * .NearestCentroid]] expression — ONE fused loop over a float[][]
    * reference object, whole-stage codegen'd, zero shuffles. (The
    * composable `greatest(struct(cos, -i), …)` tree form grows generated
    * code linearly in nlist and hit janino compile-time cliffs at
    * nlist=32; the loop form is constant-size.) */
  private def nearestList(vecCol: String, centroids: Seq[Seq[Float]],
                          metric: String = "cosine"): Column =
    graft.functions.NearestCentroid(col(vecCol), centroids, metric)

  /** The expression-tree formulation of [[nearestList]], kept for
    * cross-checking the native loop in tests. */
  private[operators] def nearestListTree(vecCol: String, centroids: Seq[Seq[Float]]): Column = {
    val scores = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(col(vecCol), typedLit(c)).as("d"),
        lit(-i).as("neg_list"))
    }
    -greatest(scores: _*).getField("neg_list")
  }

  /** IVF-style index: `nlist` k-means centroids (hash-sampled init +
    * `iters` distributed Lloyd steps), then every vector assigned to its
    * nearest centroid. Each Lloyd step is one posexplode → groupBy(list,
    * dim) mean — a map-side-combined shuffle of nlist×dim aggregates, not
    * of vectors — and the only driver materialization is the nlist×dim
    * centroid matrix itself (tiny, becomes plan literals). Probing
    * `nprobe` lists then scans ~nprobe/nlist of the data. */
  def ivfAssign(embeddings: DataFrame, nlist: Int = 16, iters: Int = 3,
                idCol: String = "vec_id", vecCol: String = "embedding",
                metric: String = "cosine"): (DataFrame, Seq[Seq[Float]]) = {
    var centroids: Seq[Seq[Float]] = embeddings
      .select(col(idCol), col(vecCol))
      .withColumn("_h", pmod(xxhash64(col(idCol)), lit(1000000L)))
      .orderBy("_h").limit(nlist)
      .select(vecCol).collect().map(_.getSeq[Float](0)).toSeq
    var it = 0
    while (it < iters) {
      // element-wise mean per assigned list; lists that lose all members
      // keep their previous centroid
      val means = embeddings
        .select(nearestList(vecCol, centroids, metric).as("list_id"),
          posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("list_id", "pos").agg(avg("v").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (list, rows) =>
          list -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
        }
      centroids = centroids.zipWithIndex.map { case (c, i) => means.getOrElse(i, c) }
      it += 1
    }
    val assigned = embeddings.select(
      col(idCol), col(vecCol), nearestList(vecCol, centroids, metric).as("list_id"))
    (assigned, centroids)
  }

  /** The `nprobe` list ids whose centroids are nearest to the query —
    * computed driver-side (centroids are local by construction). Shared
    * by [[ivfTopK]] and the persistent [[VectorIndex]] probe, whose
    * partition pruning needs the list BEFORE building the scan. */
  private[graft] def probeLists(centroids: Seq[Seq[Float]],
                                queryVec: Seq[Float], nprobe: Int): Seq[Int] = {
    def localCos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    centroids.zipWithIndex
      .sortBy { case (c, i) => (-localCos(c, queryVec), i) }
      .take(nprobe).map(_._2)
  }

  /** IVF probe: search only the `nprobe` lists whose centroids are nearest
    * to the query (list choice computed driver-side — centroids are local). */
  def ivfTopK(assigned: DataFrame, centroids: Seq[Seq[Float]], queryVec: Seq[Float],
              k: Int = 10, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probe = probeLists(centroids, queryVec, nprobe)
    val q = typedLit(queryVec)
    assigned
      .filter(col("list_id").isin(probe: _*)) // partition-prunable at scale
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Filtered IVF probe (filtered vector search): top-k under a metadata
    * predicate, with the index still pruning the scan.
    *
    * Probing the unfiltered operating point's `nprobe` lists under a
    * selective filter starves the candidate pool (a 1/s-selective filter
    * leaves 1/s fewer candidates per list, and the true filtered top-k
    * spreads over ~s× more lists) — recall collapses. The standard
    * remedy (FAISS/Milvus pre-filtering): scale nprobe by 1/selectivity,
    * capped at nlist. The cap is graceful degradation, not failure: at
    * full probe the search is an EXACT scan of the filter's survivors,
    * whose cost the filter already cut by s — the scanned fraction
    * (nprobe/nlist)·s stays bounded by the unfiltered operating point,
    * so cost never regresses while recall is restored.
    *
    * Selectivity is measured with one count aggregation over `assigned`
    * (cheap: no vectors move; at scale, derive it from column stats or
    * a sample instead). */
  def ivfTopKFiltered(assigned: DataFrame, centroids: Seq[Seq[Float]],
                      queryVec: Seq[Float], pred: Column, k: Int = 10,
                      nprobe: Int = 4,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = assigned.agg(
      count(lit(1)).as("n"),
      count(when(pred, 1)).as("kept")).head
    val sel = if (c.getLong(0) == 0L) 1.0
              else math.max(c.getLong(1).toDouble / c.getLong(0), 1e-9)
    val scaled = math.min(centroids.size, math.ceil(nprobe / sel).toInt)
    ivfTopK(assigned.filter(pred), centroids, queryVec, k, scaled, idCol, vecCol)
  }
}
