package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): k-means-cluster the embeddings, then prune
  * within each cluster by pairwise cosine similarity, keeping one
  * representative per similarity component. Catches paraphrases and
  * re-renderings that token-level MinHash/Jaccard (q21/q22) can't see,
  * at a fraction of all-pairs cost: the cluster assignment bounds the
  * quadratic stage to within-cluster blocks.
  *
  * Composition of three existing scale-shaped operators — nothing new
  * shuffles here:
  *   1. [[Similarity.ivfAssign]] / [[Similarity.ivfAssignWith]]: Lloyd
  *      k-means where each step is one map-side-combined (list, dim)
  *      aggregate; assignment is a fused codegen'd projection (the
  *      [[graft.functions.NearestCentroid]] loop), zero shuffles.
  *   2. Within-cluster exact pairing with the q24 triangle tiling: every
  *      row gets tile g = pmod(hash(id), T); the a-side replicates to
  *      tile pairs (g, v≥g), the b-side to (u≤g, g), and pairs meet under
  *      the equi-key (cluster, u, v) — L·T(T+1)/2 shuffle keys, O(block/T)
  *      task memory, no one-task-per-cluster straggler. Exact for any
  *      T ≥ 1.
  *   3. [[Dedup.resolveClusters]]: connected components over the
  *      above-threshold pairs (size-gated driver union-find / distributed
  *      min-label loop) + one left join labeling every vector with its
  *      component minimum; survivors are `id == cluster_id`.
  *
  * By construction (and per the paper) duplicates that k-means separates
  * into different clusters are NOT found — that is the accepted
  * approximation that makes the method linear-ish; raise `nClusters`
  * quality by lowering per-cluster block size, not by global pairing.
  *
  * At 100 TB: clustering cost is one pass per Lloyd step; the pairing
  * shuffle is bounded by cluster block sizes (tune `tiles` to the largest
  * block); CC runs on candidate pairs only. No driver state beyond the
  * nClusters×dim centroid matrix.
  */
object SemDedup {

  /** Above-threshold cosine pairs within each cluster (exact triangle
    * tiling; `assigned` must carry (idCol, vecCol, clusterCol)). Output:
    * (id_a, id_b, cos) with id_a < id_b, each pair exactly once. */
  def withinClusterPairs(assigned: DataFrame, threshold: Double, tiles: Int = 8,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         clusterCol: String = "list_id"): DataFrame = {
    val base = assigned.select(col(idCol).as("vid"), col(clusterCol).as("cl"),
      col(vecCol).as("vec"), pmod(hash(col(idCol)), lit(tiles)).as("g"))
    val ta = base.select(col("vid"), col("cl"), col("vec"), col("g").as("u"),
      explode(sequence(col("g"), lit(tiles - 1))).as("v"))
    val tb = base.select(col("vid"), col("cl"), col("vec"),
      explode(sequence(lit(0), col("g"))).as("u"), col("g").as("v"))
    ta.alias("a").join(tb.alias("b"),
        col("a.cl") === col("b.cl") && col("a.u") === col("b.u") &&
          col("a.v") === col("b.v"))
      // same-tile tasks (u = v) see both roles of every row: keep a < b.
      // distinct-tile tasks see each cross pair once: keep all, orient.
      .where(col("a.u") < col("a.v") || col("a.vid") < col("b.vid"))
      .select(least(col("a.vid"), col("b.vid")).as("id_a"),
        greatest(col("a.vid"), col("b.vid")).as("id_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Full SemDeDup with a fresh k-means run: every vector labeled with its
    * semantic-duplicate component (`cluster_id` = component min id;
    * survivors are `idCol === cluster_id`). */
  def semDedup(embeddings: DataFrame, nClusters: Int = 16, threshold: Double = 0.95,
               iters: Int = 3, tiles: Int = 8,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assigned, _) = Similarity.ivfAssign(embeddings, nClusters, iters, idCol, vecCol)
    semDedupAssigned(embeddings, assigned, threshold, tiles, idCol, vecCol)
  }

  /** SemDeDup over a PREBUILT cluster assignment (e.g. the memoized IVF
    * index) — clustering paid once, dedup re-runs are pair+CC only. */
  def semDedupAssigned(embeddings: DataFrame, assigned: DataFrame,
                       threshold: Double, tiles: Int = 8,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = withinClusterPairs(assigned, threshold, tiles, idCol, vecCol)
    Dedup.resolveClusters(embeddings, pairs, idCol = idCol)
  }
}
