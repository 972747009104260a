package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup: the tiled within-cluster pairing must equal brute force over
  * the same assignment, and the end-to-end resolution must equal a local
  * union-find over those brute-force pairs — on the real embeddings
  * testdata, robust to whatever the k-means run produces. */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
  def emb: DataFrame = graft.Tables.load(spark, sfDir, "embeddings")

  def localCos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    d / math.sqrt(na * nb)
  }

  val Threshold = 0.35
  val NClusters = 8

  // one deterministic-enough clustering shared by all tests (Lloyd means
  // can wobble in the last ulp between runs; assertions all run against
  // THIS materialized assignment, never a re-run)
  lazy val assigned: DataFrame = {
    val (a, _) = Similarity.ivfAssign(emb, nlist = NClusters, iters = 2)
    a.cache()
  }

  lazy val local: Map[Long, (Int, Seq[Float])] = assigned.collect()
    .map(r => r.getLong(0) -> (r.getInt(2), r.getSeq[Float](1))).toMap

  lazy val brutePairs: Set[(Long, Long)] = {
    val ids = local.keys.toSeq.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1 until ids.size).iterator
      a = ids(i); b = ids(j)
      if local(a)._1 == local(b)._1 // same cluster
      if localCos(local(a)._2, local(b)._2) >= Threshold
    } yield (a, b)).toSet
  }

  test("tiled within-cluster pairing equals brute force over the same assignment") {
    val tiled = SemDedup.withinClusterPairs(assigned, Threshold, tiles = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiled === brutePairs)
    assert(brutePairs.nonEmpty, "fixture must produce at least one semantic pair")
    // and each pair appears exactly once (no tiling double-count)
    val cnt = SemDedup.withinClusterPairs(assigned, Threshold, tiles = 4).count()
    assert(cnt === brutePairs.size.toLong)
  }

  test("tiling is exact for any tile count") {
    Seq(1, 3, 8).foreach { t =>
      val s = SemDedup.withinClusterPairs(assigned, Threshold, tiles = t)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(s === brutePairs, s"tiles=$t")
    }
  }

  test("resolution equals a local union-find over the brute-force pairs") {
    val parent = scala.collection.mutable.Map.empty[Long, Long] ++
      local.keys.map(k => k -> k)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    brutePairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = local.keys.map(k => k -> find(find(k))).toMap
    // expected label = component min; union-by-min above keeps roots minimal
    val out = SemDedup.semDedupAssigned(emb, assigned, Threshold, tiles = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expected)
    // survivors: exactly one per component, and they are the minima
    val survivors = out.filter { case (id, cl) => id == cl }.keySet
    assert(survivors === expected.values.toSet)
  }

  test("semantic dup of a different cluster's member is (by design) not merged") {
    // contract documentation test: cross-cluster pairs are never formed
    val cross = SemDedup.withinClusterPairs(assigned, Threshold, tiles = 4)
      .join(assigned.select(col("vec_id").as("id_a"), col("list_id").as("ca")), "id_a")
      .join(assigned.select(col("vec_id").as("id_b"), col("list_id").as("cb")), "id_b")
      .where(col("ca") =!= col("cb")).count()
    assert(cross === 0L)
  }
}
