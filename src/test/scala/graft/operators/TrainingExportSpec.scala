package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Trainer shard export ([[TrainingExport]]): the contract is
  * DETERMINISM (same corpus + seed → identical shard content AND order,
  * independent of input partitioning), exact partition (every row in
  * exactly one shard), uniform balance, and a different seed being a
  * genuinely different permutation. */
class TrainingExportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(parts: Int) = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"doc $i", (i % 7).toString))
      .toDF("doc_id", "text", "lang").repartition(parts)
  }

  test("export is deterministic across runs and input partitionings") {
    val out1 = Files.createTempDirectory("graft-te1").toString
    val out2 = Files.createTempDirectory("graft-te2").toString
    // different input partitioning (4 vs 13) must not change the output
    val m1 = TrainingExport.writeShards(corpus(4), "doc_id", out1, nShards = 8)
      .collect().map(_.toSeq).toSeq
    val m2 = TrainingExport.writeShards(corpus(13), "doc_id", out2, nShards = 8)
      .collect().map(_.toSeq).toSeq
    assert(m1 === m2, "manifests (order-sensitive fingerprints) must be identical")
    // row-level: shard 3 reads back identically, in identical order
    val r1 = TrainingExport.readShard(spark, out1, 3, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val r2 = TrainingExport.readShard(spark, out2, 3, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r1 === r2 && r1.nonEmpty)
    // the within-shard order is a shuffle, not id order
    assert(r1 !== r1.sorted, "training order must be a permutation, not id order")
  }

  test("shards partition the corpus exactly and balance uniformly") {
    val out = Files.createTempDirectory("graft-te3").toString
    val m = TrainingExport.writeShards(corpus(4), "doc_id", out, nShards = 8)
      .collect()
    val counts = m.map(r => r.getLong(1))
    assert(counts.sum === 2000L, "every row in exactly one shard")
    assert(m.length === 8)
    val mean = 2000.0 / 8
    assert(counts.forall(c => c > mean * 0.7 && c < mean * 1.3),
      s"hash sharding must balance: ${counts.toSeq}")
    // exact partition at the id level
    val all = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(all === (0L until 2000L))
  }

  test("a different seed is a different permutation; same seed reproduces") {
    val a = TrainingExport.shardAssign(corpus(4), "doc_id", 8, seed = 1L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = TrainingExport.shardAssign(corpus(4), "doc_id", 8, seed = 2L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val same = TrainingExport.shardAssign(corpus(4), "doc_id", 8, seed = 1L)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === same, "same seed must reproduce the assignment")
    assert(a !== b, "different seeds must differ")
    assert(a.count { case (k, v) => b(k) == v } < 600,
      "seeds must decorrelate (expect ~1/8 agreement)")
  }
}
