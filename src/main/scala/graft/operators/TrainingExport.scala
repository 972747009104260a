package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Trainer hand-off: materialize a curated corpus as N deterministic
  * shards — the last stage of every training-data pipeline (after
  * curation/dedup/packing, the trainer wants fixed shard files it can
  * assign to data-loader workers, in an order that is reproducible
  * WITHOUT any cross-run coordination).
  *
  * Design:
  *   - shard assignment and within-shard order are PURE FUNCTIONS of
  *     (seed, id): `xxhash64(seed, id)` → shard = pmod(h, n), order key =
  *     `xxhash64(seed+1, id)` — re-running the export on the same corpus
  *     and seed reproduces byte-identical shard CONTENT and ORDER on any
  *     cluster size (no repartition nondeterminism: the shard column is
  *     the partition key, and rows sort by the order key within files);
  *   - the seeded order key is a uniform permutation of each shard —
  *     the "global shuffle" training wants, without a global sort: cost
  *     is one hash-partition exchange + per-shard sort, shard-parallel;
  *   - shards land as `shard=K/` parquet directories (one file per shard
  *     by default — trainers map files to workers), plus a MANIFEST of
  *     per-shard row/byte counts and an order-sensitive content
  *     fingerprint, so a loader can verify integrity before a run.
  *
  * Scale shape: one exchange on the shard key (n-way), per-shard sort of
  * corpus/n rows, no driver materialization; the manifest is an n-row
  * aggregate. At 100 TB pick n so corpus/n fits a loader worker.
  */
object TrainingExport {

  /** `(shard, _te_ord)` assignment columns — deterministic in (seed, id). */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  seed: Long = 42L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard", pmod(xxhash64(lit(seed), col(idCol)), lit(nShards.toLong)).cast("int"))
      .withColumn("_te_ord", xxhash64(lit(seed + 1), col(idCol)))
  }

  /** Write the corpus as parquet under `outDir/shard=K/` with deterministic
    * content and within-file order; returns the manifest (one row per
    * shard: rows, an order-sensitive fingerprint chain, id bounds). */
  def writeShards(df: DataFrame, idCol: String, outDir: String,
                  nShards: Int, seed: Long = 42L,
                  filesPerShard: Int = 1): DataFrame = {
    require(filesPerShard > 0, "filesPerShard must be positive")
    val assigned = shardAssign(df, idCol, nShards, seed)
    // repartition ON THE SHARD VALUE: every row of a shard lands in one
    // task (deterministic task→content mapping), then sorts by the order
    // key so the written row order is a pure function of the data
    assigned
      .repartition(nShards * filesPerShard, col("shard"), pmod(col("_te_ord"), lit(filesPerShard.toLong)))
      .sortWithinPartitions(col("shard"), col("_te_ord"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)
    manifest(df.sparkSession.read.parquet(outDir), idCol)
  }

  /** Per-shard manifest over an exported (or re-read) shard tree:
    * row count, id bounds, and an ORDER-SENSITIVE fingerprint — each
    * row's hash is mixed with its position rank, so two manifests are
    * equal iff shard contents AND order are identical. */
  def manifest(shards: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = shards.withColumn("_te_rank",
      row_number().over(Window.partitionBy(col("shard")).orderBy(col("_te_ord"), col(idCol))))
    ranked.groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(idCol).as("min_id"), max(idCol).as("max_id"),
        // xor-fold of position-mixed hashes: overflow-free and still
        // order-sensitive (each row's hash encodes its rank)
        bit_xor(xxhash64(col(idCol), col("_te_rank"))).as("fingerprint"))
      .orderBy("shard")
  }

  /** Read one shard in training order. */
  def readShard(spark: org.apache.spark.sql.SparkSession, outDir: String,
                shard: Int, idCol: String): DataFrame =
    spark.read.parquet(outDir).filter(col("shard") === shard)
      .orderBy(col("_te_ord"), col(idCol))
}
