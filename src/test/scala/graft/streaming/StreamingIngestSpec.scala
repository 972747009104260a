package graft.streaming

import graft.operators.IncrementalDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming corpus-ingestion pipeline, end to end: a document stream
  * quality-gated, deduped against EVERYTHING previously accepted (the
  * persistent MinHash signature index), and appended to a versioned lake
  * corpus — each micro-batch via foreachBatch. This is the online
  * composition of q69's batch stages: the operators are individually
  * proven (IncrementalDedupSpec pins ingest to a greedy simulation;
  * LakeTableSpec pins the commit semantics); this spec proves the
  * STREAMING wiring — per-batch lake commits, cross-batch dedup state
  * carried by the index table, quality gate fused ahead of signatures. */
class StreamingIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()

  val IndexSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("doc_id", LongType),
    StructField("signature", ArrayType(LongType))))

  val CorpusSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("stream → quality gate → incremental dedup → lake corpus, per-batch commits") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-ingest").toString
    val cat = new graft.lake.LakeCatalog(spark, wh)
    val index = cat.createTable("ing.sig_index", IndexSchema)
    val corpus = cat.createTable("ing.corpus", CorpusSchema)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val q = docs.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val quality = batch.filter(size(split(trim(col("text")), "\\s+")) >= 3)
        val res = IncrementalDedup.ingest(index, quality)
        corpus.append(res.survivors.select("doc_id", "text"))
        ()
      }
      .start()
    try {
      val t1 = "alpha beta gamma delta epsilon zeta eta theta"
      val t2 = "completely different vocabulary nothing shared with others"
      val t4 = "unique fresh content words appearing nowhere else"
      mem.addData((1L, t1), (2L, t2))
      q.processAllAvailable()
      // batch 2: an exact dup of doc 1 (cross-batch, must hit the index),
      // plus a fresh doc
      mem.addData((3L, t1), (4L, t4))
      q.processAllAvailable()
      // batch 3: an exact dup of doc 4, a quality-gated fragment, a fresh doc
      mem.addData((5L, t4), (6L, "ab"),
        (7L, "final batch brings genuinely novel material again"))
      q.processAllAvailable()

      val kept = corpus.toDF.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq === Seq(1L, 2L, 4L, 7L))
      // one corpus commit per NON-EMPTY micro-batch (3 appends), each a
      // readable snapshot — the versioned-ingest contract
      val appended = corpus.meta.snapshots.filter(_.operation == "append")
      assert(appended.size === 3)
      // the index holds signatures for exactly the survivors
      val indexed = index.toDF.select("doc_id").distinct()
        .collect().map(_.getLong(0)).sorted
      assert(indexed.toSeq === Seq(1L, 2L, 4L, 7L))
    } finally q.stop()
  }

  test("auto-compaction keeps the live file count bounded across many triggers (r9)") {
    // Continuous ingest is the small-files factory: one commit (and ≥1
    // file) per trigger, forever. autoCompact after each batch keeps the
    // LIVE file set bounded without disturbing content, history, or the
    // append-only stream-read contract (bp-* rewrites are never
    // re-delivered; only app-* appends are).
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-compact").toString
    val cat = new graft.lake.LakeCatalog(spark, wh)
    val corpus = cat.createTable("ing.corpus2", CorpusSchema)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt2").toString
    val q = docs.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        corpus.append(batch.select("doc_id", "text").coalesce(1))
        corpus.autoCompact(everyCommits = 3)
        ()
      }
      .start()
    try {
      (0 until 9).foreach { b =>
        mem.addData((b.toLong, s"document number $b with some words"))
        q.processAllAvailable()
      }
      // all 9 docs present, exactly once
      assert(corpus.toDF.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        (0L until 9L))
      val snap = corpus.meta.currentSnapshot.get
      // 9 append commits happened, but compaction keeps live files bounded
      assert(corpus.meta.snapshots.count(_.operation == "append") === 9)
      assert(snap.files.size < 9,
        s"auto-compaction must bound the live file count, got ${snap.files.size}")
      assert(corpus.meta.snapshots.exists(_.summary.contains("binpack-rewritten-files")))
      // the append-only incremental read-back delivers each doc exactly
      // once: bp-* compaction outputs are not re-delivered
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-stream-ckpt3").toString
      val seen = collection.mutable.ArrayBuffer[Long]()
      val reader = Changelog.streamRead(corpus).writeStream
        .option("checkpointLocation", ckpt2)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          seen ++= b.select("doc_id").collect().map(_.getLong(0)); ()
        }
        .start()
      try {
        reader.processAllAvailable()
        assert(seen.sorted.toSeq === (0L until 9L),
          "stream read must deliver appends exactly once, never compaction rewrites")
      } finally reader.stop()
    } finally q.stop()
  }
}
