package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Checkpoint-recovery semantics (the reference's T4 exactly-once claim is
  * checkpoint recovery — IcebergStream.java:84): kill a query mid-stream,
  * restart from the same checkpointLocation, and the result must equal a
  * never-stopped run — state carried over, no batch double-applied. */
class RestartRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()

  test("transformWithState: stop + restart from checkpoint resumes RocksDB state exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
      val mem = MemoryStream[(String, Double)]
      def out() = EventTime.runningUserAggTws(mem.toDF().toDF("user_id", "value"))
      // the memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable sink (and the one real deployments use here)
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Double)]()
      def start() = out().writeStream
        .option("checkpointLocation", ckpt).outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventTime.UserAgg], _: Long) =>
          b.collect().foreach(u => seen.add((u.userId, u.nEvents, u.revenue)))
          ()
        }.start()

      // phase 1: two batches, then STOP
      val q1 = start()
      try {
        mem.addData(("u1", 10.0), ("u2", 1.0))
        q1.processAllAvailable()
        mem.addData(("u1", 5.0))
        q1.processAllAvailable()
      } finally q1.stop()

      // phase 2: RESTART from the same checkpoint, feed more
      val q2 = start()
      try {
        mem.addData(("u1", 2.5), ("u2", 1.5))
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val last = seen.asScala.toSeq
          .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
        // totals equal a never-stopped run: counts include pre-restart
        // events exactly once (double-apply would give u1 -> (5, 32.5))
        assert(last("u1") === ("u1", 3L, 17.5))
        assert(last("u2") === ("u2", 2L, 2.5))
      } finally q2.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("lake CDC ingest: restart from checkpoint; replayed batch not double-applied") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val cat = new graft.lake.LakeCatalog(spark,
      Files.createTempDirectory("graft-restart-wh").toString)
    val t = cat.createTable("s.accounts", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bal", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType))))
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val mem = MemoryStream[(String, Long, Double, Long)]
    def parsed() = mem.toDF().toDF("op", "id", "bal", "seq")

    // phase 1: insert + update, then stop
    val q1 = Changelog.startIngest(t, parsed(), key = "id", seqCol = "seq",
      checkpointDir = ckpt, triggerMs = 50L)
    try {
      mem.addData(("I", 1L, 100.0, 1L), ("I", 2L, 200.0, 2L))
      q1.processAllAvailable()
      mem.addData(("U", 1L, 150.0, 3L))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterPhase1 = t.toDF.select("id", "bal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(afterPhase1 === Map(1L -> 150.0, 2L -> 200.0))
    val snapshotsAfterP1 = t.meta.snapshots.size

    // phase 2: restart from the same checkpoint — Spark REPLAYS the last
    // batch into foreachBatch; the batch-id marker must skip it (no new
    // snapshot, no resurrected pre-update values), then new data applies
    val q2 = Changelog.startIngest(t, parsed(), key = "id", seqCol = "seq",
      checkpointDir = ckpt, triggerMs = 50L)
    try {
      q2.processAllAvailable() // replay window, nothing new fed yet
      assert(t.meta.snapshots.size === snapshotsAfterP1,
        "checkpoint replay must not commit a duplicate batch")
      mem.addData(("U", 2L, 250.0, 4L), ("D", 1L, 0.0, 5L))
      q2.processAllAvailable()
    } finally q2.stop()
    val finalRows = t.toDF.select("id", "bal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // equal to a never-stopped run over the same changelog
    assert(finalRows === Map(2L -> 250.0))
  }

  test("lake CDC ingest on a MERGE-ON-READ table: restart + replay guard, " +
    "every batch an equality delete + appends") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val cat = new graft.lake.LakeCatalog(spark,
      Files.createTempDirectory("graft-restart-mor-wh").toString)
    val t = cat.createTable("s.accmor", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bal", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType))))
    t.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    val ckpt = Files.createTempDirectory("graft-ingest-mor-ckpt").toString
    val mem = MemoryStream[(String, Long, Double, Long)]
    def parsed() = mem.toDF().toDF("op", "id", "bal", "seq")

    val q1 = Changelog.startIngest(t, parsed(), key = "id", seqCol = "seq",
      checkpointDir = ckpt, triggerMs = 50L)
    try {
      mem.addData(("I", 1L, 100.0, 1L), ("I", 2L, 200.0, 2L))
      q1.processAllAvailable()
      mem.addData(("U", 1L, 150.0, 3L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(t.toDF.select("id", "bal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 150.0, 2L -> 200.0))
    // every upsert batch was O(batch): equality deletes accumulated, and
    // NO data file was ever rewritten (all files are app-* appends)
    val snapP1 = t.meta.currentSnapshot.get
    assert(snapP1.eqDeleteFiles.nonEmpty)
    assert(snapP1.files.forall(f =>
      new org.apache.hadoop.fs.Path(f.path).getName.startsWith("app-")))
    val snapshotsAfterP1 = t.meta.snapshots.size

    val q2 = Changelog.startIngest(t, parsed(), key = "id", seqCol = "seq",
      checkpointDir = ckpt, triggerMs = 50L)
    try {
      q2.processAllAvailable()
      assert(t.meta.snapshots.size === snapshotsAfterP1,
        "checkpoint replay must not commit a duplicate batch")
      mem.addData(("U", 2L, 250.0, 4L), ("D", 1L, 0.0, 5L))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(t.toDF.select("id", "bal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap === Map(2L -> 250.0))
    // maintenance folds the accumulated CDC masks; content unchanged
    t.convertEqualityDeletes()
    t.rewritePositionDeletes()
    assert(t.meta.currentSnapshot.get.eqDeleteFiles.isEmpty)
    assert(t.meta.currentSnapshot.get.deleteFiles.isEmpty)
    assert(t.toDF.select("id", "bal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap === Map(2L -> 250.0))
  }
}
