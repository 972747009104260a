package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: total shuffle bytes written + records for registry queries —
  * the objective number behind "shuffle fewer bytes" claims (guide §2.3).
  * Usage: runMain graft.tools.ShuffleProbe <sfDir> <q1,q2,...>
  * Each query runs twice (cold registers lazily-built indexes etc.); the
  * SECOND run's deltas are reported. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var bytes = 0L
    @volatile var records = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
    })
    names.foreach { name =>
      val spec = graft.QueryRegistry.byName(name)
      spec.fn(spark, sfDir).count() // warm (indexes, codegen)
      // settle listener events from the warm run
      org.apache.spark.sql.graftbridge.ListenerBridge.flush(spark.sparkContext)
      val (b0, r0) = (bytes, records)
      val t0 = System.nanoTime()
      val n = spec.fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.ListenerBridge.flush(spark.sparkContext)
      println(f"[shuffle] $name rows=$n shuffle_bytes=${bytes - b0}%,d " +
        f"shuffle_records=${records - r0}%,d time=$s%.2f s")
    }
    spark.stop()
  }
}
