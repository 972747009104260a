package graft.lake

import org.apache.spark.sql.SparkSession

/** Child-process half of [[CrossProcessCommitSpec]]: a SECOND JVM with its
  * own SparkSession committing against a warehouse shared with the parent
  * test JVM — the reference's catalog runs as a separate process
  * (docker-compose.yml:35-48), so the commit protocol must serialize
  * writers that share NOTHING but the filesystem (no JVM locks, no shared
  * LakeTable handle, no common version cache).
  *
  * Protocol: write `racer-ready`, wait for `racer-go`, then interleave
  * `nCommits` branch creations with `nAppends` one-row appends, then write
  * `racer-done` and exit 0 (any failure → nonzero exit, which the spec
  * asserts on). Args: warehouse tableIdent workerId nCommits nAppends. */
object CommitRacerMain {
  def main(args: Array[String]): Unit = {
    val Array(warehouse, ident, workerId, nCommitsS, nAppendsS) = args
    val nCommits = nCommitsS.toInt
    val nAppends = nAppendsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cat = new LakeCatalog(spark, warehouse)
      val t = cat.loadTable(ident)
      val ready = java.nio.file.Paths.get(warehouse, "racer-ready")
      val go = java.nio.file.Paths.get(warehouse, "racer-go")
      java.nio.file.Files.write(ready, "ok".getBytes)
      val deadline = System.nanoTime() + 60_000_000_000L
      while (!java.nio.file.Files.exists(go) && System.nanoTime() < deadline)
        Thread.sleep(20)
      require(java.nio.file.Files.exists(go), "parent never signalled go")
      import spark.implicits._
      (0 until math.max(nCommits, nAppends)).foreach { i =>
        if (i < nCommits) t.createBranch(s"child-$workerId-$i")
        if (i < nAppends)
          t.append(Seq((1000L + i, s"child-$workerId-$i")).toDF("id", "src"))
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(warehouse, "racer-done"), "ok".getBytes)
      ()
    } finally spark.stop()
  }
}
