package graft.lake

import org.apache.spark.sql.SparkSession

/** Child-process half of [[CatalogServiceSpec]]'s cross-process race: a
  * SECOND JVM whose engine resolves and commits the table THROUGH the
  * catalog service at `uri` — the two processes share the DATA warehouse
  * (object-store role) but no metadata path, no JVM lock, no version
  * cache; the only serialization point is the server's conditional put.
  *
  * Protocol mirrors [[CommitRacerMain]]: write `racer-ready`, wait for
  * `racer-go`, run `nAppends` one-row appends + `nCommits` branch
  * creations, write `racer-done`, exit 0.
  * Args: uri warehouse tableIdent workerId nCommits nAppends. */
object CatalogRacerMain {
  def main(args: Array[String]): Unit = {
    val Array(uri, warehouse, ident, workerId, nCommitsS, nAppendsS) = args
    val nCommits = nCommitsS.toInt
    val nAppends = nAppendsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cat = new RemoteLakeCatalog(spark, warehouse, uri)
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
