package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Commit safety across PROCESS boundaries: a forked second JVM (own
  * SparkSession, own metadata caches, nothing shared but the warehouse
  * directory) races this JVM through concurrent branch creations and
  * appends. The single-JVM 8-writer spec in LakeTableSpec proves the
  * optimistic-retry loop; this proves the part that loop delegates to the
  * FILESYSTEM — exclusive version-file publish — holds when the writers
  * cannot share so much as a JVM lock, which is where the reference's
  * separate-process catalog lives (docker-compose.yml:35-48). */
class CrossProcessCommitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("two JVMs racing commits: linear history, every commit survives") {
    val warehouse = Files.createTempDirectory("graft-xproc").toString
    val cat = new LakeCatalog(spark, warehouse)
    val t = cat.createTable("xp.t", StructType(Seq(
      StructField("id", LongType), StructField("src", StringType))))
    import spark.implicits._
    t.append(Seq((0L, "seed")).toDF("id", "src")) // branches need a head

    val nCommits = 8; val nAppends = 3
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin, "-cp", System.getProperty("java.class.path"),
      "-Xmx2g", "-Dspark.ui.enabled=false") ++ addOpens ++
      Seq("graft.lake.CommitRacerMain", warehouse, "xp.t", "w1",
        nCommits.toString, nAppends.toString)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(Paths.get(warehouse, "racer.log").toFile)
    val child = pb.start()
    try {
      // wait for the child's SparkSession, then start both sides together
      val ready = Paths.get(warehouse, "racer-ready")
      val deadline = System.nanoTime() + 120_000_000_000L
      while (!Files.exists(ready) && child.isAlive && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(Files.exists(ready), s"child never became ready; log:\n" +
        new String(Files.readAllBytes(Paths.get(warehouse, "racer.log"))))
      Files.write(Paths.get(warehouse, "racer-go"), "go".getBytes)
      (0 until math.max(nCommits, nAppends)).foreach { i =>
        if (i < nCommits) t.createBranch(s"parent-$i")
        if (i < nAppends) t.append(Seq((2000L + i, s"parent-$i")).toDF("id", "src"))
      }
      assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "child did not finish")
      assert(child.exitValue() === 0, "child failed; log:\n" +
        new String(Files.readAllBytes(Paths.get(warehouse, "racer.log"))))
    } finally if (child.isAlive) child.destroyForcibly()

    val m = cat.loadTable("xp.t").meta
    // every branch from BOTH processes exists — no lost commits
    (0 until nCommits).foreach { i =>
      assert(m.refs.contains(s"parent-$i"), s"lost parent-$i")
      assert(m.refs.contains(s"child-w1-$i"), s"lost child-w1-$i")
    }
    // every appended row from both processes is readable
    val rows = cat.loadTable("xp.t").toDF.collect()
    assert(rows.length === 1 + 2 * nAppends)
    // linear history: version files are contiguous v1..vN with no gaps,
    // and each snapshot's parent is a snapshot that exists
    val versions = new java.io.File(s"$warehouse/xp/t/metadata").listFiles()
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt).sorted.toSeq
    assert(versions === (1 to versions.max))
    assert(versions.max === m.version)
    // 1 create + (1 + 2*nAppends) appends + 2*nCommits branch commits
    assert(m.version === 1 + 1 + 2 * nAppends + 2 * nCommits)
    val ids = m.snapshots.map(_.snapshotId).toSet
    m.snapshots.foreach(s => s.parentId.foreach(p =>
      assert(ids.contains(p), s"snapshot ${s.snapshotId} orphaned parent $p")))
    // appends form ONE chain: total-records of the head equals all rows
    assert(m.currentSnapshot.get.files.map(_.rowCount).sum === 1 + 2 * nAppends)
  }
}
