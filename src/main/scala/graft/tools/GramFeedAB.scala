package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev A/B for VERDICT r17 item 1 — the q95/q101 HashedGrams digest feed.
  * The r17 driver bench read q101 2.1× slower while the builder's A/B
  * read it faster; this tool adjudicates on one JVM, interleaved, by
  * timing JUST the disputed per-doc work (tokenize → md5 per gram →
  * bucket) over the real corpus text with three feed strategies:
  *
  *   r16  — build each gram STRING, one md5.digest(bytes) per gram
  *   r17  — no gram string, feed md5 word-by-word (2n−1 update calls)
  *   r18  — join words once per doc, one update(buf, off, len) per gram
  *
  * Everything else (scan, wiring) is identical across variants. Digest
  * results are asserted equal. Usage:
  *   runMain graft.tools.GramFeedAB <sfDir> <n> [reps]
  */
object GramFeedAB {

  private def words(text: String): Array[String] = {
    val split = text.toLowerCase.split("\\s+", -1)
    val cnt = split.count(_.nonEmpty)
    if (cnt == split.length) split else split.filter(_.nonEmpty)
  }

  private def bucketOf(d: Array[Byte]): Long =
    (((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)).toLong

  /** r16: gram string then one digest call. */
  def sumR16(md: java.security.MessageDigest, ws: Array[String], n: Int): Long = {
    if (ws.length < n) return 0L
    var acc = 0L
    var k = 0
    while (k <= ws.length - n) {
      val gram =
        if (n == 1) ws(k)
        else {
          val sb = new java.lang.StringBuilder(ws(k))
          var j = 1
          while (j < n) { sb.append(' ').append(ws(k + j)); j += 1 }
          sb.toString
        }
      acc += bucketOf(md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      k += 1
    }
    acc
  }

  /** r17: word-by-word incremental feed. */
  def sumR17(md: java.security.MessageDigest, ws: Array[String], n: Int): Long = {
    if (ws.length < n) return 0L
    val wb = ws.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var acc = 0L
    var k = 0
    while (k <= ws.length - n) {
      md.update(wb(k))
      var j = 1
      while (j < n) { md.update(' '.toByte); md.update(wb(k + j)); j += 1 }
      acc += bucketOf(md.digest())
      k += 1
    }
    acc
  }

  /** r18: joined buffer, one update per gram. */
  def sumR18(md: java.security.MessageDigest, ws: Array[String], n: Int): Long = {
    if (ws.length < n) return 0L
    val m = ws.length
    val wb = new Array[Array[Byte]](m)
    var total = 0
    var i = 0
    while (i < m) {
      wb(i) = ws(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      total += wb(i).length
      i += 1
    }
    val buf = new Array[Byte](total + m - 1)
    val start = new Array[Int](m)
    var off = 0
    i = 0
    while (i < m) {
      if (i > 0) { buf(off) = ' '; off += 1 }
      start(i) = off
      System.arraycopy(wb(i), 0, buf, off, wb(i).length)
      off += wb(i).length
      i += 1
    }
    var acc = 0L
    var k = 0
    while (k <= m - n) {
      val from = start(k)
      md.update(buf, from, start(k + n - 1) + wb(k + n - 1).length - from)
      acc += bucketOf(md.digest())
      k += 1
    }
    acc
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val texts = graft.Tables.load(spark, sfDir, "documents")
      .select("text").as[String].filter(_ != null)
    def run(tag: String, f: (java.security.MessageDigest, Array[String], Int) => Long): Double = {
      val t0 = System.nanoTime()
      val acc = texts.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map(t => f(md, words(t), n))
      }.reduce(_ + _)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[gramfeed] $tag n=$n acc=$acc $s%.3f s")
      s
    }
    // warm all three once, then interleave
    run("r16", sumR16); run("r17", sumR17); run("r18", sumR18)
    val (a, b, c) = (Seq.newBuilder[Double], Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      a += run("r16", sumR16); b += run("r17", sumR17); c += run("r18", sumR18)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[gramfeed] MEDIANS n=$n r16=${med(a.result())}%.3f r17=${med(b.result())}%.3f r18=${med(c.result())}%.3f")
    spark.stop()
  }
}
