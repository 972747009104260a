package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Winnowed fingerprinting: deque selection vs a brute-force reference,
  * the w+k−1 match guarantee, md5/Karp-Rabin scheme agreement on
  * selection structure, normalization parity, and SQL registration. */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val k = 8
  private val w = 4

  /** Brute-force reference: normalized gram hashes, per-window argmin with
    * rightmost tie-break, distinct selected hashes sorted. Recomputes the
    * md5 scheme independently of the production helper. */
  private def reference(s: String): Seq[String] = {
    val norm = s.flatMap {
      case c if c >= '0' && c <= '9' => Some(c)
      case c if c >= 'a' && c <= 'z' => Some(c)
      case c if c >= 'A' && c <= 'Z' => Some((c + 32).toChar)
      case _ => None
    }.mkString
    if (norm.length < k + w - 1) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to norm.length - k).map { i =>
      md.reset()
      md.digest(norm.substring(i, i + k).getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val picked = scala.collection.mutable.LinkedHashSet[Int]()
    for (end <- (w - 1) until hs.length) {
      val win = (end - w + 1) to end
      val min = win.map(hs).min
      picked += win.filter(p => hs(p) == min).max // rightmost tie-break
    }
    picked.toSeq.map(hs).distinct.sorted
  }

  private val rnd = new scala.util.Random(42)
  private def randomDoc(len: Int): String =
    (0 until len).map { _ =>
      val r = rnd.nextInt(40)
      if (r < 26) ('a' + r).toChar
      else if (r < 30) ('0' + (r - 26)).toChar
      else if (r < 36) " .,!?X".charAt(r - 30)
      else ' '
    }.mkString

  test("deque selection matches the brute-force reference on random docs") {
    for (_ <- 1 to 200) {
      val doc = randomDoc(5 + rnd.nextInt(400))
      assert(WinnowFingerprints.ofString(doc, k, w) == reference(doc), s"doc=$doc")
    }
  }

  test("guarantee: a shared run of >= w+k-1 normalized chars yields a shared fingerprint") {
    for (_ <- 1 to 100) {
      val common = randomDoc(k + w - 1).filter(_.isLetterOrDigit) match {
        case s if s.length >= k + w - 1 => s
        case s => s + ("x" * (k + w - 1 - s.length))
      }
      val a = randomDoc(100) + common + randomDoc(100)
      val b = randomDoc(80) + common + randomDoc(120)
      for (rolling <- Seq(false, true)) {
        val fa = WinnowFingerprints.ofString(a, k, w, rolling).toSet
        val fb = WinnowFingerprints.ofString(b, k, w, rolling).toSet
        assert(fa.intersect(fb).nonEmpty,
          s"rolling=$rolling common=$common")
      }
    }
  }

  test("rolling scheme selects the same POSITIONS structure density as md5 (~2/(w+1))") {
    // Different hash functions select different positions, but both are
    // uniform, so the winnowing density bound applies to each: expected
    // 2/(w+1) = 0.4, and never fewer than 1 per window step.
    val doc = randomDoc(4000)
    val normLen = doc.count(c => c.isLetterOrDigit)
    val grams = normLen - k + 1
    for (rolling <- Seq(false, true)) {
      val n = WinnowFingerprints.ofString(doc, k, w, rolling).size
      val density = n.toDouble / grams
      assert(density > 0.25 && density < 0.55, s"rolling=$rolling density=$density")
    }
  }

  test("normalization: case, punctuation, and whitespace are invisible") {
    val a = "The quick-brown FOX, jumps over 42 lazy dogs!! again and again."
    val b = "thequickbrownfoxjumpsover42lazydogsagainandagain"
    for (rolling <- Seq(false, true)) {
      assert(WinnowFingerprints.ofString(a, k, w, rolling) ==
        WinnowFingerprints.ofString(b, k, w, rolling))
    }
  }

  test("short docs: fewer than w grams after normalization -> empty") {
    assert(WinnowFingerprints.ofString("", k, w).isEmpty)
    assert(WinnowFingerprints.ofString("abc", k, w).isEmpty)
    assert(WinnowFingerprints.ofString("a" * (k + w - 2), k, w).isEmpty)
    assert(WinnowFingerprints.ofString("a" * (k + w - 1), k, w).size == 1)
  }

  test("long variant: numeric fingerprints == hex fingerprints parsed base-16, same order") {
    for (_ <- 1 to 100) {
      val doc = randomDoc(5 + rnd.nextInt(400))
      for (rolling <- Seq(false, true)) {
        val hexes = WinnowFingerprints.ofString(doc, k, w, rolling)
        val longs = WinnowFingerprints.ofStringLong(doc, k, w, rolling)
        assert(longs == hexes.map(java.lang.Long.parseLong(_, 16)),
          s"rolling=$rolling doc=$doc")
        assert(longs == longs.sorted && longs.forall(v => v >= 0 && v <= 0xffffffffL))
      }
    }
  }

  test("SQL registration: winnow_fingerprints_long matches the string form element-wise") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT winnow_fingerprints('The quick brown fox jumps over the lazy dog', 8, 4) AS f,
        |       winnow_fingerprints_long('The quick brown fox jumps over the lazy dog', 8, 4) AS fl
        |""".stripMargin).head()
    val hexes = row.getSeq[String](0)
    val longs = row.getSeq[Long](1)
    assert(longs == hexes.map(java.lang.Long.parseLong(_, 16)))
    assert(longs.nonEmpty)
  }

  test("SQL registration: winnow_fingerprints runs and respects the rolling flag") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT winnow_fingerprints('The quick brown fox jumps over the lazy dog', 8, 4) AS f,
        |       winnow_fingerprints('The quick brown fox jumps over the lazy dog', 8, 4, true) AS fr
        |""".stripMargin).head()
    val md5Fps = row.getSeq[String](0)
    val krFps = row.getSeq[String](1)
    assert(md5Fps == WinnowFingerprints.ofString(
      "The quick brown fox jumps over the lazy dog", 8, 4))
    assert(krFps == WinnowFingerprints.ofString(
      "The quick brown fox jumps over the lazy dog", 8, 4, rolling = true))
    assert(md5Fps.nonEmpty && krFps.nonEmpty && md5Fps != krFps)
  }
}
