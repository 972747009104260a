package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling ([[Dsir]]): the fixed-point scoring must
  * equal a from-first-principles recomputation (smoothed bucket models,
  * quantized log-ratio, integer sums), and selection must prefer
  * target-vocabulary docs with a deterministic tie-break. */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("scores equal a naive local recomputation") {
    val target = docs(1L -> "the cat sat", 2L -> "the dog sat")
    val pool = docs(
      10L -> "the cat ran", 11L -> "zebra quux flurb",
      12L -> "the the the", 13L -> "dog cat sat the")
    val got = Dsir.importanceScores(pool,
        Dsir.bucketLogRatios(target, pool))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // naive recomputation with plain Scala
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(md.take(3), 16)
    }
    def model(texts: Seq[String]) =
      texts.flatMap(toks).groupBy(bucket).map { case (b, ws) => b -> ws.size.toLong }
    val tm = model(Seq("the cat sat", "the dog sat"))
    val sm = model(Seq("the cat ran", "zebra quux flurb", "the the the", "dog cat sat the"))
    val (tt, st) = (tm.values.sum, sm.values.sum)
    def lr(b: Long): Long = math.floor(math.log(
      ((tm.getOrElse(b, 0L) + 1).toDouble / (tt + 4096)) /
        ((sm.getOrElse(b, 0L) + 1).toDouble / (st + 4096))) * 1e6).toLong
    val expect = Map(
      10L -> "the cat ran", 11L -> "zebra quux flurb",
      12L -> "the the the", 13L -> "dog cat sat the"
    ).map { case (id, text) =>
      id -> toks(text).map(bucket).groupBy(identity)
        .map { case (b, bs) => bs.size.toLong * lr(b) }.sum
    }
    assert(got === expect)
  }

  test("bigram scores equal a naive local recomputation (r15: Xie et " +
    "al.'s headline config is hashed bigrams)") {
    val target = docs(1L -> "the cat sat", 2L -> "the dog  sat")
    val pool = docs(
      10L -> "  the cat ran", 11L -> "zebra quux flurb",
      12L -> "the the the", 13L -> "x") // one-token doc: zero bigrams
    val got = Dsir.importanceScores(pool,
        Dsir.bucketLogRatios(target, pool, ngrams = 2), ngrams = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def grams(s: String) = toks(s).sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")).toSeq
    def bucket(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(md.take(3), 16)
    }
    def model(texts: Seq[String]) =
      texts.flatMap(grams).groupBy(bucket).map { case (b, ws) => b -> ws.size.toLong }
    val tm = model(Seq("the cat sat", "the dog  sat"))
    val poolTexts = Map(10L -> "  the cat ran", 11L -> "zebra quux flurb",
      12L -> "the the the", 13L -> "x")
    val sm = model(poolTexts.values.toSeq)
    val (tt, st) = (tm.values.sum, sm.values.sum)
    def lr(b: Long): Long = math.floor(math.log(
      ((tm.getOrElse(b, 0L) + 1).toDouble / (tt + 4096)) /
        ((sm.getOrElse(b, 0L) + 1).toDouble / (st + 4096))) * 1e6).toLong
    val expect = poolTexts.collect { case (id, text) if grams(text).nonEmpty =>
      id -> grams(text).map(bucket).groupBy(identity)
        .map { case (b, bs) => bs.size.toLong * lr(b) }.sum
    }
    assert(got === expect, "docs with zero bigrams contribute no score row")
    assert(!got.contains(13L))
  }

  test("bigram selection prefers target PHRASING over shared vocabulary " +
    "in scrambled order") {
    // both pool docs use exactly the target's vocabulary — only word
    // ORDER differs, so unigram profiles tie and only bigrams separate
    val target = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta")
    val pool = docs(
      20L -> "alpha beta gamma delta",  // target phrasing
      21L -> "delta gamma beta alpha")  // same bag, scrambled order
    val top = Dsir.select(pool, target, k = 1, ngrams = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top === Seq(20L),
      s"bigram profile must separate phrasing, got $top")
  }

  test("native HashedGrams path ≡ composable-HOF path, row for row " +
    "(r16: the generator emits the md5 top-12-bits bucket directly)") {
    import spark.implicits._
    val rows = Seq[(Long, String)](
      1L -> "The Cat SAT on the mat",
      2L -> "  leading and   multiple   spaces  ",
      3L -> "tabs\tand\nnewlines\r\nmixed nbsp", //   is NOT \s
      4L -> "unicode: Grüße ÖL straße ÉTÉ ĲS",
      5L -> "x",                    // one token: zero bigrams
      6L -> "",                     // empty: zero everything
      7L -> "repeat repeat repeat repeat",
      8L -> "punct, still. one;token:each!") ++
      Seq((9L, null.asInstanceOf[String]))
    val df = rows.toDF("doc_id", "text")
    for (n <- 1 to 4) {
      val native = Dsir.bucketCounts(df, ngrams = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val hof = Dsir.bucketCountsHof(df, ngrams = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(native.toSeq === hof.toSeq, s"ngrams=$n")
    }
    // buckets stay inside the 4096-bucket domain
    val all = Dsir.bucketCounts(df).select("bucket").collect().map(_.getLong(0))
    assert(all.forall(b => b >= 0 && b < 4096))
  }

  test("selection prefers target-like docs; deterministic tie-break") {
    val target = docs(1L -> "alpha beta gamma", 2L -> "alpha beta delta")
    val pool = docs(
      20L -> "alpha beta gamma",   // pure target vocabulary
      21L -> "xray yankee zulu",   // disjoint vocabulary
      22L -> "alpha zulu zulu")    // mixed
    val top = Dsir.select(pool, target, k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(top.head === 20L, s"pure-target doc must rank first, got $top")
    assert(!top.contains(21L), "disjoint-vocabulary doc must rank last")
    // identical text → identical score → id ascending
    val twins = docs(30L -> "alpha beta", 31L -> "alpha beta")
    val t2 = Dsir.select(twins, target, k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(t2 === Seq(30L, 31L))
  }
}
