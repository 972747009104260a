package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[WordShingles]]' r18 `distinct` variant must emit exactly the DISTINCT
  * (doc_id, sh) set of the plain generator — q52's dedup now happens
  * inside the generator (before any shuffle), so a drift here silently
  * changes which shingles exist, which the q52 oracle hash would catch
  * only downstream. */
class WordShinglesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  private def shinglesOf(text: String, n: Int, distinct: Boolean): Seq[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    val gen = WordShingles(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(text),
        org.apache.spark.sql.types.StringType), n, distinct)
    gen.eval(null).iterator.map(_.getUTF8String(0).toString).toSeq
  }

  test("distinct variant == plain variant deduped (first occurrence kept)") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "bb", "ccc", "dd", "e")
    for (_ <- 1 to 300) {
      val words = Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
      val text = words.mkString(" ")
      for (n <- 1 to 3) {
        assert(shinglesOf(text, n, distinct = true) ==
          shinglesOf(text, n, distinct = false).distinct,
          s"n=$n text='$text'")
      }
    }
  }

  test("short-text fallback and whitespace-split semantics are shared") {
    // < n words → the raw text once (both variants)
    assert(shinglesOf("one two", 3, distinct = true) == Seq("one two"))
    assert(shinglesOf("one two", 3, distinct = false) == Seq("one two"))
    // split("\\s+", -1) keeps the leading-empty artifact, like the plain form
    assert(shinglesOf(" x y z", 3, distinct = true) ==
      shinglesOf(" x y z", 3, distinct = false).distinct)
    // duplicate-only doc collapses to one shingle
    assert(shinglesOf("w w w w w", 3, distinct = true) == Seq("w w w"))
    assert(shinglesOf("w w w w w", 3, distinct = false).size == 3)
  }

  test("SQL registration: word_shingles_distinct == SELECT DISTINCT over word_shingles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hot hot hot hot dup dup tail"),
      (2L, "a b c a b c a b c"),
      (3L, "solo"),
      (4L, "")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ws_docs")
    val viaDistinctAgg = spark.sql(
      """SELECT DISTINCT doc_id, sh
        |FROM ws_docs LATERAL VIEW word_shingles(text, 3) g AS sh""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val viaGenerator = spark.sql(
      """SELECT doc_id, sh
        |FROM ws_docs LATERAL VIEW word_shingles_distinct(text, 3) g AS sh""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaGenerator.toSet == viaDistinctAgg)
    assert(viaGenerator.length == viaGenerator.toSet.size, "no duplicates emitted")
  }
}
