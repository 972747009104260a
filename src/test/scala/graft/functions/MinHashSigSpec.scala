package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MinHashSig]] must be BIT-IDENTICAL to the composable SQL pipeline it
  * replaces in q20/q21 (r17):
  * {{{
  *   WITH g AS (SELECT doc_id, word_shingles(text, 3) AS sh FROM d)
  *   SELECT doc_id, MIN(md5('1' || sh)) AS h1, …, MIN(md5('4' || sh)) AS h4
  *   FROM g GROUP BY doc_id
  * }}}
  * The q20 oracle hash-compares these hex strings, so "close" is failure.
  * Checked on adversarial inputs (short texts that hit the raw-text
  * fallback, empty/whitespace-only strings, unicode, NULL) and on the
  * real corpus. */
class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  /** The SQL-pipeline form (per-doc grouped mins over exploded shingles). */
  private def chain(df: org.apache.spark.sql.DataFrame) = {
    df.createOrReplaceTempView("mh_docs")
    df.sparkSession.sql(
      """SELECT doc_id,
        |  MIN(md5(concat('1', sh))) AS h1, MIN(md5(concat('2', sh))) AS h2,
        |  MIN(md5(concat('3', sh))) AS h3, MIN(md5(concat('4', sh))) AS h4
        |FROM (SELECT doc_id, sh
        |      FROM mh_docs LATERAL VIEW word_shingles(text, 3) g AS sh) t
        |GROUP BY doc_id""".stripMargin)
  }

  private def fused(df: org.apache.spark.sql.DataFrame) = {
    df.createOrReplaceTempView("mh_docs2")
    df.sparkSession.sql(
      """SELECT doc_id, h1, h2, h3, h4
        |FROM mh_docs2 LATERAL VIEW minhash_sig(text, 3) m""".stripMargin)
  }

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = chain(df).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val b = fused(df).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (id, v) => assert(b(id) === v, s"doc $id") }
  }

  test("bit-identical to the SQL pipeline on edge cases") {
    import spark.implicits._
    val cases: Seq[(Long, String)] = Seq(
      1L -> "one two three four five",     // normal n-gram path
      2L -> "one two",                     // < n words: raw-text fallback
      3L -> "single",                      // 1 word
      4L -> "",                            // empty: fallback on ""
      5L -> "   ",                         // whitespace-only: empties kept
      6L -> "a  b\tc\nd",                  // mixed whitespace
      7L -> " leading and trailing ",      // empty edge tokens
      8L -> "unicode été 中文 naïve über",  // multi-byte UTF-8
      9L -> ("w " * 600 + "end"),          // long doc
      10L -> "dup dup dup dup dup")        // identical shingles
    assertParity(cases.toDF("doc_id", "text"))
  }

  test("NULL text emits no row (matches the GROUP BY form dropping it)") {
    import spark.implicits._
    val df = Seq((1L, Option("a b c d")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(fused(df).collect().map(_.getLong(0)).toSet === Set(1L))
    assertParity(df)
  }

  test("bit-identical on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val j = chain(docs).alias("a").join(fused(docs).alias("b"), Seq("doc_id"), "full_outer")
    val bad = j.filter(
      not(col("a.h1") <=> col("b.h1")) || not(col("a.h2") <=> col("b.h2")) ||
      not(col("a.h3") <=> col("b.h3")) || not(col("a.h4") <=> col("b.h4")))
    assert(bad.count() === 0)
  }
}
