package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[MarkerCounts]] must be BIT-IDENTICAL to the q19 SQL form it replaces:
  * `size(filter(split(lower(text), '\s+'), w -> w IN (markers_i)))` per
  * marker set. q19's oracle hash-compares confusion counts derived from
  * these scores, so "close" is failure. */
class MarkerCountsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sets: Seq[(String, Seq[String])] = Seq(
    "s_de" -> Seq("der", "und", "das", "ist"),
    "s_en" -> Seq("the", "and", "of", "is"),
    "s_zh" -> Seq("的", "是", "了", "在"))

  private def hofForm(name: String, words: Seq[String]) =
    size(filter(split(lower(col("text")), "\\s+"),
      w => words.map(m => w === lit(m)).reduce(_ || _))).as(name)

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val fusedCols = sets.map { case (n, _) => col("m").getField(n).as(n) }
    val fused = df.select(col("id"),
        MarkerCounts.of(col("text"), sets).as("m"))
      .select(col("id") +: fusedCols: _*)
    val chain = df.select(col("id") +: sets.map { case (n, ws) => hofForm(n, ws) }: _*)
    val j = fused.alias("f").join(chain.alias("c"), "id")
    val bad = j.filter(sets.map { case (n, _) =>
      not(col(s"f.$n") <=> col(s"c.$n")) }.reduce(_ || _)).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("bit-identical to the HOF chain on edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "der THE und das ist is"),   // mixed case, cross-set hits
      (2L, ""),                          // empty text
      (3L, "   "),                       // whitespace only
      (4L, "的 是 了 在 的"),             // unicode markers with repeats
      (5L, "nothing matches here xyz"),
      (6L, "the\tand\nof\ris"),          // all whitespace kinds
      (7L, " the "),                     // empty edge tokens
      (8L, "THE AND OF IS DER")          // uppercase only
    ).toDF("id", "text")
    compare(df)
  }

  test("null text yields a null struct (SQL form yields null sizes)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option("the the")))
      .toDF("id", "text")
    val out = df.select(MarkerCounts.of(col("text"), sets).as("m")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getStruct(0).getInt(1) === 2)
  }

  test("bit-identical on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    compare(docs)
  }
}
