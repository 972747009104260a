package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TokenSetHash]] must be BIT-IDENTICAL to the composable SQL form
  * `sort_array(array_distinct(transform(split(text,'\s+'), xxhash64)))` —
  * the q22/q58 oracles key on these hash values, so "close" is failure.
  * The byte-scan split and the in-place hashUnsafeBytes are each checked
  * against Spark's own regex split + xxhash64 on adversarial inputs and
  * on the real corpus. */
class TokenSetHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sqlForm = sort_array(array_distinct(
    transform(split(col("text"), "\\s+"), c => xxhash64(c))))

  test("bit-identical to split+xxhash64+distinct+sort on edge cases") {
    import spark.implicits._
    val cases = Seq(
      "a b c", "a  b\tc", " leading", "trailing ", " both ",
      "", " ", "  ", "\t\n\f\r", "single",
      "dup dup dup other", "a\nb\rc\fde",
      "unicode été 中文 été",
      " nbsp is not java ws", "mixed inside token",
      "a " * 1000 + "end")
    val df = cases.toDF("text")
      .select(col("text"), TokenSetHash.of(col("text")).as("fused"),
        sqlForm.as("chain"))
    val bad = df.filter(not(col("fused") <=> col("chain"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("bit-identical on the real documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs
      .select(TokenSetHash.of(col("text")).as("fused"), sqlForm.as("chain"))
      .filter(not(col("fused") <=> col("chain")))
    assert(bad.count() === 0)
  }

  test("canonicalizes: two instances over the same child compare equal " +
      "(the reuse property the HOF chain lacks)") {
    val a = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "t", org.apache.spark.sql.types.StringType)()
    val e1 = TokenSetHash(a).canonicalized
    val e2 = TokenSetHash(a.withExprId(a.exprId)).canonicalized
    assert(e1 == e2)
  }
}
