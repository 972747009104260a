package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native quantized-dot expression: exact value parity with the
  * aggregate(zip_with(...)) SQL formulation it replaces (the oracle hash
  * compare is exact, so these must agree to the last bit), null semantics,
  * SQL registration, and codegen execution. */
class QuantizedDotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def hofDot(a: String, b: String) =
    s"""aggregate(zip_with($a, $b,
      |    (x, y) -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000) AS BIGINT)),
      |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin

  test("native quantized_dot matches the interpreted formulation on real data") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("qd_emb")
    // self-join a few pairs: dot(a,b) for distinct vectors plus dot(a,a) norms
    val out = spark.sql(
      s"""SELECT quantized_dot(a, b) AS native, ${hofDot("a", "b")} AS hof
         |FROM (
         |  SELECT x.embedding AS a, y.embedding AS b
         |  FROM qd_emb x JOIN qd_emb y ON y.vec_id = x.vec_id + 1
         |  WHERE x.vec_id < 50)""".stripMargin).collect()
    assert(out.length === 50)
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val norms = spark.sql(
      s"""SELECT quantized_dot(embedding, embedding) AS native,
         |  ${hofDot("embedding", "embedding")} AS hof
         |FROM qd_emb WHERE vec_id < 50""".stripMargin).collect()
    norms.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null array yields null; null elements contribute zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), None, Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f), Some(5.0f)))),
      (2L, None: Option[Seq[Option[Float]]], Some(Seq(Some(1.0f))))
    ).toDF("id", "a", "b")
    val out = df.select(QuantizedDotProduct(col("a"), col("b")).as("q")).orderBy("id").collect()
    // floor(1*3*1e6) + 0 + floor(2*5*1e6) = 3e6 + 10e6
    assert(out(0).getLong(0) === 13000000L)
    assert(out(1).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(QuantizedDotProduct(col("embedding"), col("embedding")).as("q"))
    assert(df.filter(col("q") > 0L).count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("word_shingles generator matches the HOF slice/concat_ws formulation") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // includes: normal text, short text (< 3 words), trailing/leading
    // whitespace (split keeps trailing empties, limit -1), repeated words
    Seq((1L, "a b c d e"), (2L, "one two"), (3L, "x y z "), (4L, " p q r"),
      (5L, "w w w w")).toDF("doc_id", "text").createOrReplaceTempView("ws_docs")
    val native = spark.sql(
      "SELECT doc_id, word_shingles(text, 3) AS sh FROM ws_docs")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val hof = spark.sql(
      """SELECT doc_id, explode(CASE WHEN size(split(text, '\\s+')) >= 3
        |    THEN transform(sequence(1, size(split(text, '\\s+')) - 2),
        |         i -> concat_ws(' ', slice(split(text, '\\s+'), i, 3)))
        |    ELSE array(text) END) AS sh
        |FROM ws_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(native.toSeq === hof.toSeq)
  }

  test("srp_bucket native expression is deterministic and seed-independent across tables") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b0 = emb.select(SrpBucket(col("embedding"), 6, 0L).as("b")).collect().map(_.getLong(0))
    val b0b = emb.select(SrpBucket(col("embedding"), 6, 0L).as("b")).collect().map(_.getLong(0))
    assert(b0.toSeq === b0b.toSeq, "same seed must be deterministic")
    val b1 = emb.select(SrpBucket(col("embedding"), 6, 1L).as("b")).collect().map(_.getLong(0))
    // independent hyperplanes: different seeds should disagree on many rows
    val disagree = b0.zip(b1).count { case (x, y) => x != y }
    assert(disagree > b0.length / 2, s"seeds look correlated: only $disagree/${b0.length} differ")
    // all buckets within range
    assert(b0.forall(b => b >= 0 && b < 64))
  }
}
