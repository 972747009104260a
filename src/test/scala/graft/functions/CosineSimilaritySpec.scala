package graft.functions

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native cosine expression: value parity with the HOF formulation, null
  * semantics, SQL registration, and codegen execution. */
class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("native expression matches the zip_with/aggregate formulation") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (3L, Seq(0.5f, -0.5f), Seq(0.5f, -0.5f))
    ).toDF("id", "a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("zero-norm and null inputs yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 1.0f))),
      (2L, None: Option[Seq[Float]], Some(Seq(1.0f, 1.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("registers as SQL function cosine_sim") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM v").head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen") {
    // a real parquet scan — local literal input would constant-fold into a
    // LocalTableScan and bypass codegen entirely
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    assert(df.filter(col("c") > 0.999).count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan) // codegen stage marker
  }
}
