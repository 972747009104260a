package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale probe's linearity claim rests on two properties of the
  * synthesized N× corpus: row counts scale exactly by N (ids stay
  * unique), and copies are content-disjoint (word sets never collide
  * across document copies, labels never collide across embedding
  * copies) so the OUTPUT of the pair-finding queries grows linearly and
  * the probe isolates the plan's growth shape. */
class ScaleProbeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def registerBases(): Unit = {
    graft.Tables.registerAll(spark, sfDir)
    spark.table("documents").createOrReplaceTempView("documents_base")
    spark.table("embeddings").createOrReplaceTempView("embeddings_base")
  }

  test("scaled documents: 3x rows, unique ids, disjoint vocabularies") {
    registerBases()
    val base = spark.table("documents_base")
    val scaled = ScaleProbe.scaledDocuments(spark, 3)
    assert(scaled.count() === base.count() * 3)
    assert(scaled.select("doc_id").distinct().count() === base.count() * 3)
    // vocabulary of copy i must never intersect copy j's: a cross-copy
    // token collision would create cross-copy candidate pairs and push
    // the probe's output superlinear
    val words = scaled
      .withColumn("copy", floor(col("doc_id") / lit(10000000L)))
      .select(col("copy"), explode(split(col("text"), "\\s+")).as("w"))
    val collisions = words.groupBy("w")
      .agg(countDistinct("copy").as("nc"))
      .filter(col("nc") > 1)
      .count()
    assert(collisions === 0L)
  }

  test("scaled embeddings: 3x rows, unique ids, disjoint labels, vectors intact") {
    registerBases()
    val base = spark.table("embeddings_base")
    val scaled = ScaleProbe.scaledEmbeddings(spark, 3)
    assert(scaled.count() === base.count() * 3)
    assert(scaled.select("vec_id").distinct().count() === base.count() * 3)
    val labelCollisions = scaled
      .withColumn("copy", floor(col("vec_id") / lit(10000000L)))
      .groupBy("label").agg(countDistinct("copy").as("nc"))
      .filter(col("nc") > 1).count()
    assert(labelCollisions === 0L)
    // embeddings are copied verbatim: per-copy norm sums match the base
    val baseNorm = base.select(sum(aggregate(col("embedding"), lit(0.0d),
      (acc, v) => acc + v * v))).head.getDouble(0)
    val copyNorm = scaled.filter(col("vec_id") >= 20000000L)
      .select(sum(aggregate(col("embedding"), lit(0.0d),
        (acc, v) => acc + v * v))).head.getDouble(0)
    assert(math.abs(baseNorm - copyNorm) < 1e-6 * math.abs(baseNorm))
  }
}
