package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned quality filtering ([[QualityClassifier]]): logistic regression
  * trained by one-aggregation-per-iteration gradient descent must (a)
  * solve a known separable problem, (b) learn to separate real documents
  * from structurally-destroyed junk using only the cheap text features,
  * and (c) agree with a driver-side reference implementation of the same
  * gradient on the same data. */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("separable synthetic data: near-perfect AUC, decreasing loss") {
    import spark.implicits._
    // two Gaussian-ish blobs along feature 1; feature 2 is noise. A
    // deterministic pseudo-random source (hash-based) keeps the spec
    // reproducible without Random.
    val rows = (0 until 2000).map { i =>
      val u = ((i * 2654435761L) % 1000) / 1000.0 - 0.5 // noise in [-0.5, 0.5)
      val label = i % 2
      val x1 = label * 2.0 + u * 0.8
      val x2 = ((i * 40503L) % 997) / 997.0
      (Seq(x1, x2), label.toDouble)
    }
    val df = rows.toDF("f", "y")
    val model = QualityClassifier.train(df, "f", "y", iters = 80, lr = 1.0)
    assert(model.losses.head > model.losses.last,
      s"loss must decrease: ${model.losses.head} -> ${model.losses.last}")
    assert(model.losses.last < 0.2, s"final loss too high: ${model.losses.last}")
    val scored = df.withColumn("s", model.score(col("f")))
    val auc = QualityClassifier.auc(scored, "s", "y")
    assert(auc > 0.97, s"separable blobs must be nearly perfectly ranked, auc=$auc")
  }

  test("real documents vs destroyed junk: features + model separate them") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(400)
    // junk twins: spaces removed (degenerate word stats) — the classic
    // boilerplate/garbage signature quality models are built to catch
    val real = docs.withColumn("y", lit(1.0))
    val junk = docs.select(regexp_replace(col("text"), "\\s", "").as("text"))
      .withColumn("y", lit(0.0))
    val all = real.unionByName(junk)
      .withColumn("f", QualityClassifier.features(col("text")))
    val model = QualityClassifier.train(all, "f", "y", iters = 60, lr = 1.0)
    val scored = all.withColumn("s", model.score(col("f")))
    val auc = QualityClassifier.auc(scored, "s", "y")
    assert(auc > 0.95, s"quality model must separate text from junk, auc=$auc")
    // the score column is usable as a plain filter predicate
    val kept = scored.filter(col("s") > 0.5)
    val keptReal = kept.filter(col("y") === 1.0).count().toDouble
    val keptJunk = kept.filter(col("y") === 0.0).count().toDouble
    assert(keptReal > keptJunk * 3,
      s"threshold filter keeps real ($keptReal) over junk ($keptJunk)")
  }

  test("distributed gradient equals a driver-side reference (same iterations)") {
    import spark.implicits._
    val data = (0 until 200).map { i =>
      val x1 = (i % 10).toDouble / 10.0
      val x2 = ((i * 7) % 13).toDouble / 13.0
      val y = if (x1 + x2 > 0.9) 1.0 else 0.0
      (Seq(x1, x2), y)
    }
    val df = data.toDF("f", "y").coalesce(1) // single partition: exact float parity
    val model = QualityClassifier.train(df, "f", "y", iters = 10, lr = 0.7, l2 = 1e-3)
    // reference: identical standardized batch GD on the driver
    val xs = data.map(_._1.toArray).toArray
    val ys = data.map(_._2).toArray
    val n = xs.length.toDouble
    val dim = 2
    val mean = (0 until dim).map(j => xs.map(_(j)).sum / n).toArray
    val std = (0 until dim).map { j =>
      val m = mean(j)
      val s = math.sqrt(xs.map(x => (x(j) - m) * (x(j) - m)).sum / n)
      if (s < 1e-12) 1.0 else s
    }.toArray
    var w = Array(0.0, 0.0); var b = 0.0
    for (_ <- 0 until 10) {
      val grads = Array(0.0, 0.0); var gb = 0.0
      xs.indices.foreach { i =>
        val z = b + (0 until dim).map(j => w(j) * (xs(i)(j) - mean(j)) / std(j)).sum
        val p = 1.0 / (1.0 + math.exp(-z))
        val e = p - ys(i)
        (0 until dim).foreach(j => grads(j) += e * (xs(i)(j) - mean(j)) / std(j))
        gb += e
      }
      (0 until dim).foreach(j => w(j) -= 0.7 * (grads(j) / n + 1e-3 * w(j)))
      b -= 0.7 * (gb / n)
    }
    val wRaw = (0 until dim).map(j => w(j) / std(j))
    val bRaw = b - (0 until dim).map(j => w(j) * mean(j) / std(j)).sum
    model.weights.zip(wRaw).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9, s"weight: $got vs $want")
    }
    assert(math.abs(model.bias - bRaw) < 1e-9)
  }

  test("AUC reference values: perfect, inverted, random ranking") {
    import spark.implicits._
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)).toDF("s", "y")
    assert(QualityClassifier.auc(perfect, "s", "y") === 1.0)
    val inverted = Seq((0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0)).toDF("s", "y")
    assert(QualityClassifier.auc(inverted, "s", "y") === 0.0)
    // fully tied pairs: average-rank tie correction gives exactly 0.5
    val half = Seq((0.5, 1.0), (0.5, 0.0), (0.7, 1.0), (0.7, 0.0)).toDF("s", "y")
    assert(QualityClassifier.auc(half, "s", "y") === 0.5)
  }
}
