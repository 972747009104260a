package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.util.Random

/** Randomized soundness properties for file-level pruning — the bug class
  * ADVICE r01 found three instances of (NOT-with-NULLs, decimal scaling,
  * date/micros units) is silent data loss, so the invariants are checked
  * against a seeded random predicate grammar rather than hand-picked
  * cases:
  *
  *   1. READ:   read(filter = p)  ==  toDF.filter(p)          (pruning
  *      never drops a file containing matching rows)
  *   2. DELETE: after delete(p), remaining == toDF.filter(!coalesce(p,
  *      false)) (the metadata-only fast path never drops rows where p is
  *      FALSE or NULL)
  */
class PruningPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val schema: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("dec", DecimalType(10, 2), nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  def randomRows(rnd: Random, n: Int): Seq[(Option[Int], Option[Double], Option[String],
      Option[java.math.BigDecimal], Option[java.sql.Date], Option[java.sql.Timestamp])] =
    (1 to n).map { _ =>
      def opt[A](v: => A): Option[A] = if (rnd.nextInt(8) == 0) None else Some(v)
      (opt(rnd.nextInt(50) - 25),
        opt(math.floor(rnd.nextDouble() * 1000) / 10.0),
        opt(Seq("alpha", "beta", "gamma", "delta", "")(rnd.nextInt(5))),
        opt(new java.math.BigDecimal(s"${rnd.nextInt(500)}.${10 + rnd.nextInt(89)}")),
        opt(java.sql.Date.valueOf(s"2022-0${1 + rnd.nextInt(9)}-${10 + rnd.nextInt(18)}")),
        opt(java.sql.Timestamp.valueOf(s"2022-0${1 + rnd.nextInt(9)}-${10 + rnd.nextInt(18)} 0${rnd.nextInt(10)}:00:00")))
    }

  /** Random predicate over the table's columns (depth-bounded grammar of
    * the shapes Pruning.translate understands, plus ones it must treat as
    * Unknown conservatively). */
  def randomPred(rnd: Random, depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(10) match {
      case 0 => col("i") === lit(rnd.nextInt(50) - 25)
      case 1 => col("i") > lit(rnd.nextInt(50) - 25)
      case 2 => col("d") <= lit(math.floor(rnd.nextDouble() * 1000) / 10.0)
      case 3 => col("s") === lit(Seq("alpha", "beta", "gamma")(rnd.nextInt(3)))
      case 4 => col("dec") > lit(new java.math.BigDecimal(s"${rnd.nextInt(500)}.50"))
      case 5 => col("dt") === lit(java.sql.Date.valueOf(s"2022-0${1 + rnd.nextInt(9)}-15"))
      case 6 => col("ts") >= lit(java.sql.Timestamp.valueOf(s"2022-0${1 + rnd.nextInt(9)}-14 00:00:00"))
      case 7 => col("i").isNull
      case 8 => col("s").isNotNull
      case _ => col("i").isin(rnd.nextInt(20), rnd.nextInt(20) - 10, rnd.nextInt(20) + 5)
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => randomPred(rnd, depth - 1) && randomPred(rnd, depth - 1)
      case 1 => randomPred(rnd, depth - 1) || randomPred(rnd, depth - 1)
      case 2 => !randomPred(rnd, depth - 1)
      case _ => leaf()
    }
  }

  def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("read(filter) equals full-scan filter for 120 random predicates") {
    val rnd = new Random(20260812L)
    import spark.implicits._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("graft-prop").toString)
    // days(ts)-partitioned so hidden-partition pruning is exercised too
    val t = cat.createTable("prop.t", schema, partitionBy = Seq("ts" -> "days"))
    (1 to 4).foreach(_ => t.append(randomRows(rnd, 40)
      .toDF("i", "d", "s", "dec", "dt", "ts").coalesce(2)))
    val full = t.toDF.cache(); full.count()
    (1 to 120).foreach { k =>
      val p = randomPred(rnd, 2)
      val pruned = sortedRows(t.read(filter = Some(p)))
      val expected = sortedRows(full.filter(p))
      assert(pruned === expected, s"iteration $k predicate $p")
    }
    full.unpersist()
  }

  test("bucket partition pruning: point predicates prune to the hash bucket, never lose rows (r9)") {
    val rnd = new Random(20260814L)
    import spark.implicits._
    val cat = new LakeCatalog(spark, Files.createTempDirectory("graft-bprop").toString)
    // bucket(8, i) + bucket(4, s): both int and string hashing
    val t = cat.createTable("prop.b", schema,
      partitionBy = Seq("i" -> "bucket[8]"))
    (1 to 3).foreach(_ => t.append(randomRows(rnd, 60)
      .toDF("i", "d", "s", "dec", "dt", "ts").coalesce(2)))
    val m = t.meta
    val files = m.currentSnapshot.get.files
    assert(files.size > 8, s"need multiple files per bucket, got ${files.size}")
    val full = t.toDF.cache(); full.count()
    // soundness + effectiveness for 40 random point lookups
    (1 to 40).foreach { k =>
      val v = rnd.nextInt(50) - 25
      val p = col("i") === lit(v)
      val pruned = sortedRows(t.read(filter = Some(p)))
      val expected = sortedRows(full.filter(p))
      assert(pruned === expected, s"iteration $k value $v")
      // effectiveness: the surviving file set is the one bucket's files
      val pred = Pruning.translate(p)
      val survivors = files.count(f => Pruning.mayMatch(pred, t.fileBounds(m, f)))
      val bucketOf = graft.lake.Transforms.bucketOf(v, IntegerType, 8).get
      val expectFiles = files.count(
        _.partitionValues.values.exists(_ == bucketOf.toString))
      assert(survivors <= expectFiles,
        s"point lookup must scan only bucket $bucketOf's files ($survivors vs $expectFiles)")
      assert(survivors < files.size, "no pruning happened at all")
    }
    // IN-lists prune to the union of member buckets
    val inP = col("i").isin(1, 2, 3)
    assert(sortedRows(t.read(filter = Some(inP))) === sortedRows(full.filter(inP)))
    // ranges must NOT prune on hash buckets (order is destroyed)
    val rangeP = col("i") > lit(0)
    assert(sortedRows(t.read(filter = Some(rangeP))) === sortedRows(full.filter(rangeP)))
    full.unpersist()
  }

  test("delete(p) keeps exactly the rows where p is FALSE or NULL (5 random tables)") {
    val rnd = new Random(42L)
    import spark.implicits._
    (1 to 5).foreach { k =>
      val cat = new LakeCatalog(spark, Files.createTempDirectory("graft-propd").toString)
      val t = cat.createTable("prop.d", schema, partitionBy = Seq("ts" -> "days"))
      t.append(randomRows(rnd, 60).toDF("i", "d", "s", "dec", "dt", "ts").coalesce(3))
      val p = randomPred(rnd, 2)
      val expected = sortedRows(t.toDF.filter(!coalesce(p, lit(false))))
      t.delete(p)
      val actual = sortedRows(t.toDF)
      assert(actual === expected, s"table $k predicate $p")
    }
  }
}
