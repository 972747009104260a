package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The r17 word-by-word HashedGrams feed, preserved verbatim for the A/B
  * below (same contract as graft.functions.HashedGrams). */
case class LegacyHashedGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"string required, got $other")
  }
  override def elementSchema: StructType =
    StructType(Seq(StructField("bucket", LongType)))
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val text = raw.asInstanceOf[UTF8String].toLowerCase.toString
      val split = text.split("\\s+", -1)
      var cnt = 0
      var i = 0
      while (i < split.length) { if (!split(i).isEmpty) cnt += 1; i += 1 }
      val words =
        if (cnt == split.length) split
        else {
          val w = new Array[String](cnt)
          var j = 0
          i = 0
          while (i < split.length) {
            if (!split(i).isEmpty) { w(j) = split(i); j += 1 }
            i += 1
          }
          w
        }
      if (words.length < n) Nil
      else {
        val wb = new Array[Array[Byte]](words.length)
        var i2 = 0
        while (i2 < words.length) {
          wb(i2) = words(i2).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          i2 += 1
        }
        (0 to words.length - n).iterator.map { k =>
          md5.update(wb(k))
          var j = 1
          while (j < n) { md5.update(' '.toByte); md5.update(wb(k + j)); j += 1 }
          val d = md5.digest()
          InternalRow((((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)).toLong)
        }
      }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dev A/B closing VERDICT r17 item 1 end-to-end: the FULL q101 pipeline
  * with the r17 vs r18 HashedGrams feed, interleaved in one JVM (the
  * cross-JVM bench comparisons that flagged q101 confound per-JVM
  * codegen/JIT state with the code change; GramFeedAB already showed the
  * feed work itself is equal-cost). Usage:
  *   runMain graft.operators.DsirFeedAB <sfDir> [reps]
  */
object DsirFeedAB {
  private def q101With(s: SparkSession, dir: String,
                       gen: Expression => Expression): DataFrame = {
    val docs = graft.Tables.load(s, dir, "documents")
    val pool = docs.filter(col("lang") =!= "en")
    val target = docs.filter(col("lang") === "en")
    def counts(df: DataFrame): DataFrame = {
      val buckets = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        gen(org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text"))))
      df.select(col("doc_id"), buckets.as("bucket"))
        .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
    }
    val poolCounts = counts(pool)
    val ratios = Dsir.ratiosFromCounts(counts(target), poolCounts, Dsir.DefaultBuckets)
    poolCounts.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("logratio_fp")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(200)
      .select(col("doc_id"), col("score"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def r17(s: SparkSession, d: String) = q101With(s, d, e => LegacyHashedGrams(e, 2))
    def r18(s: SparkSession, d: String) = q101With(s, d, e => graft.functions.HashedGrams(e, 2))
    val a = r17(spark, sfDir).collect().map(_.toString)
    val b = r18(spark, sfDir).collect().map(_.toString)
    require(a.sameElements(b), "feed variants diverged")
    println(s"[dsirfeed] parity OK over ${a.length} rows")
    def once(tag: String, f: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dsirfeed] $tag run: $s%.2f s")
      s
    }
    val (ta, tb) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
    (1 to reps).foreach { _ =>
      ta += once("r17-feed", r17)
      tb += once("r18-feed", r18)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[dsirfeed] MEDIANS r17=${med(ta.result())}%.2f s r18=${med(tb.result())}%.2f s")
    spark.stop()
  }
}
