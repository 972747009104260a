package graft.operators

import graft.lake.LakeCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Growth-shape probe for the persistent BM25 index (results in
  * SCALEPROBE.md): the claims that must hold at 100 TB are that index
  * MAINTENANCE is churn-bound and SEARCH is query-term-bound — neither
  * may grow with corpus size.
  *
  *   1. Fixed batch (append 10 k docs, then rewrite 10 k existing ones),
  *      measured over a 10× corpus-size spread: refresh wall must stay
  *      ~flat. Both index tables run `write.merge.mode=merge-on-read`,
  *      the high-churn configuration the scaladoc prescribes.
  *   2. Search of a 3-term query: wall plus the scanned-file fraction of
  *      the postings table (bucket pruning to the terms' buckets).
  *
  * Corpus: synthetic docs of 30 words from a 10 k-word vocabulary
  * (uniform via xxhash64) — posting lists grow with the corpus while the
  * vocabulary stays fixed, the shape that separates term-bound from
  * corpus-bound work.
  *
  * Run: sbt "runMain graft.operators.TextIndexProbe" (env
  * SPARK_GRAFT_CPUS; never concurrently with another Spark main). */
object TextIndexProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wordsPerDoc = 30
    val vocabSize = 10000
    // salt varies the text of a rewritten doc without changing its id
    def docs(ids: org.apache.spark.sql.DataFrame, salt: Long = 0L) =
      ids.select(col("id").as("doc_id"),
        concat_ws(" ", (0 until wordsPerDoc).map(j =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(j), lit(salt)),
            lit(vocabSize)))): _*).as("text"))

    val batch = 10000L
    for (n <- Seq(100000L, 1000000L)) {
      val cat = new LakeCatalog(spark,
        Files.createTempDirectory("graft-tidxprobe").toString)
      val base = cat.createTable("p.docs", StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))),
        properties = Map("write.merge.mode" -> "merge-on-read"))
      base.append(docs(spark.range(n).toDF("id")))
      val t0 = System.nanoTime()
      val idx = TextIndex.create(cat, "p.tidx", base, nBuckets = 32)
      val buildS = (System.nanoTime() - t0) / 1e9
      idx.state.updateProperties(_ + ("write.merge.mode" -> "merge-on-read"))
      idx.docsTable.updateProperties(_ + ("write.merge.mode" -> "merge-on-read"))

      // untimed warmup churn: the first refresh in a JVM pays codegen +
      // C2 compilation of the whole merge path (measured ~10× the
      // steady-state wall) — absorb it so the timed batches compare
      // steady state at both corpus sizes
      base.append(docs(spark.range(-100L, 0L).toDF("id")))
      idx.refresh()

      // fixed-size churn: append NEW docs, then rewrite EXISTING ones
      base.append(docs(spark.range(n, n + batch).toDF("id")))
      val tA = System.nanoTime()
      idx.refresh()
      val appendS = (System.nanoTime() - tA) / 1e9
      val updIds = spark.range(batch).select(
        pmod(xxhash64(col("id"), lit(7L)), lit(n)).as("id")).distinct()
      base.mergeByKeys("doc_id",
        updIds.select(col("id").as("doc_id")), docs(updIds, salt = 99L))
      val tU = System.nanoTime()
      idx.refresh()
      val updateS = (System.nanoTime() - tU) / 1e9

      // search: 3 query terms; scanned files vs the whole postings table
      val q = Seq(1 -> "w42", 1 -> "w4711", 2 -> "w137")
      val tS = System.nanoTime()
      val top = idx.search(q, k = 10).collect()
      val searchS = (System.nanoTime() - tS) / 1e9
      require(top.nonEmpty)
      val scanned = idx.state.read(filter =
        Some(col("term").isin(q.map(_._2).distinct: _*))).inputFiles.length
      val total = idx.state.toDF.inputFiles.length
      println(f"""{"probe":"text_index","n":$n,"batch":$batch,""" +
        f""""build_s":$buildS%.2f,"refresh_append_s":$appendS%.2f,""" +
        f""""refresh_update_s":$updateS%.2f,"search_s":$searchS%.2f,""" +
        f""""scanned_files":$scanned,"total_files":$total}""")
      TextIndex.drop(cat, "p.tidx"); cat.dropTable("p.docs")
    }
    spark.stop()
  }
}
