package graft.lake

import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** Growth-shape probe for automatic MV query routing
  * ([[graft.lake.dsv2.GraftMvRoute]]): the same aggregate SQL over two
  * identical lake tables — one carrying a fresh materialized view, one
  * bare — at 1× and 10× base size. The claim under test: the ROUTED
  * query reads the group-count-sized state, so its wall is flat in base
  * size, while the direct aggregate scans the base and grows with it.
  * The `stale` mode (r11) appends a small churn batch AFTER the refresh
  * and measures the compensated route: wall must track the CHURN size,
  * not the base size — flat across base scales like the fresh route.
  * Results recorded in SCALEPROBE.md.
  *
  * Run: sbt "runMain graft.lake.MvRouteProbe" (env SPARK_GRAFT_CPUS). */
object MvRouteProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .create()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = Files.createTempDirectory("graft-mvrouteprobe").toString
    spark.conf.set("spark.sql.catalog.lake", "graft.lake.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
    org.apache.spark.sql.graftbridge.CatalogBridge.resetCatalogs(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS lake.p")
    val cat = new LakeCatalog(spark, wh)

    def wall(q: String): Double = {
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(q).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      walls(2)
    }

    for (scale <- Seq(1, 50)) {
      val rows = 2000000 * scale
      for (mode <- Seq("routed", "stale", "direct")) {
        val name = s"p.b_${mode}_$scale"
        spark.sql(s"DROP TABLE IF EXISTS lake.$name")
        spark.sql(s"CREATE TABLE lake.$name (g BIGINT, v BIGINT)")
        val t = cat.loadTable(name)
        // spark.range: distributed generation — a driver-local Range at
        // 100M rows ships the data inside every task binary and OOMs
        t.append(spark.range(rows.toLong).toDF("x")
          .selectExpr("x % 100 AS g", "x AS v"))
        if (mode != "direct") {
          val mv = MaterializedAgg.create(cat, s"${name}_mv", t,
            Seq("g"), Seq(MaterializedAgg.AggCol("count", "*", "n"),
              MaterializedAgg.AggCol("sum", "v", "t")))
          mv.refresh()
          // stale mode: a fixed-size churn batch lands after the refresh;
          // the compensated route folds JUST this batch over the state
          if (mode == "stale")
            t.append(spark.range(10000L).toDF("x")
              .selectExpr("x % 100 AS g", "x AS v"))
        }
        val q = s"SELECT g, count(*) AS n, sum(v) AS t FROM lake.$name GROUP BY g"
        // routing-shape sanity: the FRESH routed mode must plan no
        // aggregate; the stale mode aggregates the churn but must not
        // scan pre-watermark base files (asserted in MvRouteSpec)
        val agg = spark.sql(q).queryExecution.executedPlan.toString
          .contains("Aggregate")
        val w = wall(q)
        println(f"""{"mode":"$mode","scale":$scale,"rows":$rows,""" +
          f""""wall_s":$w%.3f,"plans_aggregate":$agg}""")
      }
    }
    spark.stop()
  }
}
