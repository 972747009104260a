package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Second-engine export ([[LakeTable.exportScan]]): the generated DuckDB
  * SQL must reference exactly the snapshot's live files, honor renames
  * via per-schema-group column mapping, mask merge-on-read positional
  * deletes, and refuse un-exportable equality masks. DuckDB itself runs
  * driver-side (q83's oracle executes this SQL there); here we pin the
  * export's structure and emulate its semantics in Spark: reading the
  * exported file lists and applying the exported delete mask must equal
  * the table's own masked read. */
class ExportScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-export").toString)

  test("export covers live files only, maps renamed schema groups, masks MoR deletes") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("e.t1", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1))
    t.renameColumn("name", "title")
    t.append(Seq((4L, "d"), (5L, "e")).toDF("id", "title").coalesce(1))
    t.delete(col("id") === 2 || col("id") === 5) // positional entries, both groups
    val ex = t.exportScan()
    // exact live-file coverage
    val live = t.meta.currentSnapshot.get.files.map(_.path).toSet
    assert(ex.dataFiles.toSet === live)
    assert(ex.dataFiles.forall(ex.sql.contains), "every data file appears in the SQL")
    assert(ex.deleteFiles.nonEmpty && ex.deleteFiles.forall(ex.sql.contains))
    // renamed column presents under its CURRENT name in both groups
    assert(ex.sql.contains("\"title\"") && !ex.sql.contains("\"name\""))
    assert(ex.sql.contains("UNION ALL"), "two schema groups → two subselects")
    assert(ex.sql.contains("NOT EXISTS"), "delete mask → anti-join")
    // Spark emulation of the exported semantics = the table's own read
    val delEntries = spark.read
      .schema(LakeTable.DeleteEntrySchema).parquet(ex.deleteFiles: _*)
      .select(col("file_name").as("_f"), col("pos").as("_p"))
    val emulated = t.meta.currentSnapshot.get.files.groupBy(_.schemaId).toSeq
      .map { case (sid, fs) =>
        val written = t.meta.schemas.find(_.schemaId == sid).get
        val raw = spark.read.schema(written.physicalSchema).parquet(fs.map(_.path): _*)
        val cols = t.meta.schema.columns.map(c =>
          raw.col(written.byId(c.id).get.physicalName).cast(c.sparkType).as(c.name))
        raw.select(cols :+ input_file_name().as("_fn") :+
          (org.apache.spark.sql.functions.expr("_metadata.row_index")).as("_p"): _*)
          .withColumn("_f", regexp_extract(col("_fn"), "[^/]+$", 0))
      }.reduce(_ unionByName _)
      .join(delEntries, Seq("_f", "_p"), "left_anti")
      .select("id", "title")
    val want = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = emulated.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === want && want.map(_._1) === Seq(1L, 3L, 4L))
  }

  test("equality-delete snapshots export as per-mask-class key anti-joins") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("e.t2", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    t.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    // two upsert batches → two mask classes: batch-1's inserts are masked
    // by batch-2's delete but not their own; the export must cut classes
    // exactly like the engine's scan
    t.mergeByKey("id", Seq[Any](1L), Seq((1L, "a2")).toDF("id", "v").coalesce(1))
    t.mergeByKey("id", Seq[Any](2L, 1L), Seq((2L, "b2")).toDF("id", "v").coalesce(1))
    val ex = t.exportScan()
    // engine read: 1→? batch2 deleted key 1 with NO replacement for it in
    // batch 2 (only 2 upserted) — so 1's batch-1 version dies; expect 2b2, 3c, and...
    val want = t.toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // the generated SQL carries a key anti-join per applicable class and
    // lists every eq-delete file
    assert(ex.sql.contains("NOT EXISTS"), ex.sql)
    assert(ex.sql.contains("SELECT DISTINCT"), ex.sql)
    assert(ex.sql.contains("e.\"id\" = s.\"id\""), ex.sql)
    val eqPaths = t.meta.currentSnapshot.get.eqDeleteFiles.map(_.path)
    assert(eqPaths.nonEmpty && eqPaths.forall(ex.deleteFiles.contains), ex.deleteFiles)
    assert(eqPaths.forall(ex.sql.contains), "every eq-delete file appears in the SQL")
    // classes: three distinct addedSnapshotId strata → three class arms
    assert("UNION ALL".r.findAllIn(ex.sql).size >= 2,
      s"per-class arms expected:\n${ex.sql}")
    // sanity: the engine's own read of this table (the content DuckDB
    // must reproduce — executed for real by q83's oracle gate)
    assert(want === Seq((2L, "b2"), (3L, "c")))
  }

  test("empty table and time-travel exports") {
    import spark.implicits._
    val cat = freshCatalog()
    val t = cat.createTable("e.t3", StructType(Seq(StructField("id", LongType))))
    val empty = t.exportScan()
    assert(empty.dataFiles.isEmpty && empty.sql.contains("WHERE 1 = 0"))
    t.append(Seq(1L, 2L).toDF("id"))
    val snap1 = t.meta.currentSnapshot.get.snapshotId
    t.append(Seq(3L).toDF("id"))
    val pinned = t.exportScan(snapshotId = Some(snap1))
    assert(pinned.snapshotId === snap1 && pinned.dataFiles.size <
      t.exportScan().dataFiles.size, "pinned export sees the old file list")
  }
}
