package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Ingest-cadence auto-maintenance ([[LakeTable.autoMaintain]]): a
  * sustained merge-on-read CDC upsert stream adds one equality-delete
  * file per batch, and the read plan fans out one scan branch per
  * distinct mask class — without routine maintenance a thousand-batch
  * stream accretes a thousand classes. These tests pin the policy:
  * thresholds keep the masks bounded across ~50 batches, content stays
  * exactly last-writer-wins, and the no-maintenance control grows
  * linearly (proving the bound is the policy's doing). */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshCatalog(): LakeCatalog =
    new LakeCatalog(spark, Files.createTempDirectory("graft-maint").toString)

  private def batch(b: Int): DataFrame = {
    import spark.implicits._
    // sliding key window: every batch overwrites 10 keys of the previous
    // batch and introduces 10 new ones → every batch's equality delete
    // actually kills strictly-older row versions
    ((b * 10) until (b * 10 + 20)).map(k => (k.toLong, s"v$b")).toDF("id", "v")
  }

  private def morTable(cat: LakeCatalog, name: String): LakeTable = {
    val t = cat.createTable(name,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    t.setProperties(Map("write.merge.mode" -> "merge-on-read"))
    t
  }

  test("50 MoR upsert batches with autoMaintain: mask classes stay bounded, content exact") {
    val cat = freshCatalog()
    val t = morTable(cat, "m.cdc")
    val maxEq = 4
    val maxPos = 8
    var worstEq = 0
    var worstPos = 0
    for (b <- 0 until 50) {
      val df = batch(b)
      t.mergeByKeys("id", df.select("id"), df)
      t.autoMaintain(everyCommits = 10,
        maxEqDeleteFiles = maxEq, maxDeleteFiles = maxPos)
      val snap = t.meta.currentSnapshot.get
      worstEq = math.max(worstEq, snap.eqDeleteFiles.size)
      worstPos = math.max(worstPos, snap.deleteFiles.size)
    }
    // the read plan's equality mask-class count is bounded by live
    // eq-delete files + 1: the threshold must hold at EVERY point of the
    // stream, not just at the end
    assert(worstEq <= maxEq, s"equality masks exceeded the bound: $worstEq")
    assert(worstPos <= maxPos, s"positional delete files exceeded the bound: $worstPos")
    // content is exactly last-writer-wins per key
    val out = t.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (0L until 510L).map(k =>
      k -> s"v${math.min(k / 10, 49L)}").toMap
    assert(out === expected)
    // maintenance actually ran: converts landed (replace snapshots with
    // the converted-equality marker exist in history)
    assert(t.meta.snapshots.exists(_.summary.contains("converted-equality-delete-files")),
      "threshold must have triggered convert_equality_deletes at least once")
  }

  test("control: without maintenance the equality masks grow linearly") {
    val cat = freshCatalog()
    val t = morTable(cat, "m.cdcraw")
    for (b <- 0 until 12) {
      val df = batch(b)
      t.mergeByKeys("id", df.select("id"), df)
    }
    // batch 0's mask has no strictly-older files to apply to and is
    // pruned as dead; every later batch's mask accretes — 11 of 12
    assert(t.meta.currentSnapshot.get.eqDeleteFiles.size === 11,
      "one equality-delete file per batch accretes without maintenance")
  }

  test("maintenance policy resolves from graft.maintenance.* table properties") {
    val cat = freshCatalog()
    val t = morTable(cat, "m.props")
    // a tight property bound (2) triggers conversion that the default (4)
    // would not — proving the policy is read from the table, not the call
    t.setProperties(Map("graft.maintenance.max-eq-delete-files" -> "2"))
    for (b <- 0 until 3) {
      val df = batch(b)
      t.mergeByKeys("id", df.select("id"), df)
    }
    assert(t.meta.currentSnapshot.get.eqDeleteFiles.size === 2)
    t.autoMaintain() // all args from properties
    assert(t.meta.currentSnapshot.get.eqDeleteFiles.isEmpty,
      "property-configured bound must trigger the convert")
  }

  test("autoMaintain is a cheap no-op below thresholds (no commits)") {
    val cat = freshCatalog()
    val t = morTable(cat, "m.noop")
    val df = batch(0)
    t.mergeByKeys("id", df.select("id"), df)
    val v0 = t.meta.version
    assert(!t.autoMaintain(everyCommits = 10, maxEqDeleteFiles = 4, maxDeleteFiles = 8))
    assert(t.meta.version === v0, "below-threshold maintenance must not commit")
  }
}
