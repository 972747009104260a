package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing spec: binary columns + typed metadata, stubbed
  * decode/resize/frame-sample (the codecs are fakes; the schema,
  * partitioning and null-handling are the real contract). */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def media: DataFrame = {
    import spark.implicits._
    Multimodal.synthesize(
      Seq((1L, "seed-a"), (2L, "seed-b"), (3L, "seed-c")).toDF("id", "s"),
      "id", "s")
  }

  test("synthesized media table has the contract schema") {
    val df = media
    assert(df.schema("media").dataType.typeName === "binary")
    // literals tighten nullability; names + types are the contract
    val metaFields = df.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaFields.fields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() === 3)
  }

  test("decode stub extracts header features; corrupt blobs yield ok=false") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.getAs[Boolean]("ok")))
    assert(feats.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 1088))
    // corrupt blob
    val bad = Seq((9L, "not a header".getBytes("UTF-8"))).toDF("media_id", "media")
    val f = Multimodal.extractFeatures(bad).head
    assert(!f.getAs[Boolean]("ok"))
    assert(f.getAs[Long]("n_bytes") > 0)
  }

  test("decode is deterministic (same seed → same checksum)") {
    val a = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(a.map(_.getAs[Long]("checksum")).toSeq === b.map(_.getAs[Long]("checksum")).toSeq)
  }

  test("resize stub caps dims and keeps metadata in lockstep") {
    val resized = Multimodal.resizeStub(media, maxDim = 128)
    val feats = Multimodal.extractFeatures(resized).collect()
    assert(feats.forall(r => r.getAs[Int]("width") <= 128 && r.getAs[Int]("height") <= 128))
    // meta matches re-decoded header
    val joined = resized.select(col("media_id"), col("meta.width").as("mw"))
      .join(Multimodal.extractFeatures(resized).select(col("media_id"), col("width")), "media_id")
    assert(joined.filter(col("mw") =!= col("width")).count() === 0)
  }

  test("frame-sample stub explodes one row per sampled frame") {
    import spark.implicits._
    val vid = Seq((1L, Array[Byte](1), ("video", "mp4", 0, 0, 2500L, 1L)))
      .toDF("media_id", "media", "meta")
      .select(col("media_id"), col("media"),
        col("meta").cast(Multimodal.mediaMetaType).as("meta"))
    val frames = Multimodal.frameSampleStub(vid, everyNthMs = 1000L)
    assert(frames.select("frame_ms").collect().map(_.getLong(0)).toSeq === Seq(0L, 1000L, 2000L))
  }
}
