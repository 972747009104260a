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

  // ---- real decoders (pure-JVM formats) -----------------------------------

  /** Build a real PCM WAV blob: 16-bit mono sine wave. */
  def wavBytes(sampleRate: Int, amplitude: Double, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataLen = nSamples * 2
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    (0 until nSamples).foreach { i =>
      val v = amplitude * math.sin(2 * math.Pi * 440 * i / sampleRate)
      bb.putShort((v * 32767).toShort)
    }
    bb.array()
  }

  /** Build a real uncompressed 24-bpp BMP of one solid color. */
  def bmpBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataLen = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + dataLen)
    bb.putInt(0); bb.putInt(54)           // reserved, data offset
    bb.putInt(40); bb.putInt(w); bb.putInt(h) // BITMAPINFOHEADER
    bb.putShort(1); bb.putShort(24); bb.putInt(0) // planes, bpp, BI_RGB
    bb.putInt(dataLen); bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
    (0 until h).foreach { _ =>
      (0 until w).foreach { _ =>
        bb.put(b.toByte); bb.put(g.toByte); bb.put(r.toByte)
      }
      (w * 3 until rowSize).foreach(_ => bb.put(0.toByte))
    }
    bb.array()
  }

  test("WAV decode: real RIFF/PCM parsing, sine RMS ~= A/sqrt(2), corrupt -> ok=false") {
    import spark.implicits._
    val rows = Seq(
      (1L, wavBytes(8000, 0.5, 8000)),           // 1 s of 440 Hz at A=0.5
      (2L, wavBytes(16000, 0.25, 4000)),         // 0.25 s at A=0.25
      (3L, "not a wav at all".getBytes)
    ).toDF("media_id", "media")
    val f = Multimodal.extractAudioFeatures(rows).orderBy("media_id").collect()
    assert(f(0).getAs[Boolean]("ok"))
    assert(f(0).getAs[Int]("sample_rate") === 8000)
    assert(f(0).getAs[Int]("channels") === 1 && f(0).getAs[Int]("bits") === 16)
    assert(f(0).getAs[Long]("n_samples") === 8000L)
    assert(f(0).getAs[Long]("duration_ms") === 1000L)
    assert(math.abs(f(0).getAs[Double]("rms") - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(f(0).getAs[Double]("peak") - 0.5) < 0.01)
    assert(f(1).getAs[Long]("duration_ms") === 250L)
    assert(math.abs(f(1).getAs[Double]("rms") - 0.25 / math.sqrt(2)) < 0.01)
    assert(!f(2).getAs[Boolean]("ok"))
  }

  test("BMP decode: real header + pixel means, padding handled, corrupt -> ok=false") {
    import spark.implicits._
    val rows = Seq(
      (1L, bmpBytes(5, 3, 200, 100, 50)), // width 5 -> row padding exercised
      (2L, bmpBytes(4, 4, 0, 255, 0)),
      (3L, Array[Byte](1, 2, 3))
    ).toDF("media_id", "media")
    val f = Multimodal.extractImageFeatures(rows).orderBy("media_id").collect()
    assert(f(0).getAs[Boolean]("ok"))
    assert(f(0).getAs[Int]("width") === 5 && f(0).getAs[Int]("height") === 3)
    assert(f(0).getAs[Double]("mean_r") === 200.0)
    assert(f(0).getAs[Double]("mean_g") === 100.0)
    assert(f(0).getAs[Double]("mean_b") === 50.0)
    assert(f(1).getAs[Double]("mean_g") === 255.0)
    assert(!f(2).getAs[Boolean]("ok"))
  }

  /** Encode a solid-color image with the JDK's own writers. */
  def imageBytes(fmt: String, w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("ImageIO decode: real PNG and JPEG bytes, corrupt -> ok=false") {
    import spark.implicits._
    val rows = Seq(
      (1L, imageBytes("png", 7, 5, 200, 100, 50)),
      (2L, imageBytes("jpg", 16, 8, 0, 255, 0)),
      (3L, imageBytes("gif", 4, 4, 10, 20, 30)),
      (4L, "definitely not an image".getBytes)
    ).toDF("media_id", "media")
    val f = rows.select(col("media_id"), Multimodal.decodeImage(col("media")).as("f"))
      .select(col("media_id"), col("f.*")).orderBy("media_id").collect()
    assert(f(0).getAs[Boolean]("ok"))
    assert(f(0).getAs[String]("format") === "png")
    assert(f(0).getAs[Int]("width") === 7 && f(0).getAs[Int]("height") === 5)
    assert(f(0).getAs[Double]("mean_r") === 200.0) // PNG is lossless
    assert(f(0).getAs[Double]("mean_g") === 100.0)
    assert(f(0).getAs[Double]("mean_b") === 50.0)
    assert(f(1).getAs[Boolean]("ok"))
    assert(f(1).getAs[String]("format").startsWith("jp"))
    assert(f(1).getAs[Int]("width") === 16 && f(1).getAs[Int]("height") === 8)
    assert(f(1).getAs[Double]("mean_g") > 240.0, "JPEG is lossy; green stays dominant")
    assert(f(1).getAs[Double]("mean_r") < 60.0)
    assert(f(2).getAs[Boolean]("ok") && f(2).getAs[String]("format") === "gif")
    assert(!f(3).getAs[Boolean]("ok"))
  }

  test("image_features is SQL-registered and null-safe") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    Seq((1L, imageBytes("png", 3, 3, 1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media").createOrReplaceTempView("mm_img")
    val rs = spark.sql(
      "SELECT media_id, image_features(media) AS f FROM mm_img ORDER BY media_id")
      .collect()
    assert(rs(0).getStruct(1).getAs[Boolean]("ok"))
    assert(rs(0).getStruct(1).getAs[Int]("width") === 3)
    assert(rs(1).isNullAt(1), "null blob -> null struct (expression is null-safe)")
  }

  test("media decoders register as SQL functions") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    Seq((1L, wavBytes(8000, 0.3, 1000))).toDF("media_id", "media")
      .createOrReplaceTempView("mm_wav")
    val r = spark.sql("SELECT wav_features(media).sample_rate AS sr FROM mm_wav").head
    assert(r.getInt(0) === 8000)
  }

  /** A syntactically valid PNG signature + IHDR declaring `w`×`h` (correct
    * chunk CRC so ImageIO's header parse succeeds) with no pixel data.
    * The header is what an adversarial blob controls: ImageIO reports
    * these dimensions without decoding anything. */
  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val body = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(body)
    d.writeInt(w); d.writeInt(h)
    d.writeByte(8); d.writeByte(2) // 8-bit depth, truecolor RGB
    d.writeByte(0); d.writeByte(0); d.writeByte(0)
    val ihdr = body.toByteArray
    val typ = "IHDR".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val lenOut = new java.io.DataOutputStream(out)
    lenOut.writeInt(ihdr.length)
    out.write(typ); out.write(ihdr)
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(ihdr)
    lenOut.writeInt(crc.getValue.toInt)
    out.toByteArray
  }

  test("image_features refuses adversarial dimensions before decoding (64 MP cap)") {
    import spark.implicits._
    // a 1 KB blob declaring 30000×30000 would make reader.read(0) allocate
    // a ~3.6 GB raster per row — the header-only dimension check must
    // return ok=false without ever reaching the decode
    val huge = pngHeader(30000, 30000)
    val rows = Seq((1L, huge), (2L, imageBytes("png", 5, 4, 9, 9, 9)))
      .toDF("media_id", "media")
    val f = rows.select(col("media_id"), Multimodal.decodeImage(col("media")).as("f"))
      .select(col("media_id"), col("f.*")).orderBy("media_id").collect()
    assert(!f(0).getAs[Boolean]("ok"), "over-cap dimensions must be rejected")
    // legitimate images still decode
    assert(f(1).getAs[Boolean]("ok"))
    assert(f(1).getAs[Int]("width") === 5 && f(1).getAs[Int]("height") === 4)
    // boundary: a plausible header UNDER the cap passes the dimension gate
    // (and then fails decode only because there is no pixel data)
    val underCap = pngHeader(4000, 4000)
    val g = Seq((1L, underCap)).toDF("media_id", "media")
      .select(Multimodal.decodeImage(col("media")).as("f")).select(col("f.*")).head
    assert(!g.getAs[Boolean]("ok"), "truncated body cannot decode — but must not throw")
  }
}
