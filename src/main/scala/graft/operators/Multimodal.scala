package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star): treat image/audio/video as
  * opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extract / resize / frame-sample as per-partition batch
  * transforms.
  *
  * Real decoders, no external libraries: WAV (RIFF/PCM) and BMP (BI_RGB)
  * are parsed by hand, and PNG/JPEG/GIF decode through the JDK's own
  * `javax.imageio` — see the "REAL decoders" section below. `decodeStub`
  * remains only as the declared FFI slot for video formats (mp4-class),
  * deriving deterministic fake features from a fake header; its schema,
  * partitioning, batch shape, and null handling are the real production
  * plumbing a codec call would slot into.
  *
  * Scale design: media blobs never shuffle — all transforms are
  * partition-local maps; feature extraction happens before any join or
  * aggregation so only small feature rows move. Target file sizing for
  * binary-heavy tables is handled by the lake layer's
  * rewrite_data_files (write.target-file-size-bytes).
  */
object Multimodal {

  /** Typed metadata carried with every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png | wav | mp4 | ...
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),    // audio/video
    StructField("size_bytes", LongType)))

  /** Media table schema: id + opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Build a deterministic fake media table from any source DataFrame —
    * the blob is a fake header (media_type, format, w, h) + payload bytes
    * derived from a seed column. Stands in for `spark.read.format("binaryFile")`. */
  def synthesize(src: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val seed = col(seedCol).cast("string")
    val payload = repeat(sha2(seed, 256), 8) // ~512 bytes of stable payload
    val w = (pmod(crc32(seed), lit(1024)) + 64).cast("int")
    val h = (pmod(crc32(concat(seed, lit("h"))), lit(1024)) + 64).cast("int")
    val fmt = element_at(array(lit("png"), lit("jpeg"), lit("webp")),
      pmod(crc32(concat(seed, lit("f"))), lit(3)).cast("int") + 1)
    val header = concat_ws("|", lit("IMG"), fmt, w, h)
    src.select(
      col(idCol).cast("long").as("media_id"),
      encode(concat(header, lit("\n"), payload), "UTF-8").as("media"),
      struct(
        lit("image").as("media_type"), fmt.as("format"),
        w.as("width"), h.as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        length(payload).cast("long").as("size_bytes")).as("meta"))
  }

  /** Decoded-feature schema a real decoder would emit. */
  val featureType: StructType = StructType(Seq(
    StructField("ok", BooleanType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType)))

  /** STUB decode: parse our fake header + compute deterministic features.
    * Real implementation would call the codec here (per-partition, batch
    * of rows per call). Null/corrupt blobs → ok=false row, never a crash. */
  def decodeStub(media: Column): Column = {
    val s = media.cast(StringType)
    val header = split(substring_index(s, "\n", 1), "\\|")
    val valid = size(header) === 4 && header.getItem(0) === "IMG"
    struct(
      valid.as("ok"),
      when(valid, header.getItem(1)).as("format"),
      when(valid, header.getItem(2).try_cast("int")).as("width"),
      when(valid, header.getItem(3).try_cast("int")).as("height"),
      length(media).cast("long").as("n_bytes"),
      crc32(media).as("checksum"))
  }

  /** "Resize": rewrite the header dims (stub for a real pixel transform);
    * metadata struct updated in lockstep — the invariant a real pipeline
    * must keep. */
  def resizeStub(df: DataFrame, maxDim: Int): DataFrame = {
    val f = decodeStub(col("media"))
    df.withColumn("_f", f)
      .withColumn("_scale",
        when(greatest(col("_f.width"), col("_f.height")) > maxDim,
          lit(maxDim).cast("double") / greatest(col("_f.width"), col("_f.height")).cast("double"))
        .otherwise(lit(1.0)))
      .withColumn("_w2", floor(col("_f.width") * col("_scale")).cast("int"))
      .withColumn("_h2", floor(col("_f.height") * col("_scale")).cast("int"))
      .select(
        col("media_id"),
        encode(concat_ws("|", lit("IMG"), col("_f.format"), col("_w2"), col("_h2")), "UTF-8").as("media"),
        col("meta").withField("width", col("_w2")).withField("height", col("_h2")).as("meta"))
  }

  /** Frame-sample stub for video: emit one row per sampled frame index —
    * the explode shape a real frame extractor produces. */
  def frameSampleStub(df: DataFrame, everyNthMs: Long): DataFrame =
    df.filter(col("meta.duration_ms").isNotNull)
      .select(col("media_id"), col("meta"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyNthMs))).as("frame_ms"))

  /** Feature extraction over a media table: partition-local, media column
    * dropped as early as possible so blobs never shuffle. */
  def extractFeatures(df: DataFrame): DataFrame =
    df.select(col("media_id"), decodeStub(col("media")).as("f"))
      .select(col("media_id"), col("f.*"))

  // ---- REAL decoders (no codec libraries needed) ---------------------------
  // WAV (RIFF/PCM) and BMP (BI_RGB) are fixed-layout self-describing
  // formats parsed by hand; PNG/JPEG/GIF decode through the JDK's own
  // javax.imageio (graft.functions.ImageFeatures) — no external jar.
  // Only video formats (mp4-class) remain behind the declared decodeStub
  // FFI slot.

  /** PCM WAV decode: struct(ok, channels, sample_rate, bits, n_samples,
    * duration_ms, rms, peak). Corrupt/truncated blobs → ok=false. */
  def decodeWav(media: Column): Column = graft.functions.WavFeatures(media)

  /** Uncompressed BMP decode: struct(ok, width, height, bpp, mean_r,
    * mean_g, mean_b). Corrupt/unsupported blobs → ok=false. */
  def decodeBmp(media: Column): Column = graft.functions.BmpFeatures(media)

  /** Compressed-image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP):
    * struct(ok, format, width, height, mean_r, mean_g, mean_b).
    * Corrupt/unknown blobs → ok=false. */
  def decodeImage(media: Column): Column = graft.functions.ImageFeatures(media)

  /** Audio feature extraction (real decode): blobs stay partition-local,
    * only the small feature rows survive the projection. */
  def extractAudioFeatures(df: DataFrame, mediaCol: String = "media",
                           idCol: String = "media_id"): DataFrame =
    df.select(col(idCol), decodeWav(col(mediaCol)).as("f")).select(col(idCol), col("f.*"))

  /** Image feature extraction (real decode) for BMP blobs. */
  def extractImageFeatures(df: DataFrame, mediaCol: String = "media",
                           idCol: String = "media_id"): DataFrame =
    df.select(col(idCol), decodeBmp(col(mediaCol)).as("f")).select(col(idCol), col("f.*"))
}
