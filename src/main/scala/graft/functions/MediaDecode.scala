package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM media decoders for self-describing uncompressed formats —
  * the part of the multimodal story that does NOT need external codec
  * libraries. WAV (RIFF/PCM) and BMP (BI_RGB) headers + payloads are
  * fixed-layout binary, so decode/feature-extract runs as a per-row
  * Catalyst expression: partition-local, blobs never shuffle, corrupt
  * bytes yield ok=false rows instead of task failures. Codec-dependent
  * formats (jpeg/mp4/...) keep the declared-stub FFI slot in
  * [[graft.operators.Multimodal]].
  *
  * CodegenFallback: the work is per-row binary parsing in Java — there is
  * no lambda-dispatch overhead for codegen to remove.
  */
abstract class MediaFeatureExpression extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary column, got ${other.simpleString}")
  }
  override def nullable: Boolean = true
}

/** `wav_features(binary)` → struct(ok, channels, sample_rate, bits,
  * n_samples, duration_ms, rms, peak) for PCM RIFF/WAVE blobs. */
case class WavFeatures(child: Expression) extends MediaFeatureExpression {

  override def dataType: DataType = WavFeatures.schema
  override def prettyName: String = "wav_features"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    WavFeatures.decode(bytes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavFeatures {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType)))

  private def bad: InternalRow =
    new GenericInternalRow(Array[Any](false, null, null, null, null, null, null, null))

  def decode(bytes: Array[Byte]): InternalRow = {
    try {
      if (bytes.length < 44) return bad
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(0) != 0x46464952 /* RIFF */ || bb.getInt(8) != 0x45564157 /* WAVE */) return bad
      // walk chunks for "fmt " and "data"
      var pos = 12
      var channels = -1; var sampleRate = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
        val id = bb.getInt(pos); val sz = bb.getInt(pos + 4)
        if (sz < 0 || pos + 8 + sz > bytes.length) return bad
        if (id == 0x20746d66 /* "fmt " */ && sz >= 16) {
          val audioFormat = bb.getShort(pos + 8) & 0xffff
          if (audioFormat != 1) return bad // PCM only
          channels = bb.getShort(pos + 10) & 0xffff
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
        } else if (id == 0x61746164 /* "data" */) {
          dataOff = pos + 8; dataLen = sz
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      if (channels <= 0 || sampleRate <= 0 || dataOff < 0) return bad
      if (bits != 8 && bits != 16) return bad
      val bytesPerSample = bits / 8
      val frame = channels * bytesPerSample
      if (frame == 0) return bad
      val nSamples = (dataLen / frame).toLong
      var sumSq = 0.0; var peak = 0.0; var i = dataOff
      val end = dataOff + (dataLen / frame) * frame
      while (i < end) {
        val v =
          if (bits == 16) bb.getShort(i).toDouble / 32768.0
          else ((bytes(i) & 0xff) - 128).toDouble / 128.0
        sumSq += v * v
        val a = math.abs(v); if (a > peak) peak = a
        i += bytesPerSample
      }
      val total = (dataLen / bytesPerSample).max(1)
      val rms = math.sqrt(sumSq / total)
      val durationMs = if (sampleRate > 0) nSamples * 1000L / sampleRate else 0L
      new GenericInternalRow(Array[Any](true, channels, sampleRate, bits,
        nSamples, durationMs, rms, peak))
    } catch { case _: Exception => bad }
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(media: Column): Column =
    ColumnBridge.column(WavFeatures(ColumnBridge.expression(media)))
}

/** `bmp_features(binary)` → struct(ok, width, height, bpp, mean_r, mean_g,
  * mean_b) for uncompressed (BI_RGB) 24/32-bpp BMP blobs. */
case class BmpFeatures(child: Expression) extends MediaFeatureExpression {

  override def dataType: DataType = BmpFeatures.schema
  override def prettyName: String = "bmp_features"

  override def nullSafeEval(input: Any): Any =
    BmpFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BmpFeatures {
  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bpp", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  private def bad: InternalRow =
    new GenericInternalRow(Array[Any](false, null, null, null, null, null, null))

  def decode(bytes: Array[Byte]): InternalRow = {
    try {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return bad
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dataOff = bb.getInt(10)
      val width = bb.getInt(18)
      val heightRaw = bb.getInt(22)
      val bpp = bb.getShort(28) & 0xffff
      val compression = bb.getInt(30)
      if (compression != 0 || (bpp != 24 && bpp != 32)) return bad
      val height = math.abs(heightRaw)
      if (width <= 0 || height <= 0 || dataOff < 54) return bad
      val bytesPerPx = bpp / 8
      val rowSize = ((width * bytesPerPx + 3) / 4) * 4
      if (dataOff.toLong + rowSize.toLong * height > bytes.length) return bad
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var y = 0
      while (y < height) {
        var x = 0
        val row = dataOff + y * rowSize
        while (x < width) {
          val p = row + x * bytesPerPx
          sb += (bytes(p) & 0xff); sg += (bytes(p + 1) & 0xff); sr += (bytes(p + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      val n = width.toLong * height
      new GenericInternalRow(Array[Any](true, width, height, bpp,
        sr / n, sg / n, sb / n))
    } catch { case _: Exception => bad }
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(media: Column): Column =
    ColumnBridge.column(BmpFeatures(ColumnBridge.expression(media)))
}

/** `image_features(binary)` → struct(ok, format, width, height, mean_r,
  * mean_g, mean_b) for any format the JDK's `javax.imageio` reads —
  * PNG, JPEG, GIF, BMP, WBMP out of the box, with no external codec
  * library. Channel means are computed over a deterministic pixel grid
  * (stride chosen so at most ~65k pixels are sampled) to bound per-row
  * cost on large images. Corrupt/unknown bytes → ok=false. */
case class ImageFeatures(child: Expression) extends MediaFeatureExpression {

  override def dataType: DataType = ImageFeatures.schema
  override def prettyName: String = "image_features"

  override def nullSafeEval(input: Any): Any =
    ImageFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageFeatures {
  import org.apache.spark.unsafe.types.UTF8String

  val schema: StructType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  private def bad: InternalRow =
    new GenericInternalRow(Array[Any](false, null, null, null, null, null, null))

  /** Max pixels visited per image for the channel means. */
  private val SamplePixels = 1 << 16

  /** Max DECLARED pixels before we refuse to decode at all. The header
    * dimensions are untrusted input: `reader.read(0)` materializes the
    * full raster (≥4 bytes/pixel), so a crafted 1 KB PNG declaring
    * 100k×100k would allocate ~40 GB per row and OOM the executor. The
    * header width/height are read WITHOUT decoding pixel data; anything
    * above 64 MP (≈256 MB raster — far beyond any legitimate training
    * image) returns ok=false instead. */
  private val MaxPixels = 64L << 20

  def decode(bytes: Array[Byte]): InternalRow = {
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (iis == null) return bad
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return bad
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        // header-only dimension probe BEFORE any pixel decode
        val hdrW = reader.getWidth(0); val hdrH = reader.getHeight(0)
        if (hdrW <= 0 || hdrH <= 0 || hdrW.toLong * hdrH > MaxPixels) return bad
        val img = reader.read(0)
        if (img == null) return bad
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) return bad
        val stride = math.max(1,
          math.ceil(math.sqrt(w.toDouble * h / SamplePixels)).toInt)
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            n += 1
            x += stride
          }
          y += stride
        }
        new GenericInternalRow(Array[Any](true, UTF8String.fromString(fmt),
          w, h, sr / n, sg / n, sb / n))
      } finally reader.dispose()
    } catch { case _: Exception => bad }
    finally iis.close()
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(media: Column): Column =
    ColumnBridge.column(ImageFeatures(ColumnBridge.expression(media)))
}
