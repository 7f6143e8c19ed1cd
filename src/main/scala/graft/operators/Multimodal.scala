package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` payloads plus a typed metadata struct, processed
  * where they sit (mapPartitions decode, codec init amortized per
  * partition; only extracted features shuffle).
  *
  * The decode kernel is REAL: a pure-JVM 24-bit BMP parser (magic bytes,
  * little-endian header fields, 4-byte row stride padding, bottom-up row
  * order, BGR channel order) — no external codec library needed. Since
  * the container ships no image files, the matching [[encodeBmp]] writer
  * builds genuine BMP payloads from document bytes as the test fixture;
  * the round-trip is independently validated against the JDK's own
  * javax.imageio BMP codec in the spec.
  */
object Multimodal {

  /** Typed media metadata attached next to the payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("sha256", StringType)))

  case class MediaFeature(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, mean_luma: Double)

  /** Wrap a text/bytes column as a media payload column + metadata struct
    * — the ingestion shape for binary assets. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame = {
    val payload = col(payloadCol).cast(BinaryType)
    df.select(col(idCol),
      payload.as("payload"),
      struct(lit(mediaType).as("media_type"),
        octet_length(payload).cast(LongType).as("n_bytes"),
        sha2(payload, 256).as("sha256")).as("media_meta"))
  }

  /** Build REAL BMP image payloads from a text column (the fixture
    * path: document bytes become the BGR pixel stream). Width is
    * id-derived (8 + id % 8, clamped to the pixel count) so the corpus
    * carries varied geometry; height uses every full pixel row. The
    * whole construction is deterministic integer arithmetic, so the
    * DuckDB oracle can replicate width/height/luma from the text. */
  def asBmpMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val bmps = df.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val id = r.getLong(0)
          val bytes = r.getString(1).getBytes("UTF-8")
          val npix = bytes.length / 3
          require(npix >= 1, s"text of id=$id too short for one pixel")
          val w = math.min(8 + (id % 8).toInt, npix)
          val h = npix / w
          (id, encodeBmp(java.util.Arrays.copyOf(bytes, 3 * w * h), w))
        }
      }(enc).toDF(idCol, "payload")
    bmps.select(col(idCol),
      col("payload"),
      struct(lit("image/bmp").as("media_type"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256")).as("media_meta"))
  }

  // ---- real pure-JVM BMP codec -------------------------------------

  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putI32le(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  /** Bytes per stored pixel row: 3 bytes/pixel, rows padded to a
    * 4-byte boundary — the BMP invariant every real decoder honors. */
  private def stride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Write a real 24bpp bottom-up BITMAPINFOHEADER BMP whose pixel
    * stream (BGR scan order, padding excluded) is exactly `pixels` —
    * the deterministic fixture generator standing in for image files
    * the container doesn't have. `pixels.length` must be `3*w*h`. */
  def encodeBmp(pixels: Array[Byte], width: Int): Array[Byte] = {
    require(width >= 1 && pixels.length >= 3 * width &&
      pixels.length % (3 * width) == 0,
      s"pixel buffer ${pixels.length} not a whole number of rows of width $width")
    val height = pixels.length / (3 * width)
    val rowBytes = stride(width)
    val size = 54 + rowBytes * height
    val out = new Array[Byte](size) // zero-filled -> padding bytes are 0
    out(0) = 'B'; out(1) = 'M'
    putI32le(out, 2, size)
    putI32le(out, 10, 54) // pixel data offset
    putI32le(out, 14, 40) // BITMAPINFOHEADER
    putI32le(out, 18, width)
    putI32le(out, 22, height) // positive -> bottom-up row storage
    out(26) = 1 // planes
    out(28) = 24 // bits per pixel
    putI32le(out, 34, rowBytes * height)
    var row = 0
    while (row < height) {
      // logical row `row` (top-down) lands at file row height-1-row
      val src = row * 3 * width
      val dst = 54 + (height - 1 - row) * rowBytes
      System.arraycopy(pixels, src, out, dst, 3 * width)
      row += 1
    }
    out
  }

  /** Parse a 24bpp BMP: validates magic + header, honors the pixel
    * data offset, per-row stride padding, and bottom-up row order.
    * Returns (width, height, lumaSum) where lumaSum is the EXACT
    * integer Σ(299R + 587G + 114B) over all pixels — integer so the
    * cross-engine oracle sum is associative and bit-stable. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Long) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOff = i32le(bytes, 10)
    val width = i32le(bytes, 18)
    val heightRaw = i32le(bytes, 22)
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    require(i32le(bytes, 28) == 24 || (bytes(28) & 0xff) == 24,
      s"unsupported bpp ${bytes(28) & 0xff} (24bpp only)")
    val rowBytes = stride(width)
    require(bytes.length >= dataOff + rowBytes * height,
      "truncated BMP pixel data")
    var lumaSum = 0L
    var row = 0
    while (row < height) {
      val fileRow = if (bottomUp) height - 1 - row else row
      var p = dataOff + fileRow * rowBytes
      var x = 0
      while (x < width) {
        val b = bytes(p) & 0xff
        val g = bytes(p + 1) & 0xff
        val r = bytes(p + 2) & 0xff
        lumaSum += 299L * r + 587L * g + 114L * b
        p += 3; x += 1
      }
      row += 1
    }
    (width, height, lumaSum)
  }

  /** Per-partition feature extraction over image payloads — the
    * `mapPartitions` decode shape (codec state init once per partition,
    * rows streamed through). mean_luma = lumaSum / (1000*255*pixels),
    * floor-quantized to 6 decimals: the numerator is an exact integer
    * in both engines and the single double division + quantization is
    * one IEEE op each, so the value is bit-identical cross-engine. */
  def extractFeatures(media: DataFrame, idCol: String): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.select(col(idCol).cast(LongType), col("media_meta.media_type"),
        col("payload"))
      .mapPartitions { rows =>
        rows.map { r: Row =>
          val payload = r.getAs[Array[Byte]](2)
          val (w, h, lumaSum) = decodeBmp(payload)
          val mean = lumaSum.toDouble / (255000.0 * w * h)
          MediaFeature(r.getLong(0), r.getString(1), payload.length.toLong,
            w, h, math.floor(mean * 1e6 + 0.5) / 1e6)
        }
      }
  }

  /** STUB resize plan: computes the target dimensions and scale factors
    * for each media row without decoding (a real implementation resizes
    * inside the per-partition decode). Pure expressions — the point is
    * that geometry/metadata transforms never touch payload bytes. */
  def resizePlan(features: Dataset[MediaFeature], maxDim: Int): DataFrame = {
    import org.apache.spark.sql.functions.{greatest => fGreatest}
    val f = features.toDF()
    f.withColumn("scale",
        when(fGreatest(col("width"), col("height")) <= maxDim, 1.0)
          .otherwise(lit(maxDim.toDouble) / fGreatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
  }

  /** Fixed-rate frame sampling plan for video payloads: explodes a frame
    * index per payload WITHOUT decoding — the downstream decode then runs
    * per (payload, frame_idx) row, which is the unit that parallelizes. */
  def sampleFrames(media: DataFrame, idCol: String, fps: Double,
      durationSecondsCol: String): DataFrame =
    media.select(col(idCol), col("media_meta"),
      explode(sequence(lit(0),
        greatest((col(durationSecondsCol) * fps).cast(IntegerType) - 1,
          lit(0)))).as("frame_idx"))
}
