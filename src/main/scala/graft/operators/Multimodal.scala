package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` payloads plus a typed metadata struct. The decode /
  * feature-extract kernels themselves need codec libraries that are not in
  * this container, so the kernel is STUBBED with a deterministic fake —
  * but the Spark-side shape is real: schema, per-partition batched
  * processing, and the partitioning story (payloads are processed where
  * they sit; only extracted features shuffle).
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

  /** STUB decode kernel: a real deployment would decode the image/audio
    * bytes here (per partition, batching rows through the codec). The
    * deterministic fake derives "dimensions" and a "mean luma" from the
    * payload bytes so the plumbing is testable end-to-end. */
  private def fakeDecode(id: Long, mediaType: String, payload: Array[Byte])
      : MediaFeature = {
    val n = payload.length.toLong
    // ??? <- real codec call goes here; deterministic fake below
    val width = (n % 640L).toInt + 1
    val height = ((n * 31L) % 480L).toInt + 1
    val luma =
      if (payload.isEmpty) 0.0
      else payload.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
    MediaFeature(id, mediaType, n, width, height,
      math.rint(luma * 1e6) / 1e6)
  }

  /** Per-partition feature extraction over media payloads — the
    * `mapPartitions` shape a real decoder needs (amortized codec init per
    * partition, rows streamed through in batches). */
  def extractFeatures(media: DataFrame, idCol: String): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.select(col(idCol).cast(LongType), col("media_meta.media_type"),
        col("payload"))
      .mapPartitions { rows =>
        // codec/session init would happen once per partition here
        rows.map { r: Row =>
          fakeDecode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
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
