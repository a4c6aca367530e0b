package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star mandate): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as batched per-partition transforms.
  *
  * The DECODE KERNELS ARE STUBS — no image/audio codecs ship in this
  * container, so [[stubDecode]] derives deterministic fake features from
  * the bytes (clearly marked below). Everything around them — schema,
  * Dataset encoders, partition-level batching shape, determinism — is real
  * and tested; a real codec drops into [[stubDecode]] without touching the
  * plan. The batched-iterator shape mirrors arrow-batch UDF execution
  * (decode cost amortized per batch, not per row).
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  final case class MediaRecord(media_id: Long, media_type: String, content: Array[Byte])

  /** Extracted features for one media payload. */
  final case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, feature: Array[Float])

  /** STUB decode kernel — stands in for a real image/audio decoder.
    * Deterministic: features are an FNV-1a rolling digest of the payload,
    * so tests (and the driver's rows-only check) are stable. A real
    * implementation would decode pixels/samples here. */
  def stubDecode(m: MediaRecord, featureDim: Int = 8): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    val feat = new Array[Float](featureDim)
    var i = 0
    while (i < m.content.length) {
      h ^= (m.content(i) & 0xffL)
      h *= 0x100000001b3L
      feat(i % featureDim) += ((h >>> 40).toInt & 0xff) / 255.0f
      i += 1
    }
    MediaFeatures(m.media_id, m.media_type, m.content.length.toLong, feat)
  }

  /** Batched per-partition feature extraction: partitions stream through
    * in `batchSize` groups (the arrow-batch shape — a real decoder would
    * amortize model/codec setup per batch). Narrow, no shuffle. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64,
      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model load)
        batch.map(m => stubDecode(m, featureDim))
      }
    }
  }

  /** STUB frame sampler — keeps every `everyN`-th fixed-size slice of the
    * payload (a real implementation would demux video frames). Shape and
    * determinism are what matter for the plumbing. */
  def sampleFrames(df: DataFrame, contentCol: String, everyN: Int = 10,
      frameBytes: Int = 1024): DataFrame = {
    val nFrames = floor(length(col(contentCol)).cast("double") / frameBytes).cast("int")
    df.withColumn("frames",
      transform(
        filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % everyN === 0),
        i => col(contentCol).substr(i * frameBytes + 1, lit(frameBytes))))
  }

  /** DataFrame-level wrapper: (idCol, typeCol, binaryCol) → features. */
  def extractFeaturesDF(spark: SparkSession, df: DataFrame, idCol: String,
      typeCol: String, binaryCol: String, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).cast("string").as("media_type"),
      col(binaryCol).as("content")).as[MediaRecord]
    extractFeatures(ds, batchSize).toDF()
  }
}
