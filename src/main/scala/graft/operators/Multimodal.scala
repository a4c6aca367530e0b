package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star mandate): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as batched per-partition transforms.
  *
  * IMAGE decode is REAL: [[decodeImage]] reads PNG/JPEG/BMP/GIF payloads
  * with `javax.imageio` (JDK-only, no external codec) into dimension +
  * pixel-statistic features. AUDIO decode is REAL for PCM WAV/AIFF/AU:
  * [[decodeAudio]] parses them with `javax.sound.sampled` (also JDK-only)
  * into duration/rate/channel + amplitude-statistic features. VIDEO (and
  * compressed audio — no MP3/Vorbis codec ships in this container)
  * remains an honest STUB, with [[stubDecode]] deriving deterministic
  * fake features from the bytes; a real codec drops into the same
  * dispatch without touching the plan. The batched-iterator shape mirrors
  * arrow-batch UDF execution (decode cost amortized per batch, not per
  * row).
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  final case class MediaRecord(media_id: Long, media_type: String, content: Array[Byte])

  /** Extracted features for one media payload. */
  final case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, feature: Array[Float])

  /** ImageIO's default stream cache spools every read/write through a
    * temp FILE on local disk — per-record disk I/O in a pure in-memory
    * transform. Disabled once per JVM before any ImageIO use here. */
  private lazy val imageIOCacheDisabled: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** The ONE decode-attempt policy (type gate + guarded `ImageIO.read`)
    * shared by [[decodeImage]] and [[resizeImages]] — what counts as a
    * decodable image must not drift between the feature and resize
    * paths. */
  private def tryDecodeImage(m: MediaRecord): Option[java.awt.image.BufferedImage] = {
    imageIOCacheDisabled
    if (m.media_type == null || !m.media_type.startsWith("image")) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content)))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL image decode via `javax.imageio` (JDK built-in: PNG, JPEG, BMP,
    * GIF, WBMP). Features (padded/truncated to `featureDim`):
    * [width, height, nChannels, meanR, meanG, meanB, meanLuma, aspect].
    * Pixel stats sample at most a 64×64 grid regardless of resolution, so
    * per-image work is bounded — the property that matters when the batch
    * iterator walks a 100 TB corpus. Returns None for bytes no installed
    * reader understands (caller falls back to [[stubDecode]]). */
  def decodeImage(m: MediaRecord, featureDim: Int = 8): Option[MediaFeatures] = {
    tryDecodeImage(m).map { im =>
      val w = im.getWidth
      val h = im.getHeight
      val stepX = math.max(1, w / 64)
      val stepY = math.max(1, h / 64)
      var r = 0.0; var g = 0.0; var b = 0.0; var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = im.getRGB(x, y)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          n += 1
          x += stepX
        }
        y += stepY
      }
      val denom = math.max(n, 1) * 255.0
      val raw = Array[Float](
        w.toFloat, h.toFloat, im.getColorModel.getNumComponents.toFloat,
        (r / denom).toFloat, (g / denom).toFloat, (b / denom).toFloat,
        ((0.299 * r + 0.587 * g + 0.114 * b) / denom).toFloat,
        w.toFloat / math.max(h, 1))
      MediaFeatures(m.media_id, m.media_type, m.content.length.toLong,
        java.util.Arrays.copyOf(raw, featureDim))
    }
  }

  /** REAL audio decode for PCM payloads in the containers the JDK's
    * `javax.sound.sampled` parses natively (WAV, AIFF, AU — no external
    * codec). Features (padded/truncated to `featureDim`):
    * [durationSec, sampleRate, channels, sampleBits, nFrames, rms, peak,
    * meanAbs] — the amplitude statistics over ALL samples normalized to
    * [−1, 1] across channels. One linear pass over the payload (same
    * asymptotic cost as the stub digest). Returns None for non-audio
    * types, compressed encodings (MP3/Vorbis — no codec in this
    * container), or bytes the parser rejects: the caller falls back to
    * [[stubDecode]], so a resize-style pass never throws on undecodable
    * media. */
  def decodeAudio(m: MediaRecord, featureDim: Int = 8): Option[MediaFeatures] = {
    if (m.media_type == null || !m.media_type.startsWith("audio")) return None
    val parsed =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.content))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val pcm = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          if (pcm && bits > 0 && bits % 8 == 0 && bits <= 32)
            Some((fmt, in.readAllBytes()))
          else None
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    parsed.map { case (fmt, data) =>
      val bits = fmt.getSampleSizeInBits
      val bps = bits / 8
      val signed =
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val big = fmt.isBigEndian
      val shift = 32 - bits
      val full = (1L << (bits - 1)).toDouble
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
      var nSamples = 0L
      var i = 0
      while (i + bps <= data.length) {
        var v = 0
        if (big) { var j = 0; while (j < bps) { v = (v << 8) | (data(i + j) & 0xff); j += 1 } }
        else { var j = bps - 1; while (j >= 0) { v = (v << 8) | (data(i + j) & 0xff); j -= 1 } }
        val s = if (signed) (v << shift) >> shift else v - (1 << (bits - 1))
        val x = s / full
        sumSq += x * x; sumAbs += math.abs(x)
        if (math.abs(x) > peak) peak = math.abs(x)
        nSamples += 1
        i += bps
      }
      val n = math.max(nSamples, 1L).toDouble
      val nFrames = data.length / math.max(fmt.getFrameSize, 1)
      val raw = Array[Float](
        (nFrames / fmt.getFrameRate).toFloat, fmt.getSampleRate,
        fmt.getChannels.toFloat, bits.toFloat, nFrames.toFloat,
        math.sqrt(sumSq / n).toFloat, peak.toFloat, (sumAbs / n).toFloat)
      MediaFeatures(m.media_id, m.media_type, m.content.length.toLong,
        java.util.Arrays.copyOf(raw, featureDim))
    }
  }

  /** Per-record dispatch: image and PCM-audio payloads decode for real;
    * everything else (and undecodable bytes) takes the deterministic
    * stub. */
  def decode(m: MediaRecord, featureDim: Int = 8): MediaFeatures =
    decodeImage(m, featureDim)
      .orElse(decodeAudio(m, featureDim))
      .getOrElse(stubDecode(m, featureDim))

  /** STUB decode kernel — stands in for a real audio/video decoder.
    * Deterministic: features are an FNV-1a rolling digest of the payload,
    * so tests (and the driver's rows-only check) are stable. A real
    * implementation would decode samples/frames here. */
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
        batch.map(m => decode(m, featureDim))
      }
    }
  }

  /** Output of [[resizeImages]]: the (possibly re-encoded) payload plus a
    * flag — non-image and undecodable payloads pass through unchanged. */
  final case class ResizedMedia(media_id: Long, media_type: String,
      content: Array[Byte], resized: Boolean)

  /** REAL image resize (JDK-only): decode via `javax.imageio`, bilinear
    * Graphics2D scale to (targetW, targetH), re-encode as PNG — the
    * normalize-resolution pass before vision-model training. Runs as the
    * same batched per-partition transform as [[extractFeatures]] (codec
    * setup amortizes per batch; narrow, no shuffle). Non-image media and
    * bytes no installed reader understands pass through untouched with
    * `resized = false` — a resize pass must never destroy payloads it
    * cannot parse. Headless-safe (BufferedImage needs no display). */
  def resizeImages(ds: Dataset[MediaRecord], targetW: Int = 64, targetH: Int = 64,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, s"resize target must be positive: ${targetW}x$targetH")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          tryDecodeImage(m) match {
            case Some(im) =>
              val out = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(im, 0, 0, targetW, targetH, null)
              } finally g.dispose()
              val bytes = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bytes)
              ResizedMedia(m.media_id, "image/png", bytes.toByteArray, resized = true)
            case None =>
              ResizedMedia(m.media_id, m.media_type, m.content, resized = false)
          }
        }
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
