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
  * into duration/rate/channel + amplitude-statistic features. VIDEO
  * container METADATA is REAL for MP4/ISO-BMFF: [[decodeVideoMeta]]
  * box-walks `moov` for duration, dimensions, and track count with zero
  * dependencies. VIDEO FRAME decode is REAL for AVI payloads carrying
  * uncompressed BI_RGB or MJPEG frames ([[decodeAviFrames]] — a RIFF
  * walk plus raw byte reads / the JDK JPEG reader, zero external codec);
  * inter-coded codecs (H.264/H.265/VP9) and perceptually-compressed
  * audio (MP3/Vorbis/AAC) have no JDK decoder and remain honest STUBS,
  * with [[stubDecode]] deriving deterministic fake features from the
  * bytes; a real codec drops into the same dispatch without touching the
  * plan. G.711 µ-law/A-law compressed audio DOES decode for real — the
  * expansion tables are engine-owned integer kernels (see
  * [[G711.ulawToLinear]]).
  * The batched-iterator shape mirrors arrow-batch UDF execution (decode
  * cost amortized per batch, not per row).
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

  /** The decoded LINEAR-sample view of an audio payload: sample count,
    * the normalization width in bits, and indexed access returning
    * centered signed integers. One view serves every audio kernel
    * ([[decodeAudio]] features, [[audioEnvelope]] fingerprints) so what
    * counts as decodable — and how a sample reconstructs — cannot drift
    * between them. */
  private final case class SampleView(fmt: javax.sound.sampled.AudioFormat,
      n: Int, bits: Int, sampleAt: Int => Long)

  /** Parse an audio payload into a [[SampleView]]. REAL decode paths:
    *
    *  - **linear PCM** (signed/unsigned, 8–32 bit, WAV/AIFF/AU) — exact
    *    Long reconstruction, big- or little-endian;
    *  - **G.711 µ-law / A-law** (WAV format tags 7/6, µ-law AU) — the
    *    JDK parser reports `Encoding.ULAW`/`ALAW` 8-bit bytes, each of
    *    which expands through the engine-owned integer tables
    *    ([[G711]]) to a 16-bit linear sample; `bits = 16` so amplitude
    *    normalization uses the expanded scale.
    *
    * Perceptually-compressed codecs (MP3/Vorbis/AAC) have no JDK
    * decoder: None, and the caller's stub/survive semantics apply. */
  private def sampleView(m: MediaRecord): Option[SampleView] = {
    if (m.media_type == null || !m.media_type.startsWith("audio")) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.content))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val pcm = signed ||
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val ulaw = enc == javax.sound.sampled.AudioFormat.Encoding.ULAW
        val alaw = enc == javax.sound.sampled.AudioFormat.Encoding.ALAW
        if (pcm && bits > 0 && bits % 8 == 0 && bits <= 32) {
          val data = in.readAllBytes()
          val bps = bits / 8
          val big = fmt.isBigEndian
          // Samples reconstruct in LONG: at bits == 32 an Int accumulator
          // wraps (and `1 << 31` is Int.MinValue), turning the unsigned
          // re-centering into garbage amplitudes. 64-bit arithmetic is
          // exact for every allowed width (8/16/24/32).
          val shift = 64 - bits
          Some(SampleView(fmt, data.length / bps, bits, { s =>
            val i = s * bps
            var v = 0L
            if (big) { var j = 0; while (j < bps) { v = (v << 8) | (data(i + j) & 0xffL); j += 1 } }
            else { var j = bps - 1; while (j >= 0) { v = (v << 8) | (data(i + j) & 0xffL); j -= 1 } }
            if (signed) (v << shift) >> shift else v - (1L << (bits - 1))
          }))
        } else if ((ulaw || alaw) && bits == 8) {
          val data = in.readAllBytes()
          Some(SampleView(fmt, data.length, 16,
            s => (if (ulaw) G711.ulawToLinear(data(s)) else G711.alawToLinear(data(s))).toLong))
        } else None
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio decode for the payloads [[sampleView]] parses (linear
    * PCM in WAV/AIFF/AU plus G.711 µ-law/A-law — JDK parser + engine
    * expansion, no external codec). Features (padded/truncated to
    * `featureDim`):
    * [durationSec, sampleRate, channels, sampleBits, nFrames, rms, peak,
    * meanAbs] — the amplitude statistics over ALL samples normalized to
    * [−1, 1] across channels (`sampleBits` reports the CONTAINER's
    * width — 8 for G.711 — while normalization uses the expanded linear
    * scale). One linear pass over the payload. Returns None for
    * non-audio types, codec-bound encodings (MP3/Vorbis), or bytes the
    * parser rejects: the caller falls back to [[stubDecode]], so a
    * resize-style pass never throws on undecodable media. */
  def decodeAudio(m: MediaRecord, featureDim: Int = 8): Option[MediaFeatures] =
    sampleView(m).map { sv =>
      val full = (1L << (sv.bits - 1)).toDouble
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
      var s = 0
      while (s < sv.n) {
        val x = sv.sampleAt(s) / full
        sumSq += x * x; sumAbs += math.abs(x)
        if (math.abs(x) > peak) peak = math.abs(x)
        s += 1
      }
      val n = math.max(sv.n, 1).toDouble
      val nFrames = sv.n / math.max(sv.fmt.getChannels, 1)
      val raw = Array[Float](
        (nFrames / sv.fmt.getFrameRate).toFloat, sv.fmt.getSampleRate,
        sv.fmt.getChannels.toFloat, sv.fmt.getSampleSizeInBits.toFloat,
        nFrames.toFloat,
        math.sqrt(sumSq / n).toFloat, peak.toFloat, (sumAbs / n).toFloat)
      MediaFeatures(m.media_id, m.media_type, m.content.length.toLong,
        java.util.Arrays.copyOf(raw, featureDim))
    }

  /** REAL video container METADATA for MP4/ISO-BMFF payloads — a
    * JDK-only box walk (the same zero-dep trick as the xlsx source's
    * OOXML parse): `moov/mvhd` duration÷timescale, the first video
    * track's `tkhd` width/height (16.16 fixed point; audio tracks carry
    * 0×0), and the `trak` count. FRAME decode remains a labeled stub
    * ([[stubDecode]]) — no video codec ships in this container — but
    * duration/dimension/track metadata is exactly what corpus-level
    * filtering and budgeting needs, and it needs no codec. Features
    * (padded to `featureDim`):
    * [durationSec, timescale, nTracks, width, height].
    * Returns None for non-video types or bytes without a parseable
    * `moov` (caller falls back to [[stubDecode]]). */
  def decodeVideoMeta(m: MediaRecord, featureDim: Int = 8): Option[MediaFeatures] = {
    if (m.media_type == null || !m.media_type.startsWith("video")) return None
    try {
      val top = isoBoxes(m.content, 0, m.content.length)
      top.collectFirst { case ("moov", off, len) =>
        val kids = isoBoxes(m.content, off, len)
        val mvhd = kids.collectFirst { case ("mvhd", o, _) =>
          val ver = m.content(o) & 0xff
          // fullbox verflags(4) then v0: creation(4) mod(4) ts(4) dur(4)
          //                        v1: creation(8) mod(8) ts(4) dur(8)
          if (ver == 1) (be32(m.content, o + 20), be64(m.content, o + 24).toDouble)
          else (be32(m.content, o + 12), be32(m.content, o + 16).toDouble)
        }
        val traks = kids.collect { case ("trak", o, l) => (o, l) }
        val dims = traks.iterator.flatMap { case (o, l) =>
          isoBoxes(m.content, o, l).collectFirst { case ("tkhd", to, _) =>
            val ver = m.content(to) & 0xff
            val wOff = to + (if (ver == 1) 4 + 84 else 4 + 72)
            // 16.16 fixed point
            (be32(m.content, wOff) / 65536.0f, be32(m.content, wOff + 4) / 65536.0f)
          }
        }.find { case (w, h) => w > 0 && h > 0 }
        val (ts, dur) = mvhd.getOrElse((0L, 0.0))
        val raw = Array[Float](
          if (ts > 0) (dur / ts).toFloat else 0f, ts.toFloat, traks.size.toFloat,
          dims.map(_._1).getOrElse(0f), dims.map(_._2).getOrElse(0f))
        MediaFeatures(m.media_id, m.media_type, m.content.length.toLong,
          java.util.Arrays.copyOf(raw, featureDim))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  /** Walk the ISO-BMFF boxes in `bytes[start, start+len)`: returns
    * (type, payloadOffset, payloadLength) per box. Handles 64-bit
    * `largesize` (size == 1) and to-end-of-enclosure (size == 0) boxes;
    * stops at the first malformed length rather than throwing. */
  private def isoBoxes(bytes: Array[Byte], start: Int, len: Int): Seq[(String, Int, Int)] = {
    val end = start + len
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    var p = start
    while (p + 8 <= end) {
      val size32 = be32(bytes, p)
      val typ = new String(bytes, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val (payloadOff, boxEnd) =
        if (size32 == 1L && p + 16 <= end) (p + 16, p + be64(bytes, p + 8))
        else if (size32 == 0L) (p + 8, end.toLong)
        else (p + 8, p + size32)
      if (boxEnd < payloadOff || boxEnd > end) return out.toSeq // malformed: stop
      out += ((typ, payloadOff, (boxEnd - payloadOff).toInt))
      p = boxEnd.toInt
    }
    out.toSeq
  }

  /** Per-record dispatch: image, PCM-audio, and MP4-container payloads
    * decode for real (metadata-level for video); everything else (and
    * undecodable bytes) takes the deterministic stub. */
  def decode(m: MediaRecord, featureDim: Int = 8): MediaFeatures =
    decodeImage(m, featureDim)
      .orElse(decodeAudio(m, featureDim))
      .orElse(decodeVideoMeta(m, featureDim))
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

  /** cols×rows grayscale grid of a decodable image — the dHash
    * preprocessing stage (Krawetz's public difference-hash recipe): REAL
    * decode via the shared [[tryDecodeImage]] policy, then an
    * ENGINE-OWNED integer AREA resample: target cell (cx, cy) averages
    * the source pixels it covers, fractional edge pixels weighted by
    * exact overlap in (cols×rows)-denominator fixed point — pure Long
    * arithmetic, no Graphics2D, no float. Luma per source pixel is the
    * integer (299·R + 587·G + 114·B) / 1000.
    *
    * Why engine-owned (round-11 ADVICE): the previous Graphics2D
    * bilinear resize pinned JDK RENDERING behavior into the frozen
    * oracle grids — a platform whose Graphics2D rounds differently
    * would fail the oracle even though the engine is internally
    * consistent. Exact integer area-averaging is deterministic from the
    * decoded pixels alone (and is the standard downscale for perceptual
    * hashing — it reads every pixel, where point-sampling bilinear at
    * large factors aliases). Row-major Array of cols·rows ints in
    * [0, 255]; None for non-image / undecodable payloads. */
  def lumaGrid(m: MediaRecord, cols: Int, rows: Int): Option[Array[Int]] =
    tryDecodeImage(m).map(gridOf(_, cols, rows))

  /** BOTH dHash grids (9×8 horizontal, 8×9 vertical) from ONE decode —
    * the 128-bit signature's per-image stage (decode dominates; the two
    * O(w·h) resample passes are noise next to it). */
  def lumaGrids128(m: MediaRecord): Option[(Array[Int], Array[Int])] =
    tryDecodeImage(m).map(im => (gridOf(im, 9, 8), gridOf(im, 8, 9)))

  private def gridOf(im: java.awt.image.BufferedImage, cols: Int,
      rows: Int): Array[Int] =
    gridOfLuma(im.getWidth, im.getHeight, cols, rows) { (x, y) =>
      val p = im.getRGB(x, y)
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    }

  /** The engine-owned integer AREA resample over ANY pixel source —
    * shared by the decoded-image path ([[gridOf]]) and the raw-DIB
    * video-frame path ([[videoFrameGrids]]), so the two cannot drift.
    * `lumaAt(x, y)` returns the integer luma in [0, 255] of source
    * pixel (x, y). */
  private def gridOfLuma(w: Int, h: Int, cols: Int, rows: Int)(
      lumaAt: (Int, Int) => Int): Array[Int] = {
      // cell (cx, cy) covers source x in [cx·w/cols, (cx+1)·w/cols) —
      // scale x by cols (y by rows) so boundaries are integers: pixel px
      // spans [cols·px, cols·px+cols), cell cx spans [cx·w, (cx+1)·w).
      // ONE pass over the source; each pixel feeds the ≤ 2×2 cells it
      // overlaps — O(w·h) work, O(cols·rows) state, no full-frame buffer
      // beyond the decoder's own.
      val acc = new Array[Long](cols * rows)
      var py = 0
      while (py < h) {
        val ys = py.toLong * rows
        val cy0 = (ys / h).toInt
        val cy1 = math.min(((ys + rows - 1) / h).toInt, rows - 1)
        var px = 0
        while (px < w) {
          val l = lumaAt(px, py)
          val xs = px.toLong * cols
          val cx0 = (xs / w).toInt
          val cx1 = math.min(((xs + cols - 1) / w).toInt, cols - 1)
          var cy = cy0
          while (cy <= cy1) {
            val oy = math.min((cy + 1).toLong * h, ys + rows) -
              math.max(cy.toLong * h, ys)
            var cx = cx0
            while (cx <= cx1) {
              val ox = math.min((cx + 1).toLong * w, xs + cols) -
                math.max(cx.toLong * w, xs)
              acc(cy * cols + cx) += l * ox * oy
              cx += 1
            }
            cy += 1
          }
          px += 1
        }
        py += 1
      }
      // total weight per cell = w·h exactly (pixel overlaps tile it)
      val grid = new Array[Int](cols * rows)
      var i = 0
      while (i < grid.length) {
        grid(i) = (acc(i) / (w.toLong * h)).toInt; i += 1
      }
      grid
  }

  /** The horizontal-dHash grid: 9 columns × 8 rows. */
  def lumaGrid9x8(m: MediaRecord): Option[Array[Int]] = lumaGrid(m, 9, 8)

  /** The vertical-dHash grid: 8 columns × 9 rows. */
  def lumaGrid8x9(m: MediaRecord): Option[Array[Int]] = lumaGrid(m, 8, 9)

  /** 64-bit difference hash of a [[lumaGrid9x8]] grid: bit (row·8 + col)
    * is set iff cell (row, col) is brighter than its right neighbor —
    * the standard dHash, robust to uniform brightness/contrast shifts
    * (only horizontal gradients matter). */
  def dHash64(grid: Array[Int]): Long = {
    require(grid.length == 72, s"dHash64 needs a 9x8 grid, got ${grid.length}")
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 9 + c) > grid(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** 64-bit VERTICAL difference hash of a [[lumaGrid8x9]] grid (8
    * columns × 9 rows, row-major): bit (row·8 + col) is set iff cell
    * (row, col) is brighter than the cell BELOW it — the standard
    * dHash-vertical companion. Concatenated with [[dHash64]] it gives a
    * 128-bit perceptual signature: vertical gradients catch edits
    * horizontal gradients are blind to (and vice versa), so banding the
    * 128-bit concat buys precision at the same recall bound. */
  def dHash64v(grid: Array[Int]): Long = {
    require(grid.length == 72, s"dHash64v needs an 8x9 grid, got ${grid.length}")
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 8 + c) > grid((r + 1) * 8 + c)) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  // ── REAL video FRAME decode (AVI / RIFF) ─────────────────────────────

  /** Parsed AVI payload: stream dimensions, total video-frame count, and
    * the SAMPLED decoded frames as (ordinal-among-all-frames, luma grid). */
  final case class AviFrames(width: Int, height: Int, nFrames: Int,
      frames: Seq[(Int, Array[Int])])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF chunks in `bytes[start, start+len)`: returns
    * (fourcc, payloadOffset, payloadLength) per chunk — the little-endian
    * sibling of [[isoBoxes]]. RIFF pads chunks to even ("word") sizes;
    * a `LIST` chunk's payload starts with its 4-byte list type. Stops at
    * the first malformed length rather than throwing. */
  private def riffChunks(bytes: Array[Byte], start: Int, len: Int): Seq[(String, Int, Int)] = {
    val end = math.min(start + len, bytes.length)
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    var p = start
    while (p + 8 <= end) {
      val size = le32(bytes, p + 4)
      val payloadOff = p + 8
      val boxEnd = payloadOff + size
      if (size < 0 || boxEnd > end) return out.toSeq // malformed: stop
      out += ((fourcc(bytes, p), payloadOff, size.toInt))
      p = (boxEnd + (boxEnd & 1)).toInt // pad to even
    }
    out.toSeq
  }

  /** REAL video FRAME decode for AVI (RIFF) payloads — the same
    * zero-dependency container walk as [[decodeVideoMeta]]'s ISO-BMFF
    * path, little-endian. Two frame codings decode for real:
    *
    *  - **uncompressed BI_RGB DIB** (`biCompression = 0`, 24 bpp) —
    *    raw bottom-up BGR rows, 4-byte-aligned stride; pure integer byte
    *    reads, so the luma grid is BIT-IDENTICAL on every JVM (the
    *    audio-envelope discipline — it can anchor an analytic oracle);
    *  - **MJPEG** (`biCompression = 'MJPG'`) — each `##dc` chunk is a
    *    standalone JPEG, decoded with the JDK's own `javax.imageio`
    *    reader (real, but decoder-dependent like still-image JPEG — kept
    *    out of frozen oracles for the same reason).
    *
    * Every `everyN`-th frame of the FIRST video stream is decoded into a
    * cols×rows luma grid via the shared engine-owned integer area
    * resample ([[gridOfLuma]]); the rest are skipped without touching
    * their bytes — frame sampling costs O(sampled frames), not O(all).
    * H.264/H.265/VP9 frames have no JDK decoder and still take the
    * labeled stub path. Returns None for non-video types, non-AVI bytes,
    * streams with no parseable video frames, or payloads whose sampled
    * frames all fail to decode. */
  private[graft] def decodeAviFrames(m: MediaRecord, everyN: Int,
      cols: Int, rows: Int): Option[AviFrames] = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    if (m.media_type == null || !m.media_type.startsWith("video")) return None
    val b = m.content
    try {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        return None
      val top = riffChunks(b, 12, b.length - 12)
      // header LIST: dimensions + compression of the FIRST 'vids' stream,
      // plus its ordinal among ALL streams (movi chunk ids are '%02d'-
      // numbered by stream order, so an audio-first file numbers video 01)
      var w = 0; var h = 0; var topDown = false
      var bitCount = 0; var comp = -1L; var streamNo = -1
      top.collectFirst {
        case ("LIST", o, l) if l >= 4 && fourcc(b, o) == "hdrl" => (o + 4, l - 4)
      }.foreach { case (ho, hl) =>
        var ord = 0
        riffChunks(b, ho, hl).foreach {
          case ("LIST", so, sl) if sl >= 4 && fourcc(b, so) == "strl" =>
            val skids = riffChunks(b, so + 4, sl - 4)
            val vids = skids.exists {
              case ("strh", o2, l2) => l2 >= 4 && fourcc(b, o2) == "vids"
              case _ => false
            }
            if (vids && streamNo < 0) {
              streamNo = ord
              skids.collectFirst { case ("strf", fo, fl) if fl >= 20 =>
                w = le32(b, fo + 4).toInt
                val rawH = le32(b, fo + 8).toInt
                topDown = rawH < 0 // negative biHeight = top-down rows
                h = math.abs(rawH)
                bitCount = le16(b, fo + 14)
                comp = le32(b, fo + 16)
              }
            }
            ord += 1
          case _ => ()
        }
      }
      if (streamNo < 0 || w <= 0 || h <= 0) return None
      val isDib = comp == 0L && bitCount == 24
      val isMjpg = comp == 0x47504a4dL // 'MJPG' little-endian
      if (!isDib && !isMjpg) return None
      val vdb = f"$streamNo%02ddb"; val vdc = f"$streamNo%02ddc"
      val movi = top.collectFirst {
        case ("LIST", o, l) if l >= 4 && fourcc(b, o) == "movi" => (o + 4, l - 4)
      }.getOrElse(return None)
      val stride = ((w * 3 + 3) / 4) * 4
      val frames = scala.collection.mutable.ArrayBuffer[(Int, Array[Int])]()
      var idx = 0
      riffChunks(b, movi._1, movi._2).foreach { case (cc, off, len) =>
        if (cc == vdb || cc == vdc) {
          if (idx % everyN == 0) {
            if (isDib && len >= stride * h) {
              frames += ((idx, gridOfLuma(w, h, cols, rows) { (x, y) =>
                val row = if (topDown) y else h - 1 - y
                val p = off + row * stride + x * 3
                (299 * (b(p + 2) & 0xff) + 587 * (b(p + 1) & 0xff) +
                  114 * (b(p) & 0xff)) / 1000
              }))
            } else if (isMjpg) {
              imageIOCacheDisabled
              val im =
                try Option(javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(b, off, len)))
                catch { case scala.util.control.NonFatal(_) => None }
              im.foreach(i => frames += ((idx, gridOf(i, cols, rows))))
            }
          }
          idx += 1
        }
      }
      if (frames.isEmpty) None else Some(AviFrames(w, h, idx, frames.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Sampled video frames as 9×8 luma grids — the dHash preprocessing
    * stage of the video near-dup rung. */
  def videoFrameGrids(m: MediaRecord, everyN: Int = 2): Option[Seq[(Int, Array[Int])]] =
    decodeAviFrames(m, everyN, 9, 8).map(_.frames)

  /** 64-bit horizontal dHash per sampled frame: (frame ordinal, hash). */
  def videoFrameHashes(m: MediaRecord, everyN: Int = 2): Option[Seq[(Int, Long)]] =
    videoFrameGrids(m, everyN).map(_.map { case (i, g) => (i, dHash64(g)) })

  /** One REAL sampled frame of a video payload: ordinal among all frames
    * plus stream dimensions and the cols×rows luma grid — the
    * frame-level feature row vision filtering / frame-dedup consumes. */
  final case class VideoFrame(media_id: Long, frame_idx: Int, width: Int,
      height: Int, luma_grid: Array[Int])

  /** REAL frame sampling over AVI payloads — the production form of the
    * labeled [[sampleFrames]] stub: every `everyN`-th frame of each
    * decodable payload decodes ([[decodeAviFrames]]) into a cols×rows
    * luma grid and explodes to one row per sampled frame. Batched
    * per-partition like [[extractFeatures]]; narrow, no shuffle;
    * non-video and undecodable payloads yield no rows. */
  def sampleVideoFrames(ds: Dataset[MediaRecord], everyN: Int = 10,
      cols: Int = 8, rows: Int = 8, batchSize: Int = 64): Dataset[VideoFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { m =>
          decodeAviFrames(m, everyN, cols, rows).toSeq.flatMap { av =>
            av.frames.map { case (i, g) =>
              VideoFrame(m.media_id, i, av.width, av.height, g) }
          }
        }
      }
    }
  }

  // ── perceptual AUDIO fingerprint ──────────────────────────────────────

  /** L1-energy envelope of a decodable audio payload: decode (the REAL
    * [[sampleView]] path — integer-exact Long reconstruction for linear
    * PCM up to 32-bit, engine-owned G.711 expansion for µ-law/A-law) and
    * sum |sample| per window over `windows` equal sample-index windows.
    * ALL-INTEGER arithmetic (the luma-grid discipline): the envelope is
    * bit-identical on every JVM, so it can anchor a frozen oracle.
    * Returns None for non-audio types, undecodable bytes, or streams
    * shorter than `windows` samples (an envelope with empty windows
    * would fingerprint silence ordering, not content). */
  def audioEnvelope(m: MediaRecord, windows: Int = 65): Option[Array[Long]] =
    sampleView(m).flatMap { sv =>
      if (sv.n < windows) None
      else {
        val env = new Array[Long](windows)
        var s = 0
        while (s < sv.n) {
          // window by sample index: w = s·windows / n (exact integer)
          env((s.toLong * windows / sv.n).toInt) += math.abs(sv.sampleAt(s))
          s += 1
        }
        Some(env)
      }
    }

  /** 64-bit envelope difference hash of a 65-window [[audioEnvelope]]:
    * bit i is set iff window i+1 carries more L1 energy than window i —
    * the temporal-envelope analogue of [[dHash64]], inspired by the
    * sign-of-energy-difference fingerprint of Haitsma & Kalker ("A
    * Highly Robust Audio Fingerprinting System", ISMIR 2002; theirs
    * differences spectral bands, this differences the time envelope —
    * the zero-codec form the sandbox permits). Invariant under exact
    * positive amplitude scaling (a monotone map preserves every
    * comparison) and under uniform DC-free re-encoding. */
  def audioHash64(env: Array[Long]): Long = {
    require(env.length == 65, s"audioHash64 needs 65 windows, got ${env.length}")
    var h = 0L
    var i = 0
    while (i < 64) {
      if (env(i + 1) > env(i)) h |= 1L << i
      i += 1
    }
    h
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

/** ITU-T G.711 companded-audio expansion — ENGINE-OWNED integer kernels
  * (the standard public expansion arithmetic: 3-bit exponent segment +
  * 4-bit mantissa, µ-law bias 0x84 / A-law toggle 0x55), so the decoded
  * samples are bit-identical on every JVM and can anchor analytic
  * oracles — the same determinism discipline as the integer area
  * resample and the L1 envelope. */
object G711 {

  /** µ-law byte → 16-bit linear sample (range ±32124). */
  def ulawToLinear(u0: Byte): Int = {
    val u = ~u0 & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → 16-bit linear sample (range ±32256). */
  def alawToLinear(a0: Byte): Int = {
    val a = (a0 ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    t = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case s => (t + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }
}
