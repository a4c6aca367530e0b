package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic AVI fixture for the perceptual video-dedup surface —
  * the video analogue of [[AudioFixture]]. 45 AVI clips of 6 frames,
  * each frame 9×8 pixels of 24-bit uncompressed BI_RGB (biCompression
  * = 0 — a RAW container, zero codec), in triples per k = id/3:
  *
  *  - id = 3k     BASE: pixel (x, y) of frame f carries a hash-mixed
  *    GRAYSCALE value of (k, f, x, y) — per-pixel pseudo-random, so
  *    each frame's dHash bits are ~Bernoulli(1/2) and unrelated frames
  *    land ~32 bits apart;
  *  - id = 3k+1   NEAR-DUP: the same frames with ONE pixel
  *    ((k + f) mod 9, (k + 2f) mod 8) re-mixed per frame — a small
  *    per-frame edit that can flip at most the 2 dHash comparisons
  *    that pixel participates in;
  *  - id = 3k+2   UNRELATED: the same mix under a different seed.
  *
  * Frames are exactly 9×8 = the dHash grid, so the engine's integer
  * area resample is the IDENTITY and the decoded luma grid equals the
  * planted pixel matrix; pixels are grayscale (R = G = B = v), so the
  * integer luma (299v + 587v + 114v) / 1000 = v EXACTLY. The fixture's
  * grids are therefore fully analytic ([[pixelLuma]]) — the oracle
  * restates hash → band → Hamming from the same formula the synthesis
  * uses, and MultimodalSpec pins live container decode ≡ analytic. */
object VideoFixture {

  val NumClips: Int = 45
  val FramesPerClip: Int = 6
  val Width: Int = 9
  val Height: Int = 8

  /** Planted grayscale value of pixel (x, y) in frame `f` of clip `id` —
    * an integer avalanche mix in [0, 255], exact in Int arithmetic. */
  def pixelLuma(id: Long, f: Int, x: Int, y: Int): Int = {
    val k = (id / 3).toInt
    def mix(seed: Int): Int = {
      var t = k * 73856093 ^ f * 83492791 ^ x * 19349663 ^ y * 479001599 ^ seed
      // TWO finalizer rounds (the murmur3 fmix shape): one round leaves
      // the low 8 output bits independent of the top input bits, so at
      // fleet scale (tens of thousands of synthesized clips) k-pairs
      // whose products differ only in high bits collide into IDENTICAL
      // frames — ~3.5% phantom "near-dups" at 30k clips. Two rounds
      // avalanche fully: the 30k-clip scale run finds exactly the
      // planted twins.
      t *= 0x9e3779b1
      t ^= t >>> 16
      t *= 0x85ebca6b
      t ^= t >>> 13
      (t & 0x7fffffff) % 256
    }
    (id % 3) match {
      case 2 => mix(0x5bd1e995)
      case m =>
        if (m == 1 && x == (k + f) % Width && y == (k + 2 * f) % Height)
          mix(0x27d4eb2f)
        else mix(0)
    }
  }

  /** The analytic 9×8 luma grid (row-major) of frame `f` of clip `id` —
    * what the engine's decode must reproduce bit-for-bit. */
  def frameGrid(id: Long, f: Int): Array[Int] = {
    val g = new Array[Int](Width * Height)
    var y = 0
    while (y < Height) {
      var x = 0
      while (x < Width) { g(y * Width + x) = pixelLuma(id, f, x, y); x += 1 }
      y += 1
    }
    g
  }

  /** One complete AVI (RIFF) container: `hdrl` (avih + a vids `strl`
    * whose `strf` BITMAPINFOHEADER declares 24-bit BI_RGB) + `movi`
    * with one `00db` raw-DIB chunk per frame (bottom-up BGR rows,
    * 4-byte-aligned stride) — hand-rolled and canonical, the WAV
    * fixture's discipline. Raw pixels are lossless, so the decode is
    * bit-identical on every JVM. */
  def aviBytes(id: Long): Array[Byte] = aviBytes(id, 0)

  /** [[aviBytes]] with the first `fromFrame` frames TRIMMED (frames
    * fromFrame until FramesPerClip) — the temporal-shift fixture for the
    * frame-SET matching variant: every surviving frame is bit-identical
    * to the original's, but its ordinal shifts down by `fromFrame`. */
  def aviBytes(id: Long, fromFrame: Int): Array[Byte] = {
    require(fromFrame >= 0 && fromFrame < FramesPerClip,
      s"fromFrame out of [0, $FramesPerClip): $fromFrame")
    val nFrames = FramesPerClip - fromFrame
    val stride = ((Width * 3 + 3) / 4) * 4
    val frameLen = stride * Height
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + nFrames * (8 + frameLen)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    fcc("RIFF"); out.putInt(riffLen); fcc("AVI ")
    fcc("LIST"); out.putInt(hdrlLen); fcc("hdrl")
    fcc("avih"); out.putInt(56)
    out.putInt(100000) // dwMicroSecPerFrame (10 fps)
      .putInt(frameLen * 10) // dwMaxBytesPerSec
      .putInt(0).putInt(0) // padding granularity, flags
      .putInt(nFrames) // dwTotalFrames
      .putInt(0) // dwInitialFrames
      .putInt(1) // dwStreams
      .putInt(frameLen) // dwSuggestedBufferSize
      .putInt(Width).putInt(Height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    fcc("LIST"); out.putInt(strlLen); fcc("strl")
    fcc("strh"); out.putInt(56)
    fcc("vids"); fcc("DIB ")
    out.putInt(0) // dwFlags
      .putShort(0).putShort(0) // priority, language
      .putInt(0) // dwInitialFrames
      .putInt(1).putInt(10) // dwScale / dwRate = 10 fps
      .putInt(0) // dwStart
      .putInt(nFrames) // dwLength
      .putInt(frameLen) // dwSuggestedBufferSize
      .putInt(-1) // dwQuality
      .putInt(frameLen) // dwSampleSize
      .putShort(0).putShort(0).putShort(Width.toShort).putShort(Height.toShort) // rcFrame
    fcc("strf"); out.putInt(40)
    out.putInt(40) // biSize
      .putInt(Width).putInt(Height) // positive biHeight = bottom-up
      .putShort(1).putShort(24) // biPlanes, biBitCount
      .putInt(0) // biCompression = BI_RGB
      .putInt(frameLen) // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0) // ppm, colors
    fcc("LIST"); out.putInt(moviLen); fcc("movi")
    var f = fromFrame
    while (f < FramesPerClip) {
      fcc("00db"); out.putInt(frameLen)
      var row = Height - 1 // bottom-up
      while (row >= 0) {
        var x = 0
        while (x < Width) {
          val v = pixelLuma(id, f, x, row).toByte
          out.put(v).put(v).put(v) // B, G, R — grayscale
          x += 1
        }
        var pad = stride - Width * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    out.array()
  }

  /** The same frames MJPEG-coded (each `00dc` chunk a standalone JPEG,
    * encoded with the JDK's own writer) — exercises the second real
    * decode path. JPEG is lossy, so MJPEG clips pin behavior in specs
    * (twin payloads decode identically in-process) rather than in the
    * analytic oracle. */
  def mjpgBytes(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val frames = (0 until FramesPerClip).map { f =>
      val im = new java.awt.image.BufferedImage(
        Width, Height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < Height) {
        var x = 0
        while (x < Width) {
          val v = pixelLuma(id, f, x, y)
          im.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + frames.map(fr => 8 + fr.length + (fr.length & 1)).sum
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    fcc("RIFF"); out.putInt(riffLen); fcc("AVI ")
    fcc("LIST"); out.putInt(hdrlLen); fcc("hdrl")
    fcc("avih"); out.putInt(56)
    out.putInt(100000).putInt(0).putInt(0).putInt(0)
      .putInt(FramesPerClip).putInt(0).putInt(1).putInt(0)
      .putInt(Width).putInt(Height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); out.putInt(strlLen); fcc("strl")
    fcc("strh"); out.putInt(56)
    fcc("vids"); fcc("MJPG")
    out.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(10).putInt(0).putInt(FramesPerClip)
      .putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(Width.toShort).putShort(Height.toShort)
    fcc("strf"); out.putInt(40)
    out.putInt(40).putInt(Width).putInt(Height)
      .putShort(1).putShort(24)
      .putInt(0x47504a4d) // biCompression = 'MJPG'
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); out.putInt(moviLen); fcc("movi")
    frames.foreach { fr =>
      fcc("00dc"); out.putInt(fr.length); out.put(fr)
      if ((fr.length & 1) == 1) out.put(0.toByte) // RIFF even padding
    }
    out.array()
  }

  /** The fixture as a distributed media frame
    * (media_id, media_type, content) — clips synthesize inside the
    * tasks, nothing ships from the driver. */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NumClips).as[Long]
      .mapPartitions(_.map(id => (id, "video/avi", aviBytes(id))))
      .toDF("media_id", "media_type", "content")
  }
}
