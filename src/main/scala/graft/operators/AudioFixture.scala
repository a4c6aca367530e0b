package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic WAV fixture for the perceptual audio-dedup surface —
  * the audio analogue of [[ImageFixture]]. 60 mono 16-bit PCM WAVs of
  * 65 equal windows × 64 samples (4160 samples, 8 kHz), in triples per
  * k = id/3:
  *
  *  - id = 3k     BASE: window w carries a hash-mixed amplitude of
  *    (k, w) — per-window pseudo-random loudness, so each base clip's
  *    envelope-delta bits are ~Bernoulli(1/2) and distinct bases land
  *    ~32 bits apart;
  *  - id = 3k+1   NEAR-DUP: the same clip globally amplitude-scaled by
  *    4/5 (amplitudes are multiples of 5, so the scaling is EXACT and
  *    preserves every strict envelope comparison) with ONE window
  *    (k mod 65) re-amplituded — a small perceptual edit that can flip
  *    at most the 2 delta bits adjacent to that window;
  *  - id = 3k+2   UNRELATED: the same mix under a different seed — far
  *    outside any sane Hamming bound.
  *
  * The waveform is a ±A square wave at Nyquist (samples alternate +A,
  * −A), so each window's L1 envelope is EXACTLY 64·A — all-integer,
  * lossless through 16-bit PCM, identical on every JVM. The envelope
  * extraction itself is pinned by [[FrozenAudioEnvelopes]]
  * (MultimodalSpec asserts live decode ≡ frozen, the FrozenImageGrids
  * discipline). */
object AudioFixture {

  val NumClips: Int = 60
  val Windows: Int = 65
  val SamplesPerWindow: Int = 64

  /** Planted amplitude of window `w` of clip `id` — an integer avalanche
    * mix, a multiple of 5 in [0, 16000), exact in Int arithmetic. */
  def windowAmplitude(id: Long, w: Int): Int = {
    val k = (id / 3).toInt
    def mix(seed: Int): Int = {
      var x = k * 73856093 ^ w * 19349663 ^ seed
      x *= 0x9e3779b1
      x ^= x >>> 16
      ((x & 0x7fffffff) % 3200) * 5
    }
    (id % 3) match {
      case 2 => mix(0x5bd1e995)
      case m =>
        val base = mix(0)
        if (m == 1) {
          val scaled = base * 4 / 5 // exact: base is a multiple of 5
          if (w == k % Windows) mix(0x27d4eb2f) * 4 / 5 else scaled
        } else base
    }
  }

  /** [[wavBytes]] with every window amplitude scaled by `num/den` —
    * exact when amplitudes are multiples of `den` (they are multiples
    * of 5), so the clip's envelope fingerprint is IDENTICAL to the
    * original's: the incremental-dedup fixture's "re-encoded copy of a
    * corpus clip" (tainted by the index, hamming 0). */
  def wavBytesScaled(id: Long, num: Int, den: Int): Array[Byte] =
    synth(w => windowAmplitude(id, w) * num / den)

  /** One mono 16-bit 8 kHz PCM WAV, synthesized sample-by-sample —
    * fully deterministic (hand-rolled canonical RIFF header, PCM is
    * lossless). */
  def wavBytes(id: Long): Array[Byte] =
    synth(w => windowAmplitude(id, w))

  private def synth(amp: Int => Int): Array[Byte] = {
    val n = Windows * SamplesPerWindow
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(8000 * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = 0
    while (s < n) {
      val a = amp(s / SamplesPerWindow)
      out.putShort((if (s % 2 == 0) a else -a).toShort)
      s += 1
    }
    out.array()
  }

  /** The fixture as a distributed media frame
    * (media_id, media_type, content) — clips synthesize inside the
    * tasks, nothing ships from the driver. */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NumClips).as[Long]
      .mapPartitions(_.map(id => (id, "audio/wav", wavBytes(id))))
      .toDF("media_id", "media_type", "content")
  }

  // ── G.711 µ-law sibling fixture ─────────────────────────────────────

  val NumUlawClips: Int = 30

  /** Planted 7-bit µ-law magnitude field (exponent + mantissa, pre-sign,
    * pre-complement) of window `w` of µ-law clip `id` — the same
    * base / near-dup (one window re-mixed) / unrelated triple design as
    * [[windowAmplitude]], but in the COMPANDED domain: the clip's
    * decoded amplitude is the engine's own expansion
    * [[graft.operators.G711.ulawToLinear]] of this field, so the
    * analytic envelope (64 · expanded magnitude) exercises the real
    * G.711 table, not a PCM shortcut. */
  def ulawMagField(id: Long, w: Int): Int = {
    val k = (id / 3).toInt
    def mix(seed: Int): Int = {
      var x = k * 73856093 ^ w * 19349663 ^ seed
      x *= 0x9e3779b1
      x ^= x >>> 16
      x & 0x7f
    }
    (id % 3) match {
      case 2 => mix(0x5bd1e995)
      case 1 if w == k % Windows => mix(0x27d4eb2f)
      case _ => mix(0)
    }
  }

  /** The decoded amplitude of window `w` of µ-law clip `id` — the
    * analytic-envelope anchor (envelope window = 64 · this). */
  def ulawWindowAmplitude(id: Long, w: Int): Int = {
    // positive-sample byte for magnitude field m: transmitted µ-law is
    // complemented, so b = ~m (sign bit 0 pre-complement = positive)
    val b = (~ulawMagField(id, w)).toByte
    G711.ulawToLinear(b)
  }

  /** One mono 8 kHz G.711 µ-law WAV (format tag 7, 8-bit companded
    * samples, canonical 18-byte fmt chunk) — the ±A square wave in the
    * companded domain: window w alternates the positive and negative
    * byte of the same magnitude field, so each window's decoded L1
    * envelope is exactly 64 · [[ulawWindowAmplitude]]. */
  def ulawBytes(id: Long): Array[Byte] = {
    val n = Windows * SamplesPerWindow
    val out = java.nio.ByteBuffer.allocate(46 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(38 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7) // WAVE_FORMAT_MULAW
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(8000) // byte rate (1 byte/sample)
      .putShort(1) // block align
      .putShort(8) // bits per sample (companded)
      .putShort(0) // cbSize
      .put("data".getBytes("US-ASCII")).putInt(n)
    var s = 0
    while (s < n) {
      val m = ulawMagField(id, s / SamplesPerWindow)
      // +m byte = ~m (sign 0); −m byte = ~(0x80 | m)
      out.put((if (s % 2 == 0) ~m else ~(0x80 | m)).toByte)
      s += 1
    }
    out.array()
  }

  /** The µ-law fixture as a distributed media frame. */
  def frameUlaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NumUlawClips).as[Long]
      .mapPartitions(_.map(id => (id, "audio/wav", ulawBytes(id))))
      .toDF("media_id", "media_type", "content")
  }
}
