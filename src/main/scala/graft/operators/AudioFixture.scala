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
}
