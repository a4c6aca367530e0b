package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic PNG fixture for the perceptual image-dedup surface —
  * the image analogue of the planted-defect text fixtures. 60 grayscale
  * 64×64 PNGs of 8×8-pixel constant blocks, in triples per k = id/3:
  *
  *  - id = 3k     BASE: block (bx, by) carries a hash-mixed value of
  *    (k, bx, by) — per-block pseudo-random luma, so each base image's
  *    dHash bits are ~Bernoulli(1/2) and DISTINCT bases land ~32 bits
  *    apart (a linear gradient field would give every base the same
  *    horizontal-gradient signs and collapse all dHashes together);
  *  - id = 3k+1   NEAR-DUP: the same image with ONE block (k mod 8,
  *    (k/8) mod 8) shifted by +96 (mod 256) — a small perceptual edit,
  *    so its dHash lands within a few bits of the base;
  *  - id = 3k+2   UNRELATED: the same hash mix under a different seed —
  *    far outside any sane Hamming bound.
  *
  * PNG is lossless, so decode returns the exact planted values; the
  * 9×8 bilinear downscale is pinned by the [[FrozenImageGrids]] freeze
  * (MultimodalSpec asserts live decode ≡ frozen grids, the FrozenAnn
  * drift-detection discipline). */
object ImageFixture {

  val NumImages: Int = 60

  /** Planted luma of the 8×8-pixel block (bx, by) of image `id` — an
    * integer avalanche mix (Knuth multiplicative + xorshift), exact in
    * Int arithmetic, identical on every JVM. */
  def blockValue(id: Long, bx: Int, by: Int): Int = {
    val k = (id / 3).toInt
    def mix(seed: Int): Int = {
      var x = k * 73856093 ^ bx * 19349663 ^ by * 83492791 ^ seed
      x *= 0x9e3779b1
      x ^= x >>> 16
      (x & 0x7fffffff) % 256
    }
    (id % 3) match {
      case 2 => mix(0x5bd1e995)
      case m =>
        val base = mix(0)
        if (m == 1 && bx == k % 8 && by == (k / 8) % 8) (base + 96) % 256
        else base
    }
  }

  /** One 64×64 grayscale PNG, drawn pixel-by-pixel — fully
    * deterministic (PNG encode is lossless and canonical per JVM). */
  def pngBytes(id: Long): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val v = blockValue(id, x / 8, y / 8)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** The fixture as a distributed media frame
    * (media_id, media_type, content) — images draw inside the tasks,
    * nothing ships from the driver. */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(NumImages).as[Long]
      .mapPartitions(_.map(id => (id, "image/png", pngBytes(id))))
      .toDF("media_id", "media_type", "content")
  }
}
