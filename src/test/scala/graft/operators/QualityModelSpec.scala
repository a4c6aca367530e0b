package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Hashed-linear quality model specs: exact narrow scoring against a
  * hand-computed reference, the no-shuffle plan contract, deterministic
  * training, and distillation of the Gopher rule gate on a planted
  * good/junk corpus. */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  /** Reference implementation of the md5 feature hash. */
  private def refIndex(token: String, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  test("score == hand-computed reference, bit-exact (integer fold + one float chain)") {
    val dim = 16
    val w = Array.tabulate(dim)(j => (j.toLong - 8) * 250000000L) // ±2.0 range
    val m = QualityModel.Model(dim, w, bias = 0.125)
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "delta"),
      (3L, "")).toDF("doc_id", "text")
    val got = QualityModel.score(docs, "text", "doc_id", m)
      .orderBy("doc_id")
      .as[(Long, Int, Double, Boolean)].collect()
    val expected = Seq(
      (1L, Seq("alpha", "beta", "gamma", "alpha")),
      (2L, Seq("delta")),
      (3L, Seq.empty[String])).map { case (id, toks) =>
      val s = toks.map(t => w(refIndex(t, dim))).sum
      val logit = 0.125 + (s.toDouble / QualityModel.WeightScale) / math.max(toks.size, 1)
      (id, toks.size, logit, logit >= 0)
    }
    assert(got.toSeq == expected) // == on doubles: bit-exact by design
  }

  test("scoring plan is one narrow projection — no Exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = QualityModel.score(docs, "text", "doc_id",
        FrozenQualityModel.model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  /** Planted corpus: good docs are English prose (≥ 50 tokens, real
    * stopwords); junk docs are short hex-ish word salad — gopherPass
    * separates them, and a linear bag-of-words model can learn it. */
  private def plantedCorpus = {
    val prose = "the quick brown fox jumps over the lazy dog and it was " +
      "a good day for everyone that came here with us to see this happen "
    val good = (0 until 30).map(i => (i.toLong, (prose * 3) + s"marker$i"))
    val junk = (0 until 30).map(i =>
      (100L + i, s"x$i q7g hh3 zk9 p0w m2v j8r t5y u1c b6n"))
    (good ++ junk).toDF("doc_id", "text")
  }

  test("distillGopherGate learns the rule gate on a separable corpus") {
    val docs = plantedCorpus
    val m = QualityModel.distillGopherGate(docs, "text", "doc_id",
      dim = 64, iters = 25, lr = 2.0)
    val labeled = docs.withColumn("y",
      graft.functions.TextAnalysis.gopherPass(col("text")).cast("int"))
    // the labels must actually be balanced, or the test proves nothing
    val pos = labeled.agg(sum(col("y"))).first().getLong(0)
    assert(pos == 30, s"planted corpus must be 30/30 separable, got $pos positives")
    val acc = QualityModel.score(docs, "text", "doc_id", m)
      .join(labeled.select(col("doc_id"), col("y")), Seq("doc_id"))
      .agg(avg((col("predicted").cast("int") === col("y")).cast("double")))
      .first().getDouble(0)
    assert(acc >= 0.95, s"distilled model should match its teacher, accuracy = $acc")
  }

  test("training is bit-deterministic (decimal gradient accumulation + scaled-long requantization)") {
    def run() = QualityModel.train(
      plantedCorpus.withColumn("y", (col("doc_id") < 100).cast("int")),
      "text", "doc_id", "y", dim = 64, iters = 5, lr = 1.0)
    val (a, b) = (run(), run())
    assert(a.weightsScaled.toSeq == b.weightsScaled.toSeq && a.bias == b.bias)
  }

  test("frozen artifact sanity: dim matches weight table, nonzero weights exist") {
    val m = FrozenQualityModel.model
    assert(m.weightsScaled.length == m.dim)
    assert(m.weightsScaled.exists(_ != 0L), "frozen model must be trained, not the placeholder")
  }
}
