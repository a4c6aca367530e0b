package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession
import graft.operators.Multimodal.MediaRecord

/** Multimodal plumbing specs: schema, batching shape, determinism. The
  * decode kernel itself is a documented stub (no codecs in-container). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def media(n: Int) = (1 to n).map(i =>
    MediaRecord(i.toLong, if (i % 2 == 0) "image" else "audio",
      Array.tabulate(i * 10)(b => (b * i).toByte))).toDS()

  test("extractFeatures: schema, one row per payload, metadata carried") {
    val out = Multimodal.extractFeatures(media(10), batchSize = 3)
    assert(out.columns.toSeq == Seq("media_id", "media_type", "n_bytes", "feature"))
    assert(out.count() == 10)
    val r = out.where($"media_id" === 4).head()
    assert(r.media_type == "image" && r.n_bytes == 40L && r.feature.length == 8)
  }

  test("extractFeatures is deterministic across runs and batch sizes") {
    def run(bs: Int) = Multimodal.extractFeatures(media(20), batchSize = bs)
      .collect().sortBy(_.media_id).map(f => (f.media_id, f.n_bytes, f.feature.toSeq)).toSeq
    assert(run(4) == run(64)) // batching must not change results
    assert(run(4) == run(4))
  }

  test("extractFeaturesDF wraps an untyped frame with a binary column") {
    val df = Seq((1L, "doc", "hello world")).toDF("id", "mtype", "text")
      .select($"id", $"mtype", encode($"text", "UTF-8").as("payload"))
    val out = Multimodal.extractFeaturesDF(spark, df, "id", "mtype", "payload")
    val r = out.head()
    assert(r.getAs[Long]("n_bytes") == 11L) // n_bytes == octet length of payload
  }

  test("sampleFrames keeps every Nth fixed-size slice") {
    val df = Seq(Tuple1(Array.tabulate(5000)(_.toByte))).toDF("content")
    val frames = Multimodal.sampleFrames(df, "content", everyN = 2, frameBytes = 1024)
      .select(size($"frames")).head().getInt(0)
    // 4 full frames (0..3) -> indices 0 and 2 kept
    assert(frames == 2)
  }
}
