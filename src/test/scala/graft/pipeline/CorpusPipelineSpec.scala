package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession
import graft.operators.Dedup

/** End-to-end corpus-preparation spec: every stage's invariant checked on
  * the real corpus plus planted defects (a near-dup, PII, a benchmark
  * leak, junk docs). */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("prepare: filters, dedups, decontaminates, redacts, chunks, and splits per document") {
    val base = docs.select($"doc_id", $"text")
    // planted defects: junk (too short), PII, and a benchmark leak
    val planted = Seq(
      (900001L, "too short"),
      (900002L, ("the quick brown fox jumps over the lazy dog and that is the " +
        "reason you should mail admin@example.org about it " + ("again and " * 30)).trim))
      .toDF("doc_id", "text")
    val corpus = base.union(planted)
    val benchmark = docs.where($"doc_id" % 50 === 0).select($"doc_id", $"text")

    val cfg = CorpusPipeline.Config(
      langs = Set("en"), minTokens = 10, dedupThreshold = 0.5,
      chunkTokens = 64, overlapTokens = 16,
      splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val out = CorpusPipeline.prepare(corpus, Some(benchmark), cfg)
    val kept = out.documents.cache()

    // junk filtered; survivors meet the language/quality gate
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(900001L), "short junk doc must be filtered")
    assert(ids.contains(900002L), "long English prose must survive")
    assert(kept.count() > 0)

    // no near-dup pair survives at the configured threshold
    assert(Dedup.nearDupPairsMinHash(kept, "text", "doc_id", 0.5).count() == 0)

    // no surviving doc shares an n-gram with the benchmark: the
    // contamination probe finds nothing (compare on the PRE-redaction
    // text via ids — redaction may alter shingles)
    val preRedaction = corpus.join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
    assert(Dedup.contaminationHits(preRedaction, benchmark, "text", "doc_id",
      n = cfg.decontaminateN).count() == 0)

    // PII is gone from every surviving text
    assert(kept.where($"text".contains("@example.org")).count() == 0)
    assert(kept.where($"doc_id" === 900002L).head().getAs[String]("text")
      .contains("<EMAIL>"))

    // chunks: inherit the document split, never exceed the window size,
    // and every kept doc with tokens has at least one chunk
    val chunks = out.chunks.cache()
    assert(chunks.where($"n_chunk_tokens" > 64).count() == 0)
    val chunkSplits = chunks.select("doc_id", "split").distinct()
      .join(kept.select($"doc_id", $"split".as("doc_split")), Seq("doc_id"))
    assert(chunkSplits.where($"split" =!= $"doc_split").count() == 0,
      "chunks must inherit their document's split (no per-chunk leakage)")
    assert(chunks.select("doc_id").distinct().count() == kept.count())

    // split assignment is the deterministic md5 bucket: re-running is stable
    val again = CorpusPipeline.prepare(corpus, Some(benchmark), cfg)
    assert(again.documents.select("doc_id", "split").as[(Long, String)].collect().toSet ==
      kept.select("doc_id", "split").as[(Long, String)].collect().toSet)
    kept.unpersist(); chunks.unpersist()
  }
}
