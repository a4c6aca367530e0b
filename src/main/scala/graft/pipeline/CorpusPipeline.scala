package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextAnalysis}
import graft.operators.{Chunking, Dedup, Sampling}

/** End-to-end pre-training corpus preparation — the canonical chain every
  * LLM data pipeline runs, composed from the engine's operators:
  *
  *   quality filter → language filter → exact content dedup → near-dup
  *   removal → benchmark decontamination → PII redaction → document
  *   chunking → train/val/test split.
  *
  * Composition notes (the order is load-bearing):
  *  - cheap narrow filters (quality, language) run FIRST so the expensive
  *    dedup stages see the smallest possible corpus;
  *  - dedup runs BEFORE redaction: redaction placeholders would otherwise
  *    make distinct documents look identical (`<EMAIL>` ≠ the emails it
  *    replaced);
  *  - the split is assigned per DOCUMENT and inherited by chunks — a
  *    per-chunk split would leak overlapping windows of one document
  *    across train and test;
  *  - every stage is a lazy DataFrame→DataFrame function; the only
  *    materializations are the ones the dedup/CC operators legitimately
  *    own.
  */
object CorpusPipeline {

  /** Tuning for [[prepare]]; defaults are the common pre-training shape. */
  final case class Config(
      textCol: String = "text",
      idCol: String = "doc_id",
      langs: Set[String] = Set("en"),
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minAlphaRatio: Double = 0.4,
      dedupThreshold: Double = 0.8,
      shingleN: Int = 3,
      decontaminateN: Int = 8,
      chunkTokens: Int = 512,
      overlapTokens: Int = 64,
      splits: Seq[(String, Double)] = Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01))

  /** The kept documents (post-filter/dedup/decontaminate, text redacted,
    * `split` assigned) and their chunks (split inherited from the
    * document; (idCol, chunk_idx, chunk_text, n_chunk_tokens, split)).
    * `stages` exposes each intermediate frame by name (input, quality,
    * exact_dedup, near_dedup, decontaminated) — the per-stage kept
    * counts every production corpus run reports; counting them re-runs
    * only cheap narrow scans, the dedup materializations are shared. */
  final case class Prepared(documents: DataFrame, chunks: DataFrame,
      stages: Seq[(String, DataFrame)] = Nil)

  def prepare(corpus: DataFrame, benchmark: Option[DataFrame] = None,
      cfg: Config = Config()): Prepared = {
    GraftFunctions.register(corpus.sparkSession)
    val text = col(cfg.textCol)

    // 1. quality + language gate: one narrow codegen'd scan stage
    val filtered = corpus.where(
      TextAnalysis.tokenCount(text).between(cfg.minTokens, cfg.maxTokens) &&
        TextAnalysis.alphaRatio(text) >= cfg.minAlphaRatio &&
        GraftFunctions.langIdNative(text).isin(cfg.langs.toSeq: _*))

    // 2. exact content dedup (min-id survivor per normalized text)
    val exactDeduped = Dedup.exactByContent(filtered, cfg.textCol, cfg.idCol)

    // 3. near-dup removal (MinHash+LSH detect → CC → min-id survivor)
    val nearDeduped = Dedup.removeNearDuplicates(
      exactDeduped, cfg.textCol, cfg.idCol, cfg.dedupThreshold, cfg.shingleN)

    // 4. benchmark decontamination. DELIBERATELY a larger n than the
    //    dedup shingles: any-single-trigram overlap would scrub nearly
    //    every English document (common trigrams are everywhere); the
    //    standard decontamination window is ~8–13 contiguous tokens —
    //    long enough that sharing one is real benchmark leakage.
    val clean = benchmark.fold(nearDeduped)(b =>
      Dedup.removeContaminated(nearDeduped, b, cfg.textCol, cfg.idCol,
        cfg.decontaminateN))

    // 5. PII redaction + 6. per-DOCUMENT split assignment
    val documents = Sampling.hashSplit(
      clean.withColumn(cfg.textCol, TextAnalysis.redactPii(text)),
      cfg.idCol, cfg.splits)

    // 7. chunks get the SAME split: it is a pure function of the id
    //    (md5 bucket), so re-deriving it on the chunker's output is a
    //    narrow projection that matches the document's split exactly —
    //    no join, and the documents subtree evaluates once, not twice
    val chunks = Sampling.hashSplit(
      Chunking.chunkByTokens(
        documents, cfg.textCol, cfg.idCol, cfg.chunkTokens, cfg.overlapTokens),
      cfg.idCol, cfg.splits)

    Prepared(documents, chunks, Seq(
      "input" -> corpus, "quality" -> filtered, "exact_dedup" -> exactDeduped,
      "near_dedup" -> nearDeduped, "decontaminated" -> clean))
  }
}
