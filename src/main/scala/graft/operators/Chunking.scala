package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Document chunking — the pre-tokenization pass that turns long
  * documents into overlapping fixed-size token windows for LLM training
  * (north-star mandate: training-data pipeline surface).
  *
  * Pure narrow plan: tokenize (native codegen'd `norm_tokens`), compute
  * the chunk starts as a stride sequence, explode, slice. One scan
  * stage, no shuffle — at 100 TB chunking is embarrassingly parallel and
  * must compile to exactly this. The reference has no analogue
  * (dags/etl_pipeline.py operates on tabular rows only); this is
  * extension surface.
  */
object Chunking {

  /** Split each document's normalized token sequence into windows of
    * `chunkTokens` tokens advancing by `chunkTokens − overlapTokens`
    * (trailing window may be short; a trailing window contributing NO new
    * tokens beyond the overlap is skipped; zero-token docs yield no
    * rows). Emits (idCol, chunk_idx, chunk_text, n_chunk_tokens) —
    * chunk_idx is the 0-based window ordinal, deterministic by
    * construction.
    *
    * `tokenizer` selects the unit the windows count: None = whitespace
    * `norm_tokens` (the default proxy); pass a Column producing an
    * array<string> over the text — e.g.
    * [[Bpe.pieces]]`(col(textCol), model)` — to chunk by TRAINED-BPE
    * pieces, the units a real trainer packs (the same narrow plan; the
    * kernel swaps, nothing else). */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlapTokens: Int = 0,
      tokenizer: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    GraftFunctions.register(df.sparkSession)
    val stride = chunkTokens - overlapTokens
    val toks = tokenizer.getOrElse(GraftFunctions.normTokens(col(textCol)))
    df.select(col(idCol), toks.as("_toks"))
      .where(size(col("_toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          filter(
            sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0)), lit(stride)),
            start => start === 0 || start + overlapTokens < size(col("_toks"))),
          start => slice(col("_toks"), start + 1, lit(chunkTokens)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_chunk_tokens"))
  }
}
