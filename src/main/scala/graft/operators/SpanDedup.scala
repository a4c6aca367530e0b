package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, Tok}

/** Substring-level (span-level) corpus deduplication — remove TOKEN SPANS
  * that repeat across the corpus, à la Lee/Ippolito/Nystrom et al.,
  * "Deduplicating Training Data Makes Language Models Better" (ACL 2022,
  * public literature): memorization and train loss damage come from
  * repeated SUBSTRINGS, which survive both whole-document dedup (the
  * repeat hides inside otherwise-distinct documents) and line dedup (the
  * repeat need not align with line boundaries). Completes the dedup
  * granularity ladder: document ([[Dedup]]) → line ([[LineDedup]]) →
  * arbitrary n-token span (here). North-star extension; the reference's
  * only dedup is row-level P10 (dags/etl_pipeline.py:178).
  *
  * The paper builds a suffix array to find maximal repeats ≥ 50 tokens; a
  * single global suffix array is exactly the kind of monolithic index
  * that does not distribute. The Spark-first equivalent used here: every
  * length-`n` token window is a key, duplicated windows are found by one
  * hash-partitioned count over 8-byte window hashes, and any repeat of
  * length L ≥ n is discovered as its L − n + 1 overlapping windows, whose
  * positional union reconstructs the full repeated span. Same removal
  * semantics as the paper's (drop every occurrence of every repeat),
  * discovered with shuffles that scale linearly in corpus token count.
  *
  * Scale shape: span strings are hashed to 64 bits at the source, so the
  * occurrence-count aggregation shuffles (8-byte hash) keys and the
  * occurrence join shuffles (8-byte hash, id, pos) rows — never span
  * text; the only shuffle carrying text is the id-keyed reassembly, which
  * moves each document once (the [[LineDedup]] / [[Chunking]] cost
  * model). Covered-position expansion is a narrow `sequence` explode
  * (×n fan-out on duplicated occurrences only, not the corpus).
  * Collision model: a 64-bit span-hash collision could drop an innocent
  * span — ~n_spans²/2⁶⁴ corpus-wide, the bound documented at
  * [[Dedup.contaminationHits]].
  */
object SpanDedup {

  /** One row per OCCURRENCE of a duplicated span: every position `pos`
    * (0-based, in the normalized token stream) where the `n`-token window
    * starting there occurs at least `minCount` times corpus-wide
    * (total occurrences, within- and cross-document alike — a doc that
    * repeats its own boilerplate is deduplicated too).
    * Output: (id, pos, n_occurrences). */
  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minCount: Int = 2, tok: Tok = Tok.Latin): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val occ = spanOccurrences(df, textCol, idCol, n, tok)
    val dup = occ.groupBy(col("_h"))
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= minCount)
    occ.join(dup, Seq("_h"))
      .select(col("id"), col("pos"), col("n_occurrences"))
  }

  /** Rewrite `textCol` with every token covered by any duplicated span
    * removed (from ALL occurrences, matching the paper: a repeated span
    * has no meaningful "owner" copy). The rewritten text is the
    * NORMALIZED token stream (lowercased, punctuation-stripped,
    * space-joined) — the same stream [[Chunking.chunkByTokens]] emits;
    * span boundaries are only defined on it. Token order is preserved; a
    * document whose every token is covered comes back with empty text
    * (the caller's quality gate drops it). All other columns pass
    * through unchanged.
    *
    * Memory bound: the order-preserving reassembly aggregates one
    * document's surviving tokens into a single `collect_list` buffer, so
    * peak per-row memory is O(largest document) — the same bound as any
    * whole-document transform here ([[Chunking.chunkByTokens]]'s token
    * array, [[LineDedup.removeDuplicatedLines]]'s line reassembly). A
    * pathological 1 GiB document materializes in one aggregation buffer;
    * normal corpus documents (≤ tens of MB) are orders of magnitude
    * below executor memory. Cap document size upstream if the source can
    * produce such rows. */
  def removeDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minCount: Int = 2, tok: Tok = Tok.Latin): DataFrame = {
    val dup = duplicatedSpans(df, textCol, idCol, n, minCount, tok)
    // positional union of [pos, pos+n) over duplicated occurrences —
    // overlapping windows of a longer repeat merge here by construction
    val covered = dup
      .select(col("id"), explode(sequence(col("pos"),
        col("pos") + lit(n - 1))).as("_tpos"))
      .distinct()
    GraftFunctions.register(df.sparkSession)
    val toks = df.select(col(idCol).as("id"),
      posexplode(tok.tokens(col(textCol))))
      .withColumnRenamed("pos", "_tpos")
      .withColumnRenamed("col", "_tok")
    val kept = toks.join(covered, Seq("id", "_tpos"), "left_anti")
    // surviving tokens reassemble in original order; one id-keyed shuffle
    val rebuilt = kept.groupBy(col("id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("_tpos"), col("_tok")))),
          x => x.getField("_tok"))).as(textCol))
      .withColumnRenamed("id", idCol)
    // docs that lost every token drop out of `rebuilt` — restore them
    // with empty text so the operator never silently deletes documents
    df.drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /** (id, pos, _h): 64-bit hash of the n-token window at each 0-based
    * position of each document's normalized token stream. Narrow scan +
    * explode; documents shorter than n tokens contribute no rows. */
  private def spanOccurrences(df: DataFrame, textCol: String,
      idCol: String, n: Int, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
      posexplode(tok.ngrams(col(textCol), n)))
      .select(col("id"), col("pos"), xxhash64(col("col")).as("_h"))
  }
}
