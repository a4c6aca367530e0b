package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) corpus deduplication — the CCNet /
  * RefinedWeb-style pass that removes boilerplate LINES repeated across
  * documents (navigation chrome, cookie banners, license footers) while
  * leaving each document's unique prose intact. Operates between exact
  * doc-level dedup (whole-text match) and near-dup removal (whole-doc
  * similarity): neither catches a footer shared by a million otherwise
  * distinct pages. North-star extension; the reference has no analogue
  * (dags/etl_pipeline.py's only dedup is row-level P10, :178).
  *
  * Scale shape: two hash-partitioned shuffles and nothing else. Line
  * strings are hashed to 64 bits at the source, so the duplicate-count
  * aggregation shuffles (8-byte hash, id) pairs — never line text; the
  * only shuffle that carries text is the id-keyed reassembly, which moves
  * each document once (the [[Chunking]] cost model). Collision model:
  * a 64-bit line-hash collision could drop an innocent line — ~n_lines²/2⁶⁴
  * corpus-wide, the same documented bound as
  * [[Dedup.contaminationHits]]'s shingle hashes.
  */
object LineDedup {

  /** Rewrite `textCol` with every line that appears in at least `minDocs`
    * DISTINCT documents removed (from ALL documents, including the
    * first — a boilerplate line has no meaningful "owner"). Lines are
    * `sep`-separated (literal separator, not a regex); BLANK lines
    * (whitespace-only) are document structure, not content — they are
    * never counted as duplicates and always survive. Line order is
    * preserved; a document whose every line is boilerplate comes back
    * with empty text (the caller's quality gate drops it). All other
    * columns pass through unchanged.
    *
    * Memory bound: the order-preserving reassembly aggregates one
    * document's surviving lines into a single `collect_list` buffer, so
    * peak per-row memory is O(largest document) — the same bound as any
    * whole-document transform here ([[Chunking.chunkByTokens]]'s token
    * array, [[SpanDedup.removeDuplicatedSpans]]'s token reassembly). A
    * pathological 1 GiB document materializes in one aggregation buffer;
    * normal corpus documents (≤ tens of MB) are orders of magnitude
    * below executor memory. Cap document size upstream if the source can
    * produce such rows. */
  def removeDuplicatedLines(df: DataFrame, textCol: String, idCol: String,
      minDocs: Int = 2, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("pos", "_pos")
      .withColumnRenamed("col", "_line")
      // blank lines get a NULL hash: null join keys never match, so they
      // bypass both the duplicate count and the anti-join below
      .withColumn("_h", when(trim(col("_line")) === "", lit(null).cast("long"))
        .otherwise(xxhash64(col("_line"))))
    // distinct-doc count per line hash — (8-byte, id) shuffle, then the
    // duplicate set is just the hashes (tiny, AQE broadcasts the anti-join)
    val dupHashes = lines.where(col("_h").isNotNull)
      .select(col("_h"), col(idCol)).distinct()
      .groupBy(col("_h")).agg(count(lit(1)).as("_nd"))
      .where(col("_nd") >= minDocs)
      .select(col("_h"))
    val kept = lines.join(dupHashes, Seq("_h"), "left_anti")
    // reassemble surviving lines in original order; one id-keyed shuffle
    val rebuilt = kept.groupBy(col(idCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line"))).as(textCol))
    // docs that lost every line drop out of `rebuilt` — restore them with
    // empty text so the operator never silently deletes documents
    df.drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /** Collapse REPEATED lines WITHIN each document, keeping the first
    * occurrence — the INTRA-page sibling of [[removeDuplicatedLines]]
    * (the C4-family "dedupe lines within a page" cleanup): a nav menu
    * pasted twice into ONE page never reaches the cross-doc pass's
    * distinct-document count, so it needs its own rung. Blank
    * (whitespace-only) lines are document structure and always survive;
    * line order is preserved.
    *
    * Scale shape: ONE narrow codegen'd projection (split →
    * first-occurrence filter → rejoin) — no shuffle, no join, a free
    * rider on any scan at 100 TB. Per-document cost is O(lines²) string
    * compares worst-case (`array_position` scans from the head), all
    * in-memory per row — real pages have hundreds of lines, and a
    * pathological document costs only its own task time, never
    * distributed state. */
  def collapseRepeatedLines(df: DataFrame, textCol: String,
      sep: String = "\n"): DataFrame = {
    // the split is HOISTED into its own projection so the lambda's
    // array_position probes the materialized array — inlined, every
    // line's check would re-split the whole document (CollapseProject
    // keeps the hoist: the alias is non-cheap and referenced twice)
    val arr = col("_cl_lines")
    df.withColumn("_cl_lines",
        split(col(textCol), java.util.regex.Pattern.quote(sep)))
      .withColumn(textCol, concat_ws(sep, filter(arr, (l, i) =>
        trim(l) === "" ||
          array_position(arr, l) === (i + lit(1)).cast("long"))))
      .drop("_cl_lines")
  }
}
