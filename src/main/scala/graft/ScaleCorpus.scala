package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: build a ×`factor` scaled copy of a testdata `documents`
  * table for the scaling measurements recorded in BASELINE.md.
  *
  * Replication transform (the round-3 methodology, made GATE-PRESERVING):
  * each document is replicated `factor`× with the replica ordinal
  * appended to EVERY token as `_rep<k>`. Under the engine's normalization
  * (`[^a-z0-9]+` → separator) the underscore splits off, so replica k of
  * "the quick fox" normalizes to "the repk quick repk fox repk" (the
  * `rep` prefix keeps the interleaved token WORD-SIZED — a bare 1-digit
  * ordinal would drag the corpus mean token length onto the Gopher
  * mean-word-length floor of 3.0 and gate out most of the corpus):
  *
  *  - cross-replica shingle sets are disjoint (every n-gram window
  *    contains the replica ordinal), so near-dup pair counts grow
  *    LINEARLY with the factor — the property the scaling tables need;
  *  - stopword TOKENS survive intact, so language-ID still votes 'en'
  *    on English documents and the corpus-pipeline quality gate passes
  *    at its natural rate (the round-5 token-suffix corpus glued the
  *    ordinal onto the token — "thek" matches no stopword list — and
  *    lang-ID collapsed to 'und', defeating the gate; that is the †
  *    caveat this tool replaces);
  *  - within-replica near-dup structure is preserved (the interleaved
  *    stream maps original bigram/unigram overlap through a per-replica
  *    bijection — similar pairs stay similar, dissimilar stay
  *    dissimilar);
  *  - replicas are never exact dups of each other (the ordinal differs),
  *    and ids are remapped `doc_id * factor + k` so min-id survivor
  *    semantics stay deterministic.
  *
  * The optional `embeddings` table arg also scales `embeddings.parquet`:
  * replica k of vector v remaps `vec_id * factor + k` and JITTERS every
  * component by a deterministic hash-derived ±0.02 — replicas stay in
  * their original coarse cluster (the jitter is far inside the
  * inter-centroid margin) without being bit-identical, so per-cluster
  * ranking work is realistic, not a degenerate all-ties sort.
  *
  * Usage: `runMain graft.ScaleCorpus <srcSfDir> <outDir> <factor>
  * [documents|embeddings ...]`; the other sf tables are NOT copied —
  * symlink them into `outDir` if a query under measurement needs them.
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleCorpus <srcSfDir> <outDir> <factor> [documents|embeddings ...]")
    val Array(src, out, factorS) = args.take(3)
    val tables: Set[String] =
      if (args.length > 3) args.drop(3).toSet else Set("documents")
    require(tables.subsetOf(Set("documents", "embeddings")),
      s"unknown table arg(s): ${tables -- Set("documents", "embeddings")} " +
        "(a typo here would silently scale nothing)")
    val factor = factorS.toInt
    require(factor >= 2, s"factor must be >= 2, got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = spark.range(0, factor.toLong).select(col("id").cast("int").as("_k"))
    if (tables("documents")) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      docs.crossJoin(reps)
        .select(
          (col("doc_id") * factor + col("_k")).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => concat(t, lit("_rep"), col("_k")))).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val n = spark.read.parquet(s"$out/documents.parquet").count()
      println(s"[scale] wrote $n documents to $out/documents.parquet (factor $factor)")
    }
    if (tables("embeddings")) {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      emb.crossJoin(reps)
        .select(
          (col("vec_id") * factor + col("_k")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + lit(0.02f) * ((pmod(xxhash64(concat(
              col("vec_id").cast("string"), lit(":"), col("_k").cast("string"),
              lit(":"), i.cast("string"))), lit(2001)).cast("float") -
              lit(1000f)) / lit(1000f))).cast("float")).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      val n = spark.read.parquet(s"$out/embeddings.parquet").count()
      println(s"[scale] wrote $n embeddings to $out/embeddings.parquet (factor $factor)")
    }
    spark.stop()
  }
}
