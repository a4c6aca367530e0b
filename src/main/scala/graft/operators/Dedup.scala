package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextAnalysis}

/** Deduplication operators for large-scale training-data pipelines
  * (north-star mandate; extends the reference's exact `drop_duplicates`,
  * dags/etl_pipeline.py:178, to the near-duplicate families a 100 TB text
  * corpus needs).
  *
  * Scale design: every method is a pure DataFrame plan — candidate
  * generation is always hash-partitioned (groupBy/join on a bucket key),
  * never all-pairs; exact verification runs only within candidate buckets.
  * No driver-side materialization anywhere.
  */
object Dedup {

  /** Exact full-row dedup (reference P10 at scale: one hash shuffle on all
    * columns; AQE coalesces post-shuffle partitions). */
  def exact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Exact content dedup by normalized-text fingerprint: keeps the row
    * with the lowest id per content group. Shuffles only (fingerprint,
    * id) pairs — not the documents — then semi-joins the winners back. */
  def exactByContent(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = df.select(col(idCol), TextAnalysis.fingerprint64(col(textCol)).as("_fp"))
    val keep = fp.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol)).drop("_fp")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** (id, shingles) projection — distinct word n-gram shingles per doc. */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.shingles(col(textCol), n).as("shingles"))
      .where(size(col("shingles")) > 0)

  /** Exact n-gram Jaccard similarity for ALL pairs above a threshold.
    * All-pairs is quadratic — correct as a ground-truth/verification
    * operator and for modest corpora; the scale path is
    * [[nearDupPairsMinHash]], which generates candidates in O(docs ×
    * bands) and verifies with this same Jaccard expression. */
  def exactJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sh = shingleSets(df, textCol, idCol, n)
    val a = sh.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard of two distinct-element arrays. */
  def jaccardCol(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1))

  /** MinHash signatures: k independent hash functions simulated by seeding
    * Spark's murmur3 `hash(shingle, i)`; signature[i] = min over shingles.
    * Pure expression work — no UDF, no shuffle. */
  def minHashSignatures(shingled: DataFrame, k: Int = 128): DataFrame =
    shingled.withColumn("sig",
      transform(sequence(lit(0), lit(k - 1)),
        i => array_min(transform(col("shingles"), s => hash(s, i)))))

  /** MinHash + LSH near-duplicate pairs (shingle → minhash → band →
    * bucket-join → exact-Jaccard verify):
    *
    *  1. k-minhash signature per doc;
    *  2. split into b bands of r rows; band key = hash(band slice, band idx);
    *  3. docs sharing any band key are candidates (equi-join on the band
    *     key — hash-partitioned, no all-pairs);
    *  4. verify candidates with exact shingle Jaccard and threshold.
    *
    * Defaults (k=128, r=4 ⇒ b=32) give P[candidate] ≈ 1 − (1 − j⁴)³² —
    * ≈ 1 for j ≥ 0.8, ≈ 0.87 at j = 0.5, ≈ 0.05 at j = 0.2.
    * Returns (id_a, id_b, jaccard), exact-verified. */
  def nearDupPairsMinHash(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, n: Int = 3, k: Int = 128, r: Int = 4): DataFrame = {
    val b = k / r
    val sh = shingleSets(df, textCol, idCol, n)
    val sig = minHashSignatures(sh, k)
    val banded = sig.select(col("id"), col("shingles"),
      posexplode(array((0 until b).map(j =>
        hash(slice(col("sig"), j * r + 1, r), lit(j))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val left = banded.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val right = banded.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = left
      .join(right, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard", jaccardCol(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit simhash per doc (native Catalyst
    * expression), LSH on the 4 × 16-bit chunks (Hamming distance ≤ 3 ⇒ at
    * least one chunk is identical, pigeonhole), verify with
    * `bit_count(a ^ b)`. Returns (id_a, id_b, hamming). */
  def nearDupPairsSimHash(spark: SparkSession, df: DataFrame, textCol: String,
      idCol: String, maxHamming: Int = 3): DataFrame = {
    GraftFunctions.register(spark)
    val hashed = df.select(col(idCol).as("id"),
      GraftFunctions.simhash64(TextAnalysis.tokens(col(textCol))).as("sh"))
    val chunked = hashed.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), j * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_key")
    val left = chunked.select(col("chunk"), col("chunk_key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val right = chunked.select(col("chunk"), col("chunk_key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    left.join(right, Seq("chunk", "chunk_key"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs — delegates candidate
    * generation + verification to [[Similarity.cosinePairs]]. */
  def nearDupPairsEmbedding(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95): DataFrame =
    Similarity.cosinePairs(df, vecCol, idCol, threshold)
}
