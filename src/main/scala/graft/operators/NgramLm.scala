package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, NgramLmScorer, Tok}

/** Trained trigram language model for perplexity-style quality
  * filtering — the CCNet recipe (Wenzek et al., LREC 2020): train an LM
  * on a TRUSTED reference corpus (curated text, a target domain), score
  * every candidate document by its per-token log-score under that LM,
  * and gate on a threshold — fluent, reference-like text scores high;
  * boilerplate, gibberish and lexicon soup score low. The LM itself is
  * Stupid Backoff (Brants et al., EMNLP 2007), chosen over Kneser-Ney
  * deliberately: its training is nothing but n-gram COUNTING — two
  * shuffles and a bounded driver merge in Spark terms — and the paper
  * shows the quality gap vanishes at large training data, which is the
  * regime this engine targets.
  *
  * Training ([[fit]]): count padded 1/2/3-grams of the reference's
  * normalized token stream (three aggregations, each pruned to
  * `minCount` and capped at `maxEntriesPerOrder` via TakeOrdered — the
  * [[Bpe.train]] bounded-driver-histogram discipline), then derive
  * per-entry scaled-long log-scores on the driver:
  * ln(c(gram)/c(context)) · 1e9. Entries whose context gram was pruned
  * are dropped (backoff covers them) so serving can never divide by a
  * count it does not have. Driver state ≤ 3·maxEntriesPerOrder entries.
  *
  * Serving ([[scoreCol]]): ONE narrow codegen'd projection — the frozen
  * tables travel inside a [[graft.functions.NgramLmScorer]] codegen
  * reference object, the fold is exact integer arithmetic, and the
  * whole scan restates verbatim in DuckDB ([[graft.NgramLmOracle]]).
  * At 100 TB this is embarrassingly parallel: no shuffle, no join, no
  * UDF, no driver round-trip.
  *
  * Scale note on [[fit]]: the n-gram count aggregations shuffle the
  * reference corpus once per order; the reference is a SAMPLE by
  * construction (CCNet trains on Wikipedia, not on the crawl), so the
  * training input is bounded long before the candidate corpus is. */
object NgramLm {

  /** Fixed-point scale (the [[Dsir.WeightScale]] discipline). */
  val WeightScale: Long = 1000000000L

  /** Brants et al.'s backoff constant λ = 0.4. */
  val Lambda: Double = 0.4

  /** Surrogate join/window key a NULL stratum maps to in
    * [[perplexityBuckets]] — control-character-prefixed, so no natural
    * stratum value can collide with it. */
  private val NullStratumKey: String = "\u0000<null-stratum>"

  /** Left-context sentinel — [[graft.functions.ShingleUtil.normTokens]]
    * emits only [a-z0-9]+ tokens, so `<s>` cannot collide. */
  val Sentinel: String = "<s>"

  /** A trained trigram Stupid-Backoff model. Keys are space-joined
    * grams ("w", "a w", "a b w"); values are 1e9-scaled
    * ln(c(gram)/c(context)) longs. `backoffScaled` = ⌊ln λ·1e9⌋,
    * `unkScaled` = ⌊ln(1/(N+1))·1e9⌋ (the unknown-token floor, N =
    * total reference tokens). Sorted-key arrays (not Maps) so frozen
    * literals diff deterministically. */
  final case class Model(uniKeys: Array[String], uniVals: Array[Long],
      biKeys: Array[String], biVals: Array[Long],
      triKeys: Array[String], triVals: Array[Long],
      backoffScaled: Long, unkScaled: Long) {
    require(uniKeys.length == uniVals.length &&
      biKeys.length == biVals.length && triKeys.length == triVals.length,
      "table shape mismatch")
    require(backoffScaled < 0, s"backoffScaled must be ln(lambda)<0 scaled: $backoffScaled")

    @transient lazy val scorer: NgramLmScorer = new NgramLmScorer(
      uniKeys, uniVals, biKeys, biVals, triKeys, triVals,
      backoffScaled, unkScaled)
  }

  /** Normalized tokens with NULL text coalescing to the EMPTY array —
    * the [[Dsir]] discipline: a null-text document scores 0 with 0
    * tokens instead of propagating NULL through the fold (which would
    * silently diverge from the oracle's COALESCE(sum, 0)). */
  private def tokensOf(text: Column, tok: Tok = Tok.Latin): Column =
    coalesce(tok.tokens(text), array().cast("array<string>"))

  /** Padded token array of a text column: two sentinels + normTokens. */
  private def padded(text: Column, tok: Tok): Column =
    concat(array(lit(Sentinel), lit(Sentinel)), tokensOf(text, tok))

  /** All space-joined k-grams of the PADDED stream (every position —
    * context grams like `<s> <s>` included: they are the denominators).
    * Guarded so a short stream yields the empty array (Spark's
    * `sequence(1, 0)` would DESCEND, not empty out). */
  private def kgramsAll(text: Column, k: Int, tok: Tok): Column = {
    val p = padded(text, tok)
    when(size(p) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(p) - (k - 1)),
        i => concat_ws(" ", slice(p, i, lit(k)))))
  }

  /** One order's pruned count table: (gram, count), count ≥ minCount,
    * top `maxEntries` by (count DESC, gram) — a TakeOrdered, never a
    * global sort; ≤ maxEntries rows to the driver. */
  private def countTable(reference: DataFrame, textCol: String, k: Int,
      minCount: Long, maxEntries: Int, tok: Tok): Array[(String, Long)] =
    reference.select(explode(kgramsAll(col(textCol), k, tok)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .orderBy(col("c").desc, col("g"))
      .limit(maxEntries)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** Train on a reference corpus. One scalar aggregation (N) + three
    * bounded count aggregations; all remaining work is a driver pass
    * over ≤ 3·maxEntriesPerOrder entries. */
  def fit(reference: DataFrame, textCol: String,
      maxEntriesPerOrder: Int = 1 << 16, minCount: Long = 2L,
      tok: Tok = Tok.Latin): Model = {
    require(maxEntriesPerOrder > 0, s"maxEntriesPerOrder: $maxEntriesPerOrder")
    require(minCount >= 1, s"minCount: $minCount")
    GraftFunctions.register(reference.sparkSession)
    val n = reference
      .select(sum(size(tok.tokens(col(textCol)))).cast("long"))
      .collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(n > 0, "reference corpus has no tokens")
    val c1 = countTable(reference, textCol, 1, minCount, maxEntriesPerOrder, tok)
    val c2 = countTable(reference, textCol, 2, minCount, maxEntriesPerOrder, tok)
    val c3 = countTable(reference, textCol, 3, minCount, maxEntriesPerOrder, tok)
    val uniCount = c1.toMap
    val biCount = c2.toMap

    def scaled(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) * WeightScale)

    // Unigram scores: real tokens only (the sentinel is context-only —
    // serving can never look it up as a predicted token); denominator N.
    val uni = c1.iterator.filter(_._1 != Sentinel)
      .map { case (w, c) => (w, scaled(c, n)) }.toArray.sortBy(_._1)
    // Bigram scores: predicted slot must be a real token ("<s> <s>" is
    // context-only); context unigram must have survived pruning.
    val bi = c2.iterator
      .filter { case (g, _) => !g.endsWith(" " + Sentinel) }
      .flatMap { case (g, c) =>
        val ctx = g.substring(0, g.indexOf(' '))
        uniCount.get(ctx).map(cc => (g, scaled(c, cc)))
      }.toArray.sortBy(_._1)
    val tri = c3.iterator
      .filter { case (g, _) => !g.endsWith(" " + Sentinel) }
      .flatMap { case (g, c) =>
        val ctx = g.substring(0, g.lastIndexOf(' '))
        biCount.get(ctx).map(cc => (g, scaled(c, cc)))
      }.toArray.sortBy(_._1)

    Model(uni.map(_._1), uni.map(_._2), bi.map(_._1), bi.map(_._2),
      tri.map(_._1), tri.map(_._2),
      backoffScaled = math.round(math.log(Lambda) * WeightScale),
      unkScaled = math.round(math.log(1.0 / (n.toDouble + 1.0)) * WeightScale))
  }

  /** The exact scaled-long score as a Column over a TOKEN-ARRAY column —
    * compose as `scoreScaledCol(GraftFunctions.normTokens(text), m)` so
    * subexpression elimination shares the tokenize with
    * `size(norm_tokens(text))` in the same projection. Session must be
    * [[GraftFunctions.register]]ed (every entry-point method here is). */
  def scoreScaledCol(tokens: Column, model: Model): Column =
    call_function("ngram_lm_score", tokens,
      lit(model.uniKeys), lit(model.uniVals), lit(model.biKeys),
      lit(model.biVals), lit(model.triKeys), lit(model.triVals),
      lit(model.backoffScaled), lit(model.unkScaled))

  /** Per-document scores: (idCol, n_tokens, score_scaled, mean_log) —
    * mean_log = score/(1e9·max(n,1)), the per-token log-score a CCNet
    * threshold reads (cast from identical integer operands on every
    * engine). ONE narrow projection. */
  def score(df: DataFrame, textCol: String, idCol: String,
      model: Model, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val toks = tokensOf(col(textCol), tok)
    df.select(col(idCol), size(toks).as("n_tokens"),
        scoreScaledCol(toks, model).as("score_scaled"))
      .withColumn("mean_log",
        col("score_scaled").cast("double") /
          (lit(WeightScale.toDouble) * greatest(col("n_tokens"), lit(1)).cast("double")))
  }

  /** Gate predicate: per-token mean log-score ≥ `minMeanLog`, evaluated
    * as the EXACT integer comparison score_scaled ≥ ⌊minMeanLog·1e9⌋ ·
    * n_tokens (no float in the decision — both engines agree bit-for-
    * bit). Empty documents (n=0, score=0) pass iff minMeanLog ≤ 0 —
    * the length floor upstream is the operator that rejects those. */
  def gateCol(text: Column, model: Model, minMeanLog: Double,
      tok: Tok = Tok.Latin): Column = {
    val toks = tokensOf(text, tok)
    scoreScaledCol(toks, model) >=
      lit(math.round(minMeanLog * WeightScale)) * size(toks).cast("long")
  }

  /** Rows whose per-token mean log-score clears `minMeanLog`. */
  def filterByScore(df: DataFrame, textCol: String, model: Model,
      minMeanLog: Double, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.where(gateCol(col(textCol), model, minMeanLog, tok))
  }

  /** CCNet-style perplexity BUCKETING (Wenzek et al. LREC 2020 §4.3):
    * stratify documents into `nBuckets` quality tiers (3 = the paper's
    * head/middle/tail) by per-token LM score — the stratification a
    * curriculum or mix policy consumes downstream.
    *
    * Scale shape — the paper's own recipe, and the only exact AND
    * distributed one: cut thresholds come from a DETERMINISTIC key-pure
    * sample ([[Sampling.deterministicSample]]'s md5-prefix membership —
    * bounded by `sampleFraction`, the tuner's sampled-background
    * precedent), extracted as exact order statistics of the sample
    * (row_number over (mean DESC, id), one window task per stratum —
    * which `sampleFraction` exists to keep bounded); assignment is then
    * a NARROW codegen'd scan against the collected cut literals — no
    * extra shuffle, no global sort, no per-document window over the full
    * corpus (an exact corpus-wide ntile would funnel 100 TB through one
    * task).
    *
    * Bucket j (1-based; 1 = head = highest mean log-score) = 1 + the
    * number of cuts strictly ABOVE the document's mean, where cut_j is
    * the sample's mean at descending rank ⌈j·n/nBuckets⌉. Documents with
    * mean exactly equal to a cut land in the UPPER bucket — threshold
    * semantics are by VALUE (CCNet applies sampled percentile cutoffs
    * the same way), so equal-scoring documents always share a bucket
    * even when a rank split would separate them. Strata whose sample is
    * empty assign bucket 1 (no evidence to split on).
    *
    * `byCol`: optional stratum — CCNet buckets per LANGUAGE, so mixed
    * corpora pass their lang column here and each language gets its own
    * cuts. Any column type works (the internal key is a string cast),
    * and NULL strata form their OWN stratum with their own cuts (a NULL
    * equi-join key would otherwise silently head-bucket them). Output:
    * idCol [, byCol], n_tokens, score_scaled, mean_log, bucket,
    * bucket_label (head/middle/tail when nBuckets = 3, b<j>
    * otherwise). */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
      model: Model, nBuckets: Int = 3, sampleFraction: Double = 0.1,
      byCol: Option[String] = None, tok: Tok = Tok.Latin): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val spark = df.sparkSession
    GraftFunctions.register(spark)
    val toks = tokensOf(col(textCol), tok)
    // the JOIN/WINDOW key is a total string surrogate of the stratum:
    // cast (byCol may be any type — the collected cut rows read strings)
    // and NULL-coalesced to a sentinel (equi-joins never match NULL keys,
    // which would silently head-bucket every NULL-stratum document); the
    // caller's original column rides along untouched for the output
    val strCast = byCol.map(c => col(c).cast("string")).getOrElse(lit(""))
    val scored = df.select(
        (Seq(col(idCol), byCol.map(col).getOrElse(lit("")).as("_stratum"),
          coalesce(strCast, lit(NullStratumKey)).as("_skey"),
          size(toks).as("n_tokens"),
          scoreScaledCol(toks, model).as("score_scaled"))): _*)
      .withColumn("mean_log",
        col("score_scaled").cast("double") /
          (lit(WeightScale.toDouble) * greatest(col("n_tokens"), lit(1)).cast("double")))
    // exact order statistics of the deterministic sample: the row at
    // descending rank ⌈j·cnt/nBuckets⌉ per stratum, j = 1..nBuckets−1
    // (integer-exact: floor((j·cnt + nB−1)/nB) over doubles is exact for
    // any testable count). ONE driver action, ≤ (nBuckets−1) rows per
    // stratum.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_skey"))
      .orderBy(col("mean_log").desc, col(idCol))
    val ranked = Sampling.deterministicSample(scored, idCol, sampleFraction)
      .select(col("_skey"), col("mean_log"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("_skey"))).as("cnt"))
    val isCut = (1 until nBuckets)
      .map(j => col("rn") ===
        floor((lit(j.toLong) * col("cnt") + lit((nBuckets - 1).toLong)) /
          lit(nBuckets.toLong)))
      .reduce(_ || _)
    val cutRows = ranked.where(isCut)
      .select(col("_skey"), col("rn"), col("cnt"), col("mean_log"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    // per stratum: cut_j = the value at rank ⌈j·cnt/nB⌉ (several j may
    // share one rank on tiny samples — each still contributes a cut)
    val cutsByStratum: Seq[(String, Seq[Double])] = cutRows
      .groupBy(_._1).toSeq.map { case (stratum, rows) =>
        val cnt = rows.head._3
        val byRank = rows.map(r => r._2 -> r._4).toMap
        stratum -> (1 until nBuckets).flatMap { j =>
          byRank.get((j.toLong * cnt + (nBuckets - 1)) / nBuckets)
        }
      }
    import spark.implicits._
    val cutsDf = cutsByStratum.toDF("_skey", "_cuts")
    val joined =
      if (cutsByStratum.isEmpty) scored.withColumn("_cuts", lit(null).cast("array<double>"))
      else scored.join(broadcast(cutsDf), Seq("_skey"), "left")
    val bucket = lit(1) + coalesce(
      size(filter(col("_cuts"), c => col("mean_log") < c)), lit(0))
    val label =
      if (nBuckets == 3)
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle").otherwise("tail")
      else concat(lit("b"), col("bucket").cast("string"))
    joined.withColumn("bucket", bucket)
      .withColumn("bucket_label", label)
      .select((Seq(col(idCol)) ++ byCol.map(c => col("_stratum").as(c)) ++
        Seq(col("n_tokens"), col("score_scaled"), col("mean_log"),
          col("bucket"), col("bucket_label"))): _*)
  }
}
