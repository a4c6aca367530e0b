package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and splitting (north-star
  * mandate: reproducible train/validation/test selection over a 100 TB
  * corpus).
  *
  * Mechanism: a row's bucket is the first 8 hex digits of
  * `md5(string(key))` — a uniform draw in [0, 2³²) that is a pure
  * function of the KEY. Unlike `df.sample`/`rand()`, membership is
  * independent of partitioning, task retries, cluster size, and engine
  * (md5 is bit-identical everywhere — the same predicate runs verbatim
  * in the DuckDB oracle), and it is STABLE under corpus growth: a
  * document keeps its split when new data arrives, which is what
  * train/test hygiene actually requires. Narrow predicate — pushes into
  * the scan stage, no shuffle, no RNG state. */
object Sampling {

  /** [0, 2³²) bucket of a key, as its 8-hex-digit md5 prefix (lowercase;
    * string comparison ≡ numeric comparison at fixed width). */
  def bucketHex(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Half-UP rounding to 4 decimals for a non-negative rate —
    * `floor(x·1e4 + 0.5)`, which for positive inputs is exactly DuckDB's
    * `round(x, 4)` (half-away-from-zero). `math.rint`'s half-to-even
    * would flip an exact .5 tie the other way and change cross-engine
    * sample membership — the very drift the 4-decimal rounding exists to
    * prevent. */
  private[operators] def roundRate4(x: Double): Double =
    math.floor(x * 1e4 + 0.5) / 1e4

  /** Cumulative fraction → inclusive-exclusive hex threshold. A fraction
    * of exactly 1.0 maps to "g" — lexicographically above every 8-hex
    * bucket, so `bucket < threshold` keeps ALL keys (capping at
    * "ffffffff" would silently drop keys hashing to exactly that
    * bucket). Works identically as a SQL string literal. */
  private[graft] def thresholdHex(cum: Double): String =
    if (cum >= 1.0) "g"
    else f"${math.min(math.round(cum * 4294967296.0), 4294967295L)}%08x"

  /** Keep ≈`fraction` of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    if (fraction >= 1.0) df
    else if (fraction <= 0.0) df.where(lit(false))
    else df.where(bucketHex(col(keyCol)) < lit(thresholdHex(fraction)))
  }

  /** STRATIFIED deterministic sample: a per-stratum keep fraction (e.g.
    * rebalancing languages or sources in a training mix), with the same
    * key-pure md5 bucket as [[deterministicSample]] — membership depends
    * only on (key, its stratum's rate), so it is partition-, retry-, and
    * growth-stable, and the identical CASE predicate runs in any SQL
    * engine. Strata absent from `rates` keep `defaultFraction`. Narrow
    * predicate: one codegen'd scan stage, no shuffle, no RNG state —
    * exactly what a 100 TB rebalancing pass should compile to. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions out of [0,1]: $rates / $defaultFraction")
    val hex = bucketHex(col(keyCol))
    val bound = rates.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (stratum, f)) =>
        val cond = col(strataCol) === lit(stratum)
        val th = lit(thresholdHex(f))
        Some(acc.fold(when(cond, th))(_.when(cond, th)))
      }
      .fold(lit(thresholdHex(defaultFraction)))(_.otherwise(thresholdHex(defaultFraction)))
    df.where(hex < bound)
  }

  /** Temperature-based training-mix resampling (the multilingual-LM
    * standard: sampling weight q_s ∝ p_s^α for stratum share p_s = n_s/N,
    * α < 1 flattening the distribution toward rare strata — public
    * literature, XLM/mBERT-style). Per-stratum keep rates are derived so
    * the EXPECTED kept total is ≈ `targetFraction · N` distributed by q,
    * capped at 1 (a stratum is never upsampled — this is a filter, not a
    * generator), then applied with the key-pure [[stratifiedSample]]
    * predicate, so membership stays partition/retry/growth-stable.
    *
    * The stratum histogram is |strata| rows collected to the driver —
    * driver state by construction, like k-means centroids. Rates are
    * rounded to 4 decimals before thresholding: the rate arithmetic runs
    * through `pow`, whose last-ulp behavior is libm-specific, and the
    * rounding makes the derived md5 thresholds — and therefore exact
    * membership — reproducible across engines (the established
    * cross-engine float-parity discipline; a 4-decimal rate step moves
    * thresholds by ~430k buckets, dwarfing any ulp drift). The weight
    * normalizer is summed in stratum-sorted order so even its float
    * rounding is deterministic. */
  def temperatureResample(df: DataFrame, keyCol: String, strataCol: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0,1], got $targetFraction")
    val hist = df.groupBy(col(strataCol).cast("string").as("_s"))
      .agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val total = hist.map(_._2).sum.toDouble
    val weights = hist.map { case (s, n) => s -> math.pow(n / total, alpha) }
    val z = weights.foldLeft(0.0)(_ + _._2) // stratum-sorted summation order
    val target = targetFraction * total
    val rates = weights.map { case (s, w) =>
      val n = hist.toMap.apply(s).toDouble
      s -> roundRate4(math.min(1.0, w / z * target / n))
    }.toMap
    stratifiedSample(df, keyCol, strataCol, rates, defaultFraction = 0.0)
  }

  /** Disjoint named splits covering the whole keyspace, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)` — the last
    * split absorbs rounding remainder. Adds a `split` column. */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 >= 0.0), "split fractions must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val hex = bucketHex(col(keyCol))
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val splitCol = splits.init.zip(cums.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        val cond = hex < lit(thresholdHex(cum))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }
      .fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn("split", splitCol)
  }

  /** Mix a multi-source corpus to TARGET TOKEN SHARES by downsampling —
    * the training-mix composition step: given per-stratum target shares
    * w_s (e.g. 50% curated / 30% web / 20% code), derive keep-rates so
    * the KEPT token mass per stratum is proportional to w_s at the
    * LARGEST total the downsample-only constraint allows:
    * c = min_s(tokens_s / w_s), rate_s = round4(c·w_s / tokens_s) — the
    * binding stratum keeps rate 1.0, everything else scales down. Strata
    * absent from `targetShares` drop (rate 0); shares need not sum to 1
    * (only proportionality is targeted). Rates are 4-decimal-rounded
    * ([[roundRate4]] — DuckDB `round` parity) and applied via the
    * key-pure md5 predicate ([[stratifiedSample]]), so membership is
    * engine-portable, partition-, retry-, and growth-stable, and the
    * whole derivation recomputes identically in SQL.
    *
    * Scale shape: ONE aggregate over the mass column (`tokenCol` —
    * token counts, chars, bytes: any non-negative per-row mass) brings
    * #strata scalars to the driver; the applied predicate is a narrow
    * codegen'd scan stage, no shuffle. Expected (not exact) shares:
    * sampling is per DOCUMENT, so achieved token mass per stratum is
    * rate_s·tokens_s in expectation — the standard mixing contract. */
  def mixToTokenShares(df: DataFrame, keyCol: String, strataCol: String,
      tokenCol: String, targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "mixToTokenShares: at least one target share")
    require(targetShares.values.forall(_ > 0.0),
      "mixToTokenShares: target shares must be positive")
    // null-safe mass sum; strata whose total mass is 0 can contribute
    // nothing — exclude them from BOTH the binding-constraint min (a
    // zero there would zero the whole mix) and the rate map (0·w/0 is
    // NaN, which would crash downstream with a misleading message)
    val hist = df.where(col(strataCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(col(strataCol).cast("string").as("s"))
      .agg(coalesce(sum(col(tokenCol)), lit(0L)).cast("long").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0L)
    require(hist.nonEmpty,
      "mixToTokenShares: no target stratum with positive token mass in the corpus")
    // the largest achievable total: the binding stratum's rate hits 1.0
    val c = targetShares.toSeq.sortBy(_._1)
      .flatMap { case (s, w) => hist.get(s).map(_ / w) }.min
    val rates = targetShares.toSeq.sortBy(_._1).flatMap { case (s, w) =>
      hist.get(s).map(t => s -> roundRate4(math.min(1.0, c * w / t)))
    }.toMap
    stratifiedSample(df, keyCol, strataCol, rates, defaultFraction = 0.0)
  }

  /** Deterministic GLOBAL training-order shuffle, sharded: every row gets
    * a `shard` in [0, numShards) and a `shuffle_key` (md5 of seed:key)
    * such that ordering by (`shard`, `shuffle_key`, key) is a uniform
    * pseudo-random permutation of the corpus — the shuffle-before-
    * training step, without `rand()`'s retry/partitioning instability.
    * Shards are CONTIGUOUS ranges of the hash space (the [[hashSplit]]
    * thresholds at i/numShards), so the permutation is globally
    * coherent: reading shard 0's rows in `shuffle_key` order, then
    * shard 1's, … replays the full shuffled sequence, and a different
    * `seed` is a fresh, reproducible epoch permutation (seed-per-epoch =
    * shuffle-every-epoch with exact replayability).
    *
    * Scale shape: a pure NARROW projection — md5 + a threshold CASE in
    * the scan stage, no shuffle here. The write path partitions by
    * `shard` and sorts within partitions by (`shuffle_key`, key): one
    * exchange, per-shard local sorts, never a global single-partition
    * sort. Size `numShards` to the target output file count (a few
    * hundred MB each); that also bounds any per-shard window a caller
    * adds downstream. Ties between equal 128-bit `shuffle_key`s (distinct
    * keys virtually never collide) break by the key itself, so the order
    * is total and engine-independent. */
  def shuffleIntoShards(df: DataFrame, keyCol: String, numShards: Int,
      seed: String = "0"): DataFrame = {
    require(numShards > 0,
      s"shuffleIntoShards: numShards must be positive, got $numShards")
    val h = md5(concat(lit(seed), lit(":"), col(keyCol).cast("string")))
    val bucket = substring(h, 1, 8)
    val shardCol = (1 until numShards)
      .foldLeft(Option.empty[Column]) { case (acc, i) =>
        val cond = bucket < lit(thresholdHex(i.toDouble / numShards))
        Some(acc.fold(when(cond, i - 1))(_.when(cond, i - 1)))
      }
      .fold(lit(0))(_.otherwise(numShards - 1))
    df.withColumn("shard", shardCol).withColumn("shuffle_key", h)
  }

  /** Write the [[shuffleIntoShards]] permutation to disk: one
    * `shard=<i>/` parquet partition per shard, rows sorted by
    * (`shuffle_key`, key) within each — reading shard 0, 1, … in file
    * order replays the exact global shuffled sequence (the property
    * SamplingSpec pins on the transform; parquet preserves row order
    * within a file). ONE exchange total: `repartition(shard)` hash-
    * partitions rows to their shard, `sortWithinPartitions` is a local
    * sort per shard — never a global single-partition sort. A trainer
    * then streams shard files round-robin-free: the shuffle is already
    * baked into the layout, and a re-run with the same seed is
    * byte-stable for resume/audit. */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int, path: String,
      seed: String = "0"): Unit =
    shuffleIntoShards(df, keyCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(keyCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** PER-GROUP document cap — the C4/RefinedWeb-style domain cap: keep
    * at most `k` rows per `groupCol` value, ranked by `orderBy`
    * descending (quality-first: the best documents of an over-crawled
    * domain survive, SEO spam farms stop dominating the mix), ties then
    * rank broken by ascending `keyCol` so membership is deterministic
    * across runs, partitionings, and engines.
    *
    * Scale shape: ONE shuffle on the group key; Spark plans the
    * `row_number ≤ k` filter as `WindowGroupLimit` (rank pushdown), so
    * each task keeps a k-row heap per group instead of sorting whole
    * groups — a hot domain costs its partition a bounded buffer, not a
    * full-group sort spill. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      k: Int, orderBy: Column): DataFrame = {
    require(k > 0, s"capPerGroup: k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(orderBy.desc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .drop("_rk")
  }

  /** CLUSTER-BALANCED subsampling — the topic-balance pass of a
    * curation pipeline (the embedding-space analogue of
    * [[capPerGroup]]'s domain cap, the cluster-then-sample shape of
    * SemDeDup-family curation): assign each row's embedding to its
    * nearest centroid ([[Similarity.nearestClusterCol]] — cosine
    * argmax, list-ASC ties, one narrow codegen'd expression that keeps
    * every caller column) and keep at most `k` rows per cluster,
    * ranked by `orderBy` descending (quality-first: over-represented
    * topics shed their worst documents, not random ones), ties broken
    * by ascending id — deterministic across runs, partitionings, and
    * engines. Output carries the `cluster` column.
    *
    * Scale shape: the assignment is narrow (centroids travel as plan
    * literals); the only shuffle is [[capPerGroup]]'s window on the
    * cluster key, planned as `WindowGroupLimit` (bounded k-row buffer
    * per cluster, no full-cluster sort spill). */
  def clusterBalancedSample(df: DataFrame, embedCol: String, idCol: String,
      centroids: Array[(Int, Array[Float])], k: Int,
      orderBy: Column): DataFrame = {
    require(!df.columns.contains("cluster"),
      "input already has a 'cluster' column - clusterBalancedSample " +
        "writes the assignment there; rename yours first")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val withCluster = df.withColumn("cluster",
      Similarity.nearestClusterCol(col(embedCol), centroids))
    capPerGroup(withCluster, "cluster", idCol, k, orderBy)
  }
}
