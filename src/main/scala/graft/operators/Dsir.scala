package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GraftFunctions, Tok}

/** DSIR-style data selection: importance resampling toward a TARGET text
  * distribution over hashed n-gram features (Xie et al., "Data Selection
  * for Language Models via Importance Resampling", NeurIPS 2023).
  *
  * The GENERATIVE counterpart of [[QualityModel]]'s discriminative gate:
  * no labels — fit a bag-of-hashed-ngrams multinomial on a target sample
  * (the distribution you want more of: curated text, a domain corpus)
  * and one on the raw pool, score every raw document by its importance
  * log-weight Σ_f c_f·(log p̂_target[f] − log q̂_raw[f]), then sample
  * without replacement with probability ∝ the importance weight via the
  * Gumbel-top-k trick. Features are unigrams ++ bigrams of the
  * normalized token stream, hashed into `dim` buckets ([[QualityModel
  * .featureIndex]] — the engine-portable md5-prefix hash), exactly the
  * paper's hashed n-gram parameterization.
  *
  * Determinism discipline (the [[QualityModel]] scaled-long contract):
  * per-bucket log-ratios freeze as 1e9-scaled LONGS, so a document's
  * log-weight is an exact integer fold — order-independent, bit-equal
  * across engines. The Gumbel noise is a pure function of the document
  * KEY (md5-derived uniform, the [[Sampling]] discipline), so the
  * selected set is partition-, retry-, and growth-stable, and the whole
  * pipeline — fold, noise, top-k — restates verbatim in SQL
  * ([[graft.DsirOracle]]).
  *
  * Scale shape (100 TB): [[fit]] is two feature aggregations collecting
  * `dim` scalars each (fit on bounded samples, as the paper does);
  * [[logWeight]] is ONE narrow codegen'd projection over the scan — the
  * weight table travels as a plan literal (8 KB at dim=1024), no
  * shuffle, no join, no UDF; [[resample]]'s top-k is a per-partition
  * heap + driver merge (`TakeOrderedAndProject`), right for
  * sample-sized k — for corpus-sized selections filter on a z threshold
  * from `approxQuantile` instead (one extra pass, no global sort), or
  * feed `log_w` to [[Selection.selectUnderTokenBudget]]'s distributed
  * prefix sum. */
object Dsir {

  /** Fixed-point scale for the per-bucket log-ratio table (the
    * [[QualityModel.WeightScale]] discipline): ~9 exact decimal digits
    * per feature; worst-case |λ|·scale·n_features stays far inside
    * Long for any real document. */
  val WeightScale: Long = 1000000000L

  /** Default salt for the Gumbel draw — ONE constant shared by
    * [[resample]]/[[resampleRows]], the SparkEntry registrations, and
    * every oracle restatement (DsirOracle, the pipeline CTE), so the
    * engines cannot drift on the noise stream. */
  val DefaultSalt: String = "dsir:"

  /** A fitted importance model: `weightsScaled(j)` =
    * round((log p̂_target[j] − log q̂_raw[j]) · [[WeightScale]]). */
  case class Model(dim: Int, weightsScaled: Array[Long]) {
    require(weightsScaled.length == dim,
      s"weight table length ${weightsScaled.length} != dim $dim")
  }

  /** Hashed unigram+bigram feature array of a text column — the paper's
    * feature extractor, built from the registered native kernels
    * (`norm_tokens`, `ngrams`): one codegen'd array expression, no
    * explode in the scoring path. NULL text coalesces to the EMPTY
    * feature array, so a null-text document scores log_w = 0.0 with 0
    * features — matching the oracle restatement's COALESCE(sum, 0)
    * (a null-feature fold would yield NULL and silently diverge). */
  private def features(text: Column, tok: Tok = Tok.Latin): Column =
    coalesce(
      concat(tok.tokens(text), tok.ngrams(text, 2)),
      array().cast("array<string>"))

  /** Per-bucket feature counts of a corpus sample: ONE aggregation,
    * `dim` rows to the driver. */
  private[operators] def bucketCounts(df: DataFrame, textCol: String,
      dim: Int, tok: Tok = Tok.Latin): Array[Long] = {
    GraftFunctions.register(df.sparkSession)
    val rows = df.select(explode(features(col(textCol), tok)).as("f"))
      .groupBy(QualityModel.featureIndex(col("f"), dim).as("j"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val arr = new Array[Long](dim)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Fit the hashed-ngram importance model: add-`alpha` smoothed bucket
    * multinomials on the target and raw samples, per-bucket log-ratio
    * quantized to scaled longs. Driver state = 2·dim longs. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String, dim: Int,
      alpha: Double = 1.0, tok: Tok = Tok.Latin): Model = {
    require(dim > 0, s"dim must be positive: $dim")
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    val ct = bucketCounts(target, textCol, dim, tok)
    val cr = bucketCounts(raw, textCol, dim, tok)
    val tt = ct.sum.toDouble + alpha * dim
    val tr = cr.sum.toDouble + alpha * dim
    val lam = Array.tabulate(dim) { j =>
      math.log((ct(j) + alpha) / tt) - math.log((cr(j) + alpha) / tr)
    }
    Model(dim, lam.map(l => math.round(l * WeightScale)))
  }

  /** Per-document importance log-weights: (idCol, n_features, log_w)
    * with log_w = (Σ_f wScaled[h(f)]) / scale — the paper's raw
    * per-ngram sum (deliberately length-coupled: a long on-target
    * document IS more target evidence than a short one; normalize
    * downstream if a per-token density is wanted). Exact integer fold →
    * one division on identical operands: bit-equal across engines.
    * Narrow single projection, no shuffle. */
  def logWeight(df: DataFrame, textCol: String, idCol: String,
      model: Model, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), size(features(col(textCol), tok)).as("n_features"),
      logWeightCol(col(textCol), model, tok).as("log_w"))
  }

  /** The importance log-weight as a bare Column over a text column (the
    * session must have [[GraftFunctions.register]] applied — every
    * entry-point method does it) — for composition into wider plans
    * (pipeline stages, ad-hoc projections). */
  def logWeightCol(text: Column, model: Model, tok: Tok = Tok.Latin): Column = {
    val feats = features(text, tok)
    val w = lit(model.weightsScaled)
    val folded = aggregate(feats, lit(0L), (acc, f) =>
      acc + element_at(w, (QualityModel.featureIndex(f, model.dim) + 1).cast("int")))
    folded.cast("double") / lit(WeightScale.toDouble)
  }

  /** Deterministic Gumbel key for weighted sampling WITHOUT replacement:
    * z = log_w + g where g = −ln(−ln(u)) and u is the key's md5 bucket
    * mapped to (0,1) — taking the top-k z's samples k documents with
    * probability ∝ exp(log_w), the Gumbel-top-k identity. u is a pure
    * function of (salt, key): membership is retry- and partition-stable
    * and replays identically in SQL. Both addends round to
    * DECIMAL(25,9) before summing — the repo's ln discipline: a
    * last-ulp `ln` divergence between engines is absorbed by the
    * 9-decimal quantization, and the decimal sum is exact. */
  def gumbelKey(key: Column, logW: Column, salt: String): Column = {
    val bucket = conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8),
      16, 10).cast("double")
    val u = (bucket + lit(0.5)) / lit(4294967296.0)
    val g = -log(-log(u))
    (logW.cast(DecimalType(25, 9)) + g.cast(DecimalType(25, 9))).cast("double")
  }

  /** Importance-resample k documents without replacement:
    * (idCol, log_w, z), the k largest Gumbel keys, ties broken by id.
    * Compiles to a per-partition top-k heap + driver merge of
    * partitions·k rows (`TakeOrderedAndProject` — no global sort); see
    * the object scaladoc for the corpus-sized-k alternatives. */
  def resample(df: DataFrame, textCol: String, idCol: String, model: Model,
      k: Int, salt: String = DefaultSalt, tok: Tok = Tok.Latin): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    logWeight(df, textCol, idCol, model, tok)
      .withColumn("z", gumbelKey(col(idCol), col("log_w"), salt))
      .orderBy(col("z").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("log_w"), col("z"))
  }

  /** [[resample]] keeping the ORIGINAL rows (all columns) of the
    * selected documents — the pipeline-composition form: same selected
    * set, same top-k plan shape, no join back. */
  def resampleRows(df: DataFrame, textCol: String, idCol: String,
      model: Model, k: Int, salt: String = DefaultSalt,
      tok: Tok = Tok.Latin): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(!df.columns.contains("_dsir_z"),
      "input already has a '_dsir_z' column - resampleRows stages its " +
        "Gumbel key there and would silently overwrite it; rename yours first")
    GraftFunctions.register(df.sparkSession)
    df.withColumn("_dsir_z",
        gumbelKey(col(idCol), logWeightCol(col(textCol), model, tok), salt))
      .orderBy(col("_dsir_z").desc, col(idCol))
      .limit(k)
      .drop("_dsir_z")
  }
}
