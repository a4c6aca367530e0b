package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GraftFunctions, TextAnalysis, Tok}

/** Model-based document quality scoring: a hashed-feature LINEAR
  * classifier (the fastText-style scorer modern LLM data pipelines use
  * as their learned quality gate — e.g. the classifier stage of
  * CCNet/DCLM-shaped pipelines) plus in-library distributed logistic-
  * regression training that can DISTILL the Gopher rule gates
  * ([[TextAnalysis.gopherPass]]) into one narrow scoring scan.
  *
  * Serving shape (the 100 TB story): scoring is a SINGLE narrow
  * codegen'd projection — tokens fold through a literal weight table via
  * the engine-portable md5 feature hash; no shuffle, no join, no UDF.
  * The weights travel as 1e9-SCALED LONGS, so the per-document fold is
  * an exact integer sum: order-independent, bit-identical across
  * engines (a double fold would make the score depend on token order
  * evaluation and break cross-engine comparison at the ulp level).
  *
  * Training shape: full-batch logistic regression, one bounded-output
  * aggregation pair per iteration (per-doc logits from exact long sums,
  * per-feature gradients through DECIMAL accumulation), driver state =
  * `dim` doubles. Deterministic end to end: weights re-quantize to
  * scaled longs at every iteration boundary, so every per-row float is
  * a pure function of exact integers. */
object QualityModel {

  /** Fixed-point scale for the weight table: logits carry ~9 exact
    * decimal digits per token weight, and the worst-case fold
    * |w|·scale·nTokens ≈ 1e10·1e5 stays far inside Long. */
  val WeightScale: Long = 1000000000L

  /** A trained hashed-linear model. `weightsScaled(j)` is
    * round(w_j · [[WeightScale]]); `bias` stays a plain double (added
    * once per document, after the exact fold). */
  case class Model(dim: Int, weightsScaled: Array[Long], bias: Double) {
    require(weightsScaled.length == dim, s"weight table length ${weightsScaled.length} != dim $dim")
    def weights: Array[Double] = weightsScaled.map(_.toDouble / WeightScale)
  }

  /** Engine-portable hashed feature index of a token: the first 8 md5
    * hex chars as an integer, mod `dim` — Spark `conv(…, 16, 10)`,
    * DuckDB `CAST('0x' || … AS BIGINT)`, bit-identical (the md5-prefix
    * discipline the samplers use, taken to an integer). */
  def featureIndex(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** Exact scaled-long weight fold over a document's tokens — the narrow
    * core both [[score]] and the training loop share. */
  private def foldScaled(toks: Column, model: Model): Column = {
    val w = lit(model.weightsScaled)
    aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(w, (featureIndex(t, model.dim) + 1).cast("int")))
  }

  /** The scoring logit as a bare Column over raw text — the gate form a
    * pipeline folds into its quality-scan conjunction (one more narrow
    * codegen'd term, no extra stage). logit = bias + (Σ_t w[h(t)]) / n
    * (mean token weight + bias; empty docs score the bare bias);
    * sigmoid(logit) is monotone in logit, so thresholding logit IS
    * thresholding the probability. Caller must have run
    * [[GraftFunctions.register]] on the session (score/prepare do). */
  def logitCol(text: Column, model: Model, tok: Tok = Tok.Latin): Column = {
    val toks = tok.tokens(text)
    lit(model.bias) +
      (foldScaled(toks, model).cast("double") / lit(WeightScale.toDouble)) /
        greatest(size(toks), lit(1)).cast("double")
  }

  /** Per-document quality scores: (idCol, n_tokens, logit, predicted) —
    * [[logitCol]] plus the token count and the `predicted` = logit ≥ 0
    * gate decision. The plan is one narrow projection over the scan —
    * no Exchange (spec-asserted). At 100 TB this is the cheapest
    * possible model gate: strictly less work than the rule conjunction
    * it distills. */
  def score(df: DataFrame, textCol: String, idCol: String,
      model: Model, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val toks = tok.tokens(col(textCol))
    val logit = logitCol(col(textCol), model, tok)
    df.select(col(idCol), size(toks).as("n_tokens"), logit.as("logit"),
      (logit >= 0).as("predicted"))
  }

  /** Full-batch logistic-regression training of the hashed-linear model
    * against a 0/1 label column. Features: per-token hashed counts,
    * normalized by document length (matching [[score]]'s mean-weight
    * fold). Gradients accumulate through DECIMAL(30,15), so training is
    * bit-deterministic on any partitioning; weights re-quantize to
    * scaled longs each iteration (the served artifact's exact form).
    *
    * Scale: featurization is one explode + count shuffle, materialized
    * ONCE; each iteration is a per-doc long-sum aggregation and a
    * per-feature gradient aggregation — both outputs bounded (|docs|
    * rows and `dim` rows), driver state `dim` doubles. */
  def train(df: DataFrame, textCol: String, idCol: String, labelCol: String,
      dim: Int = 256, iters: Int = 40, lr: Double = 2.0,
      tok: Tok = Tok.Latin): Model = {
    GraftFunctions.register(df.sparkSession)
    val base = df.select(col(idCol).as("id"),
      col(labelCol).cast("double").as("y"),
      tok.tokens(col(textCol)).as("toks"))
    // hashed count features, one explode+agg, reused every iteration
    val feats = Dedup.materialize(base
      .select(col("id"), col("y"),
        greatest(size(col("toks")), lit(1)).cast("double").as("n"),
        explode_outer(col("toks")).as("t"))
      .withColumn("j", coalesce(featureIndex(col("t"), dim), lit(0L)))
      .groupBy(col("id"), col("y"), col("n"), col("j"))
      .agg(count(col("t")).cast("long").as("c")))
    val nDocs = base.count().toDouble
    var w = Array.fill(dim)(0L)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val wl = lit(w)
      // per-doc logit from the EXACT long fold (c·w_scaled), then err
      val perDoc = feats
        .withColumn("wx", element_at(wl, (col("j") + 1).cast("int")) * col("c"))
        .groupBy(col("id"), col("y"), col("n"))
        .agg(sum(col("wx")).as("swx"))
        .withColumn("logit",
          lit(b) + (col("swx").cast("double") / lit(WeightScale.toDouble)) / col("n"))
        .withColumn("err",
          lit(1.0) / (lit(1.0) + exp(-col("logit"))) - col("y"))
      val gRows = feats.join(perDoc.select(col("id"), col("err")), Seq("id"))
        .groupBy(col("j"))
        .agg(sum((col("err") * col("c") / col("n")).cast(DecimalType(30, 15)))
          .cast("double").as("g"))
        .collect()
      val gb = perDoc
        .agg(sum(col("err").cast(DecimalType(30, 15))).cast("double"))
        .first().getDouble(0)
      val wNew = w.map(_.toDouble / WeightScale)
      gRows.foreach { r =>
        val j = r.getLong(0).toInt
        wNew(j) -= lr * r.getDouble(1) / nDocs
      }
      w = wNew.map(x => math.round(x * WeightScale))
      b -= lr * gb / nDocs
      it += 1
    }
    Model(dim, w, b)
  }

  /** [[train]] with labels distilled from the Gopher rule conjunction —
    * the cheap-model-learns-the-rules pattern: run the (regex-heavy)
    * rule gate once on a sample, train the linear scorer on its verdicts,
    * serve the scorer (strictly narrower plan) on the full corpus. */
  def distillGopherGate(df: DataFrame, textCol: String, idCol: String,
      dim: Int = 256, iters: Int = 40, lr: Double = 2.0): Model =
    train(df.withColumn("_gopher_y",
        TextAnalysis.gopherPass(col(textCol)).cast("int")),
      textCol, idCol, "_gopher_y", dim, iters, lr)
}
