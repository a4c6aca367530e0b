package graft

import graft.operators.{FrozenQualityModel, QualityModel}

/** DuckDB oracle SQL for q_quality_model_score — generated from the SAME
  * [[graft.operators.FrozenQualityModel]] literals the Spark query
  * serves (the AnnOracles no-drift pattern), and from the SAME filler
  * constant the Spark side augments with.
  *
  * What the oracle checks: given the frozen scaled-long weight table,
  * both engines agree BIT-EXACTLY on tokenize → hash → integer fold →
  * logit → gate decision for every document. Exactness is by
  * construction: the fold is a sum of longs (order-independent), and
  * the only float ops are one division chain and one literal add on
  * identical operands. TRAINING (logistic regression) is deliberately
  * not restated — it is iterative and not SQL-expressible; determinism
  * and distillation accuracy are spec-checked (QualityModelSpec) and
  * [[graft.FreezeQm]] pins its output. */
object QmOracle {

  /** English filler appended to even-id documents: supplies the two
    * gate signals the synthetic corpus lacks (≥ 2 distinct English
    * stopwords; ≥ 50 tokens) without disturbing the rules it already
    * passes — so gopherPass(augmented) is a balanced, learnable label
    * (even ids pass, odd ids fail). Repeated 3× ⇒ 66 filler tokens. */
  val fillerSuffix: String =
    (" the quick brown fox jumps over the lazy dog and it was good" +
      " for you that this is here with all of them") * 3

  private def d(x: Double): String = java.lang.Double.toString(x)

  /** The oracle restatement of the scoring scan over the augmented
    * documents table: (doc_id, n_tokens, logit, predicted). */
  def qualityModelScore: String = {
    val m = FrozenQualityModel.model
    val w = m.weightsScaled.mkString("[", ",", "]") + "::BIGINT[]"
    val scale = QualityModel.WeightScale
    // '' never appears in the filler (letters and spaces only) — safe to
    // embed as a single-quoted SQL literal
    require(!fillerSuffix.contains("'"), "filler must be quote-free")
    s"WITH d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN text || '$fillerSuffix' ELSE text END AS text FROM documents), " +
      "tk AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),'\\s+'), x -> x <> '') AS t FROM d), " +
      s"w AS (SELECT $w AS w), " +
      s"pt AS (SELECT doc_id, w[CAST(CAST(concat('0x', substr(md5(tok),1,8)) AS BIGINT) % ${m.dim} AS INT) + 1] AS wt " +
      "FROM (SELECT doc_id, unnest(t) AS tok FROM tk), w), " +
      "sw AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS s FROM pt GROUP BY doc_id), " +
      s"scored AS (SELECT tk.doc_id, len(t) AS n_tokens, " +
      s"${d(m.bias)} + (CAST(COALESCE(sw.s, 0) AS DOUBLE) / ${d(scale.toDouble)}) / CAST(greatest(len(t), 1) AS DOUBLE) AS logit " +
      "FROM tk LEFT JOIN sw ON tk.doc_id = sw.doc_id) " +
      "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, logit, " +
      "logit >= 0 AS predicted FROM scored ORDER BY doc_id"
  }
}
