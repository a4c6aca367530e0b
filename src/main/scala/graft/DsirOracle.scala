package graft

import graft.operators.{Dsir, FrozenDsir}

/** DuckDB oracle SQL for q_dsir_logweight / q_dsir_resample — generated
  * from the SAME [[graft.operators.FrozenDsir]] literals the Spark
  * queries serve (the QmOracle/AnnOracles no-drift pattern) and the same
  * filler constant the Spark side augments with.
  *
  * What the oracles check: given the frozen scaled-long log-ratio table,
  * both engines agree on tokenize → unigram+bigram hash → exact integer
  * fold → log-weight, and on the Gumbel-top-k selected SET — the md5
  * uniform, the −ln(−ln u) key, the DECIMAL(25,9) quantization and the
  * (z DESC, id) tie-break all restate verbatim. FITTING (two bucket
  * count aggregations + driver log-ratios) is deliberately not restated
  * — [[graft.FreezeDsir]] pins its output and DsirSpec checks its
  * properties. */
object DsirOracle {

  /** Shared prefix: augmentation → filtered token array → unigram ++
    * bigram feature stream → exact scaled-long fold → per-doc log_w.
    * Token/bigram restatements are the proven q_quality_model_score /
    * q_bigram_logprob forms. */
  private def scoredCte: String = {
    val m = FrozenDsir.model
    val w = m.weightsScaled.mkString("[", ",", "]") + "::BIGINT[]"
    val filler = QmOracle.fillerSuffix
    require(!filler.contains("'"), "filler must be quote-free")
    s"WITH d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN text || '$filler' ELSE text END AS text FROM documents), " +
      "tk AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),'\\s+'), x -> x <> '') AS t FROM d), " +
      "ft AS (SELECT doc_id, unnest(list_concat(t, CASE WHEN len(t) < 2 THEN [] ELSE " +
      "list_transform(range(1, len(t)), i -> t[i]||' '||t[i+1]) END)) AS f FROM tk), " +
      s"w AS (SELECT $w AS w), " +
      s"pt AS (SELECT doc_id, w[CAST(CAST(concat('0x', substr(md5(f),1,8)) AS BIGINT) % ${m.dim} AS INT) + 1] AS wt FROM ft, w), " +
      "sw AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS s FROM pt GROUP BY doc_id), " +
      "scored AS (SELECT tk.doc_id AS doc_id, len(t) + greatest(len(t) - 1, 0) AS n_features, " +
      s"CAST(COALESCE(sw.s, 0) AS DOUBLE) / ${Dsir.WeightScale.toDouble} AS log_w " +
      "FROM tk LEFT JOIN sw ON tk.doc_id = sw.doc_id)"
  }

  /** Oracle for the scoring scan: (doc_id, n_features, log_w). */
  def dsirLogWeight: String =
    scoredCte +
      " SELECT doc_id, CAST(n_features AS BIGINT) AS n_features, log_w " +
      "FROM scored ORDER BY doc_id"

  /** Oracle for Gumbel-top-k resampling: the k largest z = ⌊log_w⌋₉ +
    * ⌊−ln(−ln(md5-uniform))⌋₉ (⌊·⌋₉ = DECIMAL(25,9) quantization, the
    * engine-parity discipline), ties broken by doc_id. */
  def dsirResample(k: Int, salt: String): String = {
    require(!salt.contains("'"), "salt must be quote-free")
    scoredCte +
      ", keyed AS (SELECT doc_id, log_w, " +
      "CAST(CAST(log_w AS DECIMAL(25,9)) + CAST(-ln(-ln((CAST(CAST(concat('0x', " +
      s"substr(md5('$salt' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)) " +
      "AS DECIMAL(25,9)) AS DOUBLE) AS z FROM scored) " +
      s"SELECT doc_id, log_w, z FROM keyed ORDER BY z DESC, doc_id LIMIT $k"
  }
}
