package graft

import graft.operators.{FrozenNgramLm, NgramLm}

/** DuckDB oracle SQL for q_ngram_lm_score (and the LM CTE fragment the
  * q_corpus_pipeline_ppl oracle composes) — generated from the SAME
  * [[graft.operators.FrozenNgramLm]] literals the Spark queries serve
  * (the QmOracle/DsirOracle no-drift pattern) and the same filler
  * constant the Spark side augments with.
  *
  * What the oracles check: given the frozen scaled-long trigram LM,
  * both engines agree BIT-EXACTLY on tokenize → sentinel pad → trigram/
  * bigram/unigram lookup → Stupid-Backoff COALESCE chain → exact
  * integer fold → mean per-token log-score (and, in the pipeline form,
  * on the integer gate decision). The backoff decision itself restates
  * as three LEFT JOINs + one COALESCE (absent key ≡ NULL ≡ backoff, on
  * both engines); the only float op is one division chain on identical
  * integer operands. TRAINING (three bounded n-gram count aggregations
  * + driver log-ratios) is deliberately not restated —
  * [[FreezeNgramLm]] pins its output, NgramLmSpec checks its
  * properties. */
object NgramLmOracle {

  private def values(ks: Array[String], vs: Array[Long]): String =
    ks.zip(vs).map { case (k, v) =>
      require(!k.contains("'"), s"gram key must be quote-free: $k")
      s"('$k',$v)"
    }.mkString("(VALUES ", ", ", ")")

  /** The LM scoring CTE chain over a source CTE `src(doc_id, ft)` where
    * `ft` is the FILTERED token list (normTokens semantics): emits
    * nlm_pad … nlm_sw(doc_id, score) with score = the exact scaled-long
    * Stupid-Backoff fold (docs with 0 tokens are absent — COALESCE to 0
    * downstream). Composable: the standalone oracle and the pipeline
    * CTE both call this, so the restatement cannot drift. */
  def scoreCteChain(src: String): String = {
    val m = FrozenNgramLm.model
    s"nlm_pad AS (SELECT doc_id, len(ft) AS n, list_concat(['<s>','<s>'], ft) AS p FROM $src), " +
      "nlm_pos AS (SELECT doc_id, unnest(range(1, n + 1)) AS i, p FROM nlm_pad WHERE n > 0), " +
      "nlm_g AS (SELECT doc_id, p[i+2] AS uni, p[i+1] || ' ' || p[i+2] AS bi, " +
      "p[i] || ' ' || p[i+1] || ' ' || p[i+2] AS tri FROM nlm_pos), " +
      s"nlm_ut AS (SELECT * FROM ${values(m.uniKeys, m.uniVals)} AS t(k, v)), " +
      s"nlm_bt AS (SELECT * FROM ${values(m.biKeys, m.biVals)} AS t(k, v)), " +
      s"nlm_tt AS (SELECT * FROM ${values(m.triKeys, m.triVals)} AS t(k, v)), " +
      s"nlm_sc AS (SELECT g.doc_id, COALESCE(tt.v, ${m.backoffScaled} + " +
      s"COALESCE(bt.v, ${m.backoffScaled} + COALESCE(ut.v, ${m.unkScaled}))) AS s " +
      "FROM nlm_g g LEFT JOIN nlm_tt tt ON g.tri = tt.k " +
      "LEFT JOIN nlm_bt bt ON g.bi = bt.k LEFT JOIN nlm_ut ut ON g.uni = ut.k), " +
      "nlm_sw AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM nlm_sc GROUP BY doc_id)"
  }

  /** The oracle restatement of [[NgramLm.perplexityBuckets]] over the
    * same augmented documents table (global stratum, nBuckets = 3,
    * deterministic sample at `sampleFraction`): score exactly as
    * [[ngramLmScore]], take the md5-prefix sample (the SAME key-pure
    * predicate the engine's `Sampling.deterministicSample` compiles
    * to), extract cut_j = the sample's mean at descending rank
    * ⌈j·n/3⌉ (integer arithmetic `(j·c + 2) // 3`, the engine's exact
    * ceil formula), and assign bucket = 1 + #cuts strictly above the
    * doc's mean — value-threshold semantics, ties land in the upper
    * bucket on both engines because the comparison runs on identical
    * IEEE doubles built from identical integers. */
  def pplBuckets(sampleThresholdHex: String): String =
    "WITH " + pplBucketsCtes(sampleThresholdHex) + " " +
      "SELECT doc_id, n_tokens, score_scaled, mean_log, CAST(bucket AS BIGINT) AS bucket, " +
      "CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket_label " +
      "FROM bk ORDER BY doc_id"

  /** The CTE chain alone, ending in
    * `bk(doc_id, n_tokens, score_scaled, mean_log, bucket)` — shared by
    * the standalone q_ppl_buckets oracle and composed restatements
    * (q_bucket_mix). */
  def pplBucketsCtes(sampleThresholdHex: String): String = {
    val filler = QmOracle.fillerSuffix
    require(!filler.contains("'"), "filler must be quote-free")
    s"d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN text || '$filler' ELSE text END AS text FROM documents), " +
      "nlm_ft AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),'\\s+'), x -> x <> '') AS ft FROM d), " +
      scoreCteChain("nlm_ft") + ", " +
      "sc AS (SELECT f.doc_id, CAST(len(f.ft) AS BIGINT) AS n_tokens, " +
      "CAST(COALESCE(sw.score, 0) AS BIGINT) AS score_scaled, " +
      s"CAST(COALESCE(sw.score, 0) AS DOUBLE) / (${NgramLm.WeightScale.toDouble} * CAST(greatest(len(f.ft), 1) AS DOUBLE)) AS mean_log " +
      "FROM nlm_ft f LEFT JOIN nlm_sw sw ON f.doc_id = sw.doc_id), " +
      s"samp AS (SELECT * FROM sc WHERE substr(md5(CAST(doc_id AS VARCHAR)),1,8) < '$sampleThresholdHex'), " +
      "rk AS (SELECT mean_log, row_number() OVER (ORDER BY mean_log DESC, doc_id) AS rn FROM samp), " +
      "cntc AS (SELECT count(*) AS c FROM samp), " +
      "c1 AS (SELECT mean_log AS v FROM rk JOIN cntc ON rn = (1 * c + 2) // 3), " +
      "c2 AS (SELECT mean_log AS v FROM rk JOIN cntc ON rn = (2 * c + 2) // 3), " +
      "bk AS (SELECT sc.*, 1 + COALESCE(CAST(mean_log < (SELECT v FROM c1) AS INT), 0) " +
      "+ COALESCE(CAST(mean_log < (SELECT v FROM c2) AS INT), 0) AS bucket FROM sc)"
  }

  /** Oracle for q_bucket_mix: the bucket chain above feeding the
    * token-share mix restatement (the q_token_mix rate arithmetic over
    * bucket_label strata with n_tokens as the mass column). */
  def bucketMix(sampleThresholdHex: String): String =
    "WITH " + pplBucketsCtes(sampleThresholdHex) + ", " +
      "lbl AS (SELECT doc_id, n_tokens, CASE bucket WHEN 1 THEN 'head' " +
      "WHEN 2 THEN 'middle' ELSE 'tail' END AS bl FROM bk), " +
      "shares(s, w) AS (VALUES ('head', 0.6), ('middle', 0.3), ('tail', 0.1)), " +
      "hist AS (SELECT bl AS s, CAST(sum(n_tokens) AS BIGINT) AS toks " +
      "FROM lbl WHERE bl IN (SELECT s FROM shares) GROUP BY bl HAVING sum(n_tokens) > 0), " +
      "c AS (SELECT min(toks / w) AS c FROM hist JOIN shares USING (s)), " +
      "rates AS (SELECT s, round(least(1.0, c * w / toks), 4) AS r " +
      "FROM hist JOIN shares USING (s) CROSS JOIN c), " +
      "th AS (SELECT s, CASE WHEN r >= 1.0 THEN 'g' ELSE " +
      "lpad(lower(hex(CAST(least(round(r * 4294967296.0), 4294967295) AS BIGINT))),8,'0') END AS th FROM rates) " +
      "SELECT l.bl AS bucket_label, count(*) AS n_sampled, " +
      "CAST(sum(l.n_tokens) AS BIGINT) AS tok_sum, " +
      "CAST(sum(l.doc_id) AS BIGINT) AS id_checksum " +
      "FROM lbl l JOIN th ON l.bl = th.s " +
      "WHERE substr(md5(CAST(l.doc_id AS VARCHAR)),1,8) < th.th " +
      "GROUP BY l.bl ORDER BY bucket_label"

  /** [[ngramLmScore]] over the MULTILINGUAL fixture with the
    * script-aware tokenizer: the frozen (English-trained) model scores
    * zh/ja/ru/ar token streams through the SAME exact Stupid-Backoff
    * COALESCE chain — non-Latin grams miss every table and fold the
    * unk/backoff integers, en text folds its real scores; both engines
    * agree bit-exactly either way (the threading proof for the LM rung). */
  def ngramLmScoreMl(fixtureValues: String, mlToksSql: String): String =
    s"WITH mld AS (SELECT doc_id, text FROM $fixtureValues), " +
      s"nlm_ft AS (SELECT doc_id, $mlToksSql AS ft FROM mld), " +
      scoreCteChain("nlm_ft") + " " +
      "SELECT f.doc_id, CAST(len(f.ft) AS BIGINT) AS n_tokens, " +
      "CAST(COALESCE(sw.score, 0) AS BIGINT) AS score_scaled, " +
      s"CAST(COALESCE(sw.score, 0) AS DOUBLE) / (${NgramLm.WeightScale.toDouble} * CAST(greatest(len(f.ft), 1) AS DOUBLE)) AS mean_log " +
      "FROM nlm_ft f LEFT JOIN nlm_sw sw ON f.doc_id = sw.doc_id ORDER BY f.doc_id"

  /** The oracle restatement of the scoring scan over the augmented
    * documents table: (doc_id, n_tokens, score_scaled, mean_log). */
  def ngramLmScore: String = {
    val filler = QmOracle.fillerSuffix
    require(!filler.contains("'"), "filler must be quote-free")
    s"WITH d AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN text || '$filler' ELSE text END AS text FROM documents), " +
      "nlm_ft AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),'\\s+'), x -> x <> '') AS ft FROM d), " +
      scoreCteChain("nlm_ft") + " " +
      "SELECT f.doc_id, CAST(len(f.ft) AS BIGINT) AS n_tokens, " +
      "CAST(COALESCE(sw.score, 0) AS BIGINT) AS score_scaled, " +
      s"CAST(COALESCE(sw.score, 0) AS DOUBLE) / (${NgramLm.WeightScale.toDouble} * CAST(greatest(len(f.ft), 1) AS DOUBLE)) AS mean_log " +
      "FROM nlm_ft f LEFT JOIN nlm_sw sw ON f.doc_id = sw.doc_id ORDER BY f.doc_id"
  }
}
