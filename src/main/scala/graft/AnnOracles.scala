package graft

import graft.operators.FrozenAnn

/** DuckDB oracle SQL for the frozen-artifact ANN queries — generated
  * from the SAME [[graft.operators.FrozenAnn]] literals the Spark
  * queries probe, so the two engines can never drift on the artifact
  * (the piiClasses / htmlStripStages no-drift pattern).
  *
  * What the oracle checks: given the frozen codebooks/centroids, both
  * engines must agree on encode → reconstruct → asymmetric-score →
  * argmax end to end (IDs only in the output: per-candidate cosine GAPS
  * dwarf cross-engine float drift, the q_ann_top1 argument — and
  * exact-tie candidates, e.g. two corpus rows with identical PQ codes,
  * reconstruct identically in both engines so the c_id tie-break
  * agrees). TRAINING (k-means) is deliberately not restated: it is not
  * SQL-expressible; determinism + recall of training are spec-checked in
  * SimilaritySpec, and [[graft.FreezeAnn]] pins its output here. */
object AnnOracles {

  /** Exact decimal of the float's DOUBLE value: `Double.toString`
    * round-trips, and DuckDB's decimal→double parse is correctly
    * rounded, so both engines score with bit-identical centroid
    * values (Spark widens the same floats to double in the kernel). */
  private def d(f: Float): String = java.lang.Double.toString(f.toDouble)

  private def dlist(a: Array[Float]): String = a.map(d).mkString("[", ",", "]")

  /** Coarse centroid table as a DOUBLE[][] literal; position l+1 holds
    * list l (FreezeAnn asserts the ids are contiguous 0..n-1). */
  private def coarseLit: String =
    FrozenAnn.coarse.sortBy(_._1).map(c => dlist(c._2))
      .mkString("[", ",", "]") + "::DOUBLE[][]"

  private def pqLit: String =
    FrozenAnn.pqIndex.codebooks.map(book =>
      book.map(dlist).mkString("[", ",", "]"))
      .mkString("[", ",", "]") + "::DOUBLE[][][]"

  /** The frozen coarse centroids as reusable CTEs (`co(cents)`,
    * `ls(l)`) for composed oracles that embed a semantic-assignment
    * rung (q_corpus_pipeline_semantic). */
  def coarseCtes: String =
    s"co AS (SELECT $coarseLit AS cents), " +
      s"ls AS (SELECT unnest(range(0, ${FrozenAnn.coarse.length})) AS l)"

  /** [[coarseCtes]] with the codebook PROJECTED through the engine's own
    * integer-exact JL fold ([[graft.operators.Similarity
    * .projectCentroids]] — the same code the projectTo flag runs), so a
    * composed oracle can restate the semantic rung in projected space.
    * The projected components are exact integers (|acc| ≪ 2²⁴), so the
    * float literal round-trips bit-exactly into DuckDB's doubles. */
  def coarseCtesProjected(outDim: Int): String = {
    val proj = graft.operators.Similarity.projectCentroids(
      FrozenAnn.coarse, outDim)
    val lit = proj.sortBy(_._1).map(c => dlist(c._2))
      .mkString("[", ",", "]") + "::DOUBLE[][]"
    s"co AS (SELECT $lit AS cents), " +
      s"ls AS (SELECT unnest(range(0, ${proj.length})) AS l)"
  }

  /** Full-precision double view of the embeddings table. */
  private val evCte =
    "ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  /** Probe view: vec_id < 20, full precision — matches the registered
    * queries' probe set. */
  private val prCte =
    "pr AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pvec FROM embeddings WHERE vec_id < 20)"

  /** PQ encode (per-subspace argmax over the codebook, cosine DESC then
    * position ASC — Similarity.pqEncode's (−cos, pos) struct sort) and
    * reconstruct (concatenated coded centroids) as CTEs ending in
    * `rec(vec_id, rvec)`. */
  private def pqRecCtes: String = {
    val m = FrozenAnn.pqIndex.m
    val sub = FrozenAnn.pqIndex.subDim
    val k = FrozenAnn.pqIndex.k
    s"cb AS (SELECT $pqLit AS b), " +
      s"sp AS (SELECT unnest(range(0, $m)) AS s), " +
      s"ps AS (SELECT unnest(range(0, $k)) AS p), " +
      "enc AS (SELECT e.vec_id, sp.s, ps.p, " +
      s"list_cosine_similarity(list_transform(list_slice(e.embedding, sp.s*$sub+1, sp.s*$sub+$sub), " +
      "x -> CAST(x AS DOUBLE)), b[sp.s+1][ps.p+1]) AS cs " +
      "FROM embeddings e, sp, ps, cb WHERE ps.p < len(b[sp.s+1])), " +
      "codes AS (SELECT vec_id, s, p FROM (SELECT vec_id, s, p, " +
      "ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY cs DESC, p) AS rk FROM enc) WHERE rk = 1), " +
      "rec AS (SELECT vec_id, flatten(list(cent ORDER BY s)) AS rvec FROM " +
      "(SELECT c.vec_id, c.s, b[c.s+1][c.p+1] AS cent FROM codes c, cb) GROUP BY vec_id)"
  }

  /** Nearest-`keep` coarse lists per row (cosine DESC, list ASC — the
    * assignLists ordering), over `cents` from the `co` CTE. */
  private def assignCte(name: String, keep: Int, filter: String): String =
    s"$name AS (SELECT vec_id, l FROM (SELECT e.vec_id, ls.l, " +
      "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY " +
      "list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), cents[ls.l+1]) DESC, ls.l) AS rk " +
      s"FROM embeddings e, ls, co$filter) WHERE rk <= $keep)"

  private def top1Tail(scoreCte: String): String =
    scoreCte +
      " SELECT q_id, c_id AS nn_id FROM (SELECT q_id, c_id, " +
      "ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cs DESC, c_id) AS rk FROM sc) " +
      "WHERE rk = 1 ORDER BY q_id"

  /** q_ann_pq_top1: encode the whole corpus with the frozen PQ codebook,
    * reconstruct, score full-precision probes against reconstructions
    * (asymmetric distance), take the top-1 id per probe. (Join+window
    * form, not a correlated scalar subquery — the correlated form over a
    * flatten-bearing CTE segfaults DuckDB 1.0.0.) */
  def pqTop1: String =
    s"WITH $pqRecCtes, $prCte, " +
      top1Tail("sc AS (SELECT pr.vec_id AS q_id, r.vec_id AS c_id, " +
        "list_cosine_similarity(pr.pvec, r.rvec) AS cs " +
        "FROM pr, rec r WHERE r.vec_id <> pr.vec_id)")

  /** q_ann_ivf_top1: corpus rows spill into their 2 nearest frozen
    * coarse lists, probes visit their 4 nearest; candidates = list
    * equi-join; exact full-precision scoring. */
  def ivfTop1: String = {
    val n = FrozenAnn.coarse.length
    s"WITH co AS (SELECT $coarseLit AS cents), " +
      s"ls AS (SELECT unnest(range(0, $n)) AS l), " +
      assignCte("ca", keep = 2, filter = "") + ", " +
      assignCte("pa", keep = 4, filter = " WHERE e.vec_id < 20") + ", " +
      s"$evCte, " +
      "cand AS (SELECT DISTINCT pa.vec_id AS q_id, ca.vec_id AS c_id FROM pa JOIN ca ON pa.l = ca.l " +
      "WHERE pa.vec_id <> ca.vec_id), " +
      top1Tail("sc AS (SELECT cand.q_id, cand.c_id, list_cosine_similarity(pv.v, cv.v) AS cs " +
        "FROM cand JOIN ev pv ON pv.vec_id = cand.q_id JOIN ev cv ON cv.vec_id = cand.c_id)")
  }

  /** q_ann_ivfpq_top1: the FAISS-IVFPQ shape — frozen coarse lists prune
    * WHICH rows each probe scores, frozen PQ codes compress WHAT those
    * rows cost; scoring reconstructs from codes (asymmetric distance). */
  def ivfPqTop1: String = {
    val n = FrozenAnn.coarse.length
    s"WITH co AS (SELECT $coarseLit AS cents), " +
      s"ls AS (SELECT unnest(range(0, $n)) AS l), " +
      assignCte("ca", keep = 2, filter = "") + ", " +
      assignCte("pa", keep = 4, filter = " WHERE e.vec_id < 20") + ", " +
      s"$pqRecCtes, $prCte, " +
      "cand AS (SELECT DISTINCT pa.vec_id AS q_id, ca.vec_id AS c_id FROM pa JOIN ca ON pa.l = ca.l " +
      "WHERE pa.vec_id <> ca.vec_id), " +
      top1Tail("sc AS (SELECT cand.q_id, cand.c_id, list_cosine_similarity(pr.pvec, r.rvec) AS cs " +
        "FROM cand JOIN pr ON pr.vec_id = cand.q_id JOIN rec r ON r.vec_id = cand.c_id)")
  }

  /** q_hard_negatives_ivfpq_indexed at FULL probe: every coarse list is
    * visited, so candidate coverage is complete and the list-assignment
    * pruning drops out of the restatement — ground truth is the
    * PQ-reconstructed cosine ranking (the asymmetric distance the index
    * probe scores) with the query and its two planted positives (q+1,
    * q+2) excluded BEFORE the rank. */
  def ivfPqHardNegatives(k: Int): String =
    s"WITH $pqRecCtes, $prCte, " +
      "sc AS (SELECT pr.vec_id AS q_id, r.vec_id AS c_id, " +
      "list_cosine_similarity(pr.pvec, r.rvec) AS cs " +
      "FROM pr, rec r WHERE r.vec_id <> pr.vec_id " +
      "AND r.vec_id <> pr.vec_id + 1 AND r.vec_id <> pr.vec_id + 2) " +
      "SELECT q_id, CAST(rk AS BIGINT) AS rank, c_id AS neg_id FROM " +
      "(SELECT q_id, c_id, ROW_NUMBER() OVER " +
      "(PARTITION BY q_id ORDER BY cs DESC, c_id) AS rk FROM sc) " +
      s"WHERE rk <= $k ORDER BY q_id, rank"

  /** The embeddings table's dimension — the LSH plane matrix is a pure
    * function of (nPlanes, dim, seed), so the oracle pins the testdata
    * table's dim (the Spark side adapts to any dim at runtime). */
  private val LshDim = 64
  private val LshPlanes = 16
  private val LshSeed = 42

  /** The ±1 hyperplane matrix of VectorSimUtil.planeWeights — the SAME
    * murmur3 parity bits, emitted as literals. */
  private def planesLit: String =
    (0 until LshPlanes).map { p =>
      (0 until LshDim).map { dd =>
        val i = p * LshDim + dd
        if ((org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, LshSeed) & 1) == 1) "1.0"
        else "-1.0"
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]") + "::DOUBLE[][]"

  /** q_ann_lsh_top1: 16-bit sign signature (dot > 0 per plane), 4×4-bit
    * chunk keys, candidates share any chunk key, exact scoring —
    * Similarity.approxTopKLSH restated over the literal plane matrix. */
  def lshTop1: String =
    s"WITH pl AS (SELECT $planesLit AS w), " +
      s"sg AS (SELECT vec_id, list_transform(range(0, $LshPlanes), p -> CASE WHEN " +
      "list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), w[p+1]) > 0 THEN 1 ELSE 0 END) AS bits " +
      "FROM embeddings, pl), " +
      "cj AS (SELECT unnest(range(0, 4)) AS j), " +
      "ch AS (SELECT vec_id, j, bits[j*4+1] + 2*bits[j*4+2] + 4*bits[j*4+3] + 8*bits[j*4+4] AS ckey FROM sg, cj), " +
      "cand AS (SELECT DISTINCT b.vec_id AS q_id, a.vec_id AS c_id FROM ch a JOIN ch b ON a.j = b.j AND a.ckey = b.ckey " +
      "WHERE b.vec_id < 20 AND a.vec_id <> b.vec_id), " +
      s"$evCte, " +
      top1Tail("sc AS (SELECT cand.q_id, cand.c_id, list_cosine_similarity(pv.v, cv.v) AS cs " +
        "FROM cand JOIN ev pv ON pv.vec_id = cand.q_id JOIN ev cv ON cv.vec_id = cand.c_id)")

  /** q_semantic_dedup: SemDeDup over the jitter-augmented embeddings
    * table, restated end to end — primary assignment to the frozen
    * coarse centroids (cosine DESC, list ASC: the assignLists ordering),
    * within-cluster exact pairs at the threshold, recursive-CTE
    * connected components, then the keep-the-outlier survivor rule
    * (lowest primary-centroid cosine per group, ties by id). Same
    * augmentation as q_embedding_dedup_resolved (jittered +1e6-id copies
    * of every 10th vector plant real duplicate groups). `asg`/`j` are
    * MATERIALIZED: the recursive CC re-evaluates inlined CTE chains. */
  def semanticDedup(threshold: Double): String = {
    val n = FrozenAnn.coarse.length
    s"WITH RECURSIVE co AS (SELECT $coarseLit AS cents), " +
      s"ls AS (SELECT unnest(range(0, $n)) AS l), " +
      "base AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
      "aug AS MATERIALIZED (SELECT vec_id, v FROM base " +
      "UNION ALL SELECT vec_id + 1000000, " +
      "list_transform(v, (x, i) -> x + 0.025 * (CASE WHEN " +
      "substr(md5(CAST(vec_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)), 1, 1) <= '7' " +
      "THEN 1.0 ELSE -1.0 END)) FROM base WHERE vec_id % 10 = 0), " +
      "asg AS MATERIALIZED (SELECT vec_id, l, cc FROM (SELECT a.vec_id, ls.l, " +
      "list_cosine_similarity(a.v, cents[ls.l+1]) AS cc, " +
      "ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY " +
      "list_cosine_similarity(a.v, cents[ls.l+1]) DESC, ls.l) AS rk " +
      "FROM aug a, ls, co) WHERE rk = 1), " +
      "j AS MATERIALIZED (SELECT ax.vec_id AS id_a, ay.vec_id AS id_b " +
      "FROM asg ax JOIN asg ay ON ax.l = ay.l AND ax.vec_id < ay.vec_id " +
      "JOIN aug x ON x.vec_id = ax.vec_id JOIN aug y ON y.vec_id = ay.vec_id " +
      s"WHERE list_cosine_similarity(x.v, y.v) >= $threshold), " +
      "e AS (SELECT id_a AS src, id_b AS dst FROM j UNION ALL SELECT id_b, id_a FROM j), " +
      "r AS (SELECT src AS id, src AS label FROM e " +
      "UNION SELECT e.dst AS id, r.label FROM r JOIN e ON e.src = r.id), " +
      "lab AS (SELECT id, min(label) AS label FROM r GROUP BY id), " +
      "ranked AS (SELECT lab.id, ROW_NUMBER() OVER (PARTITION BY lab.label " +
      "ORDER BY asg.cc ASC, lab.id ASC) AS rk " +
      "FROM lab JOIN asg ON asg.vec_id = lab.id), " +
      "kept AS (SELECT vec_id FROM aug WHERE vec_id NOT IN " +
      "(SELECT id FROM ranked WHERE rk > 1)) " +
      "SELECT (SELECT count(*) FROM aug) AS n_vecs, " +
      "(SELECT count(*) FROM j) AS n_pairs, " +
      "(SELECT count(DISTINCT label) FROM lab) AS n_groups, " +
      "(SELECT count(*) FROM kept) AS n_kept, " +
      "(SELECT CAST(COALESCE(sum(vec_id), 0) AS BIGINT) FROM kept) AS kept_id_sum"
  }
}
