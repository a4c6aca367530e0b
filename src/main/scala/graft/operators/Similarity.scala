package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — north-star
  * mandate: brute-force cosine top-k as the exact baseline, sign-LSH
  * (random hyperplane, Charikar 2002) bucketing as the scale path.
  *
  * The similarity math runs as native codegen'd kernels
  * ([[graft.functions.CosineSim]] / [[graft.functions.SignSignature]]);
  * the equivalent `zip_with`/`aggregate` Column forms are kept here as
  * the reference semantics (parity pinned by SimilaritySpec). No UDFs,
  * no driver-side loops.
  */
object Similarity {

  /** Cast a float vector to doubles (stable arithmetic + exact fold). */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length vectors (left fold, deterministic
    * order). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** Cosine similarity of two float vectors (zero-vector-safe) — the
    * pure-Column reference form. The operators below use the native
    * [[graft.functions.CosineSim]] kernel, which computes the identical
    * left-fold arithmetic inside whole-stage codegen (parity pinned by
    * SimilaritySpec). */
  def cosineCol(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dotCol(ad, bd) / greatest(normCol(ad) * normCol(bd), lit(1e-12))
  }

  /** Exact brute-force cosine top-k: every probe scored against the whole
    * corpus, per-probe ranking via window. The probe set is broadcast, so
    * the corpus scan is a single narrow pass — the right baseline shape
    * when |probes| ≪ |corpus| (the corpus never shuffles; the only
    * shuffle is the per-probe ranking, sized |probes| × |corpus| rows
    * pruned to (id, score) pairs, further cut by a per-partition
    * local top-k before the exchange). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, vecCol: String,
      idCol: String, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val p = probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // Repartition the corpus scan: cosine scoring must parallelize even
    // when the corpus is a single parquet file.
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
      .repartition(Dedup.cpuParallelism(corpus), col("c_id"))
    val scored = c.join(broadcast(p), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.functions.GraftFunctions.cosineSim(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  // ── sign-LSH (random hyperplane) scale path ──────────────────────────

  /** Deterministic ±1 hyperplanes (seeded — plans must be reproducible
    * across executors and runs; no runtime randomness in a query plan). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Column] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(array(Seq.fill(dim)(lit(if (rng.nextBoolean()) 1.0 else -1.0)): _*))
  }

  /** Pack sign bits of plane dot products into a long signature. Cosine-
    * similar vectors agree on most sign bits (P[bit agree] = 1 − θ/π). */
  def signSignature(v: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val vd = asDouble(v)
    planes(nPlanes, dim, seed).zipWithIndex.map { case (p, i) =>
      when(dotCol(vd, p) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Near-duplicate pairs by cosine ≥ threshold: sign-LSH bucket join for
    * candidates (a pair is a candidate when any 4-bit chunk of the 16-bit
    * signature matches — pigeonhole covers Hamming ≤ 3 exactly), then
    * exact cosine verification. Candidate generation is an equi-join on
    * (chunk, chunk_key): hash-partitioned, never all-pairs. */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val nPlanes = 16
    // Keyed repartition before the signature stage: parallelism must not
    // depend on the input's file count.
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(Dedup.cpuParallelism(df), col("id"))
    val sig = vecs.select(col("id"),
      graft.functions.GraftFunctions.signSignature(col("vec"), nPlanes, 42).as("sig"))
    // Candidates travel as bare ID pairs; vectors are re-joined per side
    // for the exact-cosine verify (the arrays never ride the bucket shuffle).
    val chunked = sig.select(col("id"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sig"), j * 4).bitwiseAND(lit(0xfL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_key")
    val candidates = chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_key") === col("b.chunk_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("cosine", graft.functions.GraftFunctions.cosineSim(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** EXACT cosine pairs ≥ threshold: upper-triangle all-pairs scan with the
    * native [[graft.functions.CosineSim]] kernel. Quadratic by definition —
    * this is the exact ground-truth baseline (the same role
    * [[graft.operators.Dedup.exactJaccardPairs]] plays for text, except
    * dense low-dim embeddings admit no exact prefix-filter: every
    * coordinate is nonzero, so sparse-join pruning degenerates to
    * all-pairs anyway). [[cosinePairs]] is the approximate-recall scale
    * path; at moderate thresholds (θ ≳ 60°) sign-LSH recall is inherently
    * partial — measured 10/14 at τ=0.45 on the test corpus — which is why
    * the oracle-checked driver query uses THIS exact form. */
  def cosinePairsExact(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(Dedup.cpuParallelism(df), col("id"))
    val a = vecs.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val b = vecs.select(col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineSim(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Nearest-`keep` centroid lists per row as a NARROW expression: the
    * centroid table rides the plan as literals, each row scores all
    * centroids in one codegen'd projection and keeps the `keep` best —
    * no crossJoin, no per-row window shuffle (round 1 assigned via
    * crossJoin+window: an |corpus|×nLists exchange on the 100 TB path).
    * Ordering matches the window form exactly: cosine desc, list asc.
    * Output: (idAs, vecAs, list) — one row per kept list. */
  private[operators] def assignLists(df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[(Int, Array[Float])], idAs: String, vecAs: String,
      keep: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val scored = array(centroids.map { case (list, c) =>
      struct(
        (-graft.functions.GraftFunctions.cosineSim(
          col(vecAs), array(c.map(lit(_)): _*))).as("neg"),
        lit(list).as("list"))
    }: _*)
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
      .withColumn("_near", slice(array_sort(scored), 1, keep))
      .select(col(idAs), col(vecAs),
        explode(transform(col("_near"), x => x.getField("list"))).as("list"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer of
    * `nLists` centroids partitions the corpus into inverted lists; each
    * probe scores ONLY the `nProbe` lists whose centroids it is closest
    * to — the classic IVF trade (visit nProbe/nLists of the corpus).
    *
    * Centroids are chosen deterministically from the corpus (first vector
    * of each hash stratum) in one pass; production k-means centroids drop
    * into the same shape. Building the index collects the nLists centroid
    * rows to the driver ONCE (the k-means-training shape — centers are
    * driver state by construction) and embeds them as plan literals, so
    * list assignment is a narrow codegen'd projection: the only shuffles
    * in the whole plan are the candidate dedup and the final per-probe
    * ranking. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, vecCol: String,
      idCol: String, k: Int = 10, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def cosine(a: Column, b: Column) = graft.functions.GraftFunctions.cosineSim(a, b)
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(Dedup.cpuParallelism(corpus), col("id"))

    // deterministic one-pass centroids: first vector per hash stratum
    val wStratum = Window.partitionBy(col("stratum")).orderBy(col("id"))
    val centroids: Array[(Int, Array[Float])] = vecs
      .withColumn("stratum", pmod(hash(col("id")), lit(nLists)))
      .withColumn("rn", row_number().over(wStratum))
      .where(col("rn") === 1)
      .select(col("stratum").as("list"), col("vec").as("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    if (centroids.isEmpty)
      // empty corpus ⇒ empty result, with the output schema intact
      return probes.select(col(idCol).as("q_id"), col(idCol).as("c_id"),
        lit(0.0).as("cosine"), lit(1).as("rank")).limit(0)

    val corpusLists = assignLists(vecs, "vec", "id", centroids, "c_id", "c_vec", keep = 1)
    val probeLists = assignLists(
      probes.select(col(idCol).as("id"), col(vecCol).as("vec")),
      "vec", "id", centroids, "q_id", "q_vec", keep = nProbe)

    // probes meet only their nProbe lists — equi-join on the list id
    val scored = corpusLists
      .join(broadcast(probeLists), Seq("list"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
      .dropDuplicates("q_id", "c_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Approximate top-k: probes only score candidates sharing a signature
    * chunk (the IVF-ish restriction of [[bruteForceTopK]] — each probe
    * visits ~|corpus| / 2⁴ of the data per chunk instead of all of it). */
  def approxTopKLSH(corpus: DataFrame, probes: DataFrame, vecCol: String,
      idCol: String, k: Int = 10, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val nPlanes = 16
    def chunked(df: DataFrame, idAs: String) =
      df.select(col(idCol).as(idAs),
        graft.functions.GraftFunctions.signSignature(col(vecCol), nPlanes, 42).as("sig"))
        .select(col(idAs),
          posexplode(array((0 until 4).map(j =>
            shiftright(col("sig"), j * 4).bitwiseAND(lit(0xfL))): _*)))
        .withColumnRenamed("pos", "chunk")
        .withColumnRenamed("col", "chunk_key")
    // Candidate IDs first (probe side broadcast), vectors re-joined after
    // the dedup — the corpus vectors never ride the bucket join.
    val cand = chunked(corpus, "c_id")
      .join(broadcast(chunked(probes, "q_id")), Seq("chunk", "chunk_key"))
      .where(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id")
      .dropDuplicates("q_id", "c_id")
    val scored = cand
      .join(broadcast(probes.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))), Seq("q_id"))
      .join(corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec")), Seq("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.functions.GraftFunctions.cosineSim(col("q_vec"), col("c_vec")).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
