package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** SemDeDup (cluster-bounded semantic dedup) specs: within-cluster pair
  * enumeration vs the exact all-pairs ground truth, the keep-the-outlier
  * survivor rule (NOT min-id), the assignKeep boundary-recall knob, and
  * determinism. Fixture: 3 explicit centroids in dim 4, planted duplicate
  * groups inside clusters plus one true pair straddling a centroid
  * boundary (primary clusters differ ⇒ invisible at assignKeep = 1). */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private val tau = 0.99

  private val centroids: Array[(Int, Array[Float])] = Array(
    0 -> Array(1f, 0f, 0f, 0f),
    1 -> Array(0f, 1f, 0f, 0f),
    2 -> Array(0f, 0f, 1f, 0f))

  /** ids 1,2: dup group in cluster 0 where id 1 (the MIN id) is CLOSER to
    * the centroid than id 2 — the outlier rule must drop id 1 and keep
    * id 2, the opposite of a min-id survivor. ids 4,5,6: a 3-chain group
    * in cluster 1 (survivor 6, the farthest). ids 8,9: cosine 0.9987 but
    * primary clusters 0 vs 1 — the boundary pair. 3 and 7: singletons. */
  private val vecs: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(1f, 0.05f, 0f, 0f),
    2L -> Array(1f, 0.06f, 0f, 0f),
    3L -> Array(0.9f, 0.3f, 0f, 0f),
    4L -> Array(0f, 1f, 0.02f, 0f),
    5L -> Array(0f, 1f, 0.021f, 0f),
    6L -> Array(0f, 1f, 0.04f, 0f),
    7L -> Array(0f, 0f, 1f, 0f),
    8L -> Array(1f, 0.96f, 0f, 0f),
    9L -> Array(0.961f, 1f, 0f, 0f))

  private def df = vecs.toDF("vec_id", "embedding")

  // ── Scala brute-force reference (double math, same widening as the
  //    kernel) ─────────────────────────────────────────────────────────
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def primary(v: Array[Float]): Int =
    centroids.map { case (l, c) => (-cos(v, c), l) }.min._2

  private def exactPairs: Set[(Long, Long)] = (for {
    (ia, va) <- vecs; (ib, vb) <- vecs
    if ia < ib && cos(va, vb) >= tau
  } yield (ia, ib)).toSet

  /** Union-find groups over the given pairs; survivor per group = min by
    * (primary-centroid cosine, id); returns the loser ids. */
  private def bruteLosers(pairs: Set[(Long, Long)]): Set[Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val byRoot = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(find)
    val vecMap = vecs.toMap
    byRoot.values.flatMap { members =>
      val keep = members.minBy { id =>
        (cos(vecMap(id), centroids(primary(vecMap(id)))._2), id)
      }
      members - keep
    }.toSet
  }

  test("semanticDupPairs (assignKeep=1) == exact pairs restricted to a shared primary cluster") {
    val got = Dedup.semanticDupPairs(df, "embedding", "vec_id", centroids, tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = exactPairs.filter { case (a, b) =>
      primary(vecs.toMap.apply(a)) == primary(vecs.toMap.apply(b))
    }
    assert(got == expected)
    assert(exactPairs.contains((8L, 9L)) && !got.contains((8L, 9L)),
      "fixture must plant a boundary-straddling pair invisible at keep=1")
  }

  test("assignKeep=2 recovers the boundary-straddling pair (full exact recall here)") {
    val got = Dedup.semanticDupPairs(df, "embedding", "vec_id", centroids, tau,
      assignKeep = 2).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == exactPairs)
  }

  test("staged list-groups == single pass (the bounded-disk plan), incl. multi-assign straddle") {
    // The list axis partitions the within-list pair construction exactly
    // — hash-splitting the lists into sequential groups must reproduce
    // the single-pass pair set. assignKeep=2 is the interesting case: a
    // pair sharing two lists can see them land in DIFFERENT groups, and
    // the cross-group anti-join must still emit it exactly once.
    def pairs(ps: org.apache.spark.sql.DataFrame) = ps
      .select($"id_a", $"id_b", ($"cosine" * 1e9).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    Seq(1, 2).foreach { keep =>
      val assigned = Dedup.materialize(Similarity.assignListsAuto(
        df, "embedding", "vec_id", centroids, "id", "vec", keep))
      val single = pairs(
        Dedup.semanticPairsOn(assigned, 3, tau, keep, None))
      // k=3 on 3 lists: xxhash64 scatters them over the groups
      val staged = pairs(
        Dedup.semanticPairsStaged(assigned, 3, tau, keep, 3))
      assert(single.nonEmpty)
      assert(staged == single,
        s"keep=$keep: only-single=${single -- staged} " +
          s"only-staged=${staged -- single}")
      // duplicates must not slip through when shared lists straddle
      val ids = staged.toSeq.map(p => (p._1, p._2))
      assert(ids.size == ids.toSet.size, "staged union must be pair-distinct")
    }
  }

  test("removeSemanticDuplicates keeps the farthest-from-centroid member, NOT min-id") {
    val kept = Dedup.removeSemanticDuplicates(df, "embedding", "vec_id", centroids, tau)
      .select("vec_id").as[Long].collect().toSet
    val expected = vecs.map(_._1).toSet -- bruteLosers(exactPairs.filter { case (a, b) =>
      primary(vecs.toMap.apply(a)) == primary(vecs.toMap.apply(b))
    })
    assert(kept == expected)
    // the discriminating cases: id 1 < id 2 but id 2 is farther out ⇒ 1 goes;
    // 3-chain {4,5,6} keeps only its farthest member 6
    assert(!kept.contains(1L) && kept.contains(2L))
    assert(!kept.contains(4L) && !kept.contains(5L) && kept.contains(6L))
  }

  test("removeSemanticDuplicates with assignKeep=2 resolves the boundary group too") {
    val kept = Dedup.removeSemanticDuplicates(df, "embedding", "vec_id", centroids, tau,
      assignKeep = 2).select("vec_id").as[Long].collect().toSet
    assert(kept == vecs.map(_._1).toSet -- bruteLosers(exactPairs))
    // |v9| > |v8| ⇒ 9 is farther from its centroid ⇒ 8 goes
    assert(!kept.contains(8L) && kept.contains(9L))
  }

  test("deterministic across runs") {
    def run() = Dedup.removeSemanticDuplicates(df, "embedding", "vec_id", centroids, tau)
      .select("vec_id").as[Long].collect().toSet
    assert(run() == run())
  }

  // ── Oversized-cluster guard: one dominant cluster, maxClusterSize far
  //    below its membership — the block-split must bound per-task volume
  //    WITHOUT changing a single pair ───────────────────────────────────

  /** 12 vectors all primary-assigned to cluster 0, fanned so some pairs
    * clear τ = 0.99 and some don't (angles 0.04·i off the axis). */
  private val dominant: Seq[(Long, Array[Float])] =
    (1L to 12L).map(i => i -> Array(1f, 0.04f * i, 0f, 0f))
  private def domDf = dominant.toDF("vec_id", "embedding")

  test("maxClusterSize block-split: pairs identical to the unsplit plan on a dominant cluster") {
    val vm = dominant.toMap
    assert(dominant.forall { case (_, v) => primary(v) == 0 },
      "fixture must concentrate every vector in one cluster")
    val expected = (for {
      (ia, va) <- dominant; (ib, vb) <- dominant
      if ia < ib && cos(va, vb) >= tau
    } yield (ia, ib)).toSet
    assert(expected.nonEmpty && expected.size < dominant.size * (dominant.size - 1) / 2,
      "fixture must mix above- and below-threshold pairs")
    val split = Dedup.semanticDupPairs(domDf, "embedding", "vec_id", centroids,
      tau, maxClusterSize = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(split.length == split.toSet.size, "no duplicated pairs under splitting")
    assert(split.toSet == expected)
    val unsplit = Dedup.semanticDupPairs(domDf, "embedding", "vec_id", centroids, tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(split.toSet == unsplit)
  }

  test("semanticPairBlocks: exact split — every within-list pair in exactly one block, volume bounded per block") {
    val assigned = Similarity.assignListsAuto(
      domDf, "embedding", "vec_id", centroids, "id", "vec", 1)
    val blocks = Dedup.semanticPairBlocks(assigned, maxClusterSize = 3)
    // Exact-split property: the ordered filter leaves each of the
    // C(12,2) = 66 unordered pairs exactly once across all blocks.
    import org.apache.spark.sql.functions.{col, least, greatest}
    val kept = blocks
      .where(col("_ca") =!= col("_cb") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .as[(Long, Long)].collect()
    assert(kept.length == 66, s"every pair exactly once, got ${kept.length}")
    assert(kept.toSet.size == 66)
    // Boundedness: per-block volume is |chunk_a|·|chunk_b| — derive chunk
    // sizes from the diagonal blocks and check the cross blocks multiply
    // out, i.e. no block concentrates the quadratic work of the list.
    val counts = blocks.groupBy("_ca", "_cb").count()
      .as[(Int, Int, Long)].collect()
      .map { case (x, y, n) => (x, y) -> n }.toMap
    val m = 4 // ceil(12 / 3)
    val chunkSize = (0 until m).map(c =>
      c -> math.sqrt(counts.getOrElse((c, c), 0L).toDouble).round).toMap
    assert(chunkSize.values.sum == 12, s"chunks partition the list: $chunkSize")
    assert(chunkSize.values.count(_ > 0) >= 2,
      s"the split must actually engage: $chunkSize")
    counts.foreach { case ((x, y), n) =>
      assert(n == chunkSize(x) * chunkSize(y),
        s"block ($x,$y) holds $n rows, want ${chunkSize(x)} * ${chunkSize(y)}")
    }
  }

  test("removeSemanticDuplicates: survivors unchanged under block-splitting") {
    def survivors(cap: Int) = Dedup.removeSemanticDuplicates(
      domDf, "embedding", "vec_id", centroids, tau, maxClusterSize = cap)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors(3) == survivors(20000))
  }

  test("block-splitting composes with assignKeep > 1 (multi-list dedup intact)") {
    val got = Dedup.semanticDupPairs(df, "embedding", "vec_id", centroids, tau,
      assignKeep = 2, maxClusterSize = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size,
      "cross-list duplicates must still collapse under splitting")
    assert(got.toSet == exactPairs)
  }
}
