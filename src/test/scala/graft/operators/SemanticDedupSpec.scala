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
}
