package graft.operators

import org.apache.spark.sql.functions.{greatest, least, lit, transform}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Similarity-search specs: exact cosine math, brute-force top-k, and the
  * sign-LSH scale path (candidates verified exactly ⇒ no false positives;
  * recall checked against brute force on real testdata). */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("cosineCol: orthogonal = 0, identical = 1, opposite = -1") {
    val a = Array(1f, 0f, 0f)
    val b = Array(0f, 1f, 0f)
    val df = Seq((a, a, b, a.map(-_))).toDF("a", "a2", "b", "neg")
    val r = df.select(
      Similarity.cosineCol($"a", $"a2").as("same"),
      Similarity.cosineCol($"a", $"b").as("orth"),
      Similarity.cosineCol($"a", $"neg").as("opp")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("native cosine_sim kernel == Column cosineCol bit-for-bit on real embeddings") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val diff = a.join(b, $"ia" < $"ib")
      .select(
        Similarity.cosineCol($"va", $"vb").as("col_form"),
        graft.functions.GraftFunctions.cosineSim($"va", $"vb").as("native"))
      .where($"col_form" =!= $"native")
    assert(diff.count() == 0)
  }

  test("bruteForceTopK returns k best neighbors, ranked, excluding self") {
    val vecs = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)),
      (4L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 1), "embedding", "vec_id", k = 2)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(top.map(_._2).toSeq == Seq(2L, 3L)) // nearest then next, never self/opposite
  }

  test("hardNegatives: positives and self excluded BEFORE ranking, k true negatives per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" < 5)
    val positives = q.select($"vec_id".as("q_id"), ($"vec_id" + 1L).as("pos_id"))
    val got = Similarity.hardNegatives(emb, q, positives, "embedding", "vec_id", k = 4)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == 4, s"query $qid must get exactly k negatives")
      assert(!rows.exists(_._2 == qid), s"query $qid surfaced itself")
      assert(!rows.exists(_._2 == qid + 1), s"query $qid surfaced its positive")
    }
    // exclusion-before-rank: the result equals the brute-force ranking
    // with the excluded ids removed and the REMAINDER re-ranked — never a
    // post-hoc filter of a k-sized list
    val brute = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", k = 6)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
    val expect = brute.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.sortBy(_._3).map(_._2).filterNot(_ == qid + 1).take(4).toSeq
    }
    byQ.foreach { case (qid, rows) =>
      assert(rows.sortBy(_._3).map(_._2).toSeq == expect(qid),
        s"query $qid ranking disagrees with the filtered brute-force truth")
    }
  }

  test("hardNegativesIvf: equals brute force under full probe; exclusion holds at partial probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" < 5)
    val positives = q.select($"vec_id".as("q_id"), ($"vec_id" + 1L).as("pos_id"))
    val cents = Similarity.trainCoarseCentroids(emb, "embedding", "vec_id", nLists = 8)
    // full probe (nProbe = nLists): candidate coverage is complete, so
    // the IVF form must EQUAL the oracle-checked brute-force form
    val full = Similarity.hardNegativesIvf(emb, q, positives, "embedding",
        "vec_id", cents, k = 4, nProbe = cents.length)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.hardNegatives(emb, q, positives, "embedding",
        "vec_id", k = 4)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full == brute, s"full-probe IVF must be exact: ${full -- brute} / ${brute -- full}")
    // partial probe: still k rows per query, self and positives never
    // surface (the over-fetch + anti-join contract)
    val part = Similarity.hardNegativesIvf(emb, q, positives, "embedding",
        "vec_id", cents, k = 4, nProbe = 3)
      .select("q_id", "c_id").as[(Long, Long)].collect()
    part.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == 4, s"query $qid must still get k negatives")
      assert(!rows.exists(_._2 == qid) && !rows.exists(_._2 == qid + 1),
        s"query $qid surfaced itself or its positive at partial probe")
    }
  }

  test("banded sign-LSH cosinePairs == exact ground truth at a moderate threshold") {
    // threshold-derived banding (signBands) must reach FULL recall on the
    // fixture even at τ=0.45, where the round-2 fixed 4×4-bit chunking
    // managed 10/14 — cosinePairsExact is the test-side ground truth.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosinePairsExact(emb, "embedding", "vec_id", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosinePairs(emb, "embedding", "vec_id", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain pairs above 0.45")
    assert(lsh == exact, s"missed=${exact -- lsh} spurious=${lsh -- exact}")
  }

  test("cosinePairs staged band-groups == single pass (the bounded-disk plan)") {
    // Band partitioning is exact: forcing the staged plan (forceGroups)
    // on a fixture far below the guard's rows floor must reproduce the
    // single-pass verified pair set — with rounded cosines equal too,
    // since both plans verify with the same kernel. τ=0.45 gives the
    // widest banding (b=337) and real cross-group collision mass.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select($"id_a", $"id_b", ($"cosine" * 1e9).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val single = pairs(Similarity.cosinePairs(emb, "embedding", "vec_id", 0.45))
    val staged = pairs(Similarity.cosinePairsImpl(
      emb, "embedding", "vec_id", 0.45, 0.999, 42, forceGroups = Some(3)))
    assert(single.nonEmpty)
    assert(staged == single,
      s"only-single=${single -- staged} only-staged=${staged -- single}")
    // a group count above the band-axis width degenerates gracefully
    val wide = pairs(Similarity.cosinePairsImpl(
      emb, "embedding", "vec_id", 0.99, 0.999, 42, forceGroups = Some(7)))
    val wideSingle = pairs(
      Similarity.cosinePairs(emb, "embedding", "vec_id", 0.99))
    assert(wide == wideSingle)
    // PILOT-CALIBRATED composition (round 16): group 0 runs alone as the
    // measured pilot, the rest re-chunks on the measured peak — the
    // pilot ∪ rest union with the pilot-keys anti-join must still equal
    // the single pass exactly
    val calibrated = pairs(Similarity.cosinePairsImpl(
      emb, "embedding", "vec_id", 0.45, 0.999, 42, forceGroups = Some(3),
      forcePilotCalib = true))
    assert(calibrated == single,
      s"only-single=${single -- calibrated} only-calib=${calibrated -- single}")
  }

  test("pilot-calibrated chunk arithmetic: measured feedback shrinks k, pessimism clamped") {
    import graft.operators.Dedup
    // the measured cosine shape: 259 GB projected over 83 GB usable
    // would stage k=7; a pilot group (1/7 of the estimate) that measures
    // ~6 GB instead of ~37 GB re-chunks the rest toward the single pass
    val est = 259e9; val usable = 83L * 1000 * 1000 * 1000
    assert(Dedup.spillChunkCount(est, usable) == 7)
    val kRest = Dedup.pilotCalibratedChunks(est, usable,
      pilotShare = 1.0 / 7, measuredPeakBytes = 6L * 1000 * 1000 * 1000)
    assert(kRest == 2, s"got $kRest") // 222GB×0.162×1.5 = 54GB -> 2 groups
    // a pilot that measures AT projection keeps the uncalibrated plan
    // (×1.5 safety makes it MORE conservative, never less)
    assert(Dedup.pilotCalibratedChunks(est, usable,
      1.0 / 7, 37L * 1000 * 1000 * 1000) >= 6)
    // sampler miss (peak 0) clamps at the 0.05 floor, not zero
    assert(Dedup.pilotCalibratedChunks(est, usable, 1.0 / 7, 0L) ==
      Dedup.spillChunkCount(est * (6.0 / 7) * 0.05 * 1.5, usable))
    // unknown estimate degenerates to the single pass
    assert(Dedup.pilotCalibratedChunks(0.0, usable, 0.5, 1000L) == 1)
  }

  test("signBands: recall bound holds, plane budget respected, selectivity grows with threshold") {
    Seq(0.45, 0.7, 0.8, 0.9, 0.95).foreach { tau =>
      val (r, b) = Similarity.signBands(tau)
      val p1 = 1.0 - math.acos(tau) / math.Pi
      assert(r >= 4 && r <= 48 && b >= 1 && r * b <= 4096, s"($r,$b) at $tau")
      assert(1.0 - math.pow(1.0 - math.pow(p1, r), b.toDouble) >= 0.999,
        s"recall bound violated at tau=$tau with ($r,$b)")
    }
    // wider bands (better pruning) as the threshold rises
    assert(Similarity.signBands(0.95)._1 > Similarity.signBands(0.7)._1)
    // background collision odds (b·2⁻ʳ per uncorrelated pair) collapse by
    // orders of magnitude between the moderate and near-dup regimes
    def bg(tau: Double): Double = {
      val (r, b) = Similarity.signBands(tau)
      b * math.pow(2.0, -r)
    }
    assert(bg(0.9) < bg(0.45) / 100, s"bg(0.9)=${bg(0.9)} bg(0.45)=${bg(0.45)}")
  }

  test("sign-LSH cosinePairs: full recall on planted near-duplicates (design point)") {
    // near-dup regime (τ=0.99): planted near-identical vectors must all be
    // found — the derived banding puts per-pair miss probability ≤ 1e-3 at
    // the threshold and far lower above it.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = emb.where($"vec_id" < 5)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * lit(1.0f) + lit(0.001f)).as("embedding"))
    val df = emb.select("vec_id", "embedding").union(planted)
    val found = Similarity.cosinePairs(df, "embedding", "vec_id", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(found.contains((i, i + 100000L)), s"planted near-dup $i missed")
    }
  }

  test("ivfTopK: exact scores, and strong top-1 recall at nProbe/nLists = 1/4") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.where($"vec_id" < 50)
    // corpusSpill = 3: the fixture is near-uniform on the sphere — IVF's
    // hardest case (no cluster structure for the quantizer to exploit), so
    // the recall target needs one extra multi-assignment replica over the
    // production default of 2. Clustered corpora hit the bound at spill 1–2.
    val ivf = Similarity.ivfTopK(emb, probes, "embedding", "vec_id",
      k = 1, nLists = 16, nProbe = 4, lloydIters = 3, corpusSpill = 3)
      .select("q_id", "c_id", "cosine").as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(ivf.length == 50)
    // scores are EXACT cosines (verified candidates), only coverage is approximate
    val bruteAll = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 500)
      .select("q_id", "c_id", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, c, cos) => assert(math.abs(bruteAll((q, c)) - cos) < 1e-12) }
    // recall: Lloyd-trained centroids must recover ≥ 90% of true top-1s
    // while visiting only 4/16 lists (hash-stratum seeds alone managed ~15)
    val hits = ivf.count { case (q, c, _) => brute(q) == c }
    assert(hits >= 45, s"top-1 recall too low: $hits/50")
  }

  test("ivf assignLists is a narrow plan (no Exchange) and matches the window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, row_number}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = emb.where($"vec_id" < 8).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
    val assigned = Similarity.assignLists(
      emb, "embedding", "vec_id", centroids, "c_id", "c_vec", keep = 3)
    // narrow: list assignment must not shuffle (round 1 used crossJoin+window)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment shuffles:\n$plan")
    // equivalence vs the window-ranked broadcast-join form
    val centDf = centroids.toSeq.map { case (l, v) => (l, v) }.toDF("list", "centroid")
    val w = Window.partitionBy(col("c_id")).orderBy(
      graft.functions.GraftFunctions.cosineSim(col("c_vec"), col("centroid")).desc,
      col("list"))
    val viaWindow = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
      .crossJoin(broadcast(centDf))
      .withColumn("crank", row_number().over(w))
      .where($"crank" <= 3)
      .select($"c_id", $"list").as[(Long, Int)].collect().toSet
    val viaNarrow = assigned.select($"c_id", $"list").as[(Long, Int)].collect().toSet
    assert(viaNarrow == viaWindow)
  }

  test("approxTopKLSH ranks candidates it scores identically to brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.where($"vec_id" < 5)
    val approx = Similarity.approxTopKLSH(emb, probes, "embedding", "vec_id", k = 3)
      .select("q_id", "c_id", "cosine").as[(Long, Long, Double)].collect()
    assert(approx.nonEmpty)
    val brute = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 500)
      .select("q_id", "c_id", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // approximate scores are EXACT cosines (verification is exact); only
    // the candidate set is approximate
    approx.foreach { case (q, c, cos) =>
      assert(math.abs(brute((q, c)) - cos) < 1e-12)
    }
  }

  test("sq8: codes clamp to [0,255], constant dims code to 0, decode error within bound") {
    val vecs = Seq(
      (1L, Array(0f, 5f, -2f, 7f)),
      (2L, Array(10f, 5f, 2f, -3f)),
      (3L, Array(5f, 5f, 0f, 2f))).toDF("vec_id", "embedding")
    val idx = Similarity.sq8Train(vecs, "embedding")
    assert(idx.lo.toSeq == Seq(0.0, 5.0, -2.0, -3.0))
    assert(idx.hi.toSeq == Seq(10.0, 5.0, 2.0, 7.0))
    val enc = Similarity.sq8Encode(vecs, "embedding", "vec_id", idx)
    val codes = enc.as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.flatten.forall(c => c >= 0 && c <= 255))
    assert(codes.values.forall(_(1) == 0), "constant dimension must code to 0")
    // round-trip error ≤ half a quantization step per dimension
    val decoded = enc.select($"id",
      Similarity.sq8Decode($"codes", idx).as("d")).as[(Long, Seq[Double])].collect().toMap
    val originals = vecs.as[(Long, Seq[Float])].collect().toMap
    for ((id, d) <- decoded; i <- d.indices) {
      val step = (idx.hi(i) - idx.lo(i)) / 255.0
      assert(math.abs(d(i) - originals(id)(i)) <= step / 2 + 1e-9,
        s"id=$id dim=$i decoded=${d(i)} orig=${originals(id)(i)}")
    }
  }

  test("sq8TopK: strong top-1 recall against the full-precision brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.where($"vec_id" < 20)
    val idx = Similarity.sq8Train(emb, "embedding")
    val enc = Similarity.sq8Encode(emb, "embedding", "vec_id", idx)
    val approx = Similarity.sq8TopK(enc, probes, "embedding", "vec_id", idx, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    val recall = approx.count { case (q, c) => exact(q) == c }.toDouble / exact.size
    assert(recall >= 0.9, s"sq8 top-1 recall $recall < 0.9")
  }

  test("pq: deterministic dense codes, centroid exactness, strong recall on clustered data") {
    // PQ's design regime: clustered vectors. 16 deterministic cluster
    // centers in 64 dims, 10 members each with tiny jitter.
    val nClusters = 16
    val dim = 64
    // near-orthogonal centers: cluster j dominates dim block [4j, 4j+4)
    // with a small deterministic background — unambiguous neighborhoods
    def center(j: Int, d: Int): Float =
      (if (d / 4 == j) 1.0 + 0.1 * math.sin(j * dim + d)
       else 0.05 * math.sin(j * dim + d)).toFloat
    val vecs = (for {
      j <- 0 until nClusters
      i <- 0 until 10
    } yield {
      val id = (j * 10 + i).toLong
      val v = Array.tabulate(dim)(d =>
        center(j, d) + 0.01f * math.sin(id * 4096 + d).toFloat)
      (id, v)
    }).toDF("vec_id", "embedding")

    // k over-provisioned vs the 16 true clusters: hash-stratum seeding
    // collides at k == nClusters (birthday) and merges subspace clusters
    val idx = Similarity.pqTrain(vecs, "embedding", "vec_id", m = 8, k = 32)
    assert(idx.subDim == 8 && idx.m == 8)
    val enc = Similarity.pqEncode(vecs, "embedding", "vec_id", idx)
    val codes = enc.as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(cs => cs.length == 8 &&
      cs.forall(c => c >= 0 && c < idx.k)))
    // deterministic: re-train + re-encode yields identical codes
    val codes2 = Similarity.pqEncode(vecs, "embedding", "vec_id",
      Similarity.pqTrain(vecs, "embedding", "vec_id", m = 8, k = 32))
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes == codes2)
    // reconstruction stays in the member's cluster cone
    val cosines = enc.join(vecs.select($"vec_id".as("id"), $"embedding"), Seq("id"))
      .select(graft.functions.GraftFunctions.cosineSim(
        Similarity.pqReconstruct($"codes", idx), $"embedding").as("c"))
      .as[Double].collect()
    assert(cosines.forall(_ >= 0.97),
      s"reconstruction must stay in the cluster cone, min=${cosines.min}")

    // Cluster-level top-1 agreement vs full-precision brute force. PQ
    // quantizes away WITHIN-cluster detail by design — every member of a
    // cluster encodes to (nearly) the same codes, so exact-id recall@1 is
    // structurally a tie-break lottery; what PQ must get right is the
    // NEIGHBORHOOD: the approx top-1 lives in the same cluster as the
    // true top-1.
    val probes = vecs.where($"vec_id" % 10 === 0)
    val approx = Similarity.pqTopK(enc, probes, "embedding", "vec_id", idx, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.bruteForceTopK(vecs, probes, "embedding", "vec_id", k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val clusterRecall = approx.count { case (q, c) =>
      exact(q) / 10 == c / 10
    }.toDouble / exact.size
    assert(clusterRecall >= 0.9, s"pq cluster-level recall $clusterRecall < 0.9")

    // dimension guard
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(vecs, "embedding", "vec_id", m = 7)
    }
  }

  test("ivfPqTopK: coarse pruning + code compression keep cluster-level recall") {
    // same near-orthogonal clustered fixture as the PQ test
    val nClusters = 16
    val dim = 64
    def center(j: Int, d: Int): Float =
      (if (d / 4 == j) 1.0 + 0.1 * math.sin(j * dim + d)
       else 0.05 * math.sin(j * dim + d)).toFloat
    val vecs = (for {
      j <- 0 until nClusters
      i <- 0 until 10
    } yield {
      val id = (j * 10 + i).toLong
      (id, Array.tabulate(dim)(d =>
        center(j, d) + 0.01f * math.sin(id * 4096 + d).toFloat))
    }).toDF("vec_id", "embedding")
    // coarse quantizer: the cluster centers themselves (the trained-once
    // shape — ivfTopK's seeding+Lloyd path produces the same artifact)
    val coarse = Array.tabulate(nClusters)(j =>
      (j, Array.tabulate(dim)(d => center(j, d))))
    val idx = Similarity.pqTrain(vecs, "embedding", "vec_id", m = 8, k = 32)
    val probes = vecs.where($"vec_id" % 10 === 0)
    val approx = Similarity.ivfPqTopK(vecs, probes, "embedding", "vec_id",
      coarse, idx, k = 1, nProbe = 2, corpusSpill = 2)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.bruteForceTopK(vecs, probes, "embedding", "vec_id", k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet, "every probe must get a result")
    val clusterRecall = approx.count { case (q, c) =>
      exact(q) / 10 == c / 10
    }.toDouble / exact.size
    assert(clusterRecall >= 0.9, s"ivf-pq cluster recall $clusterRecall < 0.9")
  }

  test("IVF×PQ index: fused one-pass build (no self-join), parquet round-trip probes identically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coarse = FrozenAnn.coarse
    val idx = FrozenAnn.pqIndex
    val probes = emb.where($"vec_id" < 20)
    // the build is ONE narrow pass: no join of two corpus scans (the
    // round-7 fusion — list assignment and PQ codes come off the same row)
    val index = Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", coarse, idx)
    val buildPlan = index.queryExecution.executedPlan.toString
    assert(!buildPlan.contains("Join"), s"fused build must not self-join:\n${buildPlan.take(1500)}")
    assert(!buildPlan.contains("Exchange hashpartitioning"),
      s"fused build must not shuffle the corpus:\n${buildPlan.take(1500)}")
    // persisted-artifact story: parquet round-trip probes identically to
    // the self-contained form (exactly the dedup band-index contract)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    index.write.mode("overwrite").parquet(s"$dir/index")
    val viaStored = Similarity.ivfPqTopKIndexed(
      spark.read.parquet(s"$dir/index"), probes, "embedding", "vec_id", coarse, idx, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val direct = Similarity.ivfPqTopK(emb, probes, "embedding", "vec_id", coarse, idx, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(direct.nonEmpty && viaStored == direct)
  }

  test("hardNegativesIvfPqIndexed: parquet round-trip identical, exclusion holds, full probe = reconstruction truth") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coarse = FrozenAnn.coarse
    val idx = FrozenAnn.pqIndex
    val q = emb.where($"vec_id" < 5)
    val positives = q.select($"vec_id".as("q_id"), ($"vec_id" + 1L).as("pos_id"))
    val index = Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", coarse, idx)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_hn").toString
    index.write.mode("overwrite").parquet(s"$dir/index")

    // the daily-mining shape: the stored artifact probes identically to
    // the in-memory build (the dedup band-index contract)
    val viaStored = Similarity.hardNegativesIvfPqIndexed(
      spark.read.parquet(s"$dir/index"), q, positives, "embedding", "vec_id",
      coarse, idx, k = 4, nProbe = coarse.length)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val viaBuilt = Similarity.hardNegativesIvfPqIndexed(
      index, q, positives, "embedding", "vec_id",
      coarse, idx, k = 4, nProbe = coarse.length)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaStored.nonEmpty && viaStored == viaBuilt)

    // exclusion-before-rank contract: k true negatives per query, never
    // the query itself or a positive — at full AND partial probe
    Seq(coarse.length, 3).foreach { nProbe =>
      val got = Similarity.hardNegativesIvfPqIndexed(
        spark.read.parquet(s"$dir/index"), q, positives, "embedding",
        "vec_id", coarse, idx, k = 4, nProbe = nProbe)
        .select("q_id", "c_id").as[(Long, Long)].collect()
      got.groupBy(_._1).foreach { case (qid, rows) =>
        assert(rows.length == 4, s"query $qid must get k negatives (nProbe=$nProbe)")
        assert(!rows.exists(_._2 == qid) && !rows.exists(_._2 == qid + 1),
          s"query $qid surfaced itself or its positive (nProbe=$nProbe)")
      }
    }

    // full probe = the PQ-reconstruction ground truth: ranking the
    // decoded index against full-precision probes with exclusions
    // applied before the rank (what the frozen-artifact oracle restates)
    val full = viaStored.groupBy(_._1).view.mapValues(
      _.toSeq.sortBy(_._3).map(_._2)).toMap
    val recon = Similarity.ivfPqTopKIndexed(
      spark.read.parquet(s"$dir/index"), q, "embedding", "vec_id",
      coarse, idx, k = 6, nProbe = coarse.length)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect()
    val expect = recon.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.sortBy(_._3).map(_._2).filterNot(_ == qid + 1).take(4).toSeq
    }
    full.foreach { case (qid, rows) =>
      assert(rows == expect(qid),
        s"query $qid disagrees with the filtered reconstruction truth")
    }
  }

  test("appendToIvfPqIndex: append == rebuild-on-union, replayed batch overwrites, compaction-style read") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val coarse = FrozenAnn.coarse
    val idx = FrozenAnn.pqIndex
    val a = emb.where($"vec_id" % 2 === 0)
    val b = emb.where($"vec_id" % 2 === 1)
    val probes = emb.where($"vec_id" < 20)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_app").toString

    // initial build is batch 0; the increment appends as batch 1 — the
    // existing partition is never read or rewritten
    Similarity.appendToIvfPqIndex(a, dir, "embedding", "vec_id", coarse, idx, batchId = 0)
    Similarity.appendToIvfPqIndex(b, dir, "embedding", "vec_id", coarse, idx, batchId = 1)
    val viaAppend = Similarity.ivfPqTopKIndexed(
      Similarity.loadIvfPqIndex(spark, dir), probes, "embedding", "vec_id",
      coarse, idx, k = 2)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val viaRebuild = Similarity.ivfPqTopKIndexed(
      Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", coarse, idx),
      probes, "embedding", "vec_id", coarse, idx, k = 2)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaAppend.nonEmpty && viaAppend == viaRebuild,
      "appended index must probe identically to a rebuild on the union")

    // replay safety: re-appending batch 1 overwrites its own partition —
    // no duplicate rows, identical probe
    Similarity.appendToIvfPqIndex(b, dir, "embedding", "vec_id", coarse, idx, batchId = 1)
    val afterReplay = Similarity.ivfPqTopKIndexed(
      Similarity.loadIvfPqIndex(spark, dir), probes, "embedding", "vec_id",
      coarse, idx, k = 2)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(afterReplay == viaRebuild)
    val rowCount = Similarity.loadIvfPqIndex(spark, dir).count()
    val expected = Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", coarse, idx).count()
    assert(rowCount == expected, s"replayed append must not duplicate rows: $rowCount vs $expected")
  }

  test("pqEncodeBroadcast == pqEncodeLiteral bit-for-bit (same codes) on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = FrozenAnn.pqIndex
    val lit = Similarity.pqEncodeLiteral(emb, "embedding", "vec_id", idx)
      .as[(Long, Seq[Int])].collect().toMap
    val bc = Similarity.pqEncodeBroadcast(emb, "embedding", "vec_id", idx)
      .as[(Long, Seq[Int])].collect().toMap
    assert(lit.nonEmpty && lit == bc)
  }

  test("assignListsBroadcast == assignLists on the frozen coarse centroids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val viaLit = Similarity.assignLists(
      emb, "embedding", "vec_id", FrozenAnn.coarse, "c_id", "c_vec", keep = 4)
      .select($"c_id", $"list").as[(Long, Int)].collect().toSet
    val viaBc = Similarity.assignListsBroadcast(
      emb, "embedding", "vec_id", FrozenAnn.coarse, "c_id", "c_vec", keep = 4)
      .select($"c_id", $"list").as[(Long, Int)].collect().toSet
    assert(viaLit.nonEmpty && viaBc == viaLit)
  }

  test("k=256 PQ: trains and encodes via the broadcast-join path, not a literal tree") {
    // 256-way codebooks are the standard PQ configuration; the literal
    // plan would be ~k codegen branches per subspace. The broadcast path
    // must (a) produce dense in-range codes, (b) carry the codebook as a
    // BroadcastNestedLoopJoin against one row, (c) plan no Exchange on
    // the corpus side.
    val dim = 8
    val vecs = (0 until 768).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = Similarity.pqTrain(vecs, "embedding", "vec_id", m = 2, k = 256, lloydIters = 1)
    assert(idx.k > Similarity.LiteralCentroidLimit,
      s"fixture must exercise the broadcast path, got k=${idx.k}")
    val enc = Similarity.pqEncode(vecs, "embedding", "vec_id", idx)
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"k=256 encode must broadcast the codebook:\n${plan.take(2000)}")
    // BroadcastExchange (the codebook ship) is expected; a SHUFFLE of the
    // corpus (Exchange hashpartitioning/rangepartitioning) is not
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"k=256 encode must not shuffle the corpus:\n${plan.take(2000)}")
    val codes = enc.as[(Long, Seq[Int])].collect().toMap
    assert(codes.size == 768)
    assert(codes.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < idx.k)))
    // encode is deterministic
    val codes2 = Similarity.pqEncode(vecs, "embedding", "vec_id", idx)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes == codes2)
  }

  test("FrozenAnn artifacts have the shape the oracle SQL indexes by") {
    // AnnOracles emits DuckDB literals assuming contiguous 0-based coarse
    // list ids and rectangular per-subspace codebooks — regenerating
    // FrozenAnn (graft.FreezeAnn) must keep these invariants.
    assert(FrozenAnn.coarse.map(_._1).sorted.toSeq == FrozenAnn.coarse.indices.toSeq)
    assert(FrozenAnn.coarse.forall(_._2.length == 64))
    val idx = FrozenAnn.pqIndex
    assert(idx.m == 8 && idx.subDim == 8)
    assert(idx.codebooks.forall(_.forall(_.length == idx.subDim)))
  }

  test("cosine_sim: mixed float/double array inputs read each side correctly") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((Array(1f, 2f, 3f), Array(0.5, -1.0, 2.0))).toDF("f", "d")
    val got = df.select(
      graft.functions.GraftFunctions.cosineSim($"f", $"d").as("fd"),
      graft.functions.GraftFunctions.cosineSim(
        transform($"f", x => x.cast("double")), $"d").as("dd")).head()
    assert(got.getDouble(0) == got.getDouble(1),
      "float-left/double-right must equal the all-double form")
  }

  test("randomProject: kernel ≡ driver truth; determinism; matrix distribution") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Similarity.randomProjectionMatrix(64, 16)
    // Achlioptas distribution: ~1/3 nonzero, signs balanced
    val nz = m.count(_ != 0)
    assert(math.abs(nz.toDouble / m.length - 1.0 / 3) < 0.06, s"nonzero frac ${nz.toDouble / m.length}")
    assert(math.abs(m.count(_ == 1) - m.count(_ == -1)) < m.length / 10)
    // exactness: engine kernel == driver reimplementation (quantize ×1024
    // half-up, fold ints)
    val got = Similarity.randomProject(emb, "embedding", "proj", 64, 16)
      .select($"vec_id", $"proj").as[(Long, Seq[Long])].collect().toMap
    val want = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap.map { case (id, v) =>
        val q = v.map(x => math.floor(x.toDouble * 1024.0 + 0.5).toLong)
        id -> (0 until 16).map(j =>
          (0 until 64).map(d => m(j * 64 + d) * q(d)).sum).toSeq
      }
    assert(got == want)
    // partition-invariant
    val re = Similarity.randomProject(emb.repartition(7, $"label"),
        "embedding", "proj", 64, 16)
      .select($"vec_id", $"proj").as[(Long, Seq[Long])].collect().toMap
    assert(re == got)
    // JL property: pairwise cosines survive the 64 → 32 projection
    // within a loose distortion bound on this corpus
    val p32 = Similarity.randomProject(emb.where($"vec_id" < 40),
        "embedding", "proj", 64, 32)
      .select($"vec_id", $"embedding", $"proj")
      .as[(Long, Seq[Float], Seq[Long])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.max(math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum), 1e-12)
    }
    val devs = for {
      (ia, va, pa) <- p32; (ib, vb, pb) <- p32 if ia < ib
    } yield math.abs(
      cos(va.map(_.toDouble), vb.map(_.toDouble)) -
        cos(pa.map(_.toDouble), pb.map(_.toDouble)))
    assert(devs.sum / devs.size < 0.15,
      s"mean cosine distortion too high: ${devs.sum / devs.size}")
    // narrow: no Exchange
    val plan = Similarity.randomProject(emb, "embedding", "proj", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("randomProject is load-bearing: embedding dedup in the projected space finds the planted twins") {
    // deterministic corpus: 60 base 64-dim vectors; ids 3k+1 are
    // near-identical twins of 3k (one component nudged), 3k+2 unrelated
    def base(k: Int, seed: Int): Array[Float] = Array.tabulate(64) { d =>
      var x = k * 73856093 ^ d * 19349663 ^ seed
      x *= 0x9e3779b1; x ^= x >>> 16
      ((x & 0x7fffffff) % 2000 - 1000) / 1000.0f
    }
    val rows = (0 until 60).map { id =>
      val k = id / 3
      val v = (id % 3) match {
        case 0 => base(k, 0)
        case 1 =>
          val t = base(k, 0).clone(); t(k % 64) = t(k % 64) + 0.05f; t
        case _ => base(k, 0x5bd1e995)
      }
      (id.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    def survivors(frame: org.apache.spark.sql.DataFrame, vc: String): Set[Long] =
      Dedup.removeNearDuplicatesByEmbedding(frame, vc, "vec_id",
          threshold = 0.98, exact = true)
        .select("vec_id").as[Long].collect().toSet
    val expected = (0 until 60).map(_.toLong).toSet --
      (0 until 20).map(3L * _ + 1)
    assert(survivors(df, "embedding") == expected, "original-space sanity")
    // 64 → 32 projection, cast to double for the cosine kernels: the
    // SAME dedup over 2× fewer dimensions finds the same twins — the
    // composition a corpus runs to cut SemDeDup/mining cost
    val projected = Similarity.randomProject(df, "embedding", "proj", 64, 32)
      .withColumn("projd", transform($"proj", x => x.cast("double")))
    assert(survivors(projected, "projd") == expected,
      "projected-space dedup must find the planted twins")
    // …and the ONE-FLAG form composes the same thing internally:
    // survivors identical to the unprojected run, projection in-plan
    val oneFlag = Dedup.removeNearDuplicatesByEmbedding(df, "embedding",
      "vec_id", threshold = 0.98, exact = true, projectTo = Some(32))
    assert(oneFlag.queryExecution.analyzed.toString.contains("jl_project"),
      "projectTo must stage the JL kernel inside the dedup plan")
    assert(oneFlag.select("vec_id").as[Long].collect().toSet == expected,
      "projectTo survivors must equal the unprojected run")
    assert(oneFlag.columns.toSeq == df.columns.toSeq,
      "the staged projection column must not leak into the output")
  }

  test("removeSemanticDuplicates projectTo: survivors equal the unprojected run; centroids project consistently") {
    // the planted-twin corpus again, clustered under 4 base-vector
    // centroids — twins are near-identical so they always share a
    // primary cluster, whatever the projection does to the boundaries
    def base(k: Int, seed: Int): Array[Float] = Array.tabulate(64) { d =>
      var x = k * 73856093 ^ d * 19349663 ^ seed
      x *= 0x9e3779b1; x ^= x >>> 16
      ((x & 0x7fffffff) % 2000 - 1000) / 1000.0f
    }
    val rows = (0 until 60).map { id =>
      val k = id / 3
      val v = (id % 3) match {
        case 0 => base(k, 0)
        case 1 =>
          val t = base(k, 0).clone(); t(k % 64) = t(k % 64) + 0.05f; t
        case _ => base(k, 0x5bd1e995)
      }
      (id.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val centroids: Array[(Int, Array[Float])] =
      Array.tabulate(4)(c => c -> base(c * 5, 7))
    def kept(projectTo: Option[Int]): Set[Long] =
      Dedup.removeSemanticDuplicates(df, "embedding", "vec_id", centroids,
        threshold = 0.98, maxClusterSize = 100, projectTo = projectTo)
        .select("vec_id").as[Long].collect().toSet
    val unprojected = kept(None)
    val projected = kept(Some(32))
    // BOTH spaces resolve exactly the planted twin pairs: one member of
    // each pair survives, every non-twin row survives. WHICH twin wins
    // is the keep-the-outlier rank (farthest from its centroid), and two
    // near-identical twins' centroid cosines differ by less than the JL
    // distortion — the rank inside a duplicate group may legitimately
    // flip under projection, so the invariant is the RESOLUTION
    // structure, not the survivor id (the min-id embedding-dedup path
    // above is rank-free and pins exact survivor equality).
    Seq("unprojected" -> unprojected, "projected" -> projected).foreach {
      case (name, s) =>
        (0 until 20).foreach { k =>
          assert(s.contains(3L * k) ^ s.contains(3L * k + 1),
            s"$name: exactly one of twin pair $k must survive")
          assert(s.contains(3L * k + 2), s"$name: non-twin ${3 * k + 2} must survive")
        }
        assert(s.size == 40, s"$name: 20 twin survivors + 20 non-twins")
    }
  }
}
