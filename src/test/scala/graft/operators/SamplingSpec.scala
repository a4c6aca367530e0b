package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Deterministic-sampling specs: membership is key-pure (stable under
  * repartitioning), splits are disjoint + exhaustive, fractions land near
  * their targets, and supersets preserve membership (corpus-growth
  * stability — the train/test-hygiene property). */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("deterministicSample: same members regardless of partitioning; ~fraction kept") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "membership must not depend on partitioning")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"0.25 sample landed at $frac")
  }

  test("deterministicSample: fraction 0 and 1 edge cases") {
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("membership is stable under corpus growth (subset sampled == superset ∩ subset)") {
    val subset = docs.where($"doc_id" < 250)
    val fromSubset = Sampling.deterministicSample(subset, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val fromFull = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .where($"doc_id" < 250).select("doc_id").as[Long].collect().toSet
    assert(fromSubset == fromFull)
  }

  test("hashSplit: disjoint, exhaustive, near target fractions, deterministic") {
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count()) // exhaustive and disjoint
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    val again = Sampling.hashSplit(docs.repartition(5), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("stratifiedSample: per-stratum rates honored, key-pure, consistent with the flat sampler") {
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang", rates, defaultFraction = 0.1)
    val byLang = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      val target = rates.getOrElse(lang, 0.1)
      val got = byLang.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - target) < 0.12, s"$lang: got $got, target $target")
    }
    // a stratum at rate f contains EXACTLY the flat f-sample of that
    // stratum (same key-pure bucket => composable with deterministicSample)
    val enFlat = Sampling.deterministicSample(docs.where($"lang" === "en"), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val enStrat = s.where($"lang" === "en").select("doc_id").as[Long].collect().toSet
    assert(enStrat == enFlat)
    // partitioning-independent
    val s2 = Sampling.stratifiedSample(docs.repartition(7), "doc_id", "lang", rates, 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(s2 == s.select("doc_id").as[Long].collect().toSet)
  }

  test("temperatureResample: alpha=1 is a uniform targetFraction sample; alpha<1 flattens toward rare strata") {
    // alpha = 1: q_s = p_s, so every stratum's rate collapses to exactly
    // targetFraction — the resampler degenerates to a flat sample
    val flat = Sampling.temperatureResample(docs, "doc_id", "lang", alpha = 1.0,
      targetFraction = 0.5)
    val expect = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(flat.select("doc_id").as[Long].collect().toSet == expect)

    // alpha < 1: the dominant stratum's keep rate is strictly below a
    // rare stratum's (flattening), and the overall kept total lands near
    // targetFraction * N
    val t = Sampling.temperatureResample(docs, "doc_id", "lang", alpha = 0.5,
      targetFraction = 0.5)
    val byLang = t.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val dominant = totals.maxBy(_._2)._1
    val rare = totals.minBy(_._2)._1
    val rDom = byLang.getOrElse(dominant, 0L).toDouble / totals(dominant)
    val rRare = byLang.getOrElse(rare, 0L).toDouble / totals(rare)
    assert(rDom < rRare,
      s"alpha<1 must downsample '$dominant' ($rDom) harder than '$rare' ($rRare)")
    val frac = t.count().toDouble / docs.count()
    assert(frac > 0.35 && frac < 0.65, s"overall kept fraction $frac far from 0.5")

    // key-pure: partitioning-independent membership
    val t2 = Sampling.temperatureResample(docs.repartition(9), "doc_id", "lang",
      alpha = 0.5, targetFraction = 0.5)
    assert(t2.select("doc_id").as[Long].collect().toSet ==
      t.select("doc_id").as[Long].collect().toSet)
  }

  test("roundRate4 rounds half-UP (DuckDB round parity), not half-to-even") {
    // 0.15625 = 2.5/16 is exactly representable and 0.15625 * 1e4 = 1562.5
    // exactly — a true .5 tie at the 4th decimal. Half-even (math.rint)
    // gives 0.1562; DuckDB's round(x, 4) gives 0.1563. Membership parity
    // requires the half-up answer.
    assert(Sampling.roundRate4(0.15625) == 0.1563)
    assert(math.rint(0.15625 * 1e4) / 1e4 == 0.1562, "tie fixture must discriminate")
    // another exact tie, rounding the other even-ness: 1562.5 vs 937.5
    assert(Sampling.roundRate4(0.09375) == 0.0938) // 937.5 → 938 both ways
    // non-tie values are unaffected
    assert(Sampling.roundRate4(0.123449) == 0.1234)
    assert(Sampling.roundRate4(0.123451) == 0.1235)
    assert(Sampling.roundRate4(0.0) == 0.0)
    assert(Sampling.roundRate4(1.0) == 1.0)
  }

  test("hashSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("sampling predicate is narrow (no Exchange introduced)") {
    val plan = Sampling.deterministicSample(docs, "doc_id", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("capPerGroup: top-k per group by (order desc, id asc), deterministic, == brute force") {
    val kept = Sampling.capPerGroup(docs, "source", "doc_id", 7, col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    val brute = docs.select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).values.flatMap { grp =>
        grp.sortBy { case (_, id, n) => (-n, id) }.take(7).map(_._2)
      }.toSet
    assert(kept == brute)
    // every group capped at exactly k here (all sf0.01 sources hold 25 docs)
    val perGroup = Sampling.capPerGroup(docs, "source", "doc_id", 7, col("n_chars"))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perGroup.values.forall(_ == 7), s"cap must bind: $perGroup")
    // k larger than any group ⇒ identity
    assert(Sampling.capPerGroup(docs, "source", "doc_id", 1000, col("n_chars"))
      .count() == docs.count())
  }

  test("mixToTokenShares: kept token mass lands on the target shares; binding stratum keeps all") {
    import org.apache.spark.sql.functions.{col, sum}
    val shares = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val mixed = Sampling.mixToTokenShares(docs, "doc_id", "source", "n_chars", shares)
    val kept = mixed.groupBy("source").agg(sum(col("n_chars")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet.subsetOf(shares.keySet), s"non-target strata must drop: $kept")
    // the binding stratum (max tokens_s/w_s deficit) keeps EVERYTHING
    val totals = docs.where(col("source").isin(shares.keys.toSeq: _*))
      .groupBy("source").agg(sum(col("n_chars")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = shares.keys.minBy(s => totals(s) / shares(s))
    assert(kept(binding) == totals(binding),
      s"binding stratum $binding must keep rate 1.0: $kept vs $totals")
    // achieved shares track the targets (doc-level sampling: expected,
    // not exact — allow a loose tolerance at 25 docs/stratum)
    val keptTotal = kept.values.sum.toDouble
    shares.foreach { case (s, w) =>
      val achieved = kept.getOrElse(s, 0L) / keptTotal
      assert(math.abs(achieved - w) < 0.15,
        s"stratum $s achieved $achieved vs target $w: $kept")
    }
    // key-pure: same members regardless of partitioning
    val again = Sampling.mixToTokenShares(
      docs.repartition(7), "doc_id", "source", "n_chars", shares)
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)
  }

  test("shuffleIntoShards: (shard, shuffle_key) order IS the global hash order; seed = epoch") {
    val sh = Sampling.shuffleIntoShards(docs, "doc_id", 8, seed = "e0")
    // shards are contiguous hash ranges, so concatenating shards in
    // order replays the single global permutation
    val byShard = sh.orderBy(col("shard"), col("shuffle_key"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    val global = sh.orderBy(col("shuffle_key"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(byShard == global)
    // the permutation really permutes (not the input order) and covers
    // every row exactly once
    assert(byShard.sorted != byShard && byShard.sorted == byShard.distinct.sorted)
    assert(byShard.length == docs.count())
    // key-pure: identical assignment under a different partitioning
    val repart = Sampling.shuffleIntoShards(docs.repartition(7), "doc_id", 8, seed = "e0")
      .orderBy(col("shard"), col("shuffle_key"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(repart == byShard)
    // a different seed is a DIFFERENT (but equally reproducible) epoch
    val epoch2 = Sampling.shuffleIntoShards(docs, "doc_id", 8, seed = "e1")
      .orderBy(col("shard"), col("shuffle_key"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(epoch2 != byShard && epoch2.sorted == byShard.sorted)
    // every shard populated and roughly balanced at 500 docs / 8 shards
    val sizes = sh.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    assert(sizes.values.min > 0)
  }

  test("writeShards: reading shard dirs in order replays the exact global permutation") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Sampling.writeShards(docs.limit(200), "doc_id", 4, dir, seed = "e0")
    val replayed = (0 until 4).flatMap { i =>
      spark.read.parquet(s"$dir/shard=$i").select("doc_id").as[Long].collect()
    }
    val expected = Sampling.shuffleIntoShards(docs.limit(200), "doc_id", 4, seed = "e0")
      .orderBy(col("shard"), col("shuffle_key"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(replayed == expected,
      "shard files must replay the (shard, shuffle_key) global order")
    // byte-stable across re-runs with the same seed (resume/audit)
    Sampling.writeShards(docs.limit(200), "doc_id", 4, dir, seed = "e0")
    val again = (0 until 4).flatMap { i =>
      spark.read.parquet(s"$dir/shard=$i").select("doc_id").as[Long].collect()
    }
    assert(again == replayed)
  }

  test("shuffleIntoShards is a narrow projection (no Exchange introduced)") {
    val plan = Sampling.shuffleIntoShards(docs, "doc_id", 8, seed = "e0")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"shard assignment must not shuffle:\n$plan")
  }

  test("capPerGroup plans a WindowGroupLimit (bounded per-group buffer, no full-group sort)") {
    val plan = Sampling.capPerGroup(docs, "source", "doc_id", 7, col("n_chars"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push down as WindowGroupLimit:\n$plan")
  }
  test("clusterBalancedSample: k best per nearest-centroid cluster, deterministic, guard on cluster col") {
    // three orthogonal centroids; vectors built near each with a known
    // per-vector score column driving the quality-first cap
    val cents: Array[(Int, Array[Float])] = Array(
      0 -> Array(1f, 0f, 0f),
      1 -> Array(0f, 1f, 0f),
      2 -> Array(0f, 0f, 1f))
    // cluster 0: 3 members (ids 1..3), cluster 1: 2 (ids 11,12),
    // cluster 2: 1 (id 21); small cross-axis noise keeps assignment
    // unambiguous while exercising the argmax
    val rows = Seq(
      (1L, Array(1f, 0.1f, 0f), 5.0), (2L, Array(1f, 0f, 0.1f), 9.0),
      (3L, Array(0.9f, 0.1f, 0f), 9.0),
      (11L, Array(0.1f, 1f, 0f), 1.0), (12L, Array(0f, 1f, 0.1f), 2.0),
      (21L, Array(0f, 0.1f, 1f), 7.0))
    val df = rows.toDF("vec_id", "embedding", "score")
    val got = Sampling.clusterBalancedSample(
      df, "embedding", "vec_id", cents, k = 2, orderBy = $"score")
      .select($"cluster", $"vec_id").as[(Int, Long)].collect().toSet
    // cluster 0 keeps its 2 best by (score desc, id asc): 2 (9.0) and
    // 3 (9.0) — the 5.0 row drops; clusters 1 and 2 are under the cap
    assert(got == Set((0, 2L), (0, 3L), (1, 11L), (1, 12L), (2, 21L)), s"got $got")

    // deterministic across re-runs and partitionings
    val again = Sampling.clusterBalancedSample(
      df.repartition(7), "embedding", "vec_id", cents, k = 2, orderBy = $"score")
      .select($"cluster", $"vec_id").as[(Int, Long)].collect().toSet
    assert(again == got)

    // collision guard: a pre-existing cluster column fails loudly
    val e = intercept[IllegalArgumentException] {
      Sampling.clusterBalancedSample(df.withColumn("cluster", lit(0)),
        "embedding", "vec_id", cents, k = 2, orderBy = $"score")
    }
    assert(e.getMessage.contains("cluster"))

    // all caller columns survive (score rides through the cap)
    val cols = Sampling.clusterBalancedSample(
      df, "embedding", "vec_id", cents, k = 2, orderBy = $"score").columns.toSet
    assert(cols == Set("vec_id", "embedding", "score", "cluster"))
  }
}
