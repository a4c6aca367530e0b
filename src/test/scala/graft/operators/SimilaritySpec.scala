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

  test("sign-LSH cosinePairs: no false positives (exact verify) on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val allTrue = Similarity.bruteForceTopK(emb, emb, "embedding", "vec_id", k = 500)
      .where($"cosine" >= 0.45)
      .select(least($"q_id", $"c_id"), greatest($"q_id", $"c_id"))
      .as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosinePairs(emb, "embedding", "vec_id", 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // candidates are verified with the exact cosine ⇒ every emitted pair is
    // genuinely above threshold (the candidate set is what's approximate)
    assert(lsh.subsetOf(allTrue))
  }

  test("sign-LSH cosinePairs: full recall on planted near-duplicates (design point)") {
    // sign-LSH recall ~ (1-θ/π)⁴ per chunk: near 1 for cosine ≥ 0.95, low at
    // 0.45 — the operator is a NEAR-DUP detector, so recall is asserted at
    // its design threshold with planted near-identical vectors.
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

  test("ivfTopK: exact scores, and decent top-1 recall at nProbe/nLists = 1/4") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.where($"vec_id" < 50)
    val ivf = Similarity.ivfTopK(emb, probes, "embedding", "vec_id",
      k = 1, nLists = 16, nProbe = 4)
      .select("q_id", "c_id", "cosine").as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(ivf.length == 50)
    // scores are EXACT cosines (verified candidates), only coverage is approximate
    val bruteAll = Similarity.bruteForceTopK(emb, probes, "embedding", "vec_id", k = 500)
      .select("q_id", "c_id", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, c, cos) => assert(math.abs(bruteAll((q, c)) - cos) < 1e-12) }
    // recall: visiting 4/16 lists should recover a fair share of true top-1s
    val hits = ivf.count { case (q, c, _) => brute(q) == c }
    assert(hits >= 15, s"top-1 recall too low: $hits/50")
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
}
