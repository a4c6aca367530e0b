package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** DSIR importance-resampling specs: the fitted log-ratio table points
  * toward the target distribution, the log-weight fold is exact and
  * partition-stable, Gumbel-top-k selection is deterministic, weighted
  * toward high-importance documents, and stable under repartitioning,
  * and the frozen artifact separates the planted target class. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  // planted contrast: target-shaped docs repeat a distinctive phrase the
  // background docs never contain
  private lazy val corpus = (0L until 200L).map { i =>
    val base = s"filler word number $i and some shared vocabulary here"
    val text = if (i % 2 == 0) s"$base the quick brown fox jumps again" else base
    (i, text)
  }.toDF("id", "text")

  private lazy val model =
    Dsir.fit(corpus.where($"id" % 2 === 0), corpus, "text", dim = 256)

  test("fit: buckets hit by target-only ngrams carry positive weight") {
    // 'quick', 'brown', 'fox' occur only in the target half, so their
    // buckets must favor the target distribution
    val tgtBuckets = Seq("quick", "brown", "fox", "quick brown", "brown fox")
      .map { f =>
        spark.range(1).select(
          QualityModel.featureIndex(lit(f), model.dim)).first().getLong(0).toInt
      }
    tgtBuckets.foreach { j =>
      assert(model.weightsScaled(j) > 0,
        s"target-only feature bucket $j should have positive log-ratio")
    }
  }

  test("logWeight: exact fold matches a driver-side recomputation") {
    val got = Dsir.logWeight(corpus, "text", "id", model)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // recompute doc 0 and doc 1 by hand through the same hash
    for (id <- Seq(0L, 1L)) {
      val toks = texts(id).toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val idx = feats.map { f =>
        spark.range(1).select(
          QualityModel.featureIndex(lit(f), model.dim)).first().getLong(0).toInt
      }
      val expected = idx.map(model.weightsScaled(_)).sum.toDouble / Dsir.WeightScale.toDouble
      assert(got(id)._1 == feats.size, s"doc $id n_features")
      assert(got(id)._2 == expected, s"doc $id log_w exact-fold mismatch")
    }
  }

  test("logWeight separates the planted target class; empty doc scores 0") {
    val lw = Dsir.logWeight(corpus, "text", "id", model)
      .withColumn("tgt", $"id" % 2 === 0)
      .groupBy($"tgt").agg(avg($"log_w")).as[(Boolean, Double)]
      .collect().toMap
    assert(lw(true) > lw(false),
      s"target-shaped docs must score higher: ${lw(true)} vs ${lw(false)}")

    val empty = Seq((99L, "")).toDF("id", "text")
    val r = Dsir.logWeight(empty, "text", "id", model).first()
    assert(r.getInt(1) == 0 && r.getDouble(2) == 0.0)
  }

  test("resample: deterministic, partition-stable, and importance-weighted") {
    val a = Dsir.resample(corpus, "text", "id", model, 60)
      .select("id").as[Long].collect().toSet
    val b = Dsir.resample(corpus.repartition(7), "text", "id", model, 60)
      .select("id").as[Long].collect().toSet
    assert(a == b, "selection must not depend on partitioning")
    assert(a.size == 60)
    // target-shaped docs carry strictly higher importance, so they must
    // dominate the selected set (100 of 200 docs are target-shaped)
    val nTarget = a.count(_ % 2 == 0)
    assert(nTarget > 45, s"importance weighting too weak: $nTarget/60 target docs")
  }

  test("resample: different salts draw different Gumbel noise") {
    val a = Dsir.resample(corpus, "text", "id", model, 40, salt = "a:")
      .select("id").as[Long].collect().toSet
    val b = Dsir.resample(corpus, "text", "id", model, 40, salt = "b:")
      .select("id").as[Long].collect().toSet
    assert(a != b, "distinct salts should give distinct draws")
  }

  test("frozen artifact separates the filler-augmented target class at sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", when($"doc_id" % 2 === 0,
        concat($"text", lit(graft.QmOracle.fillerSuffix)))
        .otherwise($"text").as("text"))
    val lw = Dsir.logWeight(docs, "text", "doc_id", FrozenDsir.model)
      .withColumn("tgt", $"doc_id" % 2 === 0)
      .groupBy($"tgt").agg(avg($"log_w")).as[(Boolean, Double)]
      .collect().toMap
    assert(lw(true) > lw(false),
      s"frozen model must favor the augmented class: ${lw(true)} vs ${lw(false)}")
  }

  test("logWeight plan is a narrow projection — no Exchange") {
    val plan = Dsir.logWeight(corpus, "text", "id", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
