package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession
import graft.functions.NgramLmScorer

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private val S = NgramLm.WeightScale

  private def ln(x: Double): Long = math.round(math.log(x) * S)

  test("scorer: hand-computed Stupid-Backoff on every path") {
    // tiny LM: uni {a: ln(0.5), b: ln(0.25)}, bi {"a b": ln(0.8)},
    // tri {"<s> <s> a": ln(0.9)}; backoff ln(0.4), unk ln(0.01)
    val sc = new NgramLmScorer(
      Array("a", "b"), Array(ln(0.5), ln(0.25)),
      Array("a b"), Array(ln(0.8)),
      Array("<s> <s> a"), Array(ln(0.9)),
      ln(0.4), ln(0.01))
    def arr(toks: String*) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
    // "a b c":
    //   a | <s> <s>: tri hit                        -> ln(0.9)
    //   b | <s> a:   tri miss, bi "a b" hit         -> ln(0.4) + ln(0.8)
    //   c | a b:     tri miss, bi "b c" miss, uni miss -> 2·ln(0.4) + unk
    val expected = ln(0.9) + (ln(0.4) + ln(0.8)) + (2 * ln(0.4) + ln(0.01))
    assert(sc.score(arr("a", "b", "c")) == expected)
    // uni-backoff path: "b" alone — tri "<s> <s> b" miss, bi "<s> b"
    // miss, uni hit -> 2·ln(0.4) + ln(0.25)
    assert(sc.score(arr("b")) == 2 * ln(0.4) + ln(0.25))
    // empty -> 0
    assert(sc.score(arr()) == 0L)
  }

  test("fit: counts, denominators, pruning, and context-pruned drops") {
    // 6 identical docs "x y z x y" + 1 doc "q q q" (q-grams prune at
    // minCount=4; x/y/z-grams survive with count 6 each)
    val df = (Seq.fill(6)("x y z x y") ++ Seq("q q q")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = NgramLm.fit(df, "text", maxEntriesPerOrder = 100, minCount = 4)
    val uni = m.uniKeys.zip(m.uniVals).toMap
    val bi = m.biKeys.zip(m.biVals).toMap
    val tri = m.triKeys.zip(m.triVals).toMap
    // N = 6*5 + 3 = 33 real tokens
    assert(uni("x") == ln(12.0 / 33.0)) // c(x)=12
    assert(uni("y") == ln(12.0 / 33.0))
    assert(uni("z") == ln(6.0 / 33.0))
    assert(!uni.contains("q")) // count 3 < minCount 4
    assert(!uni.contains("<s>")) // sentinel is context-only
    // bigram "x y": c=12; context c(x)=12 -> ln(1)=0
    assert(bi("x y") == 0L)
    // bigram "<s> x": c=6, context c(<s>)=14 (padded: 2 per doc)
    assert(bi("<s> x") == ln(6.0 / 14.0))
    assert(!bi.keySet.exists(_.endsWith(" <s>")), "predicted slot must be real")
    // trigram "x y z": c=6, context bigram "x y" c=12
    assert(tri("x y z") == ln(6.0 / 12.0))
    // trigram "<s> <s> x": c=6, context "<s> <s>" c=7
    assert(tri("<s> <s> x") == ln(6.0 / 7.0))
    // determinism across partitionings
    val m2 = NgramLm.fit(df.repartition(5), "text",
      maxEntriesPerOrder = 100, minCount = 4)
    assert(m.uniKeys.toSeq == m2.uniKeys.toSeq &&
      m.triVals.toSeq == m2.triVals.toSeq)
  }

  test("fit: entries whose context gram was pruned are dropped") {
    // cap the tables so low-count contexts fall off: with
    // maxEntriesPerOrder=1, only the single most frequent gram of each
    // order survives, and any bi/tri whose context is not THAT gram drops
    val df = (Seq.fill(10)("a a a") ++ Seq.fill(3)("b c d")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = NgramLm.fit(df, "text", maxEntriesPerOrder = 1, minCount = 1)
    assert(m.uniKeys.toSeq == Seq("a")) // c(a)=30 tops
    // top bigram is "a a" (c=20); its context "a" is the kept unigram
    assert(m.biKeys.toSeq == Seq("a a"))
    // trigrams tie at c=10 ("<s> <s> a", "<s> a a", "a a a"); the
    // lexicographic tie-break keeps "<s> <s> a", whose context
    // "<s> <s>" fell off the 1-entry bigram cap — so it must DROP
    // (serving has no denominator for it; backoff covers it)
    assert(m.triKeys.isEmpty)
    // with room for both contexts, the same trigrams all survive
    val m3 = NgramLm.fit(df, "text", maxEntriesPerOrder = 3, minCount = 1)
    assert(m3.triKeys.toSeq == Seq("<s> <s> a", "<s> a a", "a a a"))
  }

  test("score: exact kernel ≡ independent driver reimplementation on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = FrozenNgramLm.model
    val got = NgramLm.score(docs, "text", "doc_id", m)
      .select("doc_id", "score_scaled").as[(Long, Long)].collect().toMap
    val uni = m.uniKeys.zip(m.uniVals).toMap
    val bi = m.biKeys.zip(m.biVals).toMap
    val tri = m.triKeys.zip(m.triVals).toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect().map {
      case (id, text) =>
        val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split("\\s+").filter(_.nonEmpty)
        var (p2, p1) = ("<s>", "<s>")
        var sum = 0L
        toks.foreach { w =>
          sum += tri.getOrElse(s"$p2 $p1 $w",
            m.backoffScaled + bi.getOrElse(s"$p1 $w",
              m.backoffScaled + uni.getOrElse(w, m.unkScaled)))
          p2 = p1; p1 = w
        }
        id -> sum
    }.toMap
    assert(got == want)
  }

  test("frozen LM separates reference-shaped from off-reference documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(graft.QmOracle.fillerSuffix)))
          .otherwise(col("text")).as("text"))
    val sep = NgramLm.score(docs, "text", "doc_id", FrozenNgramLm.model)
      .withColumn("ref", col("doc_id") % 2 === 0)
      .groupBy("ref").agg(avg("mean_log").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(sep(true) > sep(false) + 1.0,
      s"reference-shaped must score at least 1 nat/token higher: $sep")
  }

  test("gate: exact integer threshold semantics; nulls and empties") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // fluent-ish
      (2L, "zzz qqq xxx yyy zzz qqq"), // all-unk
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val scored = NgramLm.score(df, "text", "doc_id", FrozenNgramLm.model)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(scored(3L)._2 == 0 && scored(3L)._3 == 0L && scored(3L)._4 == 0.0)
    assert(scored(4L)._2 == 0 && scored(4L)._3 == 0L)
    val thr = -6.0
    val kept = NgramLm.filterByScore(df, "text", FrozenNgramLm.model, thr)
      .select("doc_id").as[Long].collect().toSet
    val expect = scored.collect {
      case (id, (_, n, s, _)) if s >= math.round(thr * S) * n.toLong => id
    }.toSet
    assert(kept == expect)
    assert(kept.contains(1L) && !kept.contains(2L),
      s"fluent text must pass, unk soup must fail: $kept")
    // null/empty docs (n=0, score=0) pass a negative threshold: 0 >= neg*0
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("score plan: one narrow projection, no Exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = NgramLm.score(docs, "text", "doc_id", FrozenNgramLm.model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  /** Driver reimplementation of the bucket contract: md5 sample →
    * descending exact order statistics → value-threshold assignment. */
  private def bucketTruth(scores: Map[Long, Double], nBuckets: Int,
      fraction: Double): Map[Long, Int] = {
    def hex(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    val th = f"${math.min(math.round(fraction * 4294967296.0), 4294967295L)}%08x"
    val sample = scores.toSeq.filter { case (id, _) => hex(id) < th }
      .sortBy { case (id, m) => (-m, id) }
    val cuts = (1 until nBuckets).flatMap { j =>
      val rank = (j.toLong * sample.size + (nBuckets - 1)) / nBuckets
      if (rank >= 1 && rank <= sample.size) Some(sample((rank - 1).toInt)._2)
      else None
    }
    scores.map { case (id, m) => id -> (1 + cuts.count(m < _)) }
  }

  test("perplexityBuckets: operator ≡ driver truth; head scores highest") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(graft.QmOracle.fillerSuffix)))
          .otherwise(col("text")).as("text"))
    val m = FrozenNgramLm.model
    val got = NgramLm.perplexityBuckets(docs, "text", "doc_id", m,
        nBuckets = 3, sampleFraction = 0.5)
      .select($"doc_id", $"mean_log", $"bucket", $"bucket_label")
      .as[(Long, Double, Int, String)].collect()
    val scores = NgramLm.score(docs, "text", "doc_id", m)
      .select($"doc_id", $"mean_log").as[(Long, Double)].collect().toMap
    val want = bucketTruth(scores, 3, 0.5)
    got.foreach { case (id, _, b, lbl) =>
      assert(b == want(id), s"doc $id: got bucket $b want ${want(id)}")
      assert(lbl == Seq("head", "middle", "tail")(b - 1))
    }
    // the stratification is real: all three buckets populated, and
    // every head doc outscores every tail doc
    val byBucket = got.groupBy(_._3)
    assert(byBucket.keySet == Set(1, 2, 3), s"got ${byBucket.keySet}")
    assert(byBucket(1).map(_._2).min >= byBucket(3).map(_._2).max)
  }

  test("perplexityBuckets: per-stratum cuts via byCol; empty-sample stratum defaults to head") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(graft.QmOracle.fillerSuffix)))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 2 === 0, "even").otherwise("odd").as("cls"))
    val m = FrozenNgramLm.model
    val got = NgramLm.perplexityBuckets(docs, "text", "doc_id", m,
        nBuckets = 3, sampleFraction = 0.5, byCol = Some("cls"))
      .select($"doc_id", $"cls", $"mean_log", $"bucket")
      .as[(Long, String, Double, Int)].collect()
    assert(got.map(_._2).toSet == Set("even", "odd"), "byCol column survives")
    val scores = NgramLm.score(docs, "text", "doc_id", m)
      .select($"doc_id", $"mean_log").as[(Long, Double)].collect().toMap
    Seq("even" -> 0L, "odd" -> 1L).foreach { case (cls, par) =>
      val stratum = scores.filter { case (id, _) => id % 2 == par }
      val want = bucketTruth(stratum, 3, 0.5)
      got.filter(_._2 == cls).foreach { case (id, _, _, b) =>
        assert(b == want(id), s"$cls doc $id: got $b want ${want(id)}")
      }
    }
    // a stratum with NO sampled docs cannot split: everything bucket 1
    val lone = Seq((999999999L, "some text here", "rare"))
      .toDF("doc_id", "text", "cls")
      .where(substring(md5($"doc_id".cast("string")), 1, 8) >=
        lit(Sampling.thresholdHex(0.0000001)))
    if (lone.count() == 1) {
      val b = NgramLm.perplexityBuckets(lone, "text", "doc_id", m,
          nBuckets = 3, sampleFraction = 0.0000001, byCol = Some("cls"))
        .select($"bucket").as[Int].head()
      assert(b == 1, "empty-sample stratum must default to bucket 1")
    }
  }

  test("perplexityBuckets: NULL strata form their own stratum; non-string byCol works") {
    val m = FrozenNgramLm.model
    // NULL-stratum docs must get REAL cuts (their own), not silently
    // head-bucket through an unmatched NULL equi-join key
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(graft.QmOracle.fillerSuffix)))
          .otherwise(col("text")).as("text"),
        lit(null).cast("string").as("cls"))
    val got = NgramLm.perplexityBuckets(docs, "text", "doc_id", m,
        nBuckets = 3, sampleFraction = 0.5, byCol = Some("cls"))
      .select($"doc_id", $"cls", $"bucket").as[(Long, Option[String], Int)]
      .collect()
    assert(got.forall(_._2.isEmpty), "byCol passes through as NULL")
    assert(got.map(_._3).toSet == Set(1, 2, 3),
      s"NULL stratum must split into all buckets, got ${got.map(_._3).toSet}")
    // the NULL stratum's buckets equal the global (single-stratum) run's
    val global = NgramLm.perplexityBuckets(docs, "text", "doc_id", m,
        nBuckets = 3, sampleFraction = 0.5)
      .select($"doc_id", $"bucket").as[(Long, Int)].collect().toMap
    got.foreach { case (id, _, b) => assert(b == global(id)) }
    // an integer byCol must not ClassCastException on cut collection
    val intStrata = docs.withColumn("src", (col("doc_id") % 2).cast("int"))
    val gotInt = NgramLm.perplexityBuckets(intStrata, "text", "doc_id", m,
        nBuckets = 3, sampleFraction = 0.5, byCol = Some("src"))
      .select($"src", $"bucket").as[(Int, Int)].collect()
    assert(gotInt.map(_._1).toSet == Set(0, 1), "integer byCol survives")
    assert(gotInt.map(_._2).toSet == Set(1, 2, 3))
  }
}
