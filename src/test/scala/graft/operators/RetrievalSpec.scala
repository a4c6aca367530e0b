package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** BM25 retrieval specs: stats are exact, scores match a driver-side
  * reference implementation bit-for-bit, ranking behaves (more query
  * hits ⇒ higher score; longer doc at equal tf ⇒ lower score), top-k is
  * partition-stable, and the scoring plan never shuffles. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark shuffle join hash join table"),       // 2× join, 1× hash
    (2L, "hash hash hash table scan filter"),          // 3× hash
    (3L, "merge sort window agg group value"),         // no hits
    (4L, "spark spark spark spark join hash"),         // heavy spark
    (5L, "join table"),                                // short, 1× join
    (6L, "join table join table join table join table" +
      " join table join table join table join table") // long, many joins
  ).toDF("id", "text")

  private val query = Seq("hash", "join", "spark")

  test("bm25Stats: exact N, total tokens, per-term document frequencies") {
    val st = Retrieval.bm25Stats(corpus, "text", query)
    assert(st.nDocs == 6)
    assert(st.totalTokens == 6 + 6 + 6 + 6 + 2 + 16)
    assert(st.docFreq == Seq(3, 4, 2)) // hash, join, spark
  }

  test("bm25ScoreAll: bit-exact vs a driver-side reference") {
    val st = Retrieval.bm25Stats(corpus, "text", query)
    val got = Retrieval.bm25ScoreAll(corpus, "text", "id", query, st)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val avgdl = st.totalTokens.toDouble / st.nDocs.toDouble
    val (k1, b) = (1.2, 0.75)
    texts.foreach { case (id, text) =>
      val toks = text.split(" ").toSeq
      val dl = toks.size.toDouble
      val perTerm = query.zip(st.docFreq).map { case (t, dft) =>
        val w = math.log(1.0 + ((st.nDocs - dft) + 0.5) / (dft + 0.5))
        val tf = toks.count(_ == t).toDouble
        val raw = w * ((tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
        BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(got(id) == perTerm.sum.toDouble, s"doc $id score mismatch")
    }
  }

  test("ranking: more distinct-term mass wins; length normalization penalizes padding") {
    val st = Retrieval.bm25Stats(corpus, "text", query)
    val scores = Retrieval.bm25ScoreAll(corpus, "text", "id", query, st)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(3L) == 0.0, "no-hit doc must score zero")
    assert(scores(4L) > scores(5L), "3-term doc beats 1-term doc")
    // docs 5 and 6 are pure join/table: tf saturation + length norm must
    // keep the 8×-repeated variant from scoring 8× higher
    assert(scores(6L) < scores(5L) * 3,
      s"tf saturation failed: ${scores(6L)} vs ${scores(5L)}")
  }

  test("bm25TopK: deterministic, partition-stable, correctly ordered") {
    val a = Retrieval.bm25TopK(corpus, "text", "id", query, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Retrieval.bm25TopK(corpus.repartition(5), "text", "id", query, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq, "top-k must not depend on partitioning")
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq, "descending order")
    assert(a.length == 3)
  }

  test("bm25Stats: empty or token-free corpus fails loudly, not with an NPE") {
    val empty = corpus.where($"id" < 0)
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Stats(empty, "text", query)
    }
    assert(e.getMessage.contains("empty corpus"))
    val blank = Seq((1L, ""), (2L, "!!!")).toDF("id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.bm25Stats(blank, "text", query)
    }
    assert(e2.getMessage.contains("tokenizable"))
  }

  test("query terms normalize under the tokenizer rule; bad terms fail loudly") {
    val st = Retrieval.bm25Stats(corpus, "text", Seq("HASH!", "Join"))
    assert(st.docFreq == Seq(3, 4))
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Stats(corpus, "text", Seq("two words"))
    }
    assert(e.getMessage.contains("not a single token"))
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.bm25Stats(corpus, "text", Seq("hash", "HASH"))
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("scoring plan is a narrow projection — no Exchange") {
    val st = Retrieval.bm25Stats(corpus, "text", query)
    val plan = Retrieval.bm25ScoreAll(corpus, "text", "id", query, st)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("stats plan tokenizes ONCE: the kernel appears a single time under the aggregate") {
    // the tokenize-once discipline the scoring pass got in round 9,
    // applied to the stats pass: |Q|+1 aggregate expressions all
    // reference the one materialized token-array alias, never the
    // kernel itself (inline references re-tokenize the text per term).
    // Parquet-backed corpus: a local Seq fixture constant-folds the
    // whole projection into a LocalTableScan and hides the kernel.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Retrieval.bm25StatsFrame(docs, "text", query)
      .queryExecution.executedPlan.toString
    val kernelCalls = "norm_tokens".r.findAllIn(plan).size
    assert(kernelCalls == 1,
      s"stats aggregate must tokenize once, found $kernelCalls kernel calls:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"one-row global agg must not hash-shuffle rows:\n$plan")
  }

  test("bm25 tok=Ml: a Cyrillic query retrieves the Russian documents; Latin rejects it loudly") {
    import graft.functions.Tok
    val fx = MlFixture.frame(spark)
    // the Latin tokenizer normalizes a Cyrillic term to nothing — the
    // contract fails fast instead of silently matching no document
    val boom = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(fx, "text", "doc_id", Seq("данных"), 3)
    }
    assert(boom.getMessage.contains("not a single token"))
    // under Tok.Ml the same query ranks the ru docs that contain the
    // word (20, 21) above everything; the unrelated ru doc and all
    // non-ru docs score 0 and never surface
    val top = Retrieval.bm25TopK(fx, "text", "doc_id", Seq("данных"), 2,
        tok = Tok.Ml)
      .select("doc_id").as[Long].collect().toSet
    assert(top == Set(20L, 21L), s"got $top")
    // and a zh single-ideograph query works the same way (per-codepoint
    // tokens make single characters the match unit)
    val zh = Retrieval.bm25TopK(fx, "text", "doc_id", Seq("习"), 2,
        tok = Tok.Ml)
      .select("doc_id").as[Long].collect().toSet
    assert(zh == Set(0L, 1L), s"got $zh")
  }
}
