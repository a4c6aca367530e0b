package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Sequence-packing specs: the greedy rule at the budget boundary, the
  * oversized-chunk-alone case, split/shard isolation, layout invariance
  * (the same examples on any input partitioning), budget/fill invariants
  * on the real chunked corpus, and the loud input-validation failures. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  /** (doc_id, chunk_idx, n_chunk_tokens) fixture frame. */
  private def chunks(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("doc_id", "chunk_idx", "n_chunk_tokens")

  test("greedy boundary: a chunk that would exceed the budget starts the next example") {
    // one doc => one (split, shard) group; order is by chunk_idx
    val df = chunks((1L, 0L, 60L), (1L, 1L, 30L), (1L, 2L, 20L), (1L, 3L, 100L))
    val out = Packing.assignExamples(df, tokenBudget = 100)
      .select("chunk_idx", "example_idx").as[(Long, Long)].collect().toMap
    // 60 -> ex0(60); +30 -> ex0(90); +20 would hit 110 > 100 -> ex1(20); +100
    // would hit 120 -> ex2(100): exactly-at-budget fits, one-past does not
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("exact-fit chunk stays in the current example (boundary is strict >)") {
    val df = chunks((1L, 0L, 60L), (1L, 1L, 40L), (1L, 2L, 1L))
    val out = Packing.assignExamples(df, tokenBudget = 100)
      .select("chunk_idx", "example_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L))
  }

  test("oversized chunk occupies an example alone") {
    val df = chunks((1L, 0L, 50L), (1L, 1L, 500L), (1L, 2L, 50L))
    val rolled = Packing.packExamples(df, tokenBudget = 100)
    val byMembers = rolled.select("members", "n_tokens", "fill_ratio")
      .as[(String, Long, Double)].collect()
      .map { case (m, n, f) => (m, (n, f)) }.toMap
    assert(byMembers.keySet == Set("1:0", "1:1", "1:2"),
      s"each chunk should pack alone, got ${byMembers.keySet}")
    assert(byMembers("1:1") == ((500L, 5.0)), "oversized chunk reported over-budget")
    // no example BELOW the budget exceeds it
    assert(rolled.where(col("n_tokens") > 100 && col("members") =!= "1:1").count() == 0)
  }

  test("examples never cross splits") {
    val df = chunks((1L, 0L, 10L), (1L, 1L, 10L)).withColumn("split", lit("train"))
      .unionByName(chunks((1L, 2L, 10L), (1L, 3L, 10L)).withColumn("split", lit("test")))
    val out = Packing.assignExamples(df, tokenBudget = 1000, splitCol = Some("split"))
    // all four chunks of doc 1 fit one budget, but the split boundary holds
    val groups = out.groupBy("split").agg(
      countDistinct(col("example_idx")).as("nex"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (s, e, n) => (s, (e, n)) }.toMap
    assert(groups == Map("train" -> ((1L, 2L)), "test" -> ((1L, 2L))))
  }

  test("layout invariance: identical examples on any input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ch = Chunking.chunkByTokens(docs, "text", "doc_id", 64, 16)
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packExamples(df, tokenBudget = 256, shardHexDigits = 2)
        .select("example_id", "n_tokens", "members")
        .as[(String, Long, String)].collect().toSet
    val a = run(ch)
    val b = run(ch.repartition(17, col("chunk_idx")))
    val c = run(ch.orderBy(col("n_chunk_tokens").desc))
    assert(a == b && a == c, "packing must be a pure function of row values")
    assert(a.nonEmpty)
  }

  test("corpus invariants: chunk partition is exact; fill is high; budget holds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ch = Chunking.chunkByTokens(docs, "text", "doc_id", 64, 16)
    val budget = 256L
    val packed = Packing.packExamples(ch, budget)
    // every chunk appears in exactly one example
    val nMembers = packed.select(explode(split(col("members"), ",")).as("m")).count()
    assert(nMembers == ch.count())
    assert(packed.select(explode(split(col("members"), ",")).as("m"))
      .groupBy("m").count().where(col("count") > 1).count() == 0)
    // chunkTokens (64) <= budget, so nothing can exceed the budget
    assert(packed.where(col("n_tokens") > budget).count() == 0)
    // greedy over 64-token-max chunks cannot leave more than 63 tokens of
    // headroom in any NON-TERMINAL example of a shard; just bound the mean
    val meanFill = packed.agg(avg(col("fill_ratio"))).as[Double].head()
    assert(meanFill > 0.6, s"mean fill ratio $meanFill suspiciously low")
  }

  test("null or negative token counts fail loudly") {
    val withNull = chunks((1L, 0L, 10L))
      .unionByName(Seq((2L, 0L)).toDF("doc_id", "chunk_idx")
        .withColumn("n_chunk_tokens", lit(null).cast("long")))
    val eNull = intercept[Exception] {
      Packing.assignExamples(withNull, tokenBudget = 100).collect()
    }
    assert(eNull.getMessage.contains("must be non-null"),
      s"unexpected error: ${eNull.getMessage}")
    val eNeg = intercept[Exception] {
      Packing.assignExamples(chunks((1L, 0L, -5L)), tokenBudget = 100).collect()
    }
    assert(eNeg.getMessage.contains("must be non-null"),
      s"unexpected error: ${eNeg.getMessage}")
  }

  test("doc_starts: exclusive prefix sums of member counts in pack order — the attention-reset offsets") {
    // shard/split mix: offsets restart per example; pack order is
    // (doc_id, chunk_idx) — the members string's own order
    val df = chunks((1L, 0L, 60L), (1L, 1L, 40L), (1L, 2L, 30L),
      (1L, 3L, 70L), (1L, 4L, 100L))
    val rolled = Packing.packExamples(df, tokenBudget = 100)
      .select("members", "doc_starts").as[(String, Seq[Long])].collect()
      .toMap
    // greedy at 100: [60, 40] -> starts [0, 60]; [30, 70] -> [0, 30];
    // [100] -> [0]
    assert(rolled == Map(
      "1:0,1:1" -> Seq(0L, 60L),
      "1:2,1:3" -> Seq(0L, 30L),
      "1:4" -> Seq(0L)), s"got $rolled")
    // general invariants on real-ish data: first offset 0, one offset
    // per member, strictly monotone when counts are positive, and
    // last + last count == n_tokens
    val many = chunks((1 to 40).map(i => (i.toLong % 5, i.toLong, 7L + i % 13)): _*)
    Packing.packExamples(many, tokenBudget = 64)
      .select("n_chunks", "n_tokens", "doc_starts")
      .as[(Long, Long, Seq[Long])].collect().foreach {
        case (nc, nt, st) =>
          assert(st.length == nc && st.head == 0L)
          assert(st == st.sorted && st.distinct == st)
          assert(st.last < nt)
      }
  }
}
