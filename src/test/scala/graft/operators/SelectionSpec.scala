package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Budget-selection specs: the distributed prefix sum must equal the
  * single-window ground truth on any layout, respect the budget exactly
  * (greedy prefix semantics), handle degenerate budgets, and fail loudly
  * on invalid token counts. */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private lazy val scored = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select(col("doc_id"),
      graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
  }

  /** Ground truth: global window cumsum on a single partition. */
  private def groundTruth(budget: Long): Set[Long] = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id"))
    scored.coalesce(1)
      .withColumn("_run", sum(col("n_tokens")).over(w))
      .where(col("_run") <= budget)
      .select("doc_id").as[Long].collect().toSet
  }

  test("distributed prefix sum == single-window ground truth, on any layout") {
    val budget = 1500L
    val expected = groundTruth(budget)
    assert(expected.nonEmpty && expected.size < scored.count(),
      "fixture budget should select a strict, non-empty prefix")
    def run(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Selection.selectUnderTokenBudget(df, "quality", "n_tokens", "doc_id", budget)
        .select("doc_id").as[Long].collect().toSet
    assert(run(scored) == expected)
    assert(run(scored.repartition(17, col("doc_id"))) == expected)
    assert(run(scored.orderBy(col("n_tokens"))) == expected)
  }

  test("greedy prefix semantics: kept total <= budget; next-in-order doc would overflow") {
    val budget = 1500L
    val kept = Selection.selectUnderTokenBudget(
      scored, "quality", "n_tokens", "doc_id", budget)
    val total = kept.agg(sum("n_tokens")).as[Long].head()
    assert(total <= budget)
    // the first excluded doc in selection order must not have fit
    val all = scored.orderBy(col("quality").desc, col("doc_id"))
      .select("doc_id", "n_tokens").as[(Long, Long)].collect()
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val firstExcluded = all.find(r => !keptIds.contains(r._1))
    firstExcluded.foreach { case (_, n) => assert(total + n > budget) }
    // prefix property: everything BEFORE the first excluded doc is kept
    val prefix = all.takeWhile(r => keptIds.contains(r._1))
    assert(prefix.length == keptIds.size, "kept set must be a contiguous prefix")
  }

  test("degenerate budgets: 0 selects nothing; huge selects everything") {
    assert(Selection.selectUnderTokenBudget(
      scored, "quality", "n_tokens", "doc_id", 0L).count() == 0)
    assert(Selection.selectUnderTokenBudget(
      scored, "quality", "n_tokens", "doc_id", Long.MaxValue / 2).count()
      == scored.count())
    intercept[IllegalArgumentException] {
      Selection.selectUnderTokenBudget(scored, "quality", "n_tokens", "doc_id", -1L)
    }
  }

  test("plan shape: no single-partition exchange anywhere (the scale point)") {
    val plan = Selection.selectUnderTokenBudget(
      scored, "quality", "n_tokens", "doc_id", 1500L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global-window fallback detected:\n$plan")
  }

  test("null or negative token counts fail loudly") {
    val bad = Seq((1L, 0.9, 10L), (2L, 0.5, -3L)).toDF("doc_id", "quality", "n_tokens")
    val e = intercept[Exception] {
      Selection.selectUnderTokenBudget(bad, "quality", "n_tokens", "doc_id", 100L)
        .collect()
    }
    assert(e.getMessage.contains("must be non-null"), s"unexpected: ${e.getMessage}")
  }
}
