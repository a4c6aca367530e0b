package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Pins the native tokenize/shingle kernels to the SQL column versions —
  * the DuckDB oracle for q_ngram_jaccard_pairs is written against the SQL
  * semantics, so the native path must be bit-equal on real data. */
class ShinglesSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("native norm_tokens == SQL tokens on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      TextAnalysis.tokens($"text").as("sql_t"),
      GraftFunctions.normTokens($"text").as("nat_t"))
      .where($"sql_t" =!= $"nat_t")
    assert(diff.count() == 0)
  }

  test("native shingles == SQL shingles (as sets) on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      org.apache.spark.sql.functions.array_sort(
        TextAnalysis.shingles($"text", 3)).as("sql_s"),
      org.apache.spark.sql.functions.array_sort(
        GraftFunctions.shinglesNative($"text", 3)).as("nat_s"))
      .where($"sql_s" =!= $"nat_s")
    assert(diff.count() == 0)
  }

  test("native kernels on edge cases: empty, punctuation-only, unicode, short") {
    GraftFunctions.register(spark)
    val df = Seq("", "!!! ???", "Héllo wörld foo", "a b").toDF("text")
    val rows = df.select(
      TextAnalysis.tokens($"text").as("sql_t"),
      GraftFunctions.normTokens($"text").as("nat_t"),
      org.apache.spark.sql.functions.array_sort(TextAnalysis.shingles($"text", 3)).as("sql_s"),
      org.apache.spark.sql.functions.array_sort(GraftFunctions.shinglesNative($"text", 3)).as("nat_s"))
      .collect()
    rows.foreach { r =>
      // SQL split("", " ") yields [""] while the native tokenizer yields [] —
      // both produce ZERO shingles, which is the semantics dedup consumes.
      val sqlToks = r.getSeq[String](0).filter(_.nonEmpty)
      assert(sqlToks == r.getSeq[String](1), s"tokens mismatch: $r")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"shingles mismatch: $r")
    }
  }
}
