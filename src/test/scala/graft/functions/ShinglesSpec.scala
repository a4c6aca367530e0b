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

  test("native ngrams == SQL bigram construction (multiplicity preserved)") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // SQL form: zip each token with its successor, keeping duplicates
    val t = TextAnalysis.tokens($"text")
    val sqlBigrams = org.apache.spark.sql.functions.when(
      org.apache.spark.sql.functions.size(t) < 2,
      org.apache.spark.sql.functions.array().cast("array<string>"))
      .otherwise(org.apache.spark.sql.functions.zip_with(
        org.apache.spark.sql.functions.slice(t,
          org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.size(t) - 1),
        org.apache.spark.sql.functions.slice(t,
          org.apache.spark.sql.functions.lit(2),
          org.apache.spark.sql.functions.size(t) - 1),
        (a, b) => org.apache.spark.sql.functions.concat_ws(" ", a, b)))
    val diff = docs.select(sqlBigrams.as("sql_b"),
      GraftFunctions.ngramsNative($"text", 2).as("nat_b"))
      .where($"sql_b" =!= $"nat_b")
    assert(diff.count() == 0)
    // ngrams keeps duplicates that shingles would collapse
    val reps = Seq("go go go go").toDF("text").select(
      GraftFunctions.ngramsNative($"text", 2).as("n"),
      GraftFunctions.shinglesNative($"text", 2).as("s")).head()
    assert(reps.getSeq[String](0) == Seq("go go", "go go", "go go"))
    assert(reps.getSeq[String](1) == Seq("go go"))
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

  test("native hash_array64 == interpreted transform(xxhash64) bit-for-bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{transform, xxhash64}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val diff = docs
      .select(GraftFunctions.shinglesNative($"text", 3).as("sh"))
      .select(
        GraftFunctions.hashArray64($"sh").as("nat"),
        transform($"sh", s => xxhash64(s)).as("hof"))
      .where($"nat" =!= $"hof")
    assert(diff.count() == 0, "kernel must reproduce xxhash64 exactly (seed 42)")
  }
}
