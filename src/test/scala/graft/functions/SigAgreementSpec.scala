package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Pins the native `sig_agreement` kernel (the LSH signature prefilter's
  * estimator) to a SQL restatement over real MinHash signatures, and its
  * edge semantics (length mismatch → min-length prefix, empty → 0). */
class SigAgreementSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("native sig_agreement == SQL positionwise-equality mean on real signatures") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = docs.limit(64).select(
      GraftFunctions.minhashSig(
        GraftFunctions.shinglesNative($"text", 3), 32).as("sig"))
    val pairs = sigs.select($"sig".as("a"))
      .crossJoin(sigs.select($"sig".as("b")))
    // SQL form: mean of positionwise equality over zipped components
    val sqlAgree = aggregate(
      zip_with($"a", $"b", (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size($"a")
    val diff = pairs.select(
      GraftFunctions.sigAgreement($"a", $"b").as("nat"), sqlAgree.as("sql"))
      .where(abs($"nat" - $"sql") > 1e-12)
    assert(diff.count() == 0)
  }

  test("identical = 1, disjoint-valued = 0, mismatched lengths use the common prefix") {
    GraftFunctions.register(spark)
    val row = Seq((Seq(1, 2, 3, 4), Seq(1, 2, 3, 4), Seq(5, 6, 7, 8), Seq(1, 2)))
      .toDF("a", "b", "c", "d")
      .select(
        GraftFunctions.sigAgreement($"a", $"b").as("same"),
        GraftFunctions.sigAgreement($"a", $"c").as("none"),
        GraftFunctions.sigAgreement($"a", $"d").as("prefix"),
        GraftFunctions.sigAgreement(
          array().cast("array<int>"), $"a").as("empty"))
      .head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 0.0)
    assert(row.getDouble(2) == 1.0) // first two components agree
    assert(row.getDouble(3) == 0.0)
  }

  test("minhash prefix property: an h-wide signature is the first h components of any k >= h signature") {
    // component j hashes with murmur3 seed j regardless of k — this is
    // what lets a STORED h-wide signature head agree positionwise with
    // heads sliced from any probe signature (the persisted-index
    // prefilter's correctness hinges on it)
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      GraftFunctions.minhashSig(
        GraftFunctions.shinglesNative($"text", 3), 64).as("h64"),
      slice(GraftFunctions.minhashSig(
        GraftFunctions.shinglesNative($"text", 3), 128), 1, 64).as("h128s"))
      .where($"h64" =!= $"h128s")
    assert(diff.count() == 0)
  }

  test("sig_agreement rejects non-array<int> inputs") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      Seq((Seq("x"), Seq(1))).toDF("a", "b")
        .select(expr("sig_agreement(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("sig_agreement") ||
      err.getMessage.toLowerCase.contains("array"))
  }
}
