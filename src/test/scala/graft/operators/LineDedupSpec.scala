package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Line-dedup specs: cross-doc boilerplate removal, within-doc repeats
  * untouched, blank-line exemption, order preservation, the all-lines-
  * removed edge, layout invariance, and custom separators. */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, String] =
    LineDedup.removeDuplicatedLines(
      rows.toSeq.toDF("doc_id", "text"), "text", "doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toMap

  test("a line shared by >= 2 docs is removed from ALL of them; unique lines survive") {
    val out = run(
      1L -> "alpha prose\nshared footer\nmore alpha",
      2L -> "beta prose\nshared footer",
      3L -> "gamma prose")
    assert(out(1L) == "alpha prose\nmore alpha")
    assert(out(2L) == "beta prose")
    assert(out(3L) == "gamma prose")
  }

  test("a line repeated only WITHIN one doc is kept (distinct-doc counting)") {
    val out = run(
      1L -> "echo\necho\necho",
      2L -> "other text")
    assert(out(1L) == "echo\necho\necho")
  }

  test("blank lines are structure: never counted, always kept; order preserved") {
    val out = run(
      1L -> "keep one\n\nshared\n\nkeep two",
      2L -> "shared\n\nunique")
    assert(out(1L) == "keep one\n\n\nkeep two")
    assert(out(2L) == "\nunique")
  }

  test("a doc that is pure boilerplate comes back with empty text, not dropped") {
    val out = run(
      1L -> "shared only",
      2L -> "shared only",
      3L -> "real content")
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == "" && out(2L) == "")
    assert(out(3L) == "real content")
  }

  test("minDocs raises the duplication bar") {
    val df = Seq(
      1L -> "twice\ncontent a",
      2L -> "twice\ncontent b",
      3L -> "content c").toDF("doc_id", "text")
    val out = LineDedup.removeDuplicatedLines(df, "text", "doc_id", minDocs = 3)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) == "twice\ncontent a", "a 2-doc line survives minDocs=3")
    intercept[IllegalArgumentException] {
      LineDedup.removeDuplicatedLines(df, "text", "doc_id", minDocs = 1)
    }
  }

  test("custom separator is literal, not a regex") {
    val df = Seq(1L -> "a.b|shared", 2L -> "c|shared").toDF("doc_id", "text")
    val out = LineDedup.removeDuplicatedLines(df, "text", "doc_id", sep = "|")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // '.' inside a segment must not split anything (quoted separator)
    assert(out(1L) == "a.b" && out(2L) == "c")
  }

  test("layout invariance and other columns pass through") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 2 === 0, lit("\nshared footer")).otherwise(lit(""))))
    def fp(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      LineDedup.removeDuplicatedLines(df, "text", "doc_id")
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .as[(Long, String)].collect().toMap
    val a = fp(docs)
    val b = fp(docs.repartition(13, col("lang")))
    assert(a == b)
    val out = LineDedup.removeDuplicatedLines(docs, "text", "doc_id")
    assert(out.columns.toSet == docs.columns.toSet, "non-text columns preserved")
    assert(out.count() == docs.count())
  }

  test("collapseRepeatedLines: first occurrence wins WITHIN a doc, blanks survive, no shuffle") {
    val df = Seq(
      (1L, "a\nb\na\n\n\nb\nc\na"),
      (2L, "x\nx\nx"),
      (3L, ""),
      (4L, "  \n  \nunique")).toDF("doc_id", "text")
    val got = LineDedup.collapseRepeatedLines(df, "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == "a\nb\n\n\nc") // repeats drop, both blanks stay, order kept
    assert(got(2L) == "x")
    assert(got(3L) == "")
    assert(got(4L) == "  \n  \nunique") // whitespace-only lines are structure
    // a within-doc repeat is INVISIBLE to the cross-doc pass (distinct-doc
    // counting) — this operator is the one that catches it
    assert(run((10L, "m\nm"))(10L) == "m\nm")
    // narrow: no Exchange in the plan
    val plan = LineDedup.collapseRepeatedLines(df, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
  }
}
