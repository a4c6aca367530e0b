package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Span-dedup specs, anchored on an independent brute-force oracle: a
  * plain-Scala reimplementation of "drop every token covered by any
  * duplicated n-token window" that never touches Spark. Covers cross-doc
  * repeats, within-doc repeats, repeats longer than n (overlapping-window
  * union), the all-covered doc, docs shorter than n, minCount, the
  * ngramsNative↔normTokens positional alignment the operator relies on,
  * and layout invariance. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  /** Same normalization as ShingleUtil.normTokens (pinned by ShinglesSpec). */
  private def norm(text: String): Array[String] =
    text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").filter(_.nonEmpty)

  /** Brute-force reference: every n-token window is a span; any span with
    * >= minCount total occurrences marks all its positions (in every
    * occurrence) covered; surviving tokens rejoin in order. */
  private def bruteForce(docs: Seq[(Long, String)], n: Int,
      minCount: Int): Map[Long, String] = {
    val toks = docs.map { case (id, t) => id -> norm(t) }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq
      pos <- 0 to tk.length - n if tk.length >= n
    } yield (tk.slice(pos, pos + n).mkString(" "), id, pos)
    val dup = occ.groupBy(_._1).filter(_._2.size >= minCount).keySet
    val covered: Map[Long, Set[Int]] = occ.filter(o => dup(o._1))
      .flatMap { case (_, id, pos) => (pos until pos + n).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    toks.map { case (id, tk) =>
      val cov = covered.getOrElse(id, Set.empty)
      id -> tk.zipWithIndex.collect { case (t, i) if !cov(i) => t }.mkString(" ")
    }
  }

  private def run(docs: Seq[(Long, String)], n: Int = 4,
      minCount: Int = 2): Map[Long, String] =
    SpanDedup.removeDuplicatedSpans(
      docs.toDF("doc_id", "text"), "text", "doc_id", n, minCount)
      .select("doc_id", "text").as[(Long, String)].collect().toMap

  private def check(docs: Seq[(Long, String)], n: Int = 4,
      minCount: Int = 2): Map[Long, String] = {
    val got = run(docs, n, minCount)
    val want = bruteForce(docs, n, minCount)
    assert(got == want, s"spark=$got vs brute-force=$want")
    got
  }

  test("a span shared by two docs is removed from BOTH; unique prose survives") {
    val out = check(Seq(
      1L -> "alpha prose here then please subscribe to newsletter and alpha tail",
      2L -> "beta intro please subscribe to newsletter beta ending words",
      3L -> "gamma gamma unrelated content entirely"))
    // the 4-token repeat is gone from both, flanks intact
    assert(out(1L) == "alpha prose here then and alpha tail")
    assert(out(2L) == "beta intro beta ending words")
    assert(out(3L) == "gamma gamma unrelated content entirely")
  }

  test("a repeat LONGER than n is fully removed via overlapping-window union") {
    // 6-token repeat with n=4: windows at offsets 0,1,2 union to all 6
    // tokens; flanks differ per doc so no boundary-crossing window repeats
    val rep = "one two three four five six"
    val out = check(Seq(
      1L -> s"alpha begins $rep alpha closes",
      2L -> s"beta starting $rep beta finish"))
    assert(out(1L) == "alpha begins alpha closes")
    assert(out(2L) == "beta starting beta finish")
  }

  test("a span repeated only WITHIN one doc is also removed (total-occurrence counting)") {
    val out = check(Seq(
      1L -> "loop body w x y z middle w x y z done",
      2L -> "unrelated second document text"))
    assert(out(1L) == "loop body middle done")
  }

  test("a doc that is one big duplicated span comes back empty, not dropped") {
    val out = check(Seq(
      1L -> "the exact same sentence",
      2L -> "the exact same sentence",
      3L -> "a genuinely different document"))
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == "" && out(2L) == "")
  }

  test("docs shorter than n tokens contribute no spans and survive normalized") {
    val out = check(Seq(
      1L -> "tiny doc",
      2L -> "tiny doc",
      3L -> "third one here"), n = 4)
    // identical 2-token docs are NOT span-duplicates at n=4
    assert(out(1L) == "tiny doc" && out(2L) == "tiny doc")
  }

  test("minCount raises the bar; minCount < 2 rejected") {
    val docs = Seq(
      1L -> "shared four token span plus a",
      2L -> "shared four token span plus b",
      3L -> "other words entirely here now")
    check(docs, n = 4, minCount = 3) // 2 occurrences < 3 → kept (parity-checked)
    intercept[IllegalArgumentException] {
      SpanDedup.removeDuplicatedSpans(
        docs.toDF("doc_id", "text"), "text", "doc_id", 4, 1)
    }
  }

  test("duplicatedSpans positions align with the normalized token stream") {
    // Punctuation/case noise shifts RAW character offsets but must not
    // shift TOKEN positions — the alignment ADVICE flagged as untested.
    val docs = Seq(
      1L -> "Intro!! Words... (please) SUBSCRIBE to, newsletter; now extra",
      2L -> "please subscribe to newsletter now unrelated tail tokens")
    val dup = SpanDedup.duplicatedSpans(
        docs.toDF("doc_id", "text"), "text", "doc_id", n = 5)
      .as[(Long, Int, Long)].collect().toSet
    // "please subscribe to newsletter now" starts at token 2 in doc 1
    // (intro, words) and token 0 in doc 2; both occurrences counted
    assert(dup == Set((1L, 2, 2L), (2L, 0, 2L)))
  }

  test("layout invariance, column passthrough, and count preservation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 2 === 0,
          lit(" shared sponsor message please subscribe today")).otherwise(lit(""))))
    def fp(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      SpanDedup.removeDuplicatedSpans(df, "text", "doc_id", n = 4)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .as[(Long, String)].collect().toMap
    val a = fp(docs)
    val b = fp(docs.repartition(13, col("lang")))
    assert(a == b)
    val out = SpanDedup.removeDuplicatedSpans(docs, "text", "doc_id", n = 4)
    assert(out.columns.toSet == docs.columns.toSet, "non-text columns preserved")
    assert(out.count() == docs.count())
  }
}
