package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Chunking specs: window tiling, overlap, tail handling, degenerate
  * inputs — checked against a hand-rolled reference chunker. */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def collectChunks(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))

  test("chunks tile the token sequence with the requested overlap") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = collectChunks(Chunking.chunkByTokens(df, "text", "doc_id", 4, 1))
    // stride 3: starts 0,3,6,9 — start 9's window is just t10, which the
    // start-6 window already covers (new tokens would begin at 9+1 = 10,
    // past the end), so the tail window is skipped
    assert(chunks.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(chunks.map(_._4).toSeq == Seq(4L, 4L, 4L))
  }

  test("a trailing window with no new tokens is skipped") {
    // 5 tokens, chunk 4, overlap 3 ⇒ stride 1: start 4 has new token t5;
    // with 4 tokens exactly, starts 1..3 would add nothing after start 0
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val chunks = collectChunks(Chunking.chunkByTokens(df, "text", "doc_id", 4, 3))
    assert(chunks.map(_._3).toSeq == Seq("a b c d"), chunks.mkString(","))
  }

  test("short and empty docs") {
    val df = Seq(
      (1L, "only three tokens"),
      (2L, ""),
      (3L, "...!!!")).toDF("doc_id", "text")
    val chunks = collectChunks(Chunking.chunkByTokens(df, "text", "doc_id", 64, 16))
    assert(chunks.map(r => (r._1, r._3)).toSeq == Seq((1L, "only three tokens")))
  }

  test("matches a hand-rolled chunker on the real corpus; no shuffle in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = collectChunks(
      Chunking.chunkByTokens(docs, "text", "doc_id", 64, 16))
    val expected = docs.select("doc_id", "text").as[(Long, String)].collect()
      .sortBy(_._1).flatMap { case (id, text) =>
        val t = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split("\\s+").filter(_.nonEmpty)
        if (t.isEmpty) Seq.empty
        else (0 until t.length by 48)
          .filter(s => s == 0 || s + 16 < t.length)
          .zipWithIndex.map { case (s, i) =>
            val w = t.slice(s, s + 64)
            (id, i.toLong, w.mkString(" "), w.length.toLong)
          }
      }
    assert(got.toSeq == expected.toSeq)
    val plan = Chunking.chunkByTokens(docs, "text", "doc_id", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("reconstruction property: dropping each window's overlap re-concatenates to the token sequence") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val chunks = collectChunks(Chunking.chunkByTokens(docs, "text", "doc_id", 64, 16))
    val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
      val toks = cs.sortBy(_._2).zipWithIndex.flatMap { case ((_, _, text, _), i) =>
        val ws = text.split(" ").toSeq
        if (i == 0) ws else ws.drop(16) // strip the overlap of every later window
      }
      id -> toks.mkString(" ")
    }
    val expected = docs.select("doc_id", "text")
      .as[(Long, String)].collect().map { case (id, text) =>
        id -> text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split("\\s+").filter(_.nonEmpty).mkString(" ")
      }.filter(_._2.nonEmpty).toMap
    assert(rebuilt == expected, "chunks must losslessly cover the token sequence")
  }

  test("parameter validation") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "text", "doc_id", 0))
    intercept[IllegalArgumentException](Chunking.chunkByTokens(df, "text", "doc_id", 4, 4))
  }
}
