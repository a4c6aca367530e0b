package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession
import graft.functions.{BpeEncoder, GraftFunctions}

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("encodeWord: canonical BPE merge semantics, hand-checked") {
    // merges learned in rank order; 'lo' before 'low' etc.
    val enc = new BpeEncoder(Array("l o", "lo w", "e r", "low er"))
    assert(enc.encodeWord("lower").toSeq == Seq("lower"))
    assert(enc.encodeWord("low").toSeq == Seq("low"))
    assert(enc.encodeWord("older").toSeq == Seq("o", "l", "d", "er"))
    assert(enc.encodeWord("lolo").toSeq == Seq("lo", "lo"))
    // left-to-right non-overlap: 'aaa' under (a,a) -> [aa, a]
    val aa = new BpeEncoder(Array("a a"))
    assert(aa.encodeWord("aaa").toSeq == Seq("aa", "a"))
    assert(aa.encodeWord("aaaa").toSeq == Seq("aa", "aa"))
    // single char / empty are untouched
    assert(aa.encodeWord("b").toSeq == Seq("b"))
  }

  test("train: deterministic across partitionings; merges are fresh-output; frequency order") {
    val corpus = Seq.fill(50)("the cat sat on the mat with the hat") ++
      Seq.fill(10)("dogs dig big pits")
    val df1 = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m1 = Bpe.train(df1, "text", numMerges = 20)
    val m2 = Bpe.train(df1.repartition(7), "text", numMerges = 20)
    assert(m1.merges.toSeq == m2.merges.toSeq,
      "training must not depend on partitioning")
    // top pair count is a TIE ('a t' in cat/sat/mat/hat = 200 ≡ 't h' in
    // the×150 + with×50) — lexicographic break picks 'a t' first, and
    // 'the' still assembles right after
    assert(m1.merges.take(3).toSeq == Seq("a t", "t h", "th e"))
    // fresh-output guarantee: no two merges produce the same symbol, and
    // no output collides with a single character
    val outs = m1.merges.map(m => m.split(' ').mkString)
    assert(outs.distinct.length == outs.length)
    assert(outs.forall(_.length > 1))
  }

  test("rank-ordered serving == canonical min-rank-first loop on the frozen model") {
    // independent reference: the textbook min-rank-pair-first algorithm
    def reference(word: String, merges: Array[String]): Seq[String] = {
      val rank = merges.zipWithIndex.map { case (m, i) =>
        val Array(a, b) = m.split(' '); ((a, b), i)
      }.toMap
      var syms = word.map(_.toString).toVector
      var cont = true
      while (cont && syms.length > 1) {
        val pairs = syms.zip(syms.tail)
        val best = pairs.filter(rank.contains).sortBy(rank).headOption
        best match {
          case None => cont = false
          case Some((a, b)) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var p = 0
            while (p < syms.length) {
              if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
                out += (a + b); p += 2
              } else { out += syms(p); p += 1 }
            }
            syms = out.toVector
        }
      }
      syms
    }
    val enc = new BpeEncoder(FrozenBpe.model.merges)
    val words = docs.select(explode(GraftFunctions.normTokens($"text")))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(enc.encodeWord(w).toSeq == reference(w, FrozenBpe.model.merges),
        s"serving divergence on word '$w'")
    }
    // and the merges genuinely compress: the corpus piece count is
    // strictly under its character count and at or above its word count
    val stats = Bpe.tokenCounts(docs, "text", "doc_id", FrozenBpe.model)
      .agg(sum($"n_pieces"), sum($"n_tokens")).head()
    val chars = docs.select(sum(length(regexp_replace(lower($"text"),
      "[^a-z0-9]+", "")))).head().getLong(0)
    assert(stats.getLong(0) < chars && stats.getLong(0) >= stats.getLong(1))
  }

  test("tokenCount composes as the mass column for mixing/packing accounting") {
    GraftFunctions.register(spark)
    val withMass = docs.withColumn("bpe_n",
      Bpe.tokenCount($"text", FrozenBpe.model))
    // mixing on BPE mass: same operator, true-token accounting
    val mixed = Sampling.mixToTokenShares(withMass, "doc_id", "source",
      "bpe_n", Map("src0" -> 0.5, "src1" -> 0.5))
    val kept = mixed.groupBy($"source")
      .agg(sum($"bpe_n").as("mass")).collect()
    assert(kept.nonEmpty && kept.forall(r => Set("src0", "src1")(r.getString(0))))
    // the kernel is codegen-friendly: one narrow projection, no Exchange
    val plan = withMass.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE count must not shuffle:\n$plan")

    // the marked piece stream is losslessly detokenizable: concatenating
    // pieces and splitting on the '▁' word-boundary marker reconstructs
    // the exact normalized word stream (piece boundaries never conflate
    // with word boundaries)
    val one = docs.limit(5)
    val roundTrips = one.select(
      GraftFunctions.normTokens($"text").as("words"),
      Bpe.pieces($"text", FrozenBpe.model).as("ps"))
      .as[(Seq[String], Seq[String])].collect()
    roundTrips.foreach { case (words, ps) =>
      assert(ps.mkString("").split("▁").filter(_.nonEmpty).toSeq == words,
        "piece stream must detokenize to the word stream")
    }

    // chunking by BPE pieces: same windows machinery, piece units — the
    // budget counts what the trainer actually packs
    val bpeChunks = Chunking.chunkByTokens(docs, "text", "doc_id",
      chunkTokens = 64, overlapTokens = 16,
      tokenizer = Some(Bpe.pieces($"text", FrozenBpe.model)))
    assert(bpeChunks.where($"n_chunk_tokens" > 64).count() == 0)
    val pieceTotal = docs.select(
      sum(size(Bpe.pieces($"text", FrozenBpe.model)))).head().getLong(0)
    val chunked = bpeChunks
      .agg(sum(when($"chunk_idx" === 0, $"n_chunk_tokens")
        .otherwise($"n_chunk_tokens" - 16))).head().getLong(0)
    // windows advance by stride 48 with 16 overlap: non-overlap mass
    // reassembles the full piece stream (trailing-window skip rule means
    // every piece is covered exactly once beyond the overlaps)
    assert(chunked == pieceTotal,
      s"BPE chunk windows must cover the piece stream: $chunked vs $pieceTotal")
  }

  test("word cache is capped: long words and past-cap words encode correctly without caching") {
    val enc = new BpeEncoder(Array("a a"), maxCacheEntries = 2,
      maxCachedWordLen = 8)
    // a word over the length bound encodes correctly and never caches
    val long = "a" * 20
    assert(enc.encodeWord(long).toSeq ==
      Seq.fill(10)("aa"), "uncached encode must stay correct")
    assert(enc.cachedWords == 0, "over-length words must not cache")
    // entry cap: third distinct short word encodes but does not insert
    enc.encodeWord("aab"); enc.encodeWord("abab")
    assert(enc.cachedWords == 2)
    enc.encodeWord("bbaa")
    assert(enc.cachedWords == 2, "cache must stop growing at the cap")
    assert(enc.encodeWord("bbaa").toSeq == Seq("b", "b", "aa"),
      "past-cap words re-encode correctly every call")
  }

  test("vocab ids: piece<->id bijection; engine input_ids reassemble real chunk piece streams") {
    val enc = new BpeEncoder(FrozenBpe.model.merges)
    // round-trip for every emittable shape: merge output, single char,
    // digit — marked and unmarked
    for (p <- Seq("low", "▁low", "x", "▁x", "9", "▁9"))
      assert(enc.pieceOfId(enc.idOfPiece(p)) == p, s"round-trip failed on '$p'")
    // a multi-char non-output is not emittable and must fail loudly
    intercept[IllegalArgumentException](enc.idOfPiece("zq"))
    // kernel ids over real BPE chunk texts decode back to the pieces
    GraftFunctions.register(spark)
    val chunks = Chunking.chunkByTokens(docs, "text", "doc_id", 64, 16,
      tokenizer = Some(Bpe.pieces($"text", FrozenBpe.model)))
    val rows = chunks.select($"chunk_text",
      Bpe.pieceIds($"chunk_text", FrozenBpe.model).as("ids")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pieces = r.getString(0).split(' ').toSeq
      val ids = r.getSeq[Int](1)
      assert(ids.map(enc.pieceOfId) == pieces,
        s"ids must decode to the pieces for chunk '${r.getString(0).take(60)}'")
    }
  }

  test("Model rejects non-fresh external merge tables; train output always passes") {
    // duplicate output: ranks 1 and 2 both create 'ab'
    val dup = intercept[IllegalArgumentException] {
      Bpe.Model(Array("a b", "a b"))
    }
    assert(dup.getMessage.contains("duplicates"))
    // output of rank 1 ('cd') was a constituent of rank 0 — min-rank and
    // rank-order serving diverge on such tables
    val constit = intercept[IllegalArgumentException] {
      Bpe.Model(Array("cd e", "c d"))
    }
    assert(constit.getMessage.contains("constituent"))
    // a trained table is fresh by construction and must construct fine
    val corpus = Seq.fill(20)("the cat sat on the mat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Bpe.Model(Bpe.train(corpus, "text", numMerges = 10).merges)
    Bpe.Model(FrozenBpe.model.merges)
  }

  test("bpe_decode: ids round-trip to the normalized text, kernel and Column form") {
    import graft.functions.{BpeEncoder, GraftFunctions}
    val enc = new BpeEncoder(FrozenBpe.model.merges)
    // kernel level: decode(ids(pieces(text))) == space-joined normTokens
    Seq("The Quick, Brown FOX!! jumps 42 times...",
        "unicode words stay words", "", "1234 ab12cd") .foreach { text =>
      val pieces = enc.encodePieces(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val ids = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        (0 until pieces.numElements()).map(i =>
          enc.idOfPiece(pieces.getUTF8String(i).toString): Any).toArray)
      val decoded = enc.decodeIds(ids).toString
      val want = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      assert(decoded == want, s"'$text' -> '$decoded' want '$want'")
    }
    // pieceOfId is the exact inverse over the whole emittable id space
    // the frozen corpus exercises
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    GraftFunctions.register(spark)
    import GraftFunctions.{bpeDecode, bpePieceIds, bpePieces}
    val m = FrozenBpe.model.merges
    val bad = docs.select(col("doc_id"),
        bpeDecode(bpePieceIds(
          concat_ws(" ", bpePieces(col("text"), m)), m), m).as("decoded"),
        concat_ws(" ",
          graft.functions.GraftFunctions.normTokens(col("text"))).as("want"))
      .where(col("decoded") =!= col("want"))
    assert(bad.isEmpty, s"round-trip must hold corpus-wide: ${bad.limit(3).collect().toSeq}")
  }
}
