package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Tok}

/** Trained byte-pair encoding — the token accounting a REAL pre-training
  * run uses (Sennrich et al. ACL 2016, the GPT-2 reference encoder —
  * public literature/code). The whitespace/regex token proxies elsewhere
  * in the engine approximate cost; a trained BPE counts the pieces the
  * trainer actually packs, so chunking/packing/mixing can run on the
  * true mass: every operator that takes a token-count COLUMN
  * ([[Sampling.mixToTokenShares]]'s `tokenCol`, [[Packing]]'s
  * `nTokensCol`) composes with [[tokenCount]] directly.
  *
  * TRAINING shape (the 100 TB story): ONE distributed word histogram
  * (explode → count), capped at the `maxVocabWords` most frequent words
  * (count desc, word asc — deterministic), collected to the driver —
  * the standard practice: BPE statistics saturate long before the tail
  * of the vocabulary, and the driver state is bounded by the cap, not
  * the corpus. The merge loop itself is the classic sequential
  * algorithm over that histogram (inherently iterative — the same
  * driver-loop-over-bounded-state shape as k-means/logreg training
  * here). Ties break lexicographically; a candidate pair whose
  * concatenation collides with an EXISTING symbol is skipped, so every
  * merge output is FRESH — the property that makes rank-ordered serving
  * provably equal to the canonical min-rank loop (and the oracle's
  * fixed replace chain equal to both; see
  * [[graft.functions.BpeEncoder]]).
  *
  * SERVING shape: one narrow codegen'd projection — the
  * [[graft.functions.BpeEncodeExpr]] kernel with the merge table as a
  * plan literal; no shuffle, no UDF, no join. */
object Bpe {

  /** A trained merge table, rank-ordered; each entry is "left right".
    *
    * Validates FRESHNESS, not just shape: the engine serves merges in
    * rank order (one exhaustive pass per rank — see
    * [[graft.functions.BpeEncoder]]), which is provably equal to the
    * canonical min-rank-pair-first loop ONLY when every merge's output
    * symbol is fresh. [[train]] guarantees freshness by construction; an
    * EXTERNAL table (e.g. a string-level restatement of real GPT-2
    * merges) can violate it — and would previously tokenize silently
    * divergently. The checks (each O(V) with a hash set):
    *   - no output equals an earlier or later output (duplicate outputs
    *     mean one string was "created twice" — the conflation the
    *     equivalence proof excludes);
    *   - no output equals a CONSTITUENT of an earlier-rank merge (an
    *     earlier merge consuming a later output's string means min-rank
    *     order and rank order disagree on which applies first);
    *   - no output is a single code point (it would collide with a base
    *     character symbol that exists before any merge). */
  final case class Model(merges: Array[String]) {
    require(merges.forall(m => m.count(_ == ' ') == 1),
      "each merge must be 'left right'")
    locally {
      val outputs = scala.collection.mutable.HashSet.empty[String]
      val earlierConstituents = scala.collection.mutable.HashSet.empty[String]
      merges.zipWithIndex.foreach { case (m, rank) =>
        val i = m.indexOf(' ')
        val a = m.substring(0, i); val b = m.substring(i + 1)
        val out = a + b
        require(out.codePointCount(0, out.length) > 1,
          s"merge #$rank '$m': output '$out' is a single code point and " +
            "collides with a base symbol - not a fresh-output table. " +
            "Rank-ordered serving requires fresh outputs; use Bpe.train " +
            "(fresh by construction) or a canonical min-rank encoder for " +
            "this table.")
        require(!outputs.contains(out),
          s"merge #$rank '$m': output '$out' duplicates an earlier merge's " +
            "output - not a fresh-output table (see Model scaladoc).")
        require(!earlierConstituents.contains(out),
          s"merge #$rank '$m': output '$out' is a constituent of an " +
            "earlier-rank merge - rank-ordered serving would diverge from " +
            "canonical min-rank BPE on this table (see Model scaladoc).")
        outputs += out
        earlierConstituents += a
        earlierConstituents += b
      }
    }
  }

  /** Train `numMerges` BPE merges on a text column. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 100000, tok: Tok = Tok.Latin): Model = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxVocabWords > 0, s"maxVocabWords must be positive, got $maxVocabWords")
    GraftFunctions.register(df.sparkSession)
    // ONE distributed pass: word histogram, deterministically capped
    val hist: Array[(String, Long)] = df
      .select(explode(tok.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver-side classic merge loop over (word -> (symbols, count))
    var words: Array[(Array[String], Long)] = hist.map { case (w, n) =>
      val syms = new Array[String](w.codePointCount(0, w.length))
      var i = 0; var j = 0
      while (i < w.length) {
        val c = Character.charCount(w.codePointAt(i))
        syms(j) = w.substring(i, i + c); i += c; j += 1
      }
      (syms, n)
    }
    val symbols = scala.collection.mutable.HashSet.empty[String]
    words.foreach(_._1.foreach(symbols += _))
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (merges.size < numMerges && !done) {
      // adjacent-pair counts over the current segmentation
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      // best FRESH-output pair: max count, ties lexicographic; pairs
      // whose concatenation is already a symbol are skipped (freshness
      // is what licenses rank-ordered serving — see scaladoc)
      val best = pairCounts.iterator
        .filter { case ((a, b), _) => !symbols.contains(a + b) }
        .reduceOption { (x, y) =>
          if (x._2 > y._2) x
          else if (y._2 > x._2) y
          else if ((x._1._1 + " " + x._1._2)
            .compareTo(y._1._1 + " " + y._1._2) <= 0) x
          else y
        }
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += s"$a $b"
          symbols += (a + b)
          val ab = a + b
          words = words.map { case (syms, n) =>
            var has = false
            var i = 0
            while (!has && i < syms.length - 1) {
              has = syms(i) == a && syms(i + 1) == b; i += 1
            }
            if (!has) (syms, n)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var p = 0
              while (p < syms.length) {
                if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
                  out += ab; p += 2
                } else { out += syms(p); p += 1 }
              }
              (out.toArray, n)
            }
          }
      }
    }
    Model(merges.toArray)
  }

  /** The BPE piece stream of a text column (array<string>), one narrow
    * codegen'd kernel call per row. Session must be
    * [[GraftFunctions.register]]ed. */
  def pieces(c: Column, model: Model, tok: Tok = Tok.Latin): Column =
    GraftFunctions.bpePieces(c, model.merges, tok)

  /** Trained-BPE token count — drop-in mass column for
    * chunking/packing/mixing accounting. */
  def tokenCount(c: Column, model: Model, tok: Tok = Tok.Latin): Column =
    size(pieces(c, model, tok))

  /** Vocab ids (array<int>) of a SPACE-JOINED piece stream column — the
    * `chunk_text` a BPE-driven [[Chunking.chunkByTokens]] emits. The id
    * space is total and deterministic from the merge table alone
    * ([[graft.functions.BpeEncoder.idOfPiece]]: merge rank, then code
    * points, doubled by the '▁' word-boundary bit), so a trainer gets
    * `input_ids` without any extra vocabulary artifact. Pure lookup —
    * no re-encoding. */
  def pieceIds(joinedPieces: Column, model: Model): Column =
    GraftFunctions.bpePieceIds(joinedPieces, model.merges)

  /** Per-document BPE accounting: (idCol, n_tokens, n_pieces, pieces_fp)
    * — word count, piece count, and an md5 fingerprint of the full
    * piece stream (order-sensitive). One narrow scan. */
  def tokenCounts(df: DataFrame, textCol: String, idCol: String,
      model: Model, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val p = pieces(col(textCol), model, tok)
    df.select(col(idCol),
      size(tok.tokens(col(textCol))).cast("long").as("n_tokens"),
      size(p).cast("long").as("n_pieces"),
      md5(concat_ws(" ", p)).as("pieces_fp"))
  }
}
