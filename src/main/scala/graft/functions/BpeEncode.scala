package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding SERVING kernel — the public GPT-2 BPE algorithm
  * (Sennrich et al. ACL 2016; the gpt-2 reference encoder): pre-tokenize
  * with the engine's normalization ([[ShingleUtil.normTokens]] — the
  * same word stream every other text operator counts), then merge each
  * word's character symbols bottom-up under a trained merge table,
  * lowest rank first, all occurrences left-to-right non-overlapping.
  *
  * Implementation shape: merges apply in RANK ORDER, one exhaustive
  * pass per rank — provably equivalent to the canonical
  * min-rank-pair-first loop when every merge's output symbol is fresh
  * (a symbol is created by exactly one merge, so applying rank k can
  * only enable pairs that MENTION out_k, and any merge mentioning out_k
  * was learned after k; [[graft.operators.Bpe.train]] guarantees
  * freshness by construction). The rank-order form is what the DuckDB
  * oracle restates as a fixed chain of string replaces — same theorem,
  * both engines.
  *
  * Per-encoder word cache: corpora repeat words (Zipf), so each word
  * encodes once. The encoder travels as a codegen REFERENCE OBJECT,
  * which Spark shares across every task thread running the plan in one
  * executor — the cache is a ConcurrentHashMap for that reason (a plain
  * HashMap would race under concurrent put and can corrupt).
  *
  * The cache is CAPPED, not "bounded by the observed vocabulary": a
  * web-scale corpus's distinct-word tail is unbounded (hex ids, numbers
  * and URLs survive normTokens), so a long-lived executor caching every
  * word it ever saw would OOM at the 100 TB horizon. Two guards, both
  * cheap: words longer than `maxCachedWordLen` never cache (long
  * pseudo-words are exactly the unbounded tail, and their re-encode
  * cost is what the Zipf head never pays anyway), and insertion stops
  * once the map holds `maxCacheEntries` (the Zipf head is cached by
  * then; the size() read is approximate under concurrency, so the cap
  * may overshoot by a handful of in-flight puts — a bound, not a
  * ledger). Encoding an uncached word is always correct, only slower. */
final class BpeEncoder(val merges: Array[String],
    maxCacheEntries: Int = BpeEncoder.DefaultMaxCacheEntries,
    maxCachedWordLen: Int = BpeEncoder.DefaultMaxCachedWordLen,
    val ml: Boolean = false) extends Serializable {

  /** Parsed merge table in rank order: (left, right, joined). */
  @transient private lazy val table: Array[(String, String, String)] =
    merges.map { m =>
      val i = m.indexOf(' ')
      require(i > 0 && i < m.length - 1, s"malformed merge '$m' (want 'left right')")
      val a = m.substring(0, i)
      val b = m.substring(i + 1)
      (a, b, a + b)
    }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** BPE pieces of ONE pre-tokenized word. */
  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms: Array[String] = {
      val out = new Array[String](word.codePointCount(0, word.length))
      var i = 0; var j = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        out(j) = word.substring(i, i + n)
        i += n; j += 1
      }
      out
    }
    var r = 0
    while (r < table.length && syms.length > 1) {
      val (a, b, ab) = table(r)
      // one exhaustive left-to-right non-overlapping pass (sufficient:
      // merging (a,b) cannot create a new (a,b) adjacency — the fresh
      // output ab differs from both a and b)
      var i = 0
      var found = false
      while (!found && i < syms.length - 1) {
        found = syms(i) == a && syms(i + 1) == b
        i += 1
      }
      if (found) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var p = 0
        while (p < syms.length) {
          if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
            out += ab; p += 2
          } else { out += syms(p); p += 1 }
        }
        syms = out.toArray
      }
      r += 1
    }
    if (word.length <= maxCachedWordLen && cache.size() < maxCacheEntries)
      cache.put(word, syms)
    syms
  }

  /** Test hook: current cache occupancy. */
  private[graft] def cachedWords: Int = cache.size()

  // ── vocab ids ─────────────────────────────────────────────────────────
  // The merge table alone defines a TOTAL, deterministic id space over
  // every piece serving can emit (a trainer consumes input_ids, not
  // piece strings):
  //   [0, M)                      merge outputs, id = rank
  //   [M, M + 0x110000)           single code points, id = M + codepoint
  //                               (serving only ever emits merge outputs
  //                               or single code points — any multi-char
  //                               piece was built by some merge)
  //   [M + 0x110000, 2(M+0x110000))  the same space with the '▁'
  //                               word-boundary marker bit set
  // Sparse by design: a frozen-table id space needs determinism and
  // losslessness, not density (remapping to a dense range is a bijection
  // a trainer can apply downstream if it cares).

  @transient private lazy val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](table.length * 2)
    var i = 0
    while (i < table.length) { m.put(table(i)._3, i); i += 1 }
    m
  }

  /** Offset the marker bit adds: size of the unmarked id space. */
  def markerOffset: Int = merges.length + 0x110000

  /** Vocab id of one emitted piece (marked or unmarked). Throws on a
    * string outside the emittable space (a multi-code-point piece that
    * is no merge output cannot come from this table's serving). */
  def idOfPiece(piece: String): Int = {
    val marked = piece.startsWith("▁")
    val base = if (marked) piece.substring(1) else piece
    require(base.nonEmpty, s"empty piece '$piece'")
    val r = rankOf.get(base)
    val pid =
      if (r != null) r.intValue()
      else {
        require(base.codePointCount(0, base.length) == 1,
          s"piece '$base' is neither a merge output nor a single code " +
            "point - not emittable by this merge table's serving")
        merges.length + base.codePointAt(0)
      }
    if (marked) pid + markerOffset else pid
  }

  /** Inverse of [[idOfPiece]] (tests / detokenization). */
  def pieceOfId(id: Int): String = {
    require(id >= 0 && id < 2 * markerOffset, s"id $id out of range")
    val marked = id >= markerOffset
    val pid = if (marked) id - markerOffset else id
    val base =
      if (pid < merges.length) table(pid)._3
      else new String(Character.toChars(pid - merges.length))
    if (marked) "▁" + base else base
  }

  /** Vocab ids of a SPACE-JOINED piece stream (the `chunk_text` a
    * BPE-driven [[graft.operators.Chunking]] emits — pieces never
    * contain spaces, so the join is lossless). One kernel call per
    * chunk row; no re-encoding — the pieces are already BPE output,
    * this is a pure id lookup. */
  def idsOfJoinedPieces(joined: UTF8String): GenericArrayData = {
    val s = joined.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val parts = s.split(' ')
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = idOfPiece(parts(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** DETOKENIZE a vocab-id stream back to normalized text — the exact
    * inverse of `encodePieces → idsOf`: each id maps back to its piece
    * ([[pieceOfId]]), '▁'-marked pieces start a new space-separated
    * word, unmarked pieces append to the current word. By the marker
    * convention, `decodeIds(ids(pieces(text)))` equals the SPACE-JOINED
    * normTokens of `text` exactly (normalization itself is lossy by
    * design; the piece/id stream is lossless from there) — the
    * round-trip a trainer's data-loading path relies on, and what the
    * q_bpe_roundtrip oracle pins against DuckDB's independent
    * normalization. */
  def decodeIds(ids: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      val p = pieceOfId(ids.getInt(i))
      if (p.startsWith("▁")) {
        if (sb.length > 0) sb.append(' ')
        sb.append(p, 1, p.length)
      } else sb.append(p)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Pieces of a whole text: normTokens words, each BPE-encoded, flat in
    * token order. The FIRST piece of every word carries the
    * SentencePiece-style word-boundary marker '▁' (public convention),
    * so the flat stream is losslessly detokenizable — a chunk window
    * that splits mid-word can never conflate piece boundaries with word
    * boundaries when the pieces are re-joined as text. */
  def encodePieces(text: UTF8String): GenericArrayData = {
    // `ml` selects the script-aware tokenizer upstream of the merges —
    // the char-level symbol/merge machinery is script-agnostic already
    // (code-point symbols, ids cover all of Unicode), only the
    // pre-tokenization gated non-Latin text out.
    val toks = if (ml) ShingleUtil.normTokensMl(text)
      else ShingleUtil.normTokens(text)
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      val pieces = encodeWord(toks(i).toString)
      var j = 0
      while (j < pieces.length) {
        out += UTF8String.fromString(
          if (j == 0) "▁" + pieces(0) else pieces(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object BpeEncoder {
  /** ~1M cached words × (word + pieces ≈ 200 B) ≈ 200 MB/executor worst
    * case — the Zipf head of any natural-language corpus fits well
    * inside (a 100k-word vocabulary saturates BPE statistics; see
    * [[graft.operators.Bpe.train]]'s cap rationale). */
  val DefaultMaxCacheEntries: Int = 1 << 20
  /** Natural words are short; longer strings are the ids/hashes/URLs
    * tail that would otherwise grow the cache without ever repeating. */
  val DefaultMaxCachedWordLen: Int = 32
}

/** `bpe_pieces(string) -> array<string>` under a literal merge table —
  * the BPE piece stream of a document's normalized tokens. Codegen'd:
  * the encoder travels as a codegen reference object, one JVM call per
  * row inside whole-stage codegen (the LangIdExpr shape). */
case class BpeEncodeExpr(child: Expression, merges: Array[String],
    ml: Boolean = false) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pieces"

  @transient private lazy val encoder = new BpeEncoder(merges, ml = ml)

  override def nullSafeEval(input: Any): Any =
    encoder.encodePieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodePieces($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** `bpe_piece_ids(string) -> array<int>` under a literal merge table —
  * vocab ids of a space-joined piece stream (see
  * [[BpeEncoder.idsOfJoinedPieces]]). Codegen'd like [[BpeEncodeExpr]]. */
case class BpePieceIdsExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "bpe_piece_ids"

  @transient private lazy val encoder = new BpeEncoder(merges)

  override def nullSafeEval(input: Any): Any =
    encoder.idsOfJoinedPieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.idsOfJoinedPieces($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpePieceIdsExpr =
    copy(child = newChild)
}

/** `bpe_decode(array<int>) -> string` under a literal merge table —
  * detokenize a vocab-id stream back to normalized text (see
  * [[BpeEncoder.decodeIds]]; the inverse of `bpe_piece_ids ∘
  * bpe_pieces`). Codegen'd like [[BpeEncodeExpr]]. */
case class BpeDecodeExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"

  @transient private lazy val encoder = new BpeEncoder(merges)

  override def nullSafeEval(input: Any): Any =
    encoder.decodeIds(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decodeIds($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeExpr =
    copy(child = newChild)
}
