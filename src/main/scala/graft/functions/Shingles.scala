package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize/shingle kernels. Semantically identical to the SQL
  * chain `split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")`
  * (+ n-gram/distinct for shingles) — pinned by ShinglesSpec against the
  * Column-expression versions in [[TextAnalysis]] — but evaluated as one
  * byte scan instead of four interpreted string expressions. Tokenization
  * dominates every text-dedup scan; interpreted ConcatWs-inside-transform
  * is the single hottest frame in a corpus-scale profile.
  *
  * Byte-level note: after UTF8String.toLowerCase, the kept alphabet is
  * single-byte [a-z0-9]; every other byte (including all UTF-8
  * continuation bytes) is a separator, and separator runs collapse —
  * exactly what the regex does on valid UTF-8. */
object ShingleUtil {

  private val SPACE = UTF8String.fromString(" ")

  // ── multilingual (script-aware) tokenizer ─────────────────────────────
  //
  // THE single source of the script table: the Java kernel's classifier
  // and the DuckDB oracle's regex classes are BOTH generated from the
  // rows below (the LangProfiles / piiClasses no-drift discipline). Both
  // engines read the same Unicode Script property (Java
  // Character.UnicodeScript == RE2 \p{Script}), so the only drift surface
  // is the Unicode VERSION of recently-added codepoints.

  /** Scripts tokenized PER CODEPOINT (no whitespace between words —
    * every ideograph/syllable is its own token, so shingles/LM n-grams
    * become character n-grams, the standard CJK retrieval unit). */
  private[graft] val mlCjkScripts: Seq[(Character.UnicodeScript, String)] = {
    import Character.UnicodeScript._
    Seq(HAN -> "Han", HIRAGANA -> "Hiragana", KATAKANA -> "Katakana",
      HANGUL -> "Hangul")
  }

  /** Scripts tokenized as LOWERCASED RUNS (whitespace-delimited words;
    * Latin includes the ASCII fast path plus diacritics — "café" stays
    * one token here where the Latin-only kernel truncates it). Thai has
    * no inter-word spaces, so a Thai "run" is a phrase-level unit — still
    * a usable dedup/LM token; codepoint-level Thai would need a
    * dictionary segmenter (out of the zero-dependency scope). */
  private[graft] val mlWordScripts: Seq[(Character.UnicodeScript, String)] = {
    import Character.UnicodeScript._
    Seq(LATIN -> "Latin", CYRILLIC -> "Cyrillic", GREEK -> "Greek",
      ARABIC -> "Arabic", HEBREW -> "Hebrew", DEVANAGARI -> "Devanagari",
      THAI -> "Thai")
  }

  private val mlCjkSet: java.util.EnumSet[Character.UnicodeScript] = {
    val s = java.util.EnumSet.noneOf(classOf[Character.UnicodeScript])
    mlCjkScripts.foreach(r => s.add(r._1)); s
  }
  private val mlWordSet: java.util.EnumSet[Character.UnicodeScript] = {
    val s = java.util.EnumSet.noneOf(classOf[Character.UnicodeScript])
    mlWordScripts.foreach(r => s.add(r._1)); s
  }

  /** RE2/DuckDB char-class body of the per-codepoint scripts. */
  private[graft] def mlSqlCjkClass: String =
    mlCjkScripts.map(r => s"\\p{${r._2}}").mkString
  /** RE2/DuckDB char-class body of the run scripts. */
  private[graft] def mlSqlWordClass: String =
    mlWordScripts.map(r => s"\\p{${r._2}}").mkString

  /** The DuckDB restatement of [[normTokensMl]] for a text expression —
    * oracle SQL is GENERATED from here so it cannot drift from the
    * kernel: lowercase (utf8proc simple mapping ≡ the kernel's
    * per-codepoint Character.toLowerCase), space-pad every CJK codepoint,
    * collapse everything outside the kept classes to spaces, split. */
  private[graft] def mlSqlTokens(expr: String): String =
    s"list_filter(regexp_split_to_array(regexp_replace(regexp_replace(" +
      s"lower($expr), '([$mlSqlCjkClass])', ' \\1 ', 'g'), " +
      s"'[^0-9$mlSqlWordClass$mlSqlCjkClass]+', ' ', 'g'), ' '), t -> t <> '')"

  private final val ClsSep = 0
  private final val ClsRun = 1
  private final val ClsCjk = 2

  /** Codepoint class under the ml tokenizer: ASCII fast path, then the
    * Unicode Script property against the two generated sets. */
  private def mlClassify(cp: Int): Int =
    if (cp < 128) {
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')) ClsRun
      else ClsSep
    } else {
      val sc = Character.UnicodeScript.of(cp)
      if (mlCjkSet.contains(sc)) ClsCjk
      else if (mlWordSet.contains(sc)) ClsRun
      else ClsSep
    }

  /** SCRIPT-AWARE normalized tokens: Latin/digit runs exactly as
    * [[normTokens]] (BIT-IDENTICAL on pure-ASCII input — pinned by
    * ShinglesSpec, so every frozen Latin oracle stays valid under a
    * tokenizer swap), per-codepoint tokens for Han/kana/Hangul, and
    * lowercased word runs for the other [[mlWordScripts]]. Lowercasing
    * is the per-codepoint SIMPLE mapping (Character.toLowerCase(int)):
    * locale- and context-free, matching DuckDB's utf8proc `lower()` —
    * the String.toLowerCase the Latin kernel rides would diverge on
    * context-sensitive mappings (Greek final sigma).
    *
    * Classify-order note: this kernel classifies the ORIGINAL
    * codepoint's script and then lowercases, while the generated oracle
    * SQL ([[mlSqlTokens]]) lowercases the whole string first and
    * classifies the lowered codepoint. The orders agree because no
    * simple case mapping crosses a kept-class boundary — pinned over
    * the entire codepoint space by ShinglesSpec's classify-order sweep
    * (a second potential drift surface beside the acknowledged
    * utf8proc-vs-JDK Unicode-version one, both now named). */
  def normTokensMl(text: UTF8String): Array[UTF8String] = {
    val s = text.toString
    val out = new java.util.ArrayList[UTF8String]()
    val run = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      mlClassify(cp) match {
        case ClsRun => run.appendCodePoint(Character.toLowerCase(cp))
        case ClsCjk =>
          if (run.length > 0) {
            out.add(UTF8String.fromString(run.toString)); run.setLength(0)
          }
          out.add(UTF8String.fromString(
            new String(Character.toChars(Character.toLowerCase(cp)))))
        case _ =>
          if (run.length > 0) {
            out.add(UTF8String.fromString(run.toString)); run.setLength(0)
          }
      }
      i += Character.charCount(cp)
    }
    if (run.length > 0) out.add(UTF8String.fromString(run.toString))
    out.toArray(new Array[UTF8String](out.size()))
  }

  def tokensMlArray(text: UTF8String): GenericArrayData =
    new GenericArrayData(normTokensMl(text).asInstanceOf[Array[Any]])

  /** [[ngrams]] over the ml token stream. */
  def ngramsMl(text: UTF8String, n: Int): GenericArrayData =
    ngramsOf(normTokensMl(text), n)

  /** [[shingles]] over the ml token stream. */
  def shinglesMl(text: UTF8String, n: Int): GenericArrayData =
    shinglesOf(normTokensMl(text), n)

  /** Normalized whitespace tokens, multiplicity and order preserved. */
  def normTokens(text: UTF8String): Array[UTF8String] = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    while (i <= bytes.length) {
      val isTokenByte = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      }
      if (isTokenByte) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = -1
      }
      i += 1
    }
    out.toArray(new Array[UTF8String](out.size()))
  }

  def tokensArray(text: UTF8String): GenericArrayData =
    new GenericArrayData(normTokens(text).asInstanceOf[Array[Any]])

  /** Word n-grams (space-joined) with multiplicity and order preserved —
    * the repetition-analysis counterpart of [[shingles]] (which dedups for
    * set-similarity). Gopher-style repetition filters need the duplicate
    * n-grams that set semantics would erase. */
  def ngrams(text: UTF8String, n: Int): GenericArrayData =
    ngramsOf(normTokens(text), n)

  private def gramAt(toks: Array[UTF8String], i: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n) {
      parts(2 * j) = toks(i + j)
      if (j < n - 1) parts(2 * j + 1) = SPACE
      j += 1
    }
    UTF8String.concat(parts: _*)
  }

  private def ngramsOf(toks: Array[UTF8String], n: Int): GenericArrayData = {
    if (toks.length < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      out(i) = gramAt(toks, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles (space-joined), first-occurrence order. */
  def shingles(text: UTF8String, n: Int): GenericArrayData =
    shinglesOf(normTokens(text), n)

  private def shinglesOf(toks: Array[UTF8String], n: Int): GenericArrayData = {
    if (toks.length < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= toks.length) {
      seen.add(gramAt(toks, i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }
}

/** `norm_tokens_ml(string) -> array<string>` — codegen'd script-aware
  * multilingual tokenizer ([[ShingleUtil.normTokensMl]]). */
case class NormTokensMl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "norm_tokens_ml"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.tokensMlArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.tokensMlArray($c)")

  override protected def withNewChildInternal(newChild: Expression): NormTokensMl =
    copy(child = newChild)
}

/** `ngrams_ml(string, n) -> array<string>` — [[NGramsExpr]] over the ml
  * token stream. */
case class NGramsMlExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "ngrams_ml: n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_ml"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.ngramsMl(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.ngramsMl($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramsMlExpr =
    copy(child = newChild)
}

/** `shingles_ml(string, n) -> array<string>` — [[ShinglesExpr]] over the
  * ml token stream. */
case class ShinglesMlExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingles_ml: n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_ml"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shinglesMl(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shinglesMl($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesMlExpr =
    copy(child = newChild)
}

/** `norm_tokens(string) -> array<string>` — codegen'd native tokenizer. */
case class NormTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "norm_tokens"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.tokensArray($c)")

  override protected def withNewChildInternal(newChild: Expression): NormTokens =
    copy(child = newChild)
}

/** `ngrams(string, n) -> array<string>` — codegen'd multiplicity-preserving
  * word n-grams (repetition analysis; [[ShinglesExpr]] dedups instead). */
case class NGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "ngrams: n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramsExpr =
    copy(child = newChild)
}

/** `shingles(string, n) -> array<string>` — codegen'd native shingler. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingles: n must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}
