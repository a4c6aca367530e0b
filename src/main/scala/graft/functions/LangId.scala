package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID kernel — the codegen'd form of
  * [[TextAnalysis.langId]] (bit-identical semantics, pinned by
  * TextAnalysisSpec): tokenize via [[ShingleUtil.normTokens]], vote each
  * token against the per-language stopword lists (multiplicity-aware), take
  * the (score, lang) argmax with `array_max` struct ordering (highest
  * score, then highest language code), gate on the CJK character ratio,
  * fall back to "und".
  *
  * Why native: the Column form filters the token array once per language —
  * four interpreted higher-order `filter` passes per row, the last
  * non-codegen corpus-scan kernel in the hot set (round-1 profile). Here
  * each token does ONE hash-map probe yielding a language bitmask, inside
  * whole-stage codegen. */
object LangIdUtil {

  /** Language codes in ascending order — vote index = position. */
  private val langCodes: Array[UTF8String] =
    Array("de", "en", "es", "fr").map(UTF8String.fromString)

  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")

  /** token -> bitmask of languages whose stopword list contains it (words
    * like "de"/"la" legitimately vote for several Romance languages). */
  private val stopwordMask: java.util.HashMap[UTF8String, Integer] = {
    val lists = Map(
      0 -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "ich", "zu", "mit", "auf", "für", "sich"),
      1 -> Seq("the", "and", "of", "to", "in", "is", "it", "you", "that", "was", "for", "are", "with", "this"),
      2 -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "se", "no", "los", "las", "por"),
      3 -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans", "ce", "pas", "sur"))
    val m = new java.util.HashMap[UTF8String, Integer]()
    for ((idx, words) <- lists; w <- words) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << idx)))
    }
    m
  }

  /** Han-script codepoint count ÷ total codepoint count (the `[\p{IsHan}]`
    * regexp-count ratio of the Column form). ASCII fast path: a text with
    * no high bytes has CJK ratio 0 without leaving the byte array. */
  private def cjkRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return 0.0
    val s = text.toString
    var cp = 0
    var han = 0
    var n = 0
    while (cp < s.length) {
      val c = s.codePointAt(cp)
      if (Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN) han += 1
      n += 1
      cp += Character.charCount(c)
    }
    if (n == 0) 0.0 else han.toDouble / n
  }

  def langId(text: UTF8String): UTF8String = {
    if (cjkRatio(text) > 0.3) return zh
    val toks = ShingleUtil.normTokens(text)
    val votes = new Array[Int](langCodes.length)
    var i = 0
    while (i < toks.length) {
      val m = stopwordMask.get(toks(i))
      if (m != null) {
        val mask = m.intValue()
        var j = 0
        while (j < votes.length) {
          if ((mask & (1 << j)) != 0) votes(j) += 1
          j += 1
        }
      }
      i += 1
    }
    // argmax with array_max struct ordering: highest score wins; on a tie
    // the LATER (greater) language code wins — ascending scan with >=.
    var best = 0
    var bestIdx = -1
    var j = 0
    while (j < votes.length) {
      if (votes(j) >= best && votes(j) > 0) { best = votes(j); bestIdx = j }
      j += 1
    }
    if (bestIdx < 0) und else langCodes(bestIdx)
  }
}

/** `lang_id(string) -> string` — codegen'd heuristic language ID. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any =
    LangIdUtil.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdUtil.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
