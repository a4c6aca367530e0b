package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID kernel — the codegen'd form of
  * [[TextAnalysis.langId]] (bit-identical semantics, pinned by
  * TextAnalysisSpec), with every table GENERATED from [[LangProfiles]]
  * (the no-drift source both DuckDB oracle fragments also derive from).
  *
  * Two families, in order: script-ratio rules (one codepoint pass
  * counting the tracked Unicode scripts, then the ordered threshold
  * checks — ja before zh, since Japanese text carries Han), then
  * stopword voting over the normalized tokens (each token ONE hash-map
  * probe yielding a language bitmask, inside whole-stage codegen; argmax
  * = highest score, then highest language code).
  *
  * Why native: the Column form filters the token array once per language
  * — interpreted higher-order `filter` passes per row (round-1 profile
  * measured ~100× on a corpus scan); here the whole vote is one
  * codegen'd loop. */
object LangIdUtil {

  /** Stopword-voted language codes in ascending order — vote index =
    * position (the tie-break relies on this order: ascending scan with
    * `>=` makes the LATER code win equal scores). */
  private val langCodes: Array[UTF8String] =
    LangProfiles.stopwords.keys.toArray.sorted.map(UTF8String.fromString)

  private val und = UTF8String.fromString("und")

  /** token -> bitmask of languages whose stopword list contains it (words
    * like "de"/"la" legitimately vote for several Romance languages). */
  private val stopwordMask: java.util.HashMap[UTF8String, Integer] = {
    val codeIdx = langCodes.zipWithIndex.map { case (c, i) => c.toString -> i }.toMap
    val m = new java.util.HashMap[UTF8String, Integer]()
    for ((code, words) <- LangProfiles.stopwords; w <- words) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, Integer.valueOf(
        (if (prev == null) 0 else prev.intValue()) | (1 << codeIdx(code))))
    }
    m
  }

  /** The distinct scripts any rule counts, with a dense index. */
  private val trackedScripts: Array[Character.UnicodeScript] =
    LangProfiles.scriptRules.flatMap(_.scripts).distinct.toArray
  private val scriptIdx: java.util.EnumMap[Character.UnicodeScript, Integer] = {
    val m = new java.util.EnumMap[Character.UnicodeScript, Integer](
      classOf[Character.UnicodeScript])
    trackedScripts.zipWithIndex.foreach { case (s, i) => m.put(s, i) }
    m
  }
  /** (code, tracked-script indices, threshold) in rule order. */
  private val rules: Array[(UTF8String, Array[Int], Double)] =
    LangProfiles.scriptRules.map { r =>
      (UTF8String.fromString(r.code),
        r.scripts.map(s => scriptIdx.get(s).intValue()).toArray,
        r.threshold)
    }.toArray

  /** Script-rule decision, or null when no rule fires. ASCII fast path:
    * a text with no high bytes has every tracked-script count 0 without
    * leaving the byte array. One codepoint pass for all rules. */
  private def scriptLang(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return null
    val s = text.toString
    val counts = new Array[Int](trackedScripts.length)
    var cp = 0
    var n = 0
    while (cp < s.length) {
      val c = s.codePointAt(cp)
      val idx = scriptIdx.get(Character.UnicodeScript.of(c))
      if (idx != null) counts(idx.intValue()) += 1
      n += 1
      cp += Character.charCount(c)
    }
    if (n == 0) return null
    var r = 0
    while (r < rules.length) {
      val (code, idxs, thr) = rules(r)
      var hits = 0
      var j = 0
      while (j < idxs.length) { hits += counts(idxs(j)); j += 1 }
      if (hits.toDouble / n > thr) return code
      r += 1
    }
    null
  }

  def langId(text: UTF8String): UTF8String = {
    val scripted = scriptLang(text)
    if (scripted != null) return scripted
    // Vote over the SCRIPT-AWARE tokens (round 14): bit-identical to the
    // Latin kernel on pure-ASCII text (every frozen vote is unchanged),
    // but Latin-script languages with diacritics (vi, tr, pl, …) now
    // vote on their true words instead of ASCII fragments — the Latin
    // tokenizer split "für" into "f"/"r" (its own stopword could never
    // match) and minted false votes from stripped fragments ("kadarı" →
    // "kadar"). Scripts the ratio rules route never reach the vote.
    val toks = ShingleUtil.normTokensMl(text)
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
