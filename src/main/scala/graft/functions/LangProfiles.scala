package graft.functions

/** THE single source of truth for language identification — every other
  * form (the codegen'd [[LangIdUtil]] kernel, the Column reference form
  * in [[TextAnalysis.langId]], and BOTH DuckDB oracle fragments in
  * SparkEntry) is GENERATED from these tables, so the four surfaces
  * cannot drift (the piiClasses discipline).
  *
  * Two detection families, applied in order:
  *
  *  1. SCRIPT rules ([[scriptRules]], ordered): languages whose script
  *     identifies them outright — the normalized tokenizer is
  *     `[a-z0-9]`-only, so stopword voting cannot see them at all.
  *     Japanese precedes Chinese deliberately: Japanese text carries Han
  *     characters, but kana runs are uniquely Japanese, so a kana ratio
  *     above its (lower) threshold decides first.
  *  2. STOPWORD voting ([[stopwords]]): Latin-script languages vote via
  *     tiny public function-word lists (multiplicity-aware; argmax with
  *     highest-score-then-highest-code tie-break). Lists are ASCII-only
  *     BY CONSTRUCTION — the tokenizer splits words at diacritics, so a
  *     diacritic-bearing stopword would never match — and avoid
  *     top-frequency English collisions (no "a"/"on"/"to"/"at" entries)
  *     so adding a language cannot flip confidently-English documents.
  *
  * Word lists are drawn from public most-frequent-function-word
  * knowledge (the stopwords-iso / NLTK genre of list); they are a
  * ROUTER's signal, not a linguistic resource. */
object LangProfiles {

  /** One script-detection rule: ISO code, the Unicode scripts counted,
    * the same scripts as a Java regex char-class body and as an
    * RE2/DuckDB char-class body, and the codepoint-ratio threshold
    * (rendered via [[thresholdSql]] so kernel and SQL share the exact
    * literal). */
  final case class ScriptRule(code: String,
      scripts: Seq[Character.UnicodeScript],
      javaClass: String, sqlClass: String, threshold: Double) {
    def thresholdSql: String = threshold.toString
  }

  import Character.UnicodeScript._

  val scriptRules: Seq[ScriptRule] = Seq(
    ScriptRule("ja", Seq(HIRAGANA, KATAKANA),
      "\\p{IsHiragana}\\p{IsKatakana}", "\\p{Hiragana}\\p{Katakana}", 0.1),
    ScriptRule("ko", Seq(HANGUL), "\\p{IsHangul}", "\\p{Hangul}", 0.3),
    ScriptRule("zh", Seq(HAN), "\\p{IsHan}", "\\p{Han}", 0.3),
    ScriptRule("ru", Seq(CYRILLIC), "\\p{IsCyrillic}", "\\p{Cyrillic}", 0.3),
    ScriptRule("ar", Seq(ARABIC), "\\p{IsArabic}", "\\p{Arabic}", 0.3),
    ScriptRule("he", Seq(HEBREW), "\\p{IsHebrew}", "\\p{Hebrew}", 0.3),
    ScriptRule("el", Seq(GREEK), "\\p{IsGreek}", "\\p{Greek}", 0.3),
    ScriptRule("hi", Seq(DEVANAGARI), "\\p{IsDevanagari}", "\\p{Devanagari}", 0.3),
    ScriptRule("th", Seq(THAI), "\\p{IsThai}", "\\p{Thai}", 0.3))

  /** Stopword lists per ISO code (the voting family). The original four
    * lists are UNCHANGED (their oracles and fixtures predate this
    * object); the round-12 additions follow the ASCII-only /
    * no-English-collision rules above. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "you", "that", "was", "for", "are", "with", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "ich", "zu", "mit", "auf", "für", "sich"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "se", "no", "los", "las", "por"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans", "ce", "pas", "sur"),
    "it" -> Seq("il", "che", "di", "non", "per", "con", "una", "sono", "anche", "come"),
    "pt" -> Seq("que", "uma", "com", "para", "dos", "mais", "como", "foi", "ele", "isso"),
    "nl" -> Seq("het", "een", "van", "dat", "niet", "voor", "met", "zijn", "ook", "maar"),
    "sv" -> Seq("och", "att", "det", "som", "av", "den", "till", "med", "han", "hon"),
    "da" -> Seq("og", "det", "til", "er", "som", "af", "ikke", "har", "hvad", "hende"),
    "no" -> Seq("og", "det", "til", "er", "som", "av", "ikke", "har", "hva", "noen"),
    "fi" -> Seq("ja", "ei", "se", "mutta", "kun", "niin", "joka", "ovat", "ole", "oli"),
    "pl" -> Seq("nie", "sie", "jest", "ale", "jak", "czy", "tak", "dla", "przez", "tego"),
    "cs" -> Seq("je", "se", "na", "ze", "ale", "jako", "pro", "tak", "ho", "aby"),
    "tr" -> Seq("bir", "ve", "bu", "ne", "gibi", "daha", "ama", "kadar", "olarak", "sonra"),
    "ro" -> Seq("la", "cu", "este", "care", "nu", "pentru", "mai", "sunt", "fost", "dar"),
    "hu" -> Seq("az", "hogy", "nem", "egy", "van", "meg", "mar", "ha", "mint", "ki"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "pada"))

  // ── language classes for PER-SCRIPT quality gating ────────────────────
  // The Gopher word-shape rules (mean word length, alpha-word ratio,
  // stopword floor) assume whitespace-delimited words and an English
  // stopword list; under the script-aware tokenizer they would wrongly
  // gate every CJK document (per-codepoint tokens shift every word-shape
  // distribution). The gate branches on the ALREADY-COMPUTED langId using
  // these classes — single-sourced here so the Spark gate, the DuckDB
  // oracle generator, and the router cannot drift.

  /** Languages whose ml tokens are NOT word-shaped: per-codepoint CJK
    * (ja/ko/zh — Hangul is in the per-codepoint class) and unsegmented
    * Thai (run tokens are phrase-length). Word-shape rules are
    * meaningless here; rely on counts/line-shape/LM/model gates. */
  val noWordShapeLangs: Set[String] = Set("ja", "ko", "zh", "th")

  /** Script-routed languages whose ml tokens ARE word-shaped
    * (whitespace-delimited words) but that carry no stopword list (the
    * router identifies them by script, not votes): word-shape rules
    * apply, the stopword floor does not. */
  val scriptWordLangs: Set[String] = Set("ru", "ar", "he", "el", "hi")

  require(scriptRules.map(_.code).toSet == noWordShapeLangs ++ scriptWordLangs,
    "every script-routed language must be classified for the quality gate")

  /** Deterministic per-language sample sentences — the multilingual
    * FIXTURE the q_lang_id oracle and LangIdSpec run on. Stopword-voted
    * languages sample their own list (self-votes dominate any shared
    * words by construction); script languages get a hand-written natural
    * sentence comfortably above the ratio threshold. */
  val samples: Map[String, String] =
    stopwords.map { case (code, words) => code -> words.mkString(" ") } ++ Map(
      "ja" -> "これは日本語のテストですからスクリプトで分かります",
      "ko" -> "이것은 한국어 테스트 문장입니다 스크립트로 알 수 있습니다",
      "zh" -> "这是一个中文测试句子完全用汉字写成没有假名",
      "ru" -> "это просто пример текста на русском языке для проверки",
      "ar" -> "هذا اختبار باللغة العربية للنص المكتوب",
      "he" -> "זהו מבחן בשפה העברית לטקסט כתוב",
      "el" -> "αυτό είναι ένα ελληνικό κείμενο δοκιμής για έλεγχο",
      "hi" -> "यह हिंदी में एक परीक्षण वाक्य है जो लिपि से पहचाना जाता है",
      "th" -> "นี่คือประโยคทดสอบภาษาไทยสำหรับการตรวจสอบ")

  /** Every identifiable code, ascending — the fixture's branch order. */
  val sampleCodes: Seq[String] = samples.keys.toSeq.sorted
}
