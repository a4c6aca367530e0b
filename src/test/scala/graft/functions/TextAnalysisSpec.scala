package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Text-analysis specs: language ID on real-language sentences (the
  * testdata's `lang` labels are synthetic word-salad, so real semantics are
  * pinned here), token counts, fingerprints, quality components. */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("langId identifies real-language sentences") {
    GraftFunctions.register(spark) // the vote tokenizer is a registered kernel
    val samples = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and it was very happy with that"),
      ("de", "der schnelle braune fuchs springt über den faulen hund und ist sehr glücklich mit der sache"),
      ("es", "el zorro marrón salta sobre el perro perezoso y es muy feliz con la vida en el campo"),
      ("fr", "le renard brun saute sur le chien paresseux et il est très heureux dans la forêt pour toujours"),
      ("zh", "敏捷的棕色狐狸跳过了懒惰的狗它对此感到非常高兴")).toDF("expected", "text")
    val got = samples.select($"expected",
      TextAnalysis.langId($"text").as("pred")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("langId: every LangProfiles sample maps to its own code — 26 languages, kernel == Column form") {
    GraftFunctions.register(spark)
    val df = LangProfiles.sampleCodes
      .map(c => (c, LangProfiles.samples(c))).toDF("code", "text")
    val rows = df.select($"code",
      TextAnalysis.langId($"text").as("col_form"),
      GraftFunctions.langIdNative($"text").as("native")).collect()
    assert(rows.length == 26)
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"Column form: expected ${r.getString(0)} got ${r.getString(1)}")
      assert(r.getString(2) == r.getString(0),
        s"kernel: expected ${r.getString(0)} got ${r.getString(2)}")
    }
    // Japanese (kana + Han) must NOT fall into zh: the ja rule precedes
    val ja = Seq(LangProfiles.samples("ja")).toDF("text")
      .select(GraftFunctions.langIdNative($"text")).head().getString(0)
    assert(ja == "ja")
  }

  test("langId returns 'und' for stopword-free text") {
    GraftFunctions.register(spark)
    val pred = Seq("zzz qqq xxx").toDF("text")
      .select(TextAnalysis.langId($"text")).head().getString(0)
    assert(pred == "und")
  }

  test("native lang_id kernel matches the Column form on fixtures and corpus") {
    GraftFunctions.register(spark)
    val fixtures = Seq(
      "the quick brown fox jumps over the lazy dog and it was very happy",
      "der schnelle braune fuchs springt über den faulen hund und ist sehr glücklich",
      "el zorro marrón salta sobre el perro perezoso y es muy feliz con la vida",
      "le renard brun saute sur le chien paresseux et il est très heureux dans la forêt",
      "敏捷的棕色狐狸跳过了懒惰的狗它对此感到非常高兴",
      "zzz qqq xxx", "", "de la", "un la de", // multi-language ambiguous ties
      "the und el le la").toDF("text")
    val mism = fixtures.select(
      TextAnalysis.langId($"text").as("col_form"),
      GraftFunctions.langIdNative($"text").as("native"))
      .where($"col_form" =!= $"native").collect()
    assert(mism.isEmpty, s"native/Column lang_id disagree: ${mism.mkString(", ")}")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val corpusMism = docs.select(
      TextAnalysis.langId($"text").as("col_form"),
      GraftFunctions.langIdNative($"text").as("native"))
      .where($"col_form" =!= $"native").count()
    assert(corpusMism == 0)
  }

  test("tokenCount and bpeIshTokenCount") {
    val df = Seq("Hello, world! 42 times.").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.bpeIshTokenCount($"text").as("p")).head()
    assert(r.getInt(0) == 4) // hello world 42 times
    // pieces: Hello , world ! 42 times . => 7
    assert(r.getInt(1) == 7)
  }

  test("fingerprint is normalization-invariant; fingerprint64 matches on equal content") {
    val df = Seq(("Hello,   WORLD!", "hello world")).toDF("a", "b")
    val r = df.select(
      (TextAnalysis.fingerprint($"a") === TextAnalysis.fingerprint($"b")).as("eq"),
      (TextAnalysis.fingerprint64($"a") === TextAnalysis.fingerprint64($"b")).as("eq64")).head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("shingles: distinct word n-grams; short text yields empty, not descending sequence") {
    val df = Seq(("a b c d", "a b")).toDF("long", "short")
    val r = df.select(
      TextAnalysis.shingles($"long", 3).as("s3"),
      TextAnalysis.shingles($"short", 3).as("empty")).head()
    assert(r.getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(r.getSeq[String](1).isEmpty)
  }

  test("quality components: prose scores higher than junk") {
    val df = Seq(
      ("prose", "the cat sat on the mat and it was warm in the sun for hours while the birds sang"),
      ("junk", "@@@@ #### $$$$ %%%% 1234 !!!! ???? ****")).toDF("kind", "text")
    val scores = df.select($"kind", TextAnalysis.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("prose") > scores("junk"))
    assert(scores("prose") > 0.5 && scores("junk") < 0.5)
  }

  test("redactPii scrubs emails, URLs, and phone numbers; clean prose unchanged") {
    val df = Seq(
      ("pii", "mail me at jane.doe+spam@corp-mail.co.uk or call +1 (555) 123-4567, docs at https://internal.example.com/a?b=c now"),
      ("clean", "the quick brown fox jumped over the lazy dog in 1999"))
      .toDF("kind", "text")
    val out = df.select($"kind", TextAnalysis.redactPii($"text").as("r"),
      TextAnalysis.piiMatchCount($"text").as("n"))
      .as[(String, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("pii")._1 ==
      "mail me at <EMAIL> or call <PHONE>, docs at <URL> now")
    assert(out("pii")._2 == 3)
    assert(out("clean")._1 == "the quick brown fox jumped over the lazy dog in 1999")
    assert(out("clean")._2 == 0)
  }

  test("redactPii: IP addresses and SSN-shaped ids; URLs stop at any whitespace") {
    val df = Seq(
      ("ip", "server at 192.168.0.12 and 10.0.0.1 responded"),
      ("ssn", "applicant 078-05-1120 approved"),
      // ssn-shaped run inside a phone number must NOT be double-matched:
      // the longer phone-class run is consumed as one phone
      ("url_nl", "see https://example.com/path\nnext line stays intact"),
      ("ver", "version 1.2.3 unchanged")) // not 4 octets → not an IP
      .toDF("kind", "text")
    val out = df.select($"kind", TextAnalysis.redactPii($"text").as("r"),
      TextAnalysis.piiMatchCount($"text").as("n"))
      .as[(String, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("ip") == ("server at <IP> and <IP> responded", 2))
    assert(out("ssn") == ("applicant <SSN> approved", 1))
    assert(out("url_nl") == ("see <URL>\nnext line stays intact", 1),
      "a URL followed by a newline must not swallow the next line")
    assert(out("ver") == ("version 1.2.3 unchanged", 0))
  }

  test("redactPii leaves no raw PII behind on the augmented corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val aug = concat($"text", lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com or +1-555-000-"), lpad($"doc_id".cast("string"), 4, "0"),
      lit(" visit https://example.com/u/"), $"doc_id".cast("string"))
    val redacted = docs.select(TextAnalysis.redactPii(aug).as("r"))
    assert(redacted.where($"r".contains("@example.com")).count() == 0)
    assert(redacted.where($"r".contains("https://")).count() == 0)
    assert(redacted.where($"r".contains("555-000")).count() == 0)
    assert(redacted.where($"r".contains("<EMAIL>") && $"r".contains("<URL>") &&
      $"r".contains("<PHONE>")).count() == docs.count())
  }

  test("stripHtml: blocks removed wholesale, tags stripped, entities single-decoded") {
    def strip(s: String): String =
      Seq(s).toDF("t")
        .select(TextAnalysis.collapseWhitespace(TextAnalysis.stripHtml($"t")))
        .head().getString(0)
    // script/style bodies removed even when they contain tag-shaped code
    assert(strip("a<script>var x = 1 < 2 && 2 > 1;</script>b") == "a b")
    assert(strip("a<style>p > span { color: red }</style>b") == "a b")
    // case-insensitive, attributes, self-closing, close-tag whitespace
    assert(strip("<P CLASS=\"x\">hi</P><br/>there</ScRiPt >") == "hi there")
    assert(strip("x<SCRIPT type=\"a\">alert('y')</SCRIPT >z") == "x z")
    // comments may contain tag-shaped text
    assert(strip("a<!-- <b>bold</b> \n multi-line -->b") == "a b")
    // entities: single decode — &amp;lt; is the TEXT "&lt;", not "<"
    assert(strip("1 &lt; 2 &amp;&amp; 2 &gt; 1") == "1 < 2 && 2 > 1")
    assert(strip("&amp;lt;not-a-tag&amp;gt;") == "&lt;not-a-tag&gt;")
    assert(strip("&quot;q&quot; &#39;a&#39; &apos;b&apos; c&nbsp;d") ==
      "\"q\" 'a' 'b' c d")
    // a decoded &lt;p&gt; is never re-eaten by the tag pass
    assert(strip("&lt;p&gt;literal&lt;/p&gt;") == "<p>literal</p>")
    // plain text with a stray less-than survives (not tag-shaped: no letter)
    assert(strip("1 < 2 and 2 > 1") == "1 < 2 and 2 > 1")
    // full shell
    assert(strip("<!DOCTYPE html><html><head><title>t</title></head>" +
      "<body><p>hello <em>world</em></p></body></html>") == "t hello world")

    // newline-preserving variant: horizontal runs fold, lines survive
    def stripNl(s: String): String =
      Seq(s).toDF("t")
        .select(TextAnalysis.collapseLineWhitespace(TextAnalysis.stripHtml($"t")))
        .head().getString(0)
    assert(stripNl("<p>line one</p>  \n\t <p>line two</p>") == "line one\nline two")
    assert(stripNl("a   b\t\tc") == "a b c")
  }

  test("stripHtml: unterminated tag full of quotes completes in linear time (no ReDoS)") {
    def strip(s: String): String =
      Seq(s).toDF("t")
        .select(TextAnalysis.collapseWhitespace(TextAnalysis.stripHtml($"t")))
        .head().getString(0)
    // A truncated crawl page: an <a …> tag cut off mid-attributes, quote
    // characters scattered through the tail, no closing '>'. With a bare
    // [^>] catch-all overlapping the quote alternatives this costs
    // ~2^(k/2) regex steps (hours at k≈50); with disjoint classes it must
    // fail to match in milliseconds and the text survives verbatim.
    val quotes = (1 to 60).map(i => s"""attr$i="v$i""").mkString(" ")
    val truncated = s"before <a $quotes and then the page was cut off"
    val t0 = System.nanoTime()
    val out = strip(truncated)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, f"unterminated-tag strip took $elapsedMs%.0f ms — backtracking blowup")
    assert(out.startsWith("before <a attr1=") && out.endsWith("cut off"),
      "an unmatchable truncated tag must survive as text, not hang or vanish")
    // Well-formed tags with quoted '>' still stripped (semantics preserved)
    assert(strip("""x<a title="a>b" href='c>d'>y</a>z""") == "x y z")
    // Known limit pinned: a tag whose quote never closes before '>' no
    // longer matches at all (the price of disjoint alternatives)
    assert(strip("""p <a href="broken> q""") == "p <a href=\"broken> q")
  }

  test("redactPii: a megabyte-scale base64-ish blob completes in linear time (no quadratic email scan)") {
    // base64 blobs are pure email-local-class characters with no '@':
    // the unbounded `[…]+@` local part re-consumed the tail of the run
    // from every start position — measured 204 s on a 200 KB run, ~an
    // hour per 1 MB document, per executor core, on exactly the
    // untrusted crawl input this operator is advertised for. With the
    // RFC-5321 64-char bound the scan is O(64·n): a 400 KB blob must
    // redact in well under a second of regex time.
    val blob = "A glance at the log line " + ("ab0Cd1eF".* (50000)) +
      " and the rest of the page"
    val t0 = System.nanoTime()
    val out = Seq(blob).toDF("t")
      .select(TextAnalysis.redactPii($"t").as("r")).head().getString(0)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, f"pii redaction took $elapsedMs%.0f ms — quadratic email scan is back")
    assert(out == blob, "a blob with no PII must pass through unchanged")
    // RFC-bounded local part still redacts ordinary addresses (and the
    // match result is identical in both engines: same generated pattern)
    val email = Seq("mail me at first.last+tag@sub.example.org today").toDF("t")
      .select(TextAnalysis.redactPii($"t")).head().getString(0)
    assert(email == "mail me at <EMAIL> today")
  }

  test("gopherFlags: each rule trips on its planted pathology, prose passes") {
    val prose = ("the quick brown fox jumps over the lazy dog and it was a " +
      "good day for all of you with this fine weather in the field ") * 3
    def flags(s: String): Map[String, Boolean] = {
      val f = Seq(s).toDF("t")
        .select(TextAnalysis.gopherFlags($"t").as("f")).select("f.*").head()
      f.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> f.getBoolean(i) }.toMap
    }
    val good = flags(prose)
    assert(good.values.forall(identity), s"prose must pass all rules: $good")
    // short text fails the word-count floor
    assert(!flags("the cat and dog")("word_count_ok"))
    // symbol wall fails the symbol ratio
    assert(!flags(prose + " " + "# # # # # # # # # # # # # # # # # # # # " * 5)("symbol_ratio_ok"))
    // a bullet wall fails the bullet ratio
    assert(!flags("intro line" + "\n- item" * 20)("bullet_ratio_ok"))
    // mostly-ellipsis lines fail the ellipsis ratio
    assert(!flags("one...\ntwo...\nthree")("ellipsis_ratio_ok"))
    // numeric soup fails the alphabetic-word ratio
    assert(!flags(("12 345 678 " * 30) + "the end")("alpha_word_ratio_ok"))
    // single repeated stopword is NOT >= 2 DISTINCT stopwords
    assert(!flags("the " * 60)("stopword_ok"))
    // pass is the conjunction
    assert(Seq(prose).toDF("t")
      .select(TextAnalysis.gopherPass($"t")).head().getBoolean(0))
    assert(!Seq("the cat").toDF("t")
      .select(TextAnalysis.gopherPass($"t")).head().getBoolean(0))
  }

  test("normalizeUnicode: NFC composes, mojibake repairs, controls strip, nbsp folds") {
    graft.functions.GraftFunctions.register(spark)
    def norm(s: String): String =
      Seq(s).toDF("t").select(UnicodeNorm.normalizeUnicode($"t")).head().getString(0)
    // decomposed accents (e + combining mark) compose to the precomposed form
    assert(norm("Cafe\u0301 nai\u0308ve") == "Caf\u00e9 na\u00efve")
    // composed text is a fixed point
    assert(norm("Caf\u00e9 na\u00efve") == "Caf\u00e9 na\u00efve")
    // every repair-table entry maps to its intended character
    for ((bad, good) <- UnicodeNorm.mojibakeRepairs) {
      val expect = if (good == "\u00A0") " " else good // nbsp folds to space
      assert(norm(s"x${bad}y") == s"x${expect}y", s"repair '$bad' -> '$good'")
    }
    // C0 controls vanish; newline and tab SURVIVE; nbsp becomes a space
    assert(norm("a\u0007bc\nd\te\u00A0f\u0000g") == "abc\nd\te fg")
    // the registered SQL function resolves and agrees with the Column form
    val viaSql = spark.sql("SELECT nfc_normalize('Cafe\u0301')").head().getString(0)
    assert(viaSql == "Caf\u00e9")
    // pure ASCII passes through unchanged (fast path correctness)
    assert(norm("plain ascii text 123") == "plain ascii text 123")
  }

  test("canonicalizeUrl: scheme/host case, www, default ports, fragments, tracking params") {
    def canon(s: String): String =
      Seq(s).toDF("u").select(TextAnalysis.canonicalizeUrl($"u")).head().getString(0)
    // every decoration strips to the same canonical form
    assert(canon("https://WWW.Example.COM/a/b?utm_source=feed") == "https://example.com/a/b")
    assert(canon("https://example.com:443/a/b#frag") == "https://example.com/a/b")
    assert(canon("  https://example.com/a/b  ") == "https://example.com/a/b")
    // first-position tracking param: separator repaired, real param survives
    assert(canon("http://example.com:80/p?utm_a=1&q=2") == "http://example.com/p?q=2")
    assert(canon("https://example.com/p?q=2&fbclid=xyz") == "https://example.com/p?q=2")
    // ALL tracking params gone even when adjacent
    assert(canon("https://example.com/p?utm_a=1&utm_b=2&q=3") == "https://example.com/p?q=3")
    // empty path normalizes to '/'
    assert(canon("HTTPS://User.Example.com:443") == "https://user.example.com/")
    // param names CONTAINING a tracking name survive ('refresh' is not 'ref')
    assert(canon("https://example.com/p?refresh=1") == "https://example.com/p?refresh=1")
    // non-default port and path case are preserved
    assert(canon("https://example.com:8443/Path/B") == "https://example.com:8443/Path/B")
    // schemeless strings pass through trimmed, untouched
    assert(canon(" doc-42 ") == "doc-42")
  }

  test("c4LineClean/c4PageFlags: each C4 rule trips on its planted line, prose survives") {
    val page = Seq(
      "The quick brown fox jumps over the lazy dog.",   // kept
      "click here",                                     // < 3 words, no punct
      "Please enable JavaScript to continue reading.",  // javascript
      "menu home about contact",                        // no terminal punct
      "He said “it ends with a quote mark.”",           // end-quote terminal
      "Is that so? It was! Fine.").mkString("\n")       // multi-sentence
    val cleaned = Seq(page).toDF("t")
      .select(TextAnalysis.c4LineClean($"t")).head().getString(0)
    assert(cleaned ==
      "The quick brown fox jumps over the lazy dog.\n" +
        "He said “it ends with a quote mark.”\n" +
        "Is that so? It was! Fine.",
      s"unexpected clean result: $cleaned")

    def flags(s: String): Map[String, Boolean] = {
      val f = Seq(s).toDF("t")
        .select(TextAnalysis.c4PageFlags($"t").as("f")).select("f.*").head()
      f.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> f.getBoolean(i) }.toMap
    }
    // the cleaned page above has 5 sentence runs (fox. / mark.” counts the
    // '.' / so? / was! / Fine.) and no curly/lorem — passes everything
    val good = flags(page)
    assert(good.values.forall(identity), s"clean page must pass: $good")
    assert(!flags(page + "\nif (x) { y(); } code here.")("no_curly_ok"))
    assert(!flags(page + "\nLorem Ipsum dolor sit amet.")("no_lorem_ok"))
    assert(!flags("Too short to have five sentences.")("min_sentences_ok"))
    // sentence runs are counted AFTER the line clean: sentences on a
    // dropped line (javascript) must not count toward the gate
    assert(!flags("One two three javascript. Four five six done. " +
      "Seven eight nine more. Ten eleven twelve keep. Final sentence here.")
      ("min_sentences_ok"))
    assert(Seq(page).toDF("t")
      .select(TextAnalysis.c4PagePass($"t")).head().getBoolean(0))
    // narrow: the gate + clean never shuffle
    val plan = Seq(page).toDF("t")
      .where(TextAnalysis.c4PagePass($"t"))
      .select(TextAnalysis.c4LineClean($"t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"C4 clean must not shuffle:\n$plan")
  }

  test("containsBlockedWord: token-exact membership, case-folded, never a substring hit") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, "this text mentions the Forbidden word plainly"),
      (2L, "punctuation does not hide it: forbidden! yes"),
      (3L, "forbiddenness is a LONGER word and must NOT trip the gate"),
      (4L, "perfectly clean prose about query engines"),
      (5L, "unforbidden is also a different token"))
      .toDF("doc_id", "text")
    val flagged = rows.where(
      TextAnalysis.containsBlockedWord($"text", Seq("FORBIDDEN", "contraband")))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L, 2L),
      s"exact tokens only — substrings/superstrings must not trip: $flagged")
    // predicate is narrow: no Exchange in the filtered plan
    val plan = rows.where(!TextAnalysis.containsBlockedWord($"text", Seq("x")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"blocklist gate must not shuffle:\n$plan")
  }

  test("containsBlockedPhrase: contiguous-run exact match, mixed lengths, no shuffle") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, "we sell blue waffle irons here"),            // phrase as a run → trip
      (2L, "blue skies and a waffle for breakfast"),     // both words, NOT contiguous
      (3L, "the waffle blue paint dried"),               // reversed order
      (4L, "Blue, WAFFLE!"),                              // normalization folds case/punct
      (5L, "single contraband token"),                   // 1-token entry degrades to word gate
      (6L, "a very bad phrase of three appears: strictly no go zone"),
      (7L, "strictly no stopping in the go zone"))       // 3-run broken up
      .toDF("doc_id", "text")
    val flagged = rows.where(TextAnalysis.containsBlockedPhrase($"text",
      Seq("Blue Waffle", "contraband", "strictly no go")))
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L, 4L, 5L, 6L),
      s"contiguous normalized runs only: $flagged")
    // an entry that normalizes to nothing is rejected loudly
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.containsBlockedPhrase($"text", Seq("!!!"))
    }
    assert(e.getMessage.contains("normalizes to nothing"))
    // predicate is narrow: no Exchange in the filtered plan
    val plan = rows.where(!TextAnalysis.containsBlockedPhrase($"text",
      Seq("x", "y z")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phrase gate must not shuffle:\n$plan")
  }

  test("simhash64 expression: registered SQL function, deterministic, codegen path") {
    GraftFunctions.register(spark)
    val df = Seq("spark is fast", "spark is fast", "totally different words here")
      .toDF("text")
      .select(GraftFunctions.simhash64(TextAnalysis.tokens($"text")).as("sh"))
    val hashes = df.as[Long].collect()
    assert(hashes(0) == hashes(1))
    assert(hashes(0) != hashes(2))
    // usable from SQL too
    Seq("x y z").toDF("text").createOrReplaceTempView("simhash_probe")
    val viaSql = spark.sql(
      "SELECT simhash64(split(text, ' ')) FROM simhash_probe").head().getLong(0)
    assert(viaSql != 0L)
  }
}
