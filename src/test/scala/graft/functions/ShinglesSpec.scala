package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Pins the native tokenize/shingle kernels to the SQL column versions —
  * the DuckDB oracle for q_ngram_jaccard_pairs is written against the SQL
  * semantics, so the native path must be bit-equal on real data. */
class ShinglesSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("native norm_tokens == SQL tokens on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      TextAnalysis.tokens($"text").as("sql_t"),
      GraftFunctions.normTokens($"text").as("nat_t"))
      .where($"sql_t" =!= $"nat_t")
    assert(diff.count() == 0)
  }

  test("native shingles == SQL shingles (as sets) on real documents") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
      org.apache.spark.sql.functions.array_sort(
        TextAnalysis.shingles($"text", 3)).as("sql_s"),
      org.apache.spark.sql.functions.array_sort(
        GraftFunctions.shinglesNative($"text", 3)).as("nat_s"))
      .where($"sql_s" =!= $"nat_s")
    assert(diff.count() == 0)
  }

  test("native ngrams == SQL bigram construction (multiplicity preserved)") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // SQL form: zip each token with its successor, keeping duplicates
    val t = TextAnalysis.tokens($"text")
    val sqlBigrams = org.apache.spark.sql.functions.when(
      org.apache.spark.sql.functions.size(t) < 2,
      org.apache.spark.sql.functions.array().cast("array<string>"))
      .otherwise(org.apache.spark.sql.functions.zip_with(
        org.apache.spark.sql.functions.slice(t,
          org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.size(t) - 1),
        org.apache.spark.sql.functions.slice(t,
          org.apache.spark.sql.functions.lit(2),
          org.apache.spark.sql.functions.size(t) - 1),
        (a, b) => org.apache.spark.sql.functions.concat_ws(" ", a, b)))
    val diff = docs.select(sqlBigrams.as("sql_b"),
      GraftFunctions.ngramsNative($"text", 2).as("nat_b"))
      .where($"sql_b" =!= $"nat_b")
    assert(diff.count() == 0)
    // ngrams keeps duplicates that shingles would collapse
    val reps = Seq("go go go go").toDF("text").select(
      GraftFunctions.ngramsNative($"text", 2).as("n"),
      GraftFunctions.shinglesNative($"text", 2).as("s")).head()
    assert(reps.getSeq[String](0) == Seq("go go", "go go", "go go"))
    assert(reps.getSeq[String](1) == Seq("go go"))
  }

  test("native kernels on edge cases: empty, punctuation-only, unicode, short") {
    GraftFunctions.register(spark)
    val df = Seq("", "!!! ???", "Héllo wörld foo", "a b").toDF("text")
    val rows = df.select(
      TextAnalysis.tokens($"text").as("sql_t"),
      GraftFunctions.normTokens($"text").as("nat_t"),
      org.apache.spark.sql.functions.array_sort(TextAnalysis.shingles($"text", 3)).as("sql_s"),
      org.apache.spark.sql.functions.array_sort(GraftFunctions.shinglesNative($"text", 3)).as("nat_s"))
      .collect()
    rows.foreach { r =>
      // SQL split("", " ") yields [""] while the native tokenizer yields [] —
      // both produce ZERO shingles, which is the semantics dedup consumes.
      val sqlToks = r.getSeq[String](0).filter(_.nonEmpty)
      assert(sqlToks == r.getSeq[String](1), s"tokens mismatch: $r")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"shingles mismatch: $r")
    }
  }

  test("norm_tokens_ml is BIT-IDENTICAL to norm_tokens on ASCII input") {
    GraftFunctions.register(spark)
    // the real documents corpus (the frozen Latin oracles' input) …
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where($"text".rlike("^[\\x00-\\x7F]*$"))
    assert(docs.count() > 0, "fixture must contain ASCII documents")
    val diff = docs.select(
      GraftFunctions.normTokens($"text").as("lat"),
      GraftFunctions.normTokensMl($"text").as("ml"))
      .where($"lat" =!= $"ml")
    assert(diff.count() == 0,
      "ml tokenizer must be bit-identical to the Latin kernel on ASCII")
    // … plus an adversarial ASCII sweep: every printable ASCII char in
    // token and separator position (exhaustive over the byte alphabet
    // the Latin kernel reads — stronger than sampling)
    val ascii = (0x20 to 0x7e).map(_.toChar).mkString
    val probes = Seq(ascii, s"A$ascii z", "Foo-BAR_baz 42", "  ", "a",
      "UPPER lower 0123456789", ascii.reverse * 3)
    probes.foreach { p =>
      val (lat, ml) = (ShingleUtil.normTokens(
        org.apache.spark.unsafe.types.UTF8String.fromString(p)).toSeq,
        ShingleUtil.normTokensMl(
          org.apache.spark.unsafe.types.UTF8String.fromString(p)).toSeq)
      assert(lat == ml, s"ASCII divergence on '$p'")
    }
  }

  test("norm_tokens_ml: per-codepoint CJK, lowercased word runs, mixed scripts") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def ml(s: String) = ShingleUtil.normTokensMl(u(s)).map(_.toString).toSeq
    // Han/kana/Hangul: one token per codepoint (character-gram unit)
    assert(ml("世界和平") == Seq("世", "界", "和", "平"))
    assert(ml("これはテスト") == Seq("こ", "れ", "は", "テ", "ス", "ト"))
    assert(ml("한국어 텍스트") == Seq("한", "국", "어", "텍", "스", "트"))
    // Cyrillic/Greek: lowercased word runs (script is case-invariant)
    assert(ml("Привет МИР") == Seq("привет", "мир"))
    assert(ml("αυτό είναι Ελληνικά") == Seq("αυτό", "είναι", "ελληνικά"))
    // RTL scripts: word runs, order of appearance
    assert(ml("هذا اختبار") == Seq("هذا", "اختبار"))
    assert(ml("זהו מבחן") == Seq("זהו", "מבחן"))
    // Devanagari with matras stays one run per word
    assert(ml("यह परीक्षण है") == Seq("यह", "परीक्षण", "है"))
    // diacritic Latin survives (the [a-z0-9] kernel truncates "café")
    assert(ml("Café au lait") == Seq("café", "au", "lait"))
    // mixed-script text: each segment tokenizes under its own rule
    assert(ml("Hello, 世界! Привет 42") ==
      Seq("hello", "世", "界", "привет", "42"))
    // separators only / empty
    assert(ml("…—!?") == Seq.empty)
    assert(ml("") == Seq.empty)
    // the LangProfiles samples all tokenize NON-EMPTY under ml (the
    // router↔processing contract this kernel exists to close)
    LangProfiles.samples.foreach { case (code, s) =>
      assert(ml(s).nonEmpty, s"sample '$code' must tokenize under ml")
    }
  }

  test("norm_tokens_ml: classify-then-lower == lower-then-classify, every codepoint") {
    // The kernel classifies the ORIGINAL codepoint's script and then
    // lowercases; the generated oracle SQL (mlSqlTokens) lowercases the
    // whole string first and classifies the lowered codepoint. The two
    // orders agree iff no simple case mapping crosses a kept-class
    // boundary. Pin that over the ENTIRE codepoint space: tokenizing a
    // single codepoint before vs after the kernel's own lowercase
    // mapping must yield identical token streams. (utf8proc-vs-JDK
    // Unicode-version drift is the separate, acknowledged surface —
    // both sides here use the kernel's Character.toLowerCase mapping.)
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    var cp = 0
    while (cp <= Character.MAX_CODE_POINT) {
      if (Character.isDefined(cp) && !(cp >= 0xD800 && cp <= 0xDFFF)) {
        val orig = new String(Character.toChars(cp))
        val low = new String(Character.toChars(Character.toLowerCase(cp)))
        val a = ShingleUtil.normTokensMl(u(orig)).map(_.toString).toSeq
        val b = ShingleUtil.normTokensMl(u(low)).map(_.toString).toSeq
        assert(a == b, f"classify-order divergence at U+$cp%05X: " +
          s"classify-first=$a, lower-first=$b")
      }
      cp += 1
    }
  }

  test("shingles_ml / ngrams_ml compose the ml token stream; zh twins become candidates") {
    GraftFunctions.register(spark)
    val df = Seq(
      "这是一个中文测试句子完全用汉字写成",
      "这是一个中文测试句子完全用汉字写成了").toDF("text")
    val rows = df.select(
      GraftFunctions.shinglesMl($"text", 3).as("sh"),
      GraftFunctions.ngramsMl($"text", 2).as("ng")).collect()
    // character trigrams — the Latin kernel yields ZERO shingles here
    assert(rows(0).getSeq[String](0).head == "这 是 一")
    assert(rows(0).getSeq[String](1).head == "这 是")
    val latinEmpty = df.select(GraftFunctions.shinglesNative($"text", 3).as("s"))
      .collect().forall(_.getSeq[String](0).isEmpty)
    assert(latinEmpty, "Latin kernel is blind to zh — the gap ml closes")
    // near-identical zh docs share almost all shingles (J well above 0.5)
    val Seq(a, b) = rows.map(_.getSeq[String](0).toSet).toSeq
    val j = a.intersect(b).size.toDouble / a.union(b).size
    assert(j > 0.8, s"zh twins must be near-dup candidates under ml, J=$j")
  }

  test("native hash_array64 == interpreted transform(xxhash64) bit-for-bit") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{transform, xxhash64}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val diff = docs
      .select(GraftFunctions.shinglesNative($"text", 3).as("sh"))
      .select(
        GraftFunctions.hashArray64($"sh").as("nat"),
        transform($"sh", s => xxhash64(s)).as("hof"))
      .where($"nat" =!= $"hof")
    assert(diff.count() == 0, "kernel must reproduce xxhash64 exactly (seed 42)")
  }
}
