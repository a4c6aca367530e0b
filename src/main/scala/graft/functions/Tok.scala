package graft.functions

import org.apache.spark.sql.Column

/** TOKENIZER selector threaded through every token-based operator
  * (near-dup dedup, the trigram LM, BPE, DSIR, BM25/TF-IDF, quality
  * gates). The engine's historical kernel keeps only `[a-z0-9]` runs —
  * which makes any non-Latin document tokenize to an EMPTY array: its
  * shingles vanish (two identical zh documents are never dedup
  * candidates), the LM scores nothing, BPE counts nothing, and a
  * zero-word quality floor silently drops it. `Tok.Ml` is the
  * script-aware alternative: bit-identical to `Tok.Latin` on pure-ASCII
  * text (ShinglesSpec pins it — frozen Latin oracles stay valid), plus
  * per-codepoint tokens for Han/kana/Hangul and lowercased word runs for
  * Cyrillic/Greek/Arabic/Hebrew/Devanagari/Thai (and diacritic Latin),
  * mirroring the [[LangProfiles]] script-routing table — the languages
  * the router identifies are exactly the ones this tokenizer can feed to
  * the token rungs.
  *
  * Every method resolves to a registered native kernel (codegen'd, one
  * byte/codepoint scan per row) — call [[GraftFunctions.register]] on the
  * session first, as every kernel consumer does (operators do it
  * internally). Defaults stay `Latin` everywhere so existing plans and
  * frozen oracles are byte-identical until a caller opts in. */
sealed abstract class Tok(val name: String) {
  /** Normalized token array of a text column. */
  def tokens(c: Column): Column
  /** Distinct word n-gram shingles (set-similarity unit). */
  def shingles(c: Column, n: Int): Column
  /** Multiplicity-preserving word n-grams (repetition/LM unit). */
  def ngrams(c: Column, n: Int): Column
  /** DuckDB SQL expression producing the same token list — oracle
    * restatements are GENERATED from the kernel's own table. */
  def sqlTokens(expr: String): String
}

object Tok {

  /** The `[a-z0-9]`-run kernel (historical default; every frozen oracle
    * was computed under it). */
  case object Latin extends Tok("latin") {
    def tokens(c: Column): Column = GraftFunctions.normTokens(c)
    def shingles(c: Column, n: Int): Column = GraftFunctions.shinglesNative(c, n)
    def ngrams(c: Column, n: Int): Column = GraftFunctions.ngramsNative(c, n)
    def sqlTokens(expr: String): String =
      s"list_filter(regexp_split_to_array(trim(regexp_replace(lower($expr)," +
        s"'[^a-z0-9]+',' ','g')), ' '), t -> t <> '')"
  }

  /** The script-aware kernel ([[ShingleUtil.normTokensMl]]). */
  case object Ml extends Tok("ml") {
    def tokens(c: Column): Column = GraftFunctions.normTokensMl(c)
    def shingles(c: Column, n: Int): Column = GraftFunctions.shinglesMl(c, n)
    def ngrams(c: Column, n: Int): Column = GraftFunctions.ngramsMl(c, n)
    def sqlTokens(expr: String): String = ShingleUtil.mlSqlTokens(expr)
  }

  /** Parse a config string ("latin" | "ml"). */
  def of(name: String): Tok = name match {
    case "latin" => Latin
    case "ml" => Ml
    case other => throw new IllegalArgumentException(
      s"Tok.of: unknown tokenizer '$other' (expected 'latin' or 'ml')")
  }
}
