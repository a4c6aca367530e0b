package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for crawl corpora: NFC composition (a native
  * codegen'd kernel — Spark has no built-in), plus the table-driven repair
  * and cleanup stages a web-text ingest needs before any fingerprint or
  * dedup key is computed. Two encodings of the same rendered text ("é" as
  * U+00E9 vs "e"+U+0301) otherwise hash to different fingerprints and
  * silently defeat exact dedup.
  *
  * Everything restates in the DuckDB oracle: NFC via `nfc_normalize`
  * (both sides implement Unicode canonical composition — pinned by
  * q_unicode_normalize), repairs/cleanup generated from the SAME tables
  * (the htmlStripStages discipline — no drift possible). */
object UnicodeNormUtil {

  /** NFC-normalize; ASCII fast path never leaves the byte array (ASCII is
    * closed under NFC), and already-normalized non-ASCII text (the common
    * case by far) avoids the rebuild allocation via `isNormalized`. */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        val str = s.toString
        return if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
        else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** `nfc_normalize(string) -> string` — codegen'd Unicode NFC composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** The Column-level normalization surface (see [[UnicodeNormUtil]]). */
object UnicodeNorm {

  /** Common UTF-8-bytes-read-as-Latin-1/cp1252 mojibake pairs and their
    * intended characters (the well-documented ftfy repertoire — public
    * knowledge; each mojibake form is ≥ 2 chars and unambiguous, so a
    * literal replace can never corrupt legitimate text in practice).
    * LITERAL string replaces — no regex engine, trivially linear. Shared
    * with the oracle restatement. */
  private[graft] val mojibakeRepairs: Seq[(String, String)] = Seq(
    "â€™" -> "’", // ’
    "â€˜" -> "‘", // ‘
    "â€œ" -> "“", // “
    "â€�" -> "”", // ” whose 0x9D byte decoded to the replacement char
    "â€“" -> "–", // –
    "â€”" -> "—", // —
    "â€¦" -> "…", // …
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ã­" -> "í",
    "Ãº" -> "ú", "Ã±" -> "ñ", "Ã§" -> "ç", "Ã¼" -> "ü", "Ã¶" -> "ö",
    "Ã¤" -> "ä", "ÃŸ" -> "ß",
    "\u00C2\u00A0" -> "\u00A0") // C2 A0 (nbsp) read as Latin-1

  /** C0 control characters except `\n`/`\t` (plus DEL) — never meaningful
    * in text, frequently present in binary-contaminated crawl records.
    * Both Java and RE2 read these `\xNN` class escapes identically. */
  private[graft] val controlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Repair the [[mojibakeRepairs]] table — literal replaces, applied in
    * table order (multi-char smart-punctuation forms first: "â€œ" must
    * win before any shorter accent pair could touch its prefix). */
  def fixMojibake(c: Column): Column =
    mojibakeRepairs.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good))
    }

  /** `nfc_normalize(string)` as a Column (session must be registered via
    * [[GraftFunctions.register]]; queries call it idempotently). */
  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)

  /** Full cleanup: mojibake repair → NFC composition → control-char strip
    * → non-breaking-space to space. Order is load-bearing: repairs
    * operate on the raw Latin-1-ish characters (NFC could decompose
    * nothing there, but repairs can CREATE precomposed characters, so
    * NFC runs after to canonicalize either way); nbsp folds last so a
    * repaired `Â ` lands on the same byte as a native nbsp. One
    * narrow codegen'd scan stage — no shuffle at any scale. */
  def normalizeUnicode(c: Column): Column =
    regexp_replace(
      regexp_replace(nfcNormalize(fixMojibake(c)), controlClass, ""),
      "\u00A0", " ")
}
