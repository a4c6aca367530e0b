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
  def ngrams(text: UTF8String, n: Int): GenericArrayData = {
    val toks = normTokens(text)
    if (toks.length < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = toks(i + j)
        if (j < n - 1) parts(2 * j + 1) = SPACE
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles (space-joined), first-occurrence order. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = normTokens(text)
    if (toks.length < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= toks.length) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = toks(i + j)
        if (j < n - 1) parts(2 * j + 1) = SPACE
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }
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
