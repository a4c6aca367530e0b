package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Positionwise agreement fraction of two MinHash signature arrays — the
  * classic unbiased Jaccard estimator: P[minhash_i(A) == minhash_i(B)] =
  * J(A, B), so the mean agreement over h independent components
  * estimates J with standard error √(J(1−J)/h).
  *
  * Used as the SIGNATURE PREFILTER between LSH candidate generation and
  * the exact array-payload verify: the prefilter join ships h 4-byte
  * signature components per side (h = 64 ⇒ 256 B) instead of the full
  * hashed shingle arrays (~8 B × |doc shingles|), and this kernel is one
  * codegen'd equality loop — so pairs whose estimated similarity sits
  * far below the threshold never reach the expensive verify join at all.
  * Correctness contract stays with the verify: every SURVIVING pair is
  * still exact-Jaccard-checked; the prefilter only drops pairs, with
  * per-pair drop probability for a true at-threshold pair bounded by the
  * normal tail of the estimator (≈ 2·10⁻⁴ at h=64 with a 3.5σ slack —
  * two orders below the banding's own 1−recallTarget miss budget). */
object SigAgreementUtil {
  def agreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getInt(i) == b.getInt(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }
}

/** `sig_agreement(array<int>, array<int>) -> double`. */
case class SigAgreement(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_agreement"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    SigAgreementUtil.agreement(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigAgreementUtil.agreement($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}
