package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two DISTINCT-element string arrays, as a
  * native kernel: |A∩B| via an open-addressing set of 64-bit element
  * hashes, |A∪B| = |A|+|B|−|A∩B|. O(|A|+|B|), zero boxing — the
  * interpreted `array_intersect`/`array_union` pair this replaces
  * dominates near-dup verification at corpus scale.
  *
  * Membership is by 64-bit hash (two murmur32 passes with different
  * seeds); a false positive needs a 64-bit collision between two shingles
  * of one document pair (~n²/2⁶⁴ — negligible against 10⁹ docs). */
object JaccardSimUtil {

  private def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
    val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = jaccardImpl(a, b, longElems = false)

  /** `array<long>` variant — elements are ALREADY 64-bit hashes (the
    * pre-hashed shingle representation [[graft.operators.Dedup]] uses to
    * keep strings out of its candidate shuffles), so membership hashing
    * is the identity. Same collision model as the string path (the string
    * path hashes to 64 bits internally anyway). */
  def jaccardLongs(a: ArrayData, b: ArrayData): Double = jaccardImpl(a, b, longElems = true)

  private def jaccardImpl(a: ArrayData, b: ArrayData, longElems: Boolean): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    // open-addressing table for the smaller side, power-of-two capacity
    val (small, big) = if (na <= nb) (a, b) else (b, a)
    val ns = small.numElements()
    var cap = 8
    while (cap < ns * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val matched = new Array[Boolean](cap)
    val mask = cap - 1
    var i = 0
    while (i < ns) {
      if (!small.isNullAt(i)) {
        val h = if (longElems) small.getLong(i) else hash64(small.getUTF8String(i))
        var idx = (h.toInt & mask)
        while (used(idx) && table(idx) != h) idx = (idx + 1) & mask
        table(idx) = h
        used(idx) = true
      }
      i += 1
    }
    var inter = 0
    val nbg = big.numElements()
    i = 0
    while (i < nbg) {
      if (!big.isNullAt(i)) {
        val h = if (longElems) big.getLong(i) else hash64(big.getUTF8String(i))
        var idx = (h.toInt & mask)
        while (used(idx) && table(idx) != h) idx = (idx + 1) & mask
        if (used(idx) && !matched(idx)) {
          inter += 1
          // flag, DON'T clear `used`: clearing would break the linear-probe
          // chains of entries inserted past this slot (tombstone bug).
          matched(idx) = true
        }
      }
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** Catalyst expression: `jaccard_sim(array<string>, array<string>) ->
  * double` (or `array<long>` inputs whose elements are pre-computed
  * 64-bit hashes), whole-stage-codegen'd via a static call. Inputs must
  * be distinct-element arrays (shingle sets are). */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  /** Both sides must be arrays of the SAME supported element type —
    * mixed `array<long>`/`array<string>` inputs would otherwise silently
    * take the long path on one side's string data (garbage similarities
    * instead of an analysis error). */
  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    (left.dataType, right.dataType) match {
      case (ArrayType(le, _), ArrayType(re, _))
          if le == re && (le == StringType || le == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<long> " +
          s"arguments, got ${l.simpleString} and ${r.simpleString}")
    }
  }

  /** Static dispatch on the ELEMENT type at plan time — long arrays carry
    * pre-hashed elements, string arrays hash internally. */
  private lazy val implName: String = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
      "jaccardLongs"
    case _ => "jaccard"
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (implName == "jaccardLongs")
      JaccardSimUtil.jaccardLongs(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      JaccardSimUtil.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardSimUtil.$implName($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}
