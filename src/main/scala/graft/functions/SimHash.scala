package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash kernel (Charikar 2002, "Similarity estimation techniques
  * from rounding algorithms"): hash every token to 64 bits, vote each bit
  * position +1/−1 by token multiplicity, and take the sign vector.
  * Near-identical token multisets differ in few bits, so near-dup detection
  * becomes Hamming distance (`bit_count(a ^ b)`) — SURVEY.md §2.8 extension
  * surface / north-star SimHash dedup.
  *
  * Static JVM object so codegen can call it directly (no closure capture,
  * no serialization in the generated code path). */
object SimHashUtil {

  /** FNV-1a 64-bit over UTF-8 bytes — tiny, allocation-free, public-domain
    * hash; per-token cost is what dominates a 100 TB SimHash scan. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash of a token array (null tokens ignored). */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Catalyst expression: `simhash64(array<string>) -> long`. Participates in
  * whole-stage codegen via a static call (preference order (b) of the
  * build mandate: a native Expression beats a Scala UDF — no
  * serialization, no Row boxing in the hot loop). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
