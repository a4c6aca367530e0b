package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** MinHash signature kernel (Broder 1997, "On the resemblance and
  * containment of documents"): k independent hash functions (murmur3 with
  * seed = function index), signature[i] = min over the set's elements.
  * E[fraction of agreeing positions] = Jaccard similarity.
  *
  * Exists as a native expression because the equivalent SQL —
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, s -> hash(s,i))))`
  * — evaluates interpreted (higher-order functions sit outside whole-stage
  * codegen) and allocates k intermediate arrays per row; on a corpus scan
  * that's the entire runtime. This loop hashes each shingle's bytes k
  * times with zero allocation beyond the output array (~100× faster than
  * the interpreted HOF form at sf0.1). */
object MinHashUtil {
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Int](k)
    java.util.Arrays.fill(mins, Int.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Catalyst expression: `minhash_sig(array<string>, k) -> array<int>`,
  * whole-stage-codegen'd via a static call. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "minhash_sig: k must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.minhash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
