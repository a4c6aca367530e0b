package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash_array64(array<string>) -> array<long>`: xxhash64 (seed 42 — the
  * same primitive and seed as Spark's `xxhash64()` on a single string
  * column) of every element, as ONE tight codegen'd loop.
  *
  * Exists because the equivalent `transform(arr, s -> xxhash64(s))` is a
  * higher-order function: it evaluates interpreted, paying per-element
  * expression dispatch. Hashing shingle arrays for the dedup verify joins
  * touches |corpus| × |shingles| elements per side — at the 500k-doc
  * scale check that interpreted pass dominated the verify span
  * (BASELINE.md round 6). Null elements hash to the seed unchanged,
  * matching `xxhash64(null)`'s pass-through-seed semantics. */
object HashArrayUtil {
  def hashAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out(i) = 42L
      else {
        val s = arr.getUTF8String(i)
        out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class HashArray64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash_array64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashArrayUtil.hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashArrayUtil.hashAll($c)")

  override protected def withNewChildInternal(newChild: Expression): HashArray64 =
    copy(child = newChild)
}
