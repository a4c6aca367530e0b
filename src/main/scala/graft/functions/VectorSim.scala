package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native vector-similarity kernels. Same arithmetic as the
  * `zip_with`/`aggregate` column forms (left fold over index order in
  * doubles — bit-identical results), but one tight loop inside
  * whole-stage codegen instead of interpreted higher-order functions. */
object VectorSimUtil {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Deterministic avalanche mix to an exact small rational in [-1, 1]
    * (n/1000, so SQL literals round-trip bit-exactly through DuckDB) —
    * the ONE copy of the fixture-embedding unit generator. Both
    * [[graft.operators.MlFixture.fullEmbedding]] (oracle-pinned fixture
    * embeddings) and the ScaleProfile cosine corpus call here: a drift
    * between them would silently diverge the cosinestaged arm's
    * documented geometry from the oracle's. Spatial-hash primes fold the
    * (value, dimension) pair, the golden-ratio multiply + xor-shift
    * avalanche the bits. */
  def mixUnit(a: Long, d: Int, seed: Int): Double = {
    var x = (a * 73856093L ^ d.toLong * 19349663L).toInt ^ seed
    x *= 0x9e3779b1
    x ^= x >>> 16
    (((x & 0x7fffffff) % 2001) - 1000) / 1000.0
  }

  /** cosine(a, b) with zero-vector guard (denominator clamped at 1e-12,
    * matching the Column form's `greatest(..., 1e-12)`). Per-side element
    * flags: a full-precision float probe legitimately scores against a
    * double decoded-from-codes corpus vector (the SQ8 asymmetric-distance
    * shape) — a single shared flag would mis-read one side. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }

  /** Per-(nPlanes, dim, seed) ±1 plane matrix, memoized per executor JVM:
    * the weights are a pure function of (plane·dim + d, seed), so the
    * matrix never ships with the plan — each executor derives it once and
    * every subsequent row pays only the multiply-adds (a banded-LSH
    * signature stage hashes ~10⁵ weights per row otherwise). Bounded:
    * a query uses a handful of (planes, seed) combinations. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** Cap on memoized plane matrices: a banded-LSH query uses one seed per
    * band (hundreds of entries), but a long-lived executor serving many
    * different (threshold, dim, seed) combinations would otherwise grow
    * the cache without bound. Recomputing a matrix is microseconds, so a
    * full clear on overflow is cheaper than LRU bookkeeping. */
  private val MaxPlaneCacheEntries = 4096

  private def planeWeights(nPlanes: Int, dim: Int, seed: Int): Array[Double] = {
    if (planeCache.size > MaxPlaneCacheEntries) planeCache.clear()
    planeCache.computeIfAbsent((nPlanes, dim, seed), { _ =>
      Array.tabulate(nPlanes * dim)(i =>
        if ((Murmur3_x86_32.hashInt(i, seed) & 1) == 1) 1.0 else -1.0)
    })
  }

  /** Achlioptas sparse-JL weight of projection-matrix cell (d, j) under
    * `seed`: +1 / −1 with probability 1/6 each, 0 with probability 2/3
    * (Achlioptas JCSS 2003, the database-friendly Johnson-Lindenstrauss
    * matrix) — derived from the engine-portable md5 bucket (the Sampling
    * discipline), so a SQL oracle can restate any cell; the matrix is
    * built ONCE on the driver ([[graft.operators.Similarity
    * .randomProjectionMatrix]]) and ships as a kernel literal. */
  def jlWeight(seed: Int, d: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$d:$j".getBytes("UTF-8"))
    var u = 0L
    var i = 0
    while (i < 4) { u = (u << 8) | (md(i) & 0xffL); i += 1 }
    // u uniform in [0, 2^32): thirds of the 1/6 tails
    if (u * 6 < (1L << 32)) 1
    else if (u * 6 >= 5L * (1L << 32)) -1
    else 0
  }

  /** INTEGER-EXACT sparse random projection: quantize each component by
    * the EXACT power-of-two scale ×1024 (binary-float multiplication by
    * 2^10 never rounds) with explicit floor(x·1024 + 0.5) — restatable
    * verbatim in SQL — then fold through the ±1/0 weight literal in pure
    * Long arithmetic. Output components are bit-identical on every
    * engine; cosine over them is scale-invariant, so the omitted
    * √(3/outDim) Achlioptas constant changes nothing downstream. */
  def jlProject(v: ArrayData, weights: Array[Int], outDim: Int,
      isFloat: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val dim = v.numElements()
    require(weights.length == dim * outDim,
      s"jl_project: weight matrix is ${weights.length} cells, vector dim " +
        s"$dim × outDim $outDim needs ${dim * outDim} — build the matrix " +
        "with randomProjectionMatrix(inDim = vector dimension)")
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0L
      val base = j * dim
      var d = 0
      while (d < dim) {
        val w = weights(base + d)
        if (w != 0) {
          val q = math.floor(elem(v, d, isFloat) * 1024.0 + 0.5).toLong
          acc += (if (w > 0) q else -q)
        }
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sign-LSH signature (random hyperplane, Charikar 2002): bit p is the
    * sign of the dot product with a deterministic ±1 plane whose entries
    * come from murmur3(p·dim + d, seed) — reproducible across executors,
    * runs, and languages without shipping plane arrays. */
  def signSignature(v: ArrayData, nPlanes: Int, seed: Int, isFloat: Boolean): Long = {
    val dim = v.numElements()
    val w = planeWeights(nPlanes, dim, seed)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) {
        dot += elem(v, d, isFloat) * w(base + d)
        d += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** `cosine_sim(array<float|double>, array<float|double>) -> double`. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorSimUtil.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorSimUtil.cosine($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `sign_signature(array<float|double>, nPlanes, seed) -> long`. */
case class SignSignature(child: Expression, nPlanes: Int, seed: Int) extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 64, "sign_signature: 1..64 planes")
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_signature"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorSimUtil.signSignature(input.asInstanceOf[ArrayData], nPlanes, seed, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorSimUtil.signSignature($c, $nPlanes, $seed, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignSignature =
    copy(child = newChild)
}

/** `jl_project(array<float|double>) -> array<long>` under a literal
  * Achlioptas weight matrix — integer-exact sparse random projection
  * ([[VectorSimUtil.jlProject]]); the matrix travels as a codegen
  * reference object (one int per cell), never re-derived per row. */
case class JlProjectExpr(child: Expression, weights: Array[Int], outDim: Int)
    extends UnaryExpression {
  require(outDim > 0, "jl_project: outDim must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorSimUtil.jlProject(input.asInstanceOf[ArrayData], weights, outDim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jlWeights", weights, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorSimUtil.jlProject($c, $ref, $outDim, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)
}
