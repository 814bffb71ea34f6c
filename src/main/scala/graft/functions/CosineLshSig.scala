package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: `nbits`-bit random-hyperplane (sign) LSH
  * signature for cosine similarity over an `array<float|double>` vector.
  * Bit b of the signature is the sign of the projection onto the b-th
  * pseudo-random ±1 hyperplane, whose weight for dimension i is
  * `xxhash64(seed, b, i) & 1` (Spark's xxhash64 chain, seed 42) — exactly
  * the hash family of the columnar formulation
  * [[graft.ops.SimilarityOps.cosineLshSignatureColumnar]], which is
  * retained as the bit-identity oracle (pinned in OpsSpec, codegen AND
  * interpreted paths).
  *
  * Why a custom expression: the columnar form runs `nbits` independent
  * `aggregate` folds per row, each allocating a zipped intermediate array
  * and hashing per (bit, element). At 64 bits that is the exact shape the
  * SimHash64 port killed in round 2. Here the ±1 sign matrix is computed
  * ONCE per (task, dimension-prefix) and cached as packed 64-bit words;
  * the per-row work is one fused loop over elements with a 64-double
  * projection block — no allocation beyond that block, no hashing.
  *
  * Reference semantics analog: none (original work — the reference has no
  * embedding dedup); the LSH scheme follows the standard sign-random-
  * projection construction (Charikar, STOC'02).
  */
case class CosineLshSig(child: Expression, nbits: Int, seed: Int)
  extends UnaryExpression {

  require(nbits >= 1 && nbits <= 64, s"nbits must be in [1,64], got $nbits")

  override def dataType: DataType = LongType
  override def prettyName: String = "cosine_lsh_sig"

  // resolved lazily — the child is an unresolved attribute until analysis
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(s"cosine_lsh_sig needs array<float|double>, got $other")
  }

  /** Per-bit inner hash: xxhash64 chains child hashes left-to-right from
    * the fixed seed 42 — hashInt(i, hashInt(bit, hashInt(seed, 42))). */
  @transient private lazy val innerBitHash: Array[Long] = {
    val seedHash = XXH64.hashInt(seed, 42L)
    Array.tabulate(nbits)(b => XXH64.hashInt(b, seedHash))
  }

  /** Packed sign words per dimension: bit b of signWords(i) is 1 iff the
    * hyperplane weight w(b, i) is +1. Grown lazily to the largest vector
    * dimension seen. @volatile: the expression instance is shared across
    * executor task threads (via addReferenceObj), and value idempotence
    * alone doesn't give safe publication — without the volatile store a
    * second thread could observe the new array reference with stale
    * zeroed contents. Contents are fully written before the reference
    * store, so volatile read/write is sufficient. */
  @transient @volatile private var signWords: Array[Long] = _

  private def signsUpTo(dim: Int): Array[Long] = {
    var s = signWords
    if (s == null || s.length < dim) {
      val n = math.max(dim, 64)
      val ns = new Array[Long](n)
      val inner = innerBitHash
      var i = 0
      while (i < n) {
        var w = 0L
        var b = 0
        while (b < nbits) {
          if ((XXH64.hashInt(i, inner(b)) & 1L) == 1L) w |= (1L << b)
          b += 1
        }
        ns(i) = w
        i += 1
      }
      signWords = ns
      s = ns
    }
    s
  }

  /** The per-row kernel (also the codegen target via a bound reference —
    * the hot loop is compiled Scala either way; keeping one body avoids
    * an eval/codegen divergence class entirely). */
  def hashSig(arr: ArrayData): Long = {
    val n = arr.numElements()
    val signs = signsUpTo(n)
    val proj = new Array[Double](if (nbits < 64) 64 else nbits)
    var i = 0
    while (i < n) {
      val v = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val w = signs(i)
      var b = 0
      while (b < nbits) {
        // w=+1 adds v, w=-1 adds -v: IEEE `a + (-v) == a - v` exactly, so
        // this matches the columnar fold's `x * ±1.0` addition bit-for-bit
        if (((w >>> b) & 1L) == 1L) proj(b) += v else proj(b) -= v
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nbits) {
      if (proj(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    hashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clsh", this, classOf[CosineLshSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hashSig($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineLshSig =
    copy(child = newChild)
}

object CosineLshSig {
  /** Column wrapper: cosine_lsh_sig(vec: array<float|double>) → bigint. */
  def apply(vec: Column, nbits: Int, seed: Int = 7): Column =
    ColumnBridge.column(CosineLshSig(ColumnBridge.expression(vec), nbits, seed))
}
