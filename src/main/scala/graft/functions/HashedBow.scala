package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: hashed bag-of-words vector (feature
  * hashing) over an `array<bigint>` of token hashes — dimension
  * `pmod(hash, dim)` accumulates the token count, emitted as
  * `array<double>` (integral counts, engine-exact).
  *
  * Why a custom expression: the columnar formulation
  * ([[graft.ops.TextOps.hashedBowVectorColumnar]], retained as the
  * bit-identity oracle) folds a `dim`-wide array copy through `transform`
  * per token — O(tokens × dim) allocations. This is ONE count array per
  * row and one pass over the hashes.
  */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1, s"dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_bow"

  def bow(arr: ArrayData): GenericArrayData = {
    val counts = new Array[Double](dim)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      // pmod(h, dim): Java % keeps the dividend's sign; normalize
      val m = (h % dim).toInt
      val idx = if (m < 0) m + dim else m
      counts(idx) += 1.0
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def nullSafeEval(input: Any): Any =
    bow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hbow", this, classOf[HashedBow].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)
}

object HashedBow {
  /** Column wrapper: hashed_bow(tokenHashes: array<bigint>, dim) → array<double>. */
  def apply(tokenHashes: Column, dim: Int): Column =
    ColumnBridge.column(HashedBow(ColumnBridge.expression(tokenHashes), dim))
}
