package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash over an array<bigint> of
  * token hashes. Bit k of the signature is the sign of
  * Σ_tokens (±1 by bit k of the token hash).
  *
  * Why a custom expression: the pure-Column formulation needs 64
  * independent `aggregate(...)` folds (or one fold carrying a 64-slot
  * accumulator array through `zip_with`), either way allocating per-token
  * intermediate arrays inside codegen. Round 1's 64-fold version made
  * q_simhash_pairs the most expensive bench query (14.4 s at sf0.1). This
  * expression is ONE tight primitive loop (no allocation beyond a 64-int
  * counter block), participates in whole-stage codegen via doGenCode, and
  * produces bit-identical signatures (pinned against the columnar
  * formulation in OpsSpec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counters = ctx.freshName("counters")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counters = new int[64];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counters[$b]++; else $counters[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column wrapper: simhash64(tokenHashes: array<bigint>) → bigint. */
  def apply(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))
}
