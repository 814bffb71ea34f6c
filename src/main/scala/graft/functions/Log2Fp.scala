package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: fixed-point binary logarithm of a positive
  * integer, Q20 — returns `floor(log2(n) * 2^20)` computed by an EXACT
  * integer algorithm (no floating point anywhere), so the value is a
  * cross-engine contract, not an IEEE/libm accident.
  *
  * Why it exists: every ranking / information-theoretic signal the corpus
  * tier wants (BM25/TF-IDF idf, entropy terms, log-odds) needs a log, and
  * a float `ln` is the one primitive the repo's engine-exact oracle
  * discipline cannot replay — libm differs across engines and platforms.
  * This expression makes the log itself integral: DuckDB replays it
  * bit-for-bit as an unrolled 20-step CTE ladder (see the q_bm25_rank /
  * q_log2_fp oracles), the same way the pagerank ladder replays iteration.
  *
  * Algorithm (classic shift-and-square binary log, all in 64-bit ints):
  *   e  = floor(log2 n)                  -- the bit length minus one
  *   x  = n normalized to Q20 in [2^20, 2^21)   (truncating shift)
  *   repeat 20 times: x := x^2 (fits: < 2^42); if x >= 2^41 the next
  *     fraction bit is 1 and x >>= 21, else 0 and x >>= 20
  *   result = (e << 20) | fraction
  * Every step is a nonneg multiply/compare/shift both engines perform
  * identically; truncation points are part of the definition. Absolute
  * error vs the real log2 is < 2^-19 (mantissa truncation + 20-bit
  * fraction floor), pinned in RankSpec.
  *
  * Null contract: n < 1 (log undefined) and null input yield null.
  * Scale shape: map-only, codegen'd, O(1) per row — 20 multiply/shifts. */
case class Log2Fp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "log2_fp"

  def compute(n: Long): Long = Log2Fp.compute(n)

  override protected def nullSafeEval(input: Any): Any = {
    val n = input.asInstanceOf[Long]
    if (n < 1L) null else Log2Fp.compute(n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("log2fp", this, classOf[Log2Fp].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"if ($c < 1L) { ${ev.isNull} = true; } else { ${ev.value} = $ref.compute($c); }")
  }

  override protected def withNewChildInternal(newChild: Expression): Log2Fp =
    copy(child = newChild)
}

object Log2Fp {
  /** Fraction precision: the result is floor(log2(n) * 2^FracBits). */
  val FracBits: Int = 20
  /** The Q20 scale, 2^20 — the "1.0" of the fixed-point result. */
  val One: Long = 1L << FracBits

  /** Column wrapper: log2_fp(n) → bigint (null for n < 1 or null). */
  def apply(n: Column): Column =
    ColumnBridge.column(Log2Fp(ColumnBridge.expression(n.cast("long"))))

  /** The exact algorithm — shared by the expression (interpreted + codegen
    * paths), the RankSpec driver-side reference, and mirrored verbatim by
    * the DuckDB ladder SQL. Caller guarantees n >= 1. */
  def compute(n: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (e >= FracBits) n >>> (e - FracBits) else n << (FracBits - e)
    var fr = 0L
    var i = 0
    while (i < FracBits) {
      val sq = x * x // x < 2^21 so sq < 2^42: no overflow
      if (sq >= (1L << (2 * FracBits + 1))) { fr = fr * 2 + 1; x = sq >>> (FracBits + 1) }
      else { fr = fr * 2; x = sq >>> FracBits }
      i += 1
    }
    (e.toLong << FracBits) + fr
  }
}
