package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: DEFLATE-compressed size (bytes) of a
  * string's UTF-8 encoding, at a fixed compression level with raw
  * (headerless) output.
  *
  * Why it exists: compressed-size / raw-size is the classic
  * "compressibility" quality signal for web corpora (RedPajama-v2's
  * quality-signal family, Gopher's repetition rationale): boilerplate,
  * keyword-stuffed spam and template farms compress far below natural
  * prose, while encoded blobs barely compress at all. The ratio needs the
  * actual DEFLATE byte count, which no SQL engine exposes — hence the
  * repo's (b)-tier extension, a codegen'd unary expression.
  *
  * Determinism: the output is a pure function of (input bytes, level,
  * nowrap, the JVM's bundled zlib). One JDK → bit-stable across runs and
  * executors (pinned in spec); the cross-ENGINE oracle therefore treats
  * the deflate count as a dumped independent-pass scalar and re-derives
  * everything downstream (byte counts, ppm ratio, gate decision) itself.
  *
  * Scale shape: map-only; one Deflater per row (allocated and `end()`ed
  * inside the call — Deflater holds native zlib state and MUST be
  * released; a shared instance would race across codegen rows). Cost is
  * O(bytes) per document — the honest price of the signal, comparable to
  * one extra parse pass. */
case class DeflateSize(child: Expression, level: Int) extends UnaryExpression {

  require(level >= 0 && level <= 9, s"deflate level must be 0..9, got $level")

  override def dataType: DataType = LongType

  override def prettyName: String = "deflate_size"

  def sizeOf(u: UTF8String): Long = {
    val bytes = u.getBytes
    val d = new Deflater(level, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def nullSafeEval(input: Any): Any =
    sizeOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateSize", this, classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sizeOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  /** Column wrapper: deflate_size(text: string) → bigint (UTF-8 bytes
    * after raw DEFLATE at the given level; 0-byte input → a few bytes of
    * stream framing, never 0). */
  def apply(text: Column, level: Int = 6): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(text), level))
}
