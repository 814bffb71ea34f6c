package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string.
  *
  * Why it exists: web text arrives in mixed normalization forms — the same
  * rendered word appears both composed (`é` U+00E9) and decomposed
  * (`e` + U+0301), so any byte-keyed operator (exact dedup, line dedup,
  * shingling, URL keys) silently treats equal-looking documents as
  * distinct. Canonicalizing to NFC before keying is the standard fix
  * (CCNet/Dolma normalize-then-dedup); Spark has no built-in `normalize`
  * SQL function, so this is the repo's (b)-tier extension — a codegen'd
  * unary expression, not a UDF.
  *
  * Scale shape: map-only, zero allocation on the dominant path — web
  * corpora are overwhelmingly ASCII or already-NFC, and the expression
  * checks `isFullAscii()` (byte scan, no decode) then
  * `Normalizer.isNormalized` (quick-check tables, no allocation for
  * NFC-clean text) before paying the normalize+re-encode only for strings
  * that actually change.
  *
  * Cross-engine contract: the JDK and DuckDB's utf8proc both implement
  * Unicode NFC per UAX #15 — canonical composition is version-stable for
  * assigned code points, so `nfc_normalize(...)` replays this expression
  * verbatim in the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (u.isFullAscii) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
      else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("jstr")
      s"""
         |if ($c.isFullAscii()) {
         |  ${ev.value} = $c;
         |} else {
         |  java.lang.String $s = $c.toString();
         |  ${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column wrapper: nfc_normalize(text: string) → string. */
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
