package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column ⇄ Expression converters so the graft
  * library can wrap its native Catalyst expressions (e.g. SimHash64) as
  * ordinary Columns without going through the SQL parser. Lives in the
  * org.apache.spark.sql package tree because ExpressionUtils is
  * private[sql] — the standard extension-library pattern. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
