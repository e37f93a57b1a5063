package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `org.apache.spark.sql`-private helpers.
  *
  * Spark 4's `Column` wraps a `ColumnNode` rather than a Catalyst
  * `Expression`; the conversion helpers live in `classic.ExpressionUtils`,
  * which is `private[sql]`. Declaring this object inside the
  * `org.apache.spark.sql` package tree is the standard extension-library
  * technique for reaching such internals (used by Delta, Sedona, etc.).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
