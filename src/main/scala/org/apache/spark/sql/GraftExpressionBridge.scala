package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters
  * (Spark 4 split the public Column API from catalyst; building a Column
  * from a custom Expression requires classic.ExpressionUtils, which is
  * sql-package-private). This is the entire surface we borrow — no
  * internal behavior is overridden.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
