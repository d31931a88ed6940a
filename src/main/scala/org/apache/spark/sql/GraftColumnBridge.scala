package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-package-private Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils): Spark 4 removed the
  * public `new Column(expr)` constructor, and this is the supported
  * conversion the built-in functions themselves use. Lives in the
  * org.apache.spark.sql package solely for access; no Spark code is
  * modified or duplicated. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
