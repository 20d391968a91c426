package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters (Spark 4
  * moved `Column` to a backend-agnostic ColumnNode representation; classic
  * backend conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * Spark source `sql/core/.../classic/columnNodeSupport.scala`). Standard
  * pattern for libraries that define native Catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
