package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column <-> Expression conversion that Spark 4 keeps
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Lives in the sql package solely to re-export those two calls for
  * graft's custom expressions; no behavior of its own.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
