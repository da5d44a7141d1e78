package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions (Spark 4 moved
  * the classic converters behind package-private `ExpressionUtils`).
  * Lives in the spark.sql package solely to re-export them; no Spark
  * internals are modified.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
