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

  /** Register graft's native expressions in the session function
    * registry so they are callable from `spark.sql` text. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    reg.createOrReplaceTempFunction("encode_for_uri",
      exprs => graft.sparql.EncodeForUriExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => graft.sparql.DotProductExpr(exprs(0), exprs(1)), "built-in")
  }
}
