package graft.sparql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-deployment route for graft's native Catalyst expressions
  * (SURVEY.md §7.3 tier (b) — the `SparkSessionExtensions` half of the
  * extension surface; `GraftShim.registerFunctions` is the live-session
  * half):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.sparql.GraftSparkExtensions ...
  * }}}
  *
  * makes `encode_for_uri` (RFC 3986, SPARQL §17.4.2.8) and `vec_dot`
  * (allocation-free array<double> dot product) available to plain
  * `spark.sql` text on every session of the cluster — SQL users get
  * the same codegen'd expressions the engine uses internally, no UDF
  * registration or closure shipping involved.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("encode_for_uri"),
      new ExpressionInfo(classOf[EncodeForUriExpr].getName, "encode_for_uri"),
      (exprs: Seq[Expression]) => EncodeForUriExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1))))
  }
}
