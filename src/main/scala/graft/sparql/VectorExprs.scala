package graft.sparql

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * allocates an intermediate array per row pair; in an all-pairs or
  * top-k similarity kernel that allocation dominates. This expression
  * is a tight primitive loop in both interpreted and codegen paths
  * (SURVEY.md custom-expression tier (b)).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += a.getDouble(i) * b.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $sum = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $sum += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two `array<double>` columns — the
  * k-means/PQ assignment kernel (n × subspaces × codebook sqDists per
  * training round). Same left-to-right accumulation order as the
  * `aggregate(zip_with(a, b, (x,y) => (x-y)²), 0.0, _+_)` HOF it
  * replaces, so every `round(sqDist, 6)` the DuckDB oracles replay is
  * bit-identical (`HashExprParitySpec`). */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $sum = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $sum += $d * $d;
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    GraftShim.column(DotProductExpr(GraftShim.expression(a), GraftShim.expression(b)))

  def vec_sqdist(a: Column, b: Column): Column =
    GraftShim.column(SqDistExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
