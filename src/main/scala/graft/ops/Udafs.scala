package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Custom typed aggregation surface (SURVEY.md §2.7 extension): the
  * `Aggregator[IN, BUF, OUT]` machinery, registered as an untyped UDAF
  * usable in `agg(...)`. The example is a weighted mean with a mergeable
  * (sum, weight) buffer — the same shape an HLL / sketch buffer takes.
  */
object Udafs {

  case class WSum(sum: Double, weight: Double)

  /** weighted mean of `value` by `weight`, null-safe, mergeable. */
  class WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, in: (Double, Double)): WSum =
      WSum(b.sum + in._1 * in._2, b.weight + in._2)
    override def merge(a: WSum, b: WSum): WSum =
      WSum(a.sum + b.sum, a.weight + b.weight)
    override def finish(r: WSum): Double =
      if (r.weight == 0.0) Double.NaN else r.sum / r.weight
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // quantity-weighted mean price per return flag via the Aggregator
    "q26_weighted_mean_udaf" -> ((s, d) => {
      val wmean = udaf(new WeightedMean())
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(wmean(col("l_extendedprice"), col("l_quantity")), 4)
          .as("weighted_price"))
        .orderBy(col("l_returnflag"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q26_weighted_mean_udaf" ->
      """SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS weighted_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
