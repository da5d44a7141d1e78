package graft.sparql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Algebra._

/** Cost-based BGP join ordering (SURVEY §4.2's "what Catalyst can't do
  * for us" list): Catalyst never reorders the joins the compiler emits —
  * DataFrame join order IS execution order unless CBO has table-level
  * stats, which a self-joined quad scan doesn't have. So the compiler
  * owns pattern ordering, and by default uses a static shape rank
  * (constant object ≫ constant subject ≫ constant predicate).
  *
  * This class refines that rank with data: per-predicate triple count
  * and distinct-subject/object counts, gathered in ONE aggregate over
  * the store. The result is vocabulary-sized (#predicates rows — the
  * same bounded-by-construction class as graph-name lists), so holding
  * it on the driver inside the planner is sound at any corpus size; the
  * NDVs come from approx_count_distinct (HLL), which at 100 TB is the
  * only affordable answer and is plenty for ORDERING decisions.
  *
  * A triple pattern's estimated cardinality = its predicate's triple
  * count, scaled by 1/NDV for each constant slot (the classic
  * attribute-independence estimate — RDF-3X §4, Selinger '79 shape).
  * Variable predicates fall back to whole-store totals.
  *
  * Scoped via a DynamicVariable: [[graft.GraphEngine.withCardinalityStats]]
  * installs an estimator for its own compiles only; engines without
  * stats (and concurrent threads) keep the static rank.
  */
final class CardEstimator private (
    total: Long, totalDs: Long, totalDo: Long,
    pred: Map[String, (Long, Long, Long)]) extends Serializable {

  def estimate(tp: TriplePattern): Double = tp.p match {
    case I(p) =>
      val (n, ds, dn) = pred.getOrElse(p, (0L, 1L, 1L))
      scaled(n, ds, dn, tp)
    case _ => scaled(total, totalDs, totalDo, tp)
  }

  private def scaled(n: Long, ds: Long, dn: Long, tp: TriplePattern): Double = {
    val sSel = tp.s match {
      case V(_) => 1.0
      case _ => 1.0 / math.max(ds, 1L)
    }
    val oSel = tp.o match {
      case V(_) => 1.0
      case _ => 1.0 / math.max(dn, 1L)
    }
    n * sSel * oSel
  }
}

object CardEstimator {

  /** The planner-scope hook consulted by the compiler's BGP loop. */
  val current = new scala.util.DynamicVariable[Option[CardEstimator]](None)

  /** One aggregate over the quad set → the full statistics object.
    * Whole-store totals are derived from the per-predicate rows (NDV
    * sums overestimate the true union NDV, which only makes variable-
    * predicate patterns look expensive — the safe direction). */
  def fromQuads(quads: DataFrame): CardEstimator = {
    val rows = quads.groupBy("p").agg(
      count(lit(1)).as("n"),
      approx_count_distinct("s").as("ds"),
      approx_count_distinct("o_value").as("dn"))
      .collect()
    val pred = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    new CardEstimator(
      pred.valuesIterator.map(_._1).sum,
      pred.valuesIterator.map(_._2).sum,
      pred.valuesIterator.map(_._3).sum,
      pred)
  }

  /** Test/inspection helper: the greedy order the compiler will choose
    * for a pattern batch under this estimator — estimate-sorted, then
    * connectivity-first exactly like the BGP loop. */
  def orderOf(est: CardEstimator, batch: Seq[TriplePattern]): Seq[TriplePattern] = {
    val remaining = batch.sortBy(est.estimate).toBuffer
    val out = scala.collection.mutable.Buffer.empty[TriplePattern]
    var bound = Set.empty[String]
    while (remaining.nonEmpty) {
      val idx = remaining.indexWhere(_.vars.exists(bound)) match {
        case -1 => 0
        case j => j
      }
      val tp = remaining.remove(idx)
      bound ++= tp.vars
      out += tp
    }
    out.toSeq
  }
}
