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
    pred: Map[String, (Long, Long, Long)],
    csets: Seq[(Set[String], Long)]) extends Serializable {

  def estimate(tp: TriplePattern): Double = tp.p match {
    case I(p) =>
      val (n, ds, dn) = pred.getOrElse(p, (0L, 1L, 1L))
      scaled(n, ds, dn, tp)
    case _ => scaled(total, totalDs, totalDo, tp)
  }

  /** Subjects whose predicate set covers `preds` — the characteristic-
    * set star estimate (Neumann & Moerkotte ICDE 2011; see
    * [[graft.ops.RdfStats]] for the summary as a queryable artifact).
    * None when the summary wasn't gathered. Stored sets are the top-K
    * by member count, so a miss UNDERestimates — safe for ordering. */
  def starSubjects(preds: Set[String]): Option[Long] =
    if (csets.isEmpty) None
    else Some(csets.iterator.filter(c => preds.subsetOf(c._1)).map(_._2).sum)

  /** Conditional cardinality of adding `tp` to a star already bound on
    * the same subject variable with constant predicates `starPreds`:
    * joint subject count × the predicate's per-subject multiplicity ×
    * constant-object selectivity. Falls back to None (caller uses the
    * independence estimate) for variable predicates / constant
    * subjects / no summary. Correlation-aware where independence is
    * systematically wrong: co-occurring predicates stop looking cheap
    * just because their global count is small. */
  def conditional(tp: TriplePattern, starPreds: Set[String]): Option[Double] =
    (tp.s, tp.p) match {
      case (V(_), I(p)) if starPreds.nonEmpty =>
        starSubjects(starPreds + p).map { subj =>
          val (n, ds, dn) = pred.getOrElse(p, (0L, 1L, 1L))
          val mult = n.toDouble / math.max(ds, 1L)
          val oSel = tp.o match {
            case V(_) => 1.0
            case _ => 1.0 / math.max(dn, 1L)
          }
          subj * mult * oSel
        }
      case _ => None
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

  /** Stored characteristic sets are capped at the top-K shapes by
    * member count — structural shapes are schema-like in practice, but
    * adversarial data could mint one per subject; the cap bounds
    * driver memory and only costs estimate precision (underestimates
    * for uncovered shapes). */
  val MaxCsets = 1024

  /** One aggregate over the quad set → the per-predicate statistics,
    * plus one subject-keyed aggregate → the characteristic-set summary
    * (both vocabulary/shape-sized results; the second pass is the same
    * O(n) shuffle class as the first). Whole-store totals are derived
    * from the per-predicate rows (NDV sums overestimate the true union
    * NDV, which only makes variable-predicate patterns look expensive
    * — the safe direction). */
  def fromQuads(quads: DataFrame): CardEstimator = {
    val rows = quads.groupBy("p").agg(
      count(lit(1)).as("n"),
      approx_count_distinct("s").as("ds"),
      approx_count_distinct("o_value").as("dn"))
      .collect()
    val pred = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val csetRows = quads.groupBy("s")
      .agg(sort_array(collect_set(col("p"))).as("pset"))
      .groupBy("pset").agg(count(lit(1)).as("n_subj"))
      .orderBy(col("n_subj").desc, col("pset"))
      .limit(MaxCsets)
      .collect()
    val csets = csetRows.map(r =>
      r.getSeq[String](0).toSet -> r.getLong(1)).toSeq
    new CardEstimator(
      pred.valuesIterator.map(_._1).sum,
      pred.valuesIterator.map(_._2).sum,
      pred.valuesIterator.map(_._3).sum,
      pred, csets)
  }

  /** Stats straight off the ENCODED store (dict mode): the same
    * vocabulary-sized summary as [[fromQuads]], but the aggregation
    * groups/NDV-counts 8-byte ids and never runs the three decode
    * joins a whole-store string view would cost — at 100 TB the stats
    * pass reads the id columns only. Predicate ids map back to IRIs
    * through one vocabulary-sized dictionary join. (Object NDV counts
    * term IDENTITIES rather than lexical forms — two literals that
    * differ only in language tag count separately — which is, if
    * anything, the better selectivity signal.) */
  def fromDictStore(store: graft.model.DictBackend): CardEstimator = {
    val enc = store.readEncoded()
    val dict = store.readDict()
    val rows = enc.groupBy("p_id").agg(
      count(lit(1)).as("n"),
      approx_count_distinct("s_id").as("ds"),
      approx_count_distinct("o_id").as("dn"))
      .join(dict.select(col("id"), col("v").as("p")), col("p_id") === col("id"))
      .select("p", "n", "ds", "dn", "p_id")
      .collect()
    val pred = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val pidTerm = rows.map(r => r.getLong(4) -> r.getString(0)).toMap
    val csetRows = enc.groupBy("s_id")
      .agg(sort_array(collect_set(col("p_id"))).as("pset"))
      .groupBy("pset").agg(count(lit(1)).as("n_subj"))
      .orderBy(col("n_subj").desc, col("pset"))
      .limit(MaxCsets)
      .collect()
    val csets = csetRows.map(r =>
      r.getSeq[Long](0).map(pidTerm).toSet -> r.getLong(1)).toSeq
    new CardEstimator(
      pred.valuesIterator.map(_._1).sum,
      pred.valuesIterator.map(_._2).sum,
      pred.valuesIterator.map(_._3).sum,
      pred, csets)
  }

  /** Estimator from already-gathered summary tables — the
    * [[StoreStats]] artifact-load path (no store scan). */
  def fromTables(pred: Map[String, (Long, Long, Long)],
      csets: Seq[(Set[String], Long)]): CardEstimator =
    new CardEstimator(
      pred.valuesIterator.map(_._1).sum,
      pred.valuesIterator.map(_._2).sum,
      pred.valuesIterator.map(_._3).sum,
      pred, csets)

  /** Test/inspection helper: the greedy order the compiler will choose
    * for a pattern batch under this estimator — estimate-sorted, then
    * connectivity-first with characteristic-set conditional refinement
    * among connected candidates, exactly like the BGP loop. */
  def orderOf(est: CardEstimator, batch: Seq[TriplePattern]): Seq[TriplePattern] = {
    val remaining = batch.sortBy(est.estimate).toBuffer
    val out = scala.collection.mutable.Buffer.empty[TriplePattern]
    var bound = Set.empty[String]
    val starPreds = scala.collection.mutable.Map.empty[String, Set[String]]
      .withDefaultValue(Set.empty)
    while (remaining.nonEmpty) {
      val idx = pickNext(remaining.toSeq, bound, starPreds, Some(est),
        est.estimate)
      val tp = remaining.remove(idx)
      bound ++= tp.vars
      (tp.s, tp.p) match {
        case (V(v), I(p)) => starPreds(v) = starPreds(v) + p
        case _ => ()
      }
      out += tp
    }
    out.toSeq
  }

  /** Shared greedy selection step (compiler BGP loop + [[orderOf]]):
    * among CONNECTED candidates pick the one with the smallest
    * characteristic-set conditional estimate (falling back to the
    * already-sorted individual estimate, so ties keep the sorted
    * order); disconnected batches fall back to head. */
  private[sparql] def pickNext(remaining: Seq[TriplePattern],
      bound: Set[String],
      starPreds: collection.Map[String, Set[String]],
      ce: Option[CardEstimator],
      est: TriplePattern => Double): Int = {
    val connected = remaining.zipWithIndex
      .filter { case (tp, _) => tp.vars.exists(bound) }
    if (connected.isEmpty) 0
    else ce match {
      case Some(c) =>
        connected.minBy { case (tp, i) =>
          val cond = tp.s match {
            case V(v) => c.conditional(tp, starPreds.getOrElse(v, Set.empty))
            case _ => None
          }
          // tuple ordering keeps the sorted-order tie-break stable
          (cond.getOrElse(est(tp)), i)
        }._2
      case None => connected.head._2
    }
  }
}
