package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.sparql.{Algebra, CardEstimator}
import Algebra.{I, L, TriplePattern, V}

class CardEstimatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 100 `common` triples over 100 subjects, 2 `rare` triples — the
    * data-driven order must lead with `rare` where the static shape
    * rank (both patterns predicate-only) keeps written order. */
  private def skewedQuads = {
    import spark.implicits._
    val common = (0 until 100).map(i =>
      Quad.lit("g", s"http://ex/s$i", "http://ex/common", s"v${i % 10}"))
    val rare = (0 until 2).map(i =>
      Quad.lit("g", s"http://ex/s$i", "http://ex/rare", "hit"))
    val mid = (0 until 5).map(i =>
      Quad.lit("g", s"http://ex/s$i", "http://ex/mid", s"m$i"))
    (common ++ rare ++ mid).toDF()
  }

  test("estimates follow the data: count scaled by per-slot NDV") {
    val est = CardEstimator.fromQuads(skewedQuads)
    val common = TriplePattern(V("a"), I("http://ex/common"), V("x"))
    val rare = TriplePattern(V("a"), I("http://ex/rare"), V("x"))
    assert(est.estimate(rare) < est.estimate(common))
    // constant object divides by the predicate's object NDV (~10)
    val commonConst =
      TriplePattern(V("a"), I("http://ex/common"), L("v3"))
    assert(est.estimate(commonConst) < est.estimate(common))
    assert(est.estimate(commonConst) > est.estimate(rare))
    // unknown predicate → empty → most selective of all
    assert(est.estimate(
      TriplePattern(V("a"), I("http://ex/absent"), V("x"))) == 0.0)
  }

  test("greedy order anchors on the rare pattern, then connectivity") {
    val est = CardEstimator.fromQuads(skewedQuads)
    val p1 = TriplePattern(V("a"), I("http://ex/common"), V("x"))
    val p2 = TriplePattern(V("a"), I("http://ex/rare"), V("y"))
    assert(CardEstimator.orderOf(est, Seq(p1, p2)) == Seq(p2, p1))
    // a disconnected-but-selective pattern must NOT jump the queue once
    // the bound set exists: connectivity wins over estimate — `mid`
    // (5 triples) sorts ahead of `common` (100) but joins LAST because
    // only `common` connects to the rare anchor's variable
    val p3 = TriplePattern(V("b"), I("http://ex/mid"), V("z"))
    assert(CardEstimator.orderOf(est, Seq(p1, p3, p2)) ==
      Seq(p2, p1, p3))
  }

  test("an engine with stats returns the same rows as one without") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stats").toString
    val store = new graft.model.GraphStore(spark, dir)
    store.append(skewedQuads)
    val q = """
      SELECT ?a ?x WHERE {
        ?a <http://ex/common> ?x .
        ?a <http://ex/rare> "hit" .
      } ORDER BY ?a"""
    val plain = new GraphEngine(store).select(q).collect().toSeq
    val stats = new GraphEngine(store).withCardinalityStats()
      .select(q).collect().toSeq
    assert(stats == plain)
    assert(stats.size == 2)
  }
  /** Correlated-star fixture: `anti` (50 triples) co-occurs with EVERY
    * `rare2` subject, while `common2` (905 triples) co-occurs with only
    * 5 of them — global counts invert the joint sizes. */
  private def correlatedQuads = {
    import spark.implicits._
    val rareSubj = (0 until 50).map(i => s"http://ex/r$i")
    val rare = rareSubj.map(s => Quad.lit("g", s, "http://ex/rare2", "hit"))
    // anti co-occurs with every rare subject, plus 10 anti-only
    // subjects so rare2 (n=50) anchors uniquely ahead of anti (n=60)
    val anti = (rareSubj ++ (0 until 10).map(i => s"http://ex/x$i"))
      .map(s => Quad.lit("g", s, "http://ex/anti", "a"))
    val commonOnRare = rareSubj.take(5).map(s =>
      Quad.lit("g", s, "http://ex/common2", "c"))
    val commonElse = (0 until 900).map(i =>
      Quad.lit("g", s"http://ex/o$i", "http://ex/common2", "c"))
    (rare ++ anti ++ commonOnRare ++ commonElse).toDF()
  }

  test("characteristic sets fix correlated-star ordering where independence fails") {
    val est = CardEstimator.fromQuads(correlatedQuads)
    // joint subject counts from the summary
    assert(est.starSubjects(
      Set("http://ex/rare2", "http://ex/anti")).contains(50L))
    assert(est.starSubjects(
      Set("http://ex/rare2", "http://ex/common2")).contains(5L))
    val pRare = TriplePattern(V("s"), I("http://ex/rare2"), V("a"))
    val pAnti = TriplePattern(V("s"), I("http://ex/anti"), V("b"))
    val pCommon = TriplePattern(V("s"), I("http://ex/common2"), V("c"))
    // independence would join anti (n=50) before common2 (n=905) after
    // the rare anchor; the conditional estimate knows the rare+common2
    // star has only 5 subjects vs rare+anti's 50 and flips the order
    assert(CardEstimator.orderOf(est, Seq(pCommon, pAnti, pRare)) ==
      Seq(pRare, pCommon, pAnti))
  }
}
