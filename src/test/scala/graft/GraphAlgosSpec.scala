package graft

import org.scalatest.funsuite.AnyFunSuite

/** PageRank unit semantics (GraphAlgos.pagerank) against hand-computed
  * fixpoints, plus the bench query's structural properties.
  */
class GraphAlgosSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def ranksOf(edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    import spark.implicits._
    graft.ops.GraphAlgos.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric pair is a fixpoint at rank 1.0") {
    val got = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 3)
    assert(got.keySet == Set("a", "b"))
    got.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("undirected star: two supersteps match the hand-computed values") {
    // c <-> {l1, l2, l3}: deg(c)=3, deg(l)=1
    val edges = Seq("l1", "l2", "l3").flatMap(l => Seq(("c", l), (l, "c")))
    val r1 = ranksOf(edges, iters = 1)
    assert(math.abs(r1("c") - (0.15 + 0.85 * 3.0)) < 1e-12)          // 2.7
    assert(math.abs(r1("l1") - (0.15 + 0.85 / 3.0)) < 1e-12)         // 0.4333
    val r2 = ranksOf(edges, iters = 2)
    assert(math.abs(r2("c") - (0.15 + 0.85 * 3 * (0.15 + 0.85 / 3.0))) < 1e-12)
    assert(math.abs(r2("l1") - (0.15 + 0.85 * (0.15 + 0.85 * 3.0) / 3.0)) < 1e-12)
  }

  test("large/small-star CC labels a 300-node chain in the 32-round cap") {
    // a path graph is the adversarial case: min-label propagation needs
    // O(diameter)=300 rounds here; large/small-star must finish inside
    // its 32-round cap (O(log² n)) with every node labeled by the min
    import spark.implicits._
    val chain = (0L until 299L).map(i => (i + 1, i)).toDF("i", "j")
    val labels = graft.ops.GraphAlgos.componentsLargeSmallStar(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == 300)
    assert(labels.values.forall(_ == 0L), "whole chain is one component")
    // two disjoint components stay separate
    val two = (Seq((1L, 2L), (2L, 3L)) ++ Seq((10L, 11L), (11L, 12L)))
      .toDF("i", "j")
    val l2 = graft.ops.GraphAlgos.componentsLargeSmallStar(two)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(l2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("bench graph: type hubs outrank user nodes") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, sf).collect()
    val (types, users) = rows.partition(_.getString(0).startsWith("t:"))
    assert(types.nonEmpty && users.nonEmpty)
    val minType = types.map(_.getDouble(1)).min
    val maxUser = users.map(_.getDouble(1)).max
    assert(minType > maxUser,
      s"every event-type hub ($minType) should outrank every user ($maxUser)")
  }
}
