package graft

import org.scalatest.funsuite.AnyFunSuite

/** The degenerate SPARQL compatible-join shape: two group elements whose
  * ONLY shared variable is maybe-unbound on both sides (here: bound in
  * one UNION branch each). §18.5 semantics require the null-tolerant
  * join; the compiler must still produce a hash-joinable plan for the
  * both-bound bulk (Compiler.compatJoinAllSoft) instead of a nested
  * loop over the full pair space.
  */
class CompatJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshEngine(): GraphEngine = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-cj-${System.nanoTime()}"
    new GraphEngine(new graft.model.GraphStore(spark, dir))
  }

  private val query = """
    SELECT ?v FROM <g:cj>
    WHERE {
      { { ?a <p1> ?v } UNION { ?a2 <p2> ?w } }
      { { ?b <p3> ?v } UNION { ?b2 <p4> ?u } }
    }"""

  private def load(engine: GraphEngine): Unit =
    engine.update("""INSERT DATA { GRAPH <g:cj> {
      <x:1> <p1> "m" .
      <x:2> <p2> "z" .
      <y:1> <p3> "m" .
      <y:2> <p3> "n" .
      <y:3> <p4> "q" .
    } }""")

  test("all-soft shared var: §18.5 multiset semantics (each pair once)") {
    val engine = freshEngine()
    load(engine)
    // left solutions: v ∈ {m, null}; right solutions: v ∈ {m, n, null}.
    // compatible pairs: (m,m) (m,null) (null,m) (null,n) (null,null)
    // → coalesced ?v multiset {m, m, m, n, null}
    val got = engine.select(query).collect()
      .map(r => Option(r.getString(0)).getOrElse("<unbound>")).sorted.toSeq
    assert(got == Seq("<unbound>", "m", "m", "m", "n"))
  }

  test("all-soft shared var: the both-bound branch is an equi (hash) join") {
    val engine = freshEngine()
    load(engine)
    val p = engine.select(query).queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"),
      s"no hash-joinable branch — all-soft join degraded to pure NLJ:\n${p.take(1200)}")
  }
}
