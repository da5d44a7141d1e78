package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RdfStats

/** Characteristic-set summary semantics on a hand-checked graph plus
  * fixture-level invariants.
  */
class RdfStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("characteristic sets partition subjects by predicate SET (multiplicity counted in triples)") {
    import spark.implicits._
    val stmts = Seq(
      ("s1", "p", "x"), ("s1", "q", "y"),
      ("s2", "p", "x"), ("s2", "q", "y"), ("s2", "q", "z"), // same set, extra triple
      ("s3", "p", "x")).toDF("s", "p", "o")
    val got = RdfStats.characteristicSets(stmts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("p,q", 2L, 5L), ("p", 1L, 1L)))
  }

  test("fixture summary: member counts cover every subject exactly once") {
    val rows = SparkEntry.queries("rdf_char_sets")(spark, sf).collect()
    val nSubjects = rows.map(_.getLong(1)).sum
    val nEvents = graft.util.Tables.events(spark, sf).count()
    assert(nSubjects == nEvents, "every event subject in exactly one set")
    assert(rows.length >= 2, "the fixture produces multiple shapes")
  }

  test("star-query estimate from the summary is exact for single-valued predicates") {
    val r = SparkEntry.queries("rdf_cset_estimate")(spark, sf).collect().head
    assert(r.getLong(0) == r.getLong(1) && r.getInt(2) == 1)
  }
}
