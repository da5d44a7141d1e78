package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Inference
import graft.ops.Inference.{PropShape, SubClassOf, SubPropertyOf, Domain, Range}

/** Unit semantics of the inference operators — RDFS rule-by-rule cases
  * on tiny hand-checked graphs — plus structural properties of the
  * driver-visible fixture queries.
  */
class InferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private def stmts(rows: Seq[(String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("s", "p", "o", "kind")
  }

  private def materializedSet(rows: Seq[(String, String, String, String)]) =
    Inference.rdfsMaterialize(stmts(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("transitive closure: depth-4 chain closes in log rounds") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("a", "b")
    val got = Inference.transitiveClosure(edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
      ("b", "c"), ("b", "d"), ("b", "e"),
      ("c", "d"), ("c", "e"), ("d", "e")))
  }

  test("rdfs9: types propagate through a subClassOf chain") {
    val got = materializedSet(Seq(
      ("c1", SubClassOf, "c2", "iri"),
      ("c2", SubClassOf, "c3", "iri"),
      ("x", RdfType, "c1", "iri")))
    assert(got.filter(_._2 == RdfType).map(_._3) == Set("c1", "c2", "c3"))
  }

  test("rdfs7: statements reappear under transitive superproperties") {
    val got = materializedSet(Seq(
      ("p1", SubPropertyOf, "p2", "iri"),
      ("p2", SubPropertyOf, "p3", "iri"),
      ("x", "p1", "y", "iri")))
    assert(got.filter(_._1 == "x").map(_._2) == Set("p1", "p2", "p3"))
  }

  test("rdfs2 fires through a superproperty's domain; rdfs3 skips literals") {
    val got = materializedSet(Seq(
      ("p1", SubPropertyOf, "p2", "iri"),
      ("p2", Domain, "D", "iri"),
      ("p1", Range, "R", "iri"),
      ("x", "p1", "y", "iri"),
      ("x2", "p1", "5", "literal")))
    // domain on p2 types both subjects (p1 ⊑ p2 lifts their statements)
    assert(got.contains(("x", RdfType, "D")))
    assert(got.contains(("x2", RdfType, "D")))
    // range types the IRI object but NOT the literal one
    assert(got.contains(("y", RdfType, "R")))
    assert(!got.contains(("5", RdfType, "R")))
  }

  test("domain/range-inferred types climb the class hierarchy (stratified pass is complete)") {
    val got = materializedSet(Seq(
      ("D", SubClassOf, "Dsup", "iri"),
      ("p", Domain, "D", "iri"),
      ("x", "p", "y", "iri")))
    assert(got.contains(("x", RdfType, "D")))
    assert(got.contains(("x", RdfType, "Dsup")))
  }

  test("materialization is idempotent (already-closed graph is a fixpoint)") {
    val base = Seq(
      ("c1", SubClassOf, "c2", "iri"),
      ("p1", SubPropertyOf, "p2", "iri"),
      ("p1", Domain, "c1", "iri"),
      ("x", "p1", "y", "iri"),
      ("x", RdfType, "c1", "iri"))
    val once = Inference.rdfsMaterialize(stmts(base))
    val schemaRows = stmts(base).filter(
      col("p").isin(SubClassOf, SubPropertyOf, Domain, Range))
    val twice = Inference.rdfsMaterialize(once.unionByName(schemaRows))
    val a = once.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val b = twice.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("sameAs fuse rewrites a 3-alias chain onto the minimum IRI") {
    import spark.implicits._
    val statements = stmts(Seq(
      ("urn:u:1", "p", "a", "literal"),
      ("urn:mail:1", "p", "b", "literal"),
      ("urn:acct:1", "p", "c", "literal"),
      ("urn:other", "p", "d", "literal")))
    val sameAs = Seq(("urn:u:1", "urn:acct:1"), ("urn:acct:1", "urn:mail:1"))
      .toDF("s", "o")
    val got = Inference.fuseSameAs(statements, sameAs).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(got == Set(
      ("urn:acct:1", "a"), ("urn:acct:1", "b"), ("urn:acct:1", "c"),
      ("urn:other", "d")))
  }

  test("shacl: each constraint kind fires exactly on its planted defect") {
    val statements = stmts(Seq(
      // ok: one user, positive value, in-set type
      ("e1", "http://localhost/user_id", "u1", "iri"),
      ("e1", "http://localhost/value", "3.5", "literal"),
      ("e1", "http://localhost/etype", "click", "literal"),
      // e2: missing user (minCount), negative value (minInclusive)
      ("e2", "http://localhost/value", "-2.0", "literal"),
      ("e2", "http://localhost/etype", "view", "literal"),
      // e3: two users (maxCount), off-set type (in)
      ("e3", "http://localhost/user_id", "u1", "iri"),
      ("e3", "http://localhost/user_id", "u2", "iri"),
      ("e3", "http://localhost/etype", "bogus", "literal")))
    val report = Inference.shaclValidate(statements, Seq(
      PropShape("http://localhost/user_id", minCount = Some(1), maxCount = Some(1)),
      PropShape("http://localhost/value", minInclusive = Some(0.0)),
      PropShape("http://localhost/etype",
        inSet = Some(Seq("click", "view")))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(report == Set(
      ("e2", "minCount(user_id)", 0L),
      ("e2", "minInclusive(value)", 1L),
      ("e3", "maxCount(user_id)", 2L),
      ("e3", "in(etype)", 1L)))
  }

  test("graph diff: adds, removes, and a rewrite appearing as both") {
    val v1 = stmts(Seq(
      ("a", "p", "1", "literal"),
      ("b", "p", "2", "literal"),
      ("c", "p", "3", "literal"))).select("s", "p", "o")
    val v2 = stmts(Seq(
      ("a", "p", "1", "literal"),   // unchanged
      ("b", "p", "2x", "literal"),  // rewritten
      ("d", "p", "4", "literal"))). // added; c removed
      select("s", "p", "o")
    val got = Inference.diffGraphs(v1, v2).collect()
      .map(r => (r.getString(3), r.getString(0), r.getString(2))).toSet
    assert(got == Set(
      ("add", "b", "2x"), ("add", "d", "4"),
      ("remove", "b", "2"), ("remove", "c", "3")))
  }

  test("fixture queries return structurally sane results at sf") {
    val types = SparkEntry.queries("rdfs_entailment_types")(spark, sf).collect()
    val byCls = types.map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = (name: String) => byCls.getOrElse("http://localhost/cls/" + name, 0L)
    // hierarchy arithmetic: interaction = conversion + engagement members
    assert(n("interaction") == n("conversion") + n("engagement"))
    // every event has a value triple => measured == all events == cls/event
    assert(n("measured") == n("event"))
    assert(n("user") > 0)

    val props = SparkEntry.queries("rdfs_entailment_props")(spark, sf).collect()
    val byP = props.map(r => r.getString(0) -> r.getLong(1)).toMap
    // superproperty counts equal the base property's
    assert(byP("http://localhost/actor") == byP("http://localhost/user_id"))
    assert(byP("http://localhost/participant") == byP("http://localhost/user_id"))

    val shacl = SparkEntry.queries("shacl_report")(spark, sf).collect()
    val kinds = shacl.map(_.getString(1)).toSet
    assert(kinds == Set("minCount(user_id)", "maxCount(user_id)",
      "minInclusive(value)", "in(etype)", "pattern(etype)",
      "nodeKind(user_id)", "datatype(code)"))

    val diff = SparkEntry.queries("rdf_graph_diff")(spark, sf).collect()
    assert(diff.map(_.getString(0)).toSet == Set("add", "remove"))
  }
  private val OwlInv = Inference.OwlInverseOf
  private val OwlSym = Inference.OwlSymmetric
  private val OwlTrans = Inference.OwlTransitive

  private def owlSet(rows: Seq[(String, String, String, String)]) =
    Inference.owlMaterialize(stmts(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("owl: inverseOf mirrors statements both ways") {
    val got = owlSet(Seq(
      ("p", OwlInv, "q", "iri"),
      ("a", "p", "b", "iri"),
      ("c", "q", "d", "iri")))
    assert(got.contains(("b", "q", "a")))
    assert(got.contains(("d", "p", "c")))
  }

  test("owl: symmetric adds the flipped edge; transitive closes chains") {
    val got = owlSet(Seq(
      ("conn", RdfType, OwlSym, "iri"),
      ("part", RdfType, OwlTrans, "iri"),
      ("a", "conn", "b", "iri"),
      ("x", "part", "y", "iri"),
      ("y", "part", "z", "iri"),
      ("z", "part", "w", "iri")))
    assert(got.contains(("b", "conn", "a")))
    assert(got.contains(("x", "part", "z")))
    assert(got.contains(("x", "part", "w")))
    assert(got.contains(("y", "part", "w")))
    assert(!got.contains(("y", "part", "x")), "transitive is not symmetric")
  }

  test("owl: a transitive predicate's inverse mirrors the closure") {
    val got = owlSet(Seq(
      ("part", RdfType, OwlTrans, "iri"),
      ("part", OwlInv, "haspart", "iri"),
      ("x", "part", "y", "iri"),
      ("y", "part", "z", "iri")))
    assert(got.contains(("x", "part", "z")))
    assert(got.contains(("z", "haspart", "x")), "inverse of the CLOSED edge")
  }

  test("owl: symmetric+transitive on one predicate is rejected loudly") {
    intercept[IllegalArgumentException] {
      owlSet(Seq(
        ("p", RdfType, OwlSym, "iri"),
        ("p", RdfType, OwlTrans, "iri"),
        ("a", "p", "b", "iri")))
    }
  }

  test("rdfs incremental identity: base+delta union equals full materialization") {
    val schema = Seq(
      ("c1", SubClassOf, "c2", "iri"),
      ("p1", SubPropertyOf, "p2", "iri"))
    val base = Seq(("x", RdfType, "c1", "iri"), ("x", "p1", "y", "iri"))
    val delta = Seq(("z", RdfType, "c1", "iri"), ("z", "p1", "w", "iri"))
    val full = Inference.rdfsMaterialize(stmts(schema ++ base ++ delta))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val inc = Inference.rdfsMaterialize(stmts(schema ++ base))
      .unionByName(Inference.rdfsMaterialize(stmts(schema ++ delta)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(inc == full)
  }
  test("incremental closure chains multiple delta edges through base segments") {
    import spark.implicits._
    // base: b->c (closed); delta: a->b and c->d — the path a->d uses
    // TWO delta edges bridged by a base segment, exercising the
    // doubling loop, not just the one-delta seed
    val baseC = Inference.transitiveClosure(Seq(("b", "c")).toDF("a", "b"))
    val delta = Seq(("a", "b"), ("c", "d")).toDF("a", "b")
    val got = Inference.incrementalClosure(baseC, delta).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("b", "c"), ("a", "b"), ("c", "d"),
      ("a", "c"), ("b", "d"), ("a", "d")))
  }

  test("incremental closure equals full closure on a random-ish edge batch") {
    import spark.implicits._
    val all = (0 until 30).map(i => (s"n${i % 10}", s"n${(i * 7 + 3) % 10}"))
      .distinct.filter(e => e._1 != e._2)
    val (base, delta) = all.partition(_._1.hashCode % 3 != 0)
    val full = Inference.transitiveClosure(all.toDF("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val inc = Inference.incrementalClosure(
      Inference.transitiveClosure(base.toDF("a", "b")),
      delta.toDF("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(inc == full)
  }
}
