package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.sparql.Algebra._
import graft.sparql.Algebra.dsl._
import graft.sparql.Compiler

/** Edge semantics of the SPARQL compiler beyond what the 16 reference
  * queries exercise: FILTER, disconnected BGP components (explicit
  * cross join — SURVEY.md §7.4.6), OPTIONAL correlated through a
  * BIND-produced variable, same-variable-twice patterns.
  */
class CompilerEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ex = "http://ex/"
  private def quadsDf(quads: Seq[Quad]) = {
    import spark.implicits._
    quads.toDF()
  }

  private val data = quadsDf(Seq(
    Quad.lit("g", ex + "a", ex + "name", "www.alpha.be"),
    Quad.lit("g", ex + "b", ex + "name", "beta.be"),
    Quad.lit("g", ex + "a", ex + "size", "10"),
    Quad.iri("g", ex + "a", ex + "self", ex + "a"), // ?x p ?x case
    Quad.iri("g", ex + "b", ex + "self", ex + "a"),
    Quad.lit("g", ex + "tag", ex + "label", "T")))

  test("SERVICE joins a registered endpoint; SILENT degrades; unregistered throws") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-svc-${System.nanoTime()}"
    val store = new graft.model.GraphStore(spark, dir)
    store.append(quadsDf(Seq(
      Quad.lit("http://g/main", ex + "x", ex + "type", "view"),
      Quad.lit("http://g/main", ex + "y", ex + "type", "error"))))
    graft.sparql.Services.register("urn:svc:t", quadsDf(Seq(
      Quad.lit(Quad.DefaultGraph, "urn:m1", ex + "etype", "view"),
      Quad.lit(Quad.DefaultGraph, "urn:m1", ex + "stage", "browse"))))
    val engine = new GraphEngine(store)
    val got = engine.select(s"""
      SELECT ?s ?stage FROM <http://g/main>
      WHERE { ?s <${ex}type> ?t .
              SERVICE <urn:svc:t> { ?m <${ex}etype> ?t ;
                                       <${ex}stage> ?stage } }""").collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == ex + "x" && got.head.getString(1) == "browse")
    // SILENT + unregistered endpoint = unit table: outer rows survive
    val silent = engine.select(s"""
      SELECT ?s FROM <http://g/main>
      WHERE { ?s <${ex}type> ?t .
              SERVICE SILENT <urn:svc:missing> { ?m <${ex}etype> ?t } }""")
      .collect()
    assert(silent.length == 2)
    // non-SILENT unregistered endpoint fails loudly
    val e = intercept[IllegalArgumentException] {
      engine.select(
        s"SELECT ?s WHERE { SERVICE <urn:svc:missing> { ?s <${ex}p> ?o } }")
        .collect()
    }
    assert(e.getMessage.contains("unregistered SERVICE"))
    // variable endpoints are rejected at parse time, loudly
    intercept[IllegalArgumentException] {
      engine.select("SELECT ?s WHERE { SERVICE ?ep { ?s ?p ?o } }")
    }
  }

  test("FILTER STRSTARTS keeps only matching bindings") {
    val q = MappingQuery("f", "out", Seq("g"),
      Group(Seq(
        pat(v("x"), ex + "name", v("n")),
        FilterE(StrStartsE(vr("n"), str("www"))))),
      Seq(TriplePattern(v("x"), i(ex + "kept"), v("n"))))
    val out = Compiler.run(q, data).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == ex + "a")
  }

  test("FILTER BOUND after OPTIONAL keeps only rows where it bound") {
    val q = MappingQuery("fb", "out", Seq("g"),
      Group(Seq(
        pat(v("x"), ex + "name", v("n")),
        opt(pat(v("x"), ex + "size", v("sz"))),
        FilterE(BoundE("sz")))),
      Seq(TriplePattern(v("x"), i(ex + "hasSize"), v("sz"))))
    val out = Compiler.run(q, data).collect()
    assert(out.length == 1 && out.head.getString(1) == ex + "a")
  }

  test("disconnected BGP components produce an explicit cross join") {
    val q = MappingQuery("cross", "out", Seq("g"),
      Group(Seq(
        pat(v("x"), ex + "name", v("n")),
        pat(v("t"), ex + "label", v("l")))), // shares nothing with ?x/?n
      Seq(TriplePattern(v("x"), i(ex + "tagged"), v("l"))))
    val out = Compiler.run(q, data).collect()
    // 2 names x 1 label = 2 rows
    assert(out.length == 2)
    assert(out.forall(_.getString(3) == "T"))
  }

  test("same variable twice in one pattern requires term equality") {
    val q = MappingQuery("self", "out", Seq("g"),
      Group(Seq(pat(v("x"), ex + "self", v("x")))),
      Seq(TriplePattern(v("x"), i(ex + "isSelf"), v("x"))))
    val out = Compiler.run(q, data).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == ex + "a") // only <a> self <a>
  }

  test("OPTIONAL correlates through a BIND-produced variable") {
    // bind ?n2 from ?n, then OPTIONAL pattern joins on ?x (standard) —
    // plus the optional's output feeds a later bind null-safely
    val q = MappingQuery("bindopt", "out", Seq("g"),
      Group(Seq(
        pat(v("x"), ex + "name", v("n")),
        bind(ConcatE(Seq(vr("n"), str("!"))), "n2"),
        opt(pat(v("x"), ex + "size", v("sz"))),
        bind(ConcatE(Seq(vr("n2"), vr("sz"))), "joined"))),
      Seq(TriplePattern(v("x"), i(ex + "j"), v("joined"))))
    val out = Compiler.run(q, data).collect()
    // only ?x=<a> has a size, so only one joined value emits
    assert(out.length == 1)
    assert(out.head.getString(3) == "www.alpha.be!10")
  }
}
