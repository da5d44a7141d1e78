package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.rdf.Turtle

class TurtleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val doc = """
    |@prefix ex: <http://ex/> .
    |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    |@base <http://base/> .
    |
    |# a typical organization record
    |ex:alpha a ex:Org ;
    |    ex:name "Alpha Corp"@en ;
    |    ex:founded "2001-05-04"^^xsd:date ;
    |    ex:employees 42 ;
    |    ex:score 4.5 ;
    |    ex:active true ;
    |    ex:contact [ ex:email "a@example.org" ; ex:phone "123" ] .
    |
    |<rel> ex:name "Relative" .
    |_:m ex:memberOf ex:alpha .
    |""".stripMargin

  private def norm(s: String): String =
    s.replaceAll("_:t[0-9a-f]+_", "_:")

  test("parses prefixes, 'a', lists, bnodes, typed/lang/shorthand literals") {
    val quads = Turtle.parse(doc, "g")
    val got = quads.map(q => (norm(q.s), q.p, norm(q.o_value),
      Option(q.o_type).getOrElse(""), Option(q.o_lang).getOrElse(""), q.o_kind)).toSet
    val ex = "http://ex/"
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    assert(got.contains((s"${ex}alpha",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", s"${ex}Org", "", "", "iri")))
    assert(got.contains((s"${ex}alpha", s"${ex}name", "Alpha Corp", "", "en", "literal")))
    assert(got.contains((s"${ex}alpha", s"${ex}founded", "2001-05-04", s"${xsd}date", "", "literal")))
    assert(got.contains((s"${ex}alpha", s"${ex}employees", "42", s"${xsd}integer", "", "literal")))
    assert(got.contains((s"${ex}alpha", s"${ex}score", "4.5", s"${xsd}decimal", "", "literal")))
    assert(got.contains((s"${ex}alpha", s"${ex}active", "true", s"${xsd}boolean", "", "literal")))
    assert(got.contains((s"${ex}alpha", s"${ex}contact", "_:1", "", "", "bnode")))
    assert(got.contains(("_:1", s"${ex}email", "a@example.org", "", "", "literal")))
    assert(got.contains(("_:1", s"${ex}phone", "123", "", "", "literal")))
    // @base resolves the relative IRI
    assert(got.contains(("http://base/rel", s"${ex}name", "Relative", "", "", "literal")))
    // labeled bnode subject survives (namespaced per document)
    assert(got.contains(("_:m", s"${ex}memberOf", s"${ex}alpha", "", "", "iri")))
    assert(quads.size == 11)
  }

  test("numeric shorthand edge: trailing dot terminates, negatives parse") {
    val q = Turtle.parse(
      "@prefix ex: <http://ex/> . ex:a ex:n -7 . ex:a ex:d 2.5 . ex:a ex:e 1e3 .", "g")
    val vals = q.map(x => (x.o_value, x.o_type)).toSet
    assert(vals == Set(
      ("-7", Quad.xsd.integer),
      ("2.5", Quad.xsd.ns + "decimal"),
      ("1e3", Quad.xsd.double)))
  }

  test("triple-quoted strings and escapes") {
    val q = Turtle.parse(
      "@prefix ex: <http://ex/> .\nex:a ex:t \"\"\"line1\nline2 \"inner\"\"\"\" .", "g")
    assert(q.head.o_value == "line1\nline2 \"inner\"")
  }

  test("collections become rdf:first/rest/nil chains") {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val q = Turtle.parse("@prefix ex: <http://ex/> . ex:a ex:l (1 2) .", "g")
    val byP = q.groupBy(_.p)
    val head = byP("http://ex/l").head.o_value
    assert(byP("http://ex/l").head.o_kind == Quad.KindBnode)
    val firsts = byP(rdf + "first").map(x => x.s -> x.o_value).toMap
    val rests = byP(rdf + "rest").map(x => x.s -> (x.o_value, x.o_kind)).toMap
    assert(firsts(head) == "1")
    val (second, k2) = rests(head)
    assert(k2 == Quad.KindBnode && firsts(second) == "2")
    assert(rests(second) == (rdf + "nil", Quad.KindIri))
    assert(q.length == 5) // ex:l + 2×(first, rest)

    // empty collection IS rdf:nil; nested collections chain recursively
    val e = Turtle.parse("@prefix ex: <http://ex/> . ex:a ex:l () .", "g")
    assert(e.head.o_value == rdf + "nil" && e.head.o_kind == Quad.KindIri)
    val n = Turtle.parse("@prefix ex: <http://ex/> . ex:a ex:l (1 (2)) .", "g")
    assert(n.count(_.p == rdf + "first") == 3) // outer 2 + inner 1

    // subject-position collection
    val s = Turtle.parse("@prefix ex: <http://ex/> . (1) ex:tag ex:t .", "g")
    val subjHead = s.find(_.p == "http://ex/tag").get.s
    assert(s.exists(x => x.s == subjHead && x.p == rdf + "first" &&
      x.o_value == "1"))
  }

  test("TriG: graph blocks, GRAPH keyword, anonymous block, optional dot") {
    val trig = """
      |@prefix ex: <http://ex/> .
      |ex:top ex:name "Top" .
      |<http://g/a> {
      |  ex:a ex:name "Alpha" ;
      |       ex:size 10 .
      |}
      |GRAPH <http://g/b> {
      |  ex:b ex:linked ex:a
      |}
      |{
      |  ex:d ex:name "InDefault" .
      |}
      |""".stripMargin
    val quads = Turtle.parseTrig(trig, "http://default/")
    def graphsOf(s: String) = quads.filter(_.s == s).map(_.graph).distinct
    assert(graphsOf("http://ex/top") == Seq("http://default/"))
    assert(graphsOf("http://ex/a") == Seq("http://g/a"))
    assert(graphsOf("http://ex/b") == Seq("http://g/b")) // no trailing dot
    assert(graphsOf("http://ex/d") == Seq("http://default/"))
    assert(quads.length == 5)
    // prefixes declared before blocks resolve inside them
    assert(quads.forall(q => q.p.startsWith("http://ex/")))
  }

  test("TriG: plain Turtle parses identically under parseTrig") {
    val t = Turtle.parse(doc, "g").toSet
    // bnode labels embed a doc-content hash — identical input, identical labels
    assert(Turtle.parseTrig(doc, "g").toSet == t)
  }

  test("read(): file → Dataset[Quad], distributed per file") {
    val dir = Files.createTempDirectory("ttl")
    Files.writeString(dir.resolve("a.ttl"), doc)
    Files.writeString(dir.resolve("b.ttl"),
      "@prefix ex: <http://ex/> . ex:beta ex:name \"Beta\" .")
    val quads = Turtle.read(spark, dir.toString, "http://g/").collect()
    assert(quads.length == 12)
    assert(quads.forall(_.graph == "http://g/"))
    // bnode labels from different files never collide (doc-hash tag)
    val bnodeTags = quads.filter(_.s.startsWith("_:")).map(_.s).distinct
    assert(bnodeTags.nonEmpty)
  }
}
