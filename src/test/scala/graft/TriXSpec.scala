package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.rdf.TriX

/** TriX source + sink (S4h): the reader's grammar subset, graph
  * scoping, bnode namespacing, escaping, the writer round-trip, and
  * the RdfIO/LOAD dispatch.
  */
class TriXSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val doc = s"""<?xml version="1.0"?>
    |<TriX xmlns="${TriX.Ns}">
    |  <graph>
    |    <uri>http://ex/g1</uri>
    |    <triple>
    |      <uri>http://ex/a</uri>
    |      <uri>http://ex/p</uri>
    |      <uri>http://ex/b</uri>
    |    </triple>
    |    <triple>
    |      <uri>http://ex/a</uri>
    |      <uri>http://ex/name</uri>
    |      <plainLiteral xml:lang="en">Alpha &amp; co &lt;1&gt;</plainLiteral>
    |    </triple>
    |    <triple>
    |      <id>b1</id>
    |      <uri>http://ex/age</uri>
    |      <typedLiteral datatype="${Quad.xsd.integer}">42</typedLiteral>
    |    </triple>
    |  </graph>
    |  <graph>
    |    <triple>
    |      <uri>http://ex/c</uri>
    |      <uri>http://ex/p</uri>
    |      <plainLiteral>plain</plainLiteral>
    |    </triple>
    |  </graph>
    |</TriX>""".stripMargin

  test("parse: graph naming, term kinds, lang/datatype, entities") {
    val qs = TriX.parse(doc, "urn:default")
    assert(qs.size == 4)
    val byGraph = qs.groupBy(_.graph)
    assert(byGraph.keySet == Set("http://ex/g1", "urn:default"))
    assert(byGraph("http://ex/g1").size == 3)
    val lit = qs.find(_.p == "http://ex/name").get
    assert(lit.o_value == "Alpha & co <1>" && lit.o_lang == "en" &&
      lit.o_kind == Quad.KindLiteral)
    val typed = qs.find(_.p == "http://ex/age").get
    assert(typed.o_type == Quad.xsd.integer && typed.s.startsWith("_:tx"))
    val plain = byGraph("urn:default").head
    assert(plain.o_value == "plain" && plain.o_type == null &&
      plain.o_lang == null)
  }

  test("bnode labels are namespaced per document") {
    val qs1 = TriX.parse(doc, "urn:d")
    val qs2 = TriX.parse(doc + " ", "urn:d") // different content hash
    val b1 = qs1.find(_.s.startsWith("_:")).get.s
    val b2 = qs2.find(_.s.startsWith("_:")).get.s
    assert(b1 != b2)
  }

  test("non-TriX root and malformed triples fail loudly") {
    intercept[IllegalArgumentException] {
      TriX.parse("<rdf:RDF xmlns:rdf='x'/>", "urn:d")
    }
    intercept[IllegalArgumentException] {
      TriX.parse(s"""<TriX xmlns="${TriX.Ns}"><graph><triple>
        <uri>http://ex/s</uri><uri>http://ex/p</uri>
        </triple></graph></TriX>""", "urn:d")
    }
  }

  test("write → read round-trips quads exactly (incl default graph)") {
    val quads = Seq(
      Quad.iri("http://ex/g", "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.lit("http://ex/g", "http://ex/a", "http://ex/q",
        "esc <&> \"quotes\"\nand newline"),
      Quad("http://ex/g", "http://ex/a", "http://ex/q", "hoi", null, "nl",
        Quad.KindLiteral),
      Quad.typed(Quad.DefaultGraph, "http://ex/c", "http://ex/n", "7",
        Quad.xsd.integer),
      Quad("http://ex/g", "_:b0", "http://ex/p", "_:b1", null, null,
        Quad.KindBnode))
    val dir = Files.createTempDirectory("trix").toString + "/out.trix"
    TriX.write(quads.toDF(), dir)
    val back = TriX.read(spark, dir, Quad.DefaultGraph).collect()
    // bnode labels are rewritten (doc-hash namespace) but structure and
    // every ground quad must survive
    def key(q: Quad) = (q.graph,
      if (q.s.startsWith("_:")) "_:" else q.s, q.p,
      if (q.o_kind == Quad.KindBnode) "_:" else q.o_value,
      Option(q.o_type), Option(q.o_lang), q.o_kind)
    assert(back.map(key).toSet == quads.map(key).toSet)
    assert(back.length == quads.length)
  }

  test("RdfIO dispatch + SPARQL LOAD keep TriX graph scoping") {
    val quads = Seq(
      Quad.iri("http://ex/gA", "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.lit("http://ex/gB", "http://ex/c", "http://ex/q", "v"))
    val dir = Files.createTempDirectory("trix-io").toString + "/d.trix"
    graft.rdf.RdfIO.write(quads.toDF(), dir)
    assert(graft.rdf.RdfIO.read(spark, dir).collect().map(_.graph).toSet ==
      Set("http://ex/gA", "http://ex/gB"))
    // LOAD without INTO GRAPH: statements keep their own graphs
    val store = new graft.model.GraphStore(spark,
      Files.createTempDirectory("trix-load").toString + "/store")
    new GraphEngine(store).update(s"LOAD <file://$dir>")
    assert(store.read().select("graph").distinct().collect()
      .map(_.getString(0)).toSet == Set("http://ex/gA", "http://ex/gB"))
  }

  test("XML-illegal control characters fail loudly at the sink") {
    val bad = Seq(Quad.lit("g", "http://ex/a", "http://ex/p", "bad\u0001"))
    intercept[IllegalArgumentException] {
      TriX.write(bad.toDF(),
        Files.createTempDirectory("trix-bad").toString + "/x.trix")
    }
  }
}
