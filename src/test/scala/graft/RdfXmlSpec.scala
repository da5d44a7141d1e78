package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.rdf.{NTriples, RdfXml}

/** RDF/XML source (S4c): StAX element-stream parser. */
class RdfXmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val doc = """<?xml version="1.0"?>
    |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    |         xmlns:ex="http://ex/" xml:base="http://base/">
    |  <ex:Org rdf:about="http://ex/a" ex:code="A1">
    |    <ex:name xml:lang="en">Alpha</ex:name>
    |    <ex:size rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">9</ex:size>
    |    <ex:str rdf:datatype="http://www.w3.org/2001/XMLSchema#string">plain</ex:str>
    |    <ex:home rdf:resource="rel"/>
    |    <ex:boss><ex:Person rdf:nodeID="p1"><ex:name>Bo</ex:name></ex:Person></ex:boss>
    |    <ex:meta rdf:parseType="Resource"><ex:rank>3</ex:rank></ex:meta>
    |  </ex:Org>
    |  <rdf:Description rdf:about="rel"><ex:kind>home</ex:kind></rdf:Description>
    |</rdf:RDF>
    |""".stripMargin

  private lazy val quads = RdfXml.parse(doc, "g")
  private def find(p: String): Seq[Quad] = quads.filter(_.p == "http://ex/" + p)

  test("typed node element asserts rdf:type; about is the subject") {
    val t = quads.filter(_.p.endsWith("#type"))
    assert(t.size == 2)
    assert(t.exists(q => q.s == "http://ex/a" && q.o_value == "http://ex/Org"))
    assert(t.exists(q => q.o_value == "http://ex/Person" && Quad.isBnode(q.s)))
  }

  test("literals: lang, typed, xsd:string normalized to plain") {
    val name = find("name").filter(_.s == "http://ex/a").head
    assert(name.o_value == "Alpha" && name.o_lang == "en" && name.o_type == null)
    val size = find("size").head
    assert(size.o_value == "9" && size.o_type == Quad.xsd.integer)
    val str = find("str").head
    assert(str.o_value == "plain" && str.o_type == null, "xsd:string == plain")
  }

  test("resource objects resolve against xml:base; property attributes emit") {
    assert(find("home").head.o_value == "http://base/rel")
    assert(quads.exists(q => q.s == "http://base/rel" &&
      q.p == "http://ex/kind" && q.o_value == "home"))
    val code = find("code").head
    assert(code.s == "http://ex/a" && code.o_value == "A1" && code.o_kind == "literal")
  }

  test("nested node element and parseType=Resource bind blank objects") {
    val boss = find("boss").head
    assert(boss.o_kind == Quad.KindBnode)
    assert(quads.exists(q => q.s == boss.o_value && q.p == "http://ex/name" &&
      q.o_value == "Bo"))
    val meta = find("meta").head
    assert(meta.o_kind == Quad.KindBnode)
    assert(quads.exists(q => q.s == meta.o_value && q.p == "http://ex/rank" &&
      q.o_value == "3"))
    assert(meta.o_value != boss.o_value, "distinct fresh bnodes")
  }

  test("distributed read + N-Triples round-trip preserves the graph") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlrt")
    java.nio.file.Files.writeString(dir.resolve("a.rdf"), doc)
    val ds = RdfXml.read(spark, dir.toString, "g")
    assert(ds.collect().toSet == quads.toSet)
    val nt = dir.resolve("a.nt").toString
    NTriples.write(ds.toDF(), nt)
    val back = NTriples.read(spark, nt, "g").collect().toSet
    assert(back == quads.toSet)
  }

  test("relative IRIs resolve per RFC 3986, not string concatenation") {
    val d = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="http://ex/" xml:base="http://base/dir/doc.rdf">
      <rdf:Description rdf:about="http://ex/a">
        <ex:rel rdf:resource="sib"/>
        <ex:abs rdf:resource="/root"/>
        <ex:frag rdf:resource="#part"/>
      </rdf:Description></rdf:RDF>"""
    val qs = RdfXml.parse(d, "g")
    def obj(p: String) = qs.find(_.p == "http://ex/" + p).get.o_value
    assert(obj("rel") == "http://base/dir/sib", "drops the last segment")
    assert(obj("abs") == "http://base/root", "root-relative")
    assert(obj("frag") == "http://base/dir/doc.rdf#part", "fragment on doc")
  }

  test("rdf:ID without xml:base fails instead of emitting a relative IRI") {
    val d = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="http://ex/">
      <rdf:Description rdf:ID="thing"><ex:k>v</ex:k></rdf:Description></rdf:RDF>"""
    assertThrows[IllegalArgumentException](RdfXml.parse(d, "g"))
  }

  test("unsupported forms fail loudly") {
    val bad = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="http://ex/"><rdf:Description rdf:about="http://ex/a">
      <ex:xs rdf:parseType="Collection"/></rdf:Description></rdf:RDF>"""
    assertThrows[IllegalArgumentException](RdfXml.parse(bad, "g"))
  }
}
