package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.rdf.JsonLd

class JsonLdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val ex = "http://ex/"
  private val xsd = "http://www.w3.org/2001/XMLSchema#"

  private def norm(s: String): String =
    if (s == null) null else s.replaceAll("_:j[0-9a-f]+_", "_:")

  private def rows(doc: String, g: String = "g") =
    JsonLd.parse(doc, g).map(q => (q.graph, norm(q.s), q.p, norm(q.o_value),
      Option(q.o_type).getOrElse(""), Option(q.o_lang).getOrElse(""), q.o_kind)).toSet

  test("context terms, prefixes, natives, typed coercion and @id coercion") {
    val doc = s"""{
      "@context": {
        "ex": "$ex",
        "xsd": "$xsd",
        "name": "ex:name",
        "founded": {"@id": "ex:founded", "@type": "xsd:date"},
        "boss": {"@id": "ex:boss", "@type": "@id"}
      },
      "@id": "ex:alpha",
      "@type": "ex:Org",
      "name": "Alpha Corp",
      "ex:employees": 42,
      "ex:score": 4.5,
      "ex:active": true,
      "founded": "2001-05-04",
      "boss": "ex:beta"
    }"""
    val got = rows(doc)
    assert(got.contains(("g", s"${ex}alpha", RdfNs + "type", s"${ex}Org", "", "", "iri")))
    assert(got.contains(("g", s"${ex}alpha", s"${ex}name", "Alpha Corp", "", "", "literal")))
    assert(got.contains(("g", s"${ex}alpha", s"${ex}employees", "42", s"${xsd}integer", "", "literal")))
    assert(got.contains(("g", s"${ex}alpha", s"${ex}score", "4.5", s"${xsd}double", "", "literal")))
    assert(got.contains(("g", s"${ex}alpha", s"${ex}active", "true", s"${xsd}boolean", "", "literal")))
    assert(got.contains(("g", s"${ex}alpha", s"${ex}founded", "2001-05-04", s"${xsd}date", "", "literal")))
    assert(got.contains(("g", s"${ex}alpha", s"${ex}boss", s"${ex}beta", "", "", "iri")))
    assert(got.size == 7)
  }

  test("@vocab, @base, default @language and term-level language override") {
    val doc = s"""{
      "@context": {
        "@vocab": "$ex",
        "@base": "http://base/",
        "@language": "en",
        "title": {"@id": "${ex}title", "@language": "fr"},
        "code": {"@id": "${ex}code", "@language": null}
      },
      "@id": "doc1",
      "name": "Hello",
      "title": "Bonjour",
      "code": "X9"
    }"""
    val got = rows(doc)
    assert(got.contains(("g", "http://base/doc1", s"${ex}name", "Hello", "", "en", "literal")))
    assert(got.contains(("g", "http://base/doc1", s"${ex}title", "Bonjour", "", "fr", "literal")))
    // explicit null @language clears the context default
    assert(got.contains(("g", "http://base/doc1", s"${ex}code", "X9", "", "", "literal")))
  }

  test("@value objects: @type, @language, bare natives; nulls dropped") {
    val doc = s"""{
      "@id": "${ex}a",
      "${ex}w" : {"@value": "3.25", "@type": "${xsd}decimal"},
      "${ex}l" : {"@value": "hej", "@language": "sv"},
      "${ex}n" : {"@value": 7},
      "${ex}s" : {"@value": "plain", "@type": "${xsd}string"},
      "${ex}gone" : null,
      "${ex}gone2" : {"@value": null}
    }"""
    val got = rows(doc)
    assert(got.contains(("g", s"${ex}a", s"${ex}w", "3.25", s"${xsd}decimal", "", "literal")))
    assert(got.contains(("g", s"${ex}a", s"${ex}l", "hej", "", "sv", "literal")))
    assert(got.contains(("g", s"${ex}a", s"${ex}n", "7", s"${xsd}integer", "", "literal")))
    // RDF 1.1: xsd:string-typed == plain literal
    assert(got.contains(("g", s"${ex}a", s"${ex}s", "plain", "", "", "literal")))
    assert(got.size == 4)
  }

  test("arrays, nested node objects, explicit bnode labels shared across uses") {
    val doc = s"""{
      "@id": "${ex}a",
      "${ex}tag": ["x", "y"],
      "${ex}contact": {"${ex}email": "a@example.org"},
      "${ex}knows": {"@id": "_:m"},
      "${ex}likes": {"@id": "_:m"}
    }"""
    val got = rows(doc)
    assert(got.contains(("g", s"${ex}a", s"${ex}tag", "x", "", "", "literal")))
    assert(got.contains(("g", s"${ex}a", s"${ex}tag", "y", "", "", "literal")))
    // the minted bnode links and carries its own property
    val contact = got.collect { case ("g", s, p, o, _, _, "bnode") if p == s"${ex}contact" => o }
    assert(contact.size == 1)
    assert(got.contains(("g", contact.head, s"${ex}email", "a@example.org", "", "", "literal")))
    // both references to _:m resolve to the SAME document-scoped label
    val knows = got.collect { case ("g", _, p, o, _, _, "bnode") if p == s"${ex}knows" => o }
    val likes = got.collect { case ("g", _, p, o, _, _, "bnode") if p == s"${ex}likes" => o }
    assert(knows.size == 1 && knows == likes)
  }

  test("@list chains and @container: @list coercion; empty list is rdf:nil") {
    val doc = s"""{
      "@context": {"steps": {"@id": "${ex}steps", "@container": "@list"}},
      "@id": "${ex}a",
      "${ex}parts": {"@list": [1, 2]},
      "steps": ["s1", "s2"],
      "${ex}none": {"@list": []}
    }"""
    val quads = JsonLd.parse(doc, "g")
    val byS = quads.groupBy(_.s)
    // rdf:nil for the empty list
    assert(quads.exists(q => q.p == s"${ex}none" && q.o_value == RdfNs + "nil" && q.o_kind == "iri"))
    // parts: a → cell1(first=1, rest=cell2), cell2(first=2, rest=nil)
    val head = quads.find(_.p == s"${ex}parts").get
    assert(head.o_kind == "bnode")
    val cell1 = byS(head.o_value)
    assert(cell1.exists(q => q.p == RdfNs + "first" && q.o_value == "1" && q.o_type == s"${xsd}integer"))
    val rest1 = cell1.find(_.p == RdfNs + "rest").get
    assert(rest1.o_kind == "bnode")
    val cell2 = byS(rest1.o_value)
    assert(cell2.exists(q => q.p == RdfNs + "first" && q.o_value == "2"))
    assert(cell2.exists(q => q.p == RdfNs + "rest" && q.o_value == RdfNs + "nil"))
    // the @container:@list term coerces a bare array the same way
    val shead = quads.find(_.p == s"${ex}steps").get
    val scell1 = byS(shead.o_value)
    assert(scell1.exists(q => q.p == RdfNs + "first" && q.o_value == "s1"))
  }

  test("@container: @set keeps array semantics (multi-valued, no list chain)") {
    val doc = s"""{
      "@context": {"tags": {"@id": "${ex}tag", "@container": "@set"}},
      "@id": "${ex}a",
      "tags": ["x", "y"]
    }"""
    val got = rows(doc)
    assert(got == Set(
      ("g", s"${ex}a", s"${ex}tag", "x", "", "", "literal"),
      ("g", s"${ex}a", s"${ex}tag", "y", "", "", "literal")))
  }

  test("top-level @graph, named graphs, nested @context and @reverse") {
    val doc = s"""{
      "@context": {"ex": "$ex"},
      "@graph": [
        {"@id": "ex:a", "ex:name": "TopLevel"},
        {
          "@id": "ex:g1",
          "@graph": [
            {"@context": {"label": "${ex}label"}, "@id": "ex:b", "label": "InNamed"}
          ]
        },
        {"@id": "ex:c", "@reverse": {"ex:parent": {"@id": "ex:child"}}}
      ]
    }"""
    val got = rows(doc)
    assert(got.contains(("g", s"${ex}a", s"${ex}name", "TopLevel", "", "", "literal")))
    // named-graph contents land in graph = the node's @id
    assert(got.contains((s"${ex}g1", s"${ex}b", s"${ex}label", "InNamed", "", "", "literal")))
    // @reverse flips subject and object
    assert(got.contains(("g", s"${ex}child", s"${ex}parent", s"${ex}c", "", "", "iri")))
  }

  test("top-level array of node objects; unmapped terms without @vocab drop") {
    val doc = s"""[
      {"@id": "${ex}a", "${ex}p": "v"},
      {"@id": "${ex}b", "unmapped": "dropped", "${ex}q": "w"}
    ]"""
    val got = rows(doc)
    assert(got.contains(("g", s"${ex}a", s"${ex}p", "v", "", "", "literal")))
    assert(got.contains(("g", s"${ex}b", s"${ex}q", "w", "", "", "literal")))
    assert(got.size == 2) // "unmapped" has no IRI → dropped per expansion
  }

  test("remote @context URL raises loudly (zero-egress)") {
    val e = intercept[IllegalArgumentException] {
      JsonLd.parse("""{"@context": "https://schema.org", "@id": "http://x/a"}""", "g")
    }
    assert(e.getMessage.contains("remote @context"))
  }

  test("sink roundtrip survives multi-partition writes; every part file is valid JSON-LD") {
    import spark.implicits._
    val quads = (1 to 40).flatMap { i =>
      Seq(
        Quad("urn:graft:default", s"${ex}d$i", s"${ex}n", i.toString,
          s"${xsd}integer", null, "literal"),
        Quad(s"${ex}g${i % 3}", s"${ex}d$i", s"${ex}tag", s"t$i",
          null, null, "literal"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-jld-rt").toString
    // many partitions → many part files, each an independent JSON array
    // (AQE would coalesce the subject-grouping shuffle to 1 partition at
    // this size — disable it so the multi-file framing is exercised)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try JsonLd.write(quads.toDS().toDF().repartition(7), dir)
    finally spark.conf.set(coalesceKey, saved)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.length() > 0)
    assert(parts.length > 1)
    parts.foreach { f =>
      val tree = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(f.toPath))
      assert(tree.isArray, s"${f.getName} is not a JSON array document")
    }
    val back = JsonLd.read(spark, dir).collect()
    assert(back.map(q => (q.graph, q.s, q.p, q.o_value, q.o_type, q.o_lang, q.o_kind)).toSet ==
      quads.map(q => (q.graph, q.s, q.p, q.o_value, q.o_type, q.o_lang, q.o_kind)).toSet)
  }

  test("Spark read: directory of .jsonld files, bnodes cannot collide across files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonld")
    java.nio.file.Files.writeString(dir.resolve("a.jsonld"),
      s"""{"${ex}p": "fileA"}""")
    java.nio.file.Files.writeString(dir.resolve("b.jsonld"),
      s"""{"${ex}p": "fileB"}""")
    val quads = JsonLd.read(spark, dir.toString, "g").collect()
    assert(quads.length == 2)
    val subjects = quads.map(_.s).toSet
    assert(subjects.size == 2 && subjects.forall(Quad.isBnode))
  }
}
