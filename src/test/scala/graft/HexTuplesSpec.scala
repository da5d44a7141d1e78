package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.rdf.{HexTuples, RdfIO}

/** HexTuples (rdflib `hext` NDJSON) reader/writer: six-element JSON
  * array lines, `globalId`/`localId` object markers, implicit
  * xsd:string / rdf:langString datatypes, `""` default graph —
  * write→read must be a lossless identity over every term shape.
  */
class HexTuplesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val xsd = "http://www.w3.org/2001/XMLSchema#"

  private val fixture = Seq(
    Quad.iri("g1", "http://ex/a", "http://ex/knows", "http://ex/b"),
    Quad.lit("g1", "http://ex/a", "http://ex/name", "Al \"quoted\"\nline"),
    Quad.typed("g1", "http://ex/a", "http://ex/age", "41", xsd + "integer"),
    Quad("g1", "http://ex/a", "http://ex/label", "hallo", null, "nl",
      Quad.KindLiteral),
    Quad("g1", "_:b0", "http://ex/p", "_:b1", null, null, Quad.KindBnode),
    Quad(Quad.DefaultGraph, "http://ex/d", "http://ex/p", "v", null, null,
      Quad.KindLiteral))

  test("write → read roundtrip is the identity over all term shapes") {
    val dir = Files.createTempDirectory("hext").toString + "/out.hext"
    RdfIO.write(fixture.toDF(), dir)
    val back = RdfIO.read(spark, dir).collect().toSet
    assert(back == fixture.toSet)
  }

  test("serialized lines carry the rdflib markers") {
    val lines = HexTuples.toLines(fixture.toDF()).as[String].collect()
    assert(lines.exists(l => l.contains("\"globalId\"")))
    assert(lines.exists(l => l.contains("\"localId\"")))
    assert(lines.exists(l => l.contains(xsd + "string")))
    assert(lines.exists(l =>
      l.contains("rdf-syntax-ns#langString") && l.contains("\"nl\"")))
    // default graph serializes as the empty string, named graphs as-is
    assert(lines.exists(_.endsWith("\"\"]")))
    assert(lines.exists(_.endsWith("\"g1\"]")))
  }

  test("plain literal keeps null datatype through the xsd:string marker") {
    val dir = Files.createTempDirectory("hext2").toString + "/out.hext"
    RdfIO.write(Seq(Quad.lit("g", "s", "p", "v")).toDF(), dir)
    val q = RdfIO.read(spark, dir).collect().head
    assert(q.o_type == null && q.o_lang == null && q.o_kind == Quad.KindLiteral)
  }
}
