package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{GraphStore, Quad}

class SparqlResultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def engine() = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-results").toString
    val store = new GraphStore(spark, dir)
    store.append(Seq(
      Quad.lit("g", "http://ex/a", "http://ex/name", "Alpha"),
      Quad("g", "http://ex/a", "http://ex/name", "hallo", null, "nl",
        Quad.KindLiteral),
      Quad.typed("g", "http://ex/a", "http://ex/size", "42", Quad.xsd.integer),
      Quad.iri("g", "http://ex/a", "http://ex/link", "http://ex/b"),
      Quad.lit("g", "http://ex/b", "http://ex/note", "say \"hi\", ok"),
      Quad.iri("g", "http://ex/a", "http://ex/t", "http://ex/T"),
      Quad.iri("g", "http://ex/b", "http://ex/t", "http://ex/T")
    ).toDF())
    new GraphEngine(store)
  }

  test("JSON document: types, lang, datatype, unbound omitted") {
    val e = engine()
    assert(e.selectJson("""
      SELECT ?n WHERE { <http://ex/a> <http://ex/name> ?n } ORDER BY ?n""") ==
      """{"head":{"vars":["n"]},"results":{"bindings":[""" +
        """{"n":{"type":"literal","value":"Alpha"}},""" +
        """{"n":{"type":"literal","value":"hallo","xml:lang":"nl"}}]}}""")
    assert(e.selectJson("""
      SELECT ?z WHERE { <http://ex/a> <http://ex/size> ?z }""") ==
      """{"head":{"vars":["z"]},"results":{"bindings":[""" +
        """{"z":{"type":"literal","value":"42",""" +
        """"datatype":"http://www.w3.org/2001/XMLSchema#integer"}}]}}""")
    // unbound OPTIONAL var: the binding object for ?n is absent (§3.2.2)
    assert(e.selectJson("""
      SELECT ?s ?n WHERE {
        ?s <http://ex/t> <http://ex/T> .
        OPTIONAL { ?s <http://ex/name> ?n FILTER(?n = 'Alpha') }
      } ORDER BY ?s""") ==
      """{"head":{"vars":["s","n"]},"results":{"bindings":[""" +
        """{"s":{"type":"uri","value":"http://ex/a"},""" +
        """"n":{"type":"literal","value":"Alpha"}},""" +
        """{"s":{"type":"uri","value":"http://ex/b"}}]}}""")
  }

  test("CSV document: lexical values, RFC 4180 quoting, CRLF") {
    val e = engine()
    assert(e.selectCsv("""
      SELECT ?s ?v WHERE { ?s <http://ex/note> ?v }""") ==
      "s,v\r\nhttp://ex/b,\"say \"\"hi\"\", ok\"\r\n")
  }

  test("TSV document: full SPARQL term syntax") {
    val e = engine()
    assert(e.selectTsv("""
      SELECT ?s ?z WHERE { ?s <http://ex/size> ?z }""") ==
      "?s\t?z\n<http://ex/a>\t\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>\n")
    assert(e.selectTsv("""
      SELECT ?o WHERE { <http://ex/a> <http://ex/link> ?o }""") ==
      "?o\n<http://ex/b>\n")
  }

  test("file-streaming exports are byte-identical to the driver documents") {
    val e = engine()
    // multi-row + quoting + lang + datatype + unbound all in one result
    val q = """
      SELECT ?s ?n ?v WHERE {
        ?s <http://ex/t> <http://ex/T> .
        OPTIONAL { ?s <http://ex/name> ?n }
        OPTIONAL { ?s <http://ex/note> ?v }
      } ORDER BY ?s ?n"""
    val dir = java.nio.file.Files.createTempDirectory("results-sink")
    def fileBytes(p: String): String = {
      val f = new java.io.File(p)
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    }
    val json = s"$dir/out.srj"
    e.selectJsonToFile(q, json)
    assert(fileBytes(json) == e.selectJson(q))
    val csv = s"$dir/out.csv"
    e.selectCsvToFile(q, csv)
    assert(fileBytes(csv) == e.selectCsv(q))
    val tsv = s"$dir/out.tsv"
    e.selectTsvToFile(q, tsv)
    assert(fileBytes(tsv) == e.selectTsv(q))
    val xml = s"$dir/out.srx"
    e.selectXmlToFile(q, xml)
    assert(fileBytes(xml) == e.selectXml(q))
    // empty result: header/footer-only documents still match
    val empty = """SELECT ?x WHERE { ?x <http://ex/none> ?y }"""
    e.selectJsonToFile(empty, json)
    assert(fileBytes(json) == e.selectJson(empty))
    e.selectCsvToFile(empty, csv)
    assert(fileBytes(csv) == e.selectCsv(empty))
    e.selectXmlToFile(empty, xml)
    assert(fileBytes(xml) == e.selectXml(empty))
  }
}
