package graft

import org.scalatest.funsuite.AnyFunSuite

/** GROUP_CONCAT and graph-management (COPY/MOVE/ADD/LOAD) specs. */
class GraphMgmtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("GROUP_CONCAT concatenates sorted lexical forms per group") {
    val rows = SparkEntry.queries("rdf_sparql_group_concat")(spark, sf)
      .collect()
    assert(rows.length == 5) // one row per region key
    rows.foreach { r =>
      val names = r.getString(1).split(",")
      assert(names.sameElements(names.sorted), "engine sorts group values")
      assert(r.getString(2).split("\\|").toSeq == names.toSeq,
        "DISTINCT variant equals plain on unique names")
    }
  }

  test("COPY/ADD/MOVE/LOAD leave the documented graph state") {
    val rows = SparkEntry.queries("rdf_graph_management")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("http://ex/A", "http://ex/C",
      "http://ex/D", "http://ex/E", "http://ex/F", "urn:graft:default"),
      "B moved away, D/E created, default loaded and copied to F")
    assert(rows("http://ex/D") == rows("http://ex/A") + rows("http://ex/C"))
    assert(rows("http://ex/E") == rows("http://ex/A"), "LOAD round-trips A")
    assert(rows("urn:graft:default") == rows("http://ex/A"),
      "LOAD without INTO targets the default graph")
    assert(rows("http://ex/F") == rows("http://ex/A"),
      "COPY DEFAULT TO <F> reads the default graph")
  }

  test(".n3 files LOAD through the Turtle parser (rdflib parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-n3")
    java.nio.file.Files.writeString(dir.resolve("d.n3"),
      "@prefix ex: <http://ex/> . ex:a ex:name \"N3\" .")
    val storeDir =
      s"${System.getProperty("java.io.tmpdir")}/graft-n3s-${System.nanoTime()}"
    val engine = new GraphEngine(new graft.model.GraphStore(spark, storeDir))
    engine.update(s"LOAD <file://${dir.resolve("d.n3")}> INTO GRAPH <http://g/n3>")
    val got = engine.store.readGraphs(Seq("http://g/n3")).collect()
    assert(got.length == 1)
    assert(got.head.getString(got.head.fieldIndex("o_value")) == "N3")
  }

  test("COPY/MOVE/ADD of a graph onto itself are no-ops (§3.2.3-5)") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-self-${System.nanoTime()}"
    val store = new graft.model.GraphStore(spark, dir)
    val engine = new GraphEngine(store)
    engine.update("""INSERT DATA { GRAPH <g:s> { <s:1> <p> "x" . <s:2> <p> "y" . } }""")
    engine.update("COPY <g:s> TO <g:s>")
    assert(store.countGraph("g:s") == 2, "same-graph COPY must not clear")
    engine.update("MOVE <g:s> TO <g:s>")
    assert(store.countGraph("g:s") == 2, "same-graph MOVE must not drop")
    engine.update("ADD <g:s> TO <g:s>")
    assert(store.countGraph("g:s") == 2, "same-graph ADD must not duplicate")
  }

  test("LANGMATCHES / sameTerm / STRDT evaluate per SPARQL semantics") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-lm-${System.nanoTime()}"
    val store = new graft.model.GraphStore(spark, dir)
    val engine = new GraphEngine(store)
    engine.update("""INSERT DATA { GRAPH <g:l> {
      <s:1> <label> "bonjour"@fr .
      <s:2> <label> "hallo"@fr-BE .
      <s:3> <label> "hello"@en .
      <s:4> <label> "plain" .
    } }""")
    def ids(q: String): Set[String] =
      engine.select(q).collect().map(_.getString(0)).toSet
    assert(ids("""SELECT ?x FROM <g:l>
        WHERE { ?x <label> ?l . FILTER (LANGMATCHES(LANG(?l), "fr")) }""")
      == Set("s:1", "s:2"), "fr matches fr and fr-BE")
    assert(ids("""SELECT ?x FROM <g:l>
        WHERE { ?x <label> ?l . FILTER (LANGMATCHES(LANG(?l), "*")) }""")
      == Set("s:1", "s:2", "s:3"), "* matches any tagged literal")
    assert(ids("""SELECT ?x FROM <g:l>
        WHERE { ?x <label> ?l . FILTER (SAMETERM(?l, STRLANG("hello", "en"))) }""")
      == Set("s:3"), "sameTerm is full term identity incl. lang")
    assert(ids("""SELECT ?x FROM <g:l>
        WHERE { ?x <label> ?l . FILTER (SAMETERM(?l, "plain")) }""")
      == Set("s:4"), "plain literal identity: no tag, no datatype")
    // STRDT constructs a typed literal usable in a later comparison
    val strdt = engine.select("""PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?x FROM <g:l>
        WHERE { ?x <label> ?l .
                BIND (STRDT(STR(?l), xsd:string) AS ?t)
                FILTER (DATATYPE(?t) = xsd:string) }""")
    assert(strdt.count() == 4, "STRDT attaches the datatype IRI")
  }

  test("COPY replaces target contents; ADD preserves them") {
    import org.apache.spark.sql.functions._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-gm2-${System.nanoTime()}"
    val store = new graft.model.GraphStore(spark, dir)
    val engine = new GraphEngine(store)
    engine.update("""INSERT DATA { GRAPH <g:a> { <s:1> <p> "x" . } }""")
    engine.update("""INSERT DATA { GRAPH <g:b> { <s:2> <p> "y" . } }""")
    engine.update("COPY <g:a> TO <g:b>") // replaces <s:2>
    assert(store.countGraph("g:b") == 1)
    engine.update("""INSERT DATA { GRAPH <g:c> { <s:3> <p> "z" . } }""")
    engine.update("ADD <g:c> TO <g:b>") // keeps the copied quad
    assert(store.countGraph("g:b") == 2)
    engine.update("MOVE <g:b> TO <g:a>")
    assert(store.countGraph("g:a") == 2 && store.countGraph("g:b") == 0)
  }
}
