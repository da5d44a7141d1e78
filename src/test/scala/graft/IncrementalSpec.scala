package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.{GraphStore, Quad}

/** Incremental-maintenance semantics plus the SPARQL Update dataset-
  * scoping rules they depend on (§3.1.3: an operation with no USING
  * clause reads the WITH graph as default graph and sees ALL named
  * graphs in GRAPH patterns — the round-8 GraphEngine fix).
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def freshStore(): GraphStore = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-incrspec-${System.nanoTime()}"
    graft.util.TempDirs.deleteOnExit(dir)
    new GraphStore(spark, dir)
  }

  private def quads(rows: Seq[(String, String, String, String)]) = {
    import spark.implicits._
    rows.map { case (g, s, p, o) => Quad(g, s, p, o, null, null, "literal") }
      .toDF()
  }

  test("WITH-only update: WHERE reads the WITH graph as default graph") {
    val store = freshStore()
    store.append(quads(Seq(("http://ex/g", "a", "http://ex/p", "1"))))
    val engine = new GraphEngine(store)
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/g>
      INSERT { ?s ex:derived ?o }
      WHERE { ?s ex:p ?o }""")
    val got = store.readGraphs(Seq("http://ex/g"))
      .filter(col("p") === "http://ex/derived").collect()
    assert(got.length == 1 && got.head.getAs[String]("o_value") == "1")
  }

  test("WITH-only update: GRAPH patterns range over the whole store") {
    val store = freshStore()
    store.append(quads(Seq(
      ("http://ex/other", "a", "http://ex/p", "x"),
      ("http://ex/target", "a", "http://ex/q", "y"))))
    val engine = new GraphEngine(store)
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/target>
      INSERT { ?s ex:joined ?o }
      WHERE {
        GRAPH <http://ex/other> { ?s ex:p ?o }
        ?s ex:q ?y
      }""")
    val got = store.readGraphs(Seq("http://ex/target"))
      .filter(col("p") === "http://ex/joined").collect()
    assert(got.length == 1 && got.head.getAs[String]("o_value") == "x")
  }

  test("USING still isolates: GRAPH patterns see nothing without USING NAMED") {
    val store = freshStore()
    store.append(quads(Seq(
      ("http://ex/src", "a", "http://ex/p", "1"),
      ("http://ex/other", "a", "http://ex/p", "1"))))
    val engine = new GraphEngine(store)
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/t>
      INSERT { ?s ex:hit ?o }
      USING <http://ex/src>
      WHERE {
        ?s ex:p ?o .
        GRAPH <http://ex/other> { ?s ex:p ?o }
      }""")
    assert(store.readGraphs(Seq("http://ex/t")).count() == 0,
      "explicit USING dataset has an empty named-graph set")
  }

  test("non-monotone refresh retracts stale derivations (tiny end-to-end)") {
    val store = freshStore()
    store.append(quads(Seq(
      ("http://ex/stage", "e1", "http://ex/t", "a"),
      ("http://ex/stage", "e2", "http://ex/t", "b"))))
    val engine = new GraphEngine(store)
    val map = """
      PREFIX ex: <http://ex/>
      WITH <http://ex/out>
      INSERT { ?e ex:scored ?f }
      USING <http://ex/stage>
      WHERE {
        ?e ex:t ?t .
        OPTIONAL { ?e ex:v ?v }
        BIND (IF(BOUND(?v), "yes", "no") AS ?f)
      }"""
    engine.update(map)
    // e1 late value arrives: staging + its own batch graph
    store.append(quads(Seq(
      ("http://ex/stage", "e1", "http://ex/v", "9"),
      ("http://ex/delta", "e1", "http://ex/v", "9"))))
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/out>
      DELETE { ?e ex:scored ?old }
      INSERT { ?e ex:scored ?f }
      WHERE {
        GRAPH <http://ex/delta> { ?e ex:v ?dv }
        GRAPH <http://ex/stage> {
          ?e ex:t ?t .
          OPTIONAL { ?e ex:v ?v }
        }
        BIND (IF(BOUND(?v), "yes", "no") AS ?f)
        OPTIONAL { ?e ex:scored ?old }
      }""")
    val out = store.readGraphs(Seq("http://ex/out")).collect()
      .map(r => r.getAs[String]("s") -> r.getAs[String]("o_value")).toSet
    assert(out == Set("e1" -> "yes", "e2" -> "no"),
      "e1's stale 'no' retracted, e2 untouched")
  }

  test("fixture queries: incremental state equals full recompute invariants") {
    val incr = SparkEntry.queries("rdf_mapping_incremental")(spark, sf).collect()
    assert(incr.nonEmpty)
    assert(incr.map(_.getAs[String]("graph")).toSet ==
      Set("http://ex/user_activity"))
    val refresh = SparkEntry.queries("rdf_mapping_refresh")(spark, sf).collect()
    val n = graft.util.Tables.events(spark, sf).count()
    assert(refresh.length == n, "exactly one scored triple per event")
  }
}
