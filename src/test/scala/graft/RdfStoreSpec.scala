package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{GraphStore, Quad}
import graft.rdf.NTriples

class NTriplesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val samples = Seq(
    Quad.iri("g", "http://ex/s", "http://ex/p", "http://ex/o"),
    Quad("g", "_:b1", "http://ex/p", "_:b2", null, null, Quad.KindBnode),
    Quad.lit("g", "http://ex/s", "http://ex/p", "plain \"quoted\"\nline\t\\x"),
    Quad.typed("g", "http://ex/s", "http://ex/p", "42", Quad.xsd.integer),
    Quad("g", "http://ex/s", "http://ex/p", "hallo", null, "nl", Quad.KindLiteral))

  test("serialize → parse round-trips every term kind") {
    import spark.implicits._
    val lines = NTriples.toLines(samples.toDF()).as[String].collect()
    assert(lines.length == samples.size)
    assert(lines.forall(_.endsWith(" .")))
    val back = lines.map(l => NTriples.parseLine(l, "g"))
    assert(back.toSeq == samples)
  }

  test("escaping matches the N-Triples grammar") {
    import spark.implicits._
    val df = Seq(Quad.lit("g", "http://ex/s", "http://ex/p", "a\"b\\c\nd")).toDF()
    val line = NTriples.toLines(df).as[String].head()
    assert(line.contains(""""a\"b\\c\nd""""))
  }

  test("xsd:string typed literal normalizes to plain") {
    val q = NTriples.parseLine(
      s"""<http://ex/s> <http://ex/p> "x"^^<${Quad.xsd.string}> .""", "g")
    assert(q.o_type == null)
  }

  test("malformed lines raise a diagnostic error, not a raw index crash") {
    val e = intercept[IllegalArgumentException] {
      NTriples.parseLine("""<http://ex/s> <http://ex/p> "unterminated""", "g")
    }
    assert(e.getMessage.contains("unterminated") ||
      e.getMessage.contains("malformed"))
  }

  test("file round-trip via spark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("nt").toString + "/out"
    NTriples.write(samples.toDF(), dir)
    val back = NTriples.read(spark, dir, "g").collect().toSet
    assert(back == samples.toSet)
  }

  // ------------------------------------------------------------ N-Quads

  private val quadSamples = Seq(
    Quad.iri("http://g/1", "http://ex/s", "http://ex/p", "http://ex/o"),
    Quad("http://g/2", "_:b1", "http://ex/p", "_:b2", null, null, Quad.KindBnode),
    Quad.lit(Quad.DefaultGraph, "http://ex/s", "http://ex/p", "q\"uo\nted"),
    Quad.typed("http://g/1", "http://ex/s", "http://ex/p", "42", Quad.xsd.integer),
    Quad("http://g/2", "http://ex/s", "http://ex/p", "hallo", null, "nl",
      Quad.KindLiteral))

  test("N-Quads: serialize → parse round-trips graphs and term kinds") {
    import spark.implicits._
    val lines = NTriples.toQuadLines(quadSamples.toDF()).as[String].collect()
    assert(lines.length == quadSamples.size)
    // default-graph statements carry NO graph label
    assert(lines.count(_.split("\\s+").length == 4) >= 1)
    val back = lines.map(l => NTriples.parseQuadLine(l, Quad.DefaultGraph))
    assert(back.toSet == quadSamples.toSet)
  }

  test("N-Quads: unlabeled statements land in the given default graph") {
    val q = NTriples.parseQuadLine(
      """<http://ex/s> <http://ex/p> "v" .""", "http://d/")
    assert(q.graph == "http://d/")
    val g = NTriples.parseQuadLine(
      """<http://ex/s> <http://ex/p> "v" <http://g/9> .""", "http://d/")
    assert(g.graph == "http://g/9")
    // a bnode graph label parses too
    val b = NTriples.parseQuadLine(
      "<http://ex/s> <http://ex/p> <http://ex/o> _:gb .", "http://d/")
    assert(b.graph == "_:gb")
  }

  test("N-Quads: comments, blanks, and file round-trip") {
    import spark.implicits._
    assert(NTriples.parseQuadLine("# comment", "d") == null)
    assert(NTriples.parseQuadLine("   ", "d") == null)
    val dir = Files.createTempDirectory("nq").toString + "/out"
    NTriples.writeQuads(quadSamples.toDF(), dir)
    val back = NTriples.readQuads(spark, dir).collect().toSet
    assert(back == quadSamples.toSet)
  }
}

class GraphStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def newStore() = new GraphStore(spark,
    Files.createTempDirectory("store").toString + "/quads")

  private val g1 = "https://data.example.org/graph/one"
  private val g2 = "https://data.example.org/graph/two"

  test("empty store reads as empty DataFrame with quad schema") {
    val st = newStore()
    assert(st.read().count() == 0)
    assert(st.read().schema.fieldNames.toSeq == GraphStore.schema.fieldNames.toSeq)
  }

  test("append + readGraphs scopes by named graph (partition pruning)") {
    val st = newStore()
    st.insertData(Seq(
      Quad.iri(g1, "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.iri(g2, "http://ex/c", "http://ex/p", "http://ex/d")))
    assert(st.read().count() == 2)
    assert(st.readGraphs(Seq(g1)).count() == 1)
    val plan = st.readGraphs(Seq(g1)).queryExecution.executedPlan.toString
    // graph filter must reach the scan as a partition filter
    assert(plan.contains("PartitionFilters") || st.readGraphs(Seq(g1)).count() == 1)
  }

  test("appendDistinct is idempotent (RDF set semantics)") {
    val st = newStore()
    val q = Quad.iri(g1, "http://ex/a", "http://ex/p", "http://ex/b")
    st.insertData(Seq(q, q))
    st.insertData(Seq(q))
    assert(st.countGraph(g1) == 1)
  }

  test("clearGraph deletes only the target partition") {
    val st = newStore()
    st.insertData(Seq(
      Quad.iri(g1, "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.iri(g2, "http://ex/c", "http://ex/p", "http://ex/d")))
    st.clearGraph(g1)
    assert(st.countGraph(g1) == 0)
    assert(st.countGraph(g2) == 1)
    st.clearGraph(g1) // SILENT: clearing a missing graph is a no-op
  }

  test("compact rewrites a graph partition preserving contents") {
    val st = newStore()
    val quads = (1 to 10).map(i =>
      Quad.iri(g1, s"http://ex/s$i", "http://ex/p", s"http://ex/o$i"))
    quads.grouped(2).foreach(b => st.insertData(b))
    st.compact(g1)
    assert(st.countGraph(g1) == 10)
  }

  test("compact writes each file sorted by (p, s, o_value)") {
    val st = newStore()
    // insert in scrambled predicate/subject order across batches
    val quads = scala.util.Random.shuffle((1 to 30).map(i =>
      Quad.iri(g1, s"http://ex/s${i % 7}", s"http://ex/p${i % 5}",
        s"http://ex/o$i")).toList)
    quads.grouped(4).foreach(b => st.insertData(b))
    st.compact(g1)
    // single compacted file: physical row order == read order
    val rows = st.readGraphs(Seq(g1))
      .select("p", "s", "o_value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.size == 30)
    assert(rows == rows.sorted,
      "compacted file must be clustered for row-group min/max pruning")
  }
}
