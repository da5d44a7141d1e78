package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{DictQuadStore, GraphStore, Quad}

/** Property-based backend parity: for ARBITRARY quad sets (random
  * graph/term-kind/literal mix, escape-heavy values, shared IRIs so
  * joins actually join), the SAME query battery on the string-space
  * [[GraphStore]] and the dict-encoded [[DictQuadStore]] must return
  * identical results — including once the dict engine plans with
  * cost-based pattern ordering (`withCardinalityStats`), whose
  * estimates are computed over the DECODED view while execution stays
  * in id space. This is the fuzz the example battery can't give: the
  * canonical-term keying (escapes, datatype/lang tagging) and the
  * dead-var analysis are exactly where a missed case silently drops
  * or duplicates bindings.
  */
class DictParityPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def forAllSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = Seed(20260815L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // escape-heavy literal values (quotes, backslashes, unicode) — these
  // stress the canonical dictionary key most
  private val valueGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '"', '\\', '\'', '<', '>', '@', '^'),
      1 -> Gen.oneOf('é', 'Ω', '中')))).map(_.mkString)

  private val iris = (0 until 6).map(i => s"http://ex/n$i")
  private val preds = (0 until 3).map(i => s"http://ex/p$i")
  private val graphs = Seq("http://ex/gA", "http://ex/gB")

  private val quadGen: Gen[Quad] = for {
    g <- Gen.oneOf(graphs)
    s <- Gen.frequency(5 -> Gen.oneOf(iris), 1 -> Gen.const("_:b0"))
    p <- Gen.oneOf(preds)
    o <- Gen.frequency(
      3 -> Gen.oneOf(iris).map(i => (i, null, null, Quad.KindIri)),
      3 -> valueGen.map(v => (v, null, null, Quad.KindLiteral)),
      1 -> valueGen.map(v => (v, Quad.xsd.integer, null, Quad.KindLiteral)),
      1 -> valueGen.map(v => (v, null, "en", Quad.KindLiteral)),
      1 -> Gen.const(("_:b1", null, null, Quad.KindBnode)))
  } yield Quad(g, s, p, o._1, o._2, o._3, o._4)

  private val batchGen: Gen[List[Quad]] =
    Gen.choose(15, 40).flatMap(n => Gen.listOfN(n, quadGen))

  private val battery = Seq(
    "pattern" -> """SELECT ?s ?o WHERE { ?s <http://ex/p0> ?o }""",
    "join" -> """SELECT ?s ?o WHERE {
        ?s <http://ex/p0> ?x . ?x <http://ex/p1> ?o }""",
    "optional" -> """SELECT ?s ?o ?l WHERE {
        ?s <http://ex/p0> ?o .
        OPTIONAL { ?s <http://ex/p1> ?l } }""",
    "union" -> """SELECT ?v WHERE {
        { ?s <http://ex/p0> ?v } UNION { ?s <http://ex/p2> ?v } }""",
    "graphvar" -> """SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://ex/p1> ?o } }""",
    "kindfilter" -> """SELECT ?s ?o WHERE {
        ?s ?p ?o . FILTER (isLiteral(?o) && !isBlank(?s)) }""",
    "agg" -> """SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s""",
    "path" -> """SELECT ?x WHERE { <http://ex/n0> <http://ex/p0>+ ?x }""")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf).toIndexedSeq).toSeq
      .sortBy(_.mkString(""))

  test("arbitrary quad sets: full battery identical on both backends") {
    import spark.implicits._
    var sample = 0
    forAllSamples(batchGen, 5) { quads =>
      sample += 1
      val base = new GraphEngine(new GraphStore(spark,
        Files.createTempDirectory(s"pp-base$sample").toString + "/s"))
      val dict = new GraphEngine(new DictQuadStore(spark,
        Files.createTempDirectory(s"pp-dict$sample").toString + "/s"))
      // two appends so the dict increments its dictionary (frozen ids)
      val (first, rest) = quads.splitAt(quads.size / 2)
      Seq(base.store, dict.store).foreach { st =>
        st.appendDistinct(first.toDF())
        st.appendDistinct(rest.toDF())
      }
      val dictStats = new GraphEngine(dict.store).withCardinalityStats()
      battery.foreach { case (name, q) =>
        val b = rows(base.select(q, name))
        val d = rows(dict.select(q, name))
        assert(b == d, s"sample $sample '$name' diverged:\nbase=$b\ndict=$d")
        val ds = rows(dictStats.select(q, name))
        assert(b == ds,
          s"sample $sample '$name' diverged under cost-based ordering")
      }
      // set-semantics parity after a replay + a delete round-trip
      base.store.appendDistinct(first.toDF())
      dict.store.appendDistinct(first.toDF())
      base.store.deleteQuads(rest.take(3).toDF())
      dict.store.deleteQuads(rest.take(3).toDF())
      assert(rows(base.store.read()) == rows(dict.store.read()),
        s"sample $sample store state diverged after replay+delete")
    }
  }
}
