package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.rdf.JsonLd

/** Property-based JSON-LD sink→source roundtrip: for ARBITRARY quad
  * batches (unicode values, escapes, every term kind, typed and
  * language literals, multiple graphs), `write` then `read` must
  * reproduce the exact quad set. This is the fuzz the example-based
  * spec can't give — the JSON escaping chain and the per-kind value
  * encodings are exactly where a missed case silently corrupts data.
  *
  * Contract note (documented on the sink): raw control characters
  * outside JSON's named escapes (\b \t \n \f \r) are excluded from the
  * generator — strict JSON cannot carry them unescaped and RDF term
  * values don't contain them in practice.
  */
class JsonLdPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def forAllSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = Seed(20260814L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val xsd = "http://www.w3.org/2001/XMLSchema#"

  // printable unicode + the named-escape whitespace, no raw controls
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '"', '\\', '\n', '\t', '\r', '\b', '\f',
      '{', '}', '[', ']', ':', ',', '/', '<', '>', '\''),
    // BMP non-surrogate unicode only — a lone surrogate is ill-formed
    // UTF-16 and no serialization layer is required to carry it
    1 -> Gen.oneOf('é', 'Ω', '中', 'ß', '€'))

  private val valueGen: Gen[String] =
    Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)

  // letter-first local part: RDF/XML needs an NCName after the last
  // '/'; harmless extra constraint for the other sinks
  private val iriGen: Gen[String] =
    Gen.zip(Gen.alphaChar, Gen.choose(0, 5)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)))
      .map { case (h, t) => "http://ex/" + h + t.mkString }

  private val bnodeGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(s => "_:" + s.mkString)

  private val graphGen: Gen[String] =
    Gen.frequency(2 -> Gen.const(Quad.DefaultGraph), 1 -> iriGen)

  private val quadGen: Gen[Quad] = for {
    g <- graphGen
    s <- Gen.frequency(3 -> iriGen, 1 -> bnodeGen)
    p <- iriGen
    (v, kind, dt, lg) <- Gen.frequency[(String, String, String, String)](
      3 -> valueGen.map((_, Quad.KindLiteral, null, null)),
      2 -> iriGen.map((_, Quad.KindIri, null, null)),
      1 -> bnodeGen.map((_, Quad.KindBnode, null, null)),
      2 -> Gen.zip(valueGen, Gen.oneOf(xsd + "integer", xsd + "date",
        xsd + "double", "http://ex/custom"))
        .map { case (v, t) => (v, Quad.KindLiteral, t, null) },
      1 -> Gen.zip(valueGen, Gen.oneOf("en", "fr", "sv-SE"))
        .map { case (v, l) => (v, Quad.KindLiteral, null, l) })
  } yield Quad(g, s, p, v, dt, lg, kind)

  private def key(q: Quad) =
    (q.graph, q.s, q.p, q.o_value, Option(q.o_type), Option(q.o_lang), q.o_kind)

  test("RdfIO dispatches every extension through the matching sink and source") {
    import graft.rdf.RdfIO
    import spark.implicits._
    val quads = Seq(
      Quad.lit(Quad.DefaultGraph, "http://ex/a", "http://ex/p", "v"),
      Quad("http://g/x", "http://ex/b", "http://ex/q", "http://ex/a",
        null, null, Quad.KindIri))
    def k(q: Quad) = (q.s, q.p, q.o_value, Option(q.o_type),
      Option(q.o_lang), q.o_kind)
    for (e <- Seq("nt", "nq", "ttl", "trig", "rdf", "jsonld", "hext")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-rdfio").toString + s"/out.$e"
      RdfIO.write(quads.toDS().toDF(), dir)
      val back = RdfIO.read(spark, dir).collect()
      assert(back.map(k).toSet == quads.map(k).toSet, s"format .$e")
      // quad-scoped formats keep the graph labels; triple-scoped collapse
      val graphs = back.map(_.graph).toSet
      if (Set("nq", "trig", "jsonld", "hext")(e))
        assert(graphs == Set(Quad.DefaultGraph, "http://g/x"), s".$e graphs")
      else assert(graphs == Set(Quad.DefaultGraph), s".$e graphs")
    }
    intercept[IllegalArgumentException] {
      RdfIO.read(spark, "/tmp/x.parquet")
    }
  }

  test("arbitrary quad batches roundtrip through the N-Quads sink byte-exactly") {
    import graft.rdf.NTriples
    forAllSamples(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, quadGen)), 25) {
      quads0 =>
        import spark.implicits._
        val quads = quads0.distinct
        val lines = NTriples.toQuadLines(quads.toDS().toDF())
          .as[String].collect()
        val back = lines.map(NTriples.parseQuadLine(_, Quad.DefaultGraph))
        assert(back.map(key).toSet == quads.map(key).toSet)
    }
  }

  test("arbitrary quad batches roundtrip through the HexTuples sink (quad-scoped)") {
    import graft.rdf.HexTuples
    forAllSamples(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, quadGen)), 25) {
      quads0 =>
        import spark.implicits._
        val quads = quads0.distinct
        val dir = java.nio.file.Files
          .createTempDirectory("graft-hext-fuzz").toString + "/out.hext"
        HexTuples.write(quads.toDS().toDF(), dir)
        val back = HexTuples.read(spark, dir).collect()
        assert(back.map(key).toSet == quads.map(key).toSet,
          s"roundtrip mismatch in $dir")
    }
  }

  test("arbitrary quad batches roundtrip through the TriG sink (graphs survive)") {
    import graft.rdf.Turtle
    import spark.implicits._
    forAllSamples(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, quadGen)), 25) {
      quads0 =>
        val quads = quads0.distinct
        val dir = java.nio.file.Files
          .createTempDirectory("graft-trigprop").toString
        Turtle.writeTrig(quads.toDS().toDF(), dir)
        val back = Turtle.readTrig(spark, dir).collect()
        def k(q: Quad) = (q.graph, q.s.replaceAll("_:t[0-9a-f]+_", "_:"),
          q.p,
          if (q.o_kind == Quad.KindBnode)
            q.o_value.replaceAll("_:t[0-9a-f]+_", "_:") else q.o_value,
          Option(q.o_type), Option(q.o_lang), q.o_kind)
        assert(back.map(k).toSet == quads.map(k).toSet,
          s"roundtrip mismatch in $dir")
    }
  }

  test("arbitrary quad batches roundtrip through the RDF/XML sink (triple-scoped)") {
    import graft.rdf.RdfXml
    import spark.implicits._
    forAllSamples(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, quadGen)), 25) {
      quads0 =>
        // \b and \f are ILLEGAL in XML 1.0 (even as char refs) — the
        // writer rejects them loudly (covered below); map them out here
        val quads = quads0.distinct.map(q => q.copy(
          o_value = q.o_value.replace('\b', 'B').replace('\f', 'F')))
          .distinct
        val dir = java.nio.file.Files
          .createTempDirectory("graft-xmlprop").toString
        RdfXml.write(quads.toDS().toDF(), dir)
        val back = RdfXml.read(spark, dir, "g").collect()
        def k(q: Quad) = (q.s.replaceAll("_:x[0-9a-f]+_", "_:"),
          q.p,
          if (q.o_kind == Quad.KindBnode)
            q.o_value.replaceAll("_:x[0-9a-f]+_", "_:") else q.o_value,
          Option(q.o_type), Option(q.o_lang), q.o_kind)
        assert(back.map(k).toSet == quads.map(k).toSet,
          s"roundtrip mismatch in $dir")
    }
    // the writer refuses XML-1.0-illegal control chars loudly
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      RdfXml.write(Seq(Quad.lit("g", "http://ex/a", "http://ex/p",
        "bad\fchar")).toDS().toDF(), java.nio.file.Files
        .createTempDirectory("graft-xmlbad").toString)
    }
    assert(e.getMessage.contains("RDF/XML-serializable"))
  }

  test("arbitrary quad batches roundtrip through the Turtle sink (triple-scoped)") {
    import graft.rdf.Turtle
    import spark.implicits._
    forAllSamples(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, quadGen)), 25) {
      quads0 =>
        val quads = quads0.distinct
        val dir = java.nio.file.Files
          .createTempDirectory("graft-ttlprop").toString
        Turtle.write(quads.toDS().toDF(), dir)
        val back = Turtle.read(spark, dir, "g").collect()
        def tripleKey(q: Quad) = (q.s.replaceAll("_:t[0-9a-f]+_", "_:"),
          q.p,
          if (q.o_kind == Quad.KindBnode)
            q.o_value.replaceAll("_:t[0-9a-f]+_", "_:") else q.o_value,
          Option(q.o_type), Option(q.o_lang), q.o_kind)
        // Turtle is triple-scoped: compare modulo the dropped graph
        assert(back.map(tripleKey).toSet == quads.map(tripleKey).toSet,
          s"roundtrip mismatch in $dir")
    }
  }

  test("arbitrary quad batches roundtrip through the JSON-LD sink byte-exactly") {
    import spark.implicits._
    forAllSamples(Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, quadGen)), 25) {
      quads0 =>
        // set semantics: the (graph, s, p)-grouped sink dedups values,
        // so compare distinct quad sets
        val quads = quads0.distinct
        val dir = java.nio.file.Files
          .createTempDirectory("graft-jldprop").toString
        JsonLd.write(quads.toDS().toDF(), dir)
        val back = JsonLd.read(spark, dir).collect()
        // explicit `_:label` ids are re-namespaced per document on read;
        // strip the document tag on the read side before comparing
        val norm = back.map(q => Quad(q.graph,
          q.s.replaceAll("_:j[0-9a-f]+_", "_:"), q.p,
          if (q.o_kind == Quad.KindBnode)
            q.o_value.replaceAll("_:j[0-9a-f]+_", "_:") else q.o_value,
          q.o_type, q.o_lang, q.o_kind))
        assert(norm.map(key).toSet == quads.map(key).toSet,
          s"roundtrip mismatch in $dir")
    }
  }
}
