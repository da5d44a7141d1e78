package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.model.{DictQuadStore, GraphStore, Quad}

/** Dict-encoded engine mode (VERDICT r9 #1): the FULL SPARQL surface on
  * [[DictQuadStore]] must be observably identical to the string-space
  * [[GraphStore]] — every query family below runs on both backends over
  * the same update sequence and compares collected results — while the
  * physical plan actually runs the pattern block in id space (pushed
  * long predicates on the encoded scan; asserted at the bottom).
  */
class DictStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/store"

  /** The same seed request on both backends: multi-graph, mixed term
    * kinds (IRIs, plain/typed/lang literals), INSERT..WHERE derivation
    * with BIND, and a DELETE — the reference pipeline's op mix. */
  private def seed(e: GraphEngine): Unit = {
    e.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/people> {
        ex:alice ex:name "Alice" .
        ex:alice ex:age "34"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:alice ex:knows ex:bob .
        ex:bob   ex:name "Bob" .
        ex:bob   ex:age "29"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:bob   ex:knows ex:carol .
        ex:carol ex:name "Carol"@en .
        ex:carol ex:dept ex:eng .
        ex:dave  ex:name "Dave" .
      } }""")
    e.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/orgs> {
        ex:eng ex:label "Engineering" .
        ex:eng ex:head ex:carol .
      } }""")
    e.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/derived>
      INSERT { ?s ex:tag ?t }
      USING <http://ex/people>
      WHERE {
        ?s ex:name ?n .
        BIND (MD5(?n) AS ?t)
      }""")
    e.update("""
      PREFIX ex: <http://ex/>
      DELETE DATA { GRAPH <http://ex/people> { ex:dave ex:name "Dave" . } }""")
  }

  private def engines(): (GraphEngine, GraphEngine) = {
    val base = new GraphEngine(new GraphStore(spark, tmp("dict-base")))
    val dict = new GraphEngine(new DictQuadStore(spark, tmp("dict-enc")))
    seed(base); seed(dict)
    (base, dict)
  }

  private lazy val (base, dict) = engines()

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq
      .map(_.toIndexedSeq).sortBy(_.mkString("|"))

  private def parity(name: String, q: String): Unit = {
    val b = rows(base.select(q, name))
    val d = rows(dict.select(q, name))
    assert(b == d, s"$name diverged:\nbase=$b\ndict=$d")
    assert(b.nonEmpty, s"$name is vacuous — returned no rows on either side")
  }

  test("BGP join + FILTER + DISTINCT + ORDER parity") {
    parity("bgp", """
      PREFIX ex: <http://ex/>
      SELECT DISTINCT ?n ?fn
      WHERE {
        ?s ex:knows ?o .
        ?s ex:name ?n .
        ?o ex:name ?fn .
        FILTER (STRSTARTS(?n, 'A') || STRSTARTS(?n, 'B'))
      } ORDER BY ?n""")
  }

  test("OPTIONAL (unmatched rows keep vars unbound) parity") {
    parity("optional", """
      PREFIX ex: <http://ex/>
      SELECT ?n ?d
      WHERE {
        GRAPH <http://ex/people> {
          ?s ex:name ?n .
          OPTIONAL { ?s ex:dept ?d }
        }
      } ORDER BY ?n""")
  }

  test("UNION parity") {
    parity("union", """
      PREFIX ex: <http://ex/>
      SELECT ?v
      WHERE {
        { ?s ex:name ?v } UNION { ?s ex:label ?v }
      } ORDER BY ?v""")
  }

  test("MINUS parity") {
    parity("minus", """
      PREFIX ex: <http://ex/>
      SELECT ?s
      WHERE {
        ?s ex:name ?n .
        MINUS { ?s ex:dept ?d }
      } ORDER BY ?s""")
  }

  test("GRAPH variable binding parity") {
    parity("graphvar", """
      PREFIX ex: <http://ex/>
      SELECT ?g ?s
      WHERE { GRAPH ?g { ?s ex:name ?n } }
      ORDER BY ?g ?s""")
  }

  test("constant GRAPH scoping parity") {
    parity("graphconst", """
      PREFIX ex: <http://ex/>
      SELECT ?s ?t
      WHERE { GRAPH <http://ex/derived> { ?s ex:tag ?t } }
      ORDER BY ?s""")
  }

  test("property path + (closure) and * (zero-length) parity") {
    parity("path_plus", """
      PREFIX ex: <http://ex/>
      SELECT ?x
      WHERE { ex:alice ex:knows+ ?x }
      ORDER BY ?x""")
    parity("path_star", """
      PREFIX ex: <http://ex/>
      SELECT ?x
      WHERE { ex:alice ex:knows* ?x }
      ORDER BY ?x""")
  }

  test("path closures run in id space (checkpointed edges are longs)") {
    // seeded-BFS shape: the reachability frontier is checkpointed each
    // round; in dict mode those frames must carry LONG ids (`_dst#NNL`
    // in the plan), decoding only the projected endpoint
    val q = """
      PREFIX ex: <http://ex/>
      SELECT ?x WHERE { ex:alice ex:knows+ ?x } ORDER BY ?x"""
    assert(rows(base.select(q)) == rows(dict.select(q)))
    val plan = dict.select(q).queryExecution.executedPlan.toString
    assert("_dst#\\d+L".r.findFirstIn(plan).isDefined,
      s"closure edges not id-typed:\n$plan")
  }

  test("sibling-seeded var-var closure parity (struct seeds re-encoded)") {
    // ?s is bound by the name pattern before the closure compiles, so
    // the id-space BFS must seed from the DECODED struct bindings via
    // the term→id crossing — and agree with the string engine
    parity("seeded_varvar", """
      PREFIX ex: <http://ex/>
      SELECT ?n ?x
      WHERE {
        ?s ex:name ?n .
        ?s ex:knows+ ?x .
      } ORDER BY ?n ?x""")
  }

  test("VALUES + BIND builtins parity") {
    parity("values_bind", """
      PREFIX ex: <http://ex/>
      SELECT ?n ?h
      WHERE {
        VALUES ?n { "Alice" "Bob" }
        ?s ex:name ?n .
        BIND (MD5(CONCAT(?n, '!')) AS ?h)
      } ORDER BY ?n""")
  }

  test("subquery + aggregates + HAVING parity") {
    parity("subquery_agg", """
      PREFIX ex: <http://ex/>
      SELECT ?g ?c
      WHERE {
        { SELECT ?g (COUNT(?s) AS ?c)
          WHERE { GRAPH ?g { ?s ?p ?o } }
          GROUP BY ?g
          HAVING (COUNT(?s) > 1) }
      } ORDER BY ?g""")
  }

  test("FILTER EXISTS / NOT EXISTS parity") {
    parity("exists", """
      PREFIX ex: <http://ex/>
      SELECT ?n
      WHERE {
        ?s ex:name ?n .
        FILTER EXISTS { ?s ex:knows ?o }
      } ORDER BY ?n""")
    parity("not_exists", """
      PREFIX ex: <http://ex/>
      SELECT ?n
      WHERE {
        ?s ex:name ?n .
        FILTER NOT EXISTS { ?s ex:knows ?o }
      } ORDER BY ?n""")
  }

  test("lang/typed literal constants hit the dictionary key exactly") {
    parity("lang_const", """
      PREFIX ex: <http://ex/>
      SELECT ?s
      WHERE { ?s ex:name "Carol"@en }""")
    parity("typed_const", """
      PREFIX ex: <http://ex/>
      SELECT ?s
      WHERE { ?s ex:age "34"^^<http://www.w3.org/2001/XMLSchema#integer> }""")
  }

  test("a constant the store has never seen matches nothing (no error)") {
    val d = dict.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s WHERE { ?s ex:name "Nobody" }""")
    assert(d.collect().isEmpty)
  }

  test("ASK parity (true and false)") {
    val qTrue = """PREFIX ex: <http://ex/>
      ASK { ?s ex:knows ex:bob }"""
    val qFalse = """PREFIX ex: <http://ex/>
      ASK { ?s ex:knows ex:dave }"""
    assert(base.ask(qTrue) && dict.ask(qTrue))
    assert(!base.ask(qFalse) && !dict.ask(qFalse))
  }

  test("CONSTRUCT parity") {
    val q = """PREFIX ex: <http://ex/>
      CONSTRUCT { ?o ex:knownBy ?s }
      WHERE { ?s ex:knows ?o }"""
    assert(rows(base.construct(q)) == rows(dict.construct(q)))
  }

  test("DESCRIBE parity (decoded view path)") {
    val q = "DESCRIBE <http://ex/alice>"
    assert(rows(base.describe(q)) == rows(dict.describe(q)))
  }

  test("update parity: MODIFY, quad templates, CLEAR, COPY") {
    val (b2, d2) = engines()
    val req = """
      PREFIX ex: <http://ex/>
      WITH <http://ex/people>
      DELETE { ?s ex:age ?a }
      INSERT { ?s ex:ageTxt ?a }
      WHERE { ?s ex:age ?a } ;
      INSERT { GRAPH ?g { ?s ex:routed "yes" } }
      USING <http://ex/people>
      WHERE { ?s ex:name ?n .
              BIND (URI(CONCAT('http://ex/by/', STR(?n))) AS ?g) } ;
      COPY <http://ex/orgs> TO <http://ex/orgs2> ;
      CLEAR GRAPH <http://ex/derived>"""
    b2.update(req); d2.update(req)
    assert(rows(b2.store.read()) == rows(d2.store.read()))
    assert(b2.store.graphNames().sorted == d2.store.graphNames().sorted)
  }

  test("store: set-semantics insert, frozen dict ids, delete, compact") {
    import spark.implicits._
    val st = new DictQuadStore(spark, tmp("dict-store"))
    val batch = Seq(
      Quad.iri("g", "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.lit("g", "http://ex/a", "http://ex/q", "it \"quotes\" \\and\\ slashes"),
      Quad.typed("g", "http://ex/a", "http://ex/q", "7", Quad.xsd.integer))
    st.appendDistinct(batch.toDF())
    st.appendDistinct(batch.toDF()) // replay: set semantics hold
    assert(st.read().count() == 3)
    val idsBefore = st.readDict().collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("id")).toMap
    // an increment freezes existing ids and appends after the range
    st.appendDistinct(Seq(
      Quad.iri("g", "http://ex/zz", "http://ex/p", "http://ex/a")).toDF())
    val idsAfter = st.readDict().collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("id")).toMap
    idsBefore.foreach { case (t, i) => assert(idsAfter(t) == i) }
    assert(idsAfter("http://ex/zz") == idsBefore.values.max + 1)
    assert(st.read().count() == 4)
    // escape-carrying literal round-trips the decode exactly
    val vals = st.read().where($"o_kind" === "literal" && $"o_type".isNull)
      .select("o_value").collect().map(_.getString(0)).toSet
    assert(vals == Set("it \"quotes\" \\and\\ slashes"))
    // delete one quad in id space; dictionary keeps its terms
    st.deleteQuads(Seq(batch(1)).toDF())
    assert(st.read().count() == 3)
    assert(st.readDict().count() == idsAfter.size)
    // compact clusters but preserves state
    val before = st.read().collect().map(_.toSeq).toSet
    st.compact("g")
    assert(st.read().collect().map(_.toSeq).toSet == before)
  }

  test("cardinality stats aggregate the encoded store, matching decoded") {
    import graft.sparql.{Algebra, CardEstimator}
    import Algebra._
    val enc = CardEstimator.fromDictStore(
      dict.store.asInstanceOf[graft.model.DictBackend])
    val str = CardEstimator.fromQuads(dict.store.read())
    // per-predicate triple counts are exact on both paths — a
    // constant-predicate two-var pattern's estimate IS that count
    Seq("http://ex/name", "http://ex/knows", "http://ex/tag").foreach { p =>
      val tp = TriplePattern(V("s"), I(p), V("o"))
      assert(enc.estimate(tp) == str.estimate(tp), s"count diverged for $p")
    }
    // and the engine's stats mode keeps full parity (id-space build)
    val statsEngine = new GraphEngine(dict.store).withCardinalityStats()
    val q = """
      PREFIX ex: <http://ex/>
      SELECT ?n ?fn
      WHERE { ?s ex:name ?n . ?s ex:knows ?o . ?o ex:name ?fn }
      ORDER BY ?n ?fn"""
    assert(rows(statsEngine.select(q)) == rows(base.select(q)))
  }

  test("dead join-glue vars are dropped, not decoded (project-early)") {
    // ?s is pure glue: joins the two patterns, surfaces nowhere. Its
    // decode join must be eliminated — the plan's only dictionary scans
    // are the projected ?n/?fn decodes (2) — while results still match.
    val q = """
      PREFIX ex: <http://ex/>
      SELECT ?n ?fn
      WHERE { ?s ex:name ?n . ?s ex:knows ?o . ?o ex:name ?fn }
      ORDER BY ?n ?fn"""
    assert(rows(base.select(q)) == rows(dict.select(q)))
    val plan = dict.select(q).queryExecution.executedPlan.toString
    val dictScans = "store/dict".r.findAllIn(plan).length
    // only the projected ?n and ?fn decode; ?s and ?o join entirely in
    // id space inside the block and their columns are dropped
    assert(dictScans == 2, s"expected 2 dict decode joins, saw $dictScans:\n$plan")
  }

  test("COUNT-only vars keep raw ids — no decode broadcast (r10 verdict #4)") {
    // ?s is consumed ONLY by COUNT(?s): the aggregate needs binding
    // presence, never the term, so its vocabulary-sized decode join
    // must be eliminated — the plan's single dictionary scan is the
    // grouped ?o decode — while results still match the string backend.
    val q = """
      PREFIX ex: <http://ex/>
      SELECT ?o (COUNT(?s) AS ?n)
      WHERE { ?s ex:knows ?o }
      GROUP BY ?o ORDER BY ?o"""
    parity("count_only", q)
    val plan = dict.select(q).queryExecution.executedPlan.toString
    val dictScans = "store/dict".r.findAllIn(plan).length
    assert(dictScans == 1,
      s"expected 1 dict decode join (?o only), saw $dictScans:\n$plan")
  }

  test("COUNT DISTINCT over raw ids equals term-space distinct") {
    // id-distinctness ≡ term-distinctness (the dictionary is a
    // bijection) — the elision must hold under DISTINCT too
    parity("count_distinct_only", """
      PREFIX ex: <http://ex/>
      SELECT (COUNT(DISTINCT ?s) AS ?n)
      WHERE { ?s ex:name ?n0 }""")
  }

  test("VALUES pushdown reaches the encoded scan as a long In() filter (r11)") {
    // ground same-group VALUES restrict their pattern slots at the
    // SCAN: the ids go down as one In(s_id, [...]) pushed predicate
    // (semijoin reduction — the VALUES join still runs above)
    val q = """
      PREFIX ex: <http://ex/>
      SELECT ?n WHERE {
        ?s ex:name ?n .
        VALUES ?s { ex:alice ex:bob }
      } ORDER BY ?n"""
    parity("values_push", q)
    val plan = dict.select(q).queryExecution.executedPlan.toString
    assert("In\\(s_id, \\[".r.findFirstIn(plan).isDefined,
      s"no pushed In(s_id) filter in:\n$plan")
  }

  test("the pattern block really runs in id space (pushed long filters)") {
    val plan = dict.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?o WHERE { ?s ex:knows ?o . ?o ex:name ?n }""")
      .queryExecution.executedPlan.toString
    // the constant predicate reached the ENCODED scan as a long filter…
    assert(plan.contains("PushedFilters: [IsNotNull(p_id), EqualTo(p_id,"),
      s"no pushed p_id filter in:\n$plan")
    // …and the scan projects ids, not term strings
    assert(plan.contains("s_id"), "encoded columns absent from the plan")
    assert(!plan.contains("o_value#") ||
      plan.indexOf("o_value#") > plan.indexOf("s_id"),
      "pattern scan reads decoded strings")
  }
}
