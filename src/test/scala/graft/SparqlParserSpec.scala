package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad
import graft.sparql.{Algebra, Compiler, SparqlParser}
import graft.sparql.SparqlParser._
import graft.queries.ReferenceMappings._

/** SPARQL text front end: parse freshly-authored update texts and check
  * they compile to the same results as the hand-built DSL queries. */
class SparqlParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val store = graft.queries.Fixtures.ingestAll(spark,
    Files.createTempDirectory("pkg").toString + "/quads")

  private def results(q: Algebra.MappingQuery): Set[String] =
    Compiler.run(q, store.readGraphs(q.usingGraphs)).collect()
      .map(_.mkString("|")).toSet

  test("parse + run a simple INSERT..WHERE matches the DSL query") {
    val text = s"""
      PREFIX mh: <$mh>
      PREFIX g: <$graphs>
      PREFIX src: <$source>
      WITH g:organizations
      INSERT { ?org mh:label ?n }
      USING g:mediahaven_tenants
      WHERE {
        ?x src:Name ?n .
        ?x src:ExternalId ?eid .
        BIND (URI(CONCAT('$idNs', ?eid)) AS ?org)
      }"""
    val InsertWhere(q) = SparqlParser.parse(text): @unchecked
    assert(q.targetGraph == gOrganizations)
    assert(q.usingGraphs == Seq(gMamTenants))
    // same output as the transcribed mamTenants query (modulo var names)
    assert(results(q) == results(mamTenants))
  }

  test("bnode property lists, ';' and ',' lists, 'a', OPTIONAL, typed literals") {
    val text = s"""
      PREFIX org: <$orgNs>
      PREFIX g: <$graphs>
      PREFIX src: <$source>
      PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      WITH g:organizations
      INSERT {
        ?org a org:Organization ;
             org:identifier ?orid, "fixed"^^xsd:string .
      }
      USING g:tl_companies
      USING g:tl_custom_fields
      WHERE {
        ?cf src:id ?cfid ; src:label "5.1 - OR-ID" .
        ?o src:custom_fields [
          src:value ?orid ;
          src:definition [ src:id ?cfid ]
        ] .
        OPTIONAL { ?o src:name ?name . }
        BIND (URI(CONCAT('$idNs', ?orid)) AS ?org)
      }"""
    val InsertWhere(q) = SparqlParser.parse(text): @unchecked
    val out = Compiler.run(q, store.readGraphs(q.usingGraphs)).collect()
    assert(out.length == 3) // type + identifier + fixed literal
    val fixed = out.filter(_.getString(3) == "fixed")
    assert(fixed.length == 1 && fixed.head.getString(4) == null) // xsd:string → plain
  }

  test("parsed ldap-org-equivalent text reproduces the DSL mapping output") {
    val text = s"""
      PREFIX org: <$orgNs>  PREFIX skos: <$skos>
      PREFIX schema: <$schemaNs>  PREFIX meemoo: <$meemoo>
      PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      PREFIX g: <$graphs>  PREFIX src: <$source>
      WITH g:organizations
      INSERT {
        ?org a org:Organization ;
             schema:identifier ?orid ;
             skos:altLabel ?orgName ;
             meemoo:sector ?sector ;
             org:hasPrimarySite ?site ;
             org:hasSite ?site .
        ?site a org:Site ; org:siteAddress ?siteAddress .
        ?siteAddress a schema:PostalAddress ;
             schema:streetAddress ?streetAddress ;
             schema:addressCountry "BE"^^xsd:string ;
             schema:postalCode ?postalCode ;
             schema:addressRegion ?region ;
             schema:addressLocality ?city .
      }
      USING g:ldap_organizations
      WHERE {
        BIND ('$idNs' AS ?ns)
        ?o src:objectClass "organization" ;
           src:o ?orid ;
           src:description ?orgName .
        BIND (URI(CONCAT(?ns, ?orid)) AS ?org)
        OPTIONAL { ?o src:street ?streetAddress }
        OPTIONAL { ?o src:postalCode ?postalCode }
        OPTIONAL { ?o src:l ?city . }
        OPTIONAL { ?o src:st ?region . }
        OPTIONAL { ?o src:x-be-viaa-sector ?sector . }
        BIND (URI(CONCAT(?ns, MD5(CONCAT(?orid, '-primary')))) AS ?site)
        BIND (URI(CONCAT(?ns, MD5(CONCAT(?streetAddress, ?postalCode, ?city)))) AS ?siteAddress)
      }"""
    val InsertWhere(q) = SparqlParser.parse(text): @unchecked
    assert(results(q) == results(ldapOrg))
  }

  test("expression functions: IF/STRSTARTS/STRLANG/ENCODE_FOR_URI/STRAFTER/REPLACE/LCASE") {
    val text = s"""
      PREFIX g: <$graphs>  PREFIX src: <$source>  PREFIX ex: <http://ex/>
      WITH g:organizations
      INSERT { ?s ex:v ?v1 ; ex:w ?v2 ; ex:x ?v3 ; ex:y ?v4 }
      USING g:tl_users
      WHERE {
        ?u src:id ?id ; src:function ?f .
        BIND (URI(CONCAT('http://ex/', ?id)) AS ?s)
        BIND (IF(STRSTARTS(?f, 'Account'), 'acct', 'other') AS ?v1)
        BIND (STRLANG(?f, "nl") AS ?v2)
        BIND (ENCODE_FOR_URI(?f) AS ?v3)
        BIND (LCASE(REPLACE(STRAFTER(?f, 'Account '), ' ', '_')) AS ?v4)
      }"""
    val InsertWhere(q) = SparqlParser.parse(text): @unchecked
    val rows = Compiler.run(q, store.readGraphs(q.usingGraphs)).collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(5))).toSet
    assert(rows.contains(("http://ex/v", "acct", null)))
    assert(rows.contains(("http://ex/w", "Account manager", "nl")))
    assert(rows.contains(("http://ex/x", "Account%20manager", null)))
    assert(rows.contains(("http://ex/y", "manager", null)))
  }

  test("§17.4.4–5 builtins: SHA*, datetime accessors, NOW/UUID/STRUUID/RAND/BNODE/isNumeric") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("fns").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:at "2011-01-10T14:45:13.815-05:00"^^xsd:dateTime ; ex:n "abc" .
        ex:b ex:at "2024-02-29T23:59:07Z"^^xsd:dateTime ; ex:n "xyz" .
        ex:c ex:at "2024-06-01T00:30:00"^^xsd:dateTime ; ex:n "42" .
      } }""")
    val df = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?tz ?dur ?s1 ?s512 ?u ?su ?r ?bn ?bn2 ?bn3 ?isb ?now ?numn ?numlen
      FROM <http://ex/src>
      WHERE {
        ?s ex:at ?t ; ex:n ?nm .
        BIND (YEAR(?t) AS ?y) BIND (MONTH(?t) AS ?mo) BIND (DAY(?t) AS ?d)
        BIND (HOURS(?t) AS ?h) BIND (MINUTES(?t) AS ?mi) BIND (SECONDS(?t) AS ?sec)
        BIND (TZ(?t) AS ?tz) BIND (TIMEZONE(?t) AS ?dur)
        BIND (SHA1(?nm) AS ?s1) BIND (SHA512(?nm) AS ?s512)
        BIND (UUID() AS ?u) BIND (STRUUID() AS ?su) BIND (RAND() AS ?r)
        BIND (BNODE() AS ?bn) BIND (BNODE(?nm) AS ?bn2) BIND (BNODE(?nm) AS ?bn3)
        BIND (ISBLANK(BNODE()) AS ?isb)
        BIND (NOW() AS ?now)
        BIND (ISNUMERIC(?nm) AS ?numn) BIND (ISNUMERIC(STRLEN(?nm)) AS ?numlen)
      } ORDER BY ?s""")
    val cols = df.columns.zipWithIndex.toMap
    val rows = df.collect()
    assert(rows.length == 3)
    def get(r: Int, c: String): String = rows(r).getString(cols(c))
    // ex:a — negative-offset dateTime keeps its own wall-clock fields
    assert((get(0, "y"), get(0, "mo"), get(0, "d")) == (("2011", "1", "10")))
    assert((get(0, "h"), get(0, "mi"), get(0, "sec")) == (("14", "45", "13.815")))
    assert(get(0, "tz") == "-05:00" && get(0, "dur") == "-PT5H")
    assert(get(0, "s1") == "a9993e364706816aba3e25717850c26c9cd0d89d") // sha1("abc")
    assert(get(0, "s512").length == 128 && get(0, "s512").matches("[0-9a-f]+"))
    // ex:b — Z offset; integral seconds canonicalize through double
    assert((get(1, "y"), get(1, "mo"), get(1, "d")) == (("2024", "2", "29")))
    assert(get(1, "sec") == "7.0" && get(1, "tz") == "Z" && get(1, "dur") == "PT0S")
    // ex:c — no timezone: TZ is "", TIMEZONE is unbound
    assert(get(2, "tz") == "" && get(2, "dur") == null)
    // nondeterministic ctors: right shape, fresh per solution
    assert(rows.map(_.getString(cols("u"))).distinct.length == 3)
    assert(get(0, "u").matches("urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(get(0, "su").matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    val r0 = get(0, "r").toDouble
    assert(r0 >= 0.0 && r0 < 1.0)
    assert(rows.map(_.getString(cols("bn"))).distinct.length == 3)
    assert(get(0, "bn").startsWith("_:f") && get(0, "isb") == "true")
    // BNODE(str) is stable for the same argument within the query
    assert(get(0, "bn2") == get(0, "bn3") && get(0, "bn2").startsWith("_:b"))
    assert(get(0, "bn2") != get(1, "bn2"))
    // NOW(): one value for the whole query, xsd:dateTime shape
    assert(get(0, "now") == get(2, "now"))
    assert(get(0, "now").matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z"""))
    // isNumeric: plain "42" literal is NOT numeric; STRLEN result is
    assert(get(2, "numn") == "false" && get(2, "numlen") == "true")
  }

  test("HAVING with inline (unprojected) aggregates") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("havagg").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:v "1" . ex:a ex:v "2" . ex:a ex:v "3" .
        ex:b ex:v "10" . ex:b ex:v "20" .
        ex:c ex:v "5" .
      } }""")
    // COUNT appears only in HAVING — never projected
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s (SUM(?o) AS ?total) FROM <http://ex/src>
      WHERE { ?s ex:v ?o }
      GROUP BY ?s
      HAVING (COUNT(?o) >= 2 && SUM(?o) < 10)
      ORDER BY ?s""").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "http://ex/a")
    // hidden aggregate columns must not leak into the projection
    assert(rows.head.schema.fieldNames.toSeq == Seq("s", "total"))

    // GROUP BY with ZERO projected aggregates: still a grouped query —
    // one row per group key, HAVING's inline COUNT filters groups
    // (pre-round-8 this silently dropped GROUP BY + HAVING)
    val noAgg = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/src>
      WHERE { ?s ex:v ?o }
      GROUP BY ?s
      HAVING (COUNT(?o) >= 2)
      ORDER BY ?s""").collect()
    assert(noAgg.map(_.getString(0)).toSeq ==
      Seq("http://ex/a", "http://ex/b"))

    // GROUP BY with no aggregates anywhere: collapses to distinct keys
    val bare = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/src>
      WHERE { ?s ex:v ?o }
      GROUP BY ?s
      ORDER BY ?s""").collect()
    assert(bare.map(_.getString(0)).toSeq ==
      Seq("http://ex/a", "http://ex/b", "http://ex/c"))

    // HAVING referencing a grouped variable (numeric lexical compare)
    val havVar = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?o FROM <http://ex/src>
      WHERE { ?s ex:v ?o }
      GROUP BY ?o
      HAVING (?o >= 5)
      ORDER BY ?o""").collect()
    assert(havVar.map(_.getString(0)).toSeq == Seq("10", "20", "5"))
  }

  test("ISNUMERIC covers the full XSD numeric hierarchy") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("isnum").toString + "/quads")
    val engine = new GraphEngine(st)
    // externally-loaded data can carry any XSD numeric type even though
    // the engine itself only mints integer/double/decimal
    engine.update("""
      PREFIX ex: <http://ex/>
      PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      INSERT DATA { GRAPH <http://ex/n> {
        ex:a ex:v "1.5"^^xsd:float .
        ex:b ex:v "7"^^xsd:long .
        ex:c ex:v "3"^^xsd:unsignedByte .
        ex:d ex:v "2"^^xsd:nonNegativeInteger .
        ex:e ex:v "plain" .
        ex:f ex:v "9"^^xsd:gYear .
      } }""")
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/n>
      WHERE { ?s ex:v ?o . FILTER (ISNUMERIC(?o)) }
      ORDER BY ?s""").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("http://ex/a", "http://ex/b", "http://ex/c", "http://ex/d"))
  }

  test("BASE resolution, SELECT REDUCED, DELETE WHERE shorthand") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("bform").toString + "/quads")
    val engine = new GraphEngine(st)
    // BASE: relative <...> refs and relative PREFIX expansions resolve
    engine.update("""
      BASE <http://ex.org/dir/doc>
      PREFIX r: <rel/>
      INSERT DATA { GRAPH <g1> {
        <a> <p> "one" . r:b <p> "two" . <a> <p> "dup" . <a> <p> "dup" .
      } }""")
    val subs = engine.select("""
      SELECT ?s FROM <http://ex.org/dir/g1> WHERE { ?s ?p ?o } ORDER BY ?s""")
      .collect().map(_.getString(0)).distinct.toSeq
    assert(subs == Seq("http://ex.org/dir/a", "http://ex.org/dir/rel/b"))
    // REDUCED eliminates duplicate rows (conformant: may ⇒ does)
    val red = engine.select("""
      SELECT REDUCED ?o FROM <http://ex.org/dir/g1>
      WHERE { <http://ex.org/dir/a> ?p ?o } ORDER BY ?o""")
      .collect().map(_.getString(0)).toSeq
    assert(red == Seq("dup", "one"))
    // DELETE WHERE shorthand: pattern is both template and WHERE
    engine.update("""
      DELETE WHERE { GRAPH <http://ex.org/dir/g1> { ?s ?p "dup" } }""")
    val left = engine.select("""
      SELECT ?o FROM <http://ex.org/dir/g1> WHERE { ?s ?p ?o } ORDER BY ?o""")
      .collect().map(_.getString(0)).toSeq
    assert(left == Seq("one", "two"))
  }

  test("INSERT DATA / CLEAR / DROP forms") {
    val InsertData(quads) = SparqlParser.parse(s"""
      PREFIX ex: <http://ex/>
      INSERT DATA {
        GRAPH <http://ex/g> {
          ex:s ex:p ex:o .
          ex:s ex:q "lit"@en .
          ex:s ex:r "42"^^<${Quad.xsd.integer}> .
        }
      }"""): @unchecked
    assert(quads.size == 3)
    assert(quads(1).o_lang == "en")
    assert(quads(2).o_type == Quad.xsd.integer)

    val ClearGraphOp(g1, s1) = SparqlParser.parse(
      "CLEAR SILENT GRAPH <http://ex/g>"): @unchecked
    assert(g1 == "http://ex/g" && s1)
    val DropGraphOp(g2, s2) = SparqlParser.parse(
      "DROP GRAPH <http://ex/g>"): @unchecked
    assert(g2 == "http://ex/g" && !s2)

    // §3.2.2-3 scope forms, CLEAR and DROP alike
    val ClearScopeOp(sc1, sl1) = SparqlParser.parse("CLEAR SILENT ALL"): @unchecked
    assert(sc1 == "ALL" && sl1)
    val ClearScopeOp(sc2, _) = SparqlParser.parse("DROP NAMED"): @unchecked
    assert(sc2 == "NAMED")
    val ClearScopeOp(sc3, _) = SparqlParser.parse("CLEAR DEFAULT"): @unchecked
    assert(sc3 == "DEFAULT")
  }

  test("quad templates: variable/mixed graphs generalize, constants stay legacy") {
    // constant single graph → legacy InsertWhere (partition-scoped path)
    val InsertWhere(legacy) = SparqlParser.parse("""
      INSERT { GRAPH <http://ex/g> { ?s <http://ex/p> ?o } }
      USING <http://ex/src> WHERE { ?s <http://ex/q> ?o }"""): @unchecked
    assert(legacy.targetGraph == "http://ex/g")

    // variable graph → QuadModifyWhere with a V graph term
    val QuadModifyWhere(del1, ins1, using1, _, _) = SparqlParser.parse("""
      INSERT { GRAPH ?g { ?s <http://ex/p> ?o } }
      USING <http://ex/src>
      WHERE { ?s <http://ex/q> ?o . BIND(URI('http://ex/t') AS ?g) }"""): @unchecked
    assert(del1.isEmpty && ins1.size == 1 && using1 == Seq("http://ex/src"))
    assert(ins1.head._1 == Algebra.V("g"))

    // mixed graphs in one template → generalized form, both targets kept
    val QuadModifyWhere(_, ins2, _, _, _) = SparqlParser.parse("""
      INSERT { GRAPH <http://ex/a> { ?s <http://ex/p> ?o }
               GRAPH <http://ex/b> { ?s <http://ex/q> ?o } }
      WHERE { ?s <http://ex/r> ?o }"""): @unchecked
    assert(ins2.map(_._1).distinct ==
      Seq(Algebra.I("http://ex/a"), Algebra.I("http://ex/b")))

    // DELETE WHERE shorthand with ?g: template quads double as
    // GRAPH-scoped patterns
    val QuadModifyWhere(del3, ins3, _, where3, _) = SparqlParser.parse("""
      DELETE WHERE { GRAPH ?g { ?s <http://ex/p> "x" } }"""): @unchecked
    assert(ins3.isEmpty && del3.size == 1)
    val Algebra.GraphE(gv, _) = where3.elems.head: @unchecked
    assert(gv == Algebra.V("g"))

    // bare triples without WITH now target the default graph (§3.1.3)
    val InsertWhere(bare) = SparqlParser.parse("""
      INSERT { ?s <http://ex/p> ?o } WHERE { ?s <http://ex/q> ?o }"""): @unchecked
    assert(bare.targetGraph == Quad.DefaultGraph)
  }

  test("update request: `;`-separated operations share one prologue scope") {
    val ops = SparqlParser.parseRequest(s"""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> { ex:s ex:p ex:o } } ;
      # comment between operations
      PREFIX ex: <http://ex2/>
      DELETE WHERE { GRAPH <http://ex/g> { ?s ex:p ?o } } ;
      CLEAR GRAPH <http://ex/g> ;
      """)
    assert(ops.size == 3)
    val InsertData(quads) = ops(0): @unchecked
    assert(quads.head.p == "http://ex/p")
    // the re-declared ex: prefix (later wins) governs op 2's pattern
    val DeleteWhere(q) = ops(1): @unchecked
    val Algebra.Pat(tp) = q.where.elems.head: @unchecked
    assert(tp.p == Algebra.I("http://ex2/p"))
    val ClearGraphOp(g, _) = ops(2): @unchecked
    assert(g == "http://ex/g")

    // prologue-only and empty requests are legal no-ops
    assert(SparqlParser.parseRequest("PREFIX ex: <http://ex/>").isEmpty)
    assert(SparqlParser.parseRequest("  # nothing\n").isEmpty)

    // junk between operations fails loudly
    val e = intercept[IllegalArgumentException] {
      SparqlParser.parseRequest(
        "CLEAR GRAPH <http://ex/g> CLEAR GRAPH <http://ex/h>")
    }
    assert(e.getMessage.contains("';'"))
  }

  test("unterminated string literal fails fast instead of hanging") {
    val e = intercept[IllegalArgumentException] {
      SparqlParser.parse(
        """INSERT DATA { GRAPH <http://ex/g> { <http://ex/s> <http://ex/p> "unterminated } }""")
    }
    assert(e.getMessage.contains("unterminated"))
  }

  test("a user variable named ?id survives compilation") {
    val text = s"""
      PREFIX src: <$source>  PREFIX ex: <http://ex/>
      WITH <http://ex/out>
      INSERT { ?s ex:ident ?id }
      USING <${gTlUsers}>
      WHERE {
        ?s src:id ?id .
        BIND (URI(CONCAT('http://ex/x/', ?id)) AS ?ss)
      }"""
    val InsertWhere(q) = SparqlParser.parse(text): @unchecked
    val out = Compiler.run(q, store.readGraphs(q.usingGraphs)).collect()
    assert(out.map(_.getString(3)).toSet == Set("u-1", "u-2"))
  }

  test("GraphEngine executes updates end-to-end") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("eng").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:name "Alpha" . ex:b ex:name "Beta" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/out>
      INSERT { ?s ex:upper ?u }
      USING <http://ex/src>
      WHERE { ?s ex:name ?n . BIND (URI(CONCAT('http://ex/u/', ?n)) AS ?u) }""")
    assert(st.countGraph("http://ex/out") == 2)
    engine.update("CLEAR SILENT GRAPH <http://ex/out>")
    assert(st.countGraph("http://ex/out") == 0)
  }

  test("UNION merges branch bindings; branch-only vars are unbound") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("uni").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:mail "a@x" . ex:b ex:tel "123" . } }""")
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?contact ?kind FROM <http://ex/src>
      WHERE {
        { ?s ex:mail ?contact . BIND ('mail' AS ?kind) }
        UNION
        { ?s ex:tel ?contact . BIND ('tel' AS ?kind) }
      } ORDER BY ?kind""").collect()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("a@x", "mail"), ("123", "tel")))
  }

  test("MINUS removes join-compatible bindings; VALUES constrains inline") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("min").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:type "good" . ex:b ex:type "good" . ex:c ex:type "bad" .
        ex:b ex:flag "x" . } }""")
    // good-typed subjects minus flagged ones
    val minus = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/g>
      WHERE { ?s ex:type "good" .
              MINUS { ?s ex:flag ?f } } ORDER BY ?s""")
      .collect().map(_.getString(0))
    assert(minus.toSeq == Seq("http://ex/a"))
    // VALUES restricts ?t to an inline set
    val vals = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?t FROM <http://ex/g>
      WHERE { ?s ex:type ?t . VALUES ?t { 'bad' } } ORDER BY ?s""")
      .collect().map(_.getString(0))
    assert(vals.toSeq == Seq("http://ex/c"))
    // multi-var VALUES: each row constrains the pair jointly; UNDEF
    // leaves that var unconstrained in its row
    val pairs = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?t FROM <http://ex/g>
      WHERE { ?s ex:type ?t .
              VALUES (?s ?t) { (ex:a 'good') (ex:c UNDEF) } } ORDER BY ?s""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq ==
      Seq(("http://ex/a", "good"), ("http://ex/c", "bad")))
  }

  test("USING NAMED scopes GRAPH patterns in updates") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("usingnamed").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g1> { ex:a ex:p "1" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g2> { ex:b ex:p "2" . } }""")
    // GRAPH ?g in the WHERE ranges over USING NAMED (g2) only
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT { GRAPH <http://ex/out> { ?s ex:copied ?v } }
      USING NAMED <http://ex/g2>
      WHERE { GRAPH ?g { ?s ex:p ?v } }""")
    val out = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?v FROM <http://ex/out>
      WHERE { ?s ex:copied ?v }""").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("http://ex/b", "2")))
  }

  test("DELETE DATA and DELETE..WHERE remove quads; others survive") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("del").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:name "Alpha" . ex:b ex:name "Beta" .
        ex:c ex:name "Ceta" .  ex:a ex:keep "yes" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      DELETE DATA { GRAPH <http://ex/g> { ex:b ex:name "Beta" . } }""")
    assert(st.countGraph("http://ex/g") == 3)
    // delete every name NOT starting with 'A', keep other predicates
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/g>
      DELETE { ?s ex:name ?n }
      USING <http://ex/g>
      WHERE { ?s ex:name ?n .
              FILTER (STRSTARTS(?n, 'C')) }""")
    val left = st.readGraphs(Seq("http://ex/g")).collect()
      .map(r => (r.getAs[String]("s"), r.getAs[String]("o_value"))).toSet
    assert(left == Set(("http://ex/a", "Alpha"), ("http://ex/a", "yes")))
  }

  test("SELECT parses projection, DISTINCT, FROM, ORDER BY, LIMIT") {
    val q = SparqlParser.parseSelect("""
      PREFIX ex: <http://ex/>
      SELECT DISTINCT ?a ?b FROM <http://ex/g1> FROM <http://ex/g2>
      WHERE { ?a ex:p ?b . FILTER (STRSTARTS(?b, 'x')) }
      ORDER BY ?b ?a LIMIT 7""")
    assert(q.vars == Seq("a", "b") && q.distinct)
    assert(q.fromGraphs == Seq("http://ex/g1", "http://ex/g2"))
    assert(q.orderBy == Seq(Algebra.OrderKey("b", asc = true),
      Algebra.OrderKey("a", asc = true)) && q.limit.contains(7))
  }

  test("SELECT aggregates: GROUP BY / HAVING / DESC / OFFSET / ASK / CONSTRUCT") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("aggq").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:cat "x" . ex:a ex:score "10"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:b ex:cat "x" . ex:b ex:score "4"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:c ex:cat "y" . ex:c ex:score "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:d ex:cat "z" . ex:d ex:score "1"^^<http://www.w3.org/2001/XMLSchema#integer> . } }""")
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?cat (COUNT(*) AS ?n) (SUM(?sc) AS ?total) (MAX(?sc) AS ?hi)
      FROM <http://ex/src>
      WHERE { ?s ex:cat ?cat ; ex:score ?sc }
      GROUP BY ?cat
      HAVING (?total > 5)
      ORDER BY DESC(?total)""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSeq == Seq(("x", 2L, 14.0, "4"), ("y", 1L, 7.0, "7")))
    // ungrouped aggregate + COUNT(DISTINCT)
    val one = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT (COUNT(DISTINCT ?cat) AS ?cats) (AVG(?sc) AS ?mean)
      FROM <http://ex/src>
      WHERE { ?s ex:cat ?cat ; ex:score ?sc }""").collect().head
    assert(one.getLong(0) == 3L && one.getDouble(1) == 5.5)
    // OFFSET pages past the first result
    val page = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/src>
      WHERE { ?s ex:score ?sc }
      ORDER BY ?s LIMIT 2 OFFSET 1""").collect().map(_.getString(0))
    assert(page.toSeq == Seq("http://ex/b", "http://ex/c"))
    // ASK short-circuits to a boolean
    assert(engine.ask("""
      PREFIX ex: <http://ex/>
      ASK FROM <http://ex/src> { ?s ex:cat "y" }"""))
    assert(!engine.ask("""
      PREFIX ex: <http://ex/>
      ASK FROM <http://ex/src> { ?s ex:cat "nope" }"""))
    // CONSTRUCT instantiates a template as a graph value
    val g = engine.construct("""
      PREFIX ex: <http://ex/>
      CONSTRUCT { ?s ex:grade ?sc }
      FROM <http://ex/src>
      WHERE { ?s ex:cat "x" ; ex:score ?sc }""").collect()
    assert(g.length == 2 && g.forall(_.getAs[String]("p") == "http://ex/grade"))
  }

  test("GraphEngine SELECT answers over the store with FROM scoping") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("sel").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:name "Alpha" . ex:a ex:score "10"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:b ex:name "Beta" .  ex:b ex:score "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:c ex:name "Alpha" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/other> { ex:z ex:name "Zeta" . } }""")
    // FROM scopes to src: Zeta invisible; DISTINCT collapses dup names
    val names = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT DISTINCT ?n FROM <http://ex/src>
      WHERE { ?s ex:name ?n } ORDER BY ?n""").collect().map(_.getString(0))
    assert(names.toSeq == Seq("Alpha", "Beta"))
    // BGP join + FILTER + projection order
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?n ?sc FROM <http://ex/src>
      WHERE { ?s ex:name ?n ; ex:score ?sc .
              FILTER (STRSTARTS(?n, 'A')) } ORDER BY ?n""").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "Alpha" && rows.head.getString(1) == "10")
    // SELECT * projects every bound variable, name-sorted
    val star = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT * FROM <http://ex/src>
      WHERE { ?s ex:score ?sc } ORDER BY ?sc LIMIT 1""")
    assert(star.columns.toSeq == Seq("s", "sc"))
    assert(star.collect().head.getString(1) == "10")
  }

  test("property paths: sequence, inverse, alternative, closure") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("paths").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:knows ex:b . ex:b ex:knows ex:c . ex:c ex:knows ex:d .
        ex:a ex:worksAt ex:acme . ex:acme ex:in ex:gent .
        ex:z ex:likes ex:gent . } }""")
    // sequence: one fresh join var per hop
    val seq = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?city FROM <http://ex/g>
      WHERE { ?p ex:worksAt/ex:in ?city }""").collect().map(_.getString(0))
    assert(seq.toSeq == Seq("http://ex/gent"))
    // inverse flips the hop; alternative compiles to UNION
    val inv = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?who FROM <http://ex/g>
      WHERE { ex:gent (^ex:in/^ex:worksAt)|^ex:likes ?who } ORDER BY ?who""")
      .collect().map(_.getString(0))
    assert(inv.toSeq == Seq("http://ex/a", "http://ex/z"))
    // + closure reaches every hop count >= 1, from a constant subject
    val plus = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?x FROM <http://ex/g>
      WHERE { ex:a ex:knows+ ?x } ORDER BY ?x""").collect().map(_.getString(0))
    assert(plus.toSeq == Seq("http://ex/b", "http://ex/c", "http://ex/d"))
    // closure joins with surrounding patterns through its endpoints
    val mid = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?x FROM <http://ex/g>
      WHERE { ?x ex:knows+ ex:d . ?x ex:worksAt ?w }""").collect().map(_.getString(0))
    assert(mid.toSeq == Seq("http://ex/a"))
    // * includes the zero-length path: the constant subject itself joins in
    val star = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?x FROM <http://ex/g>
      WHERE { ex:a ex:knows* ?x } ORDER BY ?x""").collect().map(_.getString(0))
    assert(star.toSeq ==
      Seq("http://ex/a", "http://ex/b", "http://ex/c", "http://ex/d"))
    // ? is exactly {0,1} hops — no transitive reach, but the identity stays
    val zeroOne = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?x FROM <http://ex/g>
      WHERE { ex:a ex:knows? ?x } ORDER BY ?x""").collect().map(_.getString(0))
    assert(zeroOne.toSeq == Seq("http://ex/a", "http://ex/b"))
    // negated property set: any forward edge except ex:knows
    val neg = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?x FROM <http://ex/g>
      WHERE { ex:a !ex:knows ?x }""").collect().map(_.getString(0))
    assert(neg.toSeq == Seq("http://ex/acme"))
    // a mixed set unions the inverted edge: predicates INTO ex:gent
    // except ^ex:likes (acme ex:in gent survives, z ex:likes gent not)
    val negInv = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?x FROM <http://ex/g>
      WHERE { ex:gent !(ex:nosuch|^ex:likes) ?x }""").collect().map(_.getString(0))
    assert(negInv.toSeq == Seq("http://ex/acme"))
  }

  test("closure inside GRAPH ?g binds the graph and stays per-graph") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("gpaths").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA {
        GRAPH <http://ex/g1> { ex:a ex:knows ex:b . ex:b ex:knows ex:c . }
        GRAPH <http://ex/g2> { ex:c ex:knows ex:d . } }""")
    // reachability must NOT leap the graph boundary: a→b→c lives in g1,
    // c→d in g2, so a + closure never reaches d, and ?g is bound
    val plus = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?g ?x WHERE { GRAPH ?g { ex:a ex:knows+ ?x } } ORDER BY ?x""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(plus.toSeq == Seq(
      ("http://ex/g1", "http://ex/b"),
      ("http://ex/g1", "http://ex/c")))
    // zero-length identity: the constant subject pairs with EVERY named
    // graph in scope (a matches its own zero-length path in each)
    val star = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?g ?x WHERE { GRAPH ?g { ex:c ex:knows* ?x } } ORDER BY ?g ?x""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(star.toSeq == Seq(
      ("http://ex/g1", "http://ex/c"),
      ("http://ex/g2", "http://ex/c"),
      ("http://ex/g2", "http://ex/d")))
  }

  test("trailing VALUES joins after grouping in aggregate queries") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("tvagg").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:kind "x" . ex:b ex:kind "x" . ex:c ex:kind "y" .
        ex:d ex:kind "z" . } }""")
    // the data block filters the GROUPED solutions (x and z survive the
    // VALUES join; y does not) — §18.2.4.3 joins after grouping/HAVING
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?k (COUNT(*) AS ?n) FROM <http://ex/g>
      WHERE { ?s ex:kind ?k } GROUP BY ?k ORDER BY ?k
      VALUES ?k { "x" "z" }""").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("x", 2L), ("z", 1L)))
    // UNDEF row: compatible with every group
    val all = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?k (COUNT(*) AS ?n) FROM <http://ex/g>
      WHERE { ?s ex:kind ?k } GROUP BY ?k ORDER BY ?k
      VALUES ?k { UNDEF }""").collect().map(_.getString(0))
    assert(all.toSeq == Seq("x", "y", "z"))
  }

  test("VALUES with an empty row list is the empty table, not a crash") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("emptyvals").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> { ex:a ex:name "A" . } }""")
    val out = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?v FROM <http://ex/g>
      WHERE { ?s ex:name ?n . VALUES ?v { } }""")
    assert(out.columns.toSeq == Seq("s", "v"))
    assert(out.count() == 0)
  }

  test("DELETE/INSERT WHERE: one pre-state evaluation feeds both templates") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("modify").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:status "old" . ex:b ex:status "old" . ex:c ex:status "keep" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/g>
      DELETE { ?s ex:status "old" }
      INSERT { ?s ex:status "new" ; ex:migrated "true" }
      USING <http://ex/g>
      WHERE { ?s ex:status "old" }""")
    val got = st.readGraphs(Seq("http://ex/g")).collect()
      .map(q => (q.getAs[String]("s"), q.getAs[String]("p"), q.getAs[String]("o_value")))
      .toSet
    assert(got == Set(
      ("http://ex/a", "http://ex/status", "new"),
      ("http://ex/a", "http://ex/migrated", "true"),
      ("http://ex/b", "http://ex/status", "new"),
      ("http://ex/b", "http://ex/migrated", "true"),
      ("http://ex/c", "http://ex/status", "keep")))
  }

  test("DESCRIBE returns the IRI's triples plus blank-node closure") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("descr").toString + "/quads")
    val engine = new GraphEngine(st)
    val g = "http://ex/g"
    st.insertData(Seq(
      Quad.lit(g, "http://ex/org", "http://ex/name", "Org"),
      Quad(g, "http://ex/org", "http://ex/contact", "_:c1", null, null, Quad.KindBnode),
      Quad.lit(g, "_:c1", "http://ex/email", "o@x"),
      Quad.lit(g, "http://ex/other", "http://ex/name", "Other")))
    val d = engine.describe("DESCRIBE <http://ex/org> FROM <http://ex/g>")
      .collect().map(r => (r.getAs[String]("s"), r.getAs[String]("p")))
    // own triples (name + contact link) and the bnode's email triple;
    // ex:other is not part of the description
    assert(d.length == 3)
    assert(d.count(_._1 == "http://ex/org") == 2)
    assert(d.exists(t => t._1.startsWith("_:") && t._2 == "http://ex/email"))
    // variable form: describe every match of the WHERE group
    val dv = engine.describe("""
      PREFIX ex: <http://ex/>
      DESCRIBE ?x FROM <http://ex/g>
      WHERE { ?x ex:name ?n }""")
      .collect().map(_.getAs[String]("s"))
    // org (2 triples) + other (1) + org's bnode closure (1)
    assert(dv.length == 4)
    assert(dv.count(_ == "http://ex/other") == 1)
  }

  test("subquery: aggregated { SELECT } joins into the outer group") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("subq").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:cat "x" . ex:b ex:cat "x" . ex:c ex:cat "y" . } }""")
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?n FROM <http://ex/g>
      WHERE {
        ?s ex:cat ?cat .
        { SELECT ?cat (COUNT(*) AS ?n) WHERE { ?x ex:cat ?cat } GROUP BY ?cat }
      }
      ORDER BY ?s""").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(
      ("http://ex/a", "2"), ("http://ex/b", "2"), ("http://ex/c", "1")))
    // numeric FILTER over the subquery's typed-literal count
    val big = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/g>
      WHERE {
        ?s ex:cat ?cat .
        { SELECT ?cat (COUNT(*) AS ?n) WHERE { ?x ex:cat ?cat } GROUP BY ?cat }
        FILTER (?n >= 2)
      } ORDER BY ?s""").collect().map(_.getString(0))
    assert(big.toSeq == Seq("http://ex/a", "http://ex/b"))
  }

  test("string/numeric builtins: UCASE SUBSTR STRBEFORE COALESCE ROUND") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("fns").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:name "alpha - one" . ex:a ex:score "2.6"^^<http://www.w3.org/2001/XMLSchema#double> . } }""")
    val r = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?u ?sub ?before ?co ?rnd ?fl FROM <http://ex/g>
      WHERE {
        ?s ex:name ?n ; ex:score ?sc .
        OPTIONAL { ?s ex:missing ?m }
        BIND (UCASE(?n) AS ?u)
        BIND (SUBSTR(?n, 1, 5) AS ?sub)
        BIND (STRBEFORE(?n, ' - ') AS ?before)
        BIND (COALESCE(?m, ?n) AS ?co)
        BIND (ROUND(?sc) AS ?rnd)
        BIND (FLOOR(?sc) AS ?fl)
      }""").collect().head
    assert(r.getString(0) == "ALPHA - ONE")
    assert(r.getString(1) == "alpha")
    assert(r.getString(2) == "alpha")
    assert(r.getString(3) == "alpha - one") // ?m unbound → coalesce falls through
    assert(r.getString(4) == "3.0")
    assert(r.getString(5) == "2.0")
  }

  test("FILTER EXISTS / NOT EXISTS compile to semi/anti joins") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("exq").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:cat "x" . ex:b ex:cat "y" .
        ex:a ex:flag "1" . } }""")
    val has = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/g>
      WHERE { ?s ex:cat ?c . FILTER EXISTS { ?s ex:flag ?f } }""")
      .collect().map(_.getString(0))
    assert(has.toSeq == Seq("http://ex/a"))
    val hasNot = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/g>
      WHERE { ?s ex:cat ?c . FILTER NOT EXISTS { ?s ex:flag ?f } }""")
      .collect().map(_.getString(0))
    assert(hasNot.toSeq == Seq("http://ex/b"))
    // !EXISTS via the unary operator normalizes to the anti join too
    val bang = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/g>
      WHERE { ?s ex:cat ?c . FILTER (!EXISTS { ?s ex:flag ?f }) }""")
      .collect().map(_.getString(0))
    assert(bang.toSeq == Seq("http://ex/b"))
  }

  test("GRAPH patterns: constant scoping and variable binding") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("graphpat").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g1> { ex:a ex:p "1" . ex:b ex:p "2" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g2> { ex:a ex:p "3" . } }""")
    // constant GRAPH scopes the inner group to one partition
    val g1 = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?v WHERE { GRAPH <http://ex/g1> { ex:a ex:p ?v } }""")
      .collect().map(_.getString(0))
    assert(g1.toSeq == Seq("1"))
    // variable GRAPH binds the graph per solution
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?g ?v WHERE { GRAPH ?g { ex:a ex:p ?v } } ORDER BY ?g""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("http://ex/g1", "1"), ("http://ex/g2", "3")))
    // joins inside GRAPH ?g stay graph-aligned: ex:a and ex:b share a
    // graph only in g1
    val joined = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?g WHERE { GRAPH ?g { ex:a ex:p ?x . ex:b ex:p ?y } }""")
      .collect().map(_.getString(0))
    assert(joined.toSeq == Seq("http://ex/g1"))
    // FROM NAMED restricts what GRAPH ?g ranges over (§13.2)
    val named = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?g ?v FROM NAMED <http://ex/g2>
      WHERE { GRAPH ?g { ex:a ex:p ?v } }""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(named.toSeq == Seq(("http://ex/g2", "3")))
    // a dataset with FROM but no FROM NAMED gives GRAPH nothing to match
    val fromOnly = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?g ?v FROM <http://ex/g1>
      WHERE { GRAPH ?g { ex:a ex:p ?v } }""").collect()
    assert(fromOnly.isEmpty)
    // both clauses: patterns outside GRAPH read FROM, inside read NAMED
    val both = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?v ?w FROM <http://ex/g1> FROM NAMED <http://ex/g2>
      WHERE { ex:a ex:p ?v . GRAPH ?g { ex:a ex:p ?w } } ORDER BY ?v""")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(both.toSeq == Seq(("1", "3")))
  }

  test("SELECT (expr AS ?v) projection expressions") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("pexpr").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:name "alpha" . ex:a ex:score "10" .
        ex:b ex:name "beta" . ex:b ex:score "32" . } }""")
    // plain expression projection alongside a variable
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?n (UCASE(?n) AS ?up) (?sc + 5 AS ?bumped)
      FROM <http://ex/g>
      WHERE { ?s ex:name ?n ; ex:score ?sc } ORDER BY ?n""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("alpha", "ALPHA", "15.0"), ("beta", "BETA", "37.0")))
    // grouped query: expression over the grouped var
    val grouped = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT (UCASE(?n) AS ?label) (COUNT(*) AS ?c)
      FROM <http://ex/g>
      WHERE { ?s ex:name ?n }
      GROUP BY ?n ORDER BY ?label""")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grouped.toSeq == Seq(("ALPHA", 1L), ("BETA", 1L)))
  }

  test("CONSTRUCT WHERE shorthand reuses the pattern as the template") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("cw").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:name "Alpha" . ex:b ex:name "Beta" . ex:b ex:size "2" . } }""")
    val out = engine.construct("""
      PREFIX ex: <http://ex/>
      CONSTRUCT FROM <http://ex/g> WHERE { ?s ex:name ?n }""")
      .select("s", "o_value").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(("http://ex/a", "Alpha"), ("http://ex/b", "Beta")))
  }

  test("§17 expression grammar: precedence, IN, REGEX, arithmetic") {
    import Algebra._
    def filterOf(text: String): Expr = {
      val q = SparqlParser.parseSelect(
        s"SELECT ?x WHERE { ?x <p> ?y . FILTER ($text) }")
      q.where.elems.collectFirst { case FilterE(e) => e }.get
    }
    // || binds looser than &&, comparisons looser than + and *
    assert(filterOf("?a > 5 && ?b < 3 || ?c = 'x'") ==
      OrE(AndE(CmpE(">", VarRef("a"), NumLit("5")),
               CmpE("<", VarRef("b"), NumLit("3"))),
          CmpE("=", VarRef("c"), StrLit("x"))))
    assert(filterOf("?a + 2 * ?b >= 10") ==
      CmpE(">=", ArithE("+", VarRef("a"), ArithE("*", NumLit("2"), VarRef("b"))),
        NumLit("10")))
    // brackets override precedence; unary ! and negative literals
    assert(filterOf("(?a + 2) * 3 != -1.5") ==
      CmpE("!=", ArithE("*", ArithE("+", VarRef("a"), NumLit("2")), NumLit("3")),
        NumLit("-1.5")))
    assert(filterOf("!BOUND(?a) || !(?b = 1)") ==
      OrE(NotE(BoundE("a")), NotE(CmpE("=", VarRef("b"), NumLit("1")))))
    assert(filterOf("?s IN ('a', 'b') && ?t NOT IN (1, 2)") ==
      AndE(InE(VarRef("s"), Seq(StrLit("a"), StrLit("b")), negated = false),
           InE(VarRef("t"), Seq(NumLit("1"), NumLit("2")), negated = true)))
    assert(filterOf("REGEX(?n, '^A', 'i') && CONTAINS(?n, 'x') && STRENDS(?n, 'z')") ==
      AndE(AndE(RegexE(VarRef("n"), "^A", "i"), ContainsE(VarRef("n"), StrLit("x"))),
           StrEndsE(VarRef("n"), StrLit("z"))))
    assert(filterOf("ISIRI(?x) && ISLITERAL(?y) && !ISBLANK(?z)") ==
      AndE(AndE(IsIriE(VarRef("x")), IsLiteralE(VarRef("y"))),
           NotE(IsBlankE(VarRef("z")))))
    // IRI constants (angle-bracket and prefixed) in expression position
    val dtq = SparqlParser.parseSelect("""
      PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
      SELECT ?x WHERE { ?x <p> ?y . FILTER (DATATYPE(?y) = xsd:integer) }""")
    assert(dtq.where.elems.collectFirst { case FilterE(e) => e }.get ==
      CmpE("=", DatatypeE(VarRef("y")),
        UriE(StrLit("http://www.w3.org/2001/XMLSchema#integer"))))
    assert(filterOf("STRLEN(STR(?x)) + LANG(?y) = 3") ==
      CmpE("=", ArithE("+", StrLenE(StrE(VarRef("x"))), LangE(VarRef("y"))),
        NumLit("3")))
  }

  test("numeric FILTER + arithmetic BIND evaluate over the store") {
    val st = new graft.model.GraphStore(spark,
      Files.createTempDirectory("fexpr").toString + "/quads")
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/src> {
        ex:a ex:score "10"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:b ex:score "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:c ex:score "oops" . } }""")
    // numeric promotion: ?sc cast to double; "oops" → null → dropped
    val rows = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s ?d FROM <http://ex/src>
      WHERE { ?s ex:score ?sc .
              FILTER (?sc * 2 > 15 && ?sc IN (7, 10, 99))
              BIND (?sc * 10 - 1 AS ?d) } ORDER BY ?s""").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("http://ex/a", "99.0")))
    // NOT IN keeps the non-numeric row out too (type error = unbound)
    val notIn = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?s FROM <http://ex/src>
      WHERE { ?s ex:score ?sc . FILTER (?sc NOT IN (10)) } ORDER BY ?s""")
      .collect().map(_.getString(0))
    assert(notIn.toSeq == Seq("http://ex/b"))
  }
}
