package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.JsonFlattener
import graft.model.{GraphStore, Quad}
import graft.rdf.NTriples
import graft.util.Tables

/** Driver-visible query entries exercising the RDF path (SURVEY.md §2.1–2.2)
  * against the synthetic tables: the JSON→quads flattener (T1), N-Triples
  * round-trip (S4/S5), and the partitioned GraphStore (S6/S9, Q13).
  *
  * `events.props` is the schema-less JSON input; the DuckDB oracles
  * re-derive the same facts with JSON SQL functions.
  */
object RdfOps {

  private val ns = "http://localhost/"
  private val graph = "https://data.example.org/graph/events"

  private def propQuads(s: SparkSession, d: String) =
    JsonFlattener.flatten(Tables.events(s, d), "props", graph, ns)

  /** Read-only staging store (events flattened to quads), built once per
    * (session, sfDir) and shared by every read-side SPARQL query — the
    * flatten+write would otherwise repeat identically per query. Queries
    * that MUTATE a store (mapping_scale, delete, mor) build their own. */
  private val eventStoreGraph = "https://data.example.org/graph/events_rdf"
  // keyed by session UUID (not the SparkSession itself — that would pin
  // the session for the process lifetime); store dirs are registered for
  // JVM-exit deletion so repeated runs don't accumulate tmp data
  private val eventStoreCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), GraphStore]
  private def eventStore(s: SparkSession, d: String): GraphStore =
    eventStoreCache.computeIfAbsent((System.identityHashCode(s), d), { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-evstore-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new GraphStore(s, dir)
      val docs = Tables.events(s, d).select(to_json(struct(
        col("event_type"), col("user_id"), col("event_id"))).as("json"))
      store.append(JsonFlattener.flatten(docs, "json", eventStoreGraph, ns).toDF())
      store
    })

  /** owl:sameAs canonicalization of a quad set: connected components
    * over the (symmetric, transitive) sameAs graph pick one canonical
    * IRI per identity cluster — the lexicographic min, the same rep
    * rule the dedup family uses — and every fact is rewritten onto it:
    * subjects always, objects only when iri-kind (a literal colliding
    * textually with a mapped IRI must NOT be rewritten). The sameAs
    * statements themselves are consumed. Scale shape: CC is the
    * large-star/small-star alternation (O(log² n) rounds regardless of
    * chain length — `graph_components_ls`'s machinery); the rewrite is
    * two equi-joins against the component map — broadcast, because the
    * identity-cluster map is bounded by the sameAs statement count,
    * ≪ the fact count in any real KG (at 100 TB with a fact-scale
    * alias set, drop the hint and let AQE pick the shuffle join) —
    * plus a set-semantics distinct.
    * Reference anchor: the reference mints one deterministic MD5 IRI
    * per source record (load_knowledge_graph.py:386-508) precisely so
    * cross-source aliases collapse at mint time; this is the general
    * alias-collapse for graphs that assert identity post-hoc with
    * owl:sameAs instead. */
  private[ops] def sameAsCanonicalize(facts: DataFrame, sameAs: DataFrame)
      : DataFrame = {
    val comp = GraphAlgos.componentsLargeSmallStar(
      sameAs.select(col("s").as("i"), col("o_value").as("j")))
    val repS = broadcast(comp
      .select(col("doc_id").as("s"), col("cluster_rep").as("cs")))
    val repO = broadcast(comp
      .select(col("doc_id").as("o_value"), col("cluster_rep").as("co")))
    facts.join(repS, Seq("s"), "left")
      .join(repO, Seq("o_value"), "left")
      .select(
        coalesce(col("cs"), col("s")).as("s"),
        col("p"),
        when(col("o_kind") === "iri", coalesce(col("co"), col("o_value")))
          .otherwise(col("o_value")).as("o_value"),
        col("o_kind"))
      .distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T1: direct mapping — predicate IRIs minted from JSON keys
    "rdf_flatten_predicates" -> ((s, d) => {
      propQuads(s, d).toDF()
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("p"))
    }),

    // T1: typed-literal values survive flattening (xsd:integer)
    "rdf_flatten_typed_values" -> ((s, d) => {
      propQuads(s, d).toDF()
        .filter(col("p") === ns + "k" && col("o_type") === Quad.xsd.integer)
        .agg(round(avg(col("o_value").cast("long")), 4).as("avg_k"),
          max(col("o_value").cast("long")).as("max_k"),
          count(lit(1)).as("n"))
    }),

    // S5 + S4: serialize to N-Triples lines, parse back, count survivors
    "rdf_ntriples_roundtrip" -> ((s, d) => {
      import s.implicits._
      val lines = NTriples.toLines(propQuads(s, d).toDF()).as[String]
      val back = lines.mapPartitions(
        _.flatMap(l => Option(NTriples.parseLine(l, graph))))
      back.toDF()
        .agg(count(lit(1)).as("n_quads"),
          countDistinct(col("s")).as("n_subjects"))
    }),

    // S4/S5 HexTuples (rdflib's `hext` NDJSON format): serialize the
    // flattened event quads and parse them back — both directions pure
    // column expressions (to_json / from_json), no per-line parser.
    // n_typed proves the datatype survives the xsd-marker roundtrip.
    "rdf_hextuples_roundtrip" -> ((s, d) => {
      import s.implicits._
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-hext-${System.nanoTime()}.hext"
      graft.util.TempDirs.deleteOnExit(dir)
      graft.rdf.RdfIO.write(propQuads(s, d).toDF(), dir)
      graft.rdf.RdfIO.read(s, dir).toDF()
        .agg(count(lit(1)).as("n_quads"),
          countDistinct(col("s")).as("n_subjects"),
          count(col("o_type")).as("n_typed"))
    }),

    // S7/Q1-Q15: the full reference pipeline — ingest fixture sources,
    // run all 16 mapping queries, return the merged organizations graph.
    // Entry-point-B fidelity: when the reference checkout is present the
    // 14 VERBATIM .sparql files (+ rendered inline logo templates) are
    // parsed and drive the run, exactly as the reference posts query
    // files (`load_knowledge_graph.py:178-195`); the DSL transcriptions
    // are the fallback. VerbatimMappingSpec proves both paths emit
    // byte-identical graphs.
    "rdf_mapping_pipeline" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-kg-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = graft.queries.Fixtures.ingestAll(s, dir)
      val p = new graft.pipeline.Pipeline(store)
      graft.pipeline.ReferenceTexts.loadMappingTexts() match {
        case Some(texts) => p.runMappingsFromTexts(texts ++ Seq(
          "add_logo" -> graft.pipeline.ReferenceTexts.tlCompaniesLogoText(),
          "add_ldap_logo" -> graft.pipeline.ReferenceTexts.ldapLogoText()))
        case None => p.runMappings()
      }
      p.addProvenance("bench-run", "2026-01-01T00:00:00")
      store.readGraphs(Seq(graft.queries.ReferenceMappings.gOrganizations))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // The SAME reference pipeline on the merge-on-read backend: every
    // mapping INSERT lands as an O(delta) tombstone/insert batch append
    // instead of a merge-on-write partition rewrite — the write shape a
    // 100 TB store needs for a many-step update sequence. The output
    // graph must be quad-identical (shared oracle); MorStoreSpec pins
    // engine parity, this makes it driver-visible.
    "rdf_mapping_pipeline_mor" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-kgmor-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = graft.queries.Fixtures.ingestAllInto(
        new graft.model.MergeOnReadStore(s, dir))
      val p = new graft.pipeline.Pipeline(store)
      graft.pipeline.ReferenceTexts.loadMappingTexts() match {
        case Some(texts) => p.runMappingsFromTexts(texts ++ Seq(
          "add_logo" -> graft.pipeline.ReferenceTexts.tlCompaniesLogoText(),
          "add_ldap_logo" -> graft.pipeline.ReferenceTexts.ldapLogoText()))
        case None => p.runMappings()
      }
      p.addProvenance("bench-run", "2026-01-01T00:00:00")
      store.readGraphs(Seq(graft.queries.ReferenceMappings.gOrganizations))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // The SAME reference pipeline on the DICT-ENCODED backend (round
    // 10): the verbatim 16-mapping run — parse, compile, BGP joins,
    // OPTIONALs, BINDs, set-semantics merges — executes entirely in id
    // space (pattern joins over longs, constants as plan-time
    // dictionary lookups, decode at block boundaries), proving the
    // engine MODE carries the reference's real workload, not just the
    // parity battery. Output graph quad-identical — shared oracle.
    "rdf_mapping_pipeline_dict" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-kgdict-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = graft.queries.Fixtures.ingestAllInto(
        new graft.model.DictQuadStore(s, dir))
      val p = new graft.pipeline.Pipeline(store)
      graft.pipeline.ReferenceTexts.loadMappingTexts() match {
        case Some(texts) => p.runMappingsFromTexts(texts ++ Seq(
          "add_logo" -> graft.pipeline.ReferenceTexts.tlCompaniesLogoText(),
          "add_ldap_logo" -> graft.pipeline.ReferenceTexts.ldapLogoText()))
        case None => p.runMappings()
      }
      p.addProvenance("bench-run", "2026-01-01T00:00:00")
      store.readGraphs(Seq(graft.queries.ReferenceMappings.gOrganizations))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // Data-scale SPARQL mapping benchmark: flatten one JSON doc per
    // event (3 attributes) into a staging graph, then run a parsed
    // 3-pattern BGP + BIND + INSERT over it — mapping-path throughput
    // that grows with the scale factor (unlike the fixture pipeline).
    "rdf_mapping_scale" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-mapscale-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "https://data.example.org/graph/events_rdf"
      val docs = Tables.events(s, d).select(to_json(struct(
        col("event_type"), col("user_id"), col("event_id"))).as("json"))
      val store = new graft.model.GraphStore(s, dir)
      store.append(graft.ingest.JsonFlattener.flatten(docs, "json", g, ns).toDF())
      val engine = new graft.GraphEngine(store)
      engine.update(s"""
        PREFIX src: <$ns>
        PREFIX ex: <http://ex/>
        WITH <http://ex/user_activity>
        INSERT { ?u ex:did ?etype }
        USING <$g>
        WHERE {
          ?e src:event_type ?etype ;
             src:user_id ?uid ;
             src:event_id ?eid .
          BIND (URI(CONCAT('http://ex/user/', ?uid)) AS ?u)
        }""")
      store.readGraphs(Seq("http://ex/user_activity"))
        .orderBy(col("s"), col("o_value"))
    }),

    // S3: JSON file source → flattener (the mam_tenants ingestion path,
    // whole-document read). Writes its own temp input; blank-node labels
    // embed the partition id (varies with parallelism) so they are
    // normalized before the oracle hash-compare, like the Turtle/XML
    // source queries.
    "rdf_json_file_source" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-src")
      val f = dir.resolve("tenants.json")
      java.nio.file.Files.writeString(f,
        graft.queries.Fixtures.mamDoc.head)
      graft.sources.Sources.jsonFileToQuads(s, f.toString,
        "https://data.example.org/graph/tenants", ns).toDF()
        .select(col("graph"),
          regexp_replace(col("s"), "_:b[0-9-]+", "_:b").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:b[0-9-]+", "_:b").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("s"), col("p"))
    }),

    // S4b: Turtle file source — a fixture document written to a temp
    // file and read back through the document-scoped parser. Bnode
    // labels are normalized (per-document content-hash tag stripped) so
    // the output is fully deterministic and the oracle CONSTRUCTS the
    // expected graph in SQL VALUES.
    "rdf_turtle_source" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-ttl")
      java.nio.file.Files.writeString(dir.resolve("org.ttl"), turtleFixture)
      graft.rdf.Turtle.read(s, dir.toString, "http://g/ttl").toDF()
        .select(
          regexp_replace(col("s"), "_:t[0-9a-f]+_", "_:").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:t[0-9a-f]+_", "_:").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // S4c: RDF/XML file source — a fixture document written to a temp
    // file and read back through the StAX element-stream parser. Bnode
    // labels normalized like the Turtle query; the oracle CONSTRUCTS
    // the expected graph in SQL VALUES.
    "rdf_xml_source" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-xml")
      java.nio.file.Files.writeString(dir.resolve("org.rdf"), rdfXmlFixture)
      graft.rdf.RdfXml.read(s, dir.toString, "http://g/xml").toDF()
        .select(
          regexp_replace(col("s"), "_:x[0-9a-f]+_", "_:").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:x[0-9a-f]+_", "_:").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // S4d: N-Quads file source exercised THROUGH the LOAD dispatch —
    // the .nq fixture carries statements in three graphs (two labeled,
    // one unlabeled → the default graph); each statement keeps its own
    // graph label in the store, proving the quad-scoped LOAD path.
    "rdf_nquads_source" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-nq")
      java.nio.file.Files.writeString(dir.resolve("data.nq"), nquadsFixture)
      val storeDir = s"${System.getProperty("java.io.tmpdir")}/graft-nqs-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(storeDir)
      val engine = new graft.GraphEngine(new graft.model.GraphStore(s, storeDir))
      engine.update(s"LOAD <file://${dir.resolve("data.nq")}>")
      engine.store.readGraphs(
        Seq("http://g/1", "http://g/2", graft.model.Quad.DefaultGraph))
        .orderBy(col("graph"), col("s"), col("p"), col("o_value"))
    }),

    // S4e: TriG file source — Turtle plus graph blocks (labeled,
    // GRAPH-keyword, anonymous); triples outside any block and in the
    // anonymous block land in the default graph. The last statement of
    // a block omits its dot (legal TriG) to pin that grammar corner.
    "rdf_trig_source" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-trig")
      java.nio.file.Files.writeString(dir.resolve("data.trig"), trigFixture)
      graft.rdf.Turtle.readTrig(s, dir.toString).toDF()
        .select(col("graph"), col("s"), col("p"), col("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("graph"), col("s"), col("p"), col("o_value"))
    }),

    // S4f: JSON-LD file source exercised THROUGH the LOAD dispatch —
    // context term/prefix mapping, datatype + @id coercion, @language,
    // JSON natives, a nested (bnode) node object, rdf:type via @type,
    // and a NAMED graph node (@id + @graph) proving the quad-scoped
    // path. Fresh-bnode labels embed a document content hash, so they
    // are normalized before the oracle hash-compare.
    "rdf_jsonld_source" -> ((s, _) => {
      val dir = java.nio.file.Files.createTempDirectory("graft-jsonld")
      java.nio.file.Files.writeString(dir.resolve("data.jsonld"), jsonldFixture)
      val storeDir = s"${System.getProperty("java.io.tmpdir")}/graft-jld-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(storeDir)
      val engine = new graft.GraphEngine(new graft.model.GraphStore(s, storeDir))
      engine.update(s"LOAD <file://${dir.resolve("data.jsonld")}>")
      engine.store.readGraphs(
        Seq("http://ex/gdata", graft.model.Quad.DefaultGraph))
        .select(col("graph"),
          regexp_replace(col("s"), "_:j[0-9a-f]+_", "_:").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:j[0-9a-f]+_", "_:").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("graph"), col("s"), col("p"), col("o_value"))
    }),

    // S5d: RDF/XML sink → source roundtrip through REAL part files:
    // one <rdf:Description> per subject (per-element default xmlns for
    // the predicate namespace, rdf:resource/nodeID objects,
    // rdf:datatype / xml:lang literals, newline as &#10; so XML
    // line-end normalization can't corrupt values), per-file <rdf:RDF>
    // framing, read back through the StAX parser. Parser-minted bnode
    // tags normalized for the oracle.
    "rdf_xml_roundtrip" -> ((s, _) => {
      import s.implicits._
      val x = "http://www.w3.org/2001/XMLSchema#"
      val src = Seq(
        graft.model.Quad("g", "http://ex/a", "http://ex/name",
          "Alpha <\"quoted\"> & more", null, "en", "literal"),
        graft.model.Quad("g", "http://ex/a", "http://ex/size",
          "42", x + "integer", null, "literal"),
        graft.model.Quad("g", "http://ex/a", "http://ex/contact",
          "_:c1", null, null, "bnode"),
        graft.model.Quad("g", "_:c1", "http://ex/email",
          "a@example.org", null, null, "literal"),
        graft.model.Quad("g", "http://ex/b", "http://ex/linked",
          "http://ex/a", null, null, "iri"),
        graft.model.Quad("g", "http://ex/b", "http://ex/note",
          "line1\nline2", null, null, "literal"))
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-xmlrt-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      graft.rdf.RdfXml.write(src.toDS().toDF(), dir)
      graft.rdf.RdfXml.read(s, dir, "g").toDF()
        .select(
          regexp_replace(col("s"), "_:x[0-9a-f]+_", "_:").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:x[0-9a-f]+_", "_:").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // S5c: Turtle sink → source roundtrip through REAL part files:
    // full-IRI statement lines (subject-grouped `;`/`,` notation, no
    // prefix table — every line is a standalone valid Turtle document,
    // so part files need no header/framing), read back through the
    // document parser; escaping, typed/lang literals and bnodes all
    // survive. Parser-minted bnode tags normalized for the oracle.
    "rdf_turtle_roundtrip" -> ((s, _) => {
      import s.implicits._
      val x = "http://www.w3.org/2001/XMLSchema#"
      val src = Seq(
        graft.model.Quad("g", "http://ex/a", "http://ex/name",
          "Alpha \"quoted\"", null, "en", "literal"),
        graft.model.Quad("g", "http://ex/a", "http://ex/size",
          "42", x + "integer", null, "literal"),
        graft.model.Quad("g", "http://ex/a", "http://ex/contact",
          "_:c1", null, null, "bnode"),
        graft.model.Quad("g", "_:c1", "http://ex/email",
          "a@example.org", null, null, "literal"),
        graft.model.Quad("g", "http://ex/b", "http://ex/linked",
          "http://ex/a", null, null, "iri"),
        graft.model.Quad("g", "http://ex/b", "http://ex/note",
          "line1\nline2", null, null, "literal"))
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ttlrt-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      graft.rdf.Turtle.write(src.toDS().toDF(), dir)
      graft.rdf.Turtle.read(s, dir, "g").toDF()
        .select(
          regexp_replace(col("s"), "_:t[0-9a-f]+_", "_:").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:t[0-9a-f]+_", "_:").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // S5b: JSON-LD sink → source roundtrip through REAL part files:
    // write flattened expanded-form node objects (pure Catalyst
    // serialization, per-partition array framing), read them back with
    // the document parser, and compare the full quad set — escaping,
    // typed/lang literals, bnodes and the named-graph wrapper all
    // survive. Reader-minted bnode tags are normalized for the oracle.
    "rdf_jsonld_roundtrip" -> ((s, _) => {
      import s.implicits._
      val x = "http://www.w3.org/2001/XMLSchema#"
      val src = Seq(
        graft.model.Quad("urn:graft:default", "http://ex/a", "http://ex/name",
          "Alpha \"quoted\"", null, "en", "literal"),
        graft.model.Quad("urn:graft:default", "http://ex/a", "http://ex/size",
          "42", x + "integer", null, "literal"),
        graft.model.Quad("urn:graft:default", "http://ex/a", "http://ex/contact",
          "_:c1", null, null, "bnode"),
        graft.model.Quad("urn:graft:default", "_:c1", "http://ex/email",
          "a@example.org", null, null, "literal"),
        graft.model.Quad("http://g/x", "http://ex/b", "http://ex/linked",
          "http://ex/a", null, null, "iri"),
        graft.model.Quad("http://g/x", "http://ex/b", "http://ex/note",
          "line1\nline2", null, null, "literal"))
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-jldrt-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      graft.rdf.JsonLd.write(src.toDS().toDF(), dir)
      graft.rdf.JsonLd.read(s, dir).toDF()
        .select(col("graph"),
          regexp_replace(col("s"), "_:j[0-9a-f]+_", "_:").as("s"),
          col("p"),
          regexp_replace(col("o_value"), "_:j[0-9a-f]+_", "_:").as("o_value"),
          col("o_type"), col("o_lang"), col("o_kind"))
        .orderBy(col("graph"), col("s"), col("p"), col("o_value"))
    }),

    // S7: SPARQL-update text front end — INSERT DATA, INSERT..WHERE with
    // bnode paths + BIND, CLEAR, executed by GraphEngine from raw text
    "rdf_sparql_update" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-sparql-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val engine = new graft.GraphEngine(new graft.model.GraphStore(s, dir))
      engine.update("""
        PREFIX ex: <http://ex/>
        INSERT DATA { GRAPH <http://ex/src> {
          ex:a ex:name "Alpha" . ex:a ex:score "10"^^<http://www.w3.org/2001/XMLSchema#integer> .
          ex:b ex:name "Beta" .  ex:b ex:score "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
        } }""")
      engine.update("""
        PREFIX ex: <http://ex/>
        WITH <http://ex/out>
        INSERT { ?u ex:label ?n ; ex:hash ?h . }
        USING <http://ex/src>
        WHERE {
          ?s ex:name ?n ; ex:score ?sc .
          BIND (URI(CONCAT('http://ex/u/', ENCODE_FOR_URI(?n))) AS ?u)
          BIND (MD5(CONCAT(?n, ?sc)) AS ?h)
        }""")
      engine.store.readGraphs(Seq("http://ex/out"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // S7, §3.1 request grammar: ONE update text carrying FOUR
    // `;`-separated operations (plus a trailing `;`), executed strictly
    // in sequence — op2's WHERE reads op1's inserts, op3 deletes the
    // staging graph op1 wrote, op4 appends a marker. The final store
    // state proves the sequencing: only the derived graph survives.
    // Stardog/rdflib accept whole request files like this, so the
    // reference's posted update files are covered beyond one-op texts.
    "rdf_sparql_update_seq" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-seq-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val engine = new graft.GraphEngine(new graft.model.GraphStore(s, dir))
      engine.update("""
        PREFIX ex: <http://ex/>
        INSERT DATA { GRAPH <http://ex/src> {
          ex:a ex:name "Alpha" . ex:b ex:name "Beta" .
        } } ;
        PREFIX out: <http://ex/o/>
        WITH <http://ex/out>
        INSERT { ?s out:label ?u }
        USING <http://ex/src>
        WHERE { ?s ex:name ?n . BIND (UCASE(?n) AS ?u) } ;
        DELETE WHERE { GRAPH <http://ex/src> { ?s ex:name ?n } } ;
        INSERT DATA { GRAPH <http://ex/out> { ex:run ex:status "done" } } ;
        """)
      engine.store.read()
        .orderBy(col("graph"), col("s"), col("p"), col("o_value"))
    }),

    // Read-side SPARQL: SELECT DISTINCT + FILTER + FROM scoping +
    // ORDER/LIMIT compiled onto the quad store (partition-pruned scan,
    // BGP self-join, TakeOrderedAndProject for the limit). The oracle
    // recomputes the same answer relationally from `events`.
    "rdf_sparql_select" -> ((s, d) => {
      val g = eventStoreGraph
      val engine = new graft.GraphEngine(eventStore(s, d))
      engine.select(s"""
        PREFIX src: <$ns>
        SELECT DISTINCT ?etype ?uid
        FROM <$g>
        WHERE {
          ?e src:event_type ?etype ;
             src:user_id ?uid .
          FILTER (STRSTARTS(?etype, 'p'))
        }
        ORDER BY ?etype ?uid
        LIMIT 100""")
    }),

    // §3.1.3 QuadPattern templates: INSERT { GRAPH ?g { ... } } fans
    // rows into graphs COMPUTED by the WHERE group (per-kind routing —
    // the partition-by-key shape at store level), and the DELETE WHERE
    // shorthand with a variable graph term erases matching quads
    // WHEREVER they live. Legacy constant-graph templates keep the
    // partition-scoped fast path; the oracle pins the final state.
    "rdf_sparql_quad_template" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-qt-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val engine = new graft.GraphEngine(new graft.model.GraphStore(s, dir))
      engine.update("""
        INSERT DATA { GRAPH <http://ex/src> {
          <http://ex/a> <http://ex/kind> "red" .   <http://ex/a> <http://ex/val> "1" .
          <http://ex/b> <http://ex/kind> "blue" .  <http://ex/b> <http://ex/val> "2" .
          <http://ex/c> <http://ex/kind> "red" .   <http://ex/c> <http://ex/val> "3" .
        } } ;
        INSERT { GRAPH ?g { ?s <http://ex/val> ?v } }
        USING <http://ex/src>
        WHERE {
          ?s <http://ex/kind> ?k ; <http://ex/val> ?v .
          BIND (URI(CONCAT('http://ex/by/', ?k)) AS ?g)
        } ;
        DELETE WHERE { GRAPH ?g { ?s <http://ex/val> "1" } }
        """)
      engine.store.read()
        .filter(col("graph").startsWith("http://ex/by/"))
        .select(col("graph"), col("s"), col("p"), col("o_value"))
        .orderBy(col("graph"), col("s"))
    }),

    // §3.2.2-3 CLEAR scopes: one request seeds the default graph and
    // two named graphs, CLEAR NAMED wipes exactly the named ones, a
    // later op writes a fresh named graph, CLEAR DEFAULT empties the
    // unnamed graph — final state proves each scope resolved against
    // the store's live graph list (a metadata listing, no scan).
    "rdf_clear_scopes" -> ((s, _) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-scopes-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val engine = new graft.GraphEngine(new graft.model.GraphStore(s, dir))
      engine.update("""
        INSERT DATA {
          <http://ex/d1> <http://ex/p> "default1" .
          GRAPH <http://ex/g1> { <http://ex/a> <http://ex/p> "x" }
          GRAPH <http://ex/g2> { <http://ex/c> <http://ex/p> "z" }
        } ;
        CLEAR NAMED ;
        INSERT DATA { GRAPH <http://ex/g3> { <http://ex/k> <http://ex/p> "kept" } } ;
        CLEAR DEFAULT""")
      engine.store.read()
        .select(col("graph"), col("s"), col("p"), col("o_value"))
        .orderBy(col("graph"), col("s"))
    }),

    // VoID dataset statistics (W3C void: vocabulary) — the RDF
    // ecosystem's standard self-description: dataset-level triple /
    // distinct-subject / property counts plus one propertyPartition
    // per predicate, emitted AS quad rows ready for insertion into a
    // well-known graph. All counts are distributed aggregates over the
    // store scan (countDistinct shuffles term hashes, per-predicate
    // rows are vocabulary-sized); nothing touches the driver.
    "rdf_void_summary" -> ((s, d) => {
      val quads = eventStore(s, d).readGraphs(Seq(eventStoreGraph))
      val void = "http://rdfs.org/ns/void#"
      val ds = "urn:graft:void:dataset"
      val totals = quads.agg(
        count(lit(1)).as("triples"),
        countDistinct(col("s")).as("dsubj"),
        countDistinct(col("p")).as("nprops"))
      val datasetRows = totals.select(explode(array(
        struct(lit(ds).as("s"), lit(void + "triples").as("p"),
          col("triples").cast("string").as("o_value")),
        struct(lit(ds).as("s"), lit(void + "distinctSubjects").as("p"),
          col("dsubj").cast("string").as("o_value")),
        struct(lit(ds).as("s"), lit(void + "properties").as("p"),
          col("nprops").cast("string").as("o_value")))).as("q"))
        .select(col("q.*"))
      val partRows = quads.groupBy(col("p").as("prop"))
        .agg(count(lit(1)).as("n"))
        .select(explode(array(
          struct(concat(lit("urn:graft:void:part:"), col("prop")).as("s"),
            lit(void + "property").as("p"), col("prop").as("o_value")),
          struct(concat(lit("urn:graft:void:part:"), col("prop")).as("s"),
            lit(void + "triples").as("p"),
            col("n").cast("string").as("o_value")))).as("q"))
        .select(col("q.*"))
      datasetRows.unionByName(partRows).orderBy(col("s"), col("p"), col("o_value"))
    }),

    // owl:sameAs entity canonicalization ("smushing") — the KG twin of
    // dedup's cluster-canonicalize, and the standard LOD-integration
    // step after multiple sources assert identity links. Fixture:
    // customer facts (nation link, market segment, a <next> IRI chain
    // to exercise OBJECT rewrite) plus sameAs chains binding each run
    // of 10 consecutive customer IRIs into one identity cluster. The
    // rewrite must land every fact on the cluster's canonical IRI, drop
    // nothing but the sameAs statements, and leave literals untouched.
    "rdf_sameas_canonicalize" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val k = col("c_custkey")
      def iri(c: Column) = concat(lit("cust:"), c.cast("string"))
      val facts = cust.select(iri(k).as("s"), lit("nation").as("p"),
          concat(lit("nation:"), col("c_nationkey").cast("string"))
            .as("o_value"),
          lit("iri").as("o_kind"))
        .unionAll(cust.select(iri(k).as("s"), lit("segment").as("p"),
          col("c_mktsegment").as("o_value"), lit("literal").as("o_kind")))
        .unionAll(cust.select(iri(k).as("s"), lit("next").as("p"),
          iri(k + 1).as("o_value"), lit("iri").as("o_kind")))
      val sameAs = cust.filter(k % 10 =!= 1)
        .select(iri(k).as("s"), lit("sameAs").as("p"),
          iri(k - 1).as("o_value"), lit("iri").as("o_kind"))
      sameAsCanonicalize(facts, sameAs)
        .orderBy(col("s"), col("p"), col("o_value"), col("o_kind"))
    }),

    // Cost-based BGP ordering end to end: the engine gathers
    // per-predicate cardinalities from the store (one vocabulary-sized
    // aggregate) and plans this 4-pattern self-join by estimated
    // cardinality instead of the static constant-shape rank — 'error'
    // events are ~20× rarer than 'purchase', so the error probe anchors
    // the join tree (CardEstimatorSpec pins the chosen order; here the
    // oracle proves the reordered plan computes the same answer).
    "rdf_sparql_stats_join" -> ((s, d) => {
      val g = eventStoreGraph
      val engine = new graft.GraphEngine(eventStore(s, d))
        .withCardinalityStats()
      engine.select(s"""
        PREFIX src: <$ns>
        SELECT ?uid (COUNT(?e) AS ?n)
        FROM <$g>
        WHERE {
          ?e src:event_type "purchase" ; src:user_id ?uid .
          ?e2 src:event_type "error" ; src:user_id ?uid .
        }
        GROUP BY ?uid
        ORDER BY ?uid""")
    }),

    // SPARQL 1.1 SERVICE (federated query), Spark-first: the endpoint
    // IRI resolves to a REGISTERED quad dataset (here: a small
    // event-type → funnel-stage reference built in memory) and the
    // federated pattern compiles to one distributed join against the
    // event store scan — Catalyst broadcasts the 10-row endpoint side.
    // A literal HTTP federation client would route per-binding lookups
    // through the driver; the registry turns SERVICE into data-local
    // work, which is the only shape that survives 100 TB.
    "rdf_sparql_service" -> ((s, d) => {
      import s.implicits._
      val g = eventStoreGraph
      val engine = new graft.GraphEngine(eventStore(s, d))
      val svc = "http://svc/"
      val ref = Seq(
        ("view", "browse"), ("click", "browse"), ("signup", "acquire"),
        ("purchase", "convert"), ("error", "ops")).flatMap { case (t, st) =>
        Seq(
          graft.model.Quad(graft.model.Quad.DefaultGraph, s"urn:map:$t",
            svc + "etype", t, null, null, "literal"),
          graft.model.Quad(graft.model.Quad.DefaultGraph, s"urn:map:$t",
            svc + "stage", st, null, null, "literal"))
      }
      graft.sparql.Services.register("urn:graft:svc:ref", ref.toDS().toDF())
      engine.select(s"""
        PREFIX src: <$ns>
        PREFIX svc: <$svc>
        SELECT ?stage (COUNT(?e) AS ?n_events)
        FROM <$g>
        WHERE {
          ?e src:event_type ?t .
          SERVICE <urn:graft:svc:ref> { ?m svc:etype ?t ; svc:stage ?stage }
        }
        GROUP BY ?stage
        ORDER BY ?stage""")
    }),

    // SPARQL UNION: per-branch BIND marker + branch-aligned bindings
    // (union-all of the two filtered BGP compiles, one scan each with
    // the predicate pushed down — no distinct until the SELECT asks).
    "rdf_sparql_union" -> ((s, d) => {
      val g = eventStoreGraph
      val engine = new graft.GraphEngine(eventStore(s, d))
      engine.select(s"""
        PREFIX src: <$ns>
        SELECT DISTINCT ?uid ?kind
        FROM <$g>
        WHERE {
          { ?e src:event_type 'view' ; src:user_id ?uid .
            BIND ('v' AS ?kind) }
          UNION
          { ?e src:event_type 'purchase' ; src:user_id ?uid .
            BIND ('p' AS ?kind) }
        }
        ORDER BY ?uid ?kind""")
    }),

    // SPARQL DELETE..WHERE: compute-then-remove against one graph
    // partition (anti-join + partition swap; untouched graphs never
    // rewrite). The oracle recomputes the surviving set from `nation`.
    "rdf_sparql_delete" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-del-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d).select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.update(s"""
        WITH <$g>
        DELETE { ?s <name> ?n }
        USING <$g>
        WHERE { ?s <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1')) }""")
      store.readGraphs(Seq(g))
        .select(col("s"), col("o_value"))
        .orderBy(col("s"))
    }),

    // SPARQL MINUS (anti-join on shared vars) + VALUES (inline binding
    // table): customers in the VALUES-restricted market segments,
    // minus those based in nation 7. MINUS compiles to a left-anti
    // hash join; VALUES to a joined literal table.
    "rdf_sparql_minus" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-min-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/customers"
      val store = new graft.model.GraphStore(s, dir)
      val cust = Tables.customer(s, d)
      def custQuads(p: String, value: Column) = cust.select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit(p).as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(custQuads("segment", col("c_mktsegment"))
        .unionAll(custQuads("nation", col("c_nationkey").cast("string"))))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?c ?seg
        FROM <$g>
        WHERE {
          ?c <segment> ?seg .
          VALUES ?seg { 'BUILDING' 'MACHINERY' }
          MINUS { ?c <nation> '7' }
        }
        ORDER BY ?c""")
    }),

    // SPARQL 1.1 §17 expression surface end-to-end: the parser builds
    // comparison / arithmetic / IN / NOT IN / REGEX / CONTAINS / STRLEN /
    // term-check nodes and the compiler evaluates them with numeric
    // promotion (lexical→double; type error = unbound = row dropped).
    // Everything is map-side over one partition-pruned scan + one BGP
    // self-join; the oracle recomputes relationally from `customer`.
    // Output arithmetic sticks to integral doubles ("85.0") — fractional
    // double→string formatting is engine-specific (see pitfalls), the
    // fractional arithmetic is exercised inside the FILTER instead.
    "rdf_sparql_filter_expr" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-fexpr-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/custx"
      val store = new graft.model.GraphStore(s, dir)
      val cust = Tables.customer(s, d)
      def custQuads(p: String, value: Column, dt: Column) = cust.select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit(p).as("p"), value.cast("string").as("o_value"),
        dt.as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(
        custQuads("bal", col("c_acctbal"), lit(Quad.xsd.double))
          .unionAll(custQuads("segment", col("c_mktsegment"),
            lit(null).cast("string"))))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?c ?seg ?n
        FROM <$g>
        WHERE {
          ?c <bal> ?bal ; <segment> ?seg .
          FILTER (?bal * 2 - 100 > 1900 && ?bal <= 9000)
          FILTER (?seg IN ('BUILDING', 'MACHINERY') || REGEX(?seg, '^auto', 'i'))
          FILTER (?seg NOT IN ('FURNITURE') && CONTAINS(?seg, 'I'))
          FILTER (STRLEN(?seg) >= 8 && ISIRI(?c) && !ISBLANK(?c) && ISLITERAL(?seg))
          BIND (STRLEN(?seg) * 10 + 5 AS ?n)
        }
        ORDER BY ?c""")
    }),

    // Trailing VALUES clause (§18.2.4.3) + sameTerm/langMatches
    // builtins: language-tagged names (en for even keys, nl for odd),
    // the data block constrains ?seg after the WHERE, langMatches keeps
    // the English names, and !sameTerm drops the AUTOMOBILE segment by
    // full term identity. Oracle recomputes relationally.
    "rdf_sparql_values_builtins" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-tvals-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/custv"
      val store = new graft.model.GraphStore(s, dir)
      val cust = Tables.customer(s, d)
      val base = cust.select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit("segment").as("p"), col("c_mktsegment").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val names = cust.select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit("name").as("p"),
        concat(lit("Name-"), col("c_custkey").cast("string")).as("o_value"),
        lit(null).cast("string").as("o_type"),
        when(col("c_custkey") % 2 === 0, "en").otherwise("nl").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(base.unionAll(names))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?c ?seg ?nm
        FROM <$g>
        WHERE {
          ?c <segment> ?seg ; <name> ?nm .
          FILTER (LANGMATCHES(LANG(?nm), 'en'))
          FILTER (!SAMETERM(?seg, 'AUTOMOBILE'))
        }
        ORDER BY ?c
        VALUES ?seg { 'BUILDING' 'AUTOMOBILE' 'MACHINERY' }""")
    }),

    // SPARQL §17.4.5 datetime accessors + §17.4.4 SHA digests +
    // isNumeric, end-to-end at data scale: events timestamps become
    // xsd:dateTime lexical forms (UTC "Z" for even ids, a "+02:00"
    // wall-clock rewrite for odd ids — accessors are defined over the
    // WRITTEN form, so both spellings of the same instant must yield
    // their own fields). All accessors are map-side regexp_extract over
    // one scan; the oracle recomputes from `events` relationally.
    "rdf_sparql_datetime" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dt-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/ev"
      val store = new GraphStore(s, dir)
      val ev = Tables.events(s, d)
      val lex = when(col("event_id") % 2 === 0,
          concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("Z")))
        .otherwise(concat(date_format(col("ts") + expr("INTERVAL 2 HOURS"),
          "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("+02:00")))
      def evQuads(p: String, v: Column, dt: Column) = ev.select(
        lit(g).as("graph"),
        concat(lit("ev:"), col("event_id").cast("string")).as("s"),
        lit(p).as("p"), v.as("o_value"), dt.as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(evQuads("at", lex, lit(Quad.xsd.dateTime))
        .unionAll(evQuads("etype", col("event_type"),
          lit(null).cast("string"))))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?e ?y ?mo ?d ?h ?mi ?sec ?tz ?dig
        FROM <$g>
        WHERE {
          ?e <at> ?t ; <etype> ?ty .
          FILTER (ISNUMERIC(STRLEN(?ty)) && !ISNUMERIC(?ty) && !ISNUMERIC(?e))
          BIND (YEAR(?t) AS ?y) BIND (MONTH(?t) AS ?mo) BIND (DAY(?t) AS ?d)
          BIND (HOURS(?t) AS ?h) BIND (MINUTES(?t) AS ?mi)
          BIND (SECONDS(?t) AS ?sec)
          BIND (TZ(?t) AS ?tz) BIND (SHA256(?ty) AS ?dig)
        }
        ORDER BY ?e""")
        .select(col("e"),
          col("y").cast("int").as("y"), col("mo").cast("int").as("mo"),
          col("d").cast("int").as("d"), col("h").cast("int").as("h"),
          col("mi").cast("int").as("mi"),
          col("sec").cast("double").as("sec"), col("tz"), col("dig"))
    }),

    // SPARQL aggregates end-to-end: GROUP BY compiles to groupBy-agg
    // (map-side partial combine for free), HAVING filters native agg
    // aliases, ORDER BY DESC + tiebreaker keep the output total-ordered.
    // AVG is floor-rounded to 4 decimals on both sides (float-sum
    // pitfall). The oracle recomputes relationally from `customer`.
    "rdf_sparql_groupby" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-gby-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/custg"
      val store = new graft.model.GraphStore(s, dir)
      val cust = Tables.customer(s, d)
      def custQuads(p: String, value: Column, dt: Column) = cust.select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit(p).as("p"), value.cast("string").as("o_value"),
        dt.as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(
        custQuads("bal", col("c_acctbal"), lit(Quad.xsd.double))
          .unionAll(custQuads("segment", col("c_mktsegment"),
            lit(null).cast("string"))))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?seg (COUNT(*) AS ?n) (AVG(?bal) AS ?avg_bal)
        FROM <$g>
        WHERE { ?c <segment> ?seg ; <bal> ?bal }
        GROUP BY ?seg
        HAVING (?n > 10 && COUNT(?bal) > 10)
        ORDER BY DESC(?n) ?seg""")
        .select(col("seg"), col("n"),
          (floor(col("avg_bal") * 10000 + 0.5) / 10000).as("avg_bal"))
    }),

    // GROUP BY with ZERO projected aggregates (§11.4): grouping still
    // applies — the projection collapses to one row per group key — and
    // HAVING's inline COUNT rides as a hidden aggregate. Pre-round-8 this
    // shape silently dropped both GROUP BY and HAVING (the plain branch
    // was taken whenever no aggregate was projected).
    "rdf_sparql_groupby_noagg" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-gbn-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/custn"
      val store = new graft.model.GraphStore(s, dir)
      val cust = Tables.customer(s, d)
      def custQuads(p: String, value: Column, dt: Column) = cust.select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit(p).as("p"), value.cast("string").as("o_value"),
        dt.as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(
        custQuads("bal", col("c_acctbal"), lit(Quad.xsd.double))
          .unionAll(custQuads("segment", col("c_mktsegment"),
            lit(null).cast("string"))))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?seg
        FROM <$g>
        WHERE { ?c <segment> ?seg ; <bal> ?bal }
        GROUP BY ?seg
        HAVING (COUNT(?bal) > 10)
        ORDER BY ?seg""")
    }),

    // GROUP_CONCAT aggregate: nation names rolled up per region key.
    // SPARQL leaves concat order undefined; the engine sorts the
    // group's lexical forms, so the result is deterministic and the
    // oracle is DuckDB's ordered string_agg.
    "rdf_sparql_group_concat" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-gc-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nat"
      val store = new GraphStore(s, dir)
      val nat = Tables.nation(s, d)
      def natQuads(p: String, value: Column) = nat.select(
        lit(g).as("graph"),
        concat(lit("nat:"), col("n_nationkey").cast("string")).as("s"),
        lit(p).as("p"), value.cast("string").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(natQuads("name", col("n_name"))
        .unionAll(natQuads("region", col("n_regionkey"))))
      new graft.GraphEngine(store).select(s"""
        SELECT ?r (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names)
               (GROUP_CONCAT(DISTINCT ?n; SEPARATOR="|") AS ?dnames)
        FROM <$g>
        WHERE { ?x <region> ?r ; <name> ?n }
        GROUP BY ?r
        ORDER BY ?r""")
    }),

    // SPARQL 1.1 Update graph management (§3.2): COPY/ADD/MOVE are a
    // partition-pruned scan + append (+ an O(1) partition drop for
    // MOVE), LOAD reads an N-Triples file by extension — never a
    // full-store rewrite. Final per-graph counts are the checkable
    // state the oracle reconstructs.
    "rdf_graph_management" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-gm-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new GraphStore(s, dir)
      val engine = new graft.GraphEngine(store)
      def toQuads(df: org.apache.spark.sql.DataFrame, g: String,
          key: Column, p: String, v: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("e:"), key.cast("string")).as("s"),
        lit(p).as("p"), v.cast("string").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(toQuads(Tables.nation(s, d), "http://ex/A",
        col("n_nationkey"), "name", col("n_name")))
      store.append(toQuads(Tables.region(s, d), "http://ex/C",
        col("r_regionkey"), "rname", col("r_name")))
      engine.update("COPY <http://ex/A> TO <http://ex/B>")
      engine.update("ADD <http://ex/C> TO <http://ex/B>")
      engine.update("MOVE <http://ex/B> TO <http://ex/D>")
      // §3.2.3-5: graph-onto-itself COPY/MOVE/ADD are no-ops — the final
      // counts must be unchanged by these three
      engine.update("COPY <http://ex/A> TO <http://ex/A>")
      engine.update("MOVE <http://ex/D> TO <http://ex/D>")
      engine.update("ADD <http://ex/C> TO <http://ex/C>")
      // LOAD: serialize graph A to .nt, read it back into E, and (no
      // INTO clause) into the default graph, then COPY DEFAULT onward
      val nt = s"$dir-load.nt"
      NTriples.write(store.readGraphs(Seq("http://ex/A")), nt)
      engine.update(s"LOAD <file://$nt> INTO GRAPH <http://ex/E>")
      engine.update(s"LOAD <file://$nt>")
      engine.update("COPY DEFAULT TO <http://ex/F>")
      store.read().groupBy(col("graph"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("graph"))
    }),

    // SPARQL property paths (seq + alternative): customers link to
    // their nation via <nation> (even keys) or <nation_alt> (odd keys),
    // nations to regions, regions to names — the 3-hop path with an
    // alternative first hop desugars to joins + UNION at parse time.
    "rdf_sparql_path" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-path-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/geo"
      val store = new graft.model.GraphStore(s, dir)
      def iriQuads(df: org.apache.spark.sql.DataFrame, sCol: Column,
          p: Column, oCol: Column, kind: String) = df.select(
        lit(g).as("graph"), sCol.as("s"), p.as("p"), oCol.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit(kind).as("o_kind"))
      val cust = Tables.customer(s, d)
      val nation = Tables.nation(s, d)
      val region = Tables.region(s, d)
      store.append(
        iriQuads(cust,
          concat(lit("cust:"), col("c_custkey").cast("string")),
          when(col("c_custkey") % 2 === 0, "nation").otherwise("nation_alt"),
          concat(lit("nation:"), col("c_nationkey").cast("string")), "iri")
        .unionAll(iriQuads(nation,
          concat(lit("nation:"), col("n_nationkey").cast("string")),
          lit("region"),
          concat(lit("region:"), col("n_regionkey").cast("string")), "iri"))
        .unionAll(iriQuads(region,
          concat(lit("region:"), col("r_regionkey").cast("string")),
          lit("name"), col("r_name"), "literal")))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?c ?rn
        FROM <$g>
        WHERE { ?c (<nation>|<nation_alt>)/<region>/<name> ?rn }
        ORDER BY ?c ?rn""")
    }),

    // SPARQL + closure: nations chained k -> k+1; reachability from
    // nation:0 is the full chain. Pair-doubling join, 5 rounds for a
    // 25-node chain, localCheckpoint per round.
    "rdf_sparql_path_closure" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-clos-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/chain"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d)
        .filter(col("n_nationkey") < 24)
        .select(
          lit(g).as("graph"),
          concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
          lit("next").as("p"),
          concat(lit("nation:"), (col("n_nationkey") + 1).cast("string")).as("o_value"),
          lit(null).cast("string").as("o_type"),
          lit(null).cast("string").as("o_lang"),
          lit("iri").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?x
        FROM <$g>
        WHERE { <nation:0> <next>+ ?x }
        ORDER BY ?x""")
    }),

    // The SAME seeded `+` closure in ID SPACE (round 10): on the dict
    // backend every BFS round's frontier and edge frames carry 8-byte
    // dictionary ids (DictStoreSpec pins the long-typed checkpoints);
    // the constant seed is one plan-time id lookup and only the
    // projected endpoint decodes. Shares rdf_sparql_path_closure's
    // oracle — the mode must be observably invisible.
    "rdf_dict_path" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dclos-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/chain"
      val store = new graft.model.DictQuadStore(s, dir)
      store.appendDistinct(Tables.nation(s, d)
        .filter(col("n_nationkey") < 24)
        .select(
          lit(g).as("graph"),
          concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
          lit("next").as("p"),
          concat(lit("nation:"), (col("n_nationkey") + 1).cast("string")).as("o_value"),
          lit(null).cast("string").as("o_type"),
          lit(null).cast("string").as("o_lang"),
          lit("iri").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?x
        FROM <$g>
        WHERE { <nation:0> <next>+ ?x }
        ORDER BY ?x""")
    }),

    // Var-var closure SEEDED by a sibling pattern (round 8): ?s is
    // bound by the <tag> pattern before the `+` closure compiles, so
    // the compiler runs the multi-source seeded BFS from that binding
    // set (origins carried through the hops) instead of materializing
    // the full transitive-pair set — O(Σ reach(seed)) instead of
    // O(all pairs). Results must equal the unseeded semantics exactly.
    "rdf_sparql_path_seeded" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-seed-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/chain"
      val store = new graft.model.GraphStore(s, dir)
      val nat = Tables.nation(s, d).filter(col("n_nationkey") < 24)
      store.append(nat.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("next").as("p"),
        concat(lit("nation:"), (col("n_nationkey") + 1).cast("string")).as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("iri").as("o_kind"))
        .unionAll(Tables.nation(s, d)
          .filter(col("n_nationkey").isin(0, 20))
          .select(
            lit(g).as("graph"),
            concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
            lit("tag").as("p"),
            lit("seed").as("o_value"),
            lit(null).cast("string").as("o_type"),
            lit(null).cast("string").as("o_lang"),
            lit("literal").as("o_kind"))))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?s ?x
        FROM <$g>
        WHERE { ?s <tag> "seed" . ?s <next>+ ?x }
        ORDER BY ?s ?x""")
    }),

    // Zero-length path modifiers: `*` from a constant subject (chain
    // reachability INCLUDING the start) and `?` between variables (the
    // domain-restricted zero-length identity over every graph term,
    // ALP §18.4, plus the one-hop edges). Same chain fixture as the
    // `+` closure query.
    "rdf_sparql_path_star" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-star-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/chain"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d)
        .filter(col("n_nationkey") < 24)
        .select(
          lit(g).as("graph"),
          concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
          lit("next").as("p"),
          concat(lit("nation:"), (col("n_nationkey") + 1).cast("string")).as("o_value"),
          lit(null).cast("string").as("o_type"),
          lit(null).cast("string").as("o_lang"),
          lit("iri").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?x ?y
        FROM <$g>
        WHERE { <nation:0> <next>* ?x . ?x <next>? ?y }
        ORDER BY ?x ?y""")
    }),

    // Negated property set !(p|^p): forward edges minus the excluded
    // predicates, unioned with inverted edges for ^ members — compiled
    // to a variable-predicate scan + pushed-down NOT IN filter, never an
    // enumeration of the predicate vocabulary.
    "rdf_sparql_path_neg" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-neg-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/negset"
      val store = new graft.model.GraphStore(s, dir)
      val nat = Tables.nation(s, d)
      def quadCols(p: String, oCol: Column) = Seq(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit(p).as("p"),
        oCol.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("iri").as("o_kind"))
      store.append(
        nat.select(quadCols("in_region",
          concat(lit("region:"), col("n_regionkey").cast("string"))): _*)
          .unionAll(nat.filter(col("n_nationkey") < 24)
            .select(quadCols("next",
              concat(lit("nation:"), (col("n_nationkey") + 1).cast("string"))): _*)))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?s ?o
        FROM <$g>
        WHERE { ?s !(<next>|^<urn:none>) ?o }
        ORDER BY ?s ?o""")
    }),

    // FILTER NOT EXISTS: customers with no orders — the anti-join
    // compiled from a whole-FILTER EXISTS constraint (no per-row
    // subquery; one distinct + one hash anti join on ?c).
    "rdf_sparql_exists" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ex-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/sales"
      val store = new graft.model.GraphStore(s, dir)
      val custQ = Tables.customer(s, d).select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit("segment").as("p"), col("c_mktsegment").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      def orderQ(p: String, base: org.apache.spark.sql.DataFrame) = base.select(
        lit(g).as("graph"),
        concat(lit("order:"), col("o_orderkey").cast("string")).as("s"),
        lit(p).as("p"),
        concat(lit("cust:"), col("o_custkey").cast("string")).as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("iri").as("o_kind"))
      val orders = Tables.orders(s, d)
      store.append(custQ
        .unionAll(orderQ("customer", orders))
        .unionAll(orderQ("bigorder", orders.filter(col("o_totalprice") > 400000))))
      val engine = new graft.GraphEngine(store)
      // active customers (EXISTS) who never placed a large order
      // (NOT EXISTS) — one semi and one anti join
      engine.select(s"""
        SELECT ?c
        FROM <$g>
        WHERE { ?c <segment> ?seg .
                FILTER EXISTS { ?o <customer> ?c }
                FILTER NOT EXISTS { ?b <bigorder> ?c } }
        ORDER BY ?c""")
    }),

    // Subquery: per-segment customer counts computed in a { SELECT }
    // and joined back to every customer of that segment — the
    // "enrich each row with its group's aggregate" idiom without a
    // self-join in user code (the engine plans groupBy + equi-join).
    "rdf_sparql_subquery" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-subq-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/custs"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.customer(s, d).select(
        lit(g).as("graph"),
        concat(lit("cust:"), col("c_custkey").cast("string")).as("s"),
        lit("segment").as("p"), col("c_mktsegment").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.select(s"""
        SELECT ?c ?seg ?n
        FROM <$g>
        WHERE {
          ?c <segment> ?seg .
          { SELECT ?seg (COUNT(*) AS ?n) WHERE { ?x <segment> ?seg } GROUP BY ?seg }
        }
        ORDER BY ?c""")
    }),

    // DELETE/INSERT WHERE (SPARQL 1.1 §3.1.3): one pre-state binding
    // evaluation feeds both templates — the standard "migrate in place"
    // idiom. NATION_1* names are rewritten to *_V2 plus a marker
    // triple; everything else is untouched.
    "rdf_sparql_modify" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-mod-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d).select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.update(s"""
        WITH <$g>
        DELETE { ?s <name> ?n }
        INSERT { ?s <name> ?n2 . ?s <renamed> 'true' }
        USING <$g>
        WHERE { ?s <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1'))
                BIND (CONCAT(?n, '_V2') AS ?n2) }""")
      store.readGraphs(Seq(g))
        .select(col("s"), col("p"), col("o_value"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // GRAPH ?g patterns: nations split by key parity into two named
    // graphs; the variable graph binds per solution and the filter runs
    // inside the scoped group. Oracle derives the graph from parity.
    "rdf_sparql_graph_var" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-gvar-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d).select(
        when(col("n_nationkey") % 2 === 0, "http://ex/even")
          .otherwise("http://ex/odd").as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.select("""
        SELECT ?g ?s
        WHERE { GRAPH ?g { ?s <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1')) } }
        ORDER BY ?g ?s""")
    }),

    // FROM / FROM NAMED dataset clauses (§13.2): the default-graph
    // pattern reads the FROM merge, GRAPH ?g ranges over FROM NAMED
    // only — here the odd partition, so even nations never bind ?g.
    "rdf_sparql_from_named" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-fnam-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d).select(
        when(col("n_nationkey") % 2 === 0, "http://ex/even")
          .otherwise("http://ex/odd").as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.select("""
        SELECT ?g ?s ?n
        FROM <http://ex/even> FROM <http://ex/odd> FROM NAMED <http://ex/odd>
        WHERE { ?s <name> ?n . GRAPH ?g { ?s <name> ?n } }
        ORDER BY ?s""")
    }),

    // SPARQL ASK (boolean existence, short-circuit LIMIT 1) — both
    // polarities folded into one deterministic row.
    "rdf_sparql_ask" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ask-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d).select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      val pos = engine.ask(s"""ASK FROM <$g> { ?s <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1')) }""")
      val neg = engine.ask(s"""ASK FROM <$g> { ?s <name> 'NO_SUCH_NATION' }""")
      s.range(1).toDF().select(
        lit(if (pos) 1 else 0).as("positive"),
        lit(if (neg) 1 else 0).as("negative"))
    }),

    // SPARQL CONSTRUCT: template instantiation as a graph VALUE (single
    // explode pass, same machinery as INSERT); nothing hits the store.
    "rdf_sparql_construct" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-cst-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.GraphStore(s, dir)
      store.append(Tables.nation(s, d).select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("region").as("p"), col("n_regionkey").cast("string").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.construct(s"""
        CONSTRUCT { ?s <in_region> ?r }
        FROM <$g>
        WHERE { ?s <region> ?r . FILTER (?r IN ('0', '2')) }""",
        targetGraph = "urn:regions")
        .orderBy(col("s"))
    }),

    // SPARQL DESCRIBE (the last read-side verb to carry a driver
    // oracle): concise bounded description of every subject the WHERE
    // group binds — own triples plus the blank-node closure through
    // object position (bnodes have no addressable name, so their
    // triples belong to the description; each closure round is one
    // subject equi-join). The fixture threads each nation through an
    // anonymous address node so the closure edge is actually exercised.
    "rdf_sparql_describe" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-desc-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.GraphStore(s, dir)
      val n = Tables.nation(s, d)
      val name = n.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val addr = n.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("addr").as("p"),
        concat(lit("_:b"), col("n_nationkey").cast("string")).as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("bnode").as("o_kind"))
      val region = n.select(
        lit(g).as("graph"),
        concat(lit("_:b"), col("n_nationkey").cast("string")).as("s"),
        lit("region").as("p"), col("n_regionkey").cast("string").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      store.append(name.unionByName(addr).unionByName(region))
      val engine = new graft.GraphEngine(store)
      engine.describe(s"""
        DESCRIBE ?v FROM <$g>
        WHERE { ?v <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1')) }""")
        .select(col("s"), col("p"), col("o_value"), col("o_kind"))
        .orderBy(col("s"), col("p"), col("o_value"))
    }),

    // Backend parity: the SAME SPARQL delete scenario on the
    // merge-on-read store — DELETE lands as tombstone deltas (no
    // partition rewrite) yet the observable graph state, and so the
    // oracle, is identical to rdf_sparql_delete's.
    "rdf_sparql_delete_mor" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-delmor-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.MergeOnReadStore(s, dir)
      store.appendDistinct(Tables.nation(s, d).select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.update(s"""
        WITH <$g>
        DELETE { ?s <name> ?n }
        USING <$g>
        WHERE { ?s <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1')) }""")
      store.readGraphs(Seq(g))
        .select(col("s"), col("o_value"))
        .orderBy(col("s"))
    }),

    // S6 merge-on-read: O(delta) writer batches (inserts + tombstones +
    // revives + exact re-inserts) reconstructed into set semantics by
    // one latest-batch-wins aggregation at read time. Row-level output:
    // the oracle recomputes the expected merged set from `nation`.
    "rdf_store_mor" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-mor-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      // b1: full load; b2: tombstone every 5th; b3: updated value for
      // every 10th (new quad identity); b4: re-insert every 4th verbatim
      // — revives the tombstoned ones among them (insert-after-delete)
      // and exact-dup-collapses against the live ones
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      store.appendDelta(quads(nation.filter(key % 4 === 0), col("n_name")), 4L)
      store.readGraphs(Seq(g))
        .select(col("s"), col("p"), col("o_value"))
        .orderBy(col("s"), col("o_value"))
    }),

    // The SAME delta/tombstone/revive sequence on the dict-encoded
    // merge-on-read backend (round 10): O(delta) writes AND id-space
    // reads at once — the latest-wins identity the merge aggregates on
    // is (graph, 3 longs) instead of seven strings, and the SPARQL
    // compiler sees the merged view still encoded. Shares
    // rdf_store_mor's oracle: the mode must be observably invisible.
    "rdf_dict_mor" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dmor-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.DictMorStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      store.appendDelta(quads(nation.filter(key % 4 === 0), col("n_name")), 4L)
      store.readGraphs(Seq(g))
        .select(col("s"), col("p"), col("o_value"))
        .orderBy(col("s"), col("o_value"))
    }),

    // S6 AUTO-COMPACTION: the bounded-tail policy end to end. A batch
    // load plus a chain of single-quad revision batches (insert r_i,
    // tombstone r_{i-1}) grows the delta tail past the policy threshold;
    // `compactIfNeeded` must FIRE, and the compacted store must (a) read
    // the SAME merged state as before — both phases are emitted and the
    // oracle expects them identical — and (b) read FEWER FILES: the
    // `files_reduced` column compares the delta scan's inputFiles before
    // (one-plus per batch) and after (the single-file compacted base),
    // which at 100 TB is the read-amplification the policy bounds (every
    // readMerged aggregates + anti-joins the whole tail).
    "rdf_store_compact" -> ((s, d) => {
      import s.implicits._
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-morcompact-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      def rev(v: String) = s.range(1).select(
        lit(g).as("graph"), lit("nation:0").as("s"), lit("rev").as("p"),
        lit(v).as("o_value"), lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"), lit("literal").as("o_kind"))
      store.appendDelta(quads(Tables.nation(s, d), col("n_name")), 1L)
      var b = 1L
      (2 to 6).foreach { i =>
        b += 1; store.appendDelta(rev(s"r$i"), b)
        if (i > 2) { b += 1; store.appendDelta(rev(s"r${i - 1}"), b, op = "d") }
      }
      val filesBefore = store.readDeltas().inputFiles.length
      // pre-state must be MATERIALIZED before compacting: the merged view
      // is lazy over delta files the compaction is about to rewrite
      val pre = store.readGraphs(Seq(g))
        .select(col("s"), col("p"), col("o_value")).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val fired = store.compactIfNeeded(g, maxTailBatches = 4)
      val filesAfter = store.readDeltas().inputFiles.length
      val post = store.readGraphs(Seq(g))
        .select(col("s"), col("p"), col("o_value"))
      pre.toDF("s", "p", "o_value").withColumn("phase", lit("pre"))
        .unionByName(post.withColumn("phase", lit("post")))
        .withColumn("compacted", lit(if (fired) 1 else 0).cast("int"))
        .withColumn("files_reduced",
          lit(if (filesAfter < filesBefore) 1 else 0).cast("int"))
        .select(col("phase"), col("s"), col("p"), col("o_value"),
          col("compacted"), col("files_reduced"))
        .orderBy(col("phase"), col("s"), col("p"), col("o_value"))
    }),

    // S6b TIME TRAVEL: snapshot reads of the merge-on-read store as-of
    // historical batches — the same 4-batch history as rdf_store_mor,
    // then three snapshot reads tagged by version: as-of batch 1 (the
    // full load), as-of batch 2 (tombstones applied), as-of batch 4
    // (current: revives + updates). A snapshot is a batch_id filter
    // pushed into the delta scan before the latest-wins aggregation —
    // no per-version copies — so history costs nothing until compaction
    // collapses it. The oracle recomputes all three expected states
    // from `nation`.
    "rdf_store_timetravel" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-tt-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      store.appendDelta(quads(nation.filter(key % 4 === 0), col("n_name")), 4L)
      store.versions().filter(Set(1L, 2L, 4L))
        .map(v => store.readAsOf(v)
          .select(lit(v).as("version"), col("s"), col("o_value")))
        .reduce(_ unionAll _)
        .orderBy(col("version"), col("s"), col("o_value"))
    }),

    // S6b CHANGE DATA FEED: net per-quad changes between MOR snapshots
    // (the Delta/Iceberg CDF read) — same 4-batch nation history as
    // rdf_store_mor, read back as two change windows: (1→2] nets the
    // tombstone batch as deletes, (2→4] nets the #v2 inserts plus the
    // batch-4 revivals (k%20==0, deleted at 2 and re-inserted at 4);
    // re-inserts of still-live quads net to NOTHING. The plan is
    // O(window): touched identities broadcast-semi-join the history
    // (asserted in MorStoreSpec), no snapshot materializes. The oracle
    // recomputes both windows' net effects from `nation`.
    "rdf_store_cdc" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-cdc-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      store.appendDelta(quads(nation.filter(key % 4 === 0), col("n_name")), 4L)
      Seq((1L, 2L), (2L, 4L))
        .map { case (f, t) => store.changesBetween(f, t)
          .select(lit(f).as("w_from"), lit(t).as("w_to"),
            col("change"), col("s"), col("o_value")) }
        .reduce(_ unionAll _)
        .orderBy(col("w_from"), col("change"), col("s"), col("o_value"))
    }),

    // CDF CONSUMER — incremental view maintenance: a downstream
    // aggregate (quad counts per leading o_value letter) materialized
    // at batch 2 is REFRESHED to batch 4 by folding the (2→4] change
    // feed into it (+1 per insert, -1 per delete, zero groups dropped)
    // — never rescanning the store. This is the maintenance algebra a
    // 100 TB consumer runs on every CDF poll: the refresh join is
    // change-feed-sized, and equality with the full recompute is
    // exactly what the oracle checks (it recomputes the batch-4 state
    // from `nation` directly).
    "rdf_cdc_refresh" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-cdcr-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      store.appendDelta(quads(nation.filter(key % 4 === 0), col("n_name")), 4L)
      // group key = value length (the synthetic names vary there;
      // key suffixes and the #v2 tag spread the histogram)
      val vlen = length(col("o_value")).cast("long").as("vlen")
      val base = store.readAsOf(2L).groupBy(vlen)
        .agg(count(lit(1)).as("n"))
      val delta = store.changesBetween(2L, 4L).groupBy(vlen)
        .agg(sum(when(col("change") === "insert", 1L).otherwise(-1L)).as("dn"))
      base.join(delta, Seq("vlen"), "full")
        .select(col("vlen"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
        .where(col("n") > 0)
        .orderBy(col("vlen"))
    }),

    // D-series twin: the same CDF read in ID SPACE on the dict MOR
    // backend — touched keys and both endpoint aggregations run over
    // (graph, 3 never-null longs); the dictionary decodes only the
    // window-sized change set at the end. One (1→4] window: nets the
    // still-tombstoned deletes (k%5==0 minus the k%20==0 revivals) and
    // the #v2 inserts; everything else cancels.
    "rdf_dict_cdc" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dcdc-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.DictMorStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      store.appendDelta(quads(nation.filter(key % 4 === 0), col("n_name")), 4L)
      store.changesBetween(1L, 4L)
        .select(col("change"), col("s"), col("o_value"))
        .orderBy(col("change"), col("s"), col("o_value"))
    }),

    // SPARQL over a SNAPSHOT: the same MOR history, queried through
    // the full engine (parser→compiler) against SnapshotStore views —
    // a FILTER/ORDER SELECT evaluated as-of batch 1 (pre-tombstone)
    // and as-of batch 3 (tombstones + updates), versions tagged. Time
    // travel composes with the whole SPARQL surface, not just raw
    // reads; the snapshot rejects updates loudly (spec).
    "rdf_sparql_asof" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-sasof-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, dir)
      val g = "http://ex/nations"
      def quads(df: DataFrame, value: Column) = df.select(
        lit(g).as("graph"),
        concat(lit("http://ex/nation/"), col("n_nationkey").cast("string")).as("s"),
        lit("http://ex/name").as("p"), value.as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val nation = Tables.nation(s, d)
      val key = col("n_nationkey")
      store.appendDelta(quads(nation, col("n_name")), 1L)
      store.appendDelta(quads(nation.filter(key % 5 === 0), col("n_name")), 2L, op = "d")
      store.appendDelta(quads(nation.filter(key % 10 === 0),
        concat(col("n_name"), lit("#v2"))), 3L)
      val select = s"""
        PREFIX ex: <http://ex/>
        SELECT ?s ?name
        FROM <$g>
        WHERE { ?s ex:name ?name . FILTER (STRLEN(?name) >= 5) }
        ORDER BY ?s ?name"""
      Seq(1L, 3L).map { v =>
        new graft.GraphEngine(new graft.model.SnapshotStore(store, v))
          .select(select)
          .select(lit(v).as("version"), col("s"), col("name"))
      }.reduce(_ unionAll _)
        .orderBy(col("version"), col("s"), col("name"))
    }),

    // S6/S9/Q13: store lifecycle — append, clear, re-append, scoped read
    "rdf_store_lifecycle" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-store-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new GraphStore(s, dir)
      // both appends are actions over the same flatten — persist so the
      // JSON parse runs once, not per write
      val quads = propQuads(s, d).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      store.append(quads)
      store.clearGraph(graph)          // truncate = partition delete
      store.append(quads)              // reload
      quads.unpersist()
      store.readGraphs(Seq(graph))     // scoped read = partition pruning
        .groupBy(col("graph"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("graph"))
    }))

  private val rdfXmlFixture = """<?xml version="1.0" encoding="UTF-8"?>
    |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    |         xmlns:ex="http://ex/">
    |  <ex:Org rdf:about="http://ex/alpha">
    |    <ex:name xml:lang="en">Alpha Corp</ex:name>
    |    <ex:employees rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:employees>
    |    <ex:active rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</ex:active>
    |    <ex:homepage rdf:resource="http://ex/alpha/home"/>
    |    <ex:contact>
    |      <rdf:Description rdf:nodeID="c1">
    |        <ex:email>a@example.org</ex:email>
    |        <ex:phone>123</ex:phone>
    |      </rdf:Description>
    |    </ex:contact>
    |  </ex:Org>
    |  <rdf:Description rdf:about="http://ex/beta">
    |    <ex:name>Beta</ex:name>
    |    <ex:partner rdf:nodeID="c1"/>
    |    <ex:meta rdf:parseType="Resource">
    |      <ex:rank rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">7</ex:rank>
    |    </ex:meta>
    |  </rdf:Description>
    |</rdf:RDF>
    |""".stripMargin

  private val turtleFixture = """
    |@prefix ex: <http://ex/> .
    |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    |@base <http://base/> .
    |
    |ex:alpha a ex:Org ;
    |    ex:name "Alpha Corp"@en ;
    |    ex:founded "2001-05-04"^^xsd:date ;
    |    ex:employees 42 ;
    |    ex:score 4.5 ;
    |    ex:active true ;
    |    ex:contact [ ex:email "a@example.org" ; ex:phone "123" ] .
    |
    |<rel> ex:name "Relative" .
    |_:m ex:memberOf ex:alpha .
    |ex:alpha ex:tags ("x" "y") .
    |""".stripMargin

  private val nquadsFixture = """
    |# three graphs: two labeled, one default
    |<http://ex/a> <http://ex/name> "Alpha" <http://g/1> .
    |<http://ex/a> <http://ex/score> "4"^^<http://www.w3.org/2001/XMLSchema#integer> <http://g/1> .
    |<http://ex/b> <http://ex/name> "Beta"@fr <http://g/2> .
    |_:x <http://ex/linked> <http://ex/a> <http://g/2> .
    |<http://ex/c> <http://ex/name> "NoGraph" .
    |""".stripMargin

  private val trigFixture = """
    |@prefix ex: <http://ex/> .
    |
    |ex:top ex:name "TopLevel" .
    |
    |<http://g/a> {
    |  ex:a ex:name "Alpha" ;
    |       ex:size 10 .
    |}
    |
    |GRAPH <http://g/b> {
    |  ex:b ex:name "Beta"@fr .
    |  ex:b ex:linked ex:a
    |}
    |
    |{
    |  ex:d ex:name "InDefault" .
    |}
    |""".stripMargin

  private val jsonldFixture = """
    |{
    |  "@context": {
    |    "ex": "http://ex/",
    |    "xsd": "http://www.w3.org/2001/XMLSchema#",
    |    "name": "ex:name",
    |    "founded": {"@id": "ex:founded", "@type": "xsd:date"},
    |    "boss": {"@id": "ex:boss", "@type": "@id"}
    |  },
    |  "@graph": [
    |    {
    |      "@id": "ex:alpha",
    |      "@type": "ex:Org",
    |      "name": {"@value": "Alpha Corp", "@language": "en"},
    |      "ex:employees": 42,
    |      "ex:active": true,
    |      "founded": "2001-05-04",
    |      "boss": "ex:beta",
    |      "ex:contact": {"ex:email": "a@example.org"}
    |    },
    |    {
    |      "@id": "ex:gdata",
    |      "@graph": [
    |        {"@id": "ex:b", "name": "Beta"}
    |      ]
    |    }
    |  ]
    |}
    |""".stripMargin

  def oracleSql: Map[String, String] = oracleBase +
    // the merge-on-read twin must reproduce the pipeline's constructed
    // state quad-for-quad — same oracle, different storage backend
    ("rdf_mapping_pipeline_mor" -> oracleBase("rdf_mapping_pipeline")) +
    // …and so must the dict-encoded id-space backend (round 10)
    ("rdf_mapping_pipeline_dict" -> oracleBase("rdf_mapping_pipeline"))

  private val oracleBase: Map[String, String] = Map(
    // constructed-state oracle: the flattener's expected output on the
    // one-document mamDoc fixture (bnode label normalized on both sides)
    "rdf_json_file_source" ->
      """SELECT * FROM (VALUES
           (CAST('https://data.example.org/graph/tenants' AS VARCHAR),
            CAST('_:b' AS VARCHAR),
            CAST('http://localhost/ExternalId' AS VARCHAR),
            CAST('OR-w66976m' AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST('literal' AS VARCHAR)),
           ('https://data.example.org/graph/tenants', '_:b',
            'http://localhost/Name', 'Tenant display name',
            NULL, NULL, 'literal')
         ) t(graph, s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY s, p""",
    "rdf_turtle_source" ->
      """SELECT * FROM (VALUES
           (CAST('_:1' AS VARCHAR), CAST('http://ex/email' AS VARCHAR),
            CAST('a@example.org' AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST('literal' AS VARCHAR)),
           ('_:1', 'http://ex/phone', '123', NULL, NULL, 'literal'),
           ('_:2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first',
            'x', NULL, NULL, 'literal'),
           ('_:2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
            '_:3', NULL, NULL, 'bnode'),
           ('_:3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first',
            'y', NULL, NULL, 'literal'),
           ('_:3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest',
            'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil',
            NULL, NULL, 'iri'),
           ('_:m', 'http://ex/memberOf', 'http://ex/alpha', NULL, NULL, 'iri'),
           ('http://base/rel', 'http://ex/name', 'Relative', NULL, NULL, 'literal'),
           ('http://ex/alpha',
            'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
            'http://ex/Org', NULL, NULL, 'iri'),
           ('http://ex/alpha', 'http://ex/active', 'true',
            'http://www.w3.org/2001/XMLSchema#boolean', NULL, 'literal'),
           ('http://ex/alpha', 'http://ex/contact', '_:1', NULL, NULL, 'bnode'),
           ('http://ex/alpha', 'http://ex/employees', '42',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('http://ex/alpha', 'http://ex/founded', '2001-05-04',
            'http://www.w3.org/2001/XMLSchema#date', NULL, 'literal'),
           ('http://ex/alpha', 'http://ex/name', 'Alpha Corp', NULL, 'en', 'literal'),
           ('http://ex/alpha', 'http://ex/score', '4.5',
            'http://www.w3.org/2001/XMLSchema#decimal', NULL, 'literal'),
           ('http://ex/alpha', 'http://ex/tags', '_:2', NULL, NULL, 'bnode')
         ) t(s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY s, p, o_value""",
    "rdf_nquads_source" ->
      """SELECT * FROM (VALUES
           (CAST('http://g/1' AS VARCHAR), CAST('http://ex/a' AS VARCHAR),
            CAST('http://ex/name' AS VARCHAR), CAST('Alpha' AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST('literal' AS VARCHAR)),
           ('http://g/1', 'http://ex/a', 'http://ex/score', '4',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('http://g/2', 'http://ex/b', 'http://ex/name', 'Beta',
            NULL, 'fr', 'literal'),
           ('http://g/2', '_:x', 'http://ex/linked', 'http://ex/a',
            NULL, NULL, 'iri'),
           ('urn:graft:default', 'http://ex/c', 'http://ex/name', 'NoGraph',
            NULL, NULL, 'literal')
         ) t(graph, s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY graph, s, p, o_value""",
    "rdf_xml_roundtrip" ->
      """SELECT * FROM (VALUES
           (CAST('_:c1' AS VARCHAR), CAST('http://ex/email' AS VARCHAR),
            CAST('a@example.org' AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST('literal' AS VARCHAR)),
           ('http://ex/a', 'http://ex/contact', '_:c1', NULL, NULL, 'bnode'),
           ('http://ex/a', 'http://ex/name', 'Alpha <"quoted"> & more',
            NULL, 'en', 'literal'),
           ('http://ex/a', 'http://ex/size', '42',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('http://ex/b', 'http://ex/linked', 'http://ex/a',
            NULL, NULL, 'iri'),
           ('http://ex/b', 'http://ex/note', 'line1' || chr(10) || 'line2',
            NULL, NULL, 'literal')
         ) t(s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY s, p, o_value""",
    "rdf_turtle_roundtrip" ->
      """SELECT * FROM (VALUES
           (CAST('_:c1' AS VARCHAR), CAST('http://ex/email' AS VARCHAR),
            CAST('a@example.org' AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST('literal' AS VARCHAR)),
           ('http://ex/a', 'http://ex/contact', '_:c1', NULL, NULL, 'bnode'),
           ('http://ex/a', 'http://ex/name', 'Alpha "quoted"',
            NULL, 'en', 'literal'),
           ('http://ex/a', 'http://ex/size', '42',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('http://ex/b', 'http://ex/linked', 'http://ex/a',
            NULL, NULL, 'iri'),
           ('http://ex/b', 'http://ex/note', 'line1' || chr(10) || 'line2',
            NULL, NULL, 'literal')
         ) t(s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY s, p, o_value""",
    "rdf_jsonld_roundtrip" ->
      """SELECT * FROM (VALUES
           (CAST('http://g/x' AS VARCHAR), CAST('http://ex/b' AS VARCHAR),
            CAST('http://ex/linked' AS VARCHAR), CAST('http://ex/a' AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST('iri' AS VARCHAR)),
           ('http://g/x', 'http://ex/b', 'http://ex/note',
            'line1' || chr(10) || 'line2', NULL, NULL, 'literal'),
           ('urn:graft:default', '_:c1', 'http://ex/email', 'a@example.org',
            NULL, NULL, 'literal'),
           ('urn:graft:default', 'http://ex/a', 'http://ex/contact', '_:c1',
            NULL, NULL, 'bnode'),
           ('urn:graft:default', 'http://ex/a', 'http://ex/name',
            'Alpha "quoted"', NULL, 'en', 'literal'),
           ('urn:graft:default', 'http://ex/a', 'http://ex/size', '42',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal')
         ) t(graph, s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY graph, s, p, o_value""",
    "rdf_jsonld_source" ->
      """SELECT * FROM (VALUES
           (CAST('http://ex/gdata' AS VARCHAR), CAST('http://ex/b' AS VARCHAR),
            CAST('http://ex/name' AS VARCHAR), CAST('Beta' AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST('literal' AS VARCHAR)),
           ('urn:graft:default', '_:2', 'http://ex/email', 'a@example.org',
            NULL, NULL, 'literal'),
           ('urn:graft:default', 'http://ex/alpha', 'http://ex/active', 'true',
            'http://www.w3.org/2001/XMLSchema#boolean', NULL, 'literal'),
           ('urn:graft:default', 'http://ex/alpha', 'http://ex/boss',
            'http://ex/beta', NULL, NULL, 'iri'),
           ('urn:graft:default', 'http://ex/alpha', 'http://ex/contact', '_:2',
            NULL, NULL, 'bnode'),
           ('urn:graft:default', 'http://ex/alpha', 'http://ex/employees', '42',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('urn:graft:default', 'http://ex/alpha', 'http://ex/founded',
            '2001-05-04', 'http://www.w3.org/2001/XMLSchema#date', NULL, 'literal'),
           ('urn:graft:default', 'http://ex/alpha', 'http://ex/name',
            'Alpha Corp', NULL, 'en', 'literal'),
           ('urn:graft:default', 'http://ex/alpha',
            'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
            'http://ex/Org', NULL, NULL, 'iri')
         ) t(graph, s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY graph, s, p, o_value""",
    "rdf_trig_source" ->
      """SELECT * FROM (VALUES
           (CAST('http://g/a' AS VARCHAR), CAST('http://ex/a' AS VARCHAR),
            CAST('http://ex/name' AS VARCHAR), CAST('Alpha' AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST('literal' AS VARCHAR)),
           ('http://g/a', 'http://ex/a', 'http://ex/size', '10',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('http://g/b', 'http://ex/b', 'http://ex/linked', 'http://ex/a',
            NULL, NULL, 'iri'),
           ('http://g/b', 'http://ex/b', 'http://ex/name', 'Beta',
            NULL, 'fr', 'literal'),
           ('urn:graft:default', 'http://ex/d', 'http://ex/name', 'InDefault',
            NULL, NULL, 'literal'),
           ('urn:graft:default', 'http://ex/top', 'http://ex/name', 'TopLevel',
            NULL, NULL, 'literal')
         ) t(graph, s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY graph, s, p, o_value""",
    "rdf_xml_source" ->
      """SELECT * FROM (VALUES
           (CAST('_:1' AS VARCHAR), CAST('http://ex/rank' AS VARCHAR),
            CAST('7' AS VARCHAR),
            CAST('http://www.w3.org/2001/XMLSchema#integer' AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST('literal' AS VARCHAR)),
           ('_:c1', 'http://ex/email', 'a@example.org', NULL, NULL, 'literal'),
           ('_:c1', 'http://ex/phone', '123', NULL, NULL, 'literal'),
           ('http://ex/alpha',
            'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
            'http://ex/Org', NULL, NULL, 'iri'),
           ('http://ex/alpha', 'http://ex/active', 'true',
            'http://www.w3.org/2001/XMLSchema#boolean', NULL, 'literal'),
           ('http://ex/alpha', 'http://ex/contact', '_:c1', NULL, NULL, 'bnode'),
           ('http://ex/alpha', 'http://ex/employees', '42',
            'http://www.w3.org/2001/XMLSchema#integer', NULL, 'literal'),
           ('http://ex/alpha', 'http://ex/homepage', 'http://ex/alpha/home',
            NULL, NULL, 'iri'),
           ('http://ex/alpha', 'http://ex/name', 'Alpha Corp', NULL, 'en', 'literal'),
           ('http://ex/beta', 'http://ex/meta', '_:1', NULL, NULL, 'bnode'),
           ('http://ex/beta', 'http://ex/name', 'Beta', NULL, NULL, 'literal'),
           ('http://ex/beta', 'http://ex/partner', '_:c1', NULL, NULL, 'bnode')
         ) t(s, p, o_value, o_type, o_lang, o_kind)
         ORDER BY s, p, o_value""",
    // Constructed-state oracle for the full mapping pipeline: the 88
    // expected fixture quads derived IN SQL from the FIXTURES.md source
    // records -- md5 skolemization recomputed per rule, so the hash gate
    // checks the skolemization contract, not a pasted golden file.
    "rdf_mapping_pipeline" ->
      """WITH
iri(i) AS (VALUES ('iri')), lit(l) AS (VALUES ('literal')),
-- namespaces
n AS (SELECT
  'https://data.hetarchief.be/graph/organizations' AS g,
  'https://data.hetarchief.be/id/organization/' AS id,
  'https://data.hetarchief.be/id/organization-role/' AS role_id,
  'https://data.hetarchief.be/id/organization-type/' AS type_id,
  'https://data.hetarchief.be/ns/organization/' AS meemoo,
  'https://data.hetarchief.be/ns/mediahaven/' AS mh,
  'http://www.w3.org/ns/org#' AS org,
  'https://schema.org/' AS sch,
  'http://www.w3.org/2004/02/skos/core#' AS skos,
  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS a,
  'http://purl.org/dc/terms/' AS dct,
  'http://xmlns.com/foaf/0.1/' AS foaf,
  'http://www.w3.org/2001/XMLSchema#' AS xsd,
  'https://assets.viaa.be/images/' AS assets),
-- fixture records (FIXTURES.md): the ldap orgs, the teamleader company,
-- its contact shapes, the two users, the mam tenant
ldap_org AS (SELECT 'OR-w66976m' AS orid, 'Main Org' AS name,
  'Straat 1' AS street, '9000' AS postal, 'Gent' AS city,
  'Oost-Vlaanderen' AS region, 'Cultuur' AS sector),
ldap_unit AS (SELECT 'OR-w66976m' AS parent, 'OR-w66976m-unit' AS ou,
  'Unit name' AS name, 'Unitstraat 2' AS street, '9001' AS postal,
  'Gent' AS city),
tl AS (SELECT 'OR-tl1' AS orid, 'Company BV' AS name,
  'Beschrijving' AS descr, 'www.example.be' AS website,
  '1 - Type - Cultuur Instelling' AS clazz, 'tl-user-1' AS amid,
  'https://forms.example.be/x' AS form,
  'Straat 1' AS street, '9000' AS postal, 'Gent' AS city),
users(uid, fn, ln, email, tel, fun) AS (VALUES
  ('u-1', 'An', 'Peeters', 'an@meemoo.be', '+32470000000', 'Account manager'),
  ('u-2', 'Jan', 'Janssens', 'jan@meemoo.be', NULL, NULL)),
quads AS (
  -- ldap_mapping_org: org + skolemized site + address
  SELECT id || orid AS s, a AS p, org || 'Organization' AS o, NULL AS dt, NULL AS lg, i AS k FROM ldap_org, n, iri
  UNION ALL SELECT id || orid, sch || 'identifier', orid, NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || orid, skos || 'altLabel', name, NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || orid, meemoo || 'sector', sector, NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || orid, org || 'hasPrimarySite', id || md5(orid || '-primary'), NULL, NULL, i FROM ldap_org, n, iri
  UNION ALL SELECT id || orid, org || 'hasSite', id || md5(orid || '-primary'), NULL, NULL, i FROM ldap_org, n, iri
  UNION ALL SELECT id || md5(orid || '-primary'), a, org || 'Site', NULL, NULL, i FROM ldap_org, n, iri
  UNION ALL SELECT id || md5(orid || '-primary'), org || 'siteAddress', id || md5(street || postal || city), NULL, NULL, i FROM ldap_org, n, iri
  UNION ALL SELECT id || md5(street || postal || city), a, sch || 'PostalAddress', NULL, NULL, i FROM ldap_org, n, iri
  UNION ALL SELECT id || md5(street || postal || city), sch || 'streetAddress', street, NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'addressCountry', 'BE', NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'postalCode', postal, NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'addressRegion', region, NULL, NULL, l FROM ldap_org, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'addressLocality', city, NULL, NULL, l FROM ldap_org, n, lit
  -- ldap classifiers: businessCategory / objectClass variants
  UNION ALL SELECT id || 'OR-w66976m', a, meemoo || 'ContentPartner', NULL, NULL, i FROM n, iri
  UNION ALL SELECT id || 'OR-school1', a, meemoo || 'School', NULL, NULL, i FROM n, iri
  UNION ALL SELECT id || 'OR-edu1', a, meemoo || 'EducationalOrganization', NULL, NULL, i FROM n, iri
  -- ldap_mapping_school (school org, no address fixture)
  UNION ALL SELECT id || 'OR-school1', a, org || 'Organization', NULL, NULL, i FROM n, iri
  UNION ALL SELECT id || 'OR-school1', sch || 'identifier', 'OR-school1', NULL, NULL, l FROM n, lit
  UNION ALL SELECT id || 'OR-school1', skos || 'altLabel', 'School Org', NULL, NULL, l FROM n, lit
  UNION ALL SELECT id || 'OR-school1', org || 'hasPrimarySite', id || md5('OR-school1-primary'), NULL, NULL, i FROM n, iri
  UNION ALL SELECT id || 'OR-school1', org || 'hasSite', id || md5('OR-school1-primary'), NULL, NULL, i FROM n, iri
  UNION ALL SELECT id || md5('OR-school1-primary'), a, org || 'Site', NULL, NULL, i FROM n, iri
  -- ldap_mapping_unit: 3-hop structural join
  UNION ALL SELECT id || md5(ou), a, org || 'OrganizationalUnit', NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(ou), skos || 'prefLabel', name, NULL, NULL, l FROM ldap_unit, n, lit
  UNION ALL SELECT id || md5(ou), sch || 'identifier', ou, NULL, NULL, l FROM ldap_unit, n, lit
  UNION ALL SELECT id || md5(ou), org || 'unitOf', id || parent, NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || parent, org || 'hasUnit', id || md5(ou), NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(ou), org || 'hasPrimarySite', id || md5(ou || '-site'), NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(ou), org || 'hasSite', id || md5(ou || '-site'), NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(ou || '-site'), a, org || 'Site', NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(ou || '-site'), org || 'siteAddress', id || md5(street || postal || city), NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(street || postal || city), a, sch || 'PostalAddress', NULL, NULL, i FROM ldap_unit, n, iri
  UNION ALL SELECT id || md5(street || postal || city), sch || 'streetAddress', street, NULL, NULL, l FROM ldap_unit, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'addressCountry', 'BE', NULL, NULL, l FROM ldap_unit, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'postalCode', postal, NULL, NULL, l FROM ldap_unit, n, lit
  UNION ALL SELECT id || md5(street || postal || city), sch || 'addressLocality', city, NULL, NULL, l FROM ldap_unit, n, lit
  -- tl_companies_mapping_org
  UNION ALL SELECT id || orid, a, org || 'Organization', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, a, meemoo || 'ContentPartner', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, skos || 'prefLabel', name, NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || orid, sch || 'identifier', orid, NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || orid, dct || 'description', descr, NULL, 'nl', l FROM tl, n, lit
  UNION ALL SELECT id || orid, foaf || 'homepage', 'http://' || website, NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, org || 'classification', type_id || 'type_-_cultuur_instelling', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, meemoo || 'allowsOverlay', 'true', xsd || 'boolean', NULL, l FROM tl, n, lit
  UNION ALL SELECT id || orid, meemoo || 'allowsBZT', 'false', xsd || 'boolean', NULL, l FROM tl, n, lit
  UNION ALL SELECT id || orid, meemoo || 'requestForm', form, NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || orid, meemoo || 'hasAccountManager', id || md5(amid), NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(amid), meemoo || 'isAccountManagerOf', id || orid, NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, org || 'hasPrimarySite', id || md5(orid || '-site'), NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, org || 'hasSite', id || md5(orid || '-site'), NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(orid || '-site'), a, org || 'Site', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(orid || '-site'), org || 'siteAddress', id || md5(street || postal || city), NULL, NULL, i FROM tl, n, iri
  -- tl contact points (cp mapping + contactpoint mapping)
  UNION ALL SELECT id || orid, sch || 'contactPoint', id || md5(orid || '-primary'), NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, sch || 'contactPoint', id || md5(orid || '-ontsluiting'), NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || orid, sch || 'contactPoint', id || md5(orid || '-facturatie'), NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(orid || '-primary'), a, sch || 'ContactPoint', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(orid || '-primary'), sch || 'contactType', 'primary', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-primary'), sch || 'email', 'info@example.be', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-primary'), sch || 'telephone', '+3291234567', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-ontsluiting'), a, sch || 'ContactPoint', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(orid || '-ontsluiting'), sch || 'contactType', 'ontsluiting', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-ontsluiting'), sch || 'email', 'onts@example.be', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-ontsluiting'), sch || 'telephone', '+329000000', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-facturatie'), a, sch || 'ContactPoint', NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || md5(orid || '-facturatie'), sch || 'contactType', 'facturatie', NULL, NULL, l FROM tl, n, lit
  UNION ALL SELECT id || md5(orid || '-facturatie'), sch || 'email', 'fact@example.be', NULL, NULL, l FROM tl, n, lit
  -- tl_users_mapping: person + role post (the function-bearing user only)
  UNION ALL SELECT id || md5(uid), a, foaf || 'Agent', NULL, NULL, i FROM users, n, iri
  UNION ALL SELECT id || md5(uid), a, sch || 'Person', NULL, NULL, i FROM users, n, iri
  UNION ALL SELECT id || md5(uid), sch || 'givenName', fn, NULL, NULL, l FROM users, n, lit
  UNION ALL SELECT id || md5(uid), sch || 'familyName', ln, NULL, NULL, l FROM users, n, lit
  UNION ALL SELECT id || md5(uid), sch || 'email', 'mailto:' || email, NULL, NULL, l FROM users, n, lit
  UNION ALL SELECT id || md5(uid), sch || 'telephone', tel, NULL, NULL, l FROM users, n, lit WHERE tel IS NOT NULL
  UNION ALL SELECT id || md5(uid), org || 'holds', id || md5(uid || fun), NULL, NULL, i FROM users, n, iri WHERE fun IS NOT NULL
  UNION ALL SELECT id || md5(uid || fun), a, org || 'Post', NULL, NULL, i FROM users, n, iri WHERE fun IS NOT NULL
  UNION ALL SELECT id || md5(uid || fun), org || 'postIn', id || 'OR-w66976m', NULL, NULL, i FROM users, n, iri WHERE fun IS NOT NULL
  UNION ALL SELECT id || md5(uid || fun), org || 'role', role_id || replace(fun, ' ', '%20'), NULL, NULL, i FROM users, n, iri WHERE fun IS NOT NULL
  UNION ALL SELECT role_id || replace(fun, ' ', '%20'), a, org || 'Role', NULL, NULL, i FROM users, n, iri WHERE fun IS NOT NULL
  UNION ALL SELECT role_id || replace(fun, ' ', '%20'), skos || 'prefLabel', fun, NULL, 'nl', l FROM users, n, lit WHERE fun IS NOT NULL
  -- map_mam_tenants
  UNION ALL SELECT id || 'OR-w66976m', mh || 'label', 'Tenant display name', NULL, NULL, l FROM n, lit
  -- inline logo overlays (ml on the teamleader OR-ID, tl_ml on ldap orgs)
  UNION ALL SELECT id || orid, sch || 'logo', assets || orid, NULL, NULL, i FROM tl, n, iri
  UNION ALL SELECT id || 'OR-w66976m', sch || 'logo', assets || 'OR-w66976m', NULL, NULL, i FROM n, iri
  UNION ALL SELECT id || 'OR-school1', sch || 'logo', assets || 'OR-school1', NULL, NULL, i FROM n, iri
)
SELECT DISTINCT (SELECT g FROM n) AS graph, s, p, o AS o_value,
  dt AS o_type, lg AS o_lang, k AS o_kind
FROM quads
ORDER BY s, p, o_value""",
    "rdf_mapping_scale" ->
      """SELECT DISTINCT
           'http://ex/user_activity' AS graph,
           'http://ex/user/' || CAST(user_id AS VARCHAR) AS s,
           'http://ex/did' AS p,
           event_type AS o_value,
           CAST(NULL AS VARCHAR) AS o_type,
           CAST(NULL AS VARCHAR) AS o_lang,
           'literal' AS o_kind
         FROM events ORDER BY s, o_value""",
    "rdf_flatten_predicates" ->
      s"""SELECT p, count(*) AS n FROM (
            SELECT '$ns' || unnest(json_keys(props)) AS p FROM events)
          GROUP BY p ORDER BY p""",
    "rdf_flatten_typed_values" ->
      """SELECT round(avg(k), 4) AS avg_k, max(k) AS max_k, count(*) AS n
         FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events) t WHERE k IS NOT NULL""",
    "rdf_ntriples_roundtrip" ->
      """SELECT count(*) AS n_quads, count(*) AS n_subjects FROM events
         WHERE props IS NOT NULL""",
    // one typed-integer quad per event doc; the write/read roundtrip
    // must preserve count, subject identity AND the xsd datatype
    "rdf_hextuples_roundtrip" ->
      """SELECT count(*) AS n_quads, count(*) AS n_subjects,
            count(*) AS n_typed FROM events
         WHERE props IS NOT NULL""",
    "rdf_store_lifecycle" ->
      s"""SELECT '$graph' AS graph, count(*) AS n FROM events
          WHERE props IS NOT NULL""",
    "rdf_sparql_select" ->
      """SELECT DISTINCT event_type AS etype,
           CAST(user_id AS VARCHAR) AS uid
         FROM events WHERE event_type LIKE 'p%'
         ORDER BY etype, uid LIMIT 100""",
    // fixture-driven but fully deterministic: the oracle CONSTRUCTS the
    // expected graph state (skolem IRIs + md5 hashes) in SQL
    "rdf_sparql_update" ->
      """SELECT * FROM (
           SELECT 'http://ex/out' AS graph, 'http://ex/u/' || n AS s,
             'http://ex/hash' AS p, md5(n || sc) AS o_value,
             CAST(NULL AS VARCHAR) AS o_type, CAST(NULL AS VARCHAR) AS o_lang,
             'literal' AS o_kind
           FROM (VALUES ('Alpha', '10'), ('Beta', '7')) t(n, sc)
           UNION ALL
           SELECT 'http://ex/out', 'http://ex/u/' || n, 'http://ex/label',
             n, NULL, NULL, 'literal'
           FROM (VALUES ('Alpha'), ('Beta')) t(n)) u
         ORDER BY s, p, o_value""",
    // constructed state: only the derived graph survives the request —
    // src's rows were deleted by op3, so the oracle enumerates op2's
    // uppercased labels plus op4's marker
    "rdf_sparql_update_seq" ->
      """SELECT * FROM (
           SELECT 'http://ex/out' AS graph, 'http://ex/' || s AS s,
             'http://ex/o/label' AS p, upper(n) AS o_value,
             CAST(NULL AS VARCHAR) AS o_type, CAST(NULL AS VARCHAR) AS o_lang,
             'literal' AS o_kind
           FROM (VALUES ('a', 'Alpha'), ('b', 'Beta')) t(s, n)
           UNION ALL
           SELECT 'http://ex/out', 'http://ex/run', 'http://ex/status',
             'done', NULL, NULL, 'literal') u
         ORDER BY graph, s, p, o_value""",
    "rdf_sparql_minus" ->
      """SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS c,
           c_mktsegment AS seg
         FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
           AND c_nationkey <> 7
         ORDER BY c""",
    "rdf_sparql_union" ->
      """SELECT uid, kind FROM (
           SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid, 'v' AS kind
           FROM events WHERE event_type = 'view'
           UNION
           SELECT DISTINCT CAST(user_id AS VARCHAR), 'p'
           FROM events WHERE event_type = 'purchase') t
         ORDER BY uid, kind""",
    // constructed state: per-kind routed quads minus the var-graph
    // DELETE's match ("1" erased wherever it lives)
    "rdf_sparql_quad_template" ->
      """SELECT * FROM (VALUES
           ('http://ex/by/blue', 'http://ex/b', 'http://ex/val', '2'),
           ('http://ex/by/red',  'http://ex/c', 'http://ex/val', '3'))
           t(graph, s, p, o_value)
         ORDER BY graph, s""",
    // constructed state: only the post-CLEAR-NAMED insert survives
    "rdf_clear_scopes" ->
      """SELECT 'http://ex/g3' AS graph, 'http://ex/k' AS s,
           'http://ex/p' AS p, 'kept' AS o_value""",
    // VoID statistics recomputed relationally: each event mints one
    // subject and one triple per non-null flattened field
    // sameAs smushing replayed from first principles: recursive-CTE
    // closure over the symmetrized identity edges (the dedup_clusters
    // pattern), rep = lexicographic min of the reachable set, then the
    // subject/object rewrite with the literal guard
    "rdf_sameas_canonicalize" ->
      """WITH RECURSIVE
          cu AS (SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS s,
                   c_custkey AS k, c_nationkey, c_mktsegment
                 FROM customer),
          facts AS (
            SELECT s, 'nation' AS p,
              'nation:' || CAST(c_nationkey AS VARCHAR) AS o_value,
              'iri' AS o_kind FROM cu
            UNION ALL SELECT s, 'segment', c_mktsegment, 'literal' FROM cu
            UNION ALL SELECT s, 'next',
              'cust:' || CAST(k + 1 AS VARCHAR), 'iri' FROM cu),
          e AS (SELECT s AS a, 'cust:' || CAST(k - 1 AS VARCHAR) AS b
                FROM cu WHERE k % 10 <> 1),
          bi AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
          reach(a, b) AS (
            SELECT a, b FROM bi
            UNION
            SELECT r.a, x.b FROM reach r JOIN bi x ON r.b = x.a),
          rep AS (SELECT a AS n, least(a, min(b)) AS canon
                  FROM reach GROUP BY a)
        SELECT DISTINCT
          COALESCE(rs.canon, f.s) AS s, f.p,
          CASE WHEN f.o_kind = 'iri' THEN COALESCE(ro.canon, f.o_value)
               ELSE f.o_value END AS o_value,
          f.o_kind
        FROM facts f
        LEFT JOIN rep rs ON rs.n = f.s
        LEFT JOIN rep ro ON ro.n = f.o_value
        ORDER BY s, p, o_value, o_kind""",
    "rdf_void_summary" ->
      s"""WITH c AS (
            SELECT count(event_type) AS ct, count(user_id) AS cu,
                   count(event_id) AS ce,
                   count(CASE WHEN event_type IS NOT NULL
                           OR user_id IS NOT NULL
                           OR event_id IS NOT NULL THEN 1 END) AS ds
            FROM events),
          parts AS (
            SELECT '${ns}event_type' AS prop, ct AS n FROM c WHERE ct > 0
            UNION ALL
            SELECT '${ns}user_id', cu FROM c WHERE cu > 0
            UNION ALL
            SELECT '${ns}event_id', ce FROM c WHERE ce > 0)
          SELECT * FROM (
            SELECT 'urn:graft:void:dataset' AS s,
                   'http://rdfs.org/ns/void#triples' AS p,
                   CAST(ct + cu + ce AS VARCHAR) AS o_value FROM c
            UNION ALL
            SELECT 'urn:graft:void:dataset',
                   'http://rdfs.org/ns/void#distinctSubjects',
                   CAST(ds AS VARCHAR) FROM c
            UNION ALL
            SELECT 'urn:graft:void:dataset',
                   'http://rdfs.org/ns/void#properties',
                   CAST((SELECT count(*) FROM parts) AS VARCHAR) FROM c
            UNION ALL
            SELECT 'urn:graft:void:part:' || prop,
                   'http://rdfs.org/ns/void#property', prop FROM parts
            UNION ALL
            SELECT 'urn:graft:void:part:' || prop,
                   'http://rdfs.org/ns/void#triples',
                   CAST(n AS VARCHAR) FROM parts) u
          ORDER BY s, p, o_value""",
    "rdf_sparql_stats_join" ->
      """SELECT CAST(p.user_id AS VARCHAR) AS uid, count(*) AS n
         FROM events p JOIN events e2 ON p.user_id = e2.user_id
         WHERE p.event_type = 'purchase' AND e2.event_type = 'error'
         GROUP BY p.user_id
         ORDER BY uid""",
    "rdf_sparql_service" ->
      """SELECT CASE event_type
               WHEN 'view' THEN 'browse' WHEN 'click' THEN 'browse'
               WHEN 'signup' THEN 'acquire' WHEN 'purchase' THEN 'convert'
               WHEN 'error' THEN 'ops' END AS stage,
           count(*) AS n_events
         FROM events
         GROUP BY stage
         ORDER BY stage""",
    "rdf_sparql_groupby" ->
      """SELECT c_mktsegment AS seg, count(*) AS n,
           floor(avg(c_acctbal) * 10000 + 0.5) / 10000 AS avg_bal
         FROM customer
         GROUP BY c_mktsegment
         HAVING count(*) > 10
         ORDER BY n DESC, seg""",
    "rdf_sparql_groupby_noagg" ->
      """SELECT c_mktsegment AS seg
         FROM customer
         GROUP BY c_mktsegment
         HAVING count(*) > 10
         ORDER BY seg""",
    "rdf_sparql_group_concat" ->
      """SELECT CAST(n_regionkey AS VARCHAR) AS r,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           string_agg(DISTINCT n_name, '|' ORDER BY n_name) AS dnames
         FROM nation
         GROUP BY n_regionkey
         ORDER BY r""",
    "rdf_graph_management" ->
      """SELECT 'http://ex/A' AS graph, CAST(count(*) AS BIGINT) AS n
           FROM nation
         UNION ALL
         SELECT 'http://ex/C', CAST(count(*) AS BIGINT) FROM region
         UNION ALL
         SELECT 'http://ex/D',
           CAST((SELECT count(*) FROM nation)
              + (SELECT count(*) FROM region) AS BIGINT)
         UNION ALL
         SELECT 'http://ex/E', CAST(count(*) AS BIGINT) FROM nation
         UNION ALL
         SELECT 'http://ex/F', CAST(count(*) AS BIGINT) FROM nation
         UNION ALL
         SELECT 'urn:graft:default', CAST(count(*) AS BIGINT) FROM nation
         ORDER BY graph""",
    "rdf_sparql_ask" ->
      "SELECT 1 AS positive, 0 AS negative",
    // the selected subjects' own triples (name + addr-bnode edges) plus
    // the described blank nodes' triples (region), exactly the bounded
    // closure the engine walks
    "rdf_sparql_describe" ->
      """WITH sel AS (SELECT n_nationkey AS k, n_name, n_regionkey
                      FROM nation WHERE n_name LIKE 'NATION\_1%' ESCAPE '\'),
          described AS (
            SELECT 'nation:' || CAST(k AS VARCHAR) AS s, 'name' AS p,
                   n_name AS o_value, 'literal' AS o_kind FROM sel
            UNION ALL
            SELECT 'nation:' || CAST(k AS VARCHAR), 'addr',
                   '_:b' || CAST(k AS VARCHAR), 'bnode' FROM sel
            UNION ALL
            SELECT '_:b' || CAST(k AS VARCHAR), 'region',
                   CAST(n_regionkey AS VARCHAR), 'literal' FROM sel)
         SELECT s, p, o_value, o_kind FROM described
         ORDER BY s, p, o_value""",
    "rdf_sparql_exists" ->
      """SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS c
         FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)
           AND c_custkey NOT IN
             (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
         ORDER BY c""",
    "rdf_sparql_subquery" ->
      """SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS c,
           c_mktsegment AS seg,
           CAST(count(*) OVER (PARTITION BY c_mktsegment) AS VARCHAR) AS n
         FROM customer
         ORDER BY c""",
    "rdf_sparql_modify" ->
      """SELECT s, p, o_value FROM (
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
             'name' AS p, n_name AS o_value
           FROM nation WHERE NOT starts_with(n_name, 'NATION_1')
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'name',
             n_name || '_V2'
           FROM nation WHERE starts_with(n_name, 'NATION_1')
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'renamed', 'true'
           FROM nation WHERE starts_with(n_name, 'NATION_1')) t
         ORDER BY s, p, o_value""",
    "rdf_sparql_graph_var" ->
      """SELECT CASE WHEN n_nationkey % 2 = 0
                THEN 'http://ex/even' ELSE 'http://ex/odd' END AS g,
           'nation:' || CAST(n_nationkey AS VARCHAR) AS s
         FROM nation WHERE starts_with(n_name, 'NATION_1')
         ORDER BY g, s""",
    // only odd nations survive: the GRAPH pattern can only match inside
    // the FROM NAMED graph (the odd partition)
    "rdf_sparql_from_named" ->
      """SELECT 'http://ex/odd' AS g,
           'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
           n_name AS n
         FROM nation WHERE n_nationkey % 2 = 1
         ORDER BY s""",
    "rdf_sparql_path" ->
      """SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS c, r_name AS rn
         FROM customer
           JOIN nation ON n_nationkey = c_nationkey
           JOIN region ON r_regionkey = n_regionkey
         ORDER BY c, rn""",
    "rdf_sparql_path_closure" ->
      """SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS x
         FROM nation WHERE n_nationkey > 0
         ORDER BY x""",
    // id-space twin: same chain, same reachable set
    "rdf_dict_path" ->
      """SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS x
         FROM nation WHERE n_nationkey > 0
         ORDER BY x""",
    // chain reachability from each tagged seed: everything strictly
    // after it on the 0→24 chain
    "rdf_sparql_path_seeded" ->
      """SELECT 'nation:' || CAST(s.sk AS VARCHAR) AS s,
           'nation:' || CAST(n.n_nationkey AS VARCHAR) AS x
         FROM (VALUES (0), (20)) s(sk)
         JOIN nation n ON n.n_nationkey > s.sk
         ORDER BY s, x""",
    // `*` reaches every chain node including nation:0 itself (25 x);
    // `?` adds per-x the zero-length identity and, below the chain end,
    // the one-hop successor
    "rdf_sparql_path_star" ->
      """SELECT 'nation:' || CAST(a AS VARCHAR) AS x,
           'nation:' || CAST(b AS VARCHAR) AS y
         FROM (
           SELECT n_nationkey AS a, n_nationkey AS b FROM nation
           UNION ALL
           SELECT n_nationkey, n_nationkey + 1 FROM nation
           WHERE n_nationkey < 24) t
         ORDER BY x, y""",
    // fwd branch: every edge whose predicate is not 'next' (in_region);
    // inv branch (^urn:none excludes nothing): every edge inverted
    "rdf_sparql_path_neg" ->
      """WITH inreg AS (
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
                  'region:' || CAST(n_regionkey AS VARCHAR) AS o
           FROM nation),
         nxt AS (
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
                  'nation:' || CAST(n_nationkey + 1 AS VARCHAR) AS o
           FROM nation WHERE n_nationkey < 24)
         SELECT s, o FROM (
           SELECT s, o FROM inreg
           UNION ALL SELECT o AS s, s AS o FROM inreg
           UNION ALL SELECT o AS s, s AS o FROM nxt) u
         ORDER BY s, o""",
    "rdf_sparql_construct" ->
      """SELECT 'urn:regions' AS graph,
           'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
           'in_region' AS p,
           CAST(n_regionkey AS VARCHAR) AS o_value,
           CAST(NULL AS VARCHAR) AS o_type,
           CAST(NULL AS VARCHAR) AS o_lang,
           'literal' AS o_kind
         FROM nation WHERE n_regionkey IN (0, 2)
         ORDER BY s""",
    // integral-double lexical forms ("85.0") match across engines;
    // the fractional arithmetic lives in the WHERE predicate only
    "rdf_sparql_filter_expr" ->
      """SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS c,
           c_mktsegment AS seg,
           CAST(length(c_mktsegment) * 10.0 + 5 AS VARCHAR) AS n
         FROM customer
         WHERE c_acctbal * 2 - 100 > 1900 AND c_acctbal <= 9000
           AND (c_mktsegment IN ('BUILDING', 'MACHINERY')
                OR regexp_matches(c_mktsegment, '^auto', 'i'))
           AND c_mktsegment NOT IN ('FURNITURE')
           AND contains(c_mktsegment, 'I')
           AND length(c_mktsegment) >= 8
         ORDER BY c""",
    // accessor fields recomputed relationally on the shifted wall-clock
    // the engine wrote into the lexical form; seconds truncate micros to
    // the millis the "SSS" format kept
    "rdf_sparql_datetime" ->
      """SELECT 'ev:' || CAST(event_id AS VARCHAR) AS e,
           year(t2) AS y, month(t2) AS mo, day(t2) AS d,
           hour(t2) AS h, minute(t2) AS mi,
           CAST(floor(epoch_us(t2) % 60000000 / 1000) / 1000.0 AS DOUBLE) AS sec,
           CASE WHEN event_id % 2 = 0 THEN 'Z' ELSE '+02:00' END AS tz,
           sha256(event_type) AS dig
         FROM (SELECT event_id, event_type,
                 CASE WHEN event_id % 2 = 0 THEN ts
                      ELSE ts + INTERVAL 2 HOUR END AS t2
               FROM events)
         ORDER BY e""",
    "rdf_sparql_values_builtins" ->
      """SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS c,
           c_mktsegment AS seg,
           'Name-' || CAST(c_custkey AS VARCHAR) AS nm
         FROM customer
         WHERE c_custkey % 2 = 0
           AND c_mktsegment IN ('BUILDING', 'MACHINERY')
         ORDER BY c""",
    "rdf_sparql_delete" ->
      """SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
           n_name AS o_value
         FROM nation WHERE NOT starts_with(n_name, 'NATION_1')
         ORDER BY s""",
    "rdf_sparql_delete_mor" ->
      """SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
           n_name AS o_value
         FROM nation WHERE NOT starts_with(n_name, 'NATION_1')
         ORDER BY s""",
    // expected merged set: %5<>0 keep their b1 insert; %20=0 (= %4 AND
    // %5) are tombstoned then revived by the b4 re-insert; %10=0 carry
    // the b3 updated value as an additional quad identity. The plain
    // %4=0 re-inserts collapse into their live b1 rows (no extra rows).
    // three expected snapshot states: v1 = full load; v2 = tombstones
    // applied (%5=0 gone); v4 = current (the rdf_store_mor set)
    // both snapshot states recomputed from nation; FILTER mirrors
    // STRLEN >= 5 on the value
    "rdf_sparql_asof" ->
      """WITH v1 AS (
           SELECT 'http://ex/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                  n_name AS name
           FROM nation),
         v3 AS (
           SELECT 'http://ex/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
                  n_name AS name
           FROM nation WHERE n_nationkey % 5 <> 0
           UNION ALL
           SELECT 'http://ex/nation/' || CAST(n_nationkey AS VARCHAR),
                  n_name || '#v2'
           FROM nation WHERE n_nationkey % 10 = 0)
         SELECT version, s, name FROM (
           SELECT 1 AS version, s, name FROM v1 WHERE len(name) >= 5
           UNION ALL
           SELECT 3, s, name FROM v3 WHERE len(name) >= 5)
         ORDER BY version, s, name""",
    "rdf_store_timetravel" ->
      """SELECT version, s, o_value FROM (
           SELECT CAST(1 AS BIGINT) AS version,
             'nation:' || CAST(n_nationkey AS VARCHAR) AS s, n_name AS o_value
           FROM nation
           UNION ALL
           SELECT 2, 'nation:' || CAST(n_nationkey AS VARCHAR), n_name
           FROM nation WHERE n_nationkey % 5 <> 0
           UNION ALL
           SELECT 4, 'nation:' || CAST(n_nationkey AS VARCHAR), n_name
           FROM nation WHERE n_nationkey % 5 <> 0
           UNION ALL
           SELECT 4, 'nation:' || CAST(n_nationkey AS VARCHAR), n_name
           FROM nation WHERE n_nationkey % 20 = 0
           UNION ALL
           SELECT 4, 'nation:' || CAST(n_nationkey AS VARCHAR), n_name || '#v2'
           FROM nation WHERE n_nationkey % 10 = 0) t
         ORDER BY version, s, o_value""",
    // CDF windows recomputed as net effects: (1→2] = the tombstone
    // batch, (2→4] = #v2 inserts + k%20 revivals (re-inserts of
    // still-live quads net to nothing and must NOT appear)
    "rdf_store_cdc" ->
      """SELECT w_from, w_to, change, s, o_value FROM (
           SELECT CAST(1 AS BIGINT) AS w_from, CAST(2 AS BIGINT) AS w_to,
             'delete' AS change,
             'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
             n_name AS o_value
           FROM nation WHERE n_nationkey % 5 = 0
           UNION ALL
           SELECT 2, 4, 'insert',
             'nation:' || CAST(n_nationkey AS VARCHAR), n_name || '#v2'
           FROM nation WHERE n_nationkey % 10 = 0
           UNION ALL
           SELECT 2, 4, 'insert',
             'nation:' || CAST(n_nationkey AS VARCHAR), n_name
           FROM nation WHERE n_nationkey % 20 = 0) t
         ORDER BY w_from, change, s, o_value""",
    // incremental maintenance ≡ recompute: the expected output is the
    // batch-4 state's letter histogram computed directly — if the
    // CDF fold drifted from the recompute by even one group, the hash
    // would break
    "rdf_cdc_refresh" ->
      """SELECT vlen, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT CAST(len(n_name) AS BIGINT) AS vlen
           FROM nation WHERE n_nationkey % 5 <> 0
           UNION ALL
           SELECT CAST(len(n_name) AS BIGINT)
           FROM nation WHERE n_nationkey % 20 = 0
           UNION ALL
           SELECT CAST(len(n_name) + 3 AS BIGINT)
           FROM nation WHERE n_nationkey % 10 = 0) t
         GROUP BY vlen ORDER BY vlen""",
    // id-space CDF twin, one (1→4] window: still-tombstoned deletes
    // (k%5==0 minus the revived k%20==0) + the #v2 inserts
    "rdf_dict_cdc" ->
      """SELECT change, s, o_value FROM (
           SELECT 'delete' AS change,
             'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
             n_name AS o_value
           FROM nation
           WHERE n_nationkey % 5 = 0 AND n_nationkey % 20 <> 0
           UNION ALL
           SELECT 'insert',
             'nation:' || CAST(n_nationkey AS VARCHAR), n_name || '#v2'
           FROM nation WHERE n_nationkey % 10 = 0) t
         ORDER BY change, s, o_value""",
    // dict-encoded MOR twin: same oracle expression (shared state)
    "rdf_dict_mor" ->
      """SELECT s, p, o_value FROM (
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
             'name' AS p, n_name AS o_value
           FROM nation WHERE n_nationkey % 5 <> 0
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'name', n_name
           FROM nation WHERE n_nationkey % 20 = 0
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'name',
             n_name || '#v2'
           FROM nation WHERE n_nationkey % 10 = 0) t
         ORDER BY s, o_value""",
    "rdf_store_mor" ->
      """SELECT s, p, o_value FROM (
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
             'name' AS p, n_name AS o_value
           FROM nation WHERE n_nationkey % 5 <> 0
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'name', n_name
           FROM nation WHERE n_nationkey % 20 = 0
           UNION ALL
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 'name',
             n_name || '#v2'
           FROM nation WHERE n_nationkey % 10 = 0) t
         ORDER BY s, o_value""",
    // identical state in BOTH phases (read-equivalence across
    // compaction) and the two policy gates as checked constants:
    // compacted = the trigger fired, files_reduced = the post-compaction
    // delta scan reads fewer files than the pre-compaction tail
    "rdf_store_compact" ->
      """WITH state AS (
           SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS s,
             'name' AS p, n_name AS o_value FROM nation
           UNION ALL SELECT 'nation:0', 'rev', 'r6'),
          phases AS (SELECT 'pre' AS phase UNION ALL SELECT 'post')
         SELECT phase, s, p, o_value, 1 AS compacted, 1 AS files_reduced
         FROM phases, state
         ORDER BY phase, s, p, o_value""")
}
