package graft

import org.apache.spark.sql.DataFrame

import graft.model.QuadStore
import graft.sparql.{Compiler, SparqlParser}
import graft.sparql.SparqlParser._

/** The engine's SPARQL-update entry point (operator S7 — the reference's
  * `SparqlUpdateHook.sparql_update`, `sparql_update.py:77-106`, re-homed:
  * instead of POSTing text to a store, the text is parsed, compiled to
  * DataFrame ops, and executed against the partitioned quad store).
  *
  * Backend-agnostic: runs on the merge-on-write [[graft.model.GraphStore]]
  * or the O(delta) [[graft.model.MergeOnReadStore]] — INSERT/DELETE map
  * to eager dedup/rewrite on the former, delta/tombstone appends on the
  * latter, with identical observable graph state.
  */
final class GraphEngine(val store: QuadStore) {

  // cost-based BGP ordering, opt-in per engine (see CardEstimator)
  private var stats: Option[graft.sparql.CardEstimator] = None

  /** Gather per-predicate cardinalities from the store's CURRENT state
    * (one vocabulary-sized aggregate) and plan every subsequent query
    * on this engine with data-driven pattern ordering instead of the
    * static shape rank. Call again after bulk loads to refresh. */
  def withCardinalityStats(): GraphEngine = {
    stats = Some(store match {
      // dict mode: aggregate the id columns directly — no whole-store
      // decode just to count per-predicate cardinalities
      case d: graft.model.DictBackend =>
        graft.sparql.CardEstimator.fromDictStore(d)
      case _ => graft.sparql.CardEstimator.fromQuads(store.read())
    })
    this
  }

  /** Plan with the store's PERSISTED stats artifact
    * ([[graft.sparql.StoreStats]] — written once, refreshed
    * delta-sized on append): two vocabulary-sized parquet reads, no
    * store scan — the 100 TB planner-startup path, where statistics
    * are metadata the store maintains, not a per-engine aggregate. */
  def withStoredStats(): GraphEngine = {
    stats = Some(graft.sparql.StoreStats.load(store))
    this
  }

  /** Run plan construction with this engine's stats in planner scope —
    * and, over a [[graft.model.DictBackend]] store, a fresh per-operation
    * [[graft.sparql.DictContext]] (fresh so the constant-id memo can
    * never go stale across an update sequence that grows the dict). */
  private def planned[T](f: => T): T =
    graft.sparql.CardEstimator.current.withValue(stats) {
      dictStore match {
        case Some(d) => graft.sparql.DictContext.current.withValue(
          Some(new graft.sparql.DictContext(d.readDict())))(f)
        case None => f
      }
    }

  // ---- dict mode (id-space execution): when the store is dictionary-
  // encoded, the compiler receives `(graph, s_id, p_id, o_id)` frames —
  // pattern blocks then join longs and decode at the block boundary
  // (Compiler.compilePatternEncoded / joinPatternBatch) — instead of the
  // decoded string view, whose joins would shuffle full IRI text.
  private def dictStore: Option[graft.model.DictBackend] = store match {
    case d: graft.model.DictBackend => Some(d)
    case _ => None
  }

  /** Whole-store scope in the compiler's preferred representation. */
  private def scopeAll(): DataFrame =
    dictStore.map(_.readEncoded()).getOrElse(store.read())

  /** Graph-restricted scope, partition-pruned on either backend. */
  private def scopeGraphs(graphs: Seq[String]): DataFrame =
    dictStore.map(_.readGraphsEncoded(graphs)).getOrElse(store.readGraphs(graphs))

  /** Execute a SPARQL update *request* (§3.1): one or more operations
    * (INSERT..WHERE / INSERT DATA / DELETE..WHERE / DELETE DATA /
    * CLEAR / DROP / COPY / MOVE / ADD / LOAD) separated by `;`, run
    * strictly in sequence — each operation reads the store state the
    * previous one left (the reference posts whole update files to
    * Stardog, which executes them with exactly these semantics). */
  def update(text: String, name: String = "update"): Unit =
    SparqlParser.parseRequest(text, name).foreach(execute)

  private def execute(op: SparqlParser.UpdateOp): Unit = planned {
    op match {
      case InsertWhere(q) =>
        // the compiled template writes only q.targetGraph — pass it so
        // the anti-join scope needs no extra batch computation
        store.appendDistinct(Compiler.run(q, whereDefault(q.targetGraph, q.usingGraphs),
          namedScope(q.usingGraphs, q.usingNamed)), Some(Seq(q.targetGraph)))
      case InsertData(quads) => store.insertData(quads)
      case DeleteWhere(q) =>
        store.deleteQuads(Compiler.run(q, whereDefault(q.targetGraph, q.usingGraphs),
          namedScope(q.usingGraphs, q.usingNamed)), Some(Seq(q.targetGraph)))
      case DeleteData(quads) => store.deleteData(quads)
      case ModifyWhere(delG, insG, using, where, delT, insT, usingNamed) =>
        // ONE binding evaluation feeds both templates, materialized
        // BEFORE mutating so both see the pre-update state (§3.1.3).
        // localCheckpoint — not persist — because the lineage must be
        // CUT, not just cached: the insert step's store write triggers
        // Spark's refreshByPath, which re-caches any dependent persisted
        // plan by RE-EXECUTING it — against file listings the delete
        // step already rewrote (a crash on the dict store, whose
        // dictionary append refreshes mid-op; silent post-state reads
        // on any backend if the cache ever dropped a partition).
        // One-template modifies (DELETE-only / INSERT-only) skip both
        // the other template's empty-batch store write AND the
        // checkpoint: with a single mutation there is no post-mutation
        // read of the bindings, so the lineage-cut is unnecessary — a
        // lifecycle running many small updates pays two fewer Spark
        // jobs per operation (the r13 delete_mor adjudication).
        val both = delT.nonEmpty && insT.nonEmpty
        val b0 = Compiler.bindingsOf(where, whereDefault(delG, using),
          namedScope(using, usingNamed))
        val b = if (both) b0.localCheckpoint() else b0
        if (delT.nonEmpty)
          store.deleteQuads(Compiler.instantiateTemplate(b, delT, delG),
            Some(Seq(delG)))
        if (insT.nonEmpty)
          store.appendDistinct(Compiler.instantiateTemplate(b, insT, insG),
            Some(Seq(insG)))
      case QuadModifyWhere(delT, insT, using, where, usingNamed) =>
        // variable/mixed-graph templates: one pre-state binding
        // evaluation feeds both templates (§3.1.3, same as ModifyWhere);
        // target graphs come from the data, so the store computes its
        // own graph scope (a bounded distinct over the instantiated
        // batch). Empty USING scopes like SELECT: the whole store.
        val scoped =
          if (using.isEmpty) scopeAll() else scopeGraphs(using)
        // localCheckpoint for the same lineage-cut reason as ModifyWhere
        val b = Compiler.bindingsOf(where, scoped,
          namedScope(using, usingNamed)).localCheckpoint()
        if (delT.nonEmpty)
          store.deleteQuads(Compiler.instantiateQuads(b, delT))
        if (insT.nonEmpty)
          store.appendDistinct(Compiler.instantiateQuads(b, insT))
      case ClearGraphOp(g, _) => store.clearGraph(g)
      case DropGraphOp(g, _) => store.dropGraph(g)
      // §3.2.2-3: scope resolves against the store's CURRENT graph list
      // (a metadata listing); DEFAULT targets the unnamed graph's
      // storage name. CLEAR and DROP coincide here — on this store a
      // graph exists exactly while it has content.
      case ClearScopeOp(scope, _) =>
        val targets = scope match {
          case "DEFAULT" => Seq(graft.model.Quad.DefaultGraph)
          case "NAMED" =>
            store.graphNames().filterNot(_ == graft.model.Quad.DefaultGraph)
          case _ => store.graphNames()
        }
        targets.foreach(store.clearGraph)
      // §3.2.3-5: COPY/MOVE/ADD of a graph onto itself is a no-op. The
      // guard is also a correctness requirement here: copyInto clears the
      // target eagerly while the source read is a lazy scan, so without it
      // a same-graph COPY would read back the already-cleared partition.
      case CopyGraphOp(from, to, _) =>
        if (from != to) copyInto(from, to, replace = true)
      case MoveGraphOp(from, to, _) =>
        if (from != to) { copyInto(from, to, replace = true); store.dropGraph(from) }
      case AddGraphOp(from, to, _) =>
        if (from != to) copyInto(from, to, replace = false)
      case LoadOp(source, graph, _) =>
        // file URL → local path; reader picked by extension, matching the
        // reference's any-rdflib-format ingest (sparql_update.py:124-133)
        val path = source.stripPrefix("file://")
        val g = graph.getOrElse(graft.model.Quad.DefaultGraph)
        // quad-scoped formats (N-Quads, TriG, JSON-LD) keep each
        // statement's own graph label unless INTO GRAPH overrides;
        // triple-scoped formats land wholesale in the target graph
        if (path.endsWith(".nq") || path.endsWith(".trig") ||
          path.endsWith(".jsonld") || path.endsWith(".json-ld") ||
          path.endsWith(".trix")) {
          val quads0 =
            if (path.endsWith(".nq"))
              graft.rdf.NTriples.readQuads(store.spark, path, g)
            else if (path.endsWith(".trig"))
              graft.rdf.Turtle.readTrig(store.spark, path, g)
            else if (path.endsWith(".trix"))
              graft.rdf.TriX.read(store.spark, path, g)
            else graft.rdf.JsonLd.read(store.spark, path, g)
          val quads = graph match {
            case Some(target) => quads0.toDF()
              .withColumn("graph", org.apache.spark.sql.functions.lit(target))
            case None => quads0.toDF()
          }
          store.appendDistinct(quads, graph.map(Seq(_)))
        } else {
          val quads =
            // .n3 routes to the Turtle parser: Notation3 is a Turtle
            // superset and real-world .n3 data files are almost always
            // plain Turtle (rdflib's own n3 parser reads Turtle); N3
            // formula/rule syntax is out of scope and fails loudly
            if (path.endsWith(".ttl") || path.endsWith(".n3"))
              graft.rdf.Turtle.read(store.spark, path, g)
            else if (path.endsWith(".rdf") || path.endsWith(".xml") ||
              path.endsWith(".owl")) graft.rdf.RdfXml.read(store.spark, path, g)
            else graft.rdf.NTriples.read(store.spark, path, g)
          store.appendDistinct(quads.toDF(), Some(Seq(g)))
        }
    }
  }

  /** COPY/ADD body: rebind `from`'s quads to `to` and insert; `replace`
    * clears the target first (COPY/MOVE §3.2.3-4) — both sides are one
    * partition-pruned scan plus one append, never a full-store rewrite. */
  private def copyInto(from: String, to: String, replace: Boolean): Unit = {
    import org.apache.spark.sql.functions.lit
    if (replace) store.clearGraph(to)
    store.appendDistinct(
      store.readGraphs(Seq(from)).withColumn("graph", lit(to)),
      Some(Seq(to)))
  }

  /** Execute a SPARQL SELECT (read side): FROM graphs scope the store
    * read (partition pruning, like USING), the WHERE group compiles to
    * the same DataFrame plan as a mapping query, and the projection
    * returns one column per selected variable. */
  def select(text: String, name: String = "select"): DataFrame = planned {
    val q = SparqlParser.parseSelect(text, name)
    val scoped =
      if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) scopeAll()
      else scopeGraphs(q.fromGraphs)
    Compiler.runSelect(q, scoped, namedScope(q.fromGraphs, q.fromNamed))
  }

  /** SELECT keeping full `(v,k,dt,lg)` term structs — the input the
    * W3C results serializers need (see [[graft.sparql.SparqlResults]]). */
  def selectTerms(text: String, name: String = "select"): DataFrame = planned {
    val q = SparqlParser.parseSelect(text, name)
    val scoped =
      if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) scopeAll()
      else scopeGraphs(q.fromGraphs)
    Compiler.runSelectTerms(q, scoped, namedScope(q.fromGraphs, q.fromNamed))
  }

  /** W3C SPARQL 1.1 Query Results JSON document for a SELECT. */
  def selectJson(text: String): String =
    graft.sparql.SparqlResults.jsonDocument(selectTerms(text))

  /** W3C boolean results JSON document for an ASK. */
  def askJson(text: String): String =
    graft.sparql.SparqlResults.askJsonDocument(ask(text))

  /** W3C results CSV document (lexical values, RFC 4180). */
  def selectCsv(text: String): String =
    graft.sparql.SparqlResults.csvDocument(selectTerms(text))

  /** W3C results TSV document (full SPARQL term syntax). */
  def selectTsv(text: String): String =
    graft.sparql.SparqlResults.tsvDocument(selectTerms(text))

  /** W3C SPARQL Query Results XML document for a SELECT. */
  def selectXml(text: String): String =
    graft.sparql.SparqlResults.xmlDocument(selectTerms(text))

  /** W3C boolean results XML document for an ASK. */
  def askXml(text: String): String =
    graft.sparql.SparqlResults.askXmlDocument(ask(text))

  /** File-streaming exports of the same four result documents: per-row
    * serialization runs distributed and the document streams to ONE
    * file with constant driver memory — the form a billion-row SELECT
    * export takes, where the in-memory `select*` documents above are
    * protocol-response-sized by definition. Byte-identical to their
    * collect()-based twins (SparqlResultsSpec proves it per format). */
  def selectJsonToFile(text: String, path: String): Unit =
    graft.sparql.SparqlResults.writeJsonDocument(selectTerms(text), path)

  def selectCsvToFile(text: String, path: String): Unit =
    graft.sparql.SparqlResults.writeCsvDocument(selectTerms(text), path)

  def selectTsvToFile(text: String, path: String): Unit =
    graft.sparql.SparqlResults.writeTsvDocument(selectTerms(text), path)

  def selectXmlToFile(text: String, path: String): Unit =
    graft.sparql.SparqlResults.writeXmlDocument(selectTerms(text), path)

  /** The GRAPH-pattern dataset (SPARQL 1.1 13.2): with no dataset clause
    * GRAPH ranges over the whole store (None = same as the default
    * scope); any FROM/FROM NAMED makes the dataset explicit, so GRAPH
    * sees exactly the FROM NAMED graphs — an empty scan when only FROM
    * was given. */
  /** WHERE-clause default graph for updates (SPARQL 1.1 Update §3.1.3):
    * the USING graphs when given; otherwise — the operation declares no
    * dataset — the WITH graph (or the unnamed default graph), never an
    * empty scope. */
  private def whereDefault(target: String, using: Seq[String]): DataFrame =
    scopeGraphs(if (using.nonEmpty) using else Seq(target))

  /** Named-graph scope for GRAPH patterns. No dataset declared at all →
    * the whole graph store (§3.1.3: a WITH-only update still sees every
    * named graph; the SELECT path reaches the same behavior through the
    * GraphE fallback). Explicit USING without USING NAMED → the spec's
    * empty named set. */
  private def namedScope(fromGraphs: Seq[String],
      fromNamed: Seq[String]): Option[DataFrame] =
    if (fromGraphs.isEmpty && fromNamed.isEmpty) Some(scopeAll())
    else if (fromNamed.nonEmpty) Some(scopeGraphs(fromNamed))
    else Some(scopeAll().where(org.apache.spark.sql.functions.lit(false)))

  /** Execute a SPARQL ASK: true iff any solution exists (short-
    * circuiting LIMIT 1 under the hood). */
  def ask(text: String, name: String = "ask"): Boolean = planned {
    val q = SparqlParser.parseAsk(text, name)
    val scoped =
      if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) scopeAll()
      else scopeGraphs(q.fromGraphs)
    Compiler.runAsk(q, scoped, namedScope(q.fromGraphs, q.fromNamed))
  }

  /** Execute a SPARQL CONSTRUCT: returns the instantiated template as a
    * quad DataFrame bound to `targetGraph` (a graph VALUE — nothing is
    * written to the store). */
  def construct(text: String, name: String = "construct",
      targetGraph: String = "urn:graft:construct"): DataFrame = planned {
    val q = SparqlParser.parseConstruct(text, name)
    val scoped =
      if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) scopeAll()
      else scopeGraphs(q.fromGraphs)
    Compiler.runConstruct(q, scoped, targetGraph,
      namedScope(q.fromGraphs, q.fromNamed))
  }

  /** Execute a SPARQL DESCRIBE: the IRI's concise bounded description
    * (own triples + bounded blank-node closure) as a quad DataFrame. */
  def describe(text: String, name: String = "describe"): DataFrame = planned {
    val q = SparqlParser.parseDescribe(text, name)
    // DESCRIBE stays on the decoded view: its bounded bnode-closure walk
    // reads o_kind/o_value and RETURNS quad rows, so the string frame is
    // the natural representation (result-sized work either way)
    val scoped =
      if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) store.read()
      else store.readGraphs(q.fromGraphs)
    Compiler.runDescribeQuery(q, scoped, namedScope(q.fromGraphs, q.fromNamed))
  }

  /** Compile an INSERT..WHERE update and return the quads it would
    * produce, without writing (for inspection / testing). */
  def preview(text: String, name: String = "preview"): DataFrame = planned {
    SparqlParser.parse(text, name) match {
      case InsertWhere(q) => Compiler.run(q, scopeGraphs(q.usingGraphs),
        namedScope(q.usingGraphs, q.usingNamed))
      case other => throw new IllegalArgumentException(
        s"preview requires INSERT..WHERE, got $other")
    }
  }
}
