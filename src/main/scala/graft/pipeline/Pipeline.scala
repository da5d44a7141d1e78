package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.model.{Quad, QuadStore}
import graft.queries.ReferenceMappings._
import graft.sparql.{Algebra, Compiler}

/** The reference DAG re-expressed as a driver-side task sequence
  * (SURVEY.md §3.3): clear staging → ingest → clear target → 16 mapping
  * queries → provenance → drop staging → compact.
  *
  * Differences from the reference, by design:
  *  - the per-record INSERT round-trip
  *    (`load_knowledge_graph.py:152-154`, self-flagged TODO `:210-211`)
  *    becomes one distributed append per source;
  *  - the 16 mapping queries all scan the same 5 staging graphs, so the
  *    scoped quad sets are cached once (MEMORY_AND_DISK) for the whole
  *    mapping phase instead of re-read 16 times (SURVEY.md §4.2);
  *  - mapping outputs are unioned and set-merged once into the target
  *    graph — order-independent, one shuffle — rather than 16 sequential
  *    endpoint updates.
  */
final class Pipeline(store: QuadStore) {

  val stagingGraphs: Seq[String] =
    Seq(gLdap, gTlUsers, gTlCompanies, gTlCustomFields, gMamTenants)

  /** Clear staging graphs (tasks c1–c4) + target (task c). */
  def clearAll(): Unit = {
    (stagingGraphs :+ gOrganizations).foreach(store.clearGraph)
    store.clearGraph(gProvenance)
  }

  /** Run every mapping task and merge the results into the target graph
    * with one set-semantics append.
    *
    * The queries are independent (they read staging graphs, write one
    * batch), so each is compiled and materialized on its own driver
    * thread — Catalyst analysis/optimization and stage codegen are
    * driver-side and would otherwise serialize across the 16 plans,
    * dominating wall-clock for small inputs. The materialized results
    * then union into a single set-merge append (one write, one dedup
    * shuffle — same as before).
    */
  def runMappings(queries: Seq[Algebra.MappingQuery] = all): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration

    // one cached scan per distinct USING set, shared by all queries on it
    val scopeCache = new java.util.concurrent.ConcurrentHashMap[Seq[String], DataFrame]
    def scoped(graphs: Seq[String]): DataFrame =
      scopeCache.computeIfAbsent(graphs.sorted, { _ =>
        val df = store.readGraphs(graphs)
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize once before the parallel phase
        df
      })
    queries.map(_.usingGraphs).distinct.foreach(scoped)

    if (queries.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(queries.size, 8))
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val futures = queries.map { q =>
        Future(Compiler.run(q, scoped(q.usingGraphs)).localCheckpoint(true))
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      val union = results.reduce(_.unionByName(_))
      store.appendDistinct(union, Some(queries.map(_.targetGraph).distinct))
    } finally {
      pool.shutdown()
      scopeCache.values.forEach(_.unpersist())
    }
  }

  /** Entry point B of the reference (`load_knowledge_graph.py:178-195`):
    * the DAG posts SPARQL UPDATE *texts* — the 14 files plus rendered
    * inline templates. Each text is parsed by the SPARQL front end and
    * the resulting queries drive the SAME scoped-cache / parallel /
    * single-merge machinery as the DSL transcriptions; a text that is
    * not an INSERT..WHERE mapping is rejected loudly. */
  def runMappingsFromTexts(texts: Seq[(String, String)]): Unit = {
    import graft.sparql.SparqlParser
    val parsed = texts.map { case (name, text) =>
      SparqlParser.parse(text, name) match {
        case SparqlParser.InsertWhere(q) => q
        case other => throw new IllegalArgumentException(
          s"mapping text $name is not INSERT..WHERE: ${other.getClass.getSimpleName}")
      }
    }
    runMappings(parsed)
  }

  /** PROV-O lineage via the verbatim inline template (task mp) — parses
    * and executes [[ReferenceTexts.provenanceText]], so the text path is
    * exercised end to end. Records the reference's own executor naming;
    * [[addProvenance]] is the Spark-honest variant. */
  def addProvenanceFromText(runId: String, startedAt: String): Unit =
    new graft.GraphEngine(store).update(
      ReferenceTexts.provenanceText(runId, startedAt), "add_provenance")

  /** PROV-O lineage (task mp, `load_knowledge_graph.py:510-545`). */
  def addProvenance(runId: String, startedAt: String): Unit = {
    val prov = "http://www.w3.org/ns/prov#"
    val etl = "https://data.hetarchief.be/ns/etl/"
    val etlId = "https://data.hetarchief.be/id/etl/"
    val rdfType = Algebra.dsl.rdfType
    val result = gOrganizations
    val run = etlId + urlEncodePlus(runId)
    val sources = Seq(gTlCompanies, gTlUsers, gLdap)
    store.insertData(
      sources.map(src => Quad.iri(gProvenance, result, prov + "wasDerivedFrom", src)) ++
      Seq(
        Quad.iri(gProvenance, result, prov + "wasGeneratedBy", run),
        Quad.iri(gProvenance, run, rdfType, prov + "Activity"),
        Quad.iri(gProvenance, run, rdfType, etl + "SparkRun"),
        Quad.iri(gProvenance, run, prov + "generated", result),
        Quad.iri(gProvenance, run, prov + "used", etl + "ApacheSpark"),
        Quad.typed(gProvenance, run, prov + "startedAtTime", startedAt,
          Quad.xsd.dateTime)))
  }

  /** Drop staging graphs (d1–d5) + compact the target (opt task). */
  def finish(): Unit = {
    stagingGraphs.foreach(store.dropGraph)
    store.compact(gOrganizations)
  }

  /** Full run over already-ingested staging graphs.
    *
    * Upstream sync (the reference's `full_sync` flag) is a separate
    * pre-step — call [[awaitUpstreamSync]] before ingest, as the DAG's
    * h0–h5 gate does; graph-level processing is truncate-and-reload
    * either way, exactly as in the reference. */
  def run(runId: String, startedAt: String): Unit = {
    store.clearGraph(gOrganizations)
    runMappings()
    addProvenance(runId, startedAt)
    finish()
  }

  /** Upstream sync gate (tasks h0–h5): trigger both sync services and
    * poll until their jobs settle, before any clear/extract. */
  def awaitUpstreamSync(
      sync: HttpSync, triggerUrls: Seq[String], statusUrls: Seq[String],
      fullSync: Boolean): Boolean = {
    // a non-2xx trigger means no sync job started — polling could then
    // see a STALE job_running=false and wave the gate through
    val triggered = triggerUrls.forall { u =>
      val status = sync.trigger(u, s"""{"full_sync": $fullSync}""")
      status >= 200 && status < 300
    }
    triggered && statusUrls.forall(u => sync.pollUntil(u, sync.jobNotRunning))
  }

  /** python urllib.parse.quote_plus — used by the reference to mint the
    * run IRI (`load_knowledge_graph.py:55`); see
    * [[ReferenceTexts.quotePlus]] for the java-URLEncoder caveat. */
  private def urlEncodePlus(s: String): String = ReferenceTexts.quotePlus(s)
}
