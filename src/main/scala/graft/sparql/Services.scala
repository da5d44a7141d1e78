package graft.sparql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** SERVICE endpoint registry (SPARQL 1.1 Federated Query, §2–§4).
  *
  * The reference talks to exactly one remote store over HTTP; a Spark
  * engine federates differently: any dataset a `SERVICE <iri>` should
  * reach is REGISTERED here as a quad DataFrame (another
  * [[graft.model.QuadStore]]'s read, a parquet path, a JDBC scan —
  * anything that yields the quad schema). The compiler then plans the
  * federated pattern as an ordinary distributed join: Catalyst
  * broadcasts a small endpoint dataset or shuffles on the join keys,
  * and AQE re-plans at runtime — where a literal HTTP federation
  * client would serialize per-binding requests through the driver.
  *
  * Thunks, not frames: registration captures `=> DataFrame` so an
  * endpoint backed by a mutable store re-reads its CURRENT state at
  * query time, matching remote-endpoint semantics.
  */
object Services {
  private val reg = new ConcurrentHashMap[String, () => DataFrame]()

  /** Register (or replace) an endpoint. `quads` must have the engine's
    * quad schema (graph, s, p, o_value, o_type, o_lang, o_kind). */
  def register(iri: String, quads: => DataFrame): Unit = {
    reg.put(iri, () => quads)
    ()
  }

  def unregister(iri: String): Unit = { reg.remove(iri); () }

  def lookup(iri: String): Option[DataFrame] =
    Option(reg.get(iri)).map(_.apply())

  def clear(): Unit = {
    reg.clear(); boundJoinIris.clear(); pagedIris.clear()
    unpagedIris.clear()
  }

  /** Endpoints opted into FEDERATED BOUND JOINS (FedX-style VALUES
    * injection): instead of fetching the endpoint's whole dataset, the
    * compiler ships the SERVICE group's BGP plus a VALUES block of the
    * locally-bound shared variables, so the REMOTE engine does the
    * selection and only join-surviving bindings cross the wire. Opt-in
    * because it changes what the remote sees (your bindings) and
    * requires a query-evaluating endpoint — exactly the knob real
    * federation engines expose. */
  private val boundJoinIris =
    ConcurrentHashMap.newKeySet[String]()

  def enableBoundJoin(iri: String): Unit = { boundJoinIris.add(iri); () }
  def disableBoundJoin(iri: String): Unit = { boundJoinIris.remove(iri); () }
  def boundJoinEnabled(iri: String): Boolean = boundJoinIris.contains(iri)

  /** PAGED full fetches — the DEFAULT (VERDICT r11 #4): the
    * whole-dataset fetch becomes LIMIT/OFFSET pages fetched BY
    * EXECUTOR TASKS ([[HttpService.fetchQuadsPaged]]) — the driver
    * only sees the count, so an endpoint larger than driver memory is
    * reachable by a user who never read the registry docs. Paging
    * assumes the endpoint answers the COUNT aggregate and serves a
    * stable ORDER BY ?g ?s ?p ?o; an endpoint that can't answer the
    * count degrades to the single-document fetch behind a LOUD size
    * gate ([[HttpService.MaxUnpagedQuads]]). [[enablePagedFetch]]
    * tunes the page size; [[disablePagedFetch]] is the explicit
    * OPT-OUT to the gated single fetch (it also multiplies request
    * count down to one and restores single-response snapshot
    * semantics — the reasons a user might want it). */
  private val pagedIris = new ConcurrentHashMap[String, Int]()
  private val unpagedIris = ConcurrentHashMap.newKeySet[String]()

  def enablePagedFetch(iri: String,
      pageSize: Int = HttpService.DefaultFetchPageSize): Unit = {
    require(pageSize > 0, s"pageSize must be positive: $pageSize")
    unpagedIris.remove(iri)
    pagedIris.put(iri, pageSize)
    ()
  }
  def disablePagedFetch(iri: String): Unit = {
    pagedIris.remove(iri); unpagedIris.add(iri); ()
  }
  /** Forget any per-endpoint paging configuration — back to the
    * default (paged, default page size). */
  def resetPagedFetch(iri: String): Unit = {
    pagedIris.remove(iri); unpagedIris.remove(iri); ()
  }
  /** Page size for `iri`'s full fetch — `None` only when explicitly
    * opted out; unconfigured endpoints page at the default size. */
  def pagedFetchPageSize(iri: String): Option[Int] =
    if (unpagedIris.contains(iri)) None
    else Some(Option(pagedIris.get(iri))
      .getOrElse(HttpService.DefaultFetchPageSize): Int)
}
