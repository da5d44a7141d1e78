package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Quad, TermDictionary}
import graft.util.Tables

/** Dictionary-encoded query execution (see [[graft.model.TermDictionary]]
  * for the why): driver-visible proof that the engine can rewrite a quad
  * set into id space, run a BGP join entirely over longs, and decode only
  * the final projection. The fixture quads are built RELATIONALLY from
  * `events` (not via the flattener) so the DuckDB oracle can rebuild the
  * identical term set and recompute the dictionary ids bit-for-bit.
  */
object DictOps {

  /** Two triples per event, default graph:
    * `<http://ex/ev/ID> <http://ex/p/type> "event_type"` (plain literal)
    * `<http://ex/ev/ID> <http://ex/p/user> <http://ex/u/UID>` (IRI) —
    * a mixed-kind term set, so the shared s/o dictionary is exercised
    * for real (user IRIs occur only in the o slot, event IRIs only in
    * s, predicates only in p). */
  private def eventQuads(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val g = lit(Quad.DefaultGraph).as("graph")
    val subj = concat(lit("http://ex/ev/"), col("event_id")).as("s")
    val nullS = lit(null).cast("string")
    ev.select(g, subj, lit("http://ex/p/type").as("p"),
        col("event_type").as("o_value"), nullS.as("o_type"),
        nullS.as("o_lang"), lit("literal").as("o_kind"))
      .unionByName(ev.select(g, subj, lit("http://ex/p/user").as("p"),
        concat(lit("http://ex/u/"), col("user_id")).as("o_value"),
        nullS.as("o_type"), nullS.as("o_lang"), lit("iri").as("o_kind")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The dictionary itself: every distinct term → its global sorted
    // rank. The oracle recomputes ids with a window row_number — fine
    // in DuckDB at test scale; the engine side uses the distributed
    // sort + zipWithIndex shape that survives a 100 TB term set.
    "rdf_dict_terms" -> ((s, d) =>
      TermDictionary.dictionary(eventQuads(s, d)).orderBy("id")),

    // Incremental dictionary maintenance: the 80% base corpus builds
    // the dictionary, the 20% increment appends ONLY its genuinely new
    // terms (frozen base ids, fresh ids after the range, sorted among
    // themselves) — the daily-batch shape; nothing keyed by an old id
    // is ever rewritten. Oracle recomputes both generations in SQL.
    "rdf_dict_append" -> ((s, d) => {
      val quads = eventQuads(s, d)
      val evId = regexp_extract(col("s"), "ev/(\\d+)$", 1).cast("long")
      val base = quads.filter(pmod(evId, lit(5)) =!= 0)
      val inc = quads.filter(pmod(evId, lit(5)) === 0)
      TermDictionary.append(TermDictionary.dictionary(base), inc)
        .orderBy("id")
    }),

    // A 4-pattern BGP — users with BOTH a purchase and an error event —
    // executed entirely in id space: constants are looked up once
    // (4-row collect, bounded by the query text), the self-joins carry
    // (s_id, o_id) longs only, and the single decode join happens on
    // the final distinct user set. At 100 TB the string bytes never
    // enter a shuffle; this query is the plan-shape witness.
    "rdf_dict_bgp_join" -> ((s, d) => {
      val quads = eventQuads(s, d)
      val dict = TermDictionary.dictionary(quads)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val enc = TermDictionary.encode(quads, dict)
      val ids = TermDictionary.constantIds(dict, Seq(
        "http://ex/p/type", "http://ex/p/user",
        "\"purchase\"", "\"error\""))
      val typed = (t: String) => enc
        .filter(col("p_id") === ids("http://ex/p/type") &&
          col("o_id") === ids("\"" + t + "\""))
        .select(col("s_id"))
      val userEdge = enc.filter(col("p_id") === ids("http://ex/p/user"))
        .select(col("s_id"), col("o_id").as("u_id"))
      val both = typed("purchase").join(userEdge, "s_id").select(col("u_id"))
        .intersect(typed("error").join(userEdge, "s_id").select(col("u_id")))
      val out = TermDictionary.decode(both, dict, "u_id", "user_term")
        .select(col("user_term")).orderBy("user_term")
      dict.unpersist(blocking = false)
      out
    }),

    // The dict demo family promoted to an ENGINE MODE (VERDICT r9 #1):
    // the same SPARQL text the string backends run, executed over a
    // persisted [[graft.model.DictQuadStore]] — the parser→compiler
    // surface unchanged, but every pattern-block join carries longs
    // (Compiler.compilePatternEncoded) and variables decode once at the
    // block boundary. This query exercises the id-space star join ×2,
    // an EXISTS semi-join, grouping, and decode-on-projection; the
    // DictStoreSpec parity battery pins the rest of the surface.
    "rdf_dict_sparql" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dictkv-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.DictQuadStore(s, dir)
      store.appendDistinct(eventQuads(s, d))
      val engine = new graft.GraphEngine(store)
      engine.select("""
        PREFIX p: <http://ex/p/>
        SELECT ?u (COUNT(?e) AS ?n_purchases)
        WHERE {
          ?e p:type "purchase" ;
             p:user ?u .
          FILTER EXISTS { ?e2 p:type "error" ; p:user ?u }
        }
        GROUP BY ?u
        ORDER BY ?u""")
    }))

  def oracleSql: Map[String, String] = Map(
    "rdf_dict_terms" ->
      """WITH quads AS (
           SELECT 'http://ex/ev/' || CAST(event_id AS VARCHAR) AS s,
                  'http://ex/p/type' AS p,
                  '"' || event_type || '"' AS o
           FROM events
           UNION ALL
           SELECT 'http://ex/ev/' || CAST(event_id AS VARCHAR),
                  'http://ex/p/user',
                  'http://ex/u/' || CAST(user_id AS VARCHAR)
           FROM events),
         terms AS (
           SELECT DISTINCT term FROM (
             SELECT s AS term FROM quads
             UNION ALL SELECT p FROM quads
             UNION ALL SELECT o FROM quads))
         SELECT term, row_number() OVER (ORDER BY term) - 1 AS id
         FROM terms ORDER BY id""",
    "rdf_dict_append" ->
      """WITH qb AS (
           SELECT 'http://ex/ev/' || CAST(event_id AS VARCHAR) AS s,
                  'http://ex/p/type' AS p, '"' || event_type || '"' AS o
           FROM events WHERE event_id % 5 <> 0
           UNION ALL
           SELECT 'http://ex/ev/' || CAST(event_id AS VARCHAR),
                  'http://ex/p/user',
                  'http://ex/u/' || CAST(user_id AS VARCHAR)
           FROM events WHERE event_id % 5 <> 0),
         qi AS (
           SELECT 'http://ex/ev/' || CAST(event_id AS VARCHAR) AS s,
                  'http://ex/p/type' AS p, '"' || event_type || '"' AS o
           FROM events WHERE event_id % 5 = 0
           UNION ALL
           SELECT 'http://ex/ev/' || CAST(event_id AS VARCHAR),
                  'http://ex/p/user',
                  'http://ex/u/' || CAST(user_id AS VARCHAR)
           FROM events WHERE event_id % 5 = 0),
         tb AS (SELECT DISTINCT term FROM (
                  SELECT s AS term FROM qb
                  UNION ALL SELECT p FROM qb
                  UNION ALL SELECT o FROM qb)),
         ti AS (SELECT DISTINCT term FROM (
                  SELECT s AS term FROM qi
                  UNION ALL SELECT p FROM qi
                  UNION ALL SELECT o FROM qi) x
                WHERE term NOT IN (SELECT term FROM tb)),
         db AS (SELECT term, row_number() OVER (ORDER BY term) - 1 AS id
                FROM tb),
         di AS (SELECT term, (SELECT count(*) FROM tb)
                  + row_number() OVER (ORDER BY term) - 1 AS id
                FROM ti)
         SELECT term, id FROM db
         UNION ALL SELECT term, id FROM di
         ORDER BY id""",
    "rdf_dict_bgp_join" ->
      """SELECT user_term FROM (
           SELECT 'http://ex/u/' || CAST(user_id AS VARCHAR) AS user_term
           FROM events WHERE event_type = 'purchase'
           INTERSECT
           SELECT 'http://ex/u/' || CAST(user_id AS VARCHAR)
           FROM events WHERE event_type = 'error') t
         ORDER BY user_term""",
    "rdf_dict_sparql" ->
      """SELECT 'http://ex/u/' || CAST(user_id AS VARCHAR) AS u,
           count(*) AS n_purchases
         FROM events
         WHERE event_type = 'purchase'
           AND user_id IN (SELECT user_id FROM events
                           WHERE event_type = 'error')
         GROUP BY 1
         ORDER BY u""")
}
