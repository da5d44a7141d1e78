package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Characteristic sets (Neumann & Moerkotte, "Characteristic Sets:
  * Accurate Cardinality Estimation for RDF Queries with Multiple
  * Joins", ICDE 2011 — public literature): the structural summary a
  * quad store keeps for STAR-join cardinality estimation. Each subject
  * is classified by the SET of predicates it carries; subjects sharing
  * a predicate set form one characteristic set with an exact member
  * count. A star query `{ ?s p1 ?a . ?s p2 ?b }` is then estimated by
  * summing the counts of every characteristic set containing both
  * predicates — exact when predicates are single-valued per subject,
  * and vastly better than per-predicate independence when predicate
  * co-occurrence is correlated (the usual RDF shape).
  *
  * Scale: building the summary is one subject-keyed aggregation pass
  * (collect_set over p, then a second aggregation over the set key) —
  * the same O(n) shuffle the dictionary build already pays; the summary
  * itself is schema-sized (distinct structural shapes, not subjects)
  * and lives driver-side / broadcast, which is exactly how the
  * estimator consumes statistics ([[graft.sparql.CardEstimator]]'s
  * per-predicate table is the degenerate single-predicate case).
  */
object RdfStats {

  private val ns = "http://localhost/"

  /** The characteristic-set summary of a statement frame `(s, p)`:
    * one row per distinct predicate set with subject and triple
    * counts. `pset` is the comma-joined sorted predicate list — a
    * stable, engine-portable set key. */
  def characteristicSets(statements: DataFrame): DataFrame =
    statements.groupBy(col("s"))
      .agg(concat_ws(",", sort_array(collect_set(col("p")))).as("pset"),
        count(lit(1)).as("triples"))
      .groupBy(col("pset"))
      .agg(count(lit(1)).as("n_subjects"), sum(col("triples")).as("n_triples"))

  /** Fixture: events as star-shaped subjects whose predicate sets vary
    * with the event shape — `etype` always, `uid` when user_id is
    * present, `amount` only for conversion events with a value, `code`
    * only for errors. */
  private def shapedStatements(s: SparkSession, d: String): DataFrame =
    shapedStatementsOf(Tables.events(s, d))

  private def shapedStatementsOf(ev: DataFrame): DataFrame = {
    val subj = concat(lit("urn:ev:"), col("event_id").cast("string"))
    val etype = ev.select(subj.as("s"), lit(ns + "etype").as("p"),
      col("event_type").as("o"))
    val uid = ev.filter(col("user_id").isNotNull)
      .select(subj.as("s"), lit(ns + "uid").as("p"),
        col("user_id").cast("string").as("o"))
    val amount = ev.filter(col("event_type").isin("purchase", "signup")
        && col("value").isNotNull)
      .select(subj.as("s"), lit(ns + "amount").as("p"),
        floor(col("value")).cast("long").cast("string").as("o"))
    val code = ev.filter(col("event_type") === "error")
      .select(subj.as("s"), lit(ns + "code").as("p"),
        pmod(col("event_id"), lit(7)).cast("string").as("o"))
    etype.unionByName(uid).unionByName(amount).unionByName(code)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the summary itself: one row per structural shape
    "rdf_char_sets" -> ((s, d) =>
      characteristicSets(shapedStatements(s, d)).orderBy(col("pset"))),

    // the summary USED: a star query's estimate (sum of member counts
    // over sets containing both predicates) against its true
    // cardinality — equal here because both predicates are
    // single-valued, which is the property the estimator exploits.
    "rdf_cset_estimate" -> ((s, d) => {
      val stmts = shapedStatements(s, d)
      val cs = characteristicSets(stmts)
      val est = cs.filter(
          array_contains(split(col("pset"), ","), ns + "etype") &&
          array_contains(split(col("pset"), ","), ns + "amount"))
        .agg(coalesce(sum(col("n_subjects")), lit(0L)).as("estimated"))
      val a = stmts.filter(col("p") === ns + "etype")
        .select(col("s")).distinct()
      val b = stmts.filter(col("p") === ns + "amount")
        .select(col("s")).distinct()
      val actual = a.join(b, Seq("s")).agg(count(lit(1)).as("actual"))
      est.crossJoin(actual)
        .select(col("estimated"), col("actual"),
          (col("estimated") === col("actual")).cast("int").as("exact"))
    }),

    // ---- the statistics LIFECYCLE as a store artifact (VERDICT r10
    // #5): build a store from 4/5 of the shaped statements, WRITE the
    // stats summary beside it ([[graft.sparql.StoreStats]]), append the
    // remaining 1/5 and REFRESH the artifact delta-sized — per-
    // predicate counts merge by addition (+ HLL sketch union for the
    // NDVs), characteristic-set counts are corrected for the touched
    // subjects only (broadcast-semi-pruned pre/post shape recount, the
    // CDF discipline). The oracle rebuilds both summaries from scratch
    // over the FULL statement set, so any drift the incremental fold
    // introduces — a double-counted duplicate, a stale shape — is a
    // hash mismatch. The engine loads the artifact without a store
    // scan (RdfStatsSpec pins the ordering parity with the scan path).
    "rdf_stats_artifact" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-statsart-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.GraphStore(s, dir)
      val g = "http://ex/stats"
      def quadsOf(stmts: DataFrame) = stmts.select(
        lit(g).as("graph"), col("s"), col("p"), col("o").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit(graft.model.Quad.KindLiteral).as("o_kind"))
      val ev = Tables.events(s, d)
      val base = quadsOf(shapedStatementsOf(
        ev.filter(pmod(col("event_id"), lit(5)) =!= 0)))
      val delta = quadsOf(shapedStatementsOf(
        ev.filter(pmod(col("event_id"), lit(5)) === 0)))
      store.appendDistinct(base, Some(Seq(g)))
      graft.sparql.StoreStats.write(store)
      // the pre-append state MUST be pinned before the append mutates
      // the files under the lazy plan
      val pre = store.read().localCheckpoint()
      store.appendDistinct(delta, Some(Seq(g)))
      graft.sparql.StoreStats.refresh(store, pre, delta)
      // …and the DELETE leg: drop every `code` statement and fold the
      // removal in (exact count decrement + touched-subject shape
      // recount — error-event shapes merge into their codeless twins).
      // The oracle rebuilds over the post-delete statement set, so a
      // stale count or unmigrated shape is a hash mismatch.
      val del = quadsOf(shapedStatementsOf(ev)
        .filter(col("p") === ns + "code"))
      val pre2 = store.read().localCheckpoint()
      store.deleteQuads(del, Some(Seq(g)))
      graft.sparql.StoreStats.refreshDelete(store, pre2, del)
      val preds = graft.sparql.StoreStats.predSummary(s, store)
        .select(lit("pred").as("kind"), col("p").as("key"), col("n"))
      val csets = graft.sparql.StoreStats.csetSummary(s, store)
        .select(lit("cset").as("kind"), col("pset").as("key"),
          col("n_subj").as("n"))
      preds.unionByName(csets).orderBy(col("kind"), col("key"))
    }),

    // ---- the same lifecycle on the DICT backend: build + refresh run
    // entirely IN ID SPACE (8-byte groupBy/NDV-sketch, delta encoded
    // once through the frozen dictionary; only the ≤1024 final shapes
    // and the vocabulary-sized predicate key decode) — but the ARTIFACT
    // is term-keyed, so the oracle is the identical from-scratch
    // rebuild the string twin uses. Proves the stats pass never needs
    // the decoded view at any corpus size.
    "rdf_dict_stats_artifact" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dstatsart-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.DictQuadStore(s, dir)
      val g = "http://ex/stats"
      def quadsOf(stmts: DataFrame) = stmts.select(
        lit(g).as("graph"), col("s"), col("p"), col("o").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit(graft.model.Quad.KindLiteral).as("o_kind"))
      val ev = Tables.events(s, d)
      val base = quadsOf(shapedStatementsOf(
        ev.filter(pmod(col("event_id"), lit(5)) =!= 0)))
      val delta = quadsOf(shapedStatementsOf(
        ev.filter(pmod(col("event_id"), lit(5)) === 0)))
      store.appendDistinct(base)
      graft.sparql.StoreStats.write(store)
      // dict stores pin the pre-append state in their NATIVE (encoded)
      // representation — the id-space refresh reads it directly
      val pre = store.readEncoded().localCheckpoint()
      store.appendDistinct(delta)
      graft.sparql.StoreStats.refresh(store, pre, delta)
      val preds = graft.sparql.StoreStats.predSummary(s, store)
        .select(lit("pred").as("kind"), col("p").as("key"), col("n"))
      val csets = graft.sparql.StoreStats.csetSummary(s, store)
        .select(lit("cset").as("kind"), col("pset").as("key"),
          col("n_subj").as("n"))
      preds.unionByName(csets).orderBy(col("kind"), col("key"))
    }))

  private val statementsCte =
    s"""stmts(s, p) AS (
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}etype'
          FROM events
          UNION ALL
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}uid'
          FROM events WHERE user_id IS NOT NULL
          UNION ALL
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}amount'
          FROM events WHERE event_type IN ('purchase', 'signup')
            AND value IS NOT NULL
          UNION ALL
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}code'
          FROM events WHERE event_type = 'error'),
        per_subject AS (
          SELECT s, string_agg(DISTINCT p, ',' ORDER BY p) AS pset,
                 count(*) AS triples
          FROM stmts GROUP BY s)"""

  def oracleSql: Map[String, String] = Map(
    "rdf_char_sets" ->
      s"""WITH $statementsCte
          SELECT pset, count(*) AS n_subjects,
                 CAST(sum(triples) AS BIGINT) AS n_triples
          FROM per_subject GROUP BY pset ORDER BY pset""",

    "rdf_cset_estimate" ->
      s"""WITH $statementsCte,
          cs AS (
            SELECT pset, count(*) AS n_subjects
            FROM per_subject GROUP BY pset),
          est AS (
            SELECT CAST(COALESCE(sum(n_subjects), 0) AS BIGINT)
              AS estimated FROM cs
            WHERE list_contains(string_split(pset, ','), '${ns}etype')
              AND list_contains(string_split(pset, ','), '${ns}amount')),
          act AS (
            SELECT count(*) AS actual FROM (
              SELECT DISTINCT s FROM stmts WHERE p = '${ns}etype') a
            JOIN (SELECT DISTINCT s FROM stmts WHERE p = '${ns}amount') b
            USING (s))
          SELECT estimated, actual,
            CAST(estimated = actual AS INT) AS exact
          FROM est CROSS JOIN act""",

    // the incrementally-refreshed artifact (append + DELETE legs) vs a
    // FROM-SCRATCH build over the post-delete statement set — equality
    // proves both delta folds exact
    "rdf_stats_artifact" ->
      s"""WITH $statementsCte,
          post AS (SELECT s, p FROM stmts WHERE p <> '${ns}code'),
          ps2 AS (
            SELECT s, string_agg(DISTINCT p, ',' ORDER BY p) AS pset
            FROM post GROUP BY s),
          pred AS (SELECT p AS key, count(*) AS n FROM post GROUP BY p),
          cs AS (SELECT pset AS key, count(*) AS n FROM ps2 GROUP BY pset)
          SELECT 'pred' AS kind, key, CAST(n AS BIGINT) AS n FROM pred
          UNION ALL
          SELECT 'cset' AS kind, key, CAST(n AS BIGINT) AS n FROM cs
          ORDER BY kind, key""",

    // the id-space build+refresh must land on the SAME term-keyed
    // artifact — the oracle is the identical from-scratch rebuild
    "rdf_dict_stats_artifact" ->
      s"""WITH $statementsCte,
          pred AS (SELECT p AS key, count(*) AS n FROM stmts GROUP BY p),
          cs AS (SELECT pset AS key, count(*) AS n
                 FROM per_subject GROUP BY pset)
          SELECT 'pred' AS kind, key, CAST(n AS BIGINT) AS n FROM pred
          UNION ALL
          SELECT 'cset' AS kind, key, CAST(n AS BIGINT) AS n FROM cs
          ORDER BY kind, key""")
}
