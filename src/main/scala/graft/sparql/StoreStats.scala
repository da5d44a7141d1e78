package graft.sparql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.QuadStore

/** The cardinality/characteristic-set summary as a STORE ARTIFACT
  * (VERDICT r10 #5): [[graft.GraphEngine.withCardinalityStats]] gathers
  * its vocabulary-sized summary with a full-store aggregate per engine
  * instance — fine per session, wrong at 100 TB, where statistics are
  * metadata refreshed when the data changes, not recomputed per
  * planner. This object persists the same summary as two tiny parquet
  * tables under `<store>/_stats/` (the dictionary's artifact
  * discipline) and maintains them INCREMENTALLY on append:
  *
  *  - `pred/`: per-predicate `(p, n, ds_sk, do_sk)` — exact triple
  *    count plus MERGEABLE DataSketches HLL sketches for the
  *    distinct-subject/object counts. Counts add and sketches union,
  *    so a delta folds in with delta-sized work; a finalized NDV
  *    number would be unmergeable and force the full rescan this
  *    artifact exists to avoid.
  *  - `csets/`: the characteristic-set summary `(pset, n_subj)`
  *    (Neumann & Moerkotte ICDE 2011), capped at
  *    [[CardEstimator.MaxCsets]] shapes. Refresh recomputes shapes for
  *    the TOUCHED subjects only — the delta names them, a broadcast
  *    semi-join prunes both the pre- and post-state reads to those
  *    subjects (the CDF machinery's O(delta) discipline), and the
  *    stored shape counts are decremented/incremented accordingly.
  *
  * [[load]] rebuilds a [[CardEstimator]] from the artifact with two
  * vocabulary-sized parquet reads — no store scan. Estimates off the
  * artifact steer JOIN ORDERING only, so the HLL-estimate/approx-
  * count-distinct algorithm difference vs the in-memory path is
  * immaterial (both are ±2% NDV signals).
  */
object StoreStats {

  def statsDir(store: QuadStore): String = store.path + "/_stats"

  /** Full (re)build of the artifact from the store's current state —
    * the once-per-bulk-load pass; appends afterwards use [[refresh]].
    * On a dict backend the whole pass runs IN ID SPACE (grouping and
    * NDV-sketching 8-byte ids, never the three decode joins a decoded
    * view would cost — the [[CardEstimator.fromDictStore]] discipline);
    * the artifact itself is TERM-keyed either way (one vocabulary-sized
    * predicate decode at write time), so [[load]] is backend-agnostic. */
  def write(store: QuadStore): Unit = store match {
    case d: graft.model.DictBackend =>
      val enc = d.readEncoded(); val dict = d.readDict()
      writeTables(statsDir(store), predTableDict(enc, dict),
        csetTableDict(enc, dict))
    case _ =>
      writeTables(statsDir(store), predTable(store.read()),
        csetTable(store.read()))
  }

  /** Delta-sized refresh after an append: `pre` is the store state the
    * append saw — read BEFORE appending, in the store's NATIVE
    * representation (`read()` on string stores, `readEncoded()` on
    * dict stores, localCheckpointed so the append's file mutation can't
    * reach back through the lazy plan) — and `delta` the appended
    * string quads. Per-predicate rows merge by count-addition +
    * sketch-union; shape counts change only for the delta's subjects,
    * so both state reads are semi-join-pruned to them. Set semantics
    * note: `delta` must be the effectively-inserted quads
    * (appendDistinct's anti-joined batch) — re-inserted duplicates
    * would double-count. Sketch domains are per-backend (strings vs
    * ids — NDV-equal, the dictionary is a bijection) and write/refresh
    * dispatch on the same store type, so an artifact never mixes them. */
  def refresh(store: QuadStore, pre: DataFrame, delta: DataFrame): Unit =
    store match {
      case ds: graft.model.DictBackend =>
        // the post-append dictionary holds every delta term — encode
        // the delta once and fold in id space
        val dict = ds.readDict()
        val dEnc = graft.model.TermDictionary.encode(delta, dict)
          .localCheckpoint()
        refreshFrom(store,
          predTableDict(dEnc, dict),
          pre.select(col("s_id").as("s"), col("p_id").as("p")),
          dEnc.select(col("s_id").as("s"), col("p_id").as("p")),
          idsToTerms(_, dict))
      case _ =>
        val d = delta.select(col("p"), col("s"), col("o_value"))
          .localCheckpoint() // consumed 3× below; cut the caller's lineage
        refreshFrom(store, predTable(d),
          pre.select(col("s"), col("p")), d.select(col("s"), col("p")),
          identity)
    }

  /** Delta-sized refresh after a DELETE: `pre` is the store state the
    * delete saw (native representation, localCheckpointed — same
    * contract as [[refresh]]) and `deleted` the removed string quads
    * (store set semantics: each was present exactly once). Counts
    * decrement EXACTLY and shape counts recount over the touched
    * subjects (a subject keeps a predicate in its shape while ANY quad
    * carries it, so shapes recompute from the full quad identity, not
    * (s,p) pairs). HLL sketches cannot subtract — the NDV sketches pass
    * through unchanged as UPPER bounds, which is the safe direction
    * for ordering (an overestimated NDV only makes constant-slot
    * patterns look more selective than they are, never less); a
    * periodic [[write]] rebuild tightens them. */
  def refreshDelete(store: QuadStore, pre: DataFrame,
      deleted: DataFrame): Unit = store match {
    case ds: graft.model.DictBackend =>
      // the dictionary is append-only: deleted terms keep their ids,
      // so the delete encodes through the same frozen mapping. The
      // except key is the FULL quad identity (graph, s, p, o) — an
      // identical triple surviving in another named graph must keep
      // the predicate in the subject's shape (store-wide shapes group
      // by subject ACROSS graphs, exactly like a write() rebuild).
      val dict = ds.readDict()
      val dEnc = graft.model.TermDictionary.encode(deleted, dict)
        .localCheckpoint()
      def idKey(df: DataFrame) = df.select(col("graph").as("g"),
        col("s_id").as("s"), col("p_id").as("p"), col("o_id").as("o"))
      refreshDeleteFrom(store,
        dEnc.groupBy(col("p_id")).agg(count(lit(1)).as("d"))
          .join(dict.select(col("id"), col("term").as("p")),
            col("p_id") === col("id"))
          .select(col("p"), col("d")),
        idKey(pre), idKey(dEnc),
        idsToTerms(_, dict))
    case _ =>
      // full quad identity: graph + the object's complete term key
      // (value, type, lang, KIND — an IRI and a literal with equal
      // lexical form are different quads)
      def oKey(df: DataFrame) = df.select(col("graph").as("g"),
        col("s"), col("p"),
        struct(col("o_value"), col("o_type"), col("o_lang"),
          col("o_kind")).as("o"))
      val d = oKey(deleted).localCheckpoint()
      refreshDeleteFrom(store,
        d.groupBy(col("p")).agg(count(lit(1)).as("d")),
        oKey(pre), d, identity)
  }

  /** The delete fold: exact count decrement (rows reaching 0 drop),
    * touched-subject shape recount where post = pre ∖ deleted in full
    * (graph, s, p, o) quad identity. */
  private def refreshDeleteFrom(store: QuadStore, delPred: DataFrame,
      preQ: DataFrame, delQ: DataFrame,
      psetToTerms: DataFrame => DataFrame): Unit = {
    val spark = store.spark
    val dir = statsDir(store)
    val merged = spark.read.parquet(s"$dir/pred")
      .join(delPred.withColumnRenamed("d", "_del_n"), Seq("p"), "left")
      .select(col("p"),
        (col("n") - coalesce(col("_del_n"), lit(0L))).as("n"),
        col("ds_sk"), col("do_sk"))
      .where(col("n") > 0)
    val touched = delQ.select(col("s")).distinct()
    def shapesOf(q: DataFrame) = psetToTerms(q
      .join(broadcast(touched), Seq("s"), "left_semi")
      .groupBy(col("s")).agg(sort_array(collect_set(col("p"))).as("pset"))
      .groupBy(col("pset")).agg(count(lit(1)).as("d")))
    val oldShapes = shapesOf(preQ).select(col("pset"), (-col("d")).as("d"))
    val newShapes = shapesOf(preQ.except(delQ))
    val csets = spark.read.parquet(s"$dir/csets")
      .select(col("pset"), col("n_subj").as("d"))
      .unionByName(oldShapes).unionByName(newShapes)
      .groupBy(col("pset")).agg(sum(col("d")).as("n_subj"))
      .where(col("n_subj") > 0)
      .orderBy(col("n_subj").desc, col("pset"))
      .limit(CardEstimator.MaxCsets)
    writeTables(dir, merged, csets)
  }

  /** The shared fold: `predDelta` is the delta's TERM-keyed predicate
    * summary; `preSP`/`deltaSP` are (s, p) edges in one consistent key
    * space (terms or ids — shapes only need equality); `psetToTerms`
    * maps the recounted shape keys to the artifact's term psets. */
  private def refreshFrom(store: QuadStore, predDelta: DataFrame,
      preSP: DataFrame, deltaSP: DataFrame,
      psetToTerms: DataFrame => DataFrame): Unit = {
    val spark = store.spark
    val dir = statsDir(store)
    // ---- per-predicate: stored rows ∪ delta rows, one merge aggregate
    val merged = spark.read.parquet(s"$dir/pred")
      .unionByName(predDelta)
      .groupBy(col("p")).agg(
        sum(col("n")).as("n"),
        hll_union_agg(col("ds_sk")).as("ds_sk"),
        hll_union_agg(col("do_sk")).as("do_sk"))
    // ---- characteristic sets: shapes of TOUCHED subjects, before/after
    val touched = deltaSP.select(col("s")).distinct()
    def shapesOf(sp: DataFrame) = psetToTerms(sp
      .join(broadcast(touched), Seq("s"), "left_semi")
      .groupBy(col("s")).agg(sort_array(collect_set(col("p"))).as("pset"))
      .groupBy(col("pset")).agg(count(lit(1)).as("d")))
    val oldShapes = shapesOf(preSP).select(col("pset"), (-col("d")).as("d"))
    val newShapes = shapesOf(preSP.unionByName(deltaSP))
    val csets = spark.read.parquet(s"$dir/csets")
      .select(col("pset"), col("n_subj").as("d"))
      .unionByName(oldShapes).unionByName(newShapes)
      .groupBy(col("pset")).agg(sum(col("d")).as("n_subj"))
      .where(col("n_subj") > 0)
      .orderBy(col("n_subj").desc, col("pset"))
      .limit(CardEstimator.MaxCsets)
    writeTables(dir, merged, csets)
  }

  /** Rewrite a `(pset: array<id>, d)` shape frame's key to the
    * artifact's term psets — shape-summary-sized (≤ MaxCsets rows
    * explode against the predicate slice of the dictionary). The
    * original id pset stays the grouping key (it is the row identity;
    * grouping by `d` alone would merge distinct shapes that happen to
    * share a count), then drops. */
  private def idsToTerms(shapes: DataFrame, dict: DataFrame): DataFrame =
    shapes.select(col("pset").as("_idpset"), col("d"),
        explode(col("pset")).as("pid"))
      .join(dict.select(col("id").as("pid"), col("term")), Seq("pid"))
      .groupBy(col("_idpset"), col("d"))
      .agg(sort_array(collect_set(col("term"))).as("pset"))
      .select(col("pset"), col("d"))

  /** [[CardEstimator]] off the artifact: two vocabulary-sized parquet
    * reads, NO store scan — the 100 TB planner-startup path. */
  def load(store: QuadStore): CardEstimator = {
    val dir = statsDir(store)
    val predRows = store.spark.read.parquet(s"$dir/pred")
      .select(col("p"), col("n"),
        hll_sketch_estimate(col("ds_sk")).as("ds"),
        hll_sketch_estimate(col("do_sk")).as("dn"))
      .collect()
    val pred = predRows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val csets = store.spark.read.parquet(s"$dir/csets")
      .orderBy(col("n_subj").desc, col("pset"))
      .collect()
      .map(r => r.getSeq[String](0).toSet -> r.getLong(1)).toSeq
    CardEstimator.fromTables(pred, csets)
  }

  /** Artifact presence via the store's Hadoop FileSystem — correct on
    * hdfs://, s3a://, … like every other store operation (a
    * java.io.File probe would report false there and force a needless
    * full rebuild). */
  def exists(store: QuadStore): Boolean = {
    val p = new org.apache.hadoop.fs.Path(statsDir(store) + "/pred")
    p.getFileSystem(store.spark.sparkContext.hadoopConfiguration)
      .exists(p)
  }

  /** The artifact as queryable DataFrames (pred summary with estimated
    * NDVs, cset summary) — for inspection and the oracle-checked
    * lifecycle query. */
  def predSummary(spark: SparkSession, store: QuadStore): DataFrame =
    spark.read.parquet(s"${statsDir(store)}/pred")
      .select(col("p"), col("n"))

  def csetSummary(spark: SparkSession, store: QuadStore): DataFrame =
    spark.read.parquet(s"${statsDir(store)}/csets")
      .select(concat_ws(",", col("pset")).as("pset"), col("n_subj"))

  private def predTable(quads: DataFrame): DataFrame =
    quads.groupBy(col("p")).agg(
      count(lit(1)).as("n"),
      hll_sketch_agg(col("s")).as("ds_sk"),
      hll_sketch_agg(col("o_value")).as("do_sk"))

  /** Id-space twin of [[predTable]]: groups and NDV-sketches 8-byte
    * ids, decodes only the vocabulary-sized predicate key. (Object NDV
    * counts term identities rather than lexical forms — the
    * fromDictStore adjudication: if anything the better signal.) */
  private def predTableDict(enc: DataFrame, dict: DataFrame): DataFrame =
    enc.groupBy(col("p_id")).agg(
        count(lit(1)).as("n"),
        hll_sketch_agg(col("s_id")).as("ds_sk"),
        hll_sketch_agg(col("o_id")).as("do_sk"))
      .join(dict.select(col("id"), col("term").as("p")),
        col("p_id") === col("id"))
      .select(col("p"), col("n"), col("ds_sk"), col("do_sk"))

  /** Id-space twin of [[csetTable]]: the subject-keyed aggregation runs
    * over longs; only the ≤ MaxCsets FINAL shapes decode their
    * predicate ids to the artifact's term psets. */
  private def csetTableDict(enc: DataFrame, dict: DataFrame): DataFrame = {
    val shapes = enc.groupBy(col("s_id"))
      .agg(sort_array(collect_set(col("p_id"))).as("pset"))
      .groupBy(col("pset")).agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("pset"))
      .limit(CardEstimator.MaxCsets)
    idsToTerms(shapes, dict)
      .select(col("pset"), col("d").as("n_subj"))
  }

  private def csetTable(quads: DataFrame): DataFrame =
    quads.groupBy(col("s"))
      .agg(sort_array(collect_set(col("p"))).as("pset"))
      .groupBy(col("pset")).agg(count(lit(1)).as("n_subj"))
      .orderBy(col("n_subj").desc, col("pset"))
      .limit(CardEstimator.MaxCsets)

  /** Overwrite both artifact tables. The inputs read the CURRENT
    * artifact (refresh) or store, so each is materialized via a
    * lineage-cutting checkpoint BEFORE its overwrite — the
    * read-rewrite-same-path hazard every store mutation here guards. */
  private def writeTables(dir: String, pred: DataFrame,
      csets: DataFrame): Unit = {
    val p = pred.localCheckpoint()
    val c = csets.localCheckpoint()
    p.coalesce(1).write.mode("overwrite").parquet(s"$dir/pred")
    c.coalesce(1).write.mode("overwrite").parquet(s"$dir/csets")
  }
}
