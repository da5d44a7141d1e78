package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.Trigger

import graft.util.Tables

/** Structured Streaming surface (SURVEY.md §2.6 extension): event-time
  * windowed aggregations with watermarks over the `events` table, driven
  * synchronously for the correctness gate (parquet file source → memory
  * sink → `processAllAvailable`).
  *
  * Modes:
  *  - tumbling / sliding windows run in Complete output mode so the
  *    emitted table equals the batch equivalent (oracle-checkable);
  *  - session windows + stateful dedup run in Append mode with a real
  *    watermark — only watermark-closed sessions emit (rows-only check;
  *    the batch gaps-and-islands twin `sessionize_batch` is the oracle'd
  *    equivalent).
  */
object EventStreams {

  /** state for the stateful-distinct operator (product-encodable) */
  case class SeenTypes(types: Seq[String])

  /** Per-quad liveness state for the streaming CDC derivation: the
    * latest-wins winner so far (max batch id + its op). Order-
    * insensitive by construction — micro-batches may deliver delta
    * FILES in any order, and max-by-batch-id lands on the same state
    * regardless. */
  case class QuadLive(bestBatch: Long, live: Boolean)

  private val nameCounter = new AtomicInteger

  /** Layout-aware streaming file source for `<d>/<table>.parquet`: a
    * DIRECTORY of part files (every production layout) streams from
    * the table path itself; the driver testdata's single-FILE layout
    * keeps the parent-dir + pathGlobFilter construction (the file
    * source's basePath must be a directory). The sf1 rehearsal caught
    * the glob-only construction feeding ZERO files to a stream over a
    * directory table — the filter matches leaf file names, never
    * `dir/part-*.parquet`. */
  private def tableStream(s: SparkSession, d: String,
      table: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$d/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fileSchema = s.read.parquet(p.toString).schema
    val rs = s.readStream.schema(fileSchema)
    if (fs.getFileStatus(p).isDirectory) rs.parquet(p.toString)
    else rs.option("pathGlobFilter", s"$table.parquet").parquet(d)
  }

  /** Streaming read of the events parquet with the same ts handling as
    * `Tables.events` (nanos-as-long or TIMESTAMP_NTZ → TIMESTAMP). */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.util.Tables.normalizeTs(tableStream(s, d, "events"))
  }

  /** Streaming read of the documents parquet (corpus-as-a-stream: the
    * shape a continuously-crawled training corpus arrives in). */
  private def documentsStream(s: SparkSession, d: String): DataFrame = {
    tableStream(s, d, "documents")
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the materialized result.
    *
    * Stateful streaming cost at this scale is state-store COMMIT
    * overhead, not data: every micro-batch writes one delta file per
    * state store per partition (a stream-stream join keeps 4 stores per
    * partition), so 32 shuffle partitions mean ~100+ tiny files per
    * commit. State partitioning is fixed by `shuffle.partitions` at
    * query start, so start streams with a smaller count — on a real
    * cluster this maps to sizing state partitions to the STATE volume
    * (keys in flight), which is orders of magnitude below the scan
    * parallelism the batch side wants. */
  private def runToTable(df: DataFrame, mode: String): DataFrame = {
    val sess = df.sparkSession
    val name = s"graft_stream_${nameCounter.incrementAndGet()}"
    val key = "spark.sql.shuffle.partitions"
    val prev = sess.conf.get(key)
    sess.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    val q = try {
      df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
    } finally sess.conf.set(key, prev) // conf is captured at query start
    q.awaitTermination()
    sess.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- tumbling event-time window + watermark (Complete mode ==
    // batch semantics → oracle-checkable)
    "stream_tumbling_agg" -> ((s, d) => {
      val agg = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      runToTable(agg, "complete")
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ---- sliding window (10 min window, 5 min slide)
    "stream_sliding_agg" -> ((s, d) => {
      val agg = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      runToTable(agg, "complete")
        .select(col("window.start").as("window_start"), col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // ---- session windows per user (Append + watermark: only closed
    // sessions emit — rows-only; oracle'd twin below)
    "stream_session_window" -> ((s, d) => {
      val agg = eventsStream(s, d)
        .withWatermark("ts", "30 minutes")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
      runToTable(agg, "append")
        .select(col("session_window.start").as("session_start"), col("user_id"),
          col("n_events"), col("session_value"))
        .orderBy(col("session_start"), col("user_id"))
    }),

    // ---- streaming ingestion into the quad store: stream → flattener →
    // foreachBatch append (the incremental version of the reference's
    // extract path); result read back from the store
    "stream_quad_ingest" -> ((s, d) => {
      val ns = "http://localhost/"
      val g = "https://data.example.org/graph/stream_events"
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-singest-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.GraphStore(s, s"$dir/quads")
      val stream = eventsStream(s, d)
        .select(to_json(struct(col("event_type"), col("user_id"))).as("json"))
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          store.append(
            graft.ingest.JsonFlattener.flatten(batch, "json", g, ns).toDF())
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      store.readGraphs(Seq(g))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .orderBy(col("p"))
    }),

    // ---- streaming ingestion into the MERGE-ON-READ store: each
    // micro-batch appends O(batch) insert deltas tagged with the
    // micro-batch id. A replayed batch (failure/restart) appends the
    // same (quad, batch_id) rows again and the latest-wins read
    // collapses them — effectively-once ingestion WITHOUT the
    // read-before-write that makes appendDistinct O(store) per batch.
    "stream_mor_ingest" -> ((s, d) => {
      val g = "http://ex/stream_mor"
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-smor-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, s"$dir/quads")
      val quads = eventsStream(s, d).select(
        lit(g).as("graph"),
        concat(lit("event:"), col("event_id").cast("string")).as("s"),
        lit("etype").as("p"), col("event_type").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val q = quads.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          store.appendDelta(batch, id)
          store.appendDelta(batch, id) // simulated replay — must collapse
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      store.readGraphs(Seq(g))
        .groupBy(col("o_value")).agg(count(lit(1)).as("n_events"))
        .orderBy(col("o_value"))
    }),

    // The SAME micro-batch ingest into the DICT-ENCODED merge-on-read
    // store (round 10): each foreachBatch delta extends the dictionary
    // by its genuinely new terms (increment-sized) and appends encoded
    // longs; the replayed append collapses under the id-space
    // latest-wins identity exactly like the string MOR twin. This is
    // the full streaming->id-space write path a 100 TB live graph
    // takes. Shares stream_mor_ingest's oracle.
    "stream_dict_ingest" -> ((s, d) => {
      val g = "http://ex/stream_dict"
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-sdict-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.DictMorStore(s, s"$dir/store")
      val quads = eventsStream(s, d).select(
        lit(g).as("graph"),
        concat(lit("event:"), col("event_id").cast("string")).as("s"),
        lit("etype").as("p"), col("event_type").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      val q = quads.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          store.appendDelta(batch, id)
          store.appendDelta(batch, id) // simulated replay — must collapse
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      store.readGraphs(Seq(g))
        .groupBy(col("o_value")).agg(count(lit(1)).as("n_events"))
        .orderBy(col("o_value"))
    }),

    // ---- STREAMING CDC DERIVATION: tail a merge-on-read store's raw
    // delta directory as a FILE STREAM and derive net change rows with
    // stateful latest-wins liveness per quad identity — the streaming
    // twin of MergeOnReadStore.changesBetween, for consumers that want
    // changes pushed instead of polled. Raw deltas are NOT change rows
    // (a re-insert of a live quad must net to nothing; a tombstone of a
    // dead one too), so flatMapGroupsWithState keeps (max batch id, its
    // op) per identity — order-insensitive, because file streaming
    // makes no cross-file ordering promise — and emits a row only when
    // LIVENESS flips. Downstream, the emitted +1/-1 fold into the same
    // maintained histogram rdf_cdc_refresh builds by polling; flip
    // sequences cancel, so the fold is batch-boundary- and file-order-
    // independent (= oracle-checkable: shares rdf_cdc_refresh's
    // recompute oracle). maxFilesPerTrigger forces several micro-
    // batches, so state genuinely carries across them.
    "stream_cdc_tail" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-sctail-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(s, s"$dir/quads")
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
      val deltaSchema = StructType(graft.model.GraphStore.schema.fields ++ Seq(
        StructField("batch_id", LongType), StructField("op", StringType)))
      val tail = s.readStream.schema(deltaSchema)
        .option("basePath", s"$dir/quads")
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$dir/quads")
        .select(
          concat_ws("\u0001", col("graph"), col("s"), col("p"),
            col("o_value"), coalesce(col("o_type"), lit("")),
            coalesce(col("o_lang"), lit("")), col("o_kind")).as("qk"),
          length(col("o_value")).cast("long").as("vlen"),
          col("batch_id"), col("op"))
        .as[(String, Long, Long, String)]
      val changes = tail.groupByKey(_._1)
        .flatMapGroupsWithState[QuadLive, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (_: String, rows: Iterator[(String, Long, Long, String)],
           state: GroupState[QuadLive]) =>
            val batch = rows.toSeq
            val vlen = batch.head._2
            val prev = state.getOption
            val incoming = batch.maxBy(_._3)
            val best = prev match {
              case Some(p) if p.bestBatch >= incoming._3 => p
              case _ => QuadLive(incoming._3, incoming._4 == "i")
            }
            state.update(best)
            val wasLive = prev.exists(_.live)
            if (best.live == wasLive) Iterator.empty
            else Iterator((vlen, if (best.live) 1L else -1L))
        }.toDF("vlen", "dn")
      runToTable(changes, "append")
        .groupBy(col("vlen"))
        .agg(sum(col("dn")).cast("long").as("n"))
        .where(col("n") > 0)
        .orderBy(col("vlen"))
    }),

    // ---- custom streaming state: flatMapGroupsWithState tracks the
    // set of event types seen per user and emits only newly-seen ones;
    // summing emissions = distinct types per user (batch-boundary
    // independent → oracle-checkable)
    "stream_stateful_distinct" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val ds = eventsStream(s, d)
        .select(col("user_id"), col("event_type")).as[(Long, String)]
      val emitted = ds.groupByKey(_._1)
        .flatMapGroupsWithState[SeenTypes, (Long, Int)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (uid: Long, events: Iterator[(Long, String)], state: GroupState[SeenTypes]) =>
            val seen = state.getOption.map(_.types.toSet).getOrElse(Set.empty)
            val fresh = events.map(_._2).toSet -- seen
            if (fresh.nonEmpty) state.update(SeenTypes((seen ++ fresh).toSeq))
            if (fresh.nonEmpty) Iterator((uid, fresh.size)) else Iterator.empty
        }.toDF("user_id", "n_new")
      runToTable(emitted, "append")
        .groupBy(col("user_id"))
        .agg(sum(col("n_new")).cast("long").as("n_types"))
        .orderBy(col("user_id"))
    }),

    // ---- streaming exact dedup: dropDuplicates keeps the first
    // occurrence per (user_id, event_type) across micro-batches (state
    // store backed) — the exactly-once ingestion dedup. Emitted rows
    // are batch-boundary independent, so the count per type equals the
    // batch COUNT(DISTINCT user_id) and the result is oracle-checkable.
    "stream_dedup" -> ((s, d) => {
      val first = eventsStream(s, d)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      runToTable(first, "append")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy(col("event_type"))
    }),

    // ---- stream-STATIC join: decontamination over a corpus that
    // arrives as a stream. The eval shingle set is a static batch side
    // broadcast into every micro-batch — no stream-side shuffle before
    // the per-doc aggregation, and no join state to bound (the static
    // side is immutable), so this scales to an unbounded crawl. Same
    // output as batch text_decontaminate; the shared oracle proves the
    // incremental and batch paths agree.
    "stream_decontaminate" -> ((s, d) => {
      import graft.ops.{Dedup, TextOps}
      val evalShingles = Tables.documents(s, d)
        .filter(col("doc_id") % 97 === 0)
        .select(Dedup.shingles(TextOps.tokens(col("text")), 3).as("sh"))
        .select(explode(col("sh")).as("shingle")).distinct()
      val train = documentsStream(s, d)
        .filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          Dedup.shingles(TextOps.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), size(col("sh")).as("n_shingles"),
          explode(col("sh")).as("shingle"))
      val flagged = train.join(broadcast(evalShingles), "shingle")
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(count(lit(1)).as("n_shared"))
      runToTable(flagged, "complete")
        .select(col("doc_id"), col("n_shared"),
          TextOps.round4(col("n_shared") / col("n_shingles"))
            .as("contamination"))
        .orderBy(col("doc_id"))
    }),

    // ---- stream-stream self join: views matched to same-user
    // purchases within 30 minutes. Watermarks bound BOTH sides' join
    // state; an inner join emits every match exactly once regardless of
    // batch boundaries, so the aggregate is oracle-checkable.
    "stream_stream_join" -> ((s, d) => {
      val ev = eventsStream(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "30 minutes")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "30 minutes")
      val joined = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      runToTable(joined, "append")
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // ---- stream-stream LEFT OUTER join: the harder outer case — a
    // null-extended row for an unmatched view can only be emitted once
    // the watermark proves no in-window purchase can still arrive
    // (v_ts + 30min past the global watermark, which is the MIN over
    // both inputs' max-event-time - delay). Matched pairs emit exactly
    // as in the inner join; the no-data micro-batch after the last
    // data batch performs the final state eviction. State stays
    // bounded by the same watermark (StreamStateProbe's argument
    // applies unchanged — eviction is the join's correctness
    // condition here, not just a memory bound).
    "stream_stream_left_join" -> ((s, d) => {
      val ev = eventsStream(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "30 minutes")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "30 minutes")
      val joined = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      runToTable(joined, "append")
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("p_user")).as("n_matched"))
        .orderBy(col("user_id"))
    }),

    // ---- CMS over the corpus-as-a-stream: the sketch's mergeability
    // is exactly micro-batch compatibility — each batch's partial
    // (row, bucket) counts add into the running state, so the complete-
    // mode streaming aggregation must land on the identical sketch the
    // batch build produces, and the same heavy-hitter probes (batch
    // side: the probe set is a final query against the finished
    // sketch) return the identical estimates. Oracle = the batch CMS
    // oracle verbatim.
    "stream_cms_heavyhitters" -> ((s, d) => {
      import graft.ops.Sketches
      val streamToks = documentsStream(s, d)
        .select(explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("h", Sketches.polyHash(col("tok")))
      val cells = streamToks.select(
        explode(array((0 until Sketches.D).map(j =>
          struct(lit(j).as("j"),
            Sketches.bucket(col("h"), j).as("b"))): _*)).as("c"))
      val sketch = runToTable(
        cells.groupBy(col("c.j").as("j"), col("c.b").as("b"))
          .agg(count(lit(1)).as("n")), "complete")
      val toks = Tables.documents(s, d)
        .select(explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("h", Sketches.polyHash(col("tok")))
      val top = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("exact_n"), first(col("h")).as("h"))
        .orderBy(col("exact_n").desc, col("tok"))
        .limit(10)
      val probes = top.select(col("tok"), col("exact_n"),
        explode(array((0 until Sketches.D).map(j =>
          struct(lit(j).as("j"),
            Sketches.bucket(col("h"), j).as("b"))): _*)).as("c"))
        .select(col("tok"), col("exact_n"), col("c.j"), col("c.b"))
      probes.join(broadcast(sketch), Seq("j", "b"))
        .groupBy(col("tok"), col("exact_n"))
        .agg(min(col("n")).as("cms_est"))
        .select(col("tok"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overestimate"))
        .orderBy(col("exact_n").desc, col("tok"))
    }),

    // ---- batch sessionization twin (gaps-and-islands; oracle-checked)
    "sessionize_batch" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(wcum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"), col("session_id"), col("session_start"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    }))

  def oracleSql: Map[String, String] = Map(
    // Append-mode emission is deterministic for a single-batch
    // AvailableNow run: the final watermark is floor_ms(max ts) - 30min,
    // and a session (gap-merged at >= 1800s boundaries, matching
    // Spark's half-open [start, last+gap) windows) emits iff its window
    // end (last event + 30min gap) has passed that watermark.
    "stream_session_window" ->
      """WITH b AS (SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
             FROM events),
         m AS (SELECT user_id, ts, value,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                      THEN 1 ELSE 0 END AS ns FROM b),
         s AS (SELECT user_id, ts, value,
                 sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM m),
         a AS (SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
                 count(*) AS n_events, round(sum(value), 2) AS session_value
               FROM s GROUP BY user_id, sid),
         w AS (SELECT (epoch_ms(max(ts)) - 1800000) * 1000 AS wm_us
               FROM events)
       SELECT CAST(session_start AS TIMESTAMP) AS session_start, user_id,
              n_events, session_value
       FROM a, w WHERE epoch_us(last_ts) + 1800000000 <= wm_us
       ORDER BY session_start, user_id""",
    "stream_quad_ingest" ->
      """SELECT p, n FROM (
           SELECT 'http://localhost/event_type' AS p, count(*) AS n FROM events
           UNION ALL
           SELECT 'http://localhost/user_id', count(*) FROM events) t
         ORDER BY p""",
    // one quad per event survives the doubled delta writes
    "stream_mor_ingest" ->
      """SELECT event_type AS o_value, count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    // net change fold from an empty baseline = the final state's
    // histogram (flip sequences cancel) — rdf_cdc_refresh's recompute
    "stream_cdc_tail" ->
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
    "stream_dict_ingest" ->
      """SELECT event_type AS o_value, count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_stateful_distinct" ->
      """SELECT user_id, count(DISTINCT event_type) AS n_types
         FROM events GROUP BY user_id ORDER BY user_id""",
    "stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    // identical to the batch text_decontaminate oracle: the streaming
    // path must produce the same flags the batch path does
    "stream_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                    FROM documents),
          s AS (SELECT doc_id, unnest(list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   for i in range(1, len(toks) - 1)])) AS shingle
                FROM t WHERE len(toks) >= 3),
          c AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY doc_id),
          ev AS (SELECT DISTINCT shingle FROM s WHERE doc_id % 97 = 0),
          hits AS (SELECT s.doc_id, count(*) AS n_shared
                   FROM s JOIN ev USING (shingle)
                   WHERE s.doc_id % 97 <> 0 GROUP BY s.doc_id)
        SELECT h.doc_id, CAST(h.n_shared AS BIGINT) AS n_shared,
          floor(h.n_shared * 1.0 / c.n_shingles * 10000 + 0.5) / 10000
            AS contamination
        FROM hits h JOIN c ON h.doc_id = c.doc_id
        ORDER BY h.doc_id""",
    // identical to the batch CMS oracle: the streaming sketch must be
    // the same table
    "stream_cms_heavyhitters" ->
      graft.ops.Sketches.oracleSql("sketch_cms_heavyhitters"),
    "stream_stream_join" ->
      """SELECT v.user_id AS user_id, count(*) AS n_pairs
         FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
         JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase') p
           ON p.user_id = v.user_id
          AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
         GROUP BY 1 ORDER BY 1""",
    // left-outer twin: pairs as above; a null-extended row per view
    // with NO in-window purchase, but only when the view's match window
    // closed under the final watermark = min over both inputs of
    // floor_ms(max ts) - 30min (per-input watermark nodes, global min)
    "stream_stream_left_join" ->
      """WITH v AS (SELECT user_id, ts FROM events
                    WHERE event_type = 'view'),
           p AS (SELECT user_id, ts FROM events
                 WHERE event_type = 'purchase'),
           wm AS (SELECT (least((SELECT epoch_ms(max(ts)) FROM v),
                                (SELECT epoch_ms(max(ts)) FROM p))
                          - 1800000) * 1000 AS wm_us),
           pairs AS (
             SELECT v.user_id FROM v JOIN p
               ON p.user_id = v.user_id
              AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE),
           unmatched AS (
             SELECT v.user_id FROM v, wm
             WHERE NOT EXISTS (
                     SELECT 1 FROM p
                     WHERE p.user_id = v.user_id
                       AND p.ts >= v.ts
                       AND p.ts <= v.ts + INTERVAL 30 MINUTE)
               AND epoch_us(v.ts) + 1800000000 <= wm.wm_us),
           allrows AS (
             SELECT user_id, 1 AS m FROM pairs
             UNION ALL
             SELECT user_id, 0 FROM unmatched)
         SELECT user_id, count(*) AS n_rows, CAST(sum(m) AS BIGINT) AS n_matched
         FROM allrows GROUP BY user_id ORDER BY user_id""",
    "stream_tumbling_agg" ->
      """SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP)
             AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "stream_sliding_agg" ->
      """SELECT window_start, event_type, count(*) AS n FROM (
           SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP)
               AS window_start, event_type FROM events
           UNION ALL
           SELECT CAST(time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL '5 minutes' AS TIMESTAMP), event_type
           FROM events) t
         GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "sessionize_batch" ->
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS session_value
         FROM (
           SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM (
             SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                      OR CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800 THEN 1
                 ELSE 0 END AS new_session
             FROM (SELECT user_id, ts, value,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                   FROM events) t1) t2) t3
         GROUP BY user_id, session_id ORDER BY user_id, session_id""")
}
