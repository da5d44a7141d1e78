package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Physical file-layout clustering — the write-side half of scan
  * performance that partitioning alone cannot give at 100 TB.
  *
  * A table sorted on ONE column yields tight per-file min/max ranges on
  * that column only: a time-sliced query over a user-sorted log (or a
  * user-sliced query over a time-sorted log) overlaps EVERY file and
  * the engine's file/row-group statistics prune nothing. Z-ORDER
  * clustering (bit-interleaved multi-dimensional ordering — the
  * Delta/Iceberg OPTIMIZE ZORDER layout) sorts by a space-filling curve
  * over BOTH columns, so each written file covers a small axis-aligned
  * box of the 2-D space and ANY narrow box predicate — on either dim or
  * both — overlaps only the files whose box intersects it. The pruning
  * is worst-case-balanced: with F files the single-dim sort is (1, F)
  * across the two query shapes, the z-order is (~√F, ~√F).
  *
  * Everything is column arithmetic (width_bucket bins + shift/mask
  * interleave — codegen'd, no UDF) and the layout write is
  * `repartitionByRange(z).sortWithinPartitions(z)`: the range exchange
  * is the ONE shuffle a layout rewrite fundamentally needs, and at
  * cluster scale it is the same amortize-once trade as
  * [[graft.util.Bucketing]] — paid at write time, repaid by every
  * subsequent scan.
  */
object Layout {

  /** Bits per dimension (8 → 256 bins per dim, 16-bit z values). */
  private val Bits = 8

  /** Interleave the low [[Bits]] bits of `bx` (even positions) and `by`
    * (odd positions) into a z-curve key — pure shift/mask columns. */
  private[graft] def zInterleave(bx: Column, by: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(by, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** events with integer (user_id, ts-micros) dims + their global
    * extents broadcast as a 1-row cross join. */
  private def dims(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("tsu"))
    val ext = ev.agg(
      min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(col("tsu")).as("tmin"), max(col("tsu")).as("tmax"))
    ev.crossJoin(broadcast(ext))
  }

  /** Per-file (min,max) boxes of a written layout: one aggregation over
    * `input_file_name()` — exactly the file-statistics index a lakehouse
    * table format keeps, recomputed from the bytes. */
  private def fileBoxes(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
        min(col("tsu")).as("tlo"), max(col("tsu")).as("thi"))

  /** Files whose box intersects [ulo,uhi]×[tlo,thi]. */
  private def hits(boxes: DataFrame, u: (Column, Column),
      t: (Column, Column)): Long =
    boxes.filter(col("uhi") >= u._1 && col("ulo") <= u._2
        && col("thi") >= t._1 && col("tlo") <= t._2)
      .count()

  private val Files = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Write events twice — single-dim sort on user_id vs z-order on
    // (user_id, ts) — then measure file-level pruning for the two
    // canonical box shapes: A = narrow user × all time, B = narrow time
    // × all users. The oracle-checked gate: the z-order layout's WORST
    // case over both shapes beats the single-dim layout's worst case
    // (which is "read everything" for shape B). Row output = shape B's
    // content read back THROUGH the z-ordered files, proving the
    // rewrite lost nothing the oracle's direct scan finds.
    "layout_zorder" -> ((s, d) => {
      val base = dims(s, d)
      val withBins = base
        .withColumn("bu", when(col("umax") > col("umin"),
            ((col("user_id") - col("umin")) * ((1 << Bits) - 1)
              / (col("umax") - col("umin"))).cast("int"))
          .otherwise(lit(0)))
        .withColumn("bt", when(col("tmax") > col("tmin"),
            ((col("tsu") - col("tmin")) * ((1 << Bits) - 1)
              / (col("tmax") - col("tmin"))).cast("int"))
          .otherwise(lit(0)))
        .withColumn("z", zInterleave(col("bu"), col("bt")))
        .select(col("event_id"), col("user_id"), col("value"),
          col("tsu"), col("z"))
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(tmp)
      withBins.repartitionByRange(Files, col("z"))
        .sortWithinPartitions(col("z"))
        .write.parquet(s"$tmp/zorder")
      withBins.repartitionByRange(Files, col("user_id"))
        .sortWithinPartitions(col("user_id"))
        .write.parquet(s"$tmp/linear")

      // the probe boxes: integer 40%..43%-of-extent slices (the SAME
      // arithmetic the oracle runs), each crossed with the full other dim
      val ext = base.select(col("umin"), col("umax"), col("tmin"), col("tmax"))
        .limit(1).collect().head
      val (umin, umax) = (ext.getLong(0), ext.getLong(1))
      val (tmin, tmax) = (ext.getLong(2), ext.getLong(3))
      def slice(lo: Long, hi: Long): (Long, Long) =
        (lo + (hi - lo) * 2 / 5, lo + (hi - lo) * 43 / 100)
      val (ulo, uhi) = slice(umin, umax)
      val (tlo, thi) = slice(tmin, tmax)

      val zb = fileBoxes(s, s"$tmp/zorder").cache()
      val lb = fileBoxes(s, s"$tmp/linear").cache()
      val zWorst = math.max(
        hits(zb, (lit(ulo), lit(uhi)), (lit(tmin), lit(tmax))),
        hits(zb, (lit(umin), lit(umax)), (lit(tlo), lit(thi))))
      val lWorst = math.max(
        hits(lb, (lit(ulo), lit(uhi)), (lit(tmin), lit(tmax))),
        hits(lb, (lit(umin), lit(umax)), (lit(tlo), lit(thi))))
      zb.unpersist(); lb.unpersist()

      s.read.parquet(s"$tmp/zorder")
        .filter(col("tsu") >= tlo && col("tsu") <= thi)
        .select(col("event_id"), col("user_id"),
          (floor(col("value") * 10000 + lit(0.5)) / 10000).as("value"))
        .withColumn("zorder_prunes",
          lit(if (zWorst < lWorst) 1 else 0).cast("int"))
        .orderBy(col("event_id"))
    }),

    // ---- SUBJECT-clustered quad-store layout (GraphStore.clusterGraph,
    // the entity-lookup index): a fragmented round-robin ingest (16
    // full-range files — every file's s-box spans the whole corpus, so
    // a constant-subject probe must open all 16) is rewritten
    // range-partitioned on s. Ranges are DISJOINT by construction, so
    // the same probe now touches exactly ONE file — measured from the
    // per-file min/max boxes, the statistics a lakehouse file index
    // keeps. Row output = the probed subject's own quads read back
    // THROUGH the clustered store (content preserved), with both gates
    // as oracle-checked columns.
    "layout_cluster_subjects" -> ((s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-cluster-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(tmp)
      val store = new graft.model.GraphStore(s, s"$tmp/store")
      val g = "http://ex/events"
      val ev = Tables.events(s, d)
      val nullS = lit(null).cast("string")
      val subj = concat(lit("http://ex/ev/"), col("event_id")).as("s")
      val quads = ev.select(lit(g).as("graph"), subj,
          lit("http://ex/p/type").as("p"), col("event_type").as("o_value"),
          nullS.as("o_type"), nullS.as("o_lang"), lit("literal").as("o_kind"))
        .unionByName(ev.filter(col("user_id").isNotNull)
          .select(lit(g).as("graph"), subj, lit("http://ex/p/user").as("p"),
            concat(lit("http://ex/u/"), col("user_id")).as("o_value"),
            nullS.as("o_type"), nullS.as("o_lang"), lit("iri").as("o_kind")))
      store.append(quads.repartition(16)) // round-robin = full-range files
      val probeS = s"http://ex/ev/${ev.agg(min(col("event_id"))).head.getLong(0)}"
      def sBoxes = s.read.parquet(s"$tmp/store")
        .groupBy(input_file_name().as("f"))
        .agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
      def hitsFor(subject: String): Long =
        sBoxes.filter(col("lo") <= subject && col("hi") >= subject).count()
      val before = hitsFor(probeS)
      store.clusterGraph(g, numFiles = 8)
      val after = hitsFor(probeS)
      store.readGraphs(Seq(g)).filter(col("s") === probeS)
        .select(col("p"), col("o_value"))
        .withColumn("clustered_prunes",
          lit(if (after < before) 1 else 0).cast("int"))
        .withColumn("pruned_to_one",
          lit(if (after == 1L) 1 else 0).cast("int"))
        .orderBy(col("p"), col("o_value"))
    }),

    // ---- small-file compaction (the OPTIMIZE bin-packing half of
    // lakehouse table maintenance; the MOR store has its own in
    // rdf_store_compact — this is the raw-table twin). A fragmented
    // ingest layout (64 tiny files, the streaming-sink failure mode)
    // is rewritten through coalesce — a NARROW dependency, so the
    // compaction moves bytes without a single shuffle; at 100 TB
    // that is the difference between an OPTIMIZE that re-shuffles the
    // table and one that only concatenates partitions. Gates: fewer
    // files after, content identical (the oracle recomputes the
    // aggregate from the raw table).
    "layout_compact_files" -> ((s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-compactf-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(tmp)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      ev.repartition(64).write.parquet(s"$tmp/fragmented")
      val frag = s.read.parquet(s"$tmp/fragmented")
      val filesBefore = frag.inputFiles.length
      frag.coalesce(4).write.parquet(s"$tmp/compacted")
      val compacted = s.read.parquet(s"$tmp/compacted")
      val filesAfter = compacted.inputFiles.length
      compacted.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          (floor(sum(col("value")) * 100 + lit(0.5)) / 100).as("sum_value"))
        .withColumn("files_reduced",
          lit(if (filesAfter < filesBefore) 1 else 0).cast("int"))
        .orderBy(col("event_type"))
    }))

  def oracleSql: Map[String, String] = Map(
    // shape B's content from the raw table + the pruning gate as a
    // checked constant; the 2/5 & 43/100 integer slice arithmetic is
    // replayed exactly
    "layout_zorder" ->
      """WITH ext AS (
           SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
           FROM events),
          box AS (
           SELECT tmin + (tmax - tmin) * 2 // 5 AS tlo,
                  tmin + (tmax - tmin) * 43 // 100 AS thi FROM ext)
         SELECT event_id, user_id,
           floor(value * 10000 + 0.5) / 10000 AS value,
           1 AS zorder_prunes
         FROM events, box
         WHERE epoch_us(ts) >= tlo AND epoch_us(ts) <= thi
         ORDER BY event_id""",
    // the probed subject's quads from the raw table + both pruning
    // gates as checked constants — a clustered rewrite that lost a quad
    // OR failed to prune to one file is a hash mismatch
    "layout_cluster_subjects" ->
      """WITH pid AS (SELECT min(event_id) AS k FROM events)
         SELECT p, o_value, 1 AS clustered_prunes, 1 AS pruned_to_one
         FROM (
           SELECT 'http://ex/p/type' AS p, e.event_type AS o_value
           FROM events e, pid WHERE e.event_id = pid.k
           UNION ALL
           SELECT 'http://ex/p/user',
                  'http://ex/u/' || CAST(e.user_id AS VARCHAR)
           FROM events e, pid
           WHERE e.event_id = pid.k AND e.user_id IS NOT NULL)
         ORDER BY p, o_value""",
    // compaction is content-invisible: the aggregate over the
    // compacted files must equal the raw table's
    "layout_compact_files" ->
      """SELECT event_type, count(*) AS n,
           floor(sum(value) * 100 + 0.5) / 100 AS sum_value,
           1 AS files_reduced
         FROM events GROUP BY event_type ORDER BY event_type""")
}
