package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** End-to-end corpus-curation operators — the composition layer a
  * training-data pipeline runs on top of the text/dedup primitives:
  * quality+length gating with exact-dup collapse, token-count
  * histograms, exact per-language percentiles, and deterministic
  * hash-Bernoulli sampling.
  *
  * Everything is a single groupBy/filter pipeline over `documents`
  * (map-side work + one shuffle each) — no collects, no UDFs — so each
  * operator's cost profile is the same at sf0.01 and at 100 TB.
  */
object Curation {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- the full curation funnel: quality gate -> length gate ->
    // exact-dup collapse (keep lowest doc_id per normalized-text md5)
    // -> per-language corpus stats
    // ---- the dataset card: one per-source summary row a corpus ships
    // with — documents, token mass, exact-dup rate (md5 fingerprints),
    // mean length, language count. Pure composition of the curation
    // primitives in one aggregation pass over the corpus plus one
    // fingerprint aggregation; at 100 TB this is the nightly corpus
    // report, not a query someone waits on.
    "corpus_report" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          size(toks).as("n_tokens"),
          md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("fp"))
      val dups = docs.groupBy(col("source"), col("fp"))
        .agg(count(lit(1)).as("k"))
        .groupBy(col("source"))
        .agg(sum(col("k") - 1).as("n_dups"))
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"),
          TextOps.round4(avg(col("n_tokens"))).as("avg_tokens"),
          countDistinct(col("lang")).as("n_langs"))
        .join(dups, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("avg_tokens"), col("n_langs"),
          col("n_dups").cast("long").as("n_exact_dups"))
        .orderBy(col("source"))
    }),

    "curation_pipeline" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val n = size(toks).cast("double")
      val stopRatio = size(filter(toks, t =>
        array_contains(array(Seq("the", "a", "of", "to", "and").map(lit): _*), t))) / n
      val shortRatio = size(filter(toks, t => length(t) <= lit(2))) / n
      val quality = lit(1.0) - stopRatio * 0.5 - shortRatio * 0.5
      val gated = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(toks).as("n_tokens"), quality.as("quality"),
          md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("fp"))
        .filter(col("quality") >= 0.7 &&
          col("n_tokens").between(20, 10000))
      // min(struct(doc_id, ...)) = keep the lexicographically-first doc
      // per fingerprint — one hash-agg, no window shuffle
      val kept = gated
        .groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality"))).as("keep"))
        .select(col("keep.*"))
      kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          TextOps.round4(avg(col("quality"))).as("avg_quality"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .orderBy(col("lang"))
    }),

    // ---- token-count histogram (fixed-width buckets, clamped tail)
    "text_token_histogram" -> ((s, d) => {
      val n = size(TextOps.tokens(col("text")))
      Tables.documents(s, d)
        .select(least(floor(n / 10), lit(19)).cast("int").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("bucket"))
    }),

    // ---- exact per-language percentiles of document token counts
    // (`percentile` = exact linear interpolation, matching DuckDB's
    // quantile_cont; approx sketches are q25's territory)
    "corpus_percentiles" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), size(TextOps.tokens(col("text"))).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(round(expr("percentile(n_tokens, 0.25)"), 4).as("p25"),
          round(expr("percentile(n_tokens, 0.5)"), 4).as("p50"),
          round(expr("percentile(n_tokens, 0.75)"), 4).as("p75"),
          round(expr("percentile(n_tokens, 0.95)"), 4).as("p95"))
        .orderBy(col("lang"))
    }),

    // ---- approx per-language percentiles — the 100 TB path. Exact
    // `percentile` buffers every group value; this is a one-pass
    // MERGEABLE log-quantized histogram sketch (the HdrHistogram idea,
    // Gil Tene — public; also the shape of DataSketches' REQ bins):
    // each value keeps its top 4 significant binary digits
    // (qv = (x >> s) << s with s = max(floor(log2 x) - 3, 0)), giving
    // ≤ 8 bins per octave × 64 octaves — a few-hundred-row histogram
    // per group whose counts ADD under merge, so the same plan holds
    // when a language has 1e10 documents (relative value error < 1/8,
    // and the reported quantile is exactly the quantized value of the
    // true nearest-rank element — the audit twin's theorem). Unlike
    // approx_percentile's engine-private KLL sketch, every step is
    // integer arithmetic, so the oracle replays histogram, ranks, and
    // output bit-for-bit. Rank tests use cross-multiplied integers
    // (b*cum >= a*tot <=> cum >= ceil(a*tot/b)) — no doubles anywhere.
    "corpus_percentiles_approx" -> ((s, d) => Curation.pctSketch(s, d)),

    // ---- audit twin: the sketch's guarantee as a checked THEOREM —
    // the exact nearest-rank quantile (value at rank ceil(q*n)) lies
    // in the reported bin [qv, qv + 2^s): quantization is monotone, so
    // the first bin whose cumulative count reaches rank r is exactly
    // the bin of the rank-r element. Booleans computed in-engine; the
    // oracle REPLAYS the whole derivation (sketch + exact ranks), not
    // just the all-true shape.
    "corpus_percentiles_approx_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d)
        .select(col("lang"), size(TextOps.tokens(col("text")))
          .cast("long").as("nt"))
      val sk = Curation.pctSketch(s, d)
      val exact = toks
        .withColumn("rn", row_number()
          .over(Window.partitionBy(col("lang")).orderBy(col("nt"))))
        .withColumn("tot", count(lit(1))
          .over(Window.partitionBy(col("lang"))))
        .groupBy(col("lang"))
        .agg(
          min(when(col("rn") * 4 >= col("tot"), col("nt"))).as("e25"),
          min(when(col("rn") * 2 >= col("tot"), col("nt"))).as("e50"),
          min(when(col("rn") * 4 >= col("tot") * 3, col("nt"))).as("e75"),
          min(when(col("rn") * 20 >= col("tot") * 19, col("nt"))).as("e95"))
      def inBin(p: String, e: String) =
        (col(p) <= col(e)) && (col(e) < expr(Curation.binHiSql(p)))
      sk.join(exact, "lang")
        .select(col("lang"),
          inBin("p25", "e25").as("ok_q0"), inBin("p50", "e50").as("ok_q1"),
          inBin("p75", "e75").as("ok_q2"), inBin("p95", "e95").as("ok_q3"))
        .orderBy(col("lang"))
    }),

    // ---- deterministic hash-Bernoulli sample (~1/8): membership is a
    // pure function of doc_id, so the sample is identical on every run,
    // every executor layout, and every engine (no seed plumbing)
    "sample_hash_bernoulli" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0", "1"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic EPOCH SHUFFLE (the training-loader order): per
    // epoch every doc gets a pseudo-random position md5(epoch ":" id) —
    // a pure function, so the order is reproducible on any cluster
    // layout and DIFFERENT across epochs with no seed plumbing or
    // true random shuffle (a 100 TB global randomization is one
    // map-side hash + one (epoch, shard) exchange, never a random-key
    // sort that can't be replayed after a failure). Shard = hash-prefix
    // bucket (deterministic, unlike range-sampled boundaries); order
    // within a shard = the hash. The output fingerprints each shard's
    // ORDER (Σ doc_id·rank — order-sensitive) so the oracle checks the
    // exact permutation, not just membership.
    "corpus_epoch_shuffle" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val epochs = Seq(0, 1).map(e => docs.withColumn("epoch", lit(e)))
        .reduce(_ unionAll _)
      val keyed = epochs.withColumn("h", md5(concat(
          col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
        .withColumn("shard",
          expr("instr('0123456789abcdef', substring(h, 1, 1)) % 8")
            .cast("int"))
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("h"), col("doc_id"))
      keyed.withColumn("rk", row_number().over(w))
        .groupBy(col("epoch"), col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id") * col("rk")).cast("long").as("order_fp"))
        .orderBy(col("epoch"), col("shard"))
    }),

    // ---- tokenizer vocabulary: top-k tokens by corpus frequency,
    // deterministic ties (count DESC, token ASC). The word-count shape:
    // map-side partial aggregation absorbs the explode, the shuffle
    // carries one row per distinct token, and top-k is a TakeOrdered —
    // no global sort materializes at any scale.
    "token_vocab" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)
    }),

    // ---- sequence packing: assign docs to fixed token-budget bins
    // (context windows) by running offset — bin = the window a doc's
    // START offset falls in, scanning docs in doc_id order per language.
    // The running sum is a window cumsum per lang; at 100 TB the
    // partition key would be (lang, shard) with per-shard budgets so no
    // single partition serializes the corpus.
    "pack_sequences" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).as("n_tokens"))
        .withColumn("offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("bin", floor(col("offset") / 2048).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("bin_tokens"))
        .orderBy(col("lang"), col("bin"))
    }),

    // ---- per-source document cap (web-crawl domain quota): keep the
    // deterministic md5-order top-`cap` docs per source. EXACT top-k per
    // key without sorting whole partitions: rows bucket by their first
    // 2 md5 hex chars (256 uniform buckets); per-(source,bucket) counts
    // — a tiny table, 256 rows/source — give each source's boundary
    // bucket where the cumulative count crosses the cap. Whole buckets
    // before the boundary pass unranked; ONLY the boundary bucket takes
    // a row_number sort, touching ~n/256 of a hot source instead of all
    // of it. A hot domain with 10^9 docs sorts ~4M rows, not 10^9.
    "corpus_source_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 10
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("bk", substring(col("h"), 1, 2))
      val wcum = Window.partitionBy(col("source")).orderBy(col("bk"))
      val bounds = docs.groupBy(col("source"), col("bk"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(wcum))
        .withColumn("before", col("cum") - col("n"))
        .filter(col("before") < cap) // buckets intersecting the top-cap
        .select(col("source"), col("bk"), col("before"), col("cum"))
      val hit = docs.join(broadcast(bounds), Seq("source", "bk"))
      val whole = hit.filter(col("cum") <= cap)
      val wrank = Window.partitionBy(col("source"), col("bk"))
        .orderBy(col("h"), col("doc_id"))
      val boundary = hit.filter(col("cum") > cap)
        .withColumn("rk", row_number().over(wrank))
        .filter(col("rk") <= lit(cap) - col("before"))
        .drop("rk")
      whole.unionByName(boundary)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // ---- shard assignment by cumulative token budget — the training-
    // file writer's problem: pack documents, in a stable global order,
    // into shards of ~`budget` tokens each. The global running sum is
    // computed SCALE-SAFELY: a window over the whole ordered corpus is
    // ONE sorted partition (the hot-term-window mistake in reverse), so
    // instead docs get order-aligned coarse buckets on doc_id, the
    // per-bucket token sums (a `buckets`-row aggregate) cumulate into
    // exclusive per-bucket OFFSETS driver-side, and the window cumsum
    // runs per bucket — every sort is bucket-sized, never corpus-sized,
    // and the offsets table broadcasts. Same two-phase prefix sum a
    // 1000-executor shard writer needs.
    "corpus_shards" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      shardByBudget(docs, budget = 4096L, offset = 0L)
        .orderBy(col("doc_id"))
    }),

    // ---- APPEND-STABLE incremental sharding: the production contract
    // behind corpus_shards. Training shards, once written, are
    // immutable; a crawl batch arrives append-only (every new doc_id >
    // every base doc_id), so the base prefix sums are FROZEN — the
    // increment needs only the base's total token count (one number)
    // as its offset, never a re-scan or re-shard of the base. The
    // result must be byte-identical to re-sharding the whole corpus
    // from scratch, which is exactly what the oracle computes.
    "corpus_shards_incremental" -> ((s, d) => {
      val budget = 4096L
      val cut = 400L // ids < cut are the base snapshot, >= cut the batch
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      val base = shardByBudget(toks.filter(col("doc_id") < cut),
        budget, offset = 0L)
      val baseRow = toks.filter(col("doc_id") < cut)
        .agg(sum(col("n_tok"))).collect().head
      val baseTotal = if (baseRow.isNullAt(0)) 0L else baseRow.getLong(0)
      val inc = shardByBudget(toks.filter(col("doc_id") >= cut),
        budget, offset = baseTotal)
      base.unionByName(inc).orderBy(col("doc_id"))
    }),

    // ---- DSIR-shaped importance weighting: score each doc by how much
    // its hashed-bigram distribution looks like the target slice
    // (lang = 'en') vs the raw corpus — sum of per-occurrence
    // log(p_target(b) / p_raw(b)) over 256 md5 feature buckets,
    // add-one smoothed. One explode + two short-key aggs; the two
    // 256-row bucket tables broadcast, so the per-doc scoring join is
    // map-side at any corpus size.
    "quality_importance_weights" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val bigrams = filter(
        zip_with(toks, slice(toks, lit(2), size(toks)),
          (a, b) => concat(a, lit(" "), b)),
        x => x.isNotNull)
      val occ = Tables.documents(s, d)
        .select(col("doc_id"), col("lang") === "en" as "tgt",
          explode(bigrams).as("bg"))
        .select(col("doc_id"), col("tgt"),
          substring(md5(col("bg")), 1, 2).as("b"))
      val buckets = occ.groupBy(col("b"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("tgt"), 1L).otherwise(0L)).as("n_tgt"))
      val totals = buckets.agg(
        sum(col("n_raw")).as("t_raw"), sum(col("n_tgt")).as("t_tgt"))
      val rates = buckets.crossJoin(broadcast(totals))
        .select(col("b"),
          ((col("n_tgt") + 1) / (col("t_tgt") + 256)).as("p_tgt"),
          ((col("n_raw") + 1) / (col("t_raw") + 256)).as("p_raw"))
      occ.join(broadcast(rates), "b")
        .groupBy(col("doc_id"))
        .agg(TextOps.round4(sum(log(col("p_tgt") / col("p_raw"))))
          .as("importance"))
        .orderBy(col("doc_id"))
    }))

  /** The two-phase distributed prefix-sum sharder shared by
    * `corpus_shards` and its append-only increment: order-aligned
    * coarse buckets on doc_id, a `buckets`-row sum aggregate cumulated
    * into exclusive per-bucket offsets driver-side (seeded with
    * `offset` — the frozen base total in the incremental case), and a
    * bucket-partitioned window cumsum. Every sort is bucket-sized;
    * the offsets table broadcasts. */
  private def shardByBudget(docs: DataFrame, budget: Long,
      offset: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = 64
    val ext = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect().head
    // Empty input: min/max come back null — return the empty sharding
    // rather than NPE (the incremental path hits this at tiny SFs
    // where one side of the snapshot cut has no rows).
    if (ext.isNullAt(0))
      return docs.select(col("doc_id"), col("n_tok"))
        .withColumn("shard", lit(0L)).limit(0)
    val (lo, hi) = (ext.getLong(0), ext.getLong(1))
    val bucketed = docs.withColumn("bk",
      ((col("doc_id") - lit(lo)) * buckets / lit(hi - lo + 1)).cast("int"))
    val sums = bucketed.groupBy(col("bk")).agg(sum(col("n_tok")).as("bsum"))
      .orderBy(col("bk")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = sums.scanLeft((0, offset, offset)) {
      case ((_, _, acc), (bk, bs)) => (bk, acc, acc + bs)
    }.drop(1).map { case (bk, off, _) => (bk, off) }
    val s = docs.sparkSession
    import s.implicits._
    val offDf = offsets.toSeq.toDF("bk", "off")
    val wb = Window.partitionBy(col("bk")).orderBy(col("doc_id"))
    bucketed.join(broadcast(offDf), "bk")
      .withColumn("cumb",
        col("off") + sum(col("n_tok")).over(wb) - col("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        floor(col("cumb") / budget).cast("long").as("shard"))
  }

  /** Spark-SQL text of the log-quantization `qv = (x >> s) << s`,
    * `s = max(floor(log2 x) - 3, 0)` (floor(log2 x) = length(bin(x))-1
    * — both engines print minimal-length binary strings). Shared as
    * TEXT because the shift distance is a column, which the
    * `functions.shiftright(Column, Int)` overload can't express. */
  private[graft] def logQuantizeSql(c: String): String =
    s"""CASE WHEN $c <= 0 THEN CAST(0 AS BIGINT)
       |ELSE CAST(shiftleft(shiftright(CAST($c AS BIGINT),
       |  greatest(length(bin($c)) - 4, 0)),
       |  greatest(length(bin($c)) - 4, 0)) AS BIGINT) END""".stripMargin

  /** Exclusive upper bound of the bin whose lower bound is `p`:
    * p + 2^s (the quantized value keeps x's top bit, so s derives from
    * p the same way); bin 0 is exactly {0..0}, hi = 1. */
  private[graft] def binHiSql(p: String): String =
    s"""CASE WHEN $p <= 0 THEN CAST(1 AS BIGINT)
       |ELSE $p + CAST(shiftleft(CAST(1 AS BIGINT),
       |  greatest(length(bin($p)) - 4, 0)) AS BIGINT) END""".stripMargin

  /** The log-quantized histogram percentile sketch (see the
    * `corpus_percentiles_approx` comment): ONE groupBy over a
    * few-hundred-bin histogram, two window passes over histogram-sized
    * data (never row-sized), integer-only rank tests. */
  private[graft] def pctSketch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.documents(s, d)
      .select(col("lang"), size(TextOps.tokens(col("text"))).as("nt"))
      .selectExpr("lang", logQuantizeSql("nt") + " AS qv")
      .groupBy(col("lang"), col("qv"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("lang")).orderBy(col("qv"))))
      .withColumn("tot", sum(col("c"))
        .over(Window.partitionBy(col("lang"))))
    cum.groupBy(col("lang"))
      .agg(
        min(when(col("cum") * 4 >= col("tot"), col("qv"))).as("p25"),
        min(when(col("cum") * 2 >= col("tot"), col("qv"))).as("p50"),
        min(when(col("cum") * 4 >= col("tot") * 3, col("qv"))).as("p75"),
        min(when(col("cum") * 20 >= col("tot") * 19, col("qv"))).as("p95"))
      .orderBy(col("lang"))
  }

  /** DuckDB replay of the quantization (dialect: `>>`/`<<` operators
    * instead of shiftleft/shiftright). */
  private def logQuantizeDuck(c: String): String =
    s"""CASE WHEN $c <= 0 THEN CAST(0 AS BIGINT)
       |ELSE CAST((($c >> greatest(length(bin($c)) - 4, 0))
       |  << greatest(length(bin($c)) - 4, 0)) AS BIGINT) END""".stripMargin

  private def binHiDuck(p: String): String =
    s"""CASE WHEN $p <= 0 THEN CAST(1 AS BIGINT)
       |ELSE $p + CAST((1 << greatest(length(bin($p)) - 4, 0))
       |  AS BIGINT) END""".stripMargin

  /** The sketch's full DuckDB replay, shared by the main oracle and
    * the audit oracle's CTE. */
  private def pctSketchDuck: String =
    s"""WITH toks AS (
       |  SELECT lang,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS nt
       |  FROM documents),
       |qz AS (SELECT lang, ${logQuantizeDuck("nt")} AS qv FROM toks),
       |hist AS (SELECT lang, qv, count(*) AS c FROM qz GROUP BY 1, 2),
       |cum AS (SELECT lang, qv,
       |    sum(c) OVER (PARTITION BY lang ORDER BY qv) AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS tot
       |  FROM hist)
       |SELECT lang,
       |  CAST(min(CASE WHEN 4*cum >= tot THEN qv END) AS BIGINT) AS p25,
       |  CAST(min(CASE WHEN 2*cum >= tot THEN qv END) AS BIGINT) AS p50,
       |  CAST(min(CASE WHEN 4*cum >= 3*tot THEN qv END) AS BIGINT) AS p75,
       |  CAST(min(CASE WHEN 20*cum >= 19*tot THEN qv END) AS BIGINT) AS p95
       |FROM cum GROUP BY lang""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // full sketch replay — histogram, cumulative ranks, output
    "corpus_percentiles_approx" ->
      (pctSketchDuck + " ORDER BY lang"),
    "corpus_report" ->
      """WITH docs AS (
           SELECT doc_id, source, lang,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
           FROM documents),
         dups AS (
           SELECT source, CAST(sum(k - 1) AS BIGINT) AS n_exact_dups
           FROM (SELECT source, fp, count(*) AS k
                 FROM docs GROUP BY source, fp) t
           GROUP BY source)
         SELECT d.source, count(*) AS n_docs,
           CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens,
           floor(avg(d.n_tokens) * 10000 + 0.5) / 10000 AS avg_tokens,
           count(DISTINCT d.lang) AS n_langs,
           p.n_exact_dups
         FROM docs d JOIN dups p ON p.source = d.source
         GROUP BY d.source, p.n_exact_dups ORDER BY d.source""",
    "curation_pipeline" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             len(toks) AS n_tokens,
             1.0 - (len(list_filter(toks,
                      t -> list_contains(['the','a','of','to','and'], t)))
                    * 1.0 / len(toks)) * 0.5
                 - (len(list_filter(toks, t -> length(t) <= 2))
                    * 1.0 / len(toks)) * 0.5 AS quality,
             md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
           FROM (SELECT doc_id, lang, text,
                   string_split_regex(trim(text), '\s+') AS toks
                 FROM documents) t),
         gated AS (
           SELECT * FROM scored
           WHERE quality >= 0.7 AND n_tokens BETWEEN 20 AND 10000),
         kept AS (
           SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
               AS rn FROM gated) WHERE rn = 1)
       SELECT lang, count(*) AS n_docs,
         floor(avg(quality) * 10000 + 0.5) / 10000 AS avg_quality,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       FROM kept GROUP BY lang ORDER BY lang""",
    "text_token_histogram" ->
      """SELECT CAST(least(floor(len(string_split_regex(trim(text), '\s+'))
                / 10.0), 19) AS INT) AS bucket,
           count(*) AS n_docs
         FROM documents GROUP BY bucket ORDER BY bucket""",
    "corpus_percentiles" ->
      """SELECT lang,
           round(quantile_cont(n_tokens, 0.25), 4) AS p25,
           round(quantile_cont(n_tokens, 0.5), 4) AS p50,
           round(quantile_cont(n_tokens, 0.75), 4) AS p75,
           round(quantile_cont(n_tokens, 0.95), 4) AS p95
         FROM (SELECT lang, len(string_split_regex(trim(text), '\s+'))
                 AS n_tokens FROM documents) t
         GROUP BY lang ORDER BY lang""",
    // full replay of the audit's derivation: sketch CTE + exact
    // nearest-rank quantiles + the bin-containment theorem booleans
    "corpus_percentiles_approx_audit" ->
      s"""WITH sk AS ($pctSketchDuck),
          toks AS (
            SELECT lang,
              CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                AS nt
            FROM documents),
          ranked AS (
            SELECT lang, nt,
              row_number() OVER (PARTITION BY lang ORDER BY nt) AS rn,
              count(*) OVER (PARTITION BY lang) AS tot
            FROM toks),
          exact AS (
            SELECT lang,
              min(CASE WHEN 4*rn >= tot THEN nt END) AS e25,
              min(CASE WHEN 2*rn >= tot THEN nt END) AS e50,
              min(CASE WHEN 4*rn >= 3*tot THEN nt END) AS e75,
              min(CASE WHEN 20*rn >= 19*tot THEN nt END) AS e95
            FROM ranked GROUP BY lang)
          SELECT sk.lang,
            (p25 <= e25 AND e25 < ${binHiDuck("p25")}) AS ok_q0,
            (p50 <= e50 AND e50 < ${binHiDuck("p50")}) AS ok_q1,
            (p75 <= e75 AND e75 < ${binHiDuck("p75")}) AS ok_q2,
            (p95 <= e95 AND e95 < ${binHiDuck("p95")}) AS ok_q3
          FROM sk JOIN exact USING (lang) ORDER BY sk.lang""",
    "sample_hash_bernoulli" ->
      """SELECT doc_id, lang FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
         ORDER BY doc_id""",
    // the full permutation replayed: same hash, same shard rule, same
    // within-shard order — an order-sensitive fingerprint per shard
    "corpus_epoch_shuffle" ->
      """WITH k AS (
           SELECT e.epoch, d.doc_id,
             md5(CAST(e.epoch AS VARCHAR) || ':'
               || CAST(d.doc_id AS VARCHAR)) AS h
           FROM documents d
           CROSS JOIN (SELECT 0 AS epoch UNION ALL SELECT 1) e),
         sh AS (
           SELECT epoch, doc_id, h,
             CAST(strpos('0123456789abcdef', substr(h, 1, 1)) % 8 AS INT)
               AS shard
           FROM k),
         rk AS (
           SELECT epoch, shard, doc_id,
             row_number() OVER (PARTITION BY epoch, shard
               ORDER BY h, doc_id) AS rk
           FROM sh)
         SELECT epoch, shard, count(*) AS n_docs,
           CAST(sum(doc_id * rk) AS BIGINT) AS order_fp
         FROM rk GROUP BY epoch, shard ORDER BY epoch, shard""",
    "token_vocab" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
               FROM documents) t
         GROUP BY token ORDER BY n DESC, token LIMIT 100""",
    "pack_sequences" ->
      """SELECT lang, CAST(floor(start_off / 2048.0) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         FROM (
           SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS start_off
           FROM (SELECT doc_id, lang,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens
                 FROM documents) t1) t2
         GROUP BY lang, bin ORDER BY lang, bin""",
    // plain per-source row_number top-cap — the bucketed Spark plan must
    // produce the identical kept set
    "corpus_source_cap" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents) t
         WHERE rk <= 10 ORDER BY source, doc_id""",
    // the plain global-window running sum — the two-phase bucketed
    // prefix sum must assign the identical shards
    "corpus_shards" ->
      """SELECT doc_id, n_tok, CAST(cumb // 4096 AS BIGINT) AS shard
         FROM (
           SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS cumb
           FROM (
             SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tok
             FROM documents) t1) t2
         ORDER BY doc_id""",
    // the increment must be INVISIBLE: frozen base + offset-seeded
    // batch ≡ one from-scratch global running sum over the union
    "corpus_shards_incremental" ->
      """SELECT doc_id, n_tok, CAST(cumb // 4096 AS BIGINT) AS shard
         FROM (
           SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS cumb
           FROM (
             SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                 AS n_tok
             FROM documents) t1) t2
         ORDER BY doc_id""",
    "quality_importance_weights" ->
      """WITH toks AS (SELECT doc_id, lang,
               string_split_regex(trim(text), '\s+') AS t FROM documents),
           occ AS (SELECT doc_id, lang = 'en' AS tgt,
               substr(md5(t[i] || ' ' || t[i+1]), 1, 2) AS b
             FROM (SELECT doc_id, lang, t,
                     unnest(generate_series(1, len(t) - 1)) AS i
                   FROM toks) ti),
           buckets AS (SELECT b, count(*) AS n_raw,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_tgt
             FROM occ GROUP BY b),
           totals AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt
             FROM buckets),
           rates AS (SELECT b, (n_tgt + 1.0) / (t_tgt + 256) AS p_tgt,
               (n_raw + 1.0) / (t_raw + 256) AS p_raw
             FROM buckets, totals)
         SELECT doc_id,
           floor(sum(ln(p_tgt / p_raw)) * 10000 + 0.5) / 10000
             AS importance
         FROM occ JOIN rates USING (b)
         GROUP BY doc_id ORDER BY doc_id""")
}
