package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Corpus rebalancing samplers — the selection step between curation and
  * training-mix assembly. Both are DETERMINISTIC functions of the row
  * key (no RNG, no seed plumbing): the sample is identical on every run,
  * executor layout, and engine, so downstream shards are reproducible
  * and the oracle can replay them exactly.
  */
object Sampling {

  /** md5-hex bucket of a row key: 2 hex chars = 256 uniform buckets.
    * Plain string comparison against a hex threshold implements "keep
    * with probability k/256" identically in any engine (hex digits sort
    * by value; md5 output is lowercase everywhere). */
  private def hexBucket(key: org.apache.spark.sql.Column) =
    substring(md5(key.cast("string")), 1, 2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- stratified (per-language) downsampling: rebalance a corpus
    // dominated by one language. en keeps 64/256 = 25%, the rest keep
    // 192/256 = 75%. Pure map-side filter — the predicate is a function
    // of (doc_id, lang) alone, so at 100 TB this is a scan with zero
    // shuffles and the filter sits on top of the parquet scan.
    "sample_stratified" -> ((s, d) => {
      val b = hexBucket(col("doc_id"))
      Tables.documents(s, d)
        .filter(when(col("lang") === "en", b < "40").otherwise(b < "c0"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // ---- training-mix assembly: per-SOURCE keep rates (the "data
    // mixture" step that turns raw corpus proportions into target
    // proportions). Sources map to one of four weight tiers (1.0 /
    // 0.75 / 0.5 / 0.25 via hex thresholds); output is the mixture
    // manifest — kept docs and kept tokens per source. Map-side filter
    // + one aggregation; the manifest is what a 100 TB run would feed
    // to the shard writer.
    "corpus_mixture_sample" -> ((s, d) => {
      val tier = regexp_extract(col("source"), "(\\d+)$", 1).cast("int") % 4
      val b = hexBucket(col("doc_id"))
      val keep = when(tier === 0, lit(true))
        .when(tier === 1, b < "c0")
        .when(tier === 2, b < "80")
        .otherwise(b < "40")
      Tables.documents(s, d)
        .filter(keep)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(size(TextOps.tokens(col("text")))).cast("long")
            .as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // ---- fixed-size uniform sample per stratum ("reservoir" semantics,
    // k=10 per language): rank docs by a hash of their key and keep the
    // k smallest — the same marginal distribution as one-pass reservoir
    // sampling, but stateless and mergeable. The window is a rank-per-
    // group top-k, which Spark executes with partial TopK under AQE; at
    // 100 TB the k smallest hashes per stratum can be pre-reduced per
    // partition (min-k sketch) before the per-stratum shuffle.
    "sample_reservoir" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .orderBy(col("lang"), col("rk"))
    }),

    // ---- WEIGHTED reservoir (Efraimidis & Spirakis 2006, public
    // literature): keep the per-language top-k by key u^(1/w) — here
    // ranked by the monotone-equivalent ln(u)/w — so longer documents
    // (w = n_chars) are proportionally likelier to survive, the
    // one-pass weighted-sampling shape a streaming curation pipeline
    // uses. Deterministic across engines: u comes from the doc's
    // 48-bit md5 prefix, ln(u) is quantized to an exact 1e-6 integer
    // grid BEFORE the division (integer/integer division is
    // IEEE-identical everywhere; the grid absorbs libm's 1-ulp ln
    // differences), ties break on doc_id.
    "sample_weighted_reservoir" -> ((s, d) => {
      val u48 = conv(substring(md5(col("doc_id").cast("string")), 1, 12),
        16, 10).cast("long")
      val u = (u48 + 1).cast("double") / lit(281474976710656.0) // 2^48
      val qln = floor(log(u) * 1e6).cast("long")
      val key = qln.cast("double") / greatest(col("n_chars"), lit(1L)).cast("double")
      val w = Window.partitionBy(col("lang"))
        .orderBy(key.desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // ---- temperature-based mixture resampling (the multilingual-mix
    // move: source shares follow p^tau, tau=0.5, flattening head
    // sources and boosting the tail). Per-source keep rate =
    // min(1, n^tau / sum(n^tau) * N/2 / n), applied as a deterministic
    // integer threshold on the doc's 24-bit md5 prefix — the rate table
    // is sources-sized and broadcasts, so the corpus pass is map-side.
    // The n^tau weights are rounded to a 1e6 grid BEFORE summing: a
    // float sum's value depends on accumulation order, which differs
    // between engines, while a sum of integers is exact — from there
    // every op in the rate chain is the same IEEE-deterministic
    // sequence in Spark and the oracle, so the cut can't straddle.
    "sample_temperature" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("w", round(pow(col("n"), 0.5) * 1e6).cast("long"))
      val tot = counts.agg(sum(col("n")).as("n_total"),
        sum(col("w")).as("w_total"))
      val rates = counts.crossJoin(broadcast(tot))
        .withColumn("rate", least(lit(1.0),
          col("w").cast("double") / col("w_total") * col("n_total") * 0.5 / col("n")))
        .select(col("source"),
          floor(col("rate") * (1 << 24)).cast("long").as("cut"))
      docs.join(broadcast(rates), "source")
        .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 6),
          16, 10).cast("long") < col("cut"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"))
    }))

  def oracleSql: Map[String, String] = Map(
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
         WHERE CASE WHEN lang = 'en'
                 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
                 ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' END
         ORDER BY doc_id""",
    "corpus_mixture_sample" ->
      """SELECT source, count(*) AS n_kept,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
             AS kept_tokens
         FROM documents
         WHERE CASE CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4
             WHEN 0 THEN TRUE
             WHEN 1 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
             WHEN 2 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
             ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40' END
         GROUP BY source ORDER BY source""",
    "sample_reservoir" ->
      """SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents) t
         WHERE rk <= 10 ORDER BY lang, rk""",
    "sample_weighted_reservoir" ->
      """SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY
               CAST(floor(ln(
                 (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                  + 1) / 281474976710656.0) * 1000000.0) AS BIGINT)
               * 1.0 / greatest(n_chars, 1) DESC,
               doc_id) AS rk
           FROM documents) t
         WHERE rk <= 10 ORDER BY lang, rk""",
    "sample_temperature" ->
      """WITH counts AS (SELECT source, count(*) AS n,
                           CAST(round(pow(n, 0.5) * 1000000) AS BIGINT) AS w
                         FROM documents GROUP BY source),
           tot AS (SELECT sum(n) AS n_total, sum(w) AS w_total
                   FROM counts),
           rates AS (SELECT source,
               CAST(floor(least(1.0,
                 CAST(w AS DOUBLE) / w_total * n_total * 0.5 / n) * 16777216)
                 AS BIGINT) AS cut
             FROM counts, tot)
         SELECT d.source, count(*) AS n_kept
         FROM documents d JOIN rates r ON d.source = r.source
         WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
               < r.cut
         GROUP BY d.source ORDER BY d.source""")
}
