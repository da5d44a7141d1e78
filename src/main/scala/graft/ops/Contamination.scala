package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Benchmark decontamination — flag training documents that share
  * token n-grams with a held-out evaluation set, the standard
  * contamination check run before training on web-scale corpora.
  *
  * The eval set here is the deterministic slice `doc_id % 97 == 0` of
  * `documents` (a stand-in for an external benchmark table; the operator
  * takes any (doc_id, text) DataFrame). Shape: explode both sides to
  * distinct 3-gram shingles, hash-join train shingles against the
  * BROADCAST eval shingle set, count matches per training doc. Eval
  * sets are tiny relative to a 100 TB corpus, so the broadcast removes
  * the corpus-side shuffle entirely — the scan + map-side semi-join is
  * the whole cost, and it parallelizes per input split.
  */
object Contamination {

  /** (doc_id, n_shingles, shingle) exploded distinct 3-grams. (Real
    * decontamination runs use 8-13-gram windows; the synthetic corpus'
    * vocabulary is so small that 3-grams give the same candidate-set
    * shape real data would at 13.) */
  private def shingled(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        Dedup.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("shingle"))

  /** Training docs sharing >=1 3-gram with the eval set, with the
    * shared-shingle count and contaminated fraction of the doc. */
  def flagContaminated(train: DataFrame, eval: DataFrame): DataFrame = {
    val evalShingles = shingled(eval).select(col("shingle")).distinct()
    shingled(train)
      .join(broadcast(evalShingles), "shingle")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"),
        TextOps.round4(col("n_shared") / col("n_shingles"))
          .as("contamination"))
  }

  /** Bloom-prefiltered decontamination — the oversized-eval-set path
    * (standard Bloom-filter semi-join pruning, Bloom CACM 1970; the
    * same shape Spark's own DS-v2 runtime row-level filtering uses).
    *
    * [[flagContaminated]] broadcasts the raw eval shingle set; fine
    * while the eval suite is benchmark-sized, but a consortium-scale
    * holdout (hundreds of benchmarks × 1e8 n-grams of strings) stops
    * fitting in a broadcast long before the corpus stops growing. This
    * variant aggregates the eval shingles into a fixed-size Bloom
    * filter (Spark's own `bloom_filter_agg` over xxhash64 — bits, not
    * strings: 16 MiB covers 1e8 items at ~1% FPR), feeds the FILTER in
    * as a scalar subquery (Spark's own runtime-row-filter shape),
    * prefilters corpus shingles map-side with `might_contain`, and only
    * the surviving sliver reaches the exact join. Bloom filters have no false negatives, so
    * after the exact-verify join the output is IDENTICAL to
    * [[flagContaminated]] — same DuckDB oracle — while the verify
    * join's probe side shrinks from every-corpus-shingle to
    * true-hits + FPR·corpus.
    */
  def flagContaminatedBloom(train: DataFrame, eval: DataFrame,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val evalShingles = shingled(eval).select(col("shingle")).distinct()
    val bloom = evalShingles.agg(GraftShim
      .bloomFilterAgg(xxhash64(col("shingle")), expectedItems, numBits).as("bf"))
    // scalar subquery: the filter plan runs once, its one binary value
    // feeds every probe — no join, no per-row broadcast variable
    val candidates = shingled(train)
      .filter(GraftShim.mightContain(
        GraftShim.scalarSubquery(bloom), xxhash64(col("shingle"))))
    candidates.join(evalShingles, "shingle") // exact verify — FPs die here
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"),
        TextOps.round4(col("n_shared") / col("n_shingles"))
          .as("contamination"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      flagContaminated(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0))
        .orderBy(col("doc_id"))
    }),
    "text_decontaminate_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      flagContaminatedBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0))
        .orderBy(col("doc_id"))
    }))

  def oracleSql: Map[String, String] = Map(
    // bloom variant verifies candidates exactly (no false negatives),
    // so both operators share one oracle: byte-identical output
    "text_decontaminate_bloom" -> decontOracle,
    "text_decontaminate" -> decontOracle)

  private val decontOracle: String =
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
        ORDER BY h.doc_id"""
}
