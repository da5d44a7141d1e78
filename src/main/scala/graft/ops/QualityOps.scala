package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Corpus-quality operators beyond the reference's surface (engine
  * extension, SURVEY.md §2.8): Gopher-style rule filtering, exact
  * substring (token-window) deduplication, and a bigram-LM surprise
  * score. These are the document-level gates a 100 TB training-data
  * pipeline runs between ingestion and tokenization.
  *
  * Scale notes: `text_gopher_rules` and the window extraction are pure
  * map-side column expressions (no UDFs, codegen'd); the only shuffles
  * are the window-frequency / bigram-count aggregations, which partial-
  * aggregate map-side and key on short strings, never on documents.
  */
object QualityOps {

  import TextOps.{tokens, round4}

  private val stopwords = Seq("the", "a", "of", "to", "and")

  /** All 10-gram strings of a token array, position-aligned (entry p =
    * tokens p..p+9 joined; null when incomplete). Built by folding
    * zip_with against shifted slices — NEVER transform(sequence(...),
    * i -> slice(toks, ...)): lambda bodies re-evaluate the toks subtree
    * per element (see Dedup.shingles). Non-overlapping 10-token windows
    * — the unit of exact-substring dedup (Lee et al. 2021 use 50-token
    * windows over suffix arrays; the window hash-join below is the
    * distributed equivalent: dup windows collide on their value) — are
    * the stride-10 positions, selected after posexplode. */
  private val W = 10
  private def gramsOf(toks: org.apache.spark.sql.Column) =
    (1 until W).map(j => slice(toks, lit(j + 1), size(toks)))
      .foldLeft(toks)((acc, s) =>
        zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Gopher-family quality rules (Rae et al. 2021 §A1.1 adapted to
    // the synthetic corpus): word-count bounds, mean-word-length bounds,
    // short-token ratio, minimum stopword hits. Emits per-rule flags and
    // the composite gate so downstream mixes can slice by failure mode.
    // Pure per-row array math — no shuffle but the presentation sort.
    "text_gopher_rules" -> ((s, d) => {
      val toks = tokens(col("text"))
      val n = size(toks).cast("double")
      val meanLen = length(regexp_replace(trim(col("text")), "\\s+", "")) / n
      val shortRatio = size(filter(toks, t => length(t) <= lit(2))) / n
      val stopHits = size(filter(toks, t =>
        array_contains(array(stopwords.map(lit): _*), t)))
      Tables.documents(s, d)
        .select(col("doc_id"),
          (n >= 20 && n <= 90).cast("int").as("ok_word_count"),
          (meanLen >= 3 && meanLen <= 8).cast("int").as("ok_mean_word_len"),
          (shortRatio < 0.3).cast("int").as("ok_short_ratio"),
          (stopHits >= 2).cast("int").as("ok_stopwords"))
        .withColumn("pass",
          (col("ok_word_count") === 1 && col("ok_mean_word_len") === 1 &&
            col("ok_short_ratio") === 1 && col("ok_stopwords") === 1)
            .cast("int"))
        .orderBy(col("doc_id"))
    }),

    // ---- exact-substring dedup at token-window granularity: a window
    // is duplicated when the identical 10-token run appears anywhere
    // else in the corpus (another doc or the same doc again). Per-doc
    // output: window count, duplicated-window count, duplicated
    // fraction. The corpus pass keys on the window STRING (bounded
    // ~`W`×avg-token bytes; at 100 TB hash the window to a long and
    // key on that), partial-aggregates map-side, and joins back to the
    // exploded windows — never doc-to-doc pairs, so a boilerplate
    // window shared by k docs costs k rows, not k².
    "dedup_token_windows" -> ((s, d) => {
      val wins = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(gramsOf(tokens(col("text")))).as(Seq("pos", "win")))
        .where(col("pos") % W === 0 && col("win").isNotNull)
        .select(col("doc_id"), col("win"))
      val freq = wins.groupBy(col("win"))
        .agg(count(lit(1)).as("n_occ"))
      wins.join(freq, "win")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum((col("n_occ") > 1).cast("int")).cast("long").as("n_dup_windows"))
        .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
          round4(col("n_dup_windows") / col("n_windows")).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // ---- the rewrite companion to dedup_token_windows: emit the
    // CLEANED corpus, not just flags. Every duplicated 10-token window
    // keeps exactly its globally-first occurrence (min (doc_id, pos) —
    // deterministic, order-free); each doc is rebuilt from its kept
    // windows in position order. Same bounded window-string keying as
    // the flag op; the rebuild is one per-doc aggregation whose state
    // is bounded by the doc's own length, so the whole rewrite is two
    // shuffles at any corpus size. Docs reduced to nothing drop out.
    "dedup_window_rewrite" -> ((s, d) => {
      val wins = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(gramsOf(tokens(col("text")))).as(Seq("pos", "win")))
        .where(col("pos") % W === 0 && col("win").isNotNull)
      val firsts = wins.groupBy(col("win"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      wins.join(firsts, "win")
        .where(struct(col("doc_id"), col("pos")) === col("first"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          md5(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("pos"), col("win")))),
              x => x.getField("win")))).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- bigram-LM surprise (one step up from text_unigram_surprise):
    // mean -ln p(w2|w1) with p = c(w1 w2) / c(w1 ·) estimated from the
    // corpus itself. Two corpus passes over short keys: bigram counts,
    // then prefix totals as a second agg over the bigram table (no
    // second explode). Per-doc score re-joins the doc's bigram tf rows.
    "text_bigram_surprise" -> ((s, d) => {
      val toks = tokens(col("text"))
      // zip_with against the shifted array, NOT transform(sequence(...),
      // i -> element_at(toks, i)...): lambda bodies re-evaluate the toks
      // subtree per ELEMENT (no subexpression sharing), which turns the
      // linear pass into tokens x bigrams regex work — the same trap
      // documented on Dedup.shingles. zip_with's null past the shorter
      // end makes the final (incomplete) bigram null; filter drops it.
      val bigrams = filter(
        zip_with(toks, slice(toks, lit(2), size(toks)),
          (a, b) => concat(a, lit(" "), b)),
        x => x.isNotNull)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(bigrams).as("bg"))
        .groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("tf"))
      val bgCnt = tf.groupBy(col("bg"))
        .agg(sum(col("tf")).cast("long").as("c_bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
      val w1Cnt = bgCnt.groupBy(col("w1"))
        .agg(sum(col("c_bg")).cast("long").as("c_w1"))
      tf.join(bgCnt, "bg").join(w1Cnt, "w1")
        .groupBy(col("doc_id"))
        .agg(round4(sum(-log(col("c_bg") / col("c_w1")) * col("tf"))
          / sum(col("tf"))).as("bigram_surprise"))
        .orderBy(col("doc_id"))
    }))

  def oracleSql: Map[String, String] = Map(
    "text_gopher_rules" ->
      """SELECT doc_id,
           CAST(n >= 20 AND n <= 90 AS INT) AS ok_word_count,
           CAST(mean_len >= 3 AND mean_len <= 8 AS INT) AS ok_mean_word_len,
           CAST(short_n * 1.0 / n < 0.3 AS INT) AS ok_short_ratio,
           CAST(stop_n >= 2 AS INT) AS ok_stopwords,
           CAST(n >= 20 AND n <= 90
                AND mean_len >= 3 AND mean_len <= 8
                AND short_n * 1.0 / n < 0.3
                AND stop_n >= 2 AS INT) AS pass
         FROM (
           SELECT doc_id, len(toks) * 1.0 AS n,
             length(regexp_replace(trim(text), '\s+', '', 'g'))
               * 1.0 / len(toks) AS mean_len,
             len(list_filter(toks, t -> length(t) <= 2)) AS short_n,
             len(list_filter(toks,
               t -> list_contains(['the','a','of','to','and'], t))) AS stop_n
           FROM (SELECT doc_id, text,
                   string_split_regex(trim(text), '\s+') AS toks
                 FROM documents) t1) t2
         ORDER BY doc_id""",
    "dedup_token_windows" ->
      """WITH toks AS (SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS t FROM documents),
           wins AS (SELECT doc_id,
               array_to_string(t[(i-1)*10+1 : i*10], ' ') AS win
             FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) // 10)) AS i
                   FROM toks) ti),
           freq AS (SELECT win, count(*) AS n_occ FROM wins GROUP BY win)
         SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CAST(n_occ > 1 AS INT)) AS BIGINT) AS n_dup_windows,
           floor(sum(CAST(n_occ > 1 AS INT)) * 1.0 / count(*)
                 * 10000 + 0.5) / 10000 AS dup_frac
         FROM wins JOIN freq USING (win)
         GROUP BY doc_id ORDER BY doc_id""",
    // first occurrence = row_number 1 over (doc_id, pos) per window —
    // the same deterministic keep rule as the Spark min-struct
    "dedup_window_rewrite" ->
      """WITH toks AS (SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS t FROM documents),
           wins AS (SELECT doc_id, i AS pos,
               array_to_string(t[(i-1)*10+1 : i*10], ' ') AS win
             FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) // 10)) AS i
                   FROM toks) ti),
           kept AS (SELECT doc_id, pos, win,
               row_number() OVER (PARTITION BY win
                 ORDER BY doc_id, pos) AS rk
             FROM wins)
         SELECT doc_id, count(*) AS n_kept,
           md5(string_agg(win, ' ' ORDER BY pos)) AS clean_md5
         FROM kept WHERE rk = 1
         GROUP BY doc_id ORDER BY doc_id""",
    "text_bigram_surprise" ->
      """WITH toks AS (SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS t FROM documents),
           tf AS (SELECT doc_id, bg, count(*) AS tf FROM (
               SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
               FROM (SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 1)) AS i
                     FROM toks) ti) x
             GROUP BY doc_id, bg),
           bgc AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS c_bg,
                     string_split(bg, ' ')[1] AS w1
                   FROM tf GROUP BY bg),
           w1c AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_w1
                   FROM bgc GROUP BY w1)
         SELECT doc_id,
           floor(sum(-ln(c_bg * 1.0 / c_w1) * tf) / sum(tf)
                 * 10000 + 0.5) / 10000 AS bigram_surprise
         FROM tf JOIN bgc USING (bg) JOIN w1c USING (w1)
         GROUP BY doc_id ORDER BY doc_id""")
}
