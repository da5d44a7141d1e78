package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Byte-pair-encoding merge TRAINING in-engine (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016 — public literature): the train-the-tokenizer step
  * of an LLM data pipeline, not just tokenization with a given vocab.
  *
  * Scale shape — the reason this works at 100 TB: BPE training
  * operates on the WORD-FREQUENCY table, not the corpus. The corpus
  * contributes exactly one token-count aggregation (vocabulary-sized
  * output); every merge round then runs over the vocab frame — pair
  * counting is one partial-agg shuffle of |vocab| rows, the chosen
  * pair is a 1-row plan literal, and the merge rewrite is map-side.
  * Rounds are a fixed constant (the target number of merges), so the
  * iteration never touches instance-scale data — the same stratified
  * argument as the RDFS schema closure.
  *
  * Determinism (the oracle recomputes ALL rounds bit-for-bit): pair
  * counts are exact integers; the best pair breaks ties by (count
  * DESC, left ASC, right ASC); the merge applies GREEDY LEFT-TO-RIGHT
  * like canonical BPE, implemented as a string fold over the symbol
  * list — `acc ends-with-symbol left && next == right → append right
  * to the last symbol` — which Spark's `aggregate` higher-order
  * function and DuckDB's `list_reduce` evaluate identically (pure
  * string ops, no floats anywhere).
  */
object Bpe {

  val Rounds = 3

  /** Initial symbolization: one symbol per character. */
  private[graft] def charSyms(w: Column): Column =
    split(trim(regexp_replace(w, "(.)", " $1")), " ")

  /** Greedy left-to-right merge of the (l, r) pair inside one word's
    * symbol list, as a string fold (see determinism note above). */
  private[graft] def mergePair(syms: Column, l: String, r: String): Column = {
    val folded = aggregate(
      slice(syms, 2, 1000000),
      element_at(syms, 1),
      (acc, x) =>
        when(endswith(concat(lit(" "), acc), lit(" " + l)) && x === r,
          concat(acc, lit(r)))
          .otherwise(concat(acc, lit(" "), x)))
    split(folded, " ")
  }

  /** Adjacent symbol pairs of one word (struct l, r per position);
    * single-symbol words contribute none (sequence(1, 0) would DESCEND,
    * so the guard is correctness, not just neatness). */
  private[graft] def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"),
          element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // three unrolled merge rounds over the documents vocabulary; each
    // output row is one learned merge with its motivating pair count
    // and the corpus-wide symbol count AFTER applying it (weighted by
    // word frequency — the quantity BPE greedily minimizes).
    "text_bpe_train" -> ((s, d) => {
      import s.implicits._
      val words = Tables.fanOut(Tables.documents(s, d))
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      var vocab = words.select(col("w"), col("cnt"),
        charSyms(col("w")).as("syms"))
        .persist()
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, Long)]()
      for (round <- 1 to Rounds) {
        val best = vocab
          .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
          .groupBy(col("p.l"), col("p.r"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1).collect().head
        val (l, r, n) = (best.getString(0), best.getString(1), best.getLong(2))
        val next = vocab.withColumn("syms", mergePair(col("syms"), l, r))
          .persist()
        val nSyms = next.agg(sum(size(col("syms")) * col("cnt")))
          .head.getLong(0)
        vocab.unpersist(blocking = false)
        vocab = next
        out += ((round, l, r, n, nSyms))
      }
      vocab.unpersist(blocking = false)
      out.toSeq.toDF("round", "merge_left", "merge_right", "pair_count", "n_symbols_after")
        .orderBy(col("round"))
    }))

  /** The whole training unrolled in SQL: char symbolization, per-round
    * weighted pair counts, (count DESC, l, r) argmax, and the SAME
    * greedy string fold via list_reduce. */
  def oracleSql: Map[String, String] = Map(
    "text_bpe_train" -> {
      def round(i: Int, prev: String): String =
        s"""p$i AS (
              SELECT pr.l AS l, pr.r AS r, CAST(sum(cnt) AS BIGINT) AS n
              FROM (SELECT cnt, unnest([struct_pack(
                      l := syms[j], r := syms[j+1])
                      for j in range(1, len(syms))]) AS pr
                    FROM $prev) t
              GROUP BY pr.l, pr.r),
            b$i AS (SELECT l, r, n FROM p$i
                    ORDER BY n DESC, l, r LIMIT 1),
            v$i AS (
              SELECT w, cnt,
                string_split(CASE WHEN len(syms) = 1 THEN syms[1]
                  ELSE list_reduce(syms, (acc, x) ->
                    CASE WHEN ends_with(' ' || acc, ' ' || b$i.l)
                           AND x = b$i.r
                         THEN acc || b$i.r
                         ELSE acc || ' ' || x END) END, ' ') AS syms
              FROM $prev CROSS JOIN b$i),
            s$i AS (SELECT CAST(sum(cnt * len(syms)) AS BIGINT) AS ns
                    FROM v$i)"""
      s"""WITH words AS (
            SELECT w, count(*) AS cnt FROM (
              SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents) t
            WHERE len(w) > 0 GROUP BY w),
          v0 AS (
            SELECT w, cnt,
              string_split(trim(regexp_replace(w, '(.)', ' \\1', 'g')), ' ')
                AS syms
            FROM words),
          ${round(1, "v0")},
          ${round(2, "v1")},
          ${round(3, "v2")}
          SELECT 1 AS round, b1.l AS merge_left, b1.r AS merge_right,
                 b1.n AS pair_count, s1.ns AS n_symbols_after
            FROM b1, s1
          UNION ALL
          SELECT 2, b2.l, b2.r, b2.n, s2.ns FROM b2, s2
          UNION ALL
          SELECT 3, b3.l, b3.r, b3.n, s3.ns FROM b3, s3
          ORDER BY round"""
    })
}
