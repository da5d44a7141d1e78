package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Count-min sketch heavy hitters (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005 — public literature): the
  * fixed-memory token-frequency summary a streaming/sharded pipeline
  * keeps instead of an unbounded exact count table.
  *
  * Scale shape: the sketch is d×w counters (4×1024 here) built by ONE
  * aggregation whose map-side partial combine already produces
  * per-partition sketches — the reduce merges them by (row, bucket)
  * addition, which is exactly the sketch's mergeability property, so
  * the same code serves batch shards and stream micro-batches. Point
  * queries touch d rows of a 4096-row table.
  *
  * Determinism across engines: Spark's xxhash64 has no DuckDB twin, so
  * the hash is a polynomial rolling hash over character codes mod the
  * Mersenne prime 2^31-1 (pure integer ops — a left fold both engines
  * express identically), composed with d fixed affine maps into w
  * buckets. The oracle rebuilds the WHOLE sketch and every estimate
  * bit-for-bit; `overestimate >= 0` doubles as the CMS never-
  * underestimates invariant.
  */
object Sketches {

  private[graft] val D = 4
  private[graft] val W = 1024
  private val P = 2147483647L // 2^31 - 1
  private val A = Seq(1L, 31L, 1021L, 65537L)
  private val B = Seq(0L, 7L, 101L, 9973L)

  /** Polynomial rolling hash of a token over character codes:
    * fold(acc -> (acc * base + code) mod P). acc < 2^31, so the
    * intermediate stays below 2^41 — no overflow anywhere. The base
    * parameter yields independent hash functions (SimHash packs two
    * into one 62-bit fingerprint hash). */
  private[graft] def polyHash(tok: Column, base: Long = 257L): Column =
    aggregate(
      split(trim(regexp_replace(tok, "(.)", " $1")), " "),
      lit(0L),
      (acc, c) => (acc * base + ascii(c)) % P)

  /** Bucket of hash `h` in sketch row `j` (affine map mod P mod W). */
  private[graft] def bucket(h: Column, j: Int): Column =
    ((h * A(j) + B(j)) % P) % W

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact top-10 tokens with their CMS point estimates: build the
    // sketch, query it, report estimate and overestimate per token.
    "sketch_cms_heavyhitters" -> ((s, d) => {
      val toks = Tables.fanOut(Tables.documents(s, d))
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .withColumn("h", polyHash(col("tok")))
      val sketch = toks
        .select(explode(array((0 until D).map(j =>
          struct(lit(j).as("j"), bucket(col("h"), j).as("b"))): _*)).as("c"))
        .groupBy(col("c.j"), col("c.b"))
        .agg(count(lit(1)).as("n"))
      val top = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("exact_n"), first(col("h")).as("h"))
        .orderBy(col("exact_n").desc, col("tok"))
        .limit(10)
      val probes = top.select(col("tok"), col("exact_n"),
        explode(array((0 until D).map(j =>
          struct(lit(j).as("j"), bucket(col("h"), j).as("b"))): _*)).as("c"))
        .select(col("tok"), col("exact_n"), col("c.j"), col("c.b"))
      probes.join(broadcast(sketch), Seq("j", "b"))
        .groupBy(col("tok"), col("exact_n"))
        .agg(min(col("n")).as("cms_est"))
        .select(col("tok"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overestimate"))
        .orderBy(col("exact_n").desc, col("tok"))
    }))

  def oracleSql: Map[String, String] = Map(
    "sketch_cms_heavyhitters" -> {
      val bucketCases = (0 until D).map(j =>
        s"((h * ${A(j)} + ${B(j)}) % $P) % $W").toSeq
      s"""WITH toks AS (
            SELECT tok,
              list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  [CAST(ord(c) AS BIGINT) for c in
                   string_split(trim(regexp_replace(tok, '(.)', ' \\1', 'g')), ' ')]),
                (acc, x) -> (acc * 257 + x) % $P) AS h
            FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
                  FROM documents) t
            WHERE len(tok) > 0),
          cells AS (
            SELECT j, CASE j ${(0 until D).map(j =>
              s"WHEN $j THEN ${bucketCases(j)}").mkString(" ")} END AS b
            FROM toks CROSS JOIN (SELECT unnest(range(0, $D)) AS j) js),
          sketch AS (
            SELECT j, b, count(*) AS n FROM cells GROUP BY j, b),
          top AS (
            SELECT tok, count(*) AS exact_n, min(h) AS h
            FROM toks GROUP BY tok
            ORDER BY exact_n DESC, tok LIMIT 10),
          probes AS (
            SELECT tok, exact_n, j, CASE j ${(0 until D).map(j =>
              s"WHEN $j THEN ${bucketCases(j)}").mkString(" ")} END AS b
            FROM top CROSS JOIN (SELECT unnest(range(0, $D)) AS j) js),
          est AS (
            SELECT p.tok, p.exact_n, min(s.n) AS cms_est
            FROM probes p JOIN sketch s ON s.j = p.j AND s.b = p.b
            GROUP BY p.tok, p.exact_n)
          SELECT tok, exact_n, cms_est, cms_est - exact_n AS overestimate
          FROM est ORDER BY exact_n DESC, tok"""
    })
}
