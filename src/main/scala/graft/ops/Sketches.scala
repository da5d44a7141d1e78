package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
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
    * into one 62-bit fingerprint hash). Served by the native codegen'd
    * [[PolyHashExpr]] (one tight loop per token); [[polyHashHof]]
    * keeps the original higher-order-function formulation that
    * `HashExprParitySpec` pins it against. PRECONDITION (shared with
    * [[polyHashSql]]): input contains no whitespace — the SQL replay
    * round-trips characters through a space-delimited split. */
  private[graft] def polyHash(tok: Column, base: Long = 257L): Column =
    HashExprs.poly_hash(tok, base)

  /** The pre-r13 HOF formulation of [[polyHash]] — retained ONLY as
    * the parity witness for the native expression (it is the exact
    * chain every committed DuckDB oracle mirrors). */
  private[graft] def polyHashHof(tok: Column, base: Long = 257L): Column =
    aggregate(
      split(trim(regexp_replace(tok, "(.)", " $1")), " "),
      lit(0L),
      (acc, c) => (acc * base + ascii(c)) % P)

  /** Bucket of hash `h` in sketch row `j` (affine map mod P mod W). */
  private[graft] def bucket(h: Column, j: Int): Column =
    ((h * A(j) + B(j)) % P) % W

  /** The DuckDB replay of [[polyHash]] over SQL expression `e` — the
    * CMS oracle's fold, shared so every seeded sketch's oracle hashes
    * identically. PRECONDITION: `e` must contain no whitespace (and
    * should stay in the BMP — DuckDB `ord` and the native fold agree
    * on code points, but the replay round-trips characters through a
    * space-delimited split, so a space inside the value silently
    * truncates the fold). Current call sites hash whitespace-free
    * tokens and digit strings only; new oracles reusing this fold
    * must keep that invariant. */
  private[graft] def polyHashSql(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  [CAST(ord(c) AS BIGINT) for c in
       |   string_split(trim(regexp_replace($e, '(.)', ' \\1', 'g')), ' ')]),
       |  (acc, x) -> (acc * 257 + x) % $P)""".stripMargin

  // ---- K-Minimum-Values distinct-count sketch (Bar-Yossef et al.,
  // RANDOM 2002; Beyer et al., "On synopses for distinct-value
  // estimation under multiset operations", SIGMOD 2007 — public
  // literature). Keep the k smallest DISTINCT hash values; with h
  // ~uniform on [0, P), the k-th smallest order statistic estimates
  // NDV as (k-1)*P/h_k, and fewer than k distinct hashes IS the exact
  // count. The buffer is a sorted array of ≤ k longs: bounded memory
  // per group, mergeable (sorted-merge-take-k — exactly the partial-
  // aggregate shape), one pass, and O(1) per row once saturated (a new
  // hash ≥ the current k-th is rejected before any copy). Unlike
  // approx_count_distinct's HLL++ the whole sketch is integer
  // arithmetic over the repo's polynomial rolling hash, so a SQL
  // oracle replays estimate AND internals bit-for-bit (the CMS
  // precedent).

  private[graft] val KmvK = 512

  /** [[polyHash]] of a short string stays far below P (it only wraps
    * once the string passes ~4 chars), which is fine for CMS bucketing
    * (the affine maps re-spread it) but breaks KMV's requirement that
    * the hash be ~uniform on [0, P) — the min-k order statistic would
    * wildly overestimate. Post-mix with two Lehmer / MINSTD
    * multiplicative steps mod the same Mersenne prime (Park & Miller,
    * CACM 1988 — public): each is a full-period permutation of
    * [1, P-1], so distinctness is preserved and any input set spreads
    * across the range. Intermediates stay < 2^48 — no overflow. */
  private[graft] def kmvMix(h: Column): Column =
    ((h * 48271L) % P * 69621L) % P

  private[graft] def kmvMixSql(e: String): String =
    s"(($e) * 48271 % $P * 69621) % $P"

  case class KmvBuf(hs: Array[Long])
  case class KmvOut(m: Long, hk: Long)

  class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, KmvOut] {
    override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val a = b.hs; val n = a.length
      if (n == k && h >= a(n - 1)) b // saturated, not smaller: O(1)
      else {
        val i = java.util.Arrays.binarySearch(a, h)
        if (i >= 0) b // distinctness: already a member
        else {
          val ins = -i - 1
          val keep = math.min(n + 1, k)
          val out = new Array[Long](keep)
          System.arraycopy(a, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(a, ins, out, ins + 1, keep - ins - 1)
          KmvBuf(out)
        }
      }
    }
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      val a = x.hs; val b = y.hs
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      // ascending sorted-merge with dedup: the first `k` distinct
      // values seen ARE the k smallest of the union
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) { val t = a(i); i += 1; t }
                else { val t = b(j); j += 1; t }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }
    override def finish(r: KmvBuf): KmvOut =
      KmvOut(r.hs.length, if (r.hs.length == k) r.hs.last else 0L)
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
  }

  /** Per-group KMV approximate distinct count of `value` (plus the
    * exact group row count): ONE aggregation with map-side partial
    * sketches — no NDV-sized distinct shuffle, no window. Output
    * `(groupCol, approx_parts, n)`. */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column,
      k: Int = KmvK): DataFrame = {
    val kmv = udaf(new KmvSketch(k), Encoders.scalaLong)
    df.select(col(groupCol), kmvMix(polyHash(value)).as("h"))
      .groupBy(col(groupCol))
      .agg(kmv(col("h")).as("kv"), count(lit(1)).as("n"))
      .select(col(groupCol),
        expr(s"CAST(CASE WHEN kv.m < $k THEN kv.m " +
          s"ELSE ${(k - 1).toLong * P} div kv.hk END AS BIGINT)")
          .as("approx_parts"),
        col("n"))
  }

  /** The DuckDB replay of [[kmvDistinct]] (rebuilds the min-k set with
    * a window over distinct hashes — same order statistic, same
    * integer estimate). */
  def kmvDistinctSql(table: String, groupCol: String, valueExpr: String,
      k: Int = KmvK): String =
    s"""WITH base AS (
       |  SELECT $groupCol AS g, ${kmvMixSql(polyHashSql(valueExpr))} AS h
       |  FROM $table),
       |totals AS (SELECT g, count(*) AS n FROM base GROUP BY g),
       |dh AS (SELECT DISTINCT g, h FROM base),
       |ranked AS (SELECT g, h,
       |    row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM dh),
       |kth AS (SELECT g, count(*) AS m,
       |    max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM ranked WHERE rn <= $k GROUP BY g)
       |SELECT kth.g AS $groupCol,
       |  CAST(CASE WHEN kth.m < $k THEN kth.m
       |       ELSE ${(k - 1).toLong * P} // kth.hk END AS BIGINT)
       |    AS approx_parts,
       |  totals.n AS n
       |FROM kth JOIN totals USING (g)""".stripMargin

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
