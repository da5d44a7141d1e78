package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Third relational batch: the navigation/distribution window functions
  * (lag, lead, ntile, percent_rank, partition-first) the first two
  * batches didn't cover, and ordered-sequence (funnel) analysis over the
  * event stream.
  */
object Relational3 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q29: one pass over orders computing every navigation window
    // next to each other — all five share ONE window definition, so
    // Catalyst evaluates them in a single Window operator after a single
    // shuffle on o_custkey (visible in the plan: one Exchange, one
    // Window). percent_rank is a small-rational ratio -> round4 floor
    // (cross-engine tie rule).
    "q29_window_suite" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("gap_days", datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", TextOps.round4(percent_rank().over(w)))
        .withColumn("first_key", first(col("o_orderkey")).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("prev_price"),
          col("next_price"), col("gap_days"), col("quartile"),
          col("pct_rank"), col("first_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- q36: RANGE window frame — a TRUE time-based rolling
    // aggregate (trailing-hour sum + row count per user), the frame
    // kind q29's ROW-offset suite can't express: the frame holds every
    // row within the time bound, however many that is. INTEGER
    // MICROSECOND ordering keeps the frame arithmetic identical across
    // engines: every ts here carries sub-second micros, and epoch-
    // as-double / epoch-as-truncated-seconds semantics vary across
    // oracle versions, so only exact integer bounds are portable. The
    // summed value is DECIMAL so the rolling addition is exact, and
    // the result is cast back to DECIMAL(18,2) on BOTH sides so no
    // engine-specific sum-widening (28,2 vs 38,2) enters the hash.
    // One hashpartitioning(user_id) exchange, one Window. The rolling
    // sum is computed in exact DECIMAL, then leaves the operator as
    // INTEGER CENTS (BIGINT): the DECIMAL(18,2) sum is exact, so
    // cents are exact integers, and the hash surface compares BIGINTs
    // only — decimal stringification/dtype differences across oracle
    // environments (Decimal('5.50') vs float64 5.5) can no longer
    // produce a value-hash mismatch on value-identical rows.
    "q36_rolling_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tus"),
          col("value").cast("decimal(18,2)").as("v"))
        .withColumn("cents_1h",
          (sum(col("v")).over(w) * 100).cast("long"))
        .withColumn("n_1h", count(lit(1)).over(w).cast("long"))
        .select(col("event_id"), col("user_id"), col("cents_1h"),
          col("n_1h"))
        .orderBy(col("event_id"))
    }),

    // ---- q36 diagnostic twin: per-user min/max/sum of the INTEGER
    // microsecond timestamps q36's frame orders by, plus integer-cent
    // value sums. If q36 ever diverges under an oracle environment,
    // this row pinpoints WHICH joint moved (timestamp read vs value
    // read vs frame arithmetic) from the driver artifact alone —
    // every column is BIGINT, so no canonicalization can enter.
    "q36_ts_diag" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          (col("value").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        .groupBy(col("user_id"))
        // the sum is of micros-WITHIN-DAY: it still witnesses any
        // sub-second truncation divergence while staying far from
        // Long overflow (8.64e10 x rows), and the oracle side casts
        // back to BIGINT because DuckDB widens integer sums to HUGEINT
        .agg(min(col("tus")).as("min_tus"), max(col("tus")).as("max_tus"),
          sum(pmod(col("tus"), lit(86400000000L))).as("sum_day_tus"),
          sum(col("cents")).as("sum_cents"),
          count(lit(1)).as("n"))
        // ENFORCED headroom bound (ADVICE r12): past ~1e8 rows/user the
        // two engines would fail DIFFERENTLY (Spark wraps the BIGINT
        // sum silently, DuckDB's HUGEINT->BIGINT cast errors) — both
        // sides now raise at the same documented bound instead, so the
        // divergence mode cannot exist. 1e7 leaves 864x headroom below
        // the wrap point.
        .withColumn("sum_day_tus",
          when(col("n") < 10000000L, col("sum_day_tus"))
            .otherwise(raise_error(lit(
              "q36_ts_diag: per-user row count exceeds the documented " +
                "1e7 bound; the day-micros BIGINT sum is no longer " +
                "wrap-safe — shard users upstream"))))
        .orderBy(col("user_id"))
    }),

    // ---- q30: ordered-event funnel (view -> click -> purchase): each
    // stage keeps users whose first stage-N event strictly follows their
    // first stage-(N-1) event. Three filtered min-aggregations chained
    // by equi-joins on user_id — every stage shuffles only (user_id,
    // ts) pairs, never raw events, and the event scan is pushed-filter
    // pruned to one event_type per pass. Timestamp gaps average exact
    // integer micros before the single double division (deterministic
    // across engines).
    // ---- q34: salted join on a pathologically skewed key — 70% of
    // the fact side lands on ONE key, the case AQE's skew splitting
    // cannot fix when the hot key is hot on BOTH sides of a shuffle
    // join. Skew.saltedJoin fans the fact side over 16 deterministic
    // salt buckets and replicates the (small) dim side per bucket, so
    // no single task owns the hot key; the oracle is the plain join —
    // salting must be semantically invisible.
    "q34_skew_salted_join" -> ((s, d) => {
      val fact = graft.util.Tables.events(s, d)
        .select(when(pmod(col("user_id"), lit(10)) < 7, lit(0L))
          .otherwise(col("user_id")).as("k"), col("event_type"))
      val dim = fact.select(col("k")).distinct()
        .withColumn("label",
          when(col("k") === 0, lit("hot")).otherwise(lit("cold")))
      graft.util.Skew.saltedJoin(fact, dim.withColumnRenamed("k", "dk"),
          "k", "dk", saltBuckets = 16)
        .groupBy(col("label"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_keys"))
        .orderBy(col("label"), col("event_type"))
    }),

    // ---- q35: SHUFFLE-FREE bucketed fact-fact join, driver-visible
    // (the layout strategy BucketingSpec proves plan-level, now with an
    // oracle on the result): both fact tables are pre-bucketed + sorted
    // on the join key into 8 buckets, so the SortMergeJoin consumes the
    // bucket layout directly — ZERO Exchange on either join side (the
    // one shuffle left is the final small groupBy). At 100 TB this is
    // the amortize-once trade: the bucket write pays the shuffle one
    // time, every subsequent orders⋈lineitem query rides it for free.
    "q35_bucketed_join" -> ((s, d) => {
      // stale managed-table dirs survive across JVMs while the
      // in-memory catalog does not — clean both (BucketingSpec's lesson)
      Seq("q35_orders_b", "q35_lineitem_b").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(s"spark-warehouse/$t"))
      }
      graft.util.Bucketing.writeBucketed(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        "q35_orders_b", "o_orderkey", 8)
      graft.util.Bucketing.writeBucketed(
        Tables.lineitem(s, d).select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev")),
        "q35_lineitem_b", "l_orderkey", 8)
      // at verification SF the orders side fits a broadcast, which
      // would bypass (and hide) the bucket layout; at the design-point
      // SF both sides are fact-sized and broadcast is impossible — the
      // MERGE hint pins the SortMergeJoin path query-scoped (no session
      // conf mutation), so the plan exercised IS the 100 TB plan
      s.table("q35_orders_b").hint("merge")
        .join(s.table("q35_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          (floor((sum(col("rev")) + lit(50L)) / lit(100.0)) / lit(100.0))
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    "q30_events_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("c_ts"), min(col("v_ts")).as("v_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("p_ts"), min(col("c_ts")).as("c_ts"))
      def gapSecs(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        TextOps.round4(avg(unix_micros(a) - unix_micros(b)) / 1e6)
      v.agg(count(lit(1)).as("n_users"),
          lit(null).cast("double").as("avg_gap_secs"))
        .select(lit("1_view").as("stage"), col("n_users"), col("avg_gap_secs"))
        .unionAll(c.agg(count(lit(1)).as("n_users"),
            gapSecs(col("c_ts"), col("v_ts")).as("avg_gap_secs"))
          .select(lit("2_click").as("stage"), col("n_users"), col("avg_gap_secs")))
        .unionAll(p.agg(count(lit(1)).as("n_users"),
            gapSecs(col("p_ts"), col("c_ts")).as("avg_gap_secs"))
          .select(lit("3_purchase").as("stage"), col("n_users"), col("avg_gap_secs")))
        .orderBy(col("stage"))
    }),

    // ---- q33: weekly cohort retention — users grouped by first-seen
    // week, activity counted per offset week. Two aggregations (first
    // week per user, distinct active weeks per user) joined on user_id
    // — the dimensionless cohort matrix never materializes raw events
    // past the first aggregation, so the shape holds at any event
    // volume.
    "q33_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      val firstWeek = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      ev.distinct()
        .join(firstWeek, "user_id")
        .withColumn("week_n",
          (datediff(to_date(col("week")), to_date(col("cohort_week"))) / 7)
            .cast("int"))
        .groupBy(col("cohort_week"), col("week_n"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_n"))
    }),

    // ---- q31: explicit GROUPING SETS (disjoint one-dimension rollups
    // in ONE pass — CUBE/ROLLUP are q19/q11; this is the general form)
    // through the SQL text front end. grouping_id() disambiguates which
    // set produced a row, so NULL-as-data never collides with NULL-as-
    // subtotal.
    "q31_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g31_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM g31_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag, l_linestatus""")
    }),

    // ---- q32: correlated EXISTS in SQL text, both as a filter and as a
    // projected value — Catalyst decorrelates them into one left-semi
    // and one existence hash join on s_suppkey (no per-row subquery
    // execution at any scale).
    "q32_exists_suppliers" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("g32_supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("g32_lineitem")
      s.sql("""
        SELECT s.s_suppkey, s.s_name,
               EXISTS (SELECT 1 FROM g32_lineitem l
                       WHERE l.l_suppkey = s.s_suppkey
                         AND l.l_quantity >= 49) AS has_bulk
        FROM g32_supplier s
        WHERE EXISTS (SELECT 1 FROM g32_lineitem l
                      WHERE l.l_suppkey = s.s_suppkey)
        ORDER BY s.s_suppkey""")
    }))

  def oracleSql: Map[String, String] = Map(
    // same integer-microsecond ordering + inclusive RANGE bounds +
    // exact decimal rolling sum, emitted as INTEGER CENTS so the hash
    // surface is BIGINT-only (epoch_us is BIGINT in every DuckDB
    // version; epoch() flips between truncating BIGINT and fractional
    // DOUBLE across versions and every ts here has sub-second micros,
    // which shifted frame boundaries on some drivers; DECIMAL output
    // canonicalization also varies across oracle stacks — cents don't)
    "q36_rolling_range" ->
      """SELECT event_id, user_id, cents_1h, n_1h FROM (
           SELECT event_id, user_id,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w * 100
               AS BIGINT) AS cents_1h,
             CAST(count(*) OVER w AS BIGINT) AS n_1h
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) t
         ORDER BY event_id""",
    // same enforced 1e7 rows/user bound as the driver (both engines
    // raise rather than diverge silently past the wrap point)
    "q36_ts_diag" ->
      """SELECT user_id,
           min(epoch_us(ts)) AS min_tus, max(epoch_us(ts)) AS max_tus,
           CASE WHEN count(*) < 10000000
             THEN CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT)
             ELSE error('q36_ts_diag: per-user row count exceeds the '
               || 'documented 1e7 bound') END AS sum_day_tus,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS sum_cents,
           count(*) AS n
         FROM events GROUP BY user_id ORDER BY user_id""",
    // the bucket layout is oracle-invisible: same join, same numbers
    "q35_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
           floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50)
             / 100.0) / 100.0 AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q34_skew_salted_join" ->
      """WITH fact AS (
           SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS k,
                  event_type
           FROM events),
         dim AS (
           SELECT DISTINCT k,
             CASE WHEN k = 0 THEN 'hot' ELSE 'cold' END AS label
           FROM fact)
         SELECT d.label, f.event_type, count(*) AS n,
                count(DISTINCT f.k) AS n_keys
         FROM fact f JOIN dim d USING (k)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q33_retention_cohorts" ->
      """WITH ev AS (SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
          fw AS (SELECT user_id, min(week) AS cohort_week
                 FROM ev GROUP BY user_id)
        SELECT cohort_week,
          CAST(date_diff('day', CAST(cohort_week AS DATE),
                 CAST(week AS DATE)) / 7 AS INT) AS week_n,
          count(DISTINCT ev.user_id) AS n_users
        FROM ev JOIN fw ON ev.user_id = fw.user_id
        GROUP BY cohort_week, week_n
        ORDER BY cohort_week, week_n""",
    "q31_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
             AS gid,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY gid, l_returnflag, l_linestatus""",
    "q32_exists_suppliers" ->
      """SELECT s.s_suppkey, s.s_name,
           EXISTS (SELECT 1 FROM lineitem l
                   WHERE l.l_suppkey = s.s_suppkey
                     AND l.l_quantity >= 49) AS has_bulk
         FROM supplier s
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_suppkey = s.s_suppkey)
         ORDER BY s.s_suppkey""",
    "q29_window_suite" ->
      """SELECT o_orderkey, o_custkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(date_diff('day',
             CAST(lag(o_orderdate) OVER w AS DATE),
             CAST(o_orderdate AS DATE)) AS INT) AS gap_days,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pct_rank,
           first_value(o_orderkey) OVER w AS first_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q30_events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, min(e.ts) AS c_ts, min(v.v_ts) AS v_ts
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.v_ts
                GROUP BY e.user_id),
          p AS (SELECT e.user_id, min(e.ts) AS p_ts, min(c.c_ts) AS c_ts
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
                GROUP BY e.user_id)
        SELECT '1_view' AS stage, count(*) AS n_users,
          CAST(NULL AS DOUBLE) AS avg_gap_secs FROM v
        UNION ALL
        SELECT '2_click', count(*),
          floor(avg(epoch_us(c_ts) - epoch_us(v_ts)) / 1e6 * 10000 + 0.5)
            / 10000 FROM c
        UNION ALL
        SELECT '3_purchase', count(*),
          floor(avg(epoch_us(p_ts) - epoch_us(c_ts)) / 1e6 * 10000 + 0.5)
            / 10000 FROM p
        ORDER BY stage""")
}
