package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Core relational surface: aggregation, joins (broadcast/shuffle,
  * semi/anti), windows, rollup, set ops, top-k — the extension
  * operators SURVEY.md §2.5 lists as "free via Catalyst", exercised
  * against the DuckDB oracle (SURVEY.md §5.2 item 4).
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *  - every double in an output is `round(x, N)` in BOTH engines;
  *  - money aggregates (sums AND averages of ≤2-decimal values) ride
  *    exact integer cents — see [[cents]] — because rounded FLOAT
  *    aggregates are association-order sensitive and diverge across
  *    engines at scale (round 12's sf1 finding);
  *  - every query ends with a total order on a unique key set;
  *  - aggregate column names are aliased identically in both.
  *
  * Scale notes (100 TB design point):
  *  - `region`/`nation`/`supplier`/`part` are broadcast — they stay
  *    dimension-sized at any SF, so the big fact tables never shuffle
  *    for those joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once
  *    and AQE handles skew; aggregations are partial (map-side) by
  *    construction since all are hash aggregates over codegen'd exprs.
  */
object Relational {

  /** Money arithmetic rides EXACT INTEGER CENTS, not float: a sum of
    * millions of binary-inexact cent values is association-order
    * sensitive, and Spark's partial-aggregate order differs from a
    * sequential oracle's — at 10× bench data q05's revenue crossed a
    * half-cent boundary and hash-diverged (sf1 sweep, round 12). The
    * inputs carry ≤2 decimals, so both engines recover the TRUE cents
    * from the same binary double; long sums are exact, associative,
    * AND as cheap as doubles (the DECIMAL(18,4) variant of this class
    * measured 2-3× on the 6M-row aggregates — sum(decimal) widens past
    * the compact-long fast path). Outputs return to double as
    * integer/100.0, so nothing non-double reaches the hash surface. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** revenue term in 1e-4 dollars: cents × (100 − discount-cents);
    * long×long stays < 2^61 until ~10^14 dollars per group. */
  private def disc(c: Column): Column =
    cents(c) * (lit(100L) - cents(col("l_discount")))
  /** 1e-4-dollar sum → dollars at cent precision (half-up). Integer
    * until the two exact divisions — deterministic in both engines. */
  private def q4ToDollars(c: Column): Column =
    floor((c + lit(50L)) / lit(100.0)) / lit(100.0)
  /** cent sum → dollars, exact. */
  private def cToDollars(c: Column): Column = c / lit(100.0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q01: TPC-H Q1-style pricing summary (hash agg, map-side partial)
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          cToDollars(sum(cents(col("l_extendedprice"))))
            .as("sum_base_price"),
          q4ToDollars(sum(disc(col("l_extendedprice"))))
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          // averages of INEXACT money doubles ride the exact cent sums
          // too: sum-order divergence shrinks /n but the boundary class
          // is the same — exact-integer numerators kill it entirely
          round(sum(cents(col("l_extendedprice"))) / count(lit(1)) / 100.0, 4)
            .as("avg_price"),
          round(sum(cents(col("l_discount"))) / count(lit(1)) / 100.0, 4)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- q02: global top-k with deterministic tie-break
    "q02_top_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- q03: fact-fact shuffle join + agg + top-k
    "q03_revenue_by_customer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(q4ToDollars(sum(disc(col("l_extendedprice")))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- q04: EXISTS → left-semi join
    "q04_priority_with_big_lines" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45).select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- q05: TPC-H Q5-style multiway join, broadcast dims
    "q05_region_nation_volume" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(q4ToDollars(sum(disc(col("l_extendedprice")))).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // ---- q06: scan-only filter + single aggregate (pushdown check)
    "q06_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(q4ToDollars(sum(cents(col("l_extendedprice"))
          * cents(col("l_discount")))).as("revenue"))
    }),

    // ---- q07: NOT EXISTS → left-anti join
    "q07_customers_without_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000).select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- q08: top-N per group via row_number window
    "q08_top3_customers_per_segment" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // ---- q09: running aggregate window per key
    "q09_running_customer_spend" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 20)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- q10: time-bucketed aggregate (month)
    "q10_monthly_revenue" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(cToDollars(sum(cents(col("o_totalprice")))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("month"))
    }),

    // ---- q11: ROLLUP grouping sets
    "q11_rollup_qty" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // ---- q12: conditional aggregation (CASE inside agg)
    "q12_priority_split" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // ---- q13: UNION + DISTINCT set op
    "q13_active_nations" -> ((s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      cn.union(sn).distinct()
        .orderBy(col("nationkey"))
    }),

    // ---- q14: promo share (two-branch conditional ratio)
    "q14_promo_share" -> ((s, d) => {
      val p = Tables.part(s, d)
      val l = Tables.lineitem(s, d)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        // no `otherwise`: a double 0.0 would coerce the long branch
        // back to float; sum skips the nulls and stays exact
        .agg(round(
          sum(when(col("p_type").startsWith("PROMO"),
            disc(col("l_extendedprice")))).cast("double") * 100.0 /
          sum(disc(col("l_extendedprice"))).cast("double"), 4)
          .as("promo_share"))
    }),

    // ---- q15: per-supplier revenue + max selection (agg + self-compare)
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(q4ToDollars(sum(disc(col("l_extendedprice"))))
          .as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(top), col("total_revenue") === col("mx"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- q16: event-time bucketing (hour) + multi-agg
    "q16_events_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    // ---- q17: semi-structured JSON extraction from events.props
    "q17_events_props_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 4).as("avg_k"),
          max(col("k")).as("max_k"), min(col("k")).as("min_k"))
        .orderBy(col("event_type"))
    }),

    // ---- q18: distinct-count per group
    "q18_event_reach" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
           AS sum_base_price,
         floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) / 100.0) / 100.0 AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
           AS DOUBLE) / count(*) / 100.0, 4) AS avg_price,
         round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
           AS DOUBLE) / count(*) / 100.0, 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""",
    "q03_revenue_by_customer" ->
      """SELECT c_custkey, c_name,
         floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) / 100.0) / 100.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q04_priority_with_big_lines" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_region_nation_volume" ->
      """SELECT n_name,
         floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) / 100.0) / 100.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
         GROUP BY n_name ORDER BY n_name""",
    "q06_forecast_revenue" ->
      """SELECT floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) + 50) / 100.0)
           / 100.0 AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q07_customers_without_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 400000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_top3_customers_per_segment" ->
      """SELECT c_mktsegment, rn, c_custkey, acctbal FROM (
           SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) t
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "q09_running_customer_spend" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_spend
         FROM orders WHERE o_custkey < 20
         ORDER BY o_custkey, o_orderkey""",
    "q10_monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
           AS revenue, count(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY month""",
    "q11_rollup_qty" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q12_priority_split" ->
      """SELECT l_linestatus,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q13_active_nations" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL SELECT s_nationkey FROM supplier) t
         ORDER BY nationkey""",
    "q14_promo_share" ->
      """SELECT round(
           CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
             THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) END) AS DOUBLE) * 100.0
           / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE), 4) AS promo_share
         FROM lineitem JOIN part ON l_partkey = p_partkey""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
             floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) / 100.0) / 100.0
               AS total_revenue
           FROM lineitem GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey""",
    "q16_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q17_events_props_json" ->
      """SELECT event_type,
         round(avg(k), 4) AS avg_k, max(k) AS max_k, min(k) AS min_k
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events) t
         GROUP BY event_type ORDER BY event_type""",
    "q18_event_reach" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
         count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""")
}
