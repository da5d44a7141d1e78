package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Bucketing, Tables}

/** Bucketed co-located join: both sides pre-bucketed on the join key →
  * the join plan must contain NO shuffle exchange. This is the layout
  * strategy for repeated fact-fact joins at the 100 TB design point.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val sf = TestSpark.sf
    // stale managed-table locations survive across JVMs while the
    // in-memory catalog does not — clean both
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Bucketing.writeBucketed(
      Tables.orders(spark, sf), "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf), "lineitem_b", "l_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val shuffles = p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && l.contains("orderkey"))
      assert(shuffles == 0, s"join-key shuffle present:\n${p.take(1200)}")
      // result parity with the unbucketed join
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
