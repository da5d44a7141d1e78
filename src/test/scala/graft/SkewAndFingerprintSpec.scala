package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps
import graft.util.{Skew, Tables}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join matches the plain join result") {
    val sf = TestSpark.sf
    val l = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority"))
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(l, o, "l_orderkey", "o_orderkey", saltBuckets = 8)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}

class RollingFingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rolling fingerprint: deterministic, equal for equal docs, near-dup overlap") {
    val a = TextOps.winnowFingerprint("the quick brown fox jumps over the lazy dog")
    val b = TextOps.winnowFingerprint("the quick brown fox jumps over the lazy dog")
    assert(a == b && a.size == 4)
    // a near-duplicate shares most minimum window hashes
    val c = TextOps.winnowFingerprint("the quick brown fox jumps over the lazy cat")
    assert(a.intersect(c).size >= 2)
    // an unrelated doc does not
    val e = TextOps.winnowFingerprint("completely different words here entirely now")
    assert(a.intersect(e).isEmpty)
    // short-text fallback
    assert(TextOps.winnowFingerprint("tiny").nonEmpty)
  }

  test("query runs distributed and is stable across runs") {
    val q = SparkEntry.queries("text_rolling_fingerprint")
    val r1 = q(spark, TestSpark.sf).collect().map(r => (r.getLong(0), r.getString(1)))
    val r2 = q(spark, TestSpark.sf).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r1.toSeq == r2.toSeq)
    assert(r1.length == 500)
  }
}
