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

class ShingleDfCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hot shingles are capped out of candidates but still count in inter") {
    import spark.implicits._
    // 40 docs all share boilerplate shingle B (df=40 > cap=10);
    // docs 1 and 2 additionally share rare shingles r1..r3
    val boiler = (1L to 40L).map(id => (id, "B"))
    val rare = Seq((1L, "r1"), (1L, "r2"), (1L, "r3"),
      (2L, "r1"), (2L, "r2"), (2L, "r3"))
    val ex = (boiler ++ rare).toDF("doc_id", "shingle")
      .select(col("doc_id"), xxhash64(col("shingle")).as("hs"))
    val pairs = graft.ops.Dedup.shinglePairsCapped(ex, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // boilerplate-only pairs (C(40,2) = 780 of them) never materialize…
    assert(pairs.length == 1)
    // …but the surviving candidate's intersection still counts B
    assert(pairs.head == ((1L, 2L, 4L)))
    // and with the cap above every df, the same input yields the full
    // uncapped pair set (the oracle-parity configuration)
    val uncapped = graft.ops.Dedup.shinglePairsCapped(ex, cap = 1000)
    assert(uncapped.count() == 780)
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

  test("mulmod61: multiplyHigh Mersenne folding equals the BigInt reference") {
    val M = (1L << 61) - 1
    val rnd = new scala.util.Random(42)
    def ref(a: Long, b: Long): Long = (BigInt(a) * b % M).toLong
    // edge values + a random sweep over the full operand domain [0, M)
    val edges = Seq(0L, 1L, 2L, 256L, 257L, M - 1, M - 2, 1L << 60, (1L << 60) - 1)
    for (a <- edges; b <- edges)
      assert(TextOps.mulmod61(a, b) == ref(a, b), s"($a, $b)")
    (1 to 10000).foreach { _ =>
      val a = rnd.nextLong() & M // uniform in [0, 2^61); M itself ≡ 0 is fine
      val b = rnd.nextLong() & M
      assert(TextOps.mulmod61(a, b) == ref(a, b), s"($a, $b)")
    }
  }

  test("query runs distributed and is stable across runs") {
    val q = SparkEntry.queries("text_rolling_fingerprint")
    val r1 = q(spark, TestSpark.sf).collect().map(r => (r.getLong(0), r.getString(1)))
    val r2 = q(spark, TestSpark.sf).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r1.toSeq == r2.toSeq)
    assert(r1.length == 500)
  }
}
