package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the quality/semantic curation operators: Gopher rules,
  * token-window dedup, bigram surprise, SemDeDup, k-means. */
class QualityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("gopher pass flag is the conjunction of the individual rules") {
    val rows = SparkEntry.queries("text_gopher_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (1 to 4).map(r.getInt)
      assert(r.getInt(5) == (if (flags.forall(_ == 1)) 1 else 0))
    }
    // the rule set must discriminate, not rubber-stamp
    assert(rows.exists(_.getInt(5) == 0) && rows.exists(_.getInt(5) == 1))
  }

  test("token-window dedup counts are consistent and find planted dups") {
    val rows = SparkEntry.queries("dedup_token_windows")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // dup <= total windows
      assert(r.getLong(1) >= 1)            // every doc >= 10 tokens here
    }
    assert(rows.exists(_.getLong(2) > 0), "corpus contains duplicated windows")
  }

  test("semantic dedup drops exactly the higher-id side of neardup pairs") {
    val pairs = SparkEntry.queries("embed_neardup_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectDropped = pairs.map(_._2).toSet
    val dedup = SparkEntry.queries("embed_semantic_dedup")(spark, sf).collect()
    val dropped = dedup.filter(_.getInt(1) == 0).map(_.getLong(0)).toSet
    assert(dropped == expectDropped)
    assert(dedup.length ==
      graft.util.Tables.embeddings(spark, sf).count())
  }

  test("k-means assigns every vector, uses <= k clusters, deterministic") {
    val a = SparkEntry.queries("embed_kmeans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val b = SparkEntry.queries("embed_kmeans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b), "same literals + same data => same clusters")
    assert(a.map(_._1).distinct.length == a.length)
    assert(a.map(_._2).distinct.length <= 8)
    val audit = SparkEntry.queries("embed_kmeans_audit")(spark, sf).head()
    assert(audit.getInt(1) == 1 && audit.getInt(2) == 1)
  }

  test("bigram surprise is finite, positive, and lower for repetitive text") {
    val rows = SparkEntry.queries("text_bigram_surprise")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(1)
      assert(!v.isNaN && !v.isInfinite && v >= 0.0)
    }
  }
}
