package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Contamination

/** Semantics of the round-3 selection operators (sampling, benchmark
  * decontamination, funnel, window suite) beyond the DuckDB oracle:
  * planted-positive detection, determinism, and plan shape.
  */
class SelectionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("decontamination flags a planted benchmark passage") {
    import spark.implicits._
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "intro words then alpha beta gamma delta copied verbatim"),
      (2L, "completely unrelated text with no overlap at all here"))
      .toDF("doc_id", "text")
    val out = Contamination.flagContaminated(train, eval).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    // "alpha beta gamma" and "beta gamma delta" are the shared 3-grams
    assert(out.head.getAs[Long]("n_shared") == 2L)
  }

  test("bloom decontamination is exact even when the filter is FP-saturated") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      (i, if (i % 7 == 0) "alpha beta gamma delta epsilon zeta"
          else s"doc $i words w${i}a w${i}b w${i}c w${i}d w${i}e")
    }.toDF("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 7 === 0 && col("doc_id") > 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0 || col("doc_id") === 0)
    val exact = Contamination.flagContaminated(train, eval)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 64-bit filter for hundreds of shingles — near-every probe is a
    // false positive; the exact-verify join must still kill them all
    val bloom = Contamination.flagContaminatedBloom(train, eval,
      expectedItems = 4, numBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == exact)
    assert(exact.contains((0L, 4L))) // doc 0 shares all four 3-grams
  }

  test("bloom decontamination probes map-side before the exact join") {
    val df = SparkEntry.queries("text_decontaminate_bloom")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(800))
    // the bloom probe must sit below the exact-verify join: the filter's
    // first appearance comes after (deeper than) the last join header line
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("HashJoin")
    assert(joinIdx >= 0 && probeIdx > joinIdx, p.take(1200))
  }

  test("decontamination broadcasts the eval shingle set") {
    val df = SparkEntry.queries("text_decontaminate")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("stratified sample is deterministic and a subset per stratum") {
    val q = SparkEntry.queries("sample_stratified")
    val a = q(spark, sf).collect().map(_.getLong(0))
    val b = q(spark, sf).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("reservoir sample keeps exactly min(k, stratum size) per language") {
    val rows = SparkEntry.queries("sample_reservoir")(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"), max(col("rk")).as("m"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") <= 10)
      // ranks are contiguous 1..n
      assert(r.getAs[Int]("m").toLong == r.getAs[Long]("n"))
    }
  }

  test("funnel stages are monotonically non-increasing with positive gaps") {
    val rows = SparkEntry.queries("q30_events_funnel")(spark, sf)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(0) > 0)
    rows.drop(1).filter(_.getAs[Long]("n_users") > 0).foreach { r =>
      assert(r.getAs[Double]("avg_gap_secs") > 0.0)
    }
  }

  test("repetition scoring: a one-token loop maxes both signals") {
    val rows = SparkEntry.queries("text_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_3gram_frac")
      val share = r.getAs[Double]("top_token_share")
      assert(dup >= 0.0 && dup <= 1.0)
      assert(share > 0.0 && share <= 1.0)
    }
    // planted degenerate doc exercised through the same column exprs
    import spark.implicits._
    import graft.ops.{Dedup, TextOps}
    val planted = Seq((1L, "spam spam spam spam spam spam"))
      .toDF("doc_id", "text")
      .select(
        (lit(1.0) - size(Dedup.shingles(TextOps.tokens(col("text")), 3)) /
          (size(TextOps.tokens(col("text"))) - 2)).as("dup"))
      .head()
    assert(planted.getDouble(0) == 0.75) // 4 trigram slots, 1 distinct
  }

  test("unigram surprise: rarer-token docs score higher") {
    val rows = SparkEntry.queries("text_unigram_surprise")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("surprise") > 0.0))
  }

  test("window suite computes all five navigation functions in one Window") {
    val df = SparkEntry.queries("q29_window_suite")(spark, sf)
    df.collect()
    // AQE's toString prints Final AND Initial plan sections — count the
    // final one only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("Window"), p.take(800))
    // all five functions share the sort order, so however Catalyst
    // groups them into Window operators there is ONE o_custkey shuffle
    val nExchanges = p.linesIterator.count(_.contains("hashpartitioning(o_custkey"))
    assert(nExchanges <= 1, s"expected one o_custkey shuffle:\n${p.take(1200)}")
  }
}
