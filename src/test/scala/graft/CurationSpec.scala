package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation layer (Curation.scala) and the
  * connected-component cluster assignment (Dedup.clusterAssign).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("curation pipeline keeps only gated, deduped docs") {
    val out = SparkEntry.queries("curation_pipeline")(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.util.Tables.documents(spark, sf).count()
    assert(total > 0 && total <= corpus)
    // every emitted language bucket passed the quality gate on average
    out.foreach(r => assert(r.getAs[Double]("avg_quality") >= 0.7))
  }

  test("token histogram buckets partition the corpus") {
    val out = SparkEntry.queries("text_token_histogram")(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.util.Tables.documents(spark, sf).count())
    val buckets = out.map(_.getAs[Int]("bucket"))
    assert(buckets.distinct.length == buckets.length)
    assert(buckets.forall(b => b >= 0 && b <= 19))
  }

  test("exact percentiles are ordered and within data range") {
    val rows = SparkEntry.queries("corpus_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p75, p95) =
        Seq("p25", "p50", "p75", "p95").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }

  test("hash-Bernoulli sample is deterministic and ~1/8") {
    val a = SparkEntry.queries("sample_hash_bernoulli")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val b = SparkEntry.queries("sample_hash_bernoulli")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "sample must be identical across runs")
    val n = graft.util.Tables.documents(spark, sf).count().toDouble
    assert(a.length > 0 && a.length < n * 0.3,
      s"${a.length} of $n sampled — expected ~1/8")
  }

  test("token vocab is frequency-ordered with deterministic ties") {
    val rows = SparkEntry.queries("token_vocab")(spark, sf).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[Long]("n"), r.getAs[String]("token")))
    pairs.sliding(2).foreach { case Array((n1, t1), (n2, t2)) =>
      assert(n1 > n2 || (n1 == n2 && t1 < t2))
    case _ => ()
    }
  }

  test("sequence packing conserves docs and tokens") {
    val out = SparkEntry.queries("pack_sequences")(spark, sf).collect()
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == graft.util.Tables.documents(spark, sf).count())
    // bins are consecutive from 0 within each lang
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).sorted
      assert(bins.head == 0L && bins.zipWithIndex.forall { case (b, i) => b == i })
    }
  }

  test("int8 quantization checksum is bounded by 127*dim") {
    val rows = SparkEntry.queries("embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dim = r.getAs[Int]("dim")
      assert(math.abs(r.getAs[Long]("checksum")) <= 127L * dim)
      assert(r.getAs[Double]("scale") > 0)
    }
  }

  test("cluster assignment labels every paired doc with its component min") {
    import spark.implicits._
    // two components: {1,2,3} via chain 1-2, 2-3; {10, 11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val got = graft.ops.Dedup.clusterAssign(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("cluster assignment converges on a long chain") {
    import spark.implicits._
    val chain = (0L until 20L).map(k => (k, k + 1)).toDF("i", "j")
    val got = graft.ops.Dedup.clusterAssign(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 21 && got.values.forall(_ == 0L))
  }

  test("dedup_clusters agrees with the near-dup pair graph") {
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // paired docs share a representative
    pairs.foreach { case (i, j) =>
      assert(clusters(i) == clusters(j), s"pair ($i,$j) split across clusters")
    }
    // every representative is a member of its own cluster
    clusters.values.foreach(rep => assert(clusters(rep) == rep))
  }

  test("epoch shuffle: full coverage per epoch, orders differ across epochs") {
    val rows = SparkEntry.queries("corpus_epoch_shuffle")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.util.Tables.documents(spark, TestSpark.sf).count()
    // each epoch's shards partition the whole corpus
    Seq(0, 1).foreach { e =>
      assert(rows.filter(_._1 == e).map(_._3).sum == nDocs,
        s"epoch $e shards do not cover the corpus")
    }
    // the permutation really changes between epochs: per shard, the
    // order fingerprints must differ (md5 re-keys every position)
    val byShard = rows.groupBy(_._2)
    byShard.foreach { case (shard, rs) =>
      val fps = rs.sortBy(_._1).map(_._4)
      assert(fps.distinct.length == fps.length,
        s"shard $shard kept the same order across epochs: $rs")
    }
  }
}
