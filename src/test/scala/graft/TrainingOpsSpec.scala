package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-data operators whose driver check is rows-only
  * (no SQL oracle): SimHash near-dup, LSH-bucketed ANN, multimodal
  * decode stub. Each is validated against its exact counterpart.
  */
class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hard negatives exclude chain-connected dups a direct cos gate would keep") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // unit vectors at 0deg (A), 40deg (B), 80deg (C), 85deg (E):
    // cos(A,B)=cos(B,C)=0.766 (dup pairs), cos(A,C)=0.174, cos(A,E)=0.087
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq((0L, v(0), 1.0), (1L, v(40), 1.0),
      (2L, v(80), 1.0), (3L, v(85), 1.0)).toDF("vec_id", "v", "nrm")
    val dupPairs = Seq((0L, 1L), (1L, 2L)).toDF("i", "j")
    val negs = ops.Similarity.hardNegatives(
      vecs, dupPairs, col("vec_id") === 0L, k = 5).collect()
    // C (cos 0.174) outranks E (0.087) but sits in A's cluster through
    // the B chain — only the transitive exclusion removes it; a plain
    // cos >= 0.45 dup gate would have kept it as a false negative
    assert(negs.map(_.getLong(2)).toSeq == Seq(3L),
      s"expected only E(3) as a negative, got ${negs.toSeq}")
  }

  test("minhash-LSH finds exactly the exact-jaccard near-dup pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "fixture data should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash near-dup candidates cover the high-jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val sim = pairs("dedup_simhash")
    // simhash (bag-of-words signal) must recover the token-level
    // near-dups; it may add a few extra low-distance candidates
    val recall = exact.count(sim) * 1.0 / exact.size
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("LSH-bucketed ANN reaches usable recall vs brute force") {
    val exact = SparkEntry.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = SparkEntry.queries("ann_lsh_bucketed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lsh.nonEmpty)
    // 16 bands x 4-bit signatures over 64-dim embeddings: recall >= 0.7
    // is the round-8 operating point (matches the ann_lsh_recall floor)
    val recall = exact.count(lsh) * 1.0 / exact.size
    info(s"banded LSH recall: $recall")
    assert(recall >= 0.7)
  }

  test("IVF-bucketed ANN reaches usable recall vs brute force") {
    val exact = SparkEntry.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SparkEntry.queries("ann_ivf_bucketed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.nonEmpty)
    val recall = exact.count(ivf) * 1.0 / exact.size
    info(s"IVF (k-means-trained centroids) recall: $recall")
    assert(recall >= 0.7)
  }

  test("PQ+ADC+rerank ANN reaches usable recall vs brute force") {
    val exact = SparkEntry.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = SparkEntry.queries("ann_pq_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pq.nonEmpty)
    val recall = exact.count(pq) * 1.0 / exact.size
    info(s"PQ (trained codebooks) ADC + exact rerank recall: $recall")
    assert(recall >= 0.7)
  }

  test("IVF+PQ composed ANN reaches usable recall vs brute force") {
    val exact = SparkEntry.queries("ann_bruteforce_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = SparkEntry.queries("ann_ivfpq_bucketed")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivfpq.nonEmpty)
    val recall = exact.count(ivfpq) * 1.0 / exact.size
    info(s"IVFADC (cell-pruned, PQ-scored, reranked) recall: $recall")
    assert(recall >= 0.7)
  }

  test("PQ codes pack 8 four-bit subspace codes deterministically") {
    val a = SparkEntry.queries("embed_pq_codes")(spark, sf).collect()
    val b = SparkEntry.queries("embed_pq_codes")(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // every packed code fits in 32 bits (8 × 4-bit) and they vary
    assert(a.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 0xFFFFFFFFL))
    assert(a.map(_.getLong(1)).distinct.length > 1)
  }

  test("simhash fingerprints are deterministic and 64-bit") {
    import graft.ops.Dedup
    val docs = graft.util.Tables.documents(spark, sf)
    val a = Dedup.simhash(docs).orderBy("doc_id").collect().map(_.getLong(1))
    val b = Dedup.simhash(docs).orderBy("doc_id").collect().map(_.getLong(1))
    assert(a.toSeq == b.toSeq)
    assert(a.distinct.length > a.length / 2) // not collapsed
  }

  test("multimodal real image decode: PNG round-trip matches closed form") {
    import graft.ops.Multimodal
    import spark.implicits._
    val ids = Seq(0L, 3L, 123L, 999L, 300003L)
    val media = ids.toDF("doc_id")
      .as[Long].mapPartitions(_.map(id => (id, Multimodal.syntheticPng(id))))
      .toDF("doc_id", "media")
    val stats = Multimodal.decodeImages(media).collect()
      .map(s => s.doc_id -> s).toMap
    for (id <- ids) {
      val s = stats(id)
      val (w, h) = ((id % 13 + 4).toInt, (id % 7 + 3).toInt)
      assert(s.width == w && s.height == h && s.channels == 3)
      assert(s.sum_r == w.toLong * h * (id % 256))
      assert(s.sum_g == w.toLong * (0 until h).map(y => (id + y) % 256).sum)
      assert(s.sum_b == w.toLong * h * ((id * 31) % 256))
    }
    // the payload really is a PNG (magic bytes), not a fake
    val png = Multimodal.syntheticPng(42L)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G')
  }

  test("multimodal decode stub: feature shape, normalization, frames") {
    import graft.ops.Multimodal
    val feats = Multimodal.featurize(
      Multimodal.asMedia(graft.util.Tables.documents(spark, sf)))
      .collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.features.length == Multimodal.FeatureDim))
    // histogram is normalized to ~1
    assert(feats.forall(f => math.abs(f.features.sum - 1f) < 1e-3))
    assert(feats.forall(f =>
      f.n_frames == (f.n_bytes + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes))
    assert(feats.map(_.kind).toSet == Set("image", "audio", "video"))
  }
}
