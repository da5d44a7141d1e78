package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Property laws for the round-12 seeded sketches (both are
  * oracle-replayed end-to-end by the driver gate; these pin the
  * ALGEBRAIC laws the replay can't see — buffer-level mergeability,
  * partition-order invariance, and the quantization theorem — over
  * random inputs).
  */
class KmvQuantilePropertySpec extends AnyFunSuite {

  private def forAllSamples[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = Seed(1234L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val K = 16 // small k exercises saturation constantly

  private def brute(values: Seq[Long]): (Long, Long) = {
    val mink = values.distinct.sorted.take(K)
    (mink.length.toLong, if (mink.length == K) mink.last else 0L)
  }

  private def viaAgg(parts: Seq[Seq[Long]]): (Long, Long) = {
    val agg = new Sketches.KmvSketch(K)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val out = agg.finish(bufs.foldLeft(agg.zero)(agg.merge))
    (out.m, out.hk)
  }

  test("KMV buffer == brute min-k distinct for any partitioning and duplication") {
    val gen = for {
      vals <- Gen.listOfN(120, Gen.chooseNum(0L, 400L)) // dense: many dups
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 120))
    } yield (vals, cuts.sorted)
    forAllSamples(gen, 200) { case (vals, cuts) =>
      val bounds = (0 +: cuts :+ vals.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => vals.slice(a, b) }
      assert(viaAgg(parts) == brute(vals),
        s"partitioned fold diverged on $vals at cuts $cuts")
      // merge is order-insensitive (partial aggregates arrive in any order)
      assert(viaAgg(parts.reverse) == brute(vals))
    }
  }

  test("KMV estimate lands within 15% on uniform hash populations") {
    // the shipped estimator at the shipped k over a genuinely uniform
    // domain (what kmvMix produces): (k-1)*P/h_k within the audit bound
    val P = 2147483647L
    val k = Sketches.KmvK
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val ndv = 2000 + rnd.nextInt(8000)
      val hashes = Seq.fill(ndv)(math.abs(rnd.nextLong()) % P).distinct
      val agg = new Sketches.KmvSketch(k)
      val out = agg.finish(hashes.foldLeft(agg.zero)(agg.reduce))
      val est = if (out.m < k) out.m else (k - 1).toLong * P / out.hk
      assert(math.abs(est - hashes.length) <= hashes.length * 0.15,
        s"trial $trial: est $est vs ndv ${hashes.length}")
    }
  }

  test("log-quantization theorem: qv(x) <= x < qv(x) + 2^s, monotone, bounded bins") {
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    def shift(x: Long) = math.max(bitlen(x) - 4, 0)
    def qv(x: Long): Long = if (x <= 0) 0L else (x >> shift(x)) << shift(x)
    forAllSamples(Gen.chooseNum(0L, 1L << 40), 2000) { x =>
      val q = qv(x)
      val hi = if (q <= 0) 1L else q + (1L << shift(q))
      if (x > 0) {
        assert(q <= x && x < hi, s"x=$x q=$q hi=$hi")
        // relative bin width < 1/8: the sketch's value-error guarantee
        assert((hi - q).toDouble / q <= 0.125 + 1e-9 || q < 8,
          s"bin too wide at x=$x")
        // the quantized value derives the SAME shift as its source —
        // binHiSql's inversion precondition
        assert(shift(q) == shift(x), s"shift not preserved at x=$x")
      } else assert(q == 0L && hi == 1L)
    }
    // monotone: order-statistic selection commutes with quantization
    val xs = Seq.fill(500)(math.abs(new scala.util.Random(3).nextLong()) % (1L << 30)).sorted
    assert(xs.map(qv) == xs.map(qv).sorted)
  }
}
