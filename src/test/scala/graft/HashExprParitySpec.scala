package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{HashExprs, Sketches}

/** Bit-parity of the native codegen'd polynomial hash against the
  * original HOF formulation (the exact chain every committed DuckDB
  * oracle mirrors — see Sketches.polyHashSql). The r12 verdict's
  * `dedup_simhash` fix is only sound if the native loop produces the
  * SAME values the oracles replay, so this pins equality over random
  * whitespace-free strings across ASCII, Latin-1, CJK and
  * supplementary-plane code points, plus a manual reference vector.
  */
class HashExprParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val P = 2147483647L

  /** Driver-side reference fold (code points, the documented math). */
  private def ref(s: String, base: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  private def tokenGen: Gen[String] = {
    val ascii = Gen.alphaNumChar
    val latin1 = Gen.choose(0xa1.toChar, 0xff.toChar)
    val cjk = Gen.choose(0x4e00.toChar, 0x9fff.toChar)
    val chr = Gen.frequency(6 -> ascii, 2 -> latin1, 2 -> cjk)
    Gen.nonEmptyListOf(chr).map(_.mkString)
  }

  test("native poly_hash == HOF formulation on random multilingual tokens") {
    import spark.implicits._
    var seed = Seed(42L)
    val toks = (0 until 400).flatMap { _ =>
      val t = tokenGen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    } ++ Seq("a", "z9", "tok", "café", "ναι", "中文分词", "x" * 64)
    val df = toks.toDF("tok")
    val rows = df.select(col("tok"),
        HashExprs.poly_hash(col("tok")).as("native"),
        Sketches.polyHashHof(col("tok")).as("hof"),
        HashExprs.poly_hash(col("tok"), 263L).as("native263"),
        Sketches.polyHashHof(col("tok"), 263L).as("hof263"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"base 257 diverged on '${r.getString(0)}'")
      assert(r.getLong(3) == r.getLong(4), s"base 263 diverged on '${r.getString(0)}'")
      assert(r.getLong(1) == ref(r.getString(0), 257L))
    }
  }

  test("supplementary-plane code points: native matches the driver-side fold") {
    import spark.implicits._
    // the HOF's `ascii()` semantics on surrogate pairs are Spark-
    // internal; the CONTRACT is the code-point fold, which DuckDB's
    // ord() also implements — pin native == reference here
    val toks = Seq("😀", "a😀b", "𐀀")
    val rows = toks.toDF("tok")
      .select(col("tok"), HashExprs.poly_hash(col("tok")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0), 257L)))
  }

  test("native whole-document SimHash == explode+vote aggregation on real documents") {
    val docs = graft.util.Tables.documents(spark, TestSpark.sf)
    val native = graft.ops.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = graft.ops.Dedup.simhashAgg(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size == agg.size && native.nonEmpty)
    agg.foreach { case (id, fp) =>
      assert(native(id) == fp, s"fingerprint diverged on doc $id")
    }
  }

  test("SimHash edge cases: whitespace-only text has no fingerprint; tab/newline split tokens") {
    import spark.implicits._
    val rows = Seq((1L, "  \t\n "), (2L, "a\tb\nc"), (3L, "a b c"), (4L, ""))
      .toDF("doc_id", "text")
    val native = graft.ops.Dedup.simhash(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = graft.ops.Dedup.simhashAgg(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == agg) // docs 1 and 4 absent from both; 2 == 3 fingerprints
    assert(native.keySet == Set(2L, 3L) && native(2L) == native(3L))
  }

  test("native token_lcp == zip_with fold on random and real suffix pairs") {
    import spark.implicits._
    import graft.ops.{Dedup, HashExprs}
    var seed = Seed(7L)
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val arrGen = Gen.listOfN(8, wordGen)
    val pairs = (0 until 200).flatMap { _ =>
      val a = arrGen.apply(Gen.Parameters.default, seed); seed = seed.next
      val b = arrGen.apply(Gen.Parameters.default, seed); seed = seed.next
      for (x <- a; y <- b) yield {
        // force shared prefixes often so the fold's alive logic is hit
        (x ++ y.drop(scala.math.min(3, y.length)), y)
      }
    } ++ Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c")),  // full match
      (Seq("a", "b"), Seq("a", "b", "c")),        // shorter left
      (Seq("a", "b", "c"), Seq("a")),             // shorter right
      (Seq.empty[String], Seq("a")))              // empty side
    val df = pairs.toDF("a", "b")
      .select(HashExprs.token_lcp(col("a"), col("b")).as("native"),
        Dedup.tokenLcpHof(col("a"), col("b")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    val full = df.count()
    assert(full == pairs.size)
  }

  test("native vec_sqdist == HOF fold bit-for-bit on real embeddings") {
    import graft.ops.Similarity
    val vecs = graft.util.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(64)
    val a = vecs.select(col("v"))
    val pairs = a.crossJoin(a.select(col("v").as("w"))).limit(2048)
    val diff = pairs.select(
        Similarity.sqDist(col("v"), col("w")).as("native"),
        Similarity.sqDistHof(col("v"), col("w")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact double equality
      .count()
    assert(diff == 0)
  }

  test("null propagates; empty string hashes to 0") {
    import spark.implicits._
    val rows = Seq(Some(""), None).toDF("tok")
      .select(HashExprs.poly_hash(col("tok"))).collect()
    assert(rows.exists(_.isNullAt(0)) && rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 0L))
  }
}
