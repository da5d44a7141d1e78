package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Direct-fixture tests for ops internals the driver queries exercise
  * only at corpus scale: the retrieval index's tombstone deletion (the
  * negative-ingest df/stats correction) and owl:sameAs quad
  * canonicalization (closure, rep choice, literal guard).
  */
class OpsInternalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("suffix repeats: planted cross-doc run reported at its maximal length") {
    import spark.implicits._
    val run = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      10L -> s"aa bb cc $run dd ee ff gg hh",
      20L -> s"zz yy $run xx ww vv uu tt ss rr").toDF("doc_id", "text")
    val reps = Dedup.suffixRepeats(docs, minRepeat = 5).collect()
    // the maximal repeat is the full 12-token run, found once
    val top = reps.head
    assert(top.getLong(0) == 12L && top.getString(1) == run
      && top.getLong(2) == 1L)
    // suffix-array nesting: every suffix of the run >= minRepeat tokens
    // is itself an adjacent repeated prefix (lengths 12 down to 5)
    val lens = reps.map(_.getLong(0)).toSeq.sorted
    assert(lens == (5L to 12L).toSeq,
      s"expected nested run suffixes 5..12, got $lens")
    reps.foreach(r => assert(run.endsWith(r.getString(1)),
      s"every repeat must be a suffix of the planted run: ${r.getString(1)}"))
    // no >=5-token repeat exists in a repeat-free corpus
    val clean = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "k l m n o p q r s t").toDF("doc_id", "text")
    assert(Dedup.suffixRepeats(clean, minRepeat = 5).count() == 0)
  }

  test("index delete: delete-then-serve == never-indexed, bit for bit") {
    import spark.implicits._
    // doc 0 (doc_id % 50 == 0) is the query; docs 3 and 7 get erased
    val docs = Seq(
      0L -> "alpha beta gamma",
      1L -> "alpha beta",
      2L -> "beta gamma delta",
      3L -> "alpha gamma gamma",
      7L -> "delta alpha",
      9L -> "beta beta alpha").toDF("doc_id", "text")
    val dead = Seq(3L, 7L).toDF("doc_id")
    val full = s"${System.getProperty("java.io.tmpdir")}/graft-deltest-f-${System.nanoTime()}"
    val fresh = s"${System.getProperty("java.io.tmpdir")}/graft-deltest-s-${System.nanoTime()}"
    graft.util.TempDirs.deleteOnExit(full)
    graft.util.TempDirs.deleteOnExit(fresh)
    Retrieval.writePostingsIngest(docs, full, "base")
    Retrieval.deleteFromIndex(spark, full, "d1", dead)
    val survivors = docs.join(dead, Seq("doc_id"), "left_anti")
    Retrieval.writePostingsIngest(survivors, fresh, "base")
    def serve(dir: String) =
      Retrieval.bm25RanksFrom(spark, dir, docs, depth = 5)
        .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
        .collect().map(_.toSeq).toSet
    val afterDelete = serve(full)
    assert(afterDelete == serve(fresh),
      "tombstone+negative-ingest serving must equal a from-scratch index over the survivors")
    // and the erased docs are unfindable on the scoring path
    assert(!afterDelete.exists(r => r(2) == 3L || r(2) == 7L))
  }

  test("index compact: folds base+append+delete into one ingest, serving unchanged") {
    import spark.implicits._
    val docs = Seq(
      0L -> "alpha beta gamma",
      1L -> "alpha beta",
      2L -> "beta gamma delta",
      3L -> "alpha gamma gamma",
      7L -> "delta alpha",
      9L -> "beta beta alpha").toDF("doc_id", "text")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-cmptest-${System.nanoTime()}"
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-cmptest-o-${System.nanoTime()}"
    graft.util.TempDirs.deleteOnExit(dir)
    graft.util.TempDirs.deleteOnExit(out)
    Retrieval.writePostingsIngest(docs.filter(col("doc_id") < 3), dir, "base")
    Retrieval.writePostingsIngest(docs.filter(col("doc_id") >= 3), dir, "a1")
    Retrieval.deleteFromIndex(spark, dir, "d1", Seq(7L).toDF("doc_id"))
    Retrieval.compactIndex(spark, dir, out)
    def serve(p: String) =
      Retrieval.bm25RanksFrom(spark, p, docs, depth = 5)
        .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
        .collect().map(_.toSeq).toSet
    assert(serve(out) == serve(dir),
      "compacted index must serve byte-identically to the fragmented one")
    // dead history physically gone: no tombstones, a single ingest
    val root = new java.io.File(out)
    assert(!new java.io.File(root, "_tombstones").exists())
    val ingests = new java.io.File(root, "postings").listFiles()
      .filter(_.getName.startsWith("ingest=")).map(_.getName).toSet
    assert(ingests == Set("ingest=base"))
    // doc 7 is unfindable and its df contribution folded away
    assert(!serve(out).exists(_(2) == 7L))
    val df = spark.read.parquet(s"$out/terms").filter(col("term") === "delta")
      .agg(org.apache.spark.sql.functions.sum(col("df"))).collect()(0).getLong(0)
    assert(df == 1L, "delta appears only in surviving doc 2 after the fold")
  }

  test("prefix filtering: lossless at the threshold, boilerplate never joins") {
    import spark.implicits._
    // every doc shares the 'x y z' boilerplate shingle; docs 1/2 are
    // true near-dups; doc 4 overlaps everyone ONLY through boilerplate
    val docs = Seq(
      1L -> "x y z a b c d e",
      2L -> "x y z a b c d f",
      3L -> "x y z q r s t u",
      4L -> "x y z m n o p w").toDF("doc_id", "text")
    val ex = docs.select(col("doc_id"),
        explode(Dedup.shingles(graft.ops.TextOps.tokens(col("text")))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("hs"))
    val counts = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        Dedup.shingles(graft.ops.TextOps.tokens(col("text")))).as("n"))
    def pairSet(inter: org.apache.spark.sql.DataFrame) = {
      val ci = counts.select(col("doc_id").as("i"), col("n").as("ni"))
      val cj = counts.select(col("doc_id").as("j"), col("n").as("nj"))
      inter.join(ci, "i").join(cj, "j")
        .withColumn("jac", col("inter") / (col("ni") + col("nj") - col("inter")))
        .filter(col("jac") >= 0.5)
        .select(col("i"), col("j")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // truth: the uncapped shared-shingle generator (complete by construction)
    val truth = pairSet(Dedup.shinglePairsCapped(ex, Int.MaxValue))
    assert(truth == Set((1L, 2L)), "fixture sanity: only 1-2 clear 0.5")
    assert(pairSet(Dedup.prefixFilterPairs(ex, counts, 0.5)) == truth,
      "prefix filtering must find the exact >=t pair set")
  }

  test("incremental CC: merge + new-node labels equal a full recompute") {
    import spark.implicits._
    // base: two components {1,2,3} and {10,11}; delta merges them via
    // (3,10), attaches new node 99 to 11, and adds an untouched-pair
    // edge between new nodes (200, 201)
    val base = Seq((2L, 1L), (3L, 2L), (11L, 10L)).toDF("i", "j")
    val delta = Seq((3L, 10L), (99L, 11L), (200L, 201L)).toDF("i", "j")
    val inc = GraphAlgos.componentsIncremental(
        GraphAlgos.componentsLargeSmallStar(base), delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = GraphAlgos.componentsLargeSmallStar(base.unionAll(delta))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full)
    assert(inc.contains((99L, 1L)) && inc.contains((201L, 200L)))
  }

  test("sameAs canonicalize: closure to lexicographic-min rep, literal guard") {
    import spark.implicits._
    // identity chain x:a <- x:b <- x:c (two sameAs statements)
    val sameAs = Seq(
      ("x:b", "sameAs", "x:a", "iri"),
      ("x:c", "sameAs", "x:b", "iri")).toDF("s", "p", "o_value", "o_kind")
    val facts = Seq(
      ("x:c", "p", "x:b", "iri"),     // subject AND object rewrite
      ("x:b", "q", "lit", "literal"), // subject rewrite, literal object kept
      ("x:c", "r", "x:a", "iri"),     // object already canonical
      ("x:z", "s", "x:b", "literal")  // literal that LOOKS like a mapped IRI
    ).toDF("s", "p", "o_value", "o_kind")
    val out = RdfOps.sameAsCanonicalize(facts, sameAs)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      ("x:a", "p", "x:a", "iri"),
      ("x:a", "q", "lit", "literal"),
      ("x:a", "r", "x:a", "iri"),
      ("x:z", "s", "x:b", "literal")))
  }
}

/** The r13 band-index memo: the banded MinHash signatures are a
  * per-corpus artifact shared by dedup_minhash_lsh and
  * dedup_incremental — one 48-hash aggregation per corpus, not per
  * consumer, dropped at the bench family boundary. */
class BandCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = graft.TestSpark.sf

  test("corpusBands memoizes per (session, dir) and clearCaches drops it") {
    Dedup.clearCaches()
    val a = Dedup.corpusBands(spark, sf)
    val b = Dedup.corpusBands(spark, sf)
    assert(a eq b, "second consumer must get the memoized band index")
    assert(a.columns.toSeq == Seq("doc_id", "band", "bandHash"))
    Dedup.clearCaches()
    val c = Dedup.corpusBands(spark, sf)
    assert(!(a eq c), "clearCaches must drop the memo (fresh instance after)")
    // semantic identity across memo generations: same banded signature set
    assert(a.exceptAll(c).count() == 0 && c.exceptAll(a).count() == 0)
    Dedup.clearCaches()
  }
}
