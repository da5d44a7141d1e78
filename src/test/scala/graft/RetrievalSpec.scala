package graft

import org.scalatest.funsuite.AnyFunSuite

/** BM25 / hybrid-RRF retrieval semantics, the BFS hop operator, and
  * the merge-on-read time-travel read.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bm25: self excluded, k ranks per query, scores descend") {
    val rows = SparkEntry.queries("retrieval_bm25_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      assert(rs.forall(_.getLong(2) != q), s"query $q retrieved itself")
      assert(rs.length <= 5)
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"ranks not contiguous for $q")
      val scores = ranked.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending for $q")
      assert(scores.forall(_ > 0))
    }
  }

  test("bm25: every retrieved doc shares a term with the query prefix") {
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val rows = SparkEntry.queries("retrieval_bm25_topk")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length >= 2, "need several queries")
    rows.foreach { r =>
      val qTerms = docs(r.getLong(0)).take(8).toSet
      val hitTerms = docs(r.getLong(2)).toSet
      assert(qTerms.intersect(hitTerms).nonEmpty,
        s"doc ${r.getLong(2)} retrieved for ${r.getLong(0)} with no shared term")
    }
  }

  test("hybrid rrf: fused score bounded by both-lists-rank-1 maximum") {
    val rows = SparkEntry.queries("retrieval_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxRrf = 1.0 / 61 + 1.0 / 61
    rows.foreach { r =>
      val v = r.getDouble(3)
      assert(v > 0 && v <= maxRrf + 1e-9, s"rrf $v out of range")
    }
    // a doc on both lists beats a doc on one list at the same ranks:
    // max single-list contribution is 1/61 < any two-list sum
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(ranked == ranked.sorted.reverse)
    }
  }

  test("bfs hops: seeds at distance 0, neighbors alternate partitions") {
    val rows = SparkEntry.queries("graph_bfs_hops")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val seeds = rows.filter(_._3 == 0)
    assert(seeds.nonEmpty)
    seeds.foreach { case (s, n, _) => assert(s == n) }
    // bipartite u/t graph: odd hops land on t: nodes, even hops on u:
    rows.foreach { case (_, n, d) =>
      if (d % 2 == 1) assert(n.startsWith("t:"), s"odd hop $d on $n")
      else assert(n.startsWith("u:"), s"even hop $d on $n")
    }
    // distances are minimal: every (seed, node) appears exactly once
    val dup = rows.groupBy(r => (r._1, r._2)).filter(_._2.length > 1)
    assert(dup.isEmpty, s"non-minimal duplicates: ${dup.keys.take(3)}")
  }

  test("mor time travel: snapshots differ and as-of-latest equals read()") {
    import org.apache.spark.sql.functions._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ttspec-${System.nanoTime()}"
    val store = new graft.model.MergeOnReadStore(spark, dir)
    import spark.implicits._
    def q(s: String, v: String) = graft.model.Quad("g", s, "p", v, null, null, "literal")
    store.appendDelta(Seq(q("a", "1"), q("b", "1")).toDF(), 1L)
    store.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    store.appendDelta(Seq(q("c", "2")).toDF(), 3L)
    assert(store.versions() == Seq(1L, 2L, 3L))
    def subjects(v: Long) =
      store.readAsOf(v).select(col("s")).collect().map(_.getString(0)).toSet
    assert(subjects(1L) == Set("a", "b"))
    assert(subjects(2L) == Set("b"))
    assert(subjects(3L) == Set("b", "c"))
    val current = store.read().select(col("s")).collect().map(_.getString(0)).toSet
    assert(current == subjects(3L))
  }
}
