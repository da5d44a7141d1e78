package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RdfStats

/** Characteristic-set summary semantics on a hand-checked graph plus
  * fixture-level invariants.
  */
class RdfStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("characteristic sets partition subjects by predicate SET (multiplicity counted in triples)") {
    import spark.implicits._
    val stmts = Seq(
      ("s1", "p", "x"), ("s1", "q", "y"),
      ("s2", "p", "x"), ("s2", "q", "y"), ("s2", "q", "z"), // same set, extra triple
      ("s3", "p", "x")).toDF("s", "p", "o")
    val got = RdfStats.characteristicSets(stmts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("p,q", 2L, 5L), ("p", 1L, 1L)))
  }

  test("fixture summary: member counts cover every subject exactly once") {
    val rows = SparkEntry.queries("rdf_char_sets")(spark, sf).collect()
    val nSubjects = rows.map(_.getLong(1)).sum
    val nEvents = graft.util.Tables.events(spark, sf).count()
    assert(nSubjects == nEvents, "every event subject in exactly one set")
    assert(rows.length >= 2, "the fixture produces multiple shapes")
  }

  test("star-query estimate from the summary is exact for single-valued predicates") {
    val r = SparkEntry.queries("rdf_cset_estimate")(spark, sf).collect().head
    assert(r.getLong(0) == r.getLong(1) && r.getInt(2) == 1)
  }

  test("persisted stats artifact: load without scan matches the scan-path ordering") {
    import org.apache.spark.sql.functions._
    import graft.sparql.{Algebra, CardEstimator, StoreStats}
    val dir = java.nio.file.Files.createTempDirectory("stats-art").toString
    val store = new graft.model.GraphStore(spark, dir + "/store")
    val g = "http://ex/g"
    // skewed fixture: p_common on every subject, p_rare on a few — the
    // estimator must rank a p_rare pattern cheaper than p_common
    import spark.implicits._
    val quads = (1 to 200).map(i => (g, s"urn:s$i", "http://ex/p_common",
        s"v${i % 7}", null: String, null: String, "literal")) ++
      (1 to 5).map(i => (g, s"urn:s$i", "http://ex/p_rare",
        s"r$i", null: String, null: String, "literal"))
    store.appendDistinct(quads.toDF(
      "graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind"),
      Some(Seq(g)))
    StoreStats.write(store)
    val fromScan = CardEstimator.fromQuads(store.read())
    val fromArtifact = StoreStats.load(store)
    val tps = Seq(
      Algebra.TriplePattern(Algebra.V("s"),
        Algebra.I("http://ex/p_common"), Algebra.V("a")),
      Algebra.TriplePattern(Algebra.V("s"),
        Algebra.I("http://ex/p_rare"), Algebra.V("b")))
    assert(CardEstimator.orderOf(fromArtifact, tps) ==
      CardEstimator.orderOf(fromScan, tps),
      "artifact-loaded estimator ordered the BGP differently")
    // exact counts survive the sketch round-trip exactly; NDVs within
    // HLL tolerance (both estimate 7 and 5 here — tiny cardinalities
    // are exact in both sketches)
    assert(fromArtifact.estimate(tps(1)) < fromArtifact.estimate(tps(0)))
  }

  test("stats delete-refresh: counts decrement exactly, shapes recount from full quad identity") {
    import org.apache.spark.sql.functions._
    import graft.sparql.StoreStats
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stats-del").toString
    val store = new graft.model.GraphStore(spark, dir + "/store")
    val g = "http://ex/g"
    def df(rows: Seq[(String, String, String)]) = rows.map { case (s, p, o) =>
      (g, s, p, o, null: String, null: String, "literal")
    }.toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    // urn:a carries p1 TWICE (two objects): deleting one p1 quad must
    // NOT remove p1 from its shape — the (s,p)-pair shortcut would
    store.appendDistinct(df(Seq(
      ("urn:a", "p1", "x"), ("urn:a", "p1", "y"), ("urn:a", "p2", "z"),
      ("urn:b", "p1", "w"))), Some(Seq(g)))
    StoreStats.write(store)
    def state() = (
      StoreStats.predSummary(spark, store).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap,
      StoreStats.csetSummary(spark, store).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    val del1 = df(Seq(("urn:a", "p1", "x")))
    val pre1 = store.read().localCheckpoint()
    store.deleteQuads(del1, Some(Seq(g)))
    StoreStats.refreshDelete(store, pre1, del1)
    assert(state() == (Map("p1" -> 2L, "p2" -> 1L),
      Map("p1,p2" -> 1L, "p1" -> 1L)), s"after 1st delete: ${state()}")
    val del2 = df(Seq(("urn:a", "p1", "y")))
    val pre2 = store.read().localCheckpoint()
    store.deleteQuads(del2, Some(Seq(g)))
    StoreStats.refreshDelete(store, pre2, del2)
    // now urn:a's shape migrates {p1,p2} -> {p2}
    assert(state() == (Map("p1" -> 1L, "p2" -> 1L),
      Map("p2" -> 1L, "p1" -> 1L)), s"after 2nd delete: ${state()}")
  }

  test("delete-refresh keys on FULL quad identity: cross-graph twins and o_kind twins survive") {
    // ADVICE r11 (medium): a (s,p,o)-keyed except would collapse an
    // identical triple living in TWO named graphs — deleting one copy
    // must keep the predicate in the subject's shape while the other
    // survives; likewise an IRI/literal pair with equal lexical form.
    // Oracle per store kind: refreshDelete ≡ a from-scratch write().
    import graft.sparql.StoreStats
    import spark.implicits._
    val g1 = "http://ex/g1"; val g2 = "http://ex/g2"
    def fixture = Seq(
      (g1, "urn:a", "p1", "x", null: String, null: String, "literal"),
      (g2, "urn:a", "p1", "x", null: String, null: String, "literal"),
      (g1, "urn:a", "p2", "z", null: String, null: String, "literal"),
      // o_kind twin: same lexical form, IRI vs literal — two quads
      (g1, "urn:k", "p3", "x", null: String, null: String, "literal"),
      (g1, "urn:k", "p3", "x", null: String, null: String, "iri"))
      .toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    // delete g1's copy of (urn:a,p1,x) and the LITERAL (urn:k,p3,x)
    def del = Seq(
      (g1, "urn:a", "p1", "x", null: String, null: String, "literal"),
      (g1, "urn:k", "p3", "x", null: String, null: String, "literal"))
      .toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    def check(store: graft.model.QuadStore, pre: => org.apache.spark.sql.DataFrame): Unit = {
      StoreStats.write(store)
      val p = pre.localCheckpoint()
      store.deleteQuads(del, Some(Seq(g1, g2)))
      StoreStats.refreshDelete(store, p, del)
      def state() = (
        StoreStats.predSummary(spark, store).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap,
        StoreStats.csetSummary(spark, store).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap)
      val incremental = state()
      // both survivors keep their predicates in the shapes
      assert(incremental._2 == Map("p1,p2" -> 1L, "p3" -> 1L),
        s"shapes after cross-graph delete: $incremental")
      StoreStats.write(store) // from-scratch rebuild = the oracle
      assert(state() == incremental,
        s"incremental $incremental != rebuild ${state()}")
    }
    val d1 = java.nio.file.Files.createTempDirectory("stats-xg").toString
    val s1 = new graft.model.GraphStore(spark, d1 + "/store")
    s1.appendDistinct(fixture, Some(Seq(g1, g2)))
    check(s1, s1.read())
    val d2 = java.nio.file.Files.createTempDirectory("stats-xgd").toString
    val s2 = new graft.model.DictQuadStore(spark, d2 + "/store")
    s2.appendDistinct(fixture)
    check(s2, s2.readEncoded())
  }

  test("dict store: delete-refresh folds in id space onto the same term-keyed artifact") {
    import org.apache.spark.sql.functions._
    import graft.sparql.StoreStats
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stats-ddel").toString
    val store = new graft.model.DictQuadStore(spark, dir + "/store")
    val g = "http://ex/g"
    def df(rows: Seq[(String, String, String)]) = rows.map { case (s, p, o) =>
      (g, s, p, o, null: String, null: String, "literal")
    }.toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    store.appendDistinct(df(Seq(
      ("urn:a", "p1", "x"), ("urn:a", "p1", "y"), ("urn:a", "p2", "z"),
      ("urn:b", "p1", "w"))))
    StoreStats.write(store)
    val del = df(Seq(("urn:a", "p1", "x"), ("urn:b", "p1", "w")))
    val pre = store.readEncoded().localCheckpoint()
    store.deleteQuads(del)
    StoreStats.refreshDelete(store, pre, del)
    val preds = StoreStats.predSummary(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(preds == Map("p1" -> 1L, "p2" -> 1L), s"preds: $preds")
    val csets = StoreStats.csetSummary(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // urn:b lost its only quad and leaves the summary entirely
    assert(csets == Map("p1,p2" -> 1L), s"csets: $csets")
  }

  test("dict-MOR store: the stats artifact rides the latest-wins encoded read") {
    // the MERGE-ON-READ dict backend reconstructs set semantics at
    // read time — StoreStats.write must see the reconstructed state,
    // not raw deltas/tombstones
    import graft.sparql.StoreStats
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stats-dmor").toString
    val store = new graft.model.DictMorStore(spark, dir + "/store")
    val g = "http://ex/g"
    def df(rows: Seq[(String, String, String)]) = rows.map { case (s, p, o) =>
      (g, s, p, o, null: String, null: String, "literal")
    }.toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    store.appendDistinct(df(Seq(
      ("urn:a", "p1", "x"), ("urn:a", "p2", "z"), ("urn:b", "p1", "w"))))
    // delete one quad THROUGH the tombstone path, then build stats:
    // the artifact must reflect the reconstructed (post-delete) state
    store.deleteQuads(df(Seq(("urn:b", "p1", "w"))))
    StoreStats.write(store)
    val preds = StoreStats.predSummary(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(preds == Map("p1" -> 1L, "p2" -> 1L), s"preds: $preds")
    val csets = StoreStats.csetSummary(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(csets == Map("p1,p2" -> 1L), s"csets: $csets")
    // and the estimator loads off the artifact with no scan
    val est = StoreStats.load(store)
    assert(est.starSubjects(Set("p1", "p2")).contains(1L))
  }

  test("stats refresh folds a delta exactly (counts) and keeps shapes consistent") {
    import org.apache.spark.sql.functions._
    import graft.sparql.StoreStats
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stats-ref").toString
    val store = new graft.model.GraphStore(spark, dir + "/store")
    val g = "http://ex/g"
    def df(rows: Seq[(String, String, String)]) = rows.map { case (s, p, o) =>
      (g, s, p, o, null: String, null: String, "literal")
    }.toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    val base = df(Seq(("urn:a", "p1", "x"), ("urn:b", "p1", "y")))
    // delta gives urn:a a SECOND predicate — its shape must migrate
    // from {p1} to {p1,p2} in the refreshed cset table
    val delta = df(Seq(("urn:a", "p2", "z"), ("urn:c", "p1", "w")))
    store.appendDistinct(base, Some(Seq(g)))
    StoreStats.write(store)
    val pre = store.read().localCheckpoint()
    store.appendDistinct(delta, Some(Seq(g)))
    StoreStats.refresh(store, pre, delta)
    val preds = StoreStats.predSummary(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(preds == Map("p1" -> 3L, "p2" -> 1L), s"merged counts: $preds")
    val csets = StoreStats.csetSummary(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(csets == Map("p1" -> 2L, "p1,p2" -> 1L),
      s"refreshed shapes: $csets")
  }
}
