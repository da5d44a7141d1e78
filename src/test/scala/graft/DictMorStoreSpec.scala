package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.model.{DictMorStore, MergeOnReadStore, Quad}

/** Merge-on-read in id space ([[DictMorStore]]): O(delta) writes AND
  * id-space queries at once. The MOR semantics (latest-wins,
  * tombstones, revive, compaction + horizon, time travel) must match
  * the string-space [[MergeOnReadStore]] exactly, the engine must be
  * observably identical on both, and the pattern scans must still push
  * long constants below the latest-wins aggregation.
  */
class DictMorStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def store() = new DictMorStore(spark,
    Files.createTempDirectory("dictmor").toString + "/store")

  private def q(s: String, v: String) = Quad.lit("g", s, "http://ex/p", v)

  private def merged(st: DictMorStore): Set[(String, String)] =
    st.read().collect().map(r =>
      (r.getAs[String]("s"), r.getAs[String]("o_value"))).toSet

  test("latest batch wins: delete masks insert, later insert revives") {
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    assert(merged(st) == Set(("b", "1")))
    st.appendDelta(Seq(q("a", "1")).toDF(), 3L)
    assert(merged(st) == Set(("a", "1"), ("b", "1")))
  }

  test("tombstones allocate no dictionary ids") {
    val st = store()
    st.appendDelta(Seq(q("a", "1")).toDF(), 1L)
    val n = st.readDict().count()
    // never-seen quad: tombstone is a no-op and must not grow the dict
    st.appendDelta(Seq(q("zz", "9")).toDF(), 2L, op = "d")
    assert(st.readDict().count() == n)
    assert(merged(st) == Set(("a", "1")))
  }

  test("changesBetween matches the string backend's CDF and stays id-typed") {
    val dictSt = store()
    val strSt = new MergeOnReadStore(spark,
      Files.createTempDirectory("morcdf").toString + "/quads")
    val batches = Seq(
      (Seq(q("a", "1"), q("b", "1"), q("c", "1")), 1L, "i"),
      (Seq(q("a", "1")), 2L, "d"),
      (Seq(q("b", "1")), 3L, "i"),          // no-op re-insert: nets out
      (Seq(q("d", "1"), q("a", "2")), 4L, "i"))
    for ((qs, id, op) <- batches) {
      dictSt.appendDelta(qs.toDF(), id, op)
      strSt.appendDelta(qs.toDF(), id, op)
    }
    def rows(df: DataFrame): Set[(String, String, String)] =
      df.collect().map(r => (r.getAs[String]("s"),
        r.getAs[String]("o_value"), r.getAs[String]("change"))).toSet
    for ((f, t) <- Seq((1L, 2L), (2L, 4L), (1L, 4L)))
      assert(rows(dictSt.changesBetween(f, t)) == rows(strSt.changesBetween(f, t)),
        s"window ($f, $t]")
    // the encoded CDF carries 8-byte keys end to end (decode is last)
    val enc = dictSt.changesBetweenEncoded(1L, 4L)
    for (k <- Seq("s_id", "p_id", "o_id"))
      assert(enc.schema(k).dataType == org.apache.spark.sql.types.LongType)
    assert(rows(dictSt.changesBetween(1L, 4L)) ==
      Set(("a", "1", "delete"), ("a", "2", "insert"), ("d", "1", "insert")))
  }

  test("compact collapses history, preserves view, guards time travel") {
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    st.appendDelta(Seq(q("c", "1")).toDF(), 3L)
    val before = merged(st)
    assert(st.readAsOf(1L).collect().length == 2) // pre-delete snapshot
    st.compact("g")
    assert(merged(st) == before)
    val deltas = st.readDeltas().collect()
    assert(deltas.forall(_.getAs[Long]("batch_id") ==
      MergeOnReadStore.CompactedBatchId))
    // history folded: the pre-delete snapshot is now unreachable
    intercept[IllegalArgumentException] { st.readAsOf(1L).collect() }
    assert(st.readAsOf(3L).collect().length == before.size)
  }

  test("auto-compaction fires past the tail bound") {
    val st = store()
    (1 to 4).foreach(i => st.appendDelta(Seq(q(s"s$i", "1")).toDF(), i.toLong))
    assert(!st.compactIfNeeded("g", maxTailBatches = 8))
    assert(st.compactIfNeeded("g", maxTailBatches = 3))
    assert(merged(st).size == 4)
  }

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf).toIndexedSeq).toSeq
      .sortBy(_.mkString("|"))

  test("GraphEngine parity with the string merge-on-read backend") {
    val sEng = new GraphEngine(new MergeOnReadStore(spark,
      Files.createTempDirectory("dictmor-s").toString + "/store"))
    val dEng = new GraphEngine(store())
    val req1 = """
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:name "Alpha" . ex:a ex:knows ex:b .
        ex:b ex:name "Beta" .  ex:b ex:knows ex:c .
        ex:c ex:name "Gamma"@el . } }"""
    val req2 = """
      PREFIX ex: <http://ex/>
      WITH <http://ex/out>
      INSERT { ?s ex:label ?n }
      USING <http://ex/g>
      WHERE { ?s ex:name ?n } ;
      DELETE DATA { GRAPH <http://ex/g> { ex:b ex:name "Beta" . } }"""
    Seq(sEng, dEng).foreach { e => e.update(req1); e.update(req2) }
    val battery = Seq(
      """PREFIX ex: <http://ex/>
         SELECT ?s ?n WHERE { GRAPH <http://ex/out> { ?s ex:label ?n } }
         ORDER BY ?s""",
      """PREFIX ex: <http://ex/>
         SELECT ?x WHERE { ex:a ex:knows+ ?x } ORDER BY ?x""",
      """PREFIX ex: <http://ex/>
         SELECT ?s ?o WHERE {
           ?s ex:knows ?o . OPTIONAL { ?o ex:name ?n }
         } ORDER BY ?s""")
    battery.foreach { qy =>
      assert(rows(sEng.select(qy)) == rows(dEng.select(qy)),
        s"diverged on:\n$qy")
    }
    assert(rows(sEng.store.read()) == rows(dEng.store.read()))
  }

  test("snapshot store: historical SPARQL in id space, read-only") {
    val st = store()
    val g = "http://ex/g"
    st.appendDelta(Seq(
      Quad.lit(g, "http://ex/a", "http://ex/name", "A1")).toDF(), 1L)
    st.appendDelta(Seq(
      Quad.lit(g, "http://ex/a", "http://ex/name", "A1")).toDF(), 2L, op = "d")
    st.appendDelta(Seq(
      Quad.lit(g, "http://ex/a", "http://ex/name", "A2")).toDF(), 3L)
    val q = """SELECT ?n WHERE { <http://ex/a> <http://ex/name> ?n }"""
    def names(e: GraphEngine) =
      e.select(q).collect().map(_.getString(0)).toSet
    assert(names(new GraphEngine(st)) == Set("A2"))
    assert(names(new GraphEngine(
      new graft.model.DictSnapshotStore(st, 1L))) == Set("A1"))
    assert(names(new GraphEngine(
      new graft.model.DictSnapshotStore(st, 2L))) == Set.empty)
    intercept[UnsupportedOperationException] {
      new graft.model.DictSnapshotStore(st, 1L).insertData(Seq(q2("x", "1")))
    }
  }
  private def q2(s: String, v: String) = Quad.lit("g", s, "http://ex/p", v)

  test("vacuum keeps history-referenced terms, drops cleared graphs'") {
    val st = store()
    st.appendDelta(Seq(q("a", "tombstoned-later")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "tombstoned-later")).toDF(), 2L, op = "d")
    st.appendDelta(Seq(
      Quad.lit("gone", "http://ex/x", "http://ex/q", "orphan")).toDF(), 3L)
    st.clearGraph("gone")
    val removed = st.vacuumDictionary()
    // the cleared graph's private terms go; the tombstoned value stays
    // (its delta rows still exist for time travel)
    assert(removed > 0)
    val terms = st.readDict().select("term").collect().map(_.getString(0)).toSet
    assert(!terms.contains("\"orphan\""))
    assert(terms.contains("\"tombstoned-later\""))
    assert(st.readAsOf(1L).collect().map(_.getAs[String]("o_value")).toSet ==
      Set("tombstoned-later"))
  }

  test("pattern constants push below the latest-wins aggregation") {
    val st = store()
    st.appendDelta(Seq(
      Quad.iri("g", "http://ex/a", "http://ex/knows", "http://ex/b"),
      Quad.lit("g", "http://ex/a", "http://ex/name", "A")).toDF(), 1L)
    val dEng = new GraphEngine(st)
    val plan = dEng.select("""
      SELECT ?s ?o WHERE { ?s <http://ex/knows> ?o }""")
      .queryExecution.executedPlan.toString
    // the long constant reaches the delta scans (alongside the MOR
    // machinery's own batch_id/op predicates — order varies)
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(p_id,".r
      .findFirstIn(plan).isDefined,
      s"p_id constant did not reach the delta scan:\n$plan")
  }
}
