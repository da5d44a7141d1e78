package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{MergeOnReadStore, Quad}

/** Merge-on-read store semantics: latest-batch-wins per quad identity,
  * tombstones, revive-after-delete, exact-dup collapse, and compaction
  * preserving the merged view while collapsing history.
  */
class MorStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def store() = new MergeOnReadStore(spark,
    Files.createTempDirectory("mor").toString + "/quads")

  private def q(s: String, v: String) = Quad.lit("g", s, "http://ex/p", v)

  private def merged(st: MergeOnReadStore): Set[(String, String)] =
    st.readMerged().collect().map(r =>
      (r.getAs[String]("s"), r.getAs[String]("o_value"))).toSet

  test("latest batch wins: delete masks insert, later insert revives") {
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    assert(merged(st) == Set(("b", "1")))
    st.appendDelta(Seq(q("a", "1")).toDF(), 3L)
    assert(merged(st) == Set(("a", "1"), ("b", "1")))
  }

  test("identical re-inserts collapse; distinct o_value is a new identity") {
    val st = store()
    st.appendDelta(Seq(q("a", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1"), q("a", "2")).toDF(), 2L)
    assert(st.readMerged().count() == 2)
    assert(merged(st) == Set(("a", "1"), ("a", "2")))
  }

  test("tombstone of a never-inserted quad stays absent") {
    val st = store()
    st.appendDelta(Seq(q("a", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("zz", "9")).toDF(), 2L, op = "d")
    assert(merged(st) == Set(("a", "1")))
  }

  test("changesBetween nets window writes against both snapshot endpoints") {
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1"), q("c", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")     // delete a
    st.appendDelta(Seq(q("b", "1")).toDF(), 3L)               // no-op re-insert
    st.appendDelta(Seq(q("d", "1")).toDF(), 4L)               // new insert
    st.appendDelta(Seq(q("e", "1")).toDF(), 5L)
    st.appendDelta(Seq(q("e", "1")).toDF(), 6L, op = "d")     // insert+delete cancels
    def cdc(f: Long, t: Long): Set[(String, String)] =
      st.changesBetween(f, t).collect().map(r =>
        (r.getAs[String]("s"), r.getAs[String]("change"))).toSet
    // the live re-insert of b and the cancelled e must NOT appear
    assert(cdc(1L, 6L) == Set(("a", "delete"), ("d", "insert")))
    // CDF ≡ snapshot diff, both directions, on every window
    for ((f, t) <- Seq((1L, 3L), (2L, 5L), (1L, 6L))) {
      val before = st.readAsOf(f).collect().map(_.getAs[String]("s")).toSet
      val after = st.readAsOf(t).collect().map(_.getAs[String]("s")).toSet
      val changes = cdc(f, t)
      assert(changes.filter(_._2 == "insert").map(_._1) == (after -- before))
      assert(changes.filter(_._2 == "delete").map(_._1) == (before -- after))
    }
    // empty window nets nothing
    assert(cdc(6L, 6L).isEmpty)
  }

  test("CDF fold maintains an aggregate exactly: base(v) + changes == recompute") {
    import org.apache.spark.sql.functions._
    val st = store()
    st.appendDelta(Seq(q("a", "x1"), q("b", "x2"), q("c", "y1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "x1")).toDF(), 2L, op = "d")
    st.appendDelta(Seq(q("d", "y2"), q("a", "z9")).toDF(), 3L)
    st.appendDelta(Seq(q("c", "y1")).toDF(), 4L, op = "d")
    def hist(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy(substring(col("o_value"), 1, 1).as("k"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((f, t) <- Seq((1L, 3L), (2L, 4L), (1L, 4L))) {
      val base = hist(st.readAsOf(f))
      val deltas = st.changesBetween(f, t).collect()
        .groupBy(_.getAs[String]("o_value").take(1))
        .view.mapValues(_.map(r =>
          if (r.getAs[String]("change") == "insert") 1L else -1L).sum).toMap
      val folded = (base.keySet ++ deltas.keySet).map(k =>
        k -> (base.getOrElse(k, 0L) + deltas.getOrElse(k, 0L)))
        .filter(_._2 > 0).toMap
      assert(folded == hist(st.readAsOf(t)), s"window ($f, $t]")
    }
  }

  test("changesBetween broadcast-semi-joins the touched identities (O(window) plan)") {
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    val plan = st.changesBetween(1L, 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast semi-join pruning history to touched keys:\n$plan")
  }

  test("changesBetween rejects a baseline older than the compaction horizon") {
    val st = store()
    st.appendDelta(Seq(q("a", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("b", "1")).toDF(), 2L)
    st.compact("g")
    st.appendDelta(Seq(q("c", "1")).toDF(), 3L)
    val e = intercept[IllegalArgumentException](st.changesBetween(1L, 3L).collect())
    assert(e.getMessage.contains("unreachable"))
    // at-or-past the horizon still works
    assert(st.changesBetween(2L, 3L).collect().map(_.getAs[String]("s")).toSet == Set("c"))
  }

  test("compact collapses history but preserves the merged view") {
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    st.appendDelta(Seq(q("c", "1")).toDF(), 3L)
    val before = merged(st)
    st.compact("g")
    assert(merged(st) == before)
    // history gone: every surviving delta row is the reserved
    // compacted pseudo-batch (read-optimized base, skips latest-wins)
    val deltas = st.readDeltas().collect()
    assert(deltas.forall(r => r.getAs[Long]("batch_id") ==
      graft.model.MergeOnReadStore.CompactedBatchId))
    assert(deltas.length == before.size)
  }

  test("GraphEngine runs unchanged on the merge-on-read backend") {
    val st = store()
    val engine = new GraphEngine(st)
    engine.update("""
      PREFIX ex: <http://ex/>
      INSERT DATA { GRAPH <http://ex/g> {
        ex:a ex:name "Alpha" . ex:b ex:name "Beta" . ex:b ex:name "Beta2" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      DELETE DATA { GRAPH <http://ex/g> { ex:b ex:name "Beta2" . } }""")
    engine.update("""
      PREFIX ex: <http://ex/>
      WITH <http://ex/out>
      INSERT { ?s ex:label ?n }
      USING <http://ex/g>
      WHERE { ?s ex:name ?n }""")
    // tombstone masked Beta2 before the mapping ran
    assert(st.countGraph("http://ex/out") == 2)
    val names = engine.select("""
      PREFIX ex: <http://ex/>
      SELECT ?n FROM <http://ex/out>
      WHERE { ?s ex:label ?n } ORDER BY ?n""").collect().map(_.getString(0))
    assert(names.toSeq == Seq("Alpha", "Beta"))
    engine.update("CLEAR SILENT GRAPH <http://ex/out>")
    assert(st.countGraph("http://ex/out") == 0)
    // CLEAR NAMED resolves against the live graph list on this backend
    // too (graphNames is a partition-dir listing); the default graph
    // survives, the named one goes
    engine.update("""
      INSERT DATA { <http://ex/d> <http://ex/p> "def" .
        GRAPH <http://ex/n1> { <http://ex/x> <http://ex/p> "named" } }""")
    engine.update("CLEAR NAMED")
    assert(st.countGraph("http://ex/n1") == 0)
    assert(st.countGraph(graft.model.Quad.DefaultGraph) == 1)
    engine.update("CLEAR ALL")
    assert(st.read().count() == 0)
  }

  test("the full reference mapping pipeline is backend-equivalent") {
    import graft.queries.{Fixtures, ReferenceMappings}
    def orgQuads(st: graft.model.QuadStore): Set[String] = {
      val p = new graft.pipeline.Pipeline(st)
      p.runMappings()
      st.readGraphs(Seq(ReferenceMappings.gOrganizations)).collect()
        .map(r => (0 until 7).map(i => String.valueOf(r.get(i))).mkString("|"))
        .toSet
    }
    val mow = orgQuads(Fixtures.ingestAll(spark,
      Files.createTempDirectory("pmow").toString + "/quads"))
    val mor = orgQuads(Fixtures.ingestAllInto(new MergeOnReadStore(spark,
      Files.createTempDirectory("pmor").toString + "/quads")))
    assert(mor == mow)
    assert(mow.nonEmpty)
  }

  test("null object-type fields are part of the quad identity (null-safe)") {
    val st = store()
    val plain = Quad.lit("g", "s", "p", "v")           // o_type = null
    val typed = Quad.typed("g", "s", "p", "v", Quad.xsd.integer)
    st.appendDelta(Seq(plain, typed).toDF(), 1L)
    st.appendDelta(Seq(plain).toDF(), 2L, op = "d")
    val left = st.readMerged().collect()
    assert(left.length == 1 && left.head.getAs[String]("o_type") == Quad.xsd.integer)
  }
  test("delete + re-insert AFTER compaction (null-key anti-join regression)") {
    // Plain literals have null o_type/o_lang — the dominant quad shape.
    // A null-unsafe base-vs-tail anti-join never matches those keys, so
    // a post-compaction tombstone would be silently ignored and a
    // re-insert would duplicate the base row.
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "1"), q("c", "1")).toDF(), 1L)
    st.compact("g")
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    assert(merged(st) == Set(("b", "1"), ("c", "1")), "post-compact tombstone must take effect")
    st.appendDelta(Seq(q("b", "1")).toDF(), 3L) // re-insert an existing base quad
    assert(st.readMerged().count() == 2, "re-insert must not duplicate the base row")
    assert(merged(st) == Set(("b", "1"), ("c", "1")))
    st.appendDelta(Seq(q("a", "1")).toDF(), 4L) // revive the tombstoned quad
    assert(merged(st) == Set(("a", "1"), ("b", "1"), ("c", "1")))
  }

  test("readAsOf rejects snapshots older than the compaction horizon") {
    val st = store()
    st.appendDelta(Seq(q("a", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("b", "1")).toDF(), 2L)
    st.compact("g")
    st.appendDelta(Seq(q("c", "1")).toDF(), 3L)
    assert(st.compactionHorizon().contains(2L))
    // at/after the horizon: base + tail replay correctly
    assert(st.readAsOf(2L).count() == 2)
    assert(st.readAsOf(3L).count() == 3)
    // before the horizon: loud rejection, never silently-stale data
    intercept[IllegalArgumentException] { st.readAsOf(1L) }
    intercept[IllegalArgumentException] {
      new graft.model.SnapshotStore(st, 1L).read().count()
    }
  }

  test("compactIfNeeded fires only past the tail-batch threshold") {
    val st = store()
    st.appendDelta(Seq(q("a", "1")).toDF(), 1L)
    st.appendDelta(Seq(q("b", "1")).toDF(), 2L)
    assert(!st.compactIfNeeded("g", maxTailBatches = 2))
    st.appendDelta(Seq(q("a", "1")).toDF(), 3L, op = "d")
    val before = merged(st)
    // the read-amplification measurement the policy exists for: the
    // pre-compaction scan reads one-plus files per tail batch, the
    // post-compaction scan reads the single-file base
    val filesBefore = st.readDeltas().inputFiles.length
    assert(st.compactIfNeeded("g", maxTailBatches = 2))
    assert(merged(st) == before, "auto-compaction preserves the merged view")
    assert(st.readDeltas().inputFiles.length < filesBefore,
      "compaction must shrink the file count the merged read scans")
    val deltas = st.readDeltas().collect()
    assert(deltas.forall(_.getAs[Long]("batch_id") ==
      graft.model.MergeOnReadStore.CompactedBatchId))
  }

  test("snapshot store serves SPARQL read-only; mutations rejected") {
    import spark.implicits._
    val st = store()
    st.appendDelta(Seq(q("a", "1"), q("b", "2")).toDF(), 1L)
    st.appendDelta(Seq(q("a", "1")).toDF(), 2L, op = "d")
    val snap1 = new graft.model.SnapshotStore(st, 1L)
    val snap2 = new graft.model.SnapshotStore(st, 2L)
    val engine1 = new GraphEngine(snap1)
    val engine2 = new GraphEngine(snap2)
    val sel =
      """SELECT ?s WHERE { GRAPH <g> { ?s <http://ex/p> ?o } } ORDER BY ?s"""
    assert(engine1.select(sel).collect().map(_.getString(0)).toSeq ==
      Seq("a", "b"))
    assert(engine2.select(sel).collect().map(_.getString(0)).toSeq ==
      Seq("b"))
    intercept[UnsupportedOperationException] {
      engine1.update("""INSERT DATA { GRAPH <g> { <x> <p> "v" } }""")
    }
  }
}
