package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad

/** Physical-plan assertions: the properties that make these queries
  * viable at 100 TB must be visible in the executed plan, not assumed —
  * predicate pushdown to parquet, column pruning, partition pruning on
  * the graph store, broadcast joins for dimensions, whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q06: filters are pushed to the parquet scan") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_discount"), "discount filter should reach the scan")
    assert(p.contains("l_quantity"))
  }

  test("q01: scan reads only the needed columns") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"column pruning failed: $readSchema")
  }

  test("importance weights: the per-doc scoring join broadcasts") {
    // the 256-row bucket-rate table must broadcast so the corpus-side
    // occurrence stream never shuffles for scoring (its only exchange
    // is the final per-doc aggregation)
    val p = plan("quality_importance_weights")
    assert(p.contains("BroadcastHashJoin"), p.take(900))
    assert(!p.contains("SortMergeJoin"), p.take(900))
  }

  test("temperature sampling: the rate table broadcasts, corpus pass is map-side") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"), p.take(900))
    assert(!p.contains("SortMergeJoin"), p.take(900))
  }

  test("q05: dimension joins broadcast (no shuffle for small sides)") {
    val p = plan("q05_region_nation_volume")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("q01: aggregation is whole-stage codegen'd with partial aggregates") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect() // finalize the adaptive plan (codegen appears post-AQE)
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages render as "*(n) Operator" in the final plan
    assert(p.contains("*("), p.take(600))
    assert(p.contains("HashAggregate"))
    // partial (map-side) aggregation before the shuffle
    assert(p.contains("partial_sum"), p.take(800))
  }

  test("graph store: USING-scoped reads prune partitions") {
    val store = graft.queries.Fixtures.ingestAll(spark,
      Files.createTempDirectory("plan").toString + "/quads")
    val df = store.readGraphs(Seq(graft.queries.ReferenceMappings.gLdap))
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("graph"),
      s"graph filter must be a partition filter, got: $scanLine")
    // and the quad columns are NOT filtered row-by-row for graph
    assert(df.count() > 0)
  }

  test("mapping query: constant-object pattern filters reach the scan") {
    val store = graft.queries.Fixtures.ingestAll(spark,
      Files.createTempDirectory("plan2").toString + "/quads")
    val q = graft.queries.ReferenceMappings.ldapSchool
    val df = graft.sparql.Compiler.run(q, store.readGraphs(q.usingGraphs))
    val p = df.queryExecution.executedPlan.toString
    // p = objectClass / o_value = organization must be pushed
    assert(p.contains("PushedFilters"), p.take(400))
    assert(p.contains("EqualTo(p,") || p.contains("IsNotNull(p)"), p.take(800))
  }

  test("VALUES pushdown: ground same-group VALUES become In() scan filters (r11)") {
    import spark.implicits._
    val store = new graft.model.GraphStore(spark,
      Files.createTempDirectory("valpush").toString + "/quads")
    store.append((1 to 50).map(i =>
      Quad.lit("http://g/m", s"urn:s$i", "http://ex/p", s"v$i")).toDF())
    val engine = new GraphEngine(store)
    val df = engine.select("""
      SELECT ?o WHERE {
        ?s <http://ex/p> ?o .
        VALUES ?s { <urn:s3> <urn:s7> }
      } ORDER BY ?o""")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("In(s, ["),
      s"VALUES restriction did not reach the scan:\n${p.take(1500)}")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("v3", "v7"))
  }

  test("token_vocab: top-k is TakeOrdered, not a global sort") {
    val p = plan("token_vocab")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("\nSort "), "a global Sort would materialize the " +
      "whole vocabulary ordered — top-k must stay bounded")
  }

  test("text_chunk_overlap: chunking is map-side (no key shuffle)") {
    val p = plan("text_chunk_overlap")
    // the explode-of-starts + slice/hash must not introduce a key
    // shuffle; only the presentation orderBy (range) is allowed
    assert(!p.contains("hashpartitioning"), s"unexpected key shuffle in:\n${p.take(800)}")
    assert(p.contains("Generate explode"), "per-row start sequence should explode")
  }

  test("rdf_sparql_service: the federated join is a broadcast hash join") {
    val p = plan("rdf_sparql_service")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "SERVICE must compile to an equi-join on the shared vars")
  }

  test("embed_quantize: map-side only (no shuffle exchange)") {
    val p = plan("embed_quantize")
    // allowed: the presentation orderBy (range) and the narrow-input
    // fanOut (round-robin); quantization itself must not introduce a
    // key shuffle — no hashpartitioning anywhere
    assert(!p.contains("hashpartitioning"), s"unexpected key shuffle in:\n${p.take(800)}")
  }

  test("curation_pipeline: aggregations are partial (map-side combine)") {
    val df = SparkEntry.queries("curation_pipeline")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), p.take(800))
  }

  test("q27 as-of join: one key shuffle, no nested-loop probe") {
    val p = plan("q27_events_asof")
    val hashEx = p.linesIterator.count(_.contains("hashpartitioning"))
    assert(hashEx == 1, s"as-of must shuffle once on user_id:\n${p.take(900)}")
    assert(!p.contains("NestedLoop"), "carry-forward window, not a probe join")
  }

  test("q28 range join: small interval side broadcasts") {
    val p = plan("q28_price_band_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("embed_neardup: banded equi-join candidates, no all-pairs NLJ") {
    val df = SparkEntry.queries("embed_neardup")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.take(900))
    // the vector join-back may broadcast-HASH (equi); what must never
    // appear is a nested-loop pair scan over the full base
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(900))
  }

  test("embed_neardup large config: verify join never broadcasts the base") {
    // the 100-TB path: with the broadcast gate off, candidate verify
    // must shuffle-join the vectors on vec_id — no copy of the full
    // embedding table may ever be built on one executor
    graft.ops.Similarity.clearCaches()
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.lsh.verifyBroadcast", "off")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("embed_neardup")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"full-base broadcast in large-config verify plan:\n${p.take(900)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(900))
      // and the result is the same pairs the broadcast path produces
      assert(df.count() == SparkEntry.queries("embed_neardup_bruteforce")(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.graft.lsh.verifyBroadcast", "auto")
      graft.ops.Similarity.clearCaches()
    }
  }

  test("flatten streams: no collect-driven stages in the quad pipeline") {
    import spark.implicits._
    val df = Seq("""{"a":1}""").toDF("json")
    val quads = graft.ingest.JsonFlattener.flatten(df, "json", "g")
    // mapPartitions shows as a (De)SerializeFromObject + MapPartitions
    val p = quads.queryExecution.executedPlan.toString
    assert(p.contains("MapPartitions"))
  }
}
