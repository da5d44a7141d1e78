package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the EXECUTED (post-AQE) physical plan of each headline query to
  * `PLANS.md` — the artifact that shows the scale-critical properties
  * (pushed filters, pruned columns, broadcast joins, single-shuffle
  * windows, whole-stage codegen spans) rather than claiming them.
  * Regenerate with: `sbt "runMain graft.Plans [sfDir]"`.
  */
object Plans {
  // query -> the plan property a reviewer should look for
  private val headline: Seq[(String, String)] = Seq(
    "q01_pricing_summary" ->
      ("ReadSchema keeps 4 of 10 lineitem columns; partial_sum before the " +
        "single exchange; the whole agg pipeline is one codegen span."),
    "q03_revenue_by_customer" ->
      ("customer joins as BroadcastHashJoin (dimension side), lineitem->" +
        "orders shuffles once on the join key; TakeOrderedAndProject " +
        "instead of a global sort for the top-k."),
    "q06_forecast_revenue" ->
      "every predicate reaches the scan: PushedFilters on quantity/discount.",
    "q27_events_asof" ->
      ("the as-of join is ONE hashpartitioning(user_id) exchange + one " +
        "Window with a carry-forward last() — no range cross-join, no " +
        "per-row probe."),
    "q28_price_band_join" ->
      ("the interval dimension broadcasts (BroadcastNestedLoopJoin) — " +
        "the 600k-row fact side never shuffles."),
    "q29_window_suite" ->
      ("lag/lead/ntile/percent_rank/first share one " +
        "hashpartitioning(o_custkey) exchange despite landing in " +
        "frame-specific Window operators."),
    "q36_rolling_range" ->
      ("the RANGE-frame rolling sum is one hashpartitioning(user_id) " +
        "exchange + one Window over integer-microsecond bounds; the " +
        "exact DECIMAL sum leaves the operator as BIGINT cents, so " +
        "nothing decimal crosses the output boundary."),
    "q25_approx_distinct" ->
      ("the KMV sketch is ONE ObjectHashAggregate with map-side " +
        "partial sketches (k-long sorted buffers merging at the " +
        "exchange) — no NDV-sized distinct shuffle, no window; the " +
        "estimate is a scalar projection of the final buffer."),
    "corpus_percentiles_approx" ->
      ("the log-quantized histogram groupBy reduces the corpus to a " +
        "few hundred (lang, bin) rows map-side; both Window passes and " +
        "the rank tests run over histogram-sized data — the corpus is " +
        "touched exactly once."),
    "text_decontaminate" ->
      ("the eval-set shingles broadcast; the corpus side is scan + " +
        "explode + BroadcastHashJoin + partial count — no corpus shuffle " +
        "before the per-doc aggregation."),
    "dedup_minhash_lsh" ->
      ("candidate generation self-joins on (band, bandHash) — exchanges " +
        "carry 16 band rows/doc, never all-pairs; the exact-Jaccard " +
        "verify only touches candidate pairs."),
    "embed_neardup" ->
      ("near-dup candidates come from a (band, sig) EQUI-join over the " +
        "packed-signature explode — no CartesianProduct/NLJ over the " +
        "base; the first-shared-band bit filter makes emission " +
        "exactly-once with no pair-level distinct exchange; vectors " +
        "join back per-id (hash join, broadcast at this scale)."),
    "rdf_sparql_groupby" ->
      ("SPARQL aggregate SELECT: groupBy over the BGP join compiles to " +
        "partial_count/partial_avg map-side, one exchange on the group " +
        "key, HAVING as a post-agg Filter."),
    "ann_bruteforce_topk" ->
      ("probe vectors broadcast; per-partition TakeOrdered before the " +
        "final top-k merge — the corpus is read once, shuffled never."),
    "rdf_sparql_select" ->
      ("SPARQL SELECT: FROM becomes a partition-pruned store read " +
        "(PartitionFilters on graph=), the BGP self-join keys on the " +
        "subject, and ORDER BY ?etype ?uid LIMIT 100 collapses to " +
        "TakeOrderedAndProject."),
    "rdf_dict_sparql" ->
      ("ID-SPACE ENGINE MODE (round 10): the same SPARQL text over the " +
        "dict-encoded store. Look for (a) the encoded scans reading " +
        "ReadSchema struct<s_id:bigint,p_id:bigint,o_id:bigint> with " +
        "PushedFilters EqualTo(p_id,<const>)/EqualTo(o_id,<const>) — " +
        "query constants became one plan-time dictionary lookup each; " +
        "(b) every BGP exchange hashpartitioning on a bigint id column " +
        "(8-byte shuffle rows where the string engine moves 50–200-byte " +
        "IRIs — DictShuffleProbe measured the 1.6–3.3× shuffle-byte " +
        "win); (c) the dictionary decode joins sitting at the pattern-" +
        "block boundary — ABOVE every BGP exchange, so they are block-" +
        "result-sized and no term string enters an intermediate join " +
        "shuffle; the EXISTS semi-join and the aggregation run over the " +
        "decoded bindings above them. Since round 11 COUNT(?e) consumes " +
        "the RAW id column — exactly ONE dict decode join (?u) in the " +
        "whole plan; the vocabulary-sized decode broadcast for the " +
        "aggregate-only var is gone (round-10 verdict #4)."),
    "text_chunk_overlap" ->
      ("context-window chunking is map-side: scan → Generate explode of " +
        "the per-row start sequence → slice/hash projection — no " +
        "hashpartitioning before the presentation sort, so at 100 TB " +
        "the stage is embarrassingly parallel and output-bounded by " +
        "the W/S duplication factor."),
    "ann_ivfpq_persisted" ->
      ("the persisted index search scans the RELOADED cell-partitioned " +
        "parquet: `cell` is a partition column, so a probe's cell " +
        "equi-join prunes directories on disk before any vector math, " +
        "and the scanned rows are 8-byte PQ codes, not dim x 8-byte " +
        "vectors — the two bandwidth wins a 100 TB index exists for."),
    "rdf_sparql_service" ->
      ("SERVICE federation, Spark-first: the registered endpoint " +
        "dataset meets the event-store scan in a BroadcastHashJoin — " +
        "AQE builds whichever side is smaller at runtime — so the " +
        "federated pattern is data-local distributed work, not " +
        "per-binding HTTP through the driver; two big datasets would " +
        "flip to a shuffle join unchanged."),
    "rdf_store_mor" ->
      ("merge-on-read reconstruction is ONE hash aggregation on the " +
        "quad identity (max_by over batch_id) — partial aggregation " +
        "runs map-side per delta file; no window sort."),
    "corpus_source_cap" ->
      ("exact per-source top-k without whole-partition sorts: the " +
        "boundary-bucket table broadcasts, whole buckets pass through a " +
        "filter, and the row_number Window sorts only the boundary " +
        "bucket's rows (~n/256 of a hot source)."),
    "rdf_sparql_path_neg" ->
      ("negated property set: a variable-predicate store scan with the " +
        "NOT IN exclusion pushed into the scan filter; the mixed-set " +
        "inverse branch is a second scan unioned, not a vocabulary " +
        "enumeration."),
    "rdf_sparql_path_closure" ->
      ("`+` closure scale envelope: SPARQL semantics require the " +
        "transitive-closure PAIR SET itself (ALP §18.4), so for " +
        "variable-variable paths the result size — not the algorithm — " +
        "is the scale bound: Θ(nodes × avg-reachability), built by pair " +
        "doubling (diameter D in ⌈log₂D⌉ rounds, bounded 20, one " +
        "equi-join shuffle + distinct per round over checkpointed " +
        "RDDs). A CONSTANT endpoint — this query's `nation:0 knows+ " +
        "?x`, and the common shape in practice — switches to SEEDED " +
        "BFS (round-6): every round joins a shrinking frontier against " +
        "the edge set and the full pair set never materializes, so the " +
        "cost is O(reach(seed)) even on a dense 100 TB graph " +
        "(diameter-bounded 64 rounds). Envelope for the var-var case: " +
        "hierarchy/forest graphs give pairs ≈ nodes × depth — " +
        "comfortably linear; a dense scale-free component gives Θ(n²) " +
        "pairs, which no evaluator can avoid while honoring set " +
        "semantics. AQE interaction: each round is its own job over a " +
        "checkpointed RDD with EXACT size stats, so AQE picks " +
        "broadcast-hash when the frontier is small and splits " +
        "hub-skewed _dst partitions via skew-join handling when one " +
        "node dominates."),
    "rdf_sparql_path_star" ->
      ("`*` adds the zero-length identity domain: one distinct over the " +
        "scoped graph's term structs unioned under the closure — no " +
        "extra join rounds; inside GRAPH ?g the identity pairs carry " +
        "the graph column so per-graph semantics survive (round-6 fix)."),
    "rdf_sparql_path_seeded" ->
      ("var-var closure with a sibling-bound endpoint (round 8): ?s is " +
        "bound by the <tag> pattern compiled first, so the closure runs " +
        "the MULTI-SOURCE seeded BFS from that DISTINCT binding set — " +
        "each round joins a shrinking (origin, frontier) relation " +
        "against the edge set, the origin column rides the hops, and " +
        "the full transitive pair set never materializes. Pair doubling " +
        "(the Θ(pairs) shape above) now remains ONLY for closures with " +
        "no bound end, where the pair set IS the answer. Cost drops to " +
        "O(Σ reach(seed)) — on a 100 TB graph with a selective sibling " +
        "pattern this is the difference between touching the seeds' " +
        "neighborhoods and materializing the graph's closure."),
    "text_decontaminate_bloom" ->
      ("the Bloom filter arrives as a scalar subquery (Subquery over the " +
        "eval-shingle bloom_filter_agg); might_contain filters corpus " +
        "shingles in the SCAN-side codegen span, before the exact-verify " +
        "join — the join's probe side is true-hits + FPR·corpus, not " +
        "every corpus shingle."),
    "rdf_sparql_datetime" ->
      ("all eight §17.4.5 accessors + SHA256 compile to one " +
        "regexp_extract/sha2 projection inside the BGP join's codegen " +
        "span — no UDFs, no second pass over the store scan."),
    "ann_pq_rerank" ->
      ("the ADC scan reads 8-byte PQ codes, never the wide embedding " +
        "arrays — reconstruction is element_at over codebook literals " +
        "inside the codegen span; only the 50 ADC survivors per query " +
        "join the true vectors back for exact re-ranking."),
    "rdf_dict_bgp_join" ->
      ("dictionary-encoded BGP: every join between the constant probes, " +
        "the user-edge self-join and the intersect carries (s_id, o_id) " +
        "LONGS — term strings appear in exactly two places, the " +
        "dictionary build and the final single-row-per-user decode " +
        "join. At 100 TB the shuffle bytes of the whole join tree drop " +
        "by the average-term-length factor (~10-20x for IRIs); the " +
        "dictionary itself is built once per corpus with a distributed " +
        "sort + zipWithIndex, no single-partition window."),
    "rdf_sparql_stats_join" ->
      ("cost-based BGP ordering: the engine's CardEstimator (one " +
        "vocabulary-sized aggregate) anchors the join tree on the " +
        "'error' probe (~20x rarer than 'purchase'), so every " +
        "subsequent join's build side is error-sized — Catalyst never " +
        "reorders the compiler's joins, so this decision must happen " +
        "at compile time and now follows data, not syntax."),
    "dedup_incremental" ->
      ("cross-snapshot dedup: the band join's left side is the 20% " +
        "incoming batch only — the base corpus contributes its band " +
        "index but never self-joins, so candidate volume scales with " +
        "the batch. At production scale the base bands are a persisted " +
        "artifact (the ann_ivfpq_persisted pattern) and the increment " +
        "is the only thing shingled per run."),
    "ann_ivfpq_bucketed" ->
      ("IVFADC composed: the cell equi-join prunes the scan to the " +
        "query's probed cells BEFORE any vector math, the pruned rows " +
        "are PQ codes (8 bytes), and exact vectors appear only in the " +
        "top-100 re-rank join — at cluster scale the cell column is " +
        "the partition key, so this is partition pruning over a " +
        "compressed index."),
    "rdfs_entailment_types" ->
      ("RDFS materialization: every closure (subClassOf/subPropertyOf) " +
        "joins as a BroadcastHashJoin build side — the schema frame is " +
        "vocabulary-sized — so the instance data flows through ONE " +
        "map-side pass per rule family and the only instance-sized " +
        "exchange is the final distinct. No iterative join over " +
        "instance rows anywhere in the plan."),
    "rdf_mapping_refresh" ->
      ("non-monotone incremental maintenance: the GRAPH <delta> anchor " +
        "pattern is batch-sized, so AQE broadcasts it against the " +
        "staging scan; the target-graph retraction rides the same " +
        "binding frame. Shuffle volume tracks the delta " +
        "(InferenceScaleProbe measures it flat as the base corpus " +
        "grows 10x), while the base contributes a map-side pruned " +
        "scan only."),
    "rdf_char_sets" ->
      ("characteristic sets: one subject-keyed partial_agg exchange " +
        "(collect_set over p), then a set-key aggregation whose " +
        "cardinality is the number of structural SHAPES, not subjects " +
        "— the second exchange is schema-sized at any corpus scale."),
    "text_classify_nb" ->
      ("Naive Bayes train+predict in one plan: model counts partial-" +
        "aggregate before their exchanges; the class fan-out multiplies " +
        "only the per-document DISTINCT-term rows (|classes| x doc " +
        "vocab, never the corpus token stream); priors/vocab join as " +
        "1-row broadcasts; the argmax is a per-doc window, partitioned " +
        "on doc_id — no global sort."),
    "owl_incremental_closure" ->
      ("semi-naive incremental closure: the base closure appears only " +
        "as a join INPUT (the C?·delta·C? seed — three joins whose " +
        "build side is the batch-sized delta), never inside the " +
        "doubling loop; the loop iterates on the delta-path set alone, " +
        "so absorbing a batch costs O(delta·reach) while the full " +
        "closure is only ever computed once."),
    "q34_skew_salted_join" ->
      ("salted skew join: the exchange keys are (k, _salt), so the 70%-" +
        "hot key spreads over 16 sub-partitions instead of one " +
        "straggler task; the replicated dim side stays " +
        "keys-x-16 rows — at cluster scale this is the difference " +
        "between one executor owning 70% of the shuffle and even " +
        "distribution."),
    "retrieval_bm25_topk" ->
      ("SERVED FROM THE PERSISTED POSTINGS INDEX: the scan reads the " +
        "term-bucketed parquet layout (bucket partition column in the " +
        "scan; dynamicpruningexpression on bucket when DPP fires) with " +
        "tf derived from the positions list; df comes from the summed " +
        "vocab-sized per-ingest dictionaries, and the df>0.9N " +
        "stop-term prune now lands on the QUERY side before any " +
        "postings row is read — everywhere-words never reach the " +
        "scoring join (RetrievalScaleProbe: capped join rows linear " +
        "under a planted stop word)."),
    "retrieval_index_append" ->
      ("incremental index append: base+batch ingests are separate " +
        "parquet subtrees (the scan unions ingest= partitions); " +
        "NOTHING existing is rewritten on append, and serving is " +
        "byte-identical to a full rebuild (same oracle as " +
        "retrieval_bm25_topk)."),
    "retrieval_hybrid_rrf" ->
      ("the dense side is SERVED FROM THE PERSISTED IVFADC INDEX: the " +
        "scan reads the cell-partitioned code files with the probe " +
        "cells as a partition filter (cell IN ...: probes/cells of the " +
        "directories, 8-byte codes not raw vectors) — the former " +
        "broadcast-NLJ exact-cosine pass over the whole corpus is now " +
        "only the retrieval_dense_recall audit; fusion joins two " +
        "top-20 lists, bounded by queries x 2k rows at any corpus " +
        "size."),
    "q35_bucketed_join" ->
      ("both fact tables are bucketed+sorted on the join key, so the " +
        "SortMergeJoin reads the bucket layout directly — NO Exchange " +
        "on either join side (the only exchange is the final tiny " +
        "groupBy); the bucket write paid the shuffle once, every " +
        "subsequent orders-lineitem join rides it."),
    "corpus_shards" ->
      ("two-phase distributed prefix sum: the window's partitioning " +
        "column is the order-aligned coarse bucket, so the Sort under " +
        "the Window is bucket-sized (64 partitions), never one global " +
        "sorted partition; the offsets side enters as a " +
        "BroadcastHashJoin of a 64-row table."),
    "layout_zorder" ->
      ("the z-key is pure shift/mask projection inside one codegen " +
        "span; the only exchange is the RangePartitioning on z that IS " +
        "the layout write; the read-back scan shows PushedFilters on " +
        "tsu — at lakehouse scale the per-file min/max boxes this " +
        "query measures are what the table format would prune with."),
    "rdf_store_cdc" ->
      ("the change feed is O(window): the window's touched identities " +
        "enter as the BUILD side of a BroadcastHashJoin LeftSemi over " +
        "the delta scan — the store history is pruned map-side, no " +
        "corpus shuffle, and both endpoint-state aggregations run over " +
        "touched keys only (window-sized exchanges)."),
    "dedup_suffix_repeats" ->
      ("one RangePartitioning exchange on the depth-capped suffix key " +
        "IS the suffix sort (memoized per corpus as a stored artifact " +
        "since r13 — a suffix array is maintained, not recomputed per " +
        "consumer); adjacency is a partition-local Window (lead) — no " +
        "global single-partition sort — and the LCP is the native " +
        "codegen'd token_lcp expression (r13; the zip_with+fold HOF it " +
        "replaced was 13x slower at sf3), so the only other exchange " +
        "is the final tiny repeat groupBy."),
    "layout_cluster_subjects" ->
      ("subject-clustered store maintenance (round 11): ONE range " +
        "exchange on s feeds the rewrite (RangePartitioning in the " +
        "write job); the probe read-back shows PushedFilters " +
        "EqualTo(s,<probe-iri>) on the clustered files — with disjoint " +
        "per-file s-ranges the filter opens 1 of 8 files, the gate the " +
        "query's pruned_to_one column checks from the min/max boxes."),
    "text_ref_perplexity" ->
      ("CCNet-style tercile bucketing WITHOUT a corpus window (r13; " +
        "r12's plan was ntile(3) over a SinglePartition exchange): the " +
        "per-doc aggregate is cached and read by BOTH branches — " +
        "exactly one hashpartitioning(doc_id) exchange in the plan — " +
        "the only Window is the histogram-sized cumsum over the " +
        "bounded 1e-4 value grid, and the two cut points come back as " +
        "a broadcast 1-row table (BroadcastNestedLoopJoin) bucketing " +
        "documents map-side."),
    "dedup_simhash" ->
      ("the 62-bit fingerprint is ONE native simhash64 projection per " +
        "document (r13; replaces explode + 16 packed-lane vote " +
        "aggregates + a hash join back — no token explode, no vote " +
        "shuffle); banding is a posexplode of 8 byte-chunks and the " +
        "hamming filter runs on bit_count inside the codegen span."),
    "embed_hard_negatives" ->
      ("INDEX-SERVED since round 11: candidates come from the persisted " +
        "cell-partitioned IVFADC index — look for the scan of " +
        "graft-ivfserve with the cell partition column and 8-byte code " +
        "columns (never the raw corpus per query), the broadcast of the " +
        "query vectors into the cell equi-join, the ADC top-250 window, " +
        "ONE exact re-rank join back to true vectors, and both cluster " +
        "tables entering as BroadcastHashJoins (pair-graph-node-sized) " +
        "BETWEEN the re-rank and the top-k cut."))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new StringBuilder
    out ++= "# PLANS — executed physical plans of the headline queries\n\n"
    out ++= s"Post-AQE plans at `$sfDir` (shapes are scale-independent; "
    out ++= "only partition counts change with SF). Generated by "
    out ++= "`graft.Plans`; regenerate after plan-affecting changes.\n"
    headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize adaptive plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0) // final section only
        .linesIterator.takeWhile(_ => true).toSeq
        .map(_.replaceAll("#\\d+L?", "")) // strip expr ids for readability
        .mkString("\n")
      out ++= s"\n## $name\n\n$why\n\n```\n$plan\n```\n"
    }
    Files.writeString(Paths.get("PLANS.md"), out.toString)
    println(s"wrote PLANS.md (${headline.size} queries)")
    spark.stop()
  }
}
