package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Iterative graph analytics over edge DataFrames — the Pregel-style
  * compute pattern (message = join, combine = groupBy-agg, superstep =
  * driver loop with lineage truncation). Complements the min-label
  * connected components in [[Dedup.clusterAssign]].
  */
object GraphAlgos {

  /** Uniform-init PageRank: rank_{k+1}(v) = reset + damping *
    * Σ_{u→v} rank_k(u)/outdeg(u), run for a fixed iteration count.
    *
    * Each superstep is one equi-join (edges ⨝ ranks on src) plus one
    * aggregation on dst — both shuffle on node id, so a round costs two
    * hash shuffles of O(|E|) and O(|V|) rows regardless of scale.
    * `localCheckpoint` per round keeps the plan flat (the iterative-
    * DataFrame lineage pitfall). Nodes with no in-edges drop out after
    * round one (rank = reset exactly); feed undirected graphs (both
    * edge directions) when every node must keep a rank.
    *
    * `reset` and `damping` are taken as separate literals, not derived
    * (1 - 0.85 in doubles is 0.15000000000000002 — not the same double
    * an engine parses from "0.15", and cross-engine parity needs the
    * exact literal). */
  def pagerank(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      reset: Double = 0.15): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src").localCheckpoint()
    var ranks = e.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
      ranks = contribs.groupBy(col("node"))
        .agg((lit(reset) + lit(damping) * sum(col("c"))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- PageRank over the undirected user↔event-type bipartite graph
    // (3 supersteps): event types concentrating many users rank high,
    // users touching many types rank above single-type users
    "graph_pagerank" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(concat(lit("u:"), col("user_id")).as("u"),
          concat(lit("t:"), col("event_type")).as("t"))
        .distinct()
      val edges = ev.select(col("u").as("src"), col("t").as("dst"))
        .unionAll(ev.select(col("t").as("src"), col("u").as("dst")))
      pagerank(edges, iters = 3)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }),

    // ---- multi-source BFS shortest hops (3 levels) over the same
    // bipartite graph: level-synchronous frontier expansion — each
    // superstep is one frontier ⨝ edges equi-join (shuffles on node id)
    // plus an anti-join against the visited set, so a node's first
    // discovery level IS its hop distance and no node re-expands. The
    // visited set is the only state that grows; at cluster scale both
    // sides of every join are hash-partitioned by node and the frontier
    // stays bounded by the per-level reach. The oracle recomputes the
    // same distances with a recursive CTE + min(dist).
    "graph_bfs_hops" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(concat(lit("u:"), col("user_id")).as("u"),
          concat(lit("t:"), col("event_type")).as("t"),
          col("user_id"))
        .distinct()
      val edges = ev.select(col("u").as("src"), col("t").as("dst"))
        .unionAll(ev.select(col("t").as("src"), col("u").as("dst")))
        .distinct().localCheckpoint()
      val seeds = ev.filter(col("user_id") % 100 === 0)
        .select(col("u").as("seed")).distinct()
      var visited = seeds
        .select(col("seed"), col("seed").as("node"), lit(0).as("dist"))
        .localCheckpoint()
      var frontier = visited
      for (h <- 1 to 3) {
        frontier = frontier.join(edges, frontier("node") === edges("src"))
          .select(col("seed"), col("dst").as("node"))
          .distinct()
          .join(visited.select(col("seed"), col("node")), Seq("seed", "node"),
            "left_anti")
          .withColumn("dist", lit(h))
          .localCheckpoint()
        visited = visited.unionAll(frontier).localCheckpoint()
      }
      visited.orderBy(col("seed"), col("node"))
    }),

    // ---- triangle counting on the near-dup pair graph (reuses the
    // memoized pair table the dedup family builds): with edges oriented
    // a<b, each triangle a<b<c is found exactly once by the two-hop
    // join — the standard distributed formulation; at scale the joins
    // shuffle on node id and high-degree nodes are the salting
    // candidates. Triangle density distinguishes tight dup-clusters
    // (cliques) from chains.
    "graph_triangles" -> ((s, d) => {
      val e = Dedup.neardupPairs(s, d).select(col("i"), col("j"))
      val e1 = e.select(col("i").as("a"), col("j").as("b"))
      val e2 = e.select(col("i").as("b"), col("j").as("c"))
      val e3 = e.select(col("i").as("a"), col("j").as("c"))
      val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
      val nodes = e.select(col("i").as("n")).unionAll(e.select(col("j").as("n")))
        .distinct()
      tri.agg(count(lit(1)).as("n_triangles"))
        .join(e.agg(count(lit(1)).as("n_edges")))
        .join(nodes.agg(count(lit(1)).as("n_nodes")))
    }),

    // ---- connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    // (Kiveris et al., "Connected Components in MapReduce and Beyond",
    // SoCC 2014) over the same near-dup pair graph dedup_clusters
    // labels with min-label propagation. Why carry a second CC
    // algorithm: propagation converges in O(diameter) rounds — right
    // for dup-clusters (near-cliques), wrong for the path-shaped
    // graphs CC meets at 100 TB (link chains, citation chains), where
    // diameter is thousands. Large/small-star re-points edges at
    // ever-smaller labels and converges in O(log² n) rounds regardless
    // of diameter; each half-round is one groupBy-min + one join, both
    // shuffling on node id. The two algorithms must label identically
    // — the oracle is dedup_clusters' verbatim.
    "graph_components_ls" -> ((s, d) =>
      componentsLargeSmallStar(
        Dedup.neardupPairs(s, d).select(col("i"), col("j")))
        .orderBy(col("doc_id"))),

    // ---- INCREMENTAL connected components: yesterday's labels + a
    // delta edge batch, no base recompute — the daily shape of every
    // persisted dup-cluster / sameAs-identity table (dedup_incremental
    // finds cross-snapshot EDGES; this folds them into the LABELS).
    // Fixture: base chains bind customer keys in runs of 10; the delta
    // merges runs of 10 into runs of 50 AND attaches a brand-new node
    // (1000000 + k) to every 100th customer — exercising both the
    // rep-merge and the new-node paths. The oracle recomputes the
    // closure over base ∪ delta from scratch, so one stale label or a
    // missed merge is a hash mismatch.
    "graph_components_incremental" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val k = col("c_custkey")
      val base = cust.filter(k % 10 =!= 1)
        .select(k.as("i"), (k - 1).as("j"))
      val delta = cust.filter(k % 10 === 1 && k % 50 =!= 1)
        .select(k.as("i"), (k - 1).as("j"))
        .unionAll(cust.filter(k % 100 === 0)
          .select(k.as("i"), (k + 1000000).as("j")))
      componentsIncremental(componentsLargeSmallStar(base), delta)
        .orderBy(col("doc_id"))
    }))

  /** Incremental CC: fold a DELTA edge batch into an existing
    * (doc_id, cluster_rep) labeling without recomputing the base graph.
    *  1. restrict the label map to the delta's endpoints — a left-semi
    *     join against the BROADCAST endpoint set, so the base-sized
    *     table is scanned once and never shuffled;
    *  2. contract: map each delta endpoint to its rep (new nodes map to
    *     themselves) — the contracted graph has O(|delta|) edges
    *     REGARDLESS of base size;
    *  3. run [[componentsLargeSmallStar]] on the contracted graph;
    *  4. map the rep→rep merges back over the label table with a
    *     BROADCAST join (the merge map is delta-bounded) — again no
    *     base shuffle.
    * Every base rep is the MIN of its component, so the min label of
    * merged reps is the global min: incremental labels are IDENTICAL
    * to a full recompute over base ∪ delta (the oracle proves it).
    * Total cost: two scans of the label table and CC on a delta-sized
    * graph — the 100 TB property that makes daily label maintenance
    * affordable. */
  def componentsIncremental(baseLabels: DataFrame, delta: DataFrame)
      : DataFrame = {
    val lab = baseLabels.select(col("doc_id"), col("cluster_rep"))
    val endpoints = delta.select(col("i").as("doc_id"))
      .unionAll(delta.select(col("j").as("doc_id"))).distinct()
    val touched = lab.join(broadcast(endpoints), Seq("doc_id"), "left_semi")
    val li = touched.select(col("doc_id").as("i"), col("cluster_rep").as("ri"))
    val lj = touched.select(col("doc_id").as("j"), col("cluster_rep").as("rj"))
    val contracted = delta
      .join(broadcast(li), Seq("i"), "left")
      .join(broadcast(lj), Seq("j"), "left")
      .select(coalesce(col("ri"), col("i")).as("i"),
        coalesce(col("rj"), col("j")).as("j"))
      .filter(col("i") =!= col("j"))
    // delta-sized result, consumed twice (remap + newNodes) — pin it
    val merges = componentsLargeSmallStar(contracted).localCheckpoint()
    val remap = merges.select(col("doc_id").as("cluster_rep"),
      col("cluster_rep").as("new_rep"))
    val updated = lab.join(broadcast(remap), Seq("cluster_rep"), "left")
      .select(col("doc_id"),
        coalesce(col("new_rep"), col("cluster_rep")).as("cluster_rep"))
    // nodes the delta introduced: endpoints with no base label (all
    // delta-sized arithmetic — `touched` is the labeled subset, so the
    // anti-join never sees the base table). `updated` already covers
    // every base node including the contracted reps, so restricting to
    // genuinely-new endpoints means no overlap and no distinct.
    val newEndpoints = endpoints
      .join(broadcast(touched.select(col("doc_id"))), Seq("doc_id"),
        "left_anti")
    val newNodes = merges
      .join(broadcast(newEndpoints), Seq("doc_id"), "left_semi")
    updated.unionByName(newNodes)
  }

  /** Alternating large-star/small-star CC: returns (doc_id,
    * cluster_rep) for every node appearing in `pairs`. Both phases emit
    * only canonical (node > label) edges, so convergence is a SET
    * comparison — detected round-to-round by an order-free (count,
    * xxhash64-xor) signature (one map-side aggregate over the freshly
    * checkpointed edge set, NO shuffle) and then CONFIRMED exactly with
    * the distinct-union count once, so a 2⁻⁶⁴ hash-sum collision can
    * only cost one extra round, never a wrong label (r13: the exact
    * check used to run EVERY round — a full distinct shuffle of 2|E|
    * rows per round, the single biggest fixed cost of the loop; it is
    * now paid once at the fixpoint). */
  def componentsLargeSmallStar(pairs: DataFrame): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // output is already canonical (m <= u < v) and feeds straight
      // into smallStar's leading distinct — its own distinct here would
      // be a second exchange deduplicating the identical edge set (r13)
      sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val m = or.groupBy(col("u")).agg(min(col("v")).as("m"))
      val joined = or.join(m, "u")
      joined.select(col("v").as("u"), col("m").as("v"))
        .union(joined.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    // order-free edge-set signature: one map-side aggregate, no
    // shuffle. bit_xor (not sum) — XOR never overflows under ANSI and
    // is an exact set fingerprint here because every signed frame is a
    // distinct edge set (duplicates would cancel under XOR otherwise).
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = pairs
      .select(greatest(col("i"), col("j")).as("u"),
        least(col("i"), col("j")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var sig = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 32) {
      // LAZY checkpoint: the signature aggregate right below is the
      // round's one materializing action (an eager checkpoint would be
      // a second full pass — r13 halved the actions per round)
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val nextSig = signature(next)
      // signature match -> exact confirmation (runs once at the
      // fixpoint; a collision-induced false match just loops again)
      converged = sig == nextSig &&
        next.union(e).distinct().count() == sig._1
      e = next
      sig = nextSig
      rounds += 1
    }
    // Fail loudly rather than return unconverged (wrong) labels: the
    // O(log² n) bound is probabilistic over the graph shape, and a
    // silent cap-hit would hand the caller bogus cluster_reps.
    require(converged,
      s"componentsLargeSmallStar: not converged after $rounds rounds")
    val reps = e.select(col("v").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_rep"))
    e.select(col("u").as("doc_id"), col("v").as("cluster_rep"))
      .union(reps).distinct()
  }

  // 3 supersteps unrolled as chained CTEs (SQL can't express the
  // driver loop); same 0.15/0.85 literals for double parity
  private def prStep(prev: String, next: String): String =
    s"""$next AS (SELECT dst AS node,
          0.15 + 0.85 * sum($prev.rank / e.deg) AS rank
        FROM e JOIN $prev ON e.src = $prev.node GROUP BY dst)"""

  def oracleSql: Map[String, String] = Map(
    // two CC algorithms, one truth: the large/small-star labels must
    // hash-match the same recursive-closure oracle dedup_clusters uses
    "graph_components_ls" -> Dedup.clustersOracle,
    // recursive-CTE walk bounded at 3 hops; UNION (distinct) keeps the
    // recursion finite, min(dist) recovers the BFS level
    "graph_bfs_hops" ->
      s"""WITH RECURSIVE ev AS (SELECT DISTINCT
               'u:' || CAST(user_id AS VARCHAR) AS u,
               't:' || event_type AS t, user_id FROM events),
          edges AS (SELECT u AS src, t AS dst FROM ev
                    UNION SELECT t, u FROM ev),
          seeds AS (SELECT DISTINCT u AS seed FROM ev WHERE user_id % 100 = 0),
          walk(seed, node, dist) AS (
            SELECT seed, seed, 0 FROM seeds
            UNION
            SELECT w.seed, e.dst, w.dist + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.dist < 3)
        SELECT seed, node, CAST(min(dist) AS INT) AS dist
        FROM walk GROUP BY seed, node ORDER BY seed, node""",
    "graph_pagerank" ->
      s"""WITH ev AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
               't:' || event_type AS t FROM events),
          edges AS (SELECT u AS src, t AS dst FROM ev
                    UNION ALL SELECT t, u FROM ev),
          deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
          e AS (SELECT edges.src, dst, deg FROM edges JOIN deg USING (src)),
          r0 AS (SELECT src AS node, 1.0 AS rank FROM edges GROUP BY src),
          ${prStep("r0", "r1")},
          ${prStep("r1", "r2")},
          ${prStep("r2", "r3")}
        SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node""",
    // incremental labels must equal a from-scratch closure over
    // base ∪ delta (min-reachable-label semantics, the dedup_clusters
    // pattern): base chains of 10, delta decade-merges + new nodes
    "graph_components_incremental" ->
      """WITH RECURSIVE
          e AS (
            SELECT c_custkey AS a, c_custkey - 1 AS b FROM customer
            WHERE c_custkey % 10 <> 1
            UNION ALL
            SELECT c_custkey, c_custkey - 1 FROM customer
            WHERE c_custkey % 10 = 1 AND c_custkey % 50 <> 1
            UNION ALL
            SELECT c_custkey, c_custkey + 1000000 FROM customer
            WHERE c_custkey % 100 = 0),
          bi AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
          reach(a, b) AS (
            SELECT a, b FROM bi
            UNION
            SELECT r.a, x.b FROM reach r JOIN bi x ON r.b = x.a),
          lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
                  FROM reach GROUP BY a)
        SELECT doc_id, cluster_rep FROM lab ORDER BY doc_id""",
    // same >=0.8-Jaccard pair graph as the dedup oracles
    "graph_triangles" ->
      s"""WITH ${Dedup.pairsCtesSql}
        SELECT
          (SELECT count(*) FROM pairs p1
             JOIN pairs p2 ON p2.i = p1.j
             JOIN pairs p3 ON p3.i = p1.i AND p3.j = p2.j) AS n_triangles,
          (SELECT count(*) FROM pairs) AS n_edges,
          (SELECT count(*) FROM (SELECT i AS n FROM pairs
             UNION SELECT j FROM pairs) t) AS n_nodes""")
}
