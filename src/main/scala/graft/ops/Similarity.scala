package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exactness baseline, embedding-cosine
  * near-dup pairs, and a random-hyperplane LSH-bucketed variant as the
  * scale path (candidates come from a bucket equi-join, not a cross
  * join).
  *
  * All vector math is `zip_with`/`aggregate` column expressions over
  * doubles — codegen'd, no UDFs (SURVEY.md steering).
  */
object Similarity {

  /** element-wise double cast */
  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** native codegen'd primitive loop — no per-pair intermediate array
    * (graft.sparql.DotProductExpr); the hot kernel of every query here */
  def dot(a: Column, b: Column): Column =
    graft.sparql.VectorFunctions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** fanOut: the non-equi pair joins below are nested-loop joins whose
    * parallelism equals the stream-side partition count — on a
    * single-row-group local file that is 1 task without it. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** With pre-computed norm (avoids recomputing in the pair loop). */
  private[ops] def vecsN(s: SparkSession, d: String): DataFrame =
    vecs(s, d).withColumn("nrm", norm(col("v")))

  /** Transitive-cluster exclusion + top-`k` cut — the back half of
    * hard-negative mining, shared by both scoring paths. `rer` holds
    * (query_id, vec_id, cos) exact-scored candidates; every neighbor in
    * the query's near-dup cluster (connected components over `pairs`,
    * the dedup family's closure) is excluded BEFORE the rank cut.
    * Transitive exclusion is the point: a chain-connected duplicate
    * whose direct cosine sits below any gate is a FALSE negative that
    * poisons a contrastive loss, and a plain cos-threshold filter would
    * keep it. Cluster tables are pair-graph-node-sized (≪ corpus) and
    * broadcast. Returns (query_id, rank, neighbor, cos). */
  private def excludeClustersAndCut(rer: DataFrame, pairs: DataFrame,
      k: Int): DataFrame = {
    val cl = Dedup.clusterAssign(pairs)
    val qcl = cl.select(col("doc_id").as("query_id"),
      col("cluster_rep").as("qrep"))
    val ncl = cl.select(col("doc_id").as("vec_id"),
      col("cluster_rep").as("nrep"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    rer
      .join(broadcast(qcl), Seq("query_id"), "left")
      .join(broadcast(ncl), Seq("vec_id"), "left")
      // absent from the pair graph = singleton cluster (own id)
      .where(coalesce(col("qrep"), col("query_id")) =!=
        coalesce(col("nrep"), col("vec_id")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** EXACT hard-negative mining: per query (rows of `vecsN` matching
    * `isQuery`), the top-`k` exact-cosine neighbors with transitive
    * cluster members excluded. The scoring pass is a corpus × queries
    * broadcast nested loop — O(n²/|queries|) pairs, the small-scale
    * correctness/recall BASELINE only (embed_hard_negatives_audit); the
    * shipped scale path is [[hardNegativesServed]], which scores
    * candidates from the persisted IVFADC index. `vecsN` columns:
    * (vec_id, v, nrm); `pairs`: (i, j, …). */
  def hardNegatives(vecsN: DataFrame, pairs: DataFrame,
      isQuery: Column, k: Int = 5): DataFrame = {
    val queries = vecsN.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val rer = vecsN
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      .select(col("query_id"), col("vec_id"), col("cos"))
    excludeClustersAndCut(rer, pairs, k)
  }

  /** INDEX-SERVED hard-negative mining — the 100 TB path: candidates
    * come cell-pruned from the persisted IVFADC index (never a corpus
    * scan per query), are exact-cosine re-ranked at `adcDepth`, then
    * the same transitive-cluster exclusion cuts to top-`k`. Excluding
    * AFTER the re-rank but BEFORE the cut means cluster members never
    * consume negative slots. Oracle-checked (the SQL replays the full
    * index search + closure); recall vs the exact pass is audited by
    * embed_hard_negatives_audit. */
  def hardNegativesServed(s: SparkSession, d: String, pairs: DataFrame,
      queryPred: Column => Column, adcDepth: Int = 250,
      k: Int = 5): DataFrame =
    excludeClustersAndCut(ivfadcServedRerank(s, d, queryPred, adcDepth),
      pairs, k)

  /** Banded-LSH candidate pairs verified by exact cosine at >= 0.45 —
    * (i, j, cos), i < j, each pair once. Memoized + persisted per
    * (session, dir): embed_neardup and embed_semantic_dedup consume the
    * identical pair set; without memoization each runs the full
    * band-join + verify pipeline again. */
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  /** Drop the memoized pair/coded frames and their persisted blocks. */
  def clearCaches(): Unit = {
    pairCache.forEachValue(Long.MaxValue, df => { df.unpersist(); () })
    pairCache.clear()
    pqCodedCache.forEachValue(Long.MaxValue, df => { df.unpersist(); () })
    pqCodedCache.clear()
    pqCbCache.clear()
    ivfCbCache.clear()
    servedIndexCache.clear()
    vecCountCache.clear()
  }

  private[ops] def lshVerifiedPairs(s: SparkSession, d: String): DataFrame =
    pairCache.computeIfAbsent((s, d), { _ =>
      val packed = vecsN(s, d).withColumn("pack",
        lshPack2(col("v"), embDim(s, d)))
      val banded = packed.select(col("vec_id"), col("pack"),
        posexplode(packSigs(col("pack"))).as(Seq("band", "sig")))
      val lhs = banded.select(col("vec_id").as("i"), col("pack").as("pl"),
        col("band"), col("sig"))
      val rhs = banded.select(col("vec_id").as("j"), col("pack").as("pr"),
        col("band"), col("sig"))
      val cands = lhs.join(rhs, Seq("band", "sig"))
        .where(col("i") < col("j"))
        .where(firstSharedBand(col("pl"), col("pr")) === col("band"))
        .select(col("i"), col("j"))
      // verify join strategy: broadcasting the vector side keeps the
      // wide arrays out of the shuffle — but it is only legal while the
      // WHOLE embedding table fits one executor. Above the size gate
      // the candidates (narrow i/j pairs) shuffle-join the vectors on
      // vec_id instead: the wide payload moves once, co-partitioned by
      // its own key, and no executor ever holds the full base.
      val bc = verifyBroadcastable(s, d)
      def hint(df: DataFrame): DataFrame = if (bc) broadcast(df) else df
      val va = packed.select(col("vec_id").as("i"),
        col("v").as("va"), col("nrm").as("na"))
      val vb = packed.select(col("vec_id").as("j"),
        col("v").as("vb"), col("nrm").as("nb"))
      cands.join(hint(va), "i").join(hint(vb), "j")
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.45)
        .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** In-memory budget for broadcasting the full vector table in the
    * verify join (floats widen to doubles + row overhead ≈ 4× the
    * parquet footprint — estimated driver-side from one fs stat, no
    * extra Spark job). 256 MB expanded is a conservative slice of a
    * normal executor heap; a 100 TB corpus blows past it immediately
    * and takes the shuffle path. */
  private val VerifyBroadcastMaxBytes = 256L << 20

  /** `spark.graft.lsh.verifyBroadcast`: `auto` (size gate, default),
    * `force`, or `off`. */
  private def verifyBroadcastable(s: SparkSession, d: String): Boolean =
    s.conf.get("spark.graft.lsh.verifyBroadcast", "auto") match {
      case "force" => true
      case "off"   => false
      case _ =>
        val p = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength * 4 <= VerifyBroadcastMaxBytes
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- near-duplicate pairs by embedding cosine — the scale path.
    // Candidates come from banded sign-hash LSH: 32 bands × 2-bit
    // signatures, all 64 sign bits packed into ONE long per vector. A
    // pair is emitted by exactly one band — its FIRST shared band, found
    // by bit-comparing the two packs — so the candidate stream needs no
    // pair-level distinct. Exact cosine then verifies every candidate,
    // so the output equals the all-pairs oracle provided no qualifying
    // pair misses all 32 bands: at cos = 0.45 (θ = 63.3°, per-bit
    // agreement 1−θ/π ≈ 0.648) the per-pair miss probability is
    // (1−0.648²)^32 ≈ 3e-8, and the hyperplanes are FIXED, so recall on
    // a given dataset is a testable fact, not a per-run gamble.
    // Pruning honesty: 0.45 is an unusually low threshold — at θ≈63°
    // 2-bit band collisions barely discriminate, so on background data
    // the candidate set approaches all-pairs. At the thresholds real
    // dedup pipelines use (≥0.8) the same bands prune aggressively.
    // The structural win either way: candidates come from a (band, sig)
    // equi-join — shuffle-partitionable across executors — never a
    // Cartesian/NLJ over the full base (asserted in PlanSpec).
    "embed_neardup" -> ((s, d) =>
      lshVerifiedPairs(s, d).orderBy(col("i"), col("j"))),

    // ---- the exact all-pairs twin: the small-scale correctness
    // baseline the bucketed query is measured against (same oracle).
    // O(n²) by construction — never the declared scale path.
    "embed_neardup_bruteforce" -> ((s, d) => {
      val a = vecsN(s, d).select(col("vec_id").as("i"),
        col("v").as("va"), col("nrm").as("na"))
      val b = vecsN(s, d).select(col("vec_id").as("j"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("i") < col("j"))
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.45)
        .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
        .orderBy(col("i"), col("j"))
    }),

    // ---- HARD-NEGATIVE MINING for contrastive/retrieval training:
    // per query, the closest neighbors that are verifiably NOT
    // duplicates — candidates come CELL-PRUNED from the persisted
    // IVFADC index (the build-once/serve-many lifecycle; a probe pays
    // probes/cells partition directories of 8-byte codes, never the
    // corpus), are exact-cosine re-ranked at depth 250, then every
    // neighbor in the query's TRANSITIVE near-dup cluster (connected
    // components over the verified >=0.45 pair graph, the dedup
    // family's closure) is excluded before the top-k cut. Transitive
    // exclusion is the point: a chain-connected duplicate whose direct
    // cosine sits below any gate is a FALSE negative that poisons the
    // contrastive loss, and a plain cos-threshold filter would keep it.
    // Fully oracle-checked: the SQL replays the whole index search
    // (both trainings, probe policy, ADC, re-rank) plus the closure.
    // The query set (% 28) deliberately includes near-dup cluster
    // members at test scale so the exclusion path is exercised, not
    // vacuously green.
    "embed_hard_negatives" -> ((s, d) =>
      hardNegativesServed(s, d, lshVerifiedPairs(s, d),
        _ % 28 === 0)),

    // ---- recall audit for the index-served mining: the exact
    // brute-force pass (the former shipped plan, O(n²/|queries|) by
    // construction) is demoted to the audit baseline — the index-served
    // top-5 must recover >= 0.7 of its (query, neighbor) set.
    "embed_hard_negatives_audit" -> ((s, d) => {
      val exact = hardNegatives(vecsN(s, d), lshVerifiedPairs(s, d),
        col("vec_id") % 28 === 0)
        .select(col("query_id"), col("neighbor"))
      val served = queries("embed_hard_negatives")(s, d)
        .select(col("query_id"), col("neighbor"))
      val hits = exact.join(served, Seq("query_id", "neighbor"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(col("n_exact"),
          (col("n_hit") >= col("n_exact") * 0.7).cast("int").as("recall_ok"))
    }),

    // ---- brute-force cosine top-k for a deterministic query subset
    "ann_bruteforce_topk" -> ((s, d) => {
      val queries = vecsN(s, d).filter(col("vec_id") % 250 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val base = vecsN(s, d)
      val scored = base.join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .withColumn("cos",
          round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor"), col("cos"))
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- LSH-bucketed ANN (the 100-TB path): banded random-hyperplane
    // signatures — candidates share any (band, 4-bit-signature) key, so
    // candidate generation is a band equi-join, not a cross join. The
    // candidate set is deduped as (query_id, vec_id) ID pairs BEFORE the
    // vectors are joined back — at scale the wide embedding arrays never
    // enter the dedup shuffle.
    // Fully oracle-checked: the seeded-PRNG planes are a java.util.Random
    // LCG the SQL replays exactly (see the ann_lsh_bucketed oracle).
    "ann_lsh_bucketed" -> ((s, d) => {
      // signature width from corpus size: expected bucket ~125 docs
      val rows = lshRowsFor(vecs(s, d).count())
      val banded = vecs(s, d).select(col("vec_id"),
        posexplode(lshBands(col("v"), embDim(s, d), rows)).as(Seq("band", "sig")))
      val qkeys = banded.filter(col("vec_id") % 250 === 0)
        .select(col("vec_id").as("query_id"), col("band"), col("sig"))
      val candIds = banded.join(broadcast(qkeys), Seq("band", "sig"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id")).distinct()
      val qvecs = vecsN(s, d).filter(col("vec_id") % 250 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val cand = candIds.join(vecsN(s, d), "vec_id")
        .join(broadcast(qvecs), "query_id")
        .withColumn("cos",
          round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor"), col("cos"))
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- IVF-bucketed ANN: coarse-quantize into cells, probe the
    // query's nearest IvfProbes cells only. Candidates come from a cell
    // equi-join; at scale the cell column would be the partition key.
    // Rows-only (recall vs brute force pinned in TrainingOpsSpec).
    "ann_ivf_bucketed" -> ((s, d) => {
      val base = vecsN(s, d)
      // cell/probe counts from corpus size (≈√(n/8) cells — see
      // ivfCellsFor); centroids k-means-trained once (memoized), then
      // plan literals so both assignment branches see the identical set
      val cells = ivfCellsFor(base.count())
      val probes = ivfProbesFor(s, cells)
      val centroids = ivfCentroids(s, d, cells)
      val assigned = base.withColumn("cell",
        element_at(ivfCellsOf(centroids, keep = 1), 1))
      val queries = base.filter(col("vec_id") % 250 === 0)
        .withColumn("cell", explode(ivfCellsOf(centroids, keep = probes)))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val cand = assigned.join(broadcast(queries), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cos",
          round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("rn"), col("vec_id").as("neighbor"), col("cos"))
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- driver-visible recall audits: the two bucketed ANN variants
    // are sketches with no SQL-expressible oracle, so their CORRECTNESS
    // row was rows-only. These twins compute recall against the
    // brute-force exact top-k INSIDE the query and emit a one-row
    // summary the oracle CAN bound: n_exact is 5 × the query-point
    // count (pure SQL), recall_ok asserts the deterministic (fixed
    // planes / fixed centroids) recall stays above the pinned floor.
    "ann_lsh_recall" -> ((s, d) => annRecall(s, d, "ann_lsh_bucketed", 0.7)),
    "ann_ivf_recall" -> ((s, d) => annRecall(s, d, "ann_ivf_bucketed", 0.7)),

    // ---- product quantization codes (the 100 TB ANN storage path;
    // PQ/ADC per Jégou, Douze & Schmid, "Product Quantization for
    // Nearest Neighbor Search", TPAMI 2011 — public literature):
    // split each vector into M=8 subvectors, quantize each against a
    // 16-entry per-subspace codebook → 4 bits per subspace, 32 bits per
    // vector — a dim×8-byte embedding shrinks to one BIGINT. The
    // codebook is TRAINED per subspace by the deterministic Lloyd
    // k-means in trainSubspaceKmeans (modulo-sample init, 2 rounds,
    // order-independent integer-quantized averaging), so the whole
    // training is a pure function of the data and the DuckDB oracle
    // recomputes it — init, both Lloyd rounds, and every code —
    // bit-for-bit: subspace distances are left-fold double sums on both
    // engines, rounded to 6 decimals before the argmin, first-index
    // tie-break on both sides, centroid means exact divisions of
    // order-free integer sums.
    "embed_pq_codes" -> ((s, d) => {
      val (sd, cb) = pqCodebook(s, d)
      val codes = pqCodeCols(cb, sd)
      vecs(s, d).select(col("vec_id") +: codes: _*)
        .select(col("vec_id"),
          codes.indices.map(m =>
            col(s"c$m") * lit(1L << (4 * m))).reduce(_ + _).as("code"))
        .orderBy(col("vec_id"))
    }),

    // ---- ADC search over PQ codes + exact re-rank: score every base
    // vector against the query using only its RECONSTRUCTED codebook
    // vector (the scan reads 8-byte codes, not dim×8-byte embeddings —
    // that bandwidth ratio is the entire point at 100 TB), keep the
    // top-50 ADC candidates per query, then join the true vectors back
    // for exact-cosine re-ranking to top-5. At cluster scale the ADC
    // scan composes with IVF cells (scan one cell's codes, not the
    // corpus); the re-rank join touches 50 vectors per query either
    // way. Rows-only; recall audit below is the oracle gate.
    "ann_pq_rerank" -> ((s, d) => {
      val coded = pqCoded(s, d)
      val qvecs = vecsN(s, d).filter(col("vec_id") % 250 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val adc = coded.join(broadcast(qvecs), col("vec_id") =!= col("query_id"))
      adcTop5(s, d, adc, depth = 250)
    }),

    "ann_pq_recall" -> ((s, d) => annRecall(s, d, "ann_pq_rerank", 0.7)),

    // ---- IVF + PQ composed (the canonical IVFADC index shape): the
    // coarse quantizer prunes the scan to the query's `probes` nearest
    // cells, ADC scores those cells' 8-byte codes against the
    // reconstructed codebook vectors, and only the top-50 survivors
    // touch the true embeddings for exact re-ranking. At cluster scale
    // the cell column is the partition key, so a query reads
    // probes/cells of the index — and each partition it reads is
    // PQ-compressed. Rows-only; recall audit below is the oracle gate.
    "ann_ivfpq_bucketed" -> ((s, d) => {
      val base = vecsN(s, d)
      val cells = ivfCellsFor(base.count())
      val probes = ivfProbesFor(s, cells)
      val centroids = ivfCentroids(s, d, cells)
      val (sd, cb) = pqCodebook(s, d)
      val coded = base
        .withColumn("cell", element_at(ivfCellsOf(centroids, keep = 1), 1))
        .select(col("vec_id") +: col("cell") +: pqCodeCols(cb, sd): _*)
        .withColumn("r", pqReconOf(cb, sd))
        .select(col("vec_id"), col("cell"), col("r"),
          dot(col("r"), col("r")).as("rr"))
      val qvecs = base.filter(col("vec_id") % 250 === 0)
        .withColumn("cell", explode(ivfCellsOf(centroids, keep = probes)))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell"))
      val adc = coded.join(broadcast(qvecs), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
      // deeper ADC cut than plain PQ: the cell pruning has already paid
      // the scan cost, and recall here compounds IVF x ADC losses
      adcTop5(s, d, adc, depth = 250)
    }),

    "ann_ivfpq_recall" -> ((s, d) => annRecall(s, d, "ann_ivfpq_bucketed", 0.7)),

    // ---- the IVFADC index as a PERSISTED ARTIFACT (the production
    // lifecycle: build once, write, serve many): the coded frame —
    // vec_id + 8 PQ code columns keyed by coarse cell — is written to
    // parquet `partitionBy(cell)`, so the DIRECTORY LAYOUT is the
    // index: a probe reads `probes` of `cells` directories (partition
    // pruning on disk), each holding 8-byte codes instead of dim×8-byte
    // vectors. The search then runs entirely from the reloaded files
    // (codebook/centroids stay plan literals — at scale, a tiny stored
    // model artifact) and must reproduce the inline pipeline's ranked
    // neighbors byte-for-byte: it shares ann_ivfpq_bucketed's full
    // training-included SQL oracle verbatim.
    "ann_ivfpq_persisted" -> ((s, d) => {
      val base = vecsN(s, d)
      val cells = ivfCellsFor(base.count())
      val probes = ivfProbesFor(s, cells)
      val centroids = ivfCentroids(s, d, cells)
      val (sd, cb) = pqCodebook(s, d)
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      base
        .withColumn("cell",
          element_at(ivfCellsOf(centroids, keep = 1), 1).cast("int"))
        .select(col("vec_id") +: col("cell") +: pqCodeCols(cb, sd): _*)
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      val coded = s.read.parquet(dir)
        .withColumn("r", pqReconOf(cb, sd))
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("r"), dot(col("r"), col("r")).as("rr"))
      val qvecs = base.filter(col("vec_id") % 250 === 0)
        .withColumn("cell", explode(ivfCellsOf(centroids, keep = probes)))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell").cast("int").as("cell"))
      val adc = coded.join(broadcast(qvecs), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
      adcTop5(s, d, adc, depth = 250)
    }),

    // ---- INCREMENTAL index growth (the other half of the production
    // lifecycle): train the coarse centroids and PQ codebooks on the
    // BASE corpus only (vec_id % 5 != 0), build and persist the base
    // index, then encode the later arrivals (vec_id % 5 == 0) with the
    // FROZEN model and parquet-append them into the same
    // cell-partitioned layout — no retraining, no rewrite of existing
    // partitions, which is the only affordable way an index absorbs a
    // daily delta at 100 TB. The search runs over the merged files and
    // its ranked neighbors are recomputed end-to-end by the
    // training-population-parameterized SQL oracle.
    "ann_ivfpq_append" -> ((s, d) => {
      val all = vecsN(s, d)
      val basePred = col("vec_id") % 5 =!= 0
      val trainPop = vecs(s, d).filter(basePred)
      val cells = ivfCellsFor(trainPop.count())
      val probes = ivfProbesFor(s, cells)
      val centroids = ivfCentroidsOn(s, d, trainPop, cells, tag = "base")
      val (sd, cb) = pqCodebookOn(s, d, trainPop, tag = "base")
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ivfapp-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      def coded(pop: DataFrame) = pop
        .withColumn("cell",
          element_at(ivfCellsOf(centroids, keep = 1), 1).cast("int"))
        .select(col("vec_id") +: col("cell") +: pqCodeCols(cb, sd): _*)
      coded(all.filter(basePred))
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      coded(all.filter(!basePred))
        .write.mode("append").partitionBy("cell").parquet(dir)
      val codedAll = s.read.parquet(dir)
        .withColumn("r", pqReconOf(cb, sd))
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("r"), dot(col("r"), col("r")).as("rr"))
      val qvecs = all.filter(col("vec_id") % 250 === 0)
        .withColumn("cell", explode(ivfCellsOf(centroids, keep = probes)))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell").cast("int").as("cell"))
      val adc = codedAll.join(broadcast(qvecs), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
      adcTop5(s, d, adc, depth = 250)
    }),

    // ---- STREAMING index ingest: the embedding-firehose shape of the
    // append lifecycle. The base corpus trains the model and builds the
    // cell-partitioned index in batch; later arrivals then flow through
    // Structured Streaming — spooled as 4 files, 1 file per micro-batch
    // — and each micro-batch is encoded with the FROZEN base model
    // (same centroids/codebooks, no retraining) and written into the
    // cell layout inside foreachBatch. foreachBatch alone is
    // at-least-once (a crash between the write and the checkpoint
    // commit re-delivers the batch), so the sink is made IDEMPOTENT:
    // each micro-batch overwrites its own deterministic
    // `ingest_batch=b<id>` subdirectory — a re-delivered batch lands on
    // the same path with the same bytes, never duplicating vectors.
    // The frozen model is what makes the append O(batch): nothing
    // keyed by an old code is rewritten. The final search over the
    // streamed-in index must equal ann_ivfpq_append's batch-built one
    // — the oracle IS the same full IVFADC recomputation.
    "stream_ann_ingest" -> ((s, d) => {
      val all = vecsN(s, d)
      val basePred = col("vec_id") % 5 =!= 0
      val trainPop = vecs(s, d).filter(basePred)
      val cells = ivfCellsFor(trainPop.count())
      val probes = ivfProbesFor(s, cells)
      val centroids = ivfCentroidsOn(s, d, trainPop, cells, tag = "base")
      val (sd, cb) = pqCodebookOn(s, d, trainPop, tag = "base")
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-annstream-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      def coded(pop: DataFrame) = pop
        .withColumn("cell",
          element_at(ivfCellsOf(centroids, keep = 1), 1).cast("int"))
        .select(col("vec_id") +: col("cell") +: pqCodeCols(cb, sd): _*)
      coded(all.filter(basePred))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/index/ingest_batch=base")
      val late = all.filter(!basePred)
      late.repartition(4).write.parquet(s"$dir/spool")
      val stream = s.readStream.schema(late.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/spool")
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          coded(batch)
            .write.mode("overwrite").partitionBy("cell")
            .parquet(s"$dir/index/ingest_batch=b$batchId")
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val codedAll2 = s.read.parquet(s"$dir/index")
        .withColumn("r", pqReconOf(cb, sd))
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("r"), dot(col("r"), col("r")).as("rr"))
      val qvecs2 = all.filter(col("vec_id") % 250 === 0)
        .withColumn("cell", explode(ivfCellsOf(centroids, keep = probes)))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell").cast("int").as("cell"))
      val adc2 = codedAll2.join(broadcast(qvecs2), Seq("cell"))
        .where(col("vec_id") =!= col("query_id"))
      adcTop5(s, d, adc2, depth = 250)
    }),

    // ---- index DELETION without rebuild (the opt-out/right-to-erasure
    // path a production corpus index needs): removal requests land as a
    // `_tombstones` file BESIDE the cell partitions — no code file is
    // rewritten, no model retrained — and serving anti-joins the
    // broadcast tombstone set over the cell-pruned scan before ADC.
    // Removed vectors must be unfindable: the oracle recomputes the
    // full IVFADC search with the candidates excluded, so a single
    // tombstoned id surviving in any top-5 is a hash mismatch.
    "ann_index_delete" -> ((s, d) => {
      val dir = servedIndexDir(s, d)
      vecsN(s, d).filter(col("vec_id") % 17 === 3).select(col("vec_id"))
        .write.mode("overwrite").parquet(s"$dir/_tombstones")
      ivfadcServedRanks(s, d, _ % 250 === 0, adcDepth = 250,
        finalDepth = 5,
        tombstones = Some(s.read.parquet(s"$dir/_tombstones")))
    }),

    // ---- the IVF index LAYOUT itself: vec_id → coarse cell. At 100 TB
    // this mapping IS the index — the cell column is the partition key
    // every probe prunes on — so it deserves a direct oracle, not just
    // the recall audit. Checkable because the coarse centroids are
    // k-means-trained deterministically: the SQL recomputes the full
    // training (corpus-adaptive cell count included) and the same
    // min-L2 assignment, bit-for-bit.
    "embed_ivf_cells" -> ((s, d) => {
      val base = vecs(s, d)
      val cells = ivfCellsFor(base.count())
      val centroids = ivfCentroids(s, d, cells)
      base.withColumn("cell",
        element_at(ivfCellsOf(centroids, keep = 1), 1).cast("int"))
        .select(col("vec_id"), col("cell"))
        .orderBy(col("vec_id"))
    }),

    // ---- int8 symmetric quantization of the embedding column (the
    // 4x storage/bandwidth shrink an ANN index at 100 TB runs on):
    // per-vector scale = max|x| / 127, elementwise floor(x/scale + 0.5).
    // floor(+0.5) instead of round() — round() half-away/half-even
    // semantics differ across engines, floor is exact everywhere.
    // Map-side only: no shuffle, no UDF.
    "embed_quantize" -> ((s, d) => {
      val mx = array_max(transform(col("v"), x => abs(x)))
      val q = transform(col("v"),
        x => floor(x * 127 / col("mx") + lit(0.5)).cast("long"))
      vecs(s, d)
        .withColumn("mx", mx)
        .filter(col("mx") > 0)
        .select(col("vec_id"), round(col("mx") / 127, 6).as("scale"),
          aggregate(q, lit(0L), (acc, x) => acc + x).as("checksum"),
          size(col("v")).as("dim"))
        .orderBy(col("vec_id"))
    }))

  /** Recall of an approximate ANN variant vs the brute-force exact
    * top-k, as a one-row (n_exact, recall_ok) summary. Runs BOTH
    * pipelines — an audit query costs two ANN queries by design. */
  private def annRecall(s: SparkSession, d: String,
      approxName: String, floor: Double): DataFrame = {
    val exact = queries("ann_bruteforce_topk")(s, d)
      .select(col("query_id"), col("neighbor"))
    val approx = queries(approxName)(s, d)
      .select(col("query_id"), col("neighbor"))
    val hits = exact.join(approx, Seq("query_id", "neighbor"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_exact"),
        (col("n_hit") >= col("n_exact") * floor).cast("int").as("recall_ok"))
  }

  // ---- product quantization helpers -------------------------------

  private val PqM = 8      // subspaces
  private val PqK = 16     // centroids per subspace (4-bit codes)
  private val PqRounds = 2 // Lloyd iterations training each codebook

  /** Deterministic Lloyd k-means over SUBSPACE rows `(id, m, sv)` — the
    * trainer behind both the PQ per-subspace codebooks (m = 0..7) and
    * the IVF coarse centroids (a single subspace, m = 0). Two design
    * constraints make it oracle-checkable, which plain
    * [[SemanticOps]].kmeans is not:
    *
    *  1. ORDER-INDEPENDENT averaging: coordinates are quantized to 1e-6
    *     integers (`floor(x*1e6 + 0.5)`) and summed as longs. Integer
    *     addition is associative+commutative, so the per-cluster sums —
    *     and therefore the new centroids `(sum.toDouble/n)/1e6` — are
    *     identical on every partitioning, every run, and in DuckDB SQL.
    *     (Double `avg` would differ in the last ulp per shuffle layout.)
    *  2. Deterministic assignment: distances round to 6 decimals before
    *     a first-index argmin — the same contract the PQ code columns
    *     already use, mirrored verbatim by `list_position(l, list_min(l))`
    *     in the oracle.
    *
    * Empty clusters keep their previous centroid (mirrored by the
    * oracle's COALESCE). Scale shape: assignment is map-side codegen'd
    * literal-distance math; each round is ONE (m, cluster, dim) partial
    * agg — k·M·dim result rows — nothing per-row ever collects. */
  private[ops] def trainSubspaceKmeans(subs: DataFrame,
      init: Array[Array[Array[Double]]], rounds: Int)
      : Array[Array[Array[Double]]] = {
    var cents = init
    for (_ <- 1 to rounds) {
      // per-row assignment: CaseWhen on m (lazy — only the matching
      // subspace's 16 distances evaluate), argmin over rounded dists
      val assign = (0 until cents.length).map { m =>
        val dists = array(cents(m).indices.map(k =>
          round(sqDist(col("sv"), lit(cents(m)(k))), 6)): _*)
        (col("m") === m, (array_position(dists, array_min(dists)) - 1))
      }.foldRight(lit(null).cast("long")) { case ((c, v), e) => when(c, v).otherwise(e) }
      val sums = subs.withColumn("c", assign)
        .select(col("m"), col("c"), posexplode(transform(col("sv"),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")))
          .as(Seq("dim", "xi")))
        .groupBy(col("m"), col("c"), col("dim"))
        .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(r => (r.getInt(0), r.getLong(1).toInt))
      cents = Array.tabulate(cents.length) { m =>
        Array.tabulate(cents(m).length) { k =>
          byCell.get((m, k)) match {
            case Some(rows) =>
              val c = cents(m)(k).clone()
              rows.foreach(r =>
                c(r.getInt(2)) = (r.getLong(3).toDouble / r.getLong(4)) / 1e6)
              c
            case None => cents(m)(k)
          }
        }
      }
    }
    cents
  }

  /** TRAINED PQ codebook (k-means per subspace — Jégou et al. 2011 §II:
    * the codebook is supposed to be a k-means solution, not a sample):
    * init from the deterministic modulo sample, then [[PqRounds]] Lloyd
    * iterations via [[trainSubspaceKmeans]] — all training arithmetic is
    * order-independent, so the DuckDB oracle recomputes the SAME
    * codebook by unrolling the rounds in SQL. Collected once (≤ 16 × dim
    * doubles — far under the plan-literal limit) and memoized per
    * (session, dir) — four queries (codes, both reranks, their audits)
    * would otherwise re-train it. Returns (subspace dim, stitched
    * full-dim codebook vectors — entry k = concat of each subspace's
    * centroid k, so downstream slicing per m is unchanged). */
  private val pqCbCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), (Int, Array[Seq[Double]])]
  private def pqCodebook(s: SparkSession, d: String): (Int, Array[Seq[Double]]) =
    pqCodebookOn(s, d, vecs(s, d), tag = "all")

  /** Same training over an arbitrary population — see [[ivfCentroidsOn]]. */
  private def pqCodebookOn(s: SparkSession, d: String, base: DataFrame,
      tag: String): (Int, Array[Seq[Double]]) =
    pqCbCache.computeIfAbsent((s, d, tag), { _ =>
      val dim = embDim(s, d)
      // a dim not divisible by M would silently drop the tail dims from
      // codes and reconstruction (integer floor) while the SQL oracle's
      // rounding picks a DIFFERENT subspace width — fail loudly instead
      require(dim % PqM == 0,
        s"PQ requires embedding dim divisible by $PqM, got $dim")
      val sd = dim / PqM
      val sample = base.filter(col("vec_id") % 31 === 7)
        .orderBy(col("vec_id")).limit(PqK)
        .select(col("v")).collect().map(_.getSeq[Double](0))
      val init = Array.tabulate(PqM) { m =>
        sample.map(v => v.slice(m * sd, m * sd + sd).toArray)
      }
      val subs = base.select(col("vec_id"),
        posexplode(array((0 until PqM).map(m =>
          slice(col("v"), m * sd + 1, sd)): _*)).as(Seq("m", "sv")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val trained =
        try trainSubspaceKmeans(subs, init, PqRounds)
        finally subs.unpersist()
      val k = sample.length
      val cb: Array[Seq[Double]] = Array.tabulate(k) { ki =>
        (0 until PqM).flatMap(m => trained(m)(ki)).toList
      }
      (sd, cb)
    })

  /** Memoized + persisted (vec_id, reconstructed vector, ||r||²) coded
    * frame — ann_pq_rerank and its recall audit consume the identical
    * encoding, and at 100 TB the codes are a materialized index, not a
    * per-query recompute (same rationale as [[lshVerifiedPairs]]). */
  private val pqCodedCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]
  private def pqCoded(s: SparkSession, d: String): DataFrame =
    pqCodedCache.computeIfAbsent((s, d), { _ =>
      val (sd, cb) = pqCodebook(s, d)
      vecs(s, d).select(col("vec_id") +: pqCodeCols(cb, sd): _*)
        .withColumn("r", pqReconOf(cb, sd))
        .select(col("vec_id"), col("r"), dot(col("r"), col("r")).as("rr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Squared distance as a left-fold over the zipped difference — the
    * identical summation order DuckDB's list_sum uses, so the rounded
    * result matches the oracle bit-for-bit. (Shared with SemanticOps'
    * k-means, which relies on the same contract.) */
  /** Served by the native [[graft.sparql.SqDistExpr]] (one loop per
    * pair, no intermediate array); [[sqDistHof]] is the retained
    * parity witness — identical accumulation order, so the rounded
    * distances every oracle replays are untouched. */
  private[graft] def sqDist(a: Column, b: Column): Column =
    graft.sparql.VectorFunctions.vec_sqdist(a, b)

  private[graft] def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** One 0..15 code column per subspace (`c0`..`c7`): rounded distances
    * to each codebook entry, argmin by first index. */
  private def pqCodeCols(cb: Array[Seq[Double]], sd: Int): Seq[Column] =
    (0 until PqM).map { m =>
      val dists = array(cb.toIndexedSeq.map { cv =>
        round(sqDist(slice(col("v"), m * sd + 1, sd),
          lit(cv.slice(m * sd, m * sd + sd).toArray)), 6)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("long").as(s"c$m")
    }

  /** Reconstructed vector from the `c0`..`c7` code columns: per
    * subspace, `element_at` into the 16-entry codebook literal, then
    * flatten — all inside the codegen span, no join against a codebook
    * table. */
  private def pqReconOf(cb: Array[Seq[Double]], sd: Int): Column = {
    val cbLit = (0 until PqM).map { m =>
      array(cb.toIndexedSeq.map(v =>
        lit(v.slice(m * sd, m * sd + sd).toArray)): _*)
    }
    flatten(array((0 until PqM).map(m =>
      element_at(cbLit(m), col(s"c$m").cast("int") + 1)): _*))
  }

  /** The front half of every ADC search: `adc` holds (vec_id, r, rr,
    * query_id, qv, qn) candidate rows; keep the top-`depth` by
    * approximate distance per query, join the true vectors back and
    * exact-cosine score them. Returns (query_id, vec_id, cos) — NOT cut
    * to a final k, so hard-negative mining can apply its cluster
    * exclusion between the re-rank and the cut. */
  private def adcRerank(s: SparkSession, d: String, adc: DataFrame,
      depth: Int): DataFrame = {
    // the candidate window scales with the corpus (see adcDepthFor) —
    // this is the single funnel every ADC path passes through, so the
    // Spark side and every ivfadc SQL oracle stay depth-consistent
    val effDepth = adcDepthFor(s, d, depth)
    val scored = adc.withColumn("adist",
      round(col("rr") - lit(2.0) * dot(col("r"), col("qv")), 6))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id"))
    val cands = scored.withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= effDepth)
      .select(col("query_id"), col("vec_id"), col("qv"), col("qn"))
    cands.join(vecsN(s, d), "vec_id")
      .withColumn("cos",
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
      .select(col("query_id"), col("vec_id"), col("cos"))
  }

  /** ADC ranking + exact re-rank shared by the PQ variants: the
    * re-rank front half cut to the exact-cosine top-`finalDepth`. */
  private def adcTop5(s: SparkSession, d: String, adc: DataFrame,
      depth: Int = 50, finalDepth: Int = 5): DataFrame = {
    val rer = adcRerank(s, d, adc, depth)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    rer.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= finalDepth)
      .select(col("query_id"), col("rn"), col("vec_id").as("neighbor"),
        col("cos"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** INDEX-SERVED ANN for other operators (hybrid retrieval's dense
    * side): top-`finalDepth` exact-reranked neighbors for an arbitrary
    * query population, searched through the memoized PERSISTED
    * cell-partitioned IVFADC index — the scan a probe pays is
    * `probes`/`cells` partition directories of 8-byte codes, never the
    * corpus (the plan shows the cell partition filter; PLANS.md). The
    * index is built once per (session, corpus) and reused across
    * queries — the production build-once/serve-many lifecycle, and the
    * reason hybrid retrieval survives a 100x corpus where a broadcast
    * nested-loop exact-cosine scan does not. */
  private val servedIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  /** Build-or-reuse the memoized persisted index; returns its directory
    * (callers may drop auxiliary underscore-prefixed files — e.g.
    * `_tombstones` — beside the cell partitions; the parquet file index
    * skips them). */
  private def servedIndexDir(s: SparkSession, d: String): String = {
    val base = vecsN(s, d)
    val centroids = ivfCentroids(s, d, ivfCellsFor(base.count()))
    val (sd, cb) = pqCodebook(s, d)
    servedIndexCache.computeIfAbsent((s, d), { _ =>
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-ivfserve-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(p)
      base
        .withColumn("cell",
          element_at(ivfCellsOf(centroids, keep = 1), 1).cast("int"))
        .select(col("vec_id") +: col("cell") +: pqCodeCols(cb, sd): _*)
        .write.mode("overwrite").partitionBy("cell").parquet(p)
      p
    })
  }

  /** Cell-pruned ADC candidate frame from the persisted index for an
    * arbitrary query population — the shared scan of every index-served
    * consumer. */
  private def servedAdcFrame(s: SparkSession, d: String,
      queryPred: Column => Column,
      tombstones: Option[DataFrame]): DataFrame = {
    val base = vecsN(s, d)
    val cells = ivfCellsFor(vecCount(s, d))
    val probes = ivfProbesFor(s, cells)
    val centroids = ivfCentroids(s, d, cells)
    val (sd, cb) = pqCodebook(s, d)
    val dir = servedIndexDir(s, d)
    val codedRaw = s.read.parquet(dir)
    // removal requests never rewrite a code file: the tombstone set
    // (tiny — it is the opt-out list) broadcasts into an anti-join over
    // the cell-pruned scan, and compaction can fold it in later
    val codedLive = tombstones.fold(codedRaw)(t =>
      codedRaw.join(broadcast(t.select(col("vec_id"))), Seq("vec_id"),
        "left_anti"))
    val coded = codedLive
      .withColumn("r", pqReconOf(cb, sd))
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        col("r"), dot(col("r"), col("r")).as("rr"))
    val qvecs = base.filter(queryPred(col("vec_id")))
      .withColumn("cell", explode(ivfCellsOf(centroids, keep = probes)))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell").cast("int").as("cell"))
    coded.join(broadcast(qvecs), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
  }

  /** Effective ADC candidate window: the passed `floor` (the bench-SF
    * depth the oracles also floor at) grown to 1/8 of the corpus —
    * a fixed FRACTION, not a fixed count. The sf1 rehearsal showed the
    * window is the recall-bearing knob at scale: a FIXED 250 is 12.5%
    * of the bench corpus but 1.25% at 10×, and dense recall on
    * rotation-grown data fell 0.7→0.37 (0.39 even with probes
    * exhausted); at the bench fractions (probes=cells/2, depth=n/8)
    * 10× recall reads 0.81. Every ivfadc SQL oracle computes the SAME
    * `greatest(floor, ceil(n/8))` from its own count, so Spark and
    * oracle stay bit-consistent at every SF; at sf0.01/sf0.1 the floor
    * binds and nothing changes. `spark.graft.ivf.adcDepth` overrides
    * for measurement sweeps (the oracle does NOT see the conf — run
    * the correctness gate with it unset). */
  private def adcDepthFor(s: SparkSession, d: String, floor: Int): Int =
    scala.util.Try(s.conf.get("spark.graft.ivf.adcDepth")).toOption
      .flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(math.max(floor, ((vecCount(s, d) + 7) / 8).toInt))

  private val vecCountCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), java.lang.Long]
  private[ops] def vecCount(s: SparkSession, d: String): Long =
    vecCountCache.computeIfAbsent((s, d), _ => vecsN(s, d).count())

  private[ops] def ivfadcServedRanks(s: SparkSession, d: String,
      queryPred: Column => Column, adcDepth: Int,
      finalDepth: Int, tombstones: Option[DataFrame] = None): DataFrame =
    adcTop5(s, d, servedAdcFrame(s, d, queryPred, tombstones),
      adcDepth, finalDepth)

  /** Exact-reranked index-served candidates (query_id, vec_id, cos) at
    * `adcDepth`, NOT cut to a final k — hard-negative mining applies
    * its transitive-cluster exclusion between this and the cut. */
  private[ops] def ivfadcServedRerank(s: SparkSession, d: String,
      queryPred: Column => Column, adcDepth: Int): DataFrame =
    adcRerank(s, d, servedAdcFrame(s, d, queryPred, None), adcDepth)

  /** IVF cells: deterministic coarse centroids TRAINED by the same
    * order-independent Lloyd k-means as the PQ codebooks (modulo-sample
    * init, [[PqRounds]] rounds), each vector assigned to its min-L2
    * centroid. Memoized per (session, dir): ann_ivf_bucketed,
    * ann_ivfpq_bucketed and both recall audits share one training run —
    * and at 100 TB the centroids are a stored model artifact, not a
    * per-query recompute. */
  private val IvfCells = 8
  private val IvfProbes = 8

  private val ivfCbCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), Array[Array[Double]]]
  private def ivfCentroids(s: SparkSession, d: String,
      cells: Int): Array[Array[Double]] =
    ivfCentroidsOn(s, d, vecs(s, d), cells, tag = "all")

  /** Same training over an arbitrary population — the append lifecycle
    * trains on the base corpus only, then FREEZES the model for later
    * arrivals. Memoized per (session, dir, tag). */
  private def ivfCentroidsOn(s: SparkSession, d: String, base: DataFrame,
      cells: Int, tag: String): Array[Array[Double]] =
    ivfCbCache.computeIfAbsent((s, d, tag), { _ =>
      val init = base.filter(col("vec_id") % lit(31) === 7)
        .orderBy(col("vec_id")).limit(cells)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      // the full vector is ONE subspace (m = 0) of the shared trainer
      val subs = base.select(col("vec_id"),
        lit(0).as("m"), col("v").as("sv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try trainSubspaceKmeans(subs, Array(init), PqRounds)(0)
      finally subs.unpersist()
    })

  /** Probe-only IVF candidate-volume measurement over an ARBITRARY
    * vector frame (RetrievalScaleProbe's synthetic scaled corpora —
    * trained fresh, never memoized): returns (Σ probed-cell sizes over
    * queries, query count, corpus size). The first number is the ADC
    * scan volume an IVFADC search pays; queries × corpus is the brute
    * baseline it replaces. */
  private[ops] def ivfProbeVolume(emb: DataFrame, dim: Int): (Long, Long, Long) = {
    val (vols, n) = ivfProbeVolumes(emb, dim, Seq(250))
    val (vol, nq) = vols(250)
    (vol, nq, n)
  }

  /** Same measurement for SEVERAL query populations (one per vec_id
    * modulus) off ONE training run — ann search (% 250) and
    * hard-negative mining (% 28) share the index, so their candidate
    * volumes are probed together. Returns (mod -> (Σ probed-cell sizes,
    * query count), corpus size). */
  private[ops] def ivfProbeVolumes(emb: DataFrame, dim: Int,
      queryMods: Seq[Int]): (Map[Int, (Long, Long)], Long) = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val n = base.count()
    val cells = ivfCellsFor(n)
    val probes = ivfProbesFor(emb.sparkSession, cells)
    val init = base.filter(col("vec_id") % lit(31) === 7)
      .orderBy(col("vec_id")).limit(cells)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val subs = base.select(col("vec_id"), lit(0).as("m"), col("v").as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents =
      try trainSubspaceKmeans(subs, Array(init), PqRounds)(0)
      finally subs.unpersist()
    val assigned = base.withColumn("cell",
      element_at(ivfCellsOf(cents, keep = 1), 1))
    val cellSizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val vols = queryMods.map { mod =>
      val qprobes = base.filter(col("vec_id") % mod === 0)
        .withColumn("cell", explode(ivfCellsOf(cents, keep = probes)))
        .select(col("vec_id").as("query_id"), col("cell"))
      val vol = qprobes.join(cellSizes, "cell")
        .agg(sum(col("n"))).collect().head.getLong(0)
      val nq = base.filter(col("vec_id") % mod === 0).count()
      mod -> (vol, nq)
    }.toMap
    (vols, n)
  }

  /** Corpus-adaptive bucket parameters (round-6 scale fix, validated by
    * [[ScaleProbe]]): FIXED bucket counts make candidate volume
    * Θ(n²/buckets) — fine at one scale, quadratic at the next. The
    * IVF rule is the standard cells ≈ √(n/8) (probe cost per query
    * then grows ~√n, centroid pull stays a √n×dim broadcast, far from
    * the driver-literal limit); LSH signature bits grow with log₂ of
    * the per-band bucket target so expected bucket size stays ~125.
    * Both formulas return TODAY'S constants at the sf0.1 corpus
    * (n=2000 → 16 cells / 8 probes / 4 bits), so every committed
    * oracle, recall floor, and bench floor is set at test scale.
    * Probes = max(8, ceil(cells/2)) — see [[ivfProbesFor]]; a cluster
    * deployment trades probes for recall explicitly — the knob is
    * that one function. */
  private[ops] def ivfCellsFor(n: Long): Int =
    math.max(IvfCells, math.ceil(math.sqrt(n / 8.0)).toInt)

  /** Probes per IVF query: max(8, ceil(cells/2)) — half the cells,
    * the PROBED-FRACTION the 0.7 recall floor was measured at (bench
    * SF probes 8 of 16). The round-12 sf1 rehearsal demonstrated the
    * earlier cells/4 policy shrank that fraction as the corpus grew
    * and recall decayed with it on maximally-novel (rotation-grown)
    * data: 0.37 at 12/50; restoring the bench fractions (25/50 + the
    * n/8 ADC window) reads 0.81 at 10×. Identical to the old policy at
    * sf0.01/sf0.1 (floor binds), and every ivfadc SQL oracle computes
    * the same formula from its own cell count. The pruning win at
    * scale comes from cells ~ sqrt(n/8): probed candidates per query
    * are probes×n/cells ~ sqrt(n)/2-ish of the corpus, still shrinking
    * as a fraction. `spark.graft.ivf.probes` overrides for measurement
    * sweeps (clamped to [1, cells]; the oracle does not see the conf —
    * run the correctness gate with it unset). */
  private[ops] def ivfProbesFor(s: SparkSession, cells: Int): Int = {
    val default = math.max(IvfProbes, (cells + 1) / 2)
    scala.util.Try(s.conf.get("spark.graft.ivf.probes")).toOption
      .flatMap(_.toIntOption)
      .map(p => math.min(math.max(p, 1), cells))
      .getOrElse(default)
  }
  /** Integer form of ceil(log2(n/125)) — the smallest r with
    * 125·2^r >= n. Exact integer arithmetic instead of fp logs so the
    * SQL oracle (`ann_lsh_bucketed`) computes the identical width with
    * no ulp ambiguity at exact-power boundaries. */
  private[ops] def lshRowsFor(n: Long): Int =
    math.max(LshRows, (0 to 40).find(r => (125L << r) >= n).getOrElse(40))

  /** Cell assignment as a pure projection: the centroid set is a plan
    * LITERAL (cells × dim doubles), so per-vector scoring is `cells`
    * codegen'd dot products + an array_sort — no join against a
    * centroid table and, critically, no `Window.partitionBy(vec_id)`
    * shuffle carrying the full embedding arrays. At 100 TB the window
    * variant re-shuffles the whole corpus; this one is map-side only.
    * Scoring is squared-L2 via `|c|² − 2·v·c` (the |v|² term is constant
    * across cells, so the argmin is the true L2 assignment — consistent
    * with the L2 k-means that trained the centroids); cell id = the
    * centroid's training index. */
  private def ivfCellsOf(centroids: Array[Array[Double]],
      keep: Int): Column = {
    // struct(dist, cell) sorted ascending == (L2 ASC, cell ASC)
    val scored = array(centroids.zipWithIndex.map { case (cv, cell) =>
      val cc = cv.map(x => x * x).sum // |c|² folds to one literal
      struct((dot(col("v"), lit(cv)) * -2 + cc).as("dist"),
        lit(cell).as("cell"))
    }.toIndexedSeq: _*)
    transform(slice(array_sort(scored), 1, keep), x => x.getField("cell"))
  }

  // 16 bands x 4 hyperplane bits per band. P(candidate) for angle θ:
  // 1-(1-(1-θ/π)^4)^16 — raised from 8 bands in round 8 so the top-5
  // neighbors (θ typically 40-60° on this corpus) collide with ≥ 0.7
  // probability, matching the pinned recall floor; candidate volume
  // doubles but stays a (band, sig) equi-join.
  private val LshBands = 16
  private val LshRows = 4

  /** Max embedding dimension the literal hyperplanes cover. `vec_dot`
    * stops at the shorter array, so vectors of any dim <= this work;
    * longer embeddings would need a bigger constant. */
  private val LshMaxDim = 1024

  /** Deterministic +-1 hyperplane for plane `p` — seeded PRNG, no stored
    * model, identical on every executor and run. `dim` trims the plane
    * to the data's actual dimension: the PRNG stream prefix is the
    * same, so signatures are IDENTICAL to the untrimmed planes, but the
    * plan literal shrinks from 1024 doubles per plane (64 planes ≈
    * 0.5 MB of literals per signature expression — the dominant cost of
    * generating and janino-compiling these stages) to dim doubles. */
  private def planeVec(p: Int, dim: Int): Array[Double] = {
    val rnd = new java.util.Random(0x9E3779B97F4A7C15L * (p + 1))
    Array.fill(math.min(dim, LshMaxDim))(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** The embedding dimension of `d`'s embeddings table — one driver-side
    * single-row probe, memoized per (session, dir). */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Integer]
  private[ops] def embDim(s: SparkSession, d: String): Int =
    dimCache.computeIfAbsent((s, d), { _ =>
      Tables.embeddings(s, d).select(size(col("embedding"))).head.getInt(0)
    })

  /** 32 bands × 2 sign bits, packed into one LONG per vector — the
    * threshold-join variant of [[lshBands]]. One narrow column carries
    * the whole signature, so the band self-join below stays 4 slim
    * columns wide and the first-shared-band dedup is pure bit math. */
  private val Pack2Bands = 32
  private[ops] def lshPack2(v: Column, dim: Int): Column =
    (0 until Pack2Bands * 2).map { p =>
      shiftleft(when(dot(v, lit(planeVec(p, dim))) > 0, 1L).otherwise(0L), p)
    }.reduce(_ bitwiseOR _)

  /** The 32 2-bit signatures of a pack, for `posexplode`. */
  private[ops] def packSigs(pack: Column): Column =
    array((0 until Pack2Bands).map(b =>
      shiftright(pack, 2 * b).bitwiseAND(lit(3L))): _*)

  /** Lowest band whose 2 signature bits agree between two packs. A
    * colliding pair is kept only in this band, making emission
    * exactly-once WITHOUT a pair-level distinct (no extra shuffle). */
  private[ops] def firstSharedBand(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    coalesce((0 until Pack2Bands).map(bd =>
      when(shiftright(x, 2 * bd).bitwiseAND(lit(3L)) === 0L, lit(bd))): _*)
  }

  /** Banded random-hyperplane signatures: array of one r-bit signature
    * per band. Each sign bit is a single codegen'd `vec_dot` against a
    * literal plane — NOT a per-element lambda: higher-order-function
    * lambdas evaluate interpreted and re-hash per element, which made
    * this the slowest expression in the engine before the rewrite. */
  def lshBands(v: Column, dim: Int, rows: Int = LshRows): Column = {
    def bit(p: Int): Column =
      when(dot(v, lit(planeVec(p, dim))) > 0, 1).otherwise(0)
    array((0 until LshBands).map { b =>
      (0 until rows).map(r => bit(b * rows + r) * (1 << r))
        .reduce(_ + _)
    }: _*)
  }

  /** The deterministic PQ codebook training + code assignment unrolled
    * in SQL — shared by the embed_pq_codes and ann_pq_rerank oracles.
    * `c2` holds the trained per-(m, k) subspace centroids; `codes` the
    * per-(vec, m) 4-bit code. */
  private def pqTrainCtes(trainPred: String = "TRUE"): String =
    s"""p AS (SELECT CAST(max(len(embedding)) // 8 AS INT) AS sd
                    FROM embeddings),
          ms AS (SELECT unnest(range(0, 8)) AS m),
          di AS (SELECT unnest(range(1, (SELECT sd FROM p) + 1)) AS i),
          sub AS (
            SELECT e.vec_id, ms.m,
              list_transform(range(1, p.sd + 1),
                i -> CAST(e.embedding[ms.m * p.sd + i] AS DOUBLE)) AS sv
            FROM embeddings e CROSS JOIN p CROSS JOIN ms),
          subtr AS (SELECT * FROM sub WHERE $trainPred),
          c0 AS (
            SELECT ms.m,
              row_number() OVER (PARTITION BY ms.m ORDER BY t.vec_id) - 1 AS k,
              list_transform(range(1, p.sd + 1),
                i -> CAST(t.embedding[ms.m * p.sd + i] AS DOUBLE)) AS cv
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id % 31 = 7 AND ($trainPred)
                  ORDER BY vec_id LIMIT 16) t
            CROSS JOIN p CROSS JOIN ms),
          a1 AS (
            SELECT vec_id, m,
              CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT s.vec_id, s.m, list(round(list_sum(
                    list_transform(range(1, p.sd + 1),
                      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM subtr s CROSS JOIN p JOIN c0 c ON c.m = s.m
                  GROUP BY s.vec_id, s.m) t),
          u1 AS (
            SELECT a.m, a.c AS k, di.i AS dim,
              sum(CAST(floor(s.sv[di.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
              count(*) AS n
            FROM a1 a
            JOIN subtr s ON s.vec_id = a.vec_id AND s.m = a.m
            CROSS JOIN di
            GROUP BY a.m, a.c, di.i),
          c1 AS (
            SELECT c0.m, c0.k, COALESCE(n1.cv, c0.cv) AS cv
            FROM c0 LEFT JOIN
              (SELECT m, k,
                 list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
               FROM u1 GROUP BY m, k) n1
            ON n1.m = c0.m AND n1.k = c0.k),
          a2 AS (
            SELECT vec_id, m,
              CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT s.vec_id, s.m, list(round(list_sum(
                    list_transform(range(1, p.sd + 1),
                      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM subtr s CROSS JOIN p JOIN c1 c ON c.m = s.m
                  GROUP BY s.vec_id, s.m) t),
          u2 AS (
            SELECT a.m, a.c AS k, di.i AS dim,
              sum(CAST(floor(s.sv[di.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
              count(*) AS n
            FROM a2 a
            JOIN subtr s ON s.vec_id = a.vec_id AND s.m = a.m
            CROSS JOIN di
            GROUP BY a.m, a.c, di.i),
          c2 AS (
            SELECT c1.m, c1.k, COALESCE(n2.cv, c1.cv) AS cv
            FROM c1 LEFT JOIN
              (SELECT m, k,
                 list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
               FROM u2 GROUP BY m, k) n2
            ON n2.m = c1.m AND n2.k = c1.k),
          codes AS (
            SELECT vec_id, m,
              CAST(list_position(l, list_min(l)) - 1 AS BIGINT) AS c
            FROM (SELECT s.vec_id, s.m, list(round(list_sum(
                    list_transform(range(1, p.sd + 1),
                      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM sub s CROSS JOIN p JOIN c2 c ON c.m = s.m
                  GROUP BY s.vec_id, s.m) t)"""

  /** The deterministic IVF coarse-centroid training unrolled in SQL —
    * shared by the embed_ivf_cells and ann_ivf_bucketed oracles. `c2`
    * holds the trained (k, cv) centroids, `kk.k` the adaptive cell
    * count, `v` the double-widened vectors. */
  private def ivfTrainCtes(trainPred: String = "TRUE"): String =
    s"""vp AS (SELECT CAST(max(len(embedding)) AS INT) AS dm
                    FROM embeddings),
          vdi AS (SELECT unnest(range(1, (SELECT dm FROM vp) + 1)) AS i),
          vv AS (
            SELECT e.vec_id,
              list_transform(range(1, vp.dm + 1),
                i -> CAST(e.embedding[i] AS DOUBLE)) AS v
            FROM embeddings e CROSS JOIN vp),
          vvtr AS (SELECT * FROM vv WHERE $trainPred),
          kk AS (SELECT greatest(8,
                   CAST(ceil(sqrt(count(*) / 8.0)) AS INT)) AS k
                 FROM embeddings WHERE $trainPred),
          vc0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
            FROM (SELECT vec_id, v FROM vv
                  WHERE vec_id % 31 = 7 AND ($trainPred) ORDER BY vec_id
                  LIMIT (SELECT k FROM kk)) t),
          va1 AS (
            SELECT vec_id, CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT x.vec_id, list(round(list_sum(
                    list_transform(range(1, vp.dm + 1),
                      i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM vvtr x CROSS JOIN vp CROSS JOIN vc0 c
                  GROUP BY x.vec_id) t),
          vu1 AS (
            SELECT a.c AS k, vdi.i AS dim,
              sum(CAST(floor(x.v[vdi.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
              count(*) AS n
            FROM va1 a JOIN vvtr x ON x.vec_id = a.vec_id
            CROSS JOIN vdi GROUP BY a.c, vdi.i),
          vc1 AS (
            SELECT vc0.k, COALESCE(n1.cv, vc0.cv) AS cv
            FROM vc0 LEFT JOIN
              (SELECT k,
                 list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
               FROM vu1 GROUP BY k) n1 ON n1.k = vc0.k),
          va2 AS (
            SELECT vec_id, CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT x.vec_id, list(round(list_sum(
                    list_transform(range(1, vp.dm + 1),
                      i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM vvtr x CROSS JOIN vp CROSS JOIN vc1 c
                  GROUP BY x.vec_id) t),
          vu2 AS (
            SELECT a.c AS k, vdi.i AS dim,
              sum(CAST(floor(x.v[vdi.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
              count(*) AS n
            FROM va2 a JOIN vvtr x ON x.vec_id = a.vec_id
            CROSS JOIN vdi GROUP BY a.c, vdi.i),
          vc2 AS (
            SELECT vc1.k, COALESCE(n2.cv, vc1.cv) AS cv
            FROM vc1 LEFT JOIN
              (SELECT k,
                 list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
               FROM vu2 GROUP BY k) n2 ON n2.k = vc1.k)"""

  /** The full IVFADC search recomputed in SQL, parameterized by the
    * TRAINING population (the append lifecycle trains on the base
    * corpus only and freezes the model): both training CTE blocks take
    * `trainPred`; the encode/search population stays the whole corpus.
    * `queryPred` picks the query points (a predicate over `vec_id`);
    * the block's final CTE `rer` holds (query_id, neighbor, cos) exact
    * re-ranked candidates — callers rank/cut it themselves, so hybrid
    * retrieval can reuse the whole search at a different depth. */
  private[ops] def ivfadcSearchCtes(trainPred: String,
      queryPred: String, adcDepth: Int,
      candPred: String = "TRUE"): String =
      s"""${pqTrainCtes(trainPred)},
          ${ivfTrainCtes(trainPred)},
          scored AS (
            SELECT x.vec_id, c.k AS cell,
              list_sum(list_transform(range(1, vp.dm + 1),
                i -> x.v[i] * c.cv[i])) * -2
              + list_sum(list_transform(c.cv, y -> y * y)) AS ad
            FROM vv x CROSS JOIN vp CROSS JOIN vc2 c),
          ranked AS (
            SELECT vec_id, cell, ad,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY ad, cell) AS rnk
            FROM scored),
          cells AS (SELECT vec_id, cell FROM ranked WHERE rnk = 1),
          qprobes AS (
            SELECT vec_id AS query_id, cell FROM ranked
            WHERE ($queryPred)
              AND rnk <= (SELECT greatest(8, (k + 1) // 2) FROM kk)),
          recon AS (
            SELECT co.vec_id, flatten(list(c.cv ORDER BY co.m)) AS r
            FROM codes co JOIN c2 c ON c.m = co.m AND c.k = co.c
            GROUP BY co.vec_id),
          adc AS (
            SELECT q2.query_id, b.vec_id,
              round(list_sum(list_transform(r.r, x -> x * x))
                - 2.0 * list_sum(list_transform(range(1, vp.dm + 1),
                    i -> r.r[i] * q.v[i])), 6) AS adist
            FROM qprobes q2
            JOIN cells b ON b.cell = q2.cell
            JOIN recon r ON r.vec_id = b.vec_id
            JOIN vv q ON q.vec_id = q2.query_id
            CROSS JOIN vp
            WHERE b.vec_id <> q2.query_id
              AND (${candPred.replace("vec_id", "b.vec_id")})),
          top AS (
            SELECT query_id, vec_id FROM (
              SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY adist, vec_id) AS arn
              FROM adc) t
            WHERE arn <= greatest($adcDepth,
              (SELECT (count(*) + 7) // 8 FROM vv))),
          rer AS (
            SELECT t.query_id, t.vec_id AS neighbor,
              round(CAST(list_cosine_similarity(qe.embedding, be.embedding)
                AS DOUBLE), 4) AS cos
            FROM top t
            JOIN embeddings qe ON qe.vec_id = t.query_id
            JOIN embeddings be ON be.vec_id = t.vec_id)"""

  private def ivfadcOracle(trainPred: String,
      candPred: String = "TRUE"): String =
      s"""WITH ${ivfadcSearchCtes(trainPred, "vec_id % 250 = 0", 250, candPred)}
         SELECT query_id, CAST(rn AS INT) AS rn, neighbor, cos FROM (
           SELECT query_id, neighbor, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor) AS rn
           FROM rer) t
         WHERE rn <= 5 ORDER BY query_id, rn"""

  private val baseOracleSql: Map[String, String] = Map(
    // the full INDEX-SERVED mining pipeline replayed end-to-end: the
    // whole IVFADC search (both trainings, probe policy, ADC over
    // reconstructed codes, exact-cosine re-rank at depth 250 — the
    // shared search CTEs), PLUS the >=0.45 pair graph → recursive
    // min-label closure (dedup_clusters' rep rule) → same-cluster
    // exclusion applied between the re-rank and the top-5 cut
    "embed_hard_negatives" ->
      s"""WITH RECURSIVE pairs AS (
           SELECT a.vec_id AS i, b.vec_id AS j
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
         bi AS (SELECT i AS a, j AS b FROM pairs
                UNION SELECT j, i FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM bi
           UNION
           SELECT r.a, e.b FROM reach r JOIN bi e ON r.b = e.a),
         cl AS (SELECT a AS id, least(a, min(b)) AS rep
                FROM reach GROUP BY a),
         ${ivfadcSearchCtes("TRUE", "vec_id % 28 = 0", 250)},
         kept AS (
           SELECT s.query_id, s.neighbor, s.cos,
             row_number() OVER (PARTITION BY s.query_id
               ORDER BY s.cos DESC, s.neighbor) AS rn
           FROM rer s
           LEFT JOIN cl cq ON cq.id = s.query_id
           LEFT JOIN cl cn ON cn.id = s.neighbor
           WHERE coalesce(cq.rep, s.query_id)
                 <> coalesce(cn.rep, s.neighbor))
         SELECT query_id, CAST(rn AS INT) AS rank, neighbor, cos
         FROM kept WHERE rn <= 5 ORDER BY query_id, rank""",
    // the audit fully REPLAYED (ADVICE r11): the exact brute-force
    // pass (scored, excluded, cut — the same contract as the Spark
    // side's hardNegatives), the index-served pass (the shared search
    // CTEs + closure exclusion), and the recall comparison itself —
    // n_exact and recall_ok are DERIVED, not fixture constants, so a
    // fixture or k change surfaces as a recall failure, not an opaque
    // hash mismatch
    "embed_hard_negatives_audit" ->
      s"""WITH RECURSIVE pairs AS (
           SELECT a.vec_id AS i, b.vec_id AS j
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45),
         bi AS (SELECT i AS a, j AS b FROM pairs
                UNION SELECT j, i FROM pairs),
         reach(a, b) AS (
           SELECT a, b FROM bi
           UNION
           SELECT r.a, e.b FROM reach r JOIN bi e ON r.b = e.a),
         cl AS (SELECT a AS id, least(a, min(b)) AS rep
                FROM reach GROUP BY a),
         ${ivfadcSearchCtes("TRUE", "vec_id % 28 = 0", 250)},
         served AS (
           SELECT query_id, neighbor FROM (
             SELECT s.query_id, s.neighbor,
               row_number() OVER (PARTITION BY s.query_id
                 ORDER BY s.cos DESC, s.neighbor) AS rn
             FROM rer s
             LEFT JOIN cl cq ON cq.id = s.query_id
             LEFT JOIN cl cn ON cn.id = s.neighbor
             WHERE coalesce(cq.rep, s.query_id)
                   <> coalesce(cn.rep, s.neighbor)) t
           WHERE rn <= 5),
         ex_scored AS (
           SELECT q.vec_id AS query_id, b.vec_id AS neighbor,
             round(CAST(list_cosine_similarity(q.embedding, b.embedding)
               AS DOUBLE), 4) AS cos
           FROM embeddings q JOIN embeddings b ON b.vec_id <> q.vec_id
           WHERE q.vec_id % 28 = 0),
         ex_kept AS (
           SELECT query_id, neighbor FROM (
             SELECT s.query_id, s.neighbor,
               row_number() OVER (PARTITION BY s.query_id
                 ORDER BY s.cos DESC, s.neighbor) AS rn
             FROM ex_scored s
             LEFT JOIN cl cq ON cq.id = s.query_id
             LEFT JOIN cl cn ON cn.id = s.neighbor
             WHERE coalesce(cq.rep, s.query_id)
                   <> coalesce(cn.rep, s.neighbor)) t
           WHERE rn <= 5),
         hits AS (
           SELECT e.query_id FROM ex_kept e JOIN served v
           ON v.query_id = e.query_id AND v.neighbor = e.neighbor)
         SELECT CAST((SELECT count(*) FROM ex_kept) AS BIGINT) AS n_exact,
           CAST(CASE WHEN (SELECT count(*) FROM hits)
                 >= 0.7 * (SELECT count(*) FROM ex_kept)
               THEN 1 ELSE 0 END AS INT) AS recall_ok""",
    "embed_neardup" ->
      """SELECT a.vec_id AS i, b.vec_id AS j,
           round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
         ORDER BY i, j""",
    "embed_neardup_bruteforce" ->
      """SELECT a.vec_id AS i, b.vec_id AS j,
           round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
         ORDER BY i, j""",
    "ann_bruteforce_topk" ->
      """SELECT query_id, CAST(rn AS INT) AS rn, neighbor, cos FROM (
           SELECT q.vec_id AS query_id, b.vec_id AS neighbor,
             round(CAST(list_cosine_similarity(q.embedding, b.embedding) AS DOUBLE), 4) AS cos,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY round(CAST(list_cosine_similarity(q.embedding, b.embedding) AS DOUBLE), 4) DESC,
                        b.vec_id) AS rn
           FROM embeddings q JOIN embeddings b ON b.vec_id <> q.vec_id
           WHERE q.vec_id % 250 = 0) t
         WHERE rn <= 5 ORDER BY query_id, rn""",
    // the WHOLE LSH search recomputed: the ±1 hyperplanes are
    // java.util.Random(0x9E3779B97F4A7C15·(p+1)) nextBoolean streams —
    // a 48-bit LCG the recursive CTE replays exactly (HUGEINT for the
    // 83-bit intermediate product, top-of-48-bits sign per draw; the
    // bit-for-bit match is pinned in TrainingOpsSpec). Signature width
    // uses the integer 125·2^r >= n rule shared with lshRowsFor, bands
    // are fixed at 16, candidates collide on any (band, sig) key, and
    // the exact-cosine re-rank mirrors ann_bruteforce_topk's contract.
    "ann_lsh_bucketed" ->
      """WITH RECURSIVE
          lshn AS (SELECT count(*) AS n FROM embeddings),
          lshr AS (SELECT greatest(4,
              (SELECT min(r) FROM (SELECT unnest(range(0, 41)) AS r) t, lshn
               WHERE 125 * (CAST(1 AS BIGINT) << r) >= lshn.n)) AS rws),
          lshd AS (SELECT least(CAST(max(len(embedding)) AS INT), 1024) AS dm
                   FROM embeddings),
          lshp AS (SELECT unnest(range(0,
              16 * (SELECT rws FROM lshr))) AS p),
          lshgen(p, i, seed, w) AS (
            SELECT p, 0,
              xor(CAST((CAST(11400714819323198485 AS HUGEINT) * (p + 1))
                    % CAST(281474976710656 AS HUGEINT) AS BIGINT),
                  25214903917),
              CAST(NULL AS DOUBLE)
            FROM lshp
            UNION ALL
            SELECT p, i + 1,
              CAST((CAST(seed AS HUGEINT) * 25214903917 + 11)
                % CAST(281474976710656 AS HUGEINT) AS BIGINT),
              CASE WHEN CAST((CAST(seed AS HUGEINT) * 25214903917 + 11)
                  % CAST(281474976710656 AS HUGEINT) AS BIGINT)
                  >= 140737488355328 THEN 1.0 ELSE -1.0 END
            FROM lshgen WHERE i < (SELECT dm FROM lshd)),
          lshw AS (SELECT p, list(w ORDER BY i) AS w
                   FROM lshgen WHERE i >= 1 GROUP BY p),
          lshbits AS (
            SELECT e.vec_id,
              CAST(w.p // lshr.rws AS INT) AS band,
              CAST(w.p % lshr.rws AS INT) AS r,
              CASE WHEN list_sum(list_transform(
                  range(1, least(len(e.embedding), 1024) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * w.w[i])) > 0
                THEN 1 ELSE 0 END AS bit
            FROM embeddings e CROSS JOIN lshw w CROSS JOIN lshr),
          lshsig AS (
            SELECT vec_id, band,
              CAST(sum(bit * (1 << r)) AS BIGINT) AS sig
            FROM lshbits GROUP BY vec_id, band),
          lshcand AS (
            SELECT DISTINCT q.vec_id AS query_id, b.vec_id
            FROM lshsig q JOIN lshsig b
              ON b.band = q.band AND b.sig = q.sig
            WHERE q.vec_id % 250 = 0 AND b.vec_id <> q.vec_id),
          lshrer AS (
            SELECT c.query_id, c.vec_id AS neighbor,
              round(CAST(list_cosine_similarity(qe.embedding, be.embedding)
                AS DOUBLE), 4) AS cos
            FROM lshcand c
            JOIN embeddings qe ON qe.vec_id = c.query_id
            JOIN embeddings be ON be.vec_id = c.vec_id)
         SELECT query_id, CAST(rn AS INT) AS rn, neighbor, cos FROM (
           SELECT query_id, neighbor, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor) AS rn
           FROM lshrer) t
         WHERE rn <= 5 ORDER BY query_id, rn""",
    // query-point count is SQL (vec_id % 250 = 0), top-k depth is 5,
    // and the recall floor is a deterministic property of the fixed
    // planes/centroids on this dataset — so the audit row IS checkable
    "ann_lsh_recall" ->
      """SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
         FROM embeddings WHERE vec_id % 250 = 0""",
    "ann_ivf_recall" ->
      """SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
         FROM embeddings WHERE vec_id % 250 = 0""",
    // the WHOLE training recomputed: modulo-sample init, two unrolled
    // Lloyd rounds (assign → integer-quantized order-free averaging →
    // new centroids, empty cells keep the old centroid via COALESCE),
    // then the final code assignment — every arithmetic step mirrors
    // the Scala trainer exactly: float->double widening is exact,
    // subspace distances are left-fold double sums rounded to 6
    // decimals with first-index argmin, centroid means are
    // (CAST(sum AS DOUBLE)/n)/1e6 of bigint sums, so both engines
    // produce the identical codebook and identical 4-bit-packed codes
    "embed_pq_codes" ->
      s"""WITH ${pqTrainCtes()}
         SELECT vec_id,
           CAST(sum(c * (CAST(1 AS BIGINT) << CAST(4 * m AS INT)))
             AS BIGINT) AS code
         FROM codes GROUP BY vec_id ORDER BY vec_id""",
    // the full PQ+ADC SEARCH recomputed: trained per-subspace codebooks
    // and codes (shared CTE block), reconstruction as the flattened
    // m-ordered centroid concat (so the rr / r·q folds run in the same
    // element order as the engine's 64-dim left folds), ADC top-250 by
    // rounded approximate distance, exact-cosine re-rank top-5
    "ann_pq_rerank" ->
      s"""WITH ${pqTrainCtes()},
          dmt AS (SELECT CAST(max(len(embedding)) AS INT) AS dm
                  FROM embeddings),
          fv AS (
            SELECT e.vec_id,
              list_transform(range(1, d.dm + 1),
                i -> CAST(e.embedding[i] AS DOUBLE)) AS v
            FROM embeddings e CROSS JOIN dmt d),
          recon AS (
            SELECT co.vec_id, flatten(list(c.cv ORDER BY co.m)) AS r
            FROM codes co JOIN c2 c ON c.m = co.m AND c.k = co.c
            GROUP BY co.vec_id),
          adc AS (
            SELECT q.vec_id AS query_id, b.vec_id,
              round(list_sum(list_transform(b.r, x -> x * x))
                - 2.0 * list_sum(list_transform(range(1, d.dm + 1),
                    i -> b.r[i] * q.v[i])), 6) AS adist
            FROM recon b CROSS JOIN dmt d
            JOIN fv q ON q.vec_id % 250 = 0 AND b.vec_id <> q.vec_id),
          top AS (
            SELECT query_id, vec_id FROM (
              SELECT query_id, vec_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY adist, vec_id) AS arn
              FROM adc) t
            WHERE arn <= greatest(250,
              (SELECT (count(*) + 7) // 8 FROM fv))),
          rer AS (
            SELECT t.query_id, t.vec_id AS neighbor,
              round(CAST(list_cosine_similarity(qe.embedding, be.embedding)
                AS DOUBLE), 4) AS cos
            FROM top t
            JOIN embeddings qe ON qe.vec_id = t.query_id
            JOIN embeddings be ON be.vec_id = t.vec_id)
         SELECT query_id, CAST(rn AS INT) AS rn, neighbor, cos FROM (
           SELECT query_id, neighbor, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor) AS rn
           FROM rer) t
         WHERE rn <= 5 ORDER BY query_id, rn""",
    "ann_pq_recall" ->
      """SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
         FROM embeddings WHERE vec_id % 250 = 0""",
    "ann_ivfpq_recall" ->
      """SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
         FROM embeddings WHERE vec_id % 250 = 0""",
    // the flagship IVFADC composition recomputed end-to-end: BOTH
    // trainings (PQ codebooks + IVF coarse centroids — the two shared
    // CTE blocks), the probe policy, candidates restricted to probed
    // cells, ADC over the reconstructed codebook vectors, exact-cosine
    // re-rank top-5 — the full approximate index search, hash-checked
    "ann_ivfpq_bucketed" -> ivfadcOracle("TRUE"),
    // the IVF training recomputed end-to-end: corpus-adaptive cell
    // count (max(8, ceil(sqrt(n/8)))), modulo init, two unrolled Lloyd
    // rounds (round(dist,6) argmin, integer-quantized order-free
    // averaging, COALESCE for empty cells), then the engine's actual
    // assignment metric — UNROUNDED -2·v·c + |c|² (the |v|² term is
    // constant across cells) with first-index tie-break
    "embed_ivf_cells" ->
      s"""WITH ${ivfTrainCtes()}
         SELECT vec_id, CAST(list_position(l, list_min(l)) - 1 AS INT) AS cell
         FROM (SELECT x.vec_id, list(
                 list_sum(list_transform(range(1, vp.dm + 1),
                   i -> x.v[i] * c.cv[i])) * -2
                 + list_sum(list_transform(c.cv, y -> y * y))
                 ORDER BY c.k) AS l
               FROM vv x CROSS JOIN vp CROSS JOIN vc2 c
               GROUP BY x.vec_id) t
         ORDER BY vec_id""",
    // the full IVF SEARCH recomputed: trained cells (shared CTE block),
    // the engine's probe policy (max(8, ceil(cells/2)) nearest cells by
    // the same unrounded ADC metric), candidates from cell equality,
    // exact cosine re-rank top-5 — so the approximate search's exact
    // output is hash-checked, not just its recall floor
    "ann_ivf_bucketed" ->
      s"""WITH ${ivfTrainCtes()},
          scored AS (
            SELECT x.vec_id, c.k AS cell,
              list_sum(list_transform(range(1, vp.dm + 1),
                i -> x.v[i] * c.cv[i])) * -2
              + list_sum(list_transform(c.cv, y -> y * y)) AS ad
            FROM vv x CROSS JOIN vp CROSS JOIN vc2 c),
          ranked AS (
            SELECT vec_id, cell, ad,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY ad, cell) AS rnk
            FROM scored),
          cells AS (SELECT vec_id, cell FROM ranked WHERE rnk = 1),
          qprobes AS (
            SELECT vec_id AS query_id, cell FROM ranked
            WHERE vec_id % 250 = 0
              AND rnk <= (SELECT greatest(8, (k + 1) // 2) FROM kk)),
          cand AS (
            SELECT q.query_id, b.vec_id AS neighbor,
              round(CAST(list_cosine_similarity(qe.embedding, be.embedding)
                AS DOUBLE), 4) AS cos
            FROM qprobes q
            JOIN cells b ON b.cell = q.cell
            JOIN embeddings qe ON qe.vec_id = q.query_id
            JOIN embeddings be ON be.vec_id = b.vec_id
            WHERE b.vec_id <> q.query_id)
         SELECT query_id, CAST(rn AS INT) AS rn, neighbor, cos FROM (
           SELECT query_id, neighbor, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor) AS rn
           FROM cand) t
         WHERE rn <= 5 ORDER BY query_id, rn""",
    "embed_quantize" ->
      """SELECT vec_id, round(mx / 127, 6) AS scale,
           CAST(list_sum(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 127 / mx + 0.5) AS BIGINT)))
             AS BIGINT) AS checksum,
           CAST(len(embedding) AS INT) AS dim
         FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS mx
               FROM embeddings) t
         WHERE mx > 0 ORDER BY vec_id""")

  /** The persisted-index search must return BYTE-IDENTICAL rows to the
    * inline IVFADC pipeline — the on-disk roundtrip is not allowed to
    * change a single ranked neighbor — so it shares that oracle
    * verbatim. */
  def oracleSql: Map[String, String] =
    baseOracleSql +
      ("ann_ivfpq_persisted" -> baseOracleSql("ann_ivfpq_bucketed")) +
      ("ann_ivfpq_append" -> ivfadcOracle("vec_id % 5 <> 0")) +
      // streaming ingest ends in the SAME index state as the batch
      // append — micro-batch boundaries must be invisible in the search
      ("stream_ann_ingest" -> ivfadcOracle("vec_id % 5 <> 0")) +
      // full-corpus model, tombstoned candidates excluded from ADC
      ("ann_index_delete" -> ivfadcOracle("TRUE", "vec_id % 17 <> 3"))
}
