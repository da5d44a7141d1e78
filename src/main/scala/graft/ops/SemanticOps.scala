package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Embedding-space corpus curation (engine extension, SURVEY.md §2.8):
  * SemDeDup-style semantic deduplication and a deterministic Lloyd
  * k-means — the clustering a 100 TB pipeline runs to balance domains
  * and to scope semantic dedup to within-cluster comparisons.
  *
  * Scale shape: candidate pairs come from the packed banded-LSH
  * equi-join shared with [[Similarity]] (never an all-pairs NLJ over
  * the base); k-means keeps the centroid set driver-side as plan
  * literals (k × dim doubles, bounded), so assignment is map-side
  * codegen'd dot products and each Lloyd round is ONE partial-agg
  * shuffle keyed on (cluster, dim) — nothing per-row ever collects.
  */
object SemanticOps {

  import Similarity.{dot, vecsN}

  /** Greedy-by-id semantic dedup (the SemDeDup rule with document order
    * as priority): drop a vector when ANY lower-id vector is within the
    * cosine threshold — transitivity-free, so it is expressible as one
    * anti-join and the result is order-independent. */
  private val CosThreshold = 0.45

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- semantic dedup over the embedding column. Candidates from the
    // 32-band packed sign-LSH self-join (first-shared-band emission —
    // each candidate pair exactly once, no pair-level distinct), exact
    // cosine verify, then one anti-join marks survivors. At the 0.45
    // threshold the fixed hyperplanes' per-pair miss probability is
    // ~3e-8 (see embed_neardup), so the output matches the all-pairs
    // oracle deterministically.
    "embed_semantic_dedup" -> ((s, d) => {
      val dupJ = Similarity.lshVerifiedPairs(s, d)
        .where(col("cos") >= CosThreshold)
        .select(col("j").as("vec_id")).distinct()
      Tables.embeddings(s, d).select(col("vec_id"))
        .join(dupJ, Seq("vec_id"), "left_anti")
        .withColumn("kept", lit(1))
        .unionByName(dupJ.withColumn("kept", lit(0)))
        .orderBy(col("vec_id"))
    }),

    // ---- deterministic Lloyd k-means over the embeddings: fixed
    // modulo-sample init, 3 rounds. Since round 8 the averaging is
    // ORDER-INDEPENDENT (coordinates quantized to 1e-6 integers, summed
    // as longs — the same contract as the PQ codebook trainer), so the
    // whole training is a pure function of the data and the oracle
    // recomputes init, all three rounds, and the final assignment
    // bit-for-bit in SQL — upgraded from rows-only to hash-checked.
    "embed_kmeans" -> ((s, d) => {
      val (assigned, _) = kmeans(s, d)
      assigned.select(col("vec_id"), col("cluster")).orderBy(col("vec_id"))
    }),

    // ---- SemDeDup's actual shape (Abbas et al. 2023): semantic dedup
    // SCOPED TO k-means clusters — at 100 TB the all-pairs (even
    // LSH-pruned) comparison space shrinks to within-cluster blocks,
    // and the cluster id doubles as the partition key. A doc is dropped
    // when a lower-id SAME-CLUSTER doc is within the cosine threshold.
    // Candidates still come from the shared banded-LSH pair set (never
    // all-pairs); the cluster equality is one narrow join per side.
    // Oracle-checkable BECAUSE the k-means is deterministic: the SQL
    // recomputes the full training, then applies the same rule.
    "embed_semdedup_clustered" -> ((s, d) => {
      val cl = kmeans(s, d)._1.select(col("vec_id"), col("cluster"))
      val ci = cl.select(col("vec_id").as("i"), col("cluster").as("ci"))
      val cj = cl.select(col("vec_id").as("j"), col("cluster").as("cj"))
      val dupJ = Similarity.lshVerifiedPairs(s, d)
        .where(col("cos") >= CosThreshold)
        .join(ci, "i").join(cj, "j")
        .where(col("ci") === col("cj"))
        .select(col("j").as("vec_id")).distinct()
      Tables.embeddings(s, d).select(col("vec_id"))
        .join(dupJ, Seq("vec_id"), "left_anti")
        .withColumn("kept", lit(1))
        .unionByName(dupJ.withColumn("kept", lit(0)))
        .orderBy(col("vec_id"))
    }),

    // ---- driver-visible audit for the k-means: point count (pure SQL),
    // cluster-count sanity and Lloyd's monotone-inertia guarantee
    // (inertia after round 3 <= inertia at init — the property that
    // holds for ANY correct Lloyd implementation) as oracle-checkable
    // booleans.
    "embed_kmeans_audit" -> ((s, d) => {
      val (assigned, inertias) = kmeans(s, d)
      assigned.agg(count(lit(1)).as("n_points"),
        (countDistinct(col("cluster")) <= K).cast("int").as("k_ok"))
        .select(col("n_points"), col("k_ok"),
          lit(if (inertias.last <= inertias.head) 1 else 0)
            .as("inertia_monotone"))
    }))

  private val K = 8
  private val Rounds = 3

  /** 3 Lloyd rounds, fully DETERMINISTIC (round 8 — the same two
    * contracts as `Similarity.trainSubspaceKmeans`, restated here
    * because this loop also tracks inertia):
    *
    *  1. assignment = argmin over per-centroid squared-L2 distances
    *     ROUNDED to 6 decimals, first-index tie-break — `list_position
    *     (l, list_min(l))` in the oracle;
    *  2. centroid update = `(sum(floor(x·1e6 + .5)).toDouble / n) / 1e6`
    *     — integer sums are order-free, so the new centroids are
    *     identical on every partitioning and in DuckDB.
    *
    * Each round: assignment is map-side literal-distance codegen, the
    * update is ONE (cluster, dim) partial-agg shuffle collecting k×dim
    * rows; empty clusters keep their centroid (oracle: COALESCE).
    * Returns the final assignment (against the round-3 centroids) and
    * per-round inertia (sum of rounded min-distances). Memoized +
    * persisted per (session, dir): embed_kmeans, its audit, and the
    * cluster-scoped SemDeDup all consume the identical model — and at
    * 100 TB the assignment is a stored artifact, not a per-query
    * recompute (same rationale as the PQ coded frame). */
  private val kmCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Seq[Double])]

  /** Drop the memoized assignments and their persisted blocks. */
  def clearCaches(): Unit = {
    kmCache.forEachValue(Long.MaxValue, v => { v._1.unpersist(); () })
    kmCache.clear()
  }

  private def kmeans(s: SparkSession, d: String): (DataFrame, Seq[Double]) =
    kmCache.computeIfAbsent((s, d), { _ =>
      val (assigned, inertias) = kmeansRun(s, d)
      (assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        inertias)
    })

  private def kmeansRun(s: SparkSession, d: String): (DataFrame, Seq[Double]) = {
    val base = Tables.fanOut(vecsN(s, d)).persist()
    // deterministic init: a fixed modulo sample, ordered, first K
    var centroids = base.filter(col("vec_id") % 61 === 3)
      .orderBy(col("vec_id")).limit(K)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val inertias = scala.collection.mutable.ArrayBuffer[Double]()
    var assigned: DataFrame = null
    for (_ <- 1 to Rounds) {
      val dists = array(centroids.toIndexedSeq.map(c =>
        round(Similarity.sqDist(col("v"), lit(c)), 6)): _*)
      assigned = base.withColumn("dists", dists)
        .withColumn("cluster",
          (array_position(col("dists"), array_min(col("dists"))) - 1)
            .cast("int"))
        .withColumn("dist", array_min(col("dists")))
        .drop("dists")
      inertias += assigned.agg(sum(col("dist"))).head.getDouble(0)
      // deterministic update: order-free integer sums per (cluster, dim)
      val sums = assigned
        .select(col("cluster"), posexplode(transform(col("v"),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")))
          .as(Seq("dim", "xi")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, id) =>
        byCluster.get(id) match {
          case Some(rows) =>
            val c = old.clone()
            rows.foreach(r =>
              c(r.getInt(1)) = (r.getLong(2).toDouble / r.getLong(3)) / 1e6)
            c
          case None => old // empty cluster keeps its centroid
        }
      }
    }
    base.unpersist()
    (assigned, inertias.toSeq)
  }

  def oracleSql: Map[String, String] = Map(
    "embed_semantic_dedup" ->
      """SELECT e.vec_id,
           CAST(NOT EXISTS (
             SELECT 1 FROM embeddings p
             WHERE p.vec_id < e.vec_id
               AND list_cosine_similarity(p.embedding, e.embedding) >= 0.45)
             AS INT) AS kept
         FROM embeddings e ORDER BY e.vec_id""",
    // the WHOLE k-means recomputed (same technique as embed_pq_codes):
    // modulo init, three unrolled Lloyd rounds with integer-quantized
    // order-free averaging, final assignment against the round-3
    // centroids — bit-for-bit on both engines
    "embed_kmeans" ->
      s"""WITH $kmeansCtes
         SELECT vec_id, c AS cluster FROM a3 ORDER BY vec_id""",
    // SemDeDup scoped to the recomputed clusters: drop when a lower-id
    // SAME-CLUSTER vector is within the cosine threshold
    "embed_semdedup_clustered" ->
      s"""WITH $kmeansCtes
         SELECT e.vec_id,
           CAST(NOT EXISTS (
             SELECT 1 FROM embeddings q
             JOIN a3 qa ON qa.vec_id = q.vec_id
             JOIN a3 ea ON ea.vec_id = e.vec_id
             WHERE q.vec_id < e.vec_id AND qa.c = ea.c
               AND list_cosine_similarity(q.embedding, e.embedding) >= 0.45)
             AS INT) AS kept
         FROM embeddings e ORDER BY e.vec_id""",
    "embed_kmeans_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_points, 1 AS k_ok,
           1 AS inertia_monotone
         FROM embeddings""")

  /** The deterministic k-means training unrolled in SQL — shared by the
    * embed_kmeans and embed_semdedup_clustered oracles. `a3` is the
    * final (vec_id, c) assignment. */
  private val kmeansCtes: String =
    """p AS (SELECT CAST(max(len(embedding)) AS INT) AS dm
                    FROM embeddings),
          di AS (SELECT unnest(range(1, (SELECT dm FROM p) + 1)) AS i),
          v AS (
            SELECT e.vec_id,
              list_transform(range(1, p.dm + 1),
                i -> CAST(e.embedding[i] AS DOUBLE)) AS v
            FROM embeddings e CROSS JOIN p),
          c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
            FROM (SELECT vec_id, v FROM v
                  WHERE vec_id % 61 = 3 ORDER BY vec_id LIMIT 8) t),
          a1 AS (
            SELECT vec_id, CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT x.vec_id, list(round(list_sum(
                    list_transform(range(1, p.dm + 1),
                      i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM v x CROSS JOIN p CROSS JOIN c0 c
                  GROUP BY x.vec_id) t),
          u1 AS (
            SELECT a.c AS k, di.i AS dim,
              sum(CAST(floor(x.v[di.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
              count(*) AS n
            FROM a1 a JOIN v x ON x.vec_id = a.vec_id
            CROSS JOIN di GROUP BY a.c, di.i),
          c1 AS (
            SELECT c0.k, COALESCE(n1.cv, c0.cv) AS cv
            FROM c0 LEFT JOIN
              (SELECT k,
                 list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
               FROM u1 GROUP BY k) n1 ON n1.k = c0.k),
          a2 AS (
            SELECT vec_id, CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT x.vec_id, list(round(list_sum(
                    list_transform(range(1, p.dm + 1),
                      i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM v x CROSS JOIN p CROSS JOIN c1 c
                  GROUP BY x.vec_id) t),
          u2 AS (
            SELECT a.c AS k, di.i AS dim,
              sum(CAST(floor(x.v[di.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
              count(*) AS n
            FROM a2 a JOIN v x ON x.vec_id = a.vec_id
            CROSS JOIN di GROUP BY a.c, di.i),
          c2 AS (
            SELECT c1.k, COALESCE(n2.cv, c1.cv) AS cv
            FROM c1 LEFT JOIN
              (SELECT k,
                 list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
               FROM u2 GROUP BY k) n2 ON n2.k = c1.k),
          a3 AS (
            SELECT vec_id, CAST(list_position(l, list_min(l)) - 1 AS INT) AS c
            FROM (SELECT x.vec_id, list(round(list_sum(
                    list_transform(range(1, p.dm + 1),
                      i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))), 6)
                    ORDER BY c.k) AS l
                  FROM v x CROSS JOIN p CROSS JOIN c2 c
                  GROUP BY x.vec_id) t)"""
}
