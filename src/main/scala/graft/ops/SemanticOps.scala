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

    // ---- deterministic Lloyd k-means over the embeddings: fixed seed
    // sample as init, 3 rounds. Output is (vec_id, cluster) — rows-only
    // (iterative float averaging is not an ANSI-SQL oracle); the
    // invariants ride in embed_kmeans_audit below.
    "embed_kmeans" -> ((s, d) => {
      val (assigned, _) = kmeans(s, d)
      assigned.select(col("vec_id"), col("cluster")).orderBy(col("vec_id"))
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

  /** Assignment column: argmin squared-L2 over the literal centroid set,
    * ties to the lowest cluster id — struct(dist, id) array_sort, the
    * same shape as Similarity.ivfCellsOf. Returns the winning struct so
    * callers can read both `id` and the relative `dist` (|v|^2 omitted —
    * constant across assignments). */
  private def bestCentroid(centroids: Array[Array[Double]]): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, id) =>
      val cc = c.map(x => x * x).sum // |c|^2 folds to one literal
      struct((dot(col("v"), lit(c)) * -2 + cc).as("dist"),
        lit(id).as("id"))
    }.toIndexedSeq: _*)
    element_at(array_sort(scored), 1)
  }

  /** 3 Lloyd rounds: assign against literal centroids, recompute by a
    * (cluster, dim) partial agg, collect k×dim back as the next round's
    * literals. Returns the final assignment and per-round inertia
    * (relative: |v|^2 omitted — constant across assignments). */
  private def kmeans(s: SparkSession, d: String): (DataFrame, Seq[Double]) = {
    val base = Tables.fanOut(vecsN(s, d)).persist()
    // deterministic init: a fixed modulo sample, ordered, first K
    var centroids = base.filter(col("vec_id") % 61 === 3)
      .orderBy(col("vec_id")).limit(K)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val inertias = scala.collection.mutable.ArrayBuffer[Double]()
    def inertiaOf(assigned: DataFrame): Double =
      assigned.agg(sum(col("dist"))).head.getDouble(0)
    var assigned: DataFrame = null
    for (_ <- 1 to Rounds) {
      assigned = base.withColumn("best", bestCentroid(centroids))
        .withColumn("cluster", col("best").getField("id"))
        .withColumn("dist", col("best").getField("dist"))
      inertias += inertiaOf(assigned)
      // recompute: one shuffle keyed (cluster, dim) — k*dim result rows
      val next = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCluster = next.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, id) =>
        byCluster.get(id) match {
          case Some(rows) =>
            val dim = old.length
            val c = new Array[Double](dim)
            rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
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
    "embed_kmeans_audit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_points, 1 AS k_ok,
           1 AS inertia_monotone
         FROM embeddings""")
}
