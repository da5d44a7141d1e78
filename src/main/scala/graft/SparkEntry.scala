package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator family's declared inventory;
  * `oracleSql` provides the DuckDB-equivalent SQL for the subset that
  * is ANSI-SQL-expressible (the rest get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Relational2.queries ++ ops.Relational3.queries ++
      ops.RdfOps.queries ++ ops.DictOps.queries ++
      ops.TextOps.queries ++ ops.QualityOps.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.SemanticOps.queries ++
      ops.Multimodal.queries ++ ops.Udafs.queries ++ ops.Curation.queries ++
      ops.Sampling.queries ++ ops.Contamination.queries ++
      ops.Retrieval.queries ++ ops.Inference.queries ++ ops.Classify.queries ++
      ops.Incremental.queries ++ ops.RdfStats.queries ++ ops.Bpe.queries ++ ops.Sketches.queries ++
      ops.GraphAlgos.queries ++ ops.Layout.queries ++
      streaming.EventStreams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++ ops.Relational2.oracleSql ++ ops.Relational3.oracleSql ++
      ops.RdfOps.oracleSql ++ ops.DictOps.oracleSql ++
      ops.TextOps.oracleSql ++ ops.QualityOps.oracleSql ++ ops.Dedup.oracleSql ++
      ops.Similarity.oracleSql ++ ops.SemanticOps.oracleSql ++
      ops.Multimodal.oracleSql ++ ops.Udafs.oracleSql ++ ops.Curation.oracleSql ++
      ops.Sampling.oracleSql ++ ops.Contamination.oracleSql ++
      ops.Retrieval.oracleSql ++ ops.Inference.oracleSql ++ ops.Classify.oracleSql ++
      ops.Incremental.oracleSql ++ ops.RdfStats.oracleSql ++ ops.Bpe.oracleSql ++ ops.Sketches.oracleSql ++
      ops.GraphAlgos.oracleSql ++ ops.Layout.oracleSql ++
      streaming.EventStreams.oracleSql
}
