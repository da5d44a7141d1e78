package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.JsonFlattener
import graft.model.Quad

/** Source connectors (SURVEY.md §2.1).
  *
  * The reference extracts JSON payload columns from Postgres with a
  * server-side cursor chunked at 10,000 rows
  * (`load_knowledge_graph.py:60-79`) and from local JSON files
  * (`:160-176`). Spark-native equivalents:
  *
  *  - S1 → parallel JDBC partition reads (`fetchsize` = the cursor
  *    chunk; `partitionColumn/num_partitions` spread the scan over
  *    executors — the reference is single-threaded here);
  *  - S2 → the whole-table JSON-array export, as a driver utility;
  *  - S3 → whole-document or record-per-line JSON files.
  *
  * Each returns the raw JSON rows; compose with
  * [[graft.ingest.JsonFlattener.flatten]] to produce quads.
  */
object Sources {

  /** S1: one JSON document per row from a JDBC table column.
    *
    * @param fetchSize  rows per round-trip (reference: 10,000)
    * @param partitionOptions e.g. Map("partitionColumn" -> "id",
    *   "lowerBound" -> "0", "upperBound" -> "1000000",
    *   "numPartitions" -> "32") for a parallel range scan
    */
  def jdbcJson(
      spark: SparkSession,
      url: String,
      table: String,
      jsonField: String,
      fetchSize: Int = 10000,
      partitionOptions: Map[String, String] = Map.empty,
      connectionProperties: Map[String, String] = Map.empty,
      /** extra source columns kept alongside `json` — as plain
        * attributes they keep downstream filters JDBC-pushable (an
        * incremental sync filters on id/updated_at and the predicate
        * must reach the database, not Spark) */
      keepColumns: Seq[String] = Nil): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize.toString)
    val withPartitions = partitionOptions.foldLeft(reader) {
      case (r, (k, v)) => r.option(k, v)
    }
    val withProps = connectionProperties.foldLeft(withPartitions) {
      case (r, (k, v)) => r.option(k, v)
    }
    withProps.load().select(
      col(jsonField).cast("string").as("json") +: keepColumns.map(col): _*)
  }

  /** S1 composed with T1: JDBC JSON column → quads in `graph`. */
  def jdbcJsonToQuads(
      spark: SparkSession,
      url: String,
      table: String,
      jsonField: String,
      graph: String,
      namespace: String,
      fetchSize: Int = 10000,
      partitionOptions: Map[String, String] = Map.empty): Dataset[Quad] =
    JsonFlattener.flatten(
      jdbcJson(spark, url, table, jsonField, fetchSize, partitionOptions),
      "json", graph, namespace)

  /** S2: whole-table JSON-array export (the reference's `jsonb_agg` +
    * file write, `load_knowledge_graph.py:81-98`) — rarely appropriate
    * at scale (single driver-side document) but part of the API surface. */
  def exportJsonArray(df: DataFrame, jsonCol: String, path: String): Unit =
    df.select(col(jsonCol).cast("string").as("j"))
      .agg(concat(lit("["), concat_ws(",", collect_list(col("j"))), lit("]"))
        .as("doc"))
      .coalesce(1).write.mode("overwrite").text(path)

  /** S3a: whole-document JSON file (the mam_tenants path,
    * `load_knowledge_graph.py:160-176`): one document per FILE. */
  def jsonDocumentFile(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("json"))

  /** S3b: record-per-line JSON (JSONL). */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).select(col("value").as("json"))
      .where(length(trim(col("json"))) > 0)

  /** S4b: Turtle file → quads — the `Graph().parse(file)` equivalent
    * for .ttl input (see [[graft.rdf.Turtle]] for the supported subset
    * and the document-scoped-parse scale note). */
  def turtleFileToQuads(
      spark: SparkSession, path: String, graph: String): Dataset[graft.model.Quad] =
    graft.rdf.Turtle.read(spark, path, graph)

  /** S3 composed with T1: JSON file → quads. */
  def jsonFileToQuads(
      spark: SparkSession,
      path: String,
      graph: String,
      namespace: String,
      wholeDocument: Boolean = true): Dataset[Quad] = {
    val df = if (wholeDocument) jsonDocumentFile(spark, path)
             else jsonLines(spark, path)
    JsonFlattener.flatten(df, "json", graph, namespace)
  }
}
