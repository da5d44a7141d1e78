package graft.model

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet-backed quad store partitioned by named graph.
  *
  * Replaces the reference's Stardog endpoint as the statement store
  * (SURVEY.md §1.1). Named-graph scoping (`USING` / `WITH` / `GRAPH`,
  * `/root/reference/airflow_files/dags/sparql/tl_companies_mapping_org.sparql:34-35`)
  * becomes partition pruning on the `graph` partition column; CLEAR/DROP
  * GRAPH (`/root/reference/airflow_files/dags/load_knowledge_graph.py:337-383,619-667`)
  * becomes partition-directory deletion — O(1) metadata work instead of a
  * data rewrite, which is what makes truncate-and-reload viable at scale.
  *
  * Set semantics (RDF graphs are sets — SURVEY.md Q11): `appendDistinct`
  * dedups within the batch and anti-joins existing quads of the target
  * graphs, so the 16 mapping tasks can insert overlapping triples in any
  * order with an order-independent final state.
  */
final class GraphStore(val spark: SparkSession, val path: String) {
  import GraphStore._

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists: Boolean = fs.exists(new Path(path))

  private def emptyQuads: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** All quads, `graph` restored from the partition column. */
  def read(): DataFrame =
    if (!exists) emptyQuads
    else spark.read.schema(schema).option("basePath", path).parquet(path)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)

  /** The merge (union) of the given named graphs — SPARQL `USING g1 USING
    * g2`. Compiles to partition pruning, not a scan-and-filter. */
  def readGraphs(graphs: Seq[String]): DataFrame =
    read().where(col("graph").isin(graphs: _*))

  /** Plain append (caller owns dedup). */
  def append(quads: DataFrame): Unit =
    quads.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.partitionBy("graph").mode("append").parquet(path)

  /** Set-semantics append: dedup batch + drop quads already present in
    * the target graphs (Q11). Null-safe join — plain equality would let
    * every quad with a null o_type/o_lang through again.
    *
    * `knownGraphs`: the target graphs when the CALLER knows them
    * statically (a compiled INSERT writes only its WITH/GRAPH target).
    * Without it the batch must be computed an extra time just to
    * discover the graph set — for a mapping query that means running
    * the whole WHERE-clause join tree twice. */
  def appendDistinct(quads: DataFrame,
      knownGraphs: Option[Seq[String]] = None): Unit = {
    val batch = quads.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .dropDuplicates(schema.fieldNames.toIndexedSeq)
    val graphs = knownGraphs.getOrElse(
      batch.select("graph").distinct().collect().map(_.getString(0)).toSeq)
    val existing = readGraphs(graphs.toIndexedSeq)
    val cond = schema.fieldNames.map(f => batch(f) <=> existing(f)).reduce(_ && _)
    val fresh = batch.join(existing, cond, "left_anti")
    append(fresh)
  }

  def insertData(quads: Seq[Quad]): Unit = {
    import spark.implicits._
    appendDistinct(quads.toDF(), Some(quads.map(_.graph).distinct))
  }

  private def partitionDir(graph: String): Path =
    new Path(path, "graph=" + ExternalCatalogUtils.escapePathName(graph))

  /** CLEAR (SILENT) GRAPH — truncate one named graph (Q13). */
  def clearGraph(graph: String): Unit = {
    val dir = partitionDir(graph)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  /** DROP (SILENT) GRAPH — same physical op on a partitioned store. */
  def dropGraph(graph: String): Unit = clearGraph(graph)

  /** Store maintenance (S9, the reference's post-load optimize): rewrite
    * a graph partition into few large files for scan efficiency. */
  def compact(graph: String, numFiles: Int = 1): Unit = {
    val quads = readGraphs(Seq(graph)).coalesce(numFiles)
    val tmp = new Path(path + s".compact-${System.nanoTime()}")
    quads.write.partitionBy("graph").parquet(tmp.toString)
    clearGraph(graph)
    val src = new Path(tmp, "graph=" + ExternalCatalogUtils.escapePathName(graph))
    if (fs.exists(src)) fs.rename(src, partitionDir(graph))
    fs.delete(tmp, true)
  }

  def countGraph(graph: String): Long = readGraphs(Seq(graph)).count()
}

object GraphStore {
  val schema: StructType = StructType(Seq(
    StructField("graph", StringType),
    StructField("s", StringType),
    StructField("p", StringType),
    StructField("o_value", StringType),
    StructField("o_type", StringType),
    StructField("o_lang", StringType),
    StructField("o_kind", StringType)))
}
