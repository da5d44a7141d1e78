package graft.rdf

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.model.Quad

/** HexTuples serialization — the NDJSON RDF format rdflib's `hext`
  * plugin speaks (the reference's `Graph().parse` accepts it,
  * `/root/reference/airflow_files/dags/sparql_update.py:124-133`): one
  * JSON array of six strings per line,
  * `[subject, predicate, value, datatype, language, graph]`, where
  * datatype is the marker `"globalId"` for IRI objects, `"localId"`
  * for blank nodes, and the literal's datatype IRI otherwise; language
  * and graph are `""` when absent.
  *
  * Line-oriented like N-Triples/N-Quads, so it splits perfectly across
  * partitions — and because each line is plain JSON, BOTH directions
  * stay whole-stage-codegen'd column expressions (`to_json` out,
  * `from_json` in; no per-line parser, no UDF).
  */
object HexTuples {

  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  private val LangString =
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  /** One HexTuples line per quad row. Plain literals serialize with the
    * implicit xsd:string datatype and language-tagged ones with
    * rdf:langString, matching rdflib's serializer. */
  def toLines(quads: DataFrame): DataFrame = {
    val dt = when(col("o_kind") === Quad.KindIri, lit("globalId"))
      .when(col("o_kind") === Quad.KindBnode, lit("localId"))
      .when(col("o_lang").isNotNull, lit(LangString))
      .otherwise(coalesce(col("o_type"), lit(XsdString)))
    quads.select(to_json(array(
      col("s"), col("p"), col("o_value"), dt,
      coalesce(col("o_lang"), lit("")),
      when(col("graph") === Quad.DefaultGraph, lit(""))
        .otherwise(col("graph")))).as("value"))
  }

  def write(quads: DataFrame, path: String): Unit =
    toLines(quads).write.mode("overwrite").text(path)

  /** Parse a HexTuples file back to quads. The xsd:string /
    * rdf:langString datatypes fold back to the engine's null-datatype
    * convention, `""` graph back to `defaultGraph` — a write/read
    * roundtrip is lossless. */
  def read(spark: SparkSession, path: String,
      defaultGraph: String = Quad.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    // Fail loudly on malformed lines (module convention): a line that
    // is not a 6-element JSON array raises with the offending text,
    // instead of silently becoming an all-null quad.
    val parsed = from_json(col("value"), ArrayType(StringType))
    val t = when(parsed.isNotNull && size(parsed) === 6, parsed)
      .otherwise(raise_error(
        concat(lit("HexTuples: malformed line: "), col("value"))))
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(t.as("t"))
      .select(
        when(element_at(col("t"), 6) === "", lit(defaultGraph))
          .otherwise(element_at(col("t"), 6)).as("graph"),
        element_at(col("t"), 1).as("s"),
        element_at(col("t"), 2).as("p"),
        element_at(col("t"), 3).as("o_value"),
        when(element_at(col("t"), 4).isin("globalId", "localId", XsdString,
            LangString), lit(null).cast(StringType))
          .otherwise(element_at(col("t"), 4)).as("o_type"),
        when(element_at(col("t"), 5) === "", lit(null).cast(StringType))
          .otherwise(element_at(col("t"), 5)).as("o_lang"),
        when(element_at(col("t"), 4) === "globalId", Quad.KindIri)
          .when(element_at(col("t"), 4) === "localId", Quad.KindBnode)
          .otherwise(Quad.KindLiteral).as("o_kind"))
      .as[Quad]
  }
}
