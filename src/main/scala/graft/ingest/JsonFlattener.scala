package graft.ingest

import scala.collection.mutable

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.model.Quad

/** Schema-less JSON → RDF quads direct mapper ("the flattener", SURVEY.md
  * §2.2 T1/T2).
  *
  * Reproduces the event semantics of the reference's streaming parser
  * (`/root/reference/airflow_files/dags/parse_functions.py:48-105`):
  *
  *  - every JSON object starts a new subject — a blank node, or
  *    `instanceNs/<i>` when an instance namespace is given (`:78-83`);
  *  - if the object appears under a key (property) and a parent subject
  *    exists, a linking triple `(parent, property, child)` is emitted
  *    (`:85-88`); a top-level array of objects therefore yields
  *    independent subgraphs (no link);
  *  - every key becomes the predicate `namespace + key` (`:104-105`);
  *  - scalars become typed literals: int→xsd:integer, float→xsd:double,
  *    bool→xsd:boolean, string→plain literal (`:98-102`);
  *  - scalars inside arrays reuse the same predicate for each element —
  *    the current property is saved per-subject on `start_array` and
  *    restored when a nested object closes (`:68-76`, `:94-96`);
  *  - JSON `null` emits nothing (the reference's event loop has no
  *    `null` handler — `:24-25` vs `:67-105`);
  *  - a scalar with no current property (bare top-level scalar / scalar
  *    in a top-level array) is undefined behavior in the reference (it
  *    would crash on serialization); we drop it.
  *
  * Implemented as `mapPartitions` with Jackson streaming (one pass, O(depth)
  * memory per document) — the UDTF-shaped generator of SURVEY.md §2.7.
  * Blank-node labels embed (partitionId, rowInPartition, counter) so they
  * are unique across executors without coordination (SURVEY.md §7.4.1).
  */
object JsonFlattener {

  /** Flatten one JSON document into quads.
    *
    * @param bnodeSeed unique-per-record seed for blank-node labels
    * @param instanceNs when set, subjects are minted as `instanceNs<i>`
    *                   instead of blank nodes (reference `instance_ns`)
    */
  def flattenRecord(
      json: String,
      graph: String,
      namespace: String,
      bnodeSeed: String,
      instanceNs: Option[String] = None): Seq[Quad] =
    flattenRecord(sharedFactory, json, graph, namespace, bnodeSeed, instanceNs)

  // JsonFactory is thread-safe and expensive to build — share one
  private val sharedFactory = new JsonFactory()

  def flattenRecord(
      factory: JsonFactory,
      json: String,
      graph: String,
      namespace: String,
      bnodeSeed: String,
      instanceNs: Option[String]): Seq[Quad] = {
    val out = mutable.ArrayBuffer.empty[Quad]
    val parser = factory.createParser(json)
    val subjectStack = mutable.ArrayDeque.empty[String]
    val arrayProperties = mutable.Map.empty[String, String]
    var property: String = null
    var bnodeCounter = 0
    var instanceCounter = 0

    def newSubject(): String = instanceNs match {
      case Some(ns) =>
        val s = ns + instanceCounter; instanceCounter += 1; s
      case None =>
        val s = s"${Quad.BnodePrefix}b$bnodeSeed-$bnodeCounter"
        bnodeCounter += 1; s
    }

    def emitScalar(value: String, dt: String): Unit =
      if (property != null && subjectStack.nonEmpty)
        out += Quad.typed(graph, subjectStack.last, property, value, dt)

    try {
      var tok = parser.nextToken()
      while (tok != null) {
        tok match {
          case JsonToken.START_ARRAY =>
            if (subjectStack.nonEmpty && property != null)
              arrayProperties(subjectStack.last) = property
          case JsonToken.END_ARRAY =>
            if (subjectStack.nonEmpty)
              arrayProperties.remove(subjectStack.last)
          case JsonToken.START_OBJECT =>
            val subject = newSubject()
            if (property != null && subjectStack.nonEmpty)
              out += {
                val parent = subjectStack.last
                Quad(graph, parent, property, subject, null, null,
                  if (Quad.isBnode(subject)) Quad.KindBnode else Quad.KindIri)
              }
            subjectStack.append(subject)
          case JsonToken.END_OBJECT =>
            subjectStack.removeLast()
            if (subjectStack.nonEmpty)
              arrayProperties.get(subjectStack.last).foreach(property = _)
          case JsonToken.FIELD_NAME =>
            property = namespace + parser.currentName()
          case JsonToken.VALUE_STRING =>
            if (property != null && subjectStack.nonEmpty)
              out += Quad.lit(graph, subjectStack.last, property,
                parser.getText)
          case JsonToken.VALUE_NUMBER_INT =>
            emitScalar(parser.getText, Quad.xsd.integer)
          case JsonToken.VALUE_NUMBER_FLOAT =>
            // java Double.toString ≈ python str(float) for common values
            emitScalar(parser.getDoubleValue.toString, Quad.xsd.double)
          case JsonToken.VALUE_TRUE =>
            emitScalar("true", Quad.xsd.boolean)
          case JsonToken.VALUE_FALSE =>
            emitScalar("false", Quad.xsd.boolean)
          case JsonToken.VALUE_NULL => // dropped (reference: unhandled event)
          case _ =>
        }
        tok = parser.nextToken()
      }
    } finally parser.close()
    out.toSeq
  }

  /** Distributed flatten: one quad stream per row of `jsonCol`. */
  def flatten(
      df: DataFrame,
      jsonCol: String,
      graph: String,
      namespace: String = "http://localhost/",
      instanceNs: Option[String] = None): Dataset[Quad] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.util.Tables.fanOut(df.select(col(jsonCol).cast("string"))).as[String]
      .mapPartitions { rows =>
        val pid = TaskContext.getPartitionId()
        val factory = new JsonFactory() // one per partition, not per record
        rows.zipWithIndex.flatMap { case (json, idx) =>
          flattenRecord(factory, json, graph, namespace, s"$pid-$idx", instanceNs)
        }
      }
  }
}
