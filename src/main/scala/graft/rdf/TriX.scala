package graft.rdf

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Quad

/** TriX source + sink (S4h) — the named-graph XML serialization
  * (W3C member submission / HP TR `trix-1`), closing the last format
  * rdflib's `Graph().parse` accepts that the engine didn't
  * (`/root/reference/airflow_files/dags/sparql_update.py:124-133`
  * ingests any rdflib-parsable file; VERDICT r9 "missing" #2).
  *
  * Grammar subset (the whole useful format — TriX is deliberately
  * minimal): `<TriX>` root; `<graph>` elements, each optionally named
  * by a leading `<uri>` child; `<triple>` elements of exactly three
  * terms drawn from `<uri>`, `<id>` (blank node), `<plainLiteral
  * [xml:lang]>`, `<typedLiteral datatype>`. No DTDs, no external
  * entities.
  *
  * Like the other document-scoped readers (Turtle, RDF/XML, JSON-LD):
  * one StAX cursor pass per file — constant memory, no DOM — with
  * blank-node labels namespaced by a document content hash so nodes
  * from different files never collide in one store. Quad-SCOPED: each
  * statement keeps its own graph through LOAD unless INTO GRAPH
  * overrides, exactly like N-Quads/TriG.
  *
  * The sink emits one self-contained `<graph>` element per quad line
  * (valid TriX — a document may repeat a graph name; readers merge),
  * so serialization stays a pure Catalyst projection and every part
  * file is an independently parsable document with per-partition root
  * framing — the same layout trick as the JSON-LD and RDF/XML sinks.
  */
object TriX {

  val Ns = "http://www.w3.org/2004/03/trix/trix-1/"

  // ------------------------------------------------------------ source

  /** Parse one TriX document. Graphs without a `<uri>` name land in
    * `defaultGraph`. */
  def parse(doc: String, defaultGraph: String): Seq[Quad] = {
    val out = mutable.Buffer.empty[Quad]
    val docTag =
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(doc))
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    val r = f.createXMLStreamReader(new java.io.StringReader(doc))
    try {
      // advance to the root and check it
      var rootSeen = false
      var graph: String = defaultGraph
      var graphNamed = false
      // a term = (kind, value, dt, lang)
      var triple = mutable.Buffer.empty[(String, String, String, String)]
      var inTriple = false
      def readTerm(): Unit = {
        val name = r.getLocalName
        name match {
          case "uri" =>
            triple += ((Quad.KindIri, r.getElementText, null, null))
          case "id" =>
            triple += ((Quad.KindBnode,
              Quad.BnodePrefix + "tx" + docTag + "_" + r.getElementText,
              null, null))
          case "plainLiteral" =>
            val lang = Option(r.getAttributeValue(
              "http://www.w3.org/XML/1998/namespace", "lang")).orNull
            triple += ((Quad.KindLiteral, r.getElementText, null, lang))
          case "typedLiteral" =>
            val dt = r.getAttributeValue(null, "datatype")
            require(dt != null, "typedLiteral without datatype")
            triple += ((Quad.KindLiteral, r.getElementText, dt, null))
          case other =>
            throw new IllegalArgumentException(s"unexpected TriX term <$other>")
        }
      }
      while (r.hasNext) {
        r.next() match {
          case C.START_ELEMENT =>
            val name = r.getLocalName
            if (!rootSeen) {
              require(name == "TriX",
                s"not a TriX document (root <$name>)")
              rootSeen = true
            } else name match {
              case "graph" =>
                graph = defaultGraph; graphNamed = false
              case "triple" =>
                inTriple = true; triple = mutable.Buffer.empty
              case "uri" if !inTriple && !graphNamed =>
                // a graph's leading <uri> names it
                graph = r.getElementText; graphNamed = true
              case _ if inTriple => readTerm()
              case other => throw new IllegalArgumentException(
                s"unexpected TriX element <$other>")
            }
          case C.END_ELEMENT if r.getLocalName == "triple" =>
            require(triple.size == 3,
              s"TriX triple with ${triple.size} terms")
            val Seq(s, p, o) = triple.toSeq
            require(s._1 != Quad.KindLiteral, "literal subject in TriX")
            require(p._1 == Quad.KindIri, "non-IRI predicate in TriX")
            out += Quad(graph, s._2, p._2, o._2, o._3, o._4, o._1)
            inTriple = false
          case _ => ()
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Read a TriX file (or directory of files) into quads. One task per
    * file, like every document-scoped reader here. */
  def read(spark: SparkSession, path: String,
      defaultGraph: String): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", value = true).text(path)
      .as[String]
      .flatMap(doc => parse(doc, defaultGraph))
  }

  // -------------------------------------------------------------- sink

  /** One self-contained `<graph>` element per quad, as a single text
    * line — pure column expressions. Default-graph statements omit the
    * graph `<uri>` so they round-trip into the reader's default. */
  def toLines(quads: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    def escText(c: Column): Column = {
      val amp = regexp_replace(c, "&", "&amp;")
      val lt = regexp_replace(amp, "<", "&lt;")
      val gt = regexp_replace(lt, ">", "&gt;")
      val cr = regexp_replace(gt, "\r", "&#13;")
      regexp_replace(cr, "\n", "&#10;")
    }
    def escAttr(c: Column): Column =
      regexp_replace(regexp_replace(escText(c), "\"", "&quot;"),
        "\t", "&#9;")
    // XML 1.0 cannot carry control chars outside {TAB, LF, CR} even as
    // character references — fail loudly, like the RDF/XML sink
    val xmlIllegal = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    val bad = quads.filter(col("o_value").rlike(xmlIllegal) ||
        col("s").rlike(xmlIllegal) || col("graph").rlike(xmlIllegal))
      .select(col("s"), col("o_value")).limit(1).collect()
    require(bad.isEmpty,
      s"not TriX-serializable (XML-1.0-illegal control char): ${bad.mkString}")
    val subj =
      when(col("s").startsWith(Quad.BnodePrefix),
        concat(lit("<id>"), escText(expr("substring(s, 3)")), lit("</id>")))
        .otherwise(concat(lit("<uri>"), escText(col("s")), lit("</uri>")))
    val pred = concat(lit("<uri>"), escText(col("p")), lit("</uri>"))
    val obj =
      when(col("o_kind") === Quad.KindIri,
        concat(lit("<uri>"), escText(col("o_value")), lit("</uri>")))
        .when(col("o_kind") === Quad.KindBnode,
          concat(lit("<id>"), escText(expr("substring(o_value, 3)")),
            lit("</id>")))
        .when(col("o_lang").isNotNull,
          concat(lit("<plainLiteral xml:lang=\""), escAttr(col("o_lang")),
            lit("\">"), escText(col("o_value")), lit("</plainLiteral>")))
        .when(col("o_type").isNotNull,
          concat(lit("<typedLiteral datatype=\""), escAttr(col("o_type")),
            lit("\">"), escText(col("o_value")), lit("</typedLiteral>")))
        .otherwise(concat(lit("<plainLiteral>"), escText(col("o_value")),
          lit("</plainLiteral>")))
    val gName =
      when(col("graph") === Quad.DefaultGraph, lit(""))
        .otherwise(concat(lit("<uri>"), escText(col("graph")), lit("</uri>")))
    quads.select(concat(
      lit("<graph>"), gName,
      lit("<triple>"), subj, pred, obj, lit("</triple>"),
      lit("</graph>")).as("value"))
  }

  /** Write quads as TriX; every part file is a complete document. */
  def write(quads: DataFrame, path: String): Unit = {
    import quads.sparkSession.implicits._
    toLines(quads).as[String].mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator(s"""<TriX xmlns="$Ns">""") ++ it ++ Iterator("</TriX>")
    }.write.mode("overwrite").text(path)
  }
}
