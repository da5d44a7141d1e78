package graft.rdf

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Quad

/** RDF/XML reader (source S4c) — the last of the reference's common
  * ingest formats (`/root/reference/airflow_files/dags/sparql_update.py:
  * 124-133` accepts any `Graph().parse`-able file; the engine already
  * reads N-Triples and Turtle).
  *
  * Supported RDF/XML subset (the striped node/property grammar real
  * exports use): `rdf:RDF` roots, `rdf:Description` and typed node
  * elements, `rdf:about` / `rdf:nodeID` / fresh blank subjects,
  * property elements with `rdf:resource`, `rdf:nodeID`,
  * `rdf:datatype`, `xml:lang`, nested node elements,
  * `rdf:parseType="Resource"`, and property attributes. Not supported
  * (clear error or ignored): `rdf:li`/containers, reification,
  * `rdf:parseType="Collection"/"Literal"`.
  *
  * Parsing is an element STREAM (StAX cursor, constant memory per
  * document) — no DOM is ever built, so a large file costs its quad
  * output, not its tree. Like Turtle, RDF/XML is document-scoped (one
  * task per file, `wholetext`); convert a single huge dump to the
  * parquet store on first ingest.
  */
object RdfXml {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  /** Parse one RDF/XML document into ground quads bound to `graph`.
    * Blank-node labels are namespaced by a document content hash so
    * nodes from different files can never collide in one store. */
  def parse(doc: String, graph: String): Seq[Quad] =
    new XmlParser(doc, graph).parseAll()

  // ------------------------------------------------------------- sink

  /** RDF/XML sink: one `<rdf:Description>` element per subject (one
    * LINE per element — newlines/CRs in literal text go out as
    * character references, since XML line-end normalization would
    * otherwise rewrite a raw CR on read-back), framed per part file
    * with an `<rdf:RDF>` root. Pure Catalyst column expressions for
    * the elements; the root framing is per-partition glue like the
    * JSON-LD sink's array brackets.
    *
    * RDF/XML structurally cannot serialize every IRI: a predicate must
    * split into (namespace, XML-NCName local part) at its last `/` or
    * `#`. The writer validates this up front (one cheap aggregate) and
    * fails loudly, rather than emitting XML that won't parse — the
    * same limitation every RDF/XML serializer documents. */
  def toElementLines(quads: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
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
    val ns = regexp_extract(col("p"), "^(.*[/#])([^/#]+)$", 1)
    val local = regexp_extract(col("p"), "^(.*[/#])([^/#]+)$", 2)
    val validLocal = local.rlike("^[A-Za-z_][A-Za-z0-9_.-]*$")
    // XML 1.0 cannot carry control chars outside {TAB, LF, CR} at all —
    // not even as character references — so values holding them are
    // unserializable in this format, full stop
    val xmlIllegal = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    val serializable = validLocal &&
      !col("o_value").rlike(xmlIllegal) && !col("s").rlike(xmlIllegal)
    val bad = quads.filter(!serializable).select(col("p"), col("o_value"))
      .limit(1).collect() // tiny: first offender or empty
    require(bad.isEmpty,
      "not RDF/XML-serializable (predicate without an NCName local part, " +
        s"or an XML-1.0-illegal control char): ${bad.mkString}")
    val propElem =
      when(col("o_kind") === Quad.KindIri,
        concat(lit("<"), local, lit(" xmlns=\""), escAttr(ns),
          lit("\" rdf:resource=\""), escAttr(col("o_value")), lit("\"/>")))
        .when(col("o_kind") === Quad.KindBnode,
          concat(lit("<"), local, lit(" xmlns=\""), escAttr(ns),
            lit("\" rdf:nodeID=\""),
            escAttr(expr("substring(o_value, 3)")), lit("\"/>")))
        .otherwise(concat(lit("<"), local, lit(" xmlns=\""), escAttr(ns),
          when(col("o_lang").isNotNull,
            concat(lit("\" xml:lang=\""), escAttr(col("o_lang"))))
            .when(col("o_type").isNotNull,
              concat(lit("\" rdf:datatype=\""), escAttr(col("o_type"))))
            .otherwise(lit("")),
          lit("\">"), escText(col("o_value")),
          lit("</"), local, lit(">")))
    val subjAttr =
      when(col("s").startsWith(Quad.BnodePrefix),
        concat(lit(" rdf:nodeID=\""),
          escAttr(expr("substring(s, 3)")), lit("\"")))
        .otherwise(concat(lit(" rdf:about=\""), escAttr(col("s")), lit("\"")))
    quads
      .select(col("s"), propElem.as("pe"), subjAttr.as("sa"))
      .groupBy(col("s"), col("sa"))
      .agg(array_join(sort_array(collect_list(col("pe"))), "").as("props"))
      .select(concat(lit("<rdf:Description"), col("sa"), lit(">"),
        col("props"), lit("</rdf:Description>")).as("value"))
  }

  /** Write quads as RDF/XML (triple-scoped; graph drops). Every part
    * file is a complete document: `<rdf:RDF>` root framing added per
    * partition. */
  def write(quads: org.apache.spark.sql.DataFrame, path: String): Unit = {
    import quads.sparkSession.implicits._
    toElementLines(quads).as[String].mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator(s"""<rdf:RDF xmlns:rdf="$RdfNs">""") ++ it ++
        Iterator("</rdf:RDF>")
    }.write.mode("overwrite").text(path)
  }

  /** Read an RDF/XML file (or directory of files) into quads. One task
    * per file — see the scale note in the object doc. */
  def read(spark: SparkSession, path: String, graph: String): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", value = true).text(path)
      .as[String]
      .flatMap(doc => parse(doc, graph))
  }

  private final class XmlParser(input: String, graph: String) {
    private val out = mutable.Buffer.empty[Quad]
    private var bnodeCounter = 0
    private val docTag =
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(input))
    private var base = ""

    private val reader = {
      val f = XMLInputFactory.newInstance()
      // no DTDs, no external entities: parsing is pure string → quads
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
      f.createXMLStreamReader(new java.io.StringReader(input))
    }

    private def freshBnode(): String = {
      bnodeCounter += 1
      s"${Quad.BnodePrefix}x${docTag}_$bnodeCounter"
    }
    private def namedBnode(id: String): String =
      s"${Quad.BnodePrefix}x${docTag}_$id"

    private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:".r
    private def resolve(iri: String): String =
      if (schemeRe.findFirstIn(iri).isDefined) iri
      else if (base.isEmpty) {
        // rdf:ID mints "#id": without a base that relative form can
        // never become an absolute IRI — fail rather than emit it
        if (iri.startsWith("#"))
          fail(s"relative IRI '$iri' (rdf:ID) requires xml:base")
        iri
      } else
        // RFC 3986 reference resolution, not string concatenation:
        // base ".../dir/doc.rdf" + "rel" must drop the last segment
        new java.net.URI(base).resolve(iri).toString

    private def attr(ns: String, local: String): Option[String] =
      Option(reader.getAttributeValue(ns, local))

    private def qname(): String = {
      val ns = Option(reader.getNamespaceURI).getOrElse(
        fail(s"unprefixed element '${reader.getLocalName}'"))
      ns + reader.getLocalName
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"RDF/XML parse error: $msg")

    /** Cursor ON a node element's START: emits its triples, consumes
      * through its END. Returns (term value, term kind) for use as an
      * object when the node is nested under a property element. */
    private def parseNodeElement(): (String, String) = {
      val elem = qname()
      val subj = attr(RdfNs, "about") match {
        case Some(a) => (resolve(a), Quad.KindIri)
        case None => attr(RdfNs, "ID") match {
          case Some(id) => (resolve("#" + id), Quad.KindIri)
          case None => attr(RdfNs, "nodeID") match {
            case Some(id) => (namedBnode(id), Quad.KindBnode)
            case None => (freshBnode(), Quad.KindBnode)
          }
        }
      }
      // a typed node element IS an rdf:type assertion
      if (elem != RdfNs + "Description")
        out += Quad(graph, subj._1, RdfNs + "type", elem, null, null, Quad.KindIri)
      // property attributes: ex:name="v" on the node element
      (0 until reader.getAttributeCount).foreach { i =>
        val ans = reader.getAttributeNamespace(i)
        if (ans != null && ans != RdfNs && ans != XmlNs)
          out += Quad(graph, subj._1, ans + reader.getAttributeLocalName(i),
            reader.getAttributeValue(i), null, null, Quad.KindLiteral)
      }
      propertyElements(subj._1)
      subj
    }

    /** Consume the children of the element the cursor is inside — each
      * START is one property element of `subj` — through the END. */
    private def propertyElements(subj: String): Unit = {
      var done = false
      while (!done) reader.next() match {
        case C.START_ELEMENT => parsePropertyElement(subj)
        case C.END_ELEMENT | C.END_DOCUMENT => done = true
        case _ => () // inter-element whitespace / comments / PIs
      }
    }

    /** Cursor ON a property element's START: emits (subj, pred, object)
      * and consumes through its END. */
    private def parsePropertyElement(subj: String): Unit = {
      val pred = qname()
      if (pred == RdfNs + "li")
        fail("rdf:li / container membership is not supported")
      val lang = attr(XmlNs, "lang").orNull
      val dt = attr(RdfNs, "datatype").orNull
      (attr(RdfNs, "resource"), attr(RdfNs, "nodeID"),
        attr(RdfNs, "parseType")) match {
        case (Some(iri), _, _) =>
          out += Quad(graph, subj, pred, resolve(iri), null, null, Quad.KindIri)
          skipToEnd()
        case (None, Some(id), _) =>
          out += Quad(graph, subj, pred, namedBnode(id), null, null, Quad.KindBnode)
          skipToEnd()
        case (None, None, Some("Resource")) =>
          // parseType=Resource: children are property elements of a
          // fresh blank node standing in for the omitted Description
          val bn = freshBnode()
          out += Quad(graph, subj, pred, bn, null, null, Quad.KindBnode)
          propertyElements(bn)
        case (None, None, Some(other)) =>
          fail(s"""rdf:parseType="$other" is not supported""")
        case (None, None, None) =>
          // literal text OR one nested node element
          val sb = new StringBuilder
          var nested: Option[(String, String)] = None
          var done = false
          while (!done) reader.next() match {
            case C.CHARACTERS | C.CDATA => sb.append(reader.getText)
            case C.START_ELEMENT => nested = Some(parseNodeElement())
            case C.END_ELEMENT | C.END_DOCUMENT => done = true
            case _ => ()
          }
          nested match {
            case Some((v, k)) =>
              out += Quad(graph, subj, pred, v, null, null, k)
            case None =>
              // RDF 1.1: xsd:string-typed == plain; datatype excludes lang
              val ndt = if (dt == Quad.xsd.string) null else dt
              out += Quad(graph, subj, pred, sb.toString, ndt,
                if (ndt == null) lang else null, Quad.KindLiteral)
          }
      }
    }

    /** Consume the rest of the current element (whose object came from
      * an attribute); nested content under it is a grammar error. */
    private def skipToEnd(): Unit = {
      var depth = 0
      var done = false
      while (!done) reader.next() match {
        case C.START_ELEMENT => depth += 1
        case C.END_ELEMENT =>
          if (depth == 0) done = true else depth -= 1
        case C.END_DOCUMENT => done = true
        case _ => ()
      }
    }

    def parseAll(): Seq[Quad] = {
      try {
        // advance to the root element
        while (reader.hasNext && reader.next() != C.START_ELEMENT) ()
        if (reader.getEventType == C.START_ELEMENT) {
          base = attr(XmlNs, "base").getOrElse("")
          if (qname() == RdfNs + "RDF") {
            // children are node elements
            var done = false
            while (!done) reader.next() match {
              case C.START_ELEMENT => parseNodeElement()
              case C.END_ELEMENT | C.END_DOCUMENT => done = true
              case _ => ()
            }
          } else parseNodeElement() // a single node element as root
        }
      } finally reader.close()
      out.toSeq
    }
  }
}
