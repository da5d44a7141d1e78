package graft.rdf

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Quad

/** JSON-LD reader (source S4f) — the last rdflib-parity format.
  *
  * The reference accepts any rdflib-parsable RDF file
  * (`/root/reference/airflow_files/dags/sparql_update.py:124-133` —
  * `Graph().parse(filename)`, and rdflib ships a `json-ld` parser);
  * with N-Quads and TriG landed in round 8 this closes the list of
  * formats a reference user could actually hand the engine.
  *
  * Supported JSON-LD 1.0 deserialization subset ("Deserialize JSON-LD
  * to RDF", W3C REC 2014 §10):
  *  - `@context` maps: term → IRI, prefix definitions (compact IRIs
  *    `pre:suffix`), expanded term definitions with `@id`, `@type`
  *    (datatype coercion or the `@id` keyword for IRI coercion),
  *    `@language`, `@container: @list|@set`; plus `@vocab`, `@base`
  *    and a document-default `@language`; contexts may appear on any
  *    node object and scope over its subtree;
  *  - node objects: `@id` (IRI, relative-to-`@base`, or `_:label`),
  *    `@type` (string or array → rdf:type), nested node objects
  *    (minted blank nodes), node references `{"@id": ...}`;
  *  - values: JSON string/number/boolean natives (→ plain literal /
  *    xsd:integer / xsd:double / xsd:boolean), `@value` objects with
  *    `@type` or `@language`, arrays (multi-valued), `@list` (→
  *    rdf:first/rest/nil chains, nested allowed), `@reverse` maps;
  *  - `@graph`: a top-level `@graph` array lands in the caller's
  *    default graph; a node object with both `@id` and `@graph` is a
  *    NAMED graph whose contents land in graph = that `@id` — so the
  *    format is quad-scoped, dispatched like N-Quads/TriG in LOAD.
  *
  * Out of scope (documented, loud where detectable): `@index`,
  * `@nest`, `@included`, JSON-LD 1.1 scoped/propagated contexts,
  * remote context URLs (zero-egress environment — a string `@context`
  * raises).
  *
  * Scale note: JSON-LD is DOCUMENT-scoped (a leading `@context`
  * rewrites every term after it), so each file parses as one task
  * (`wholetext` read), parallel across files — same envelope as the
  * Turtle/TriG readers; bulk interchange at scale should prefer
  * N-Quads, which splits at line boundaries.
  */
object JsonLd {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RdfType = RdfNs + "type"
  private val RdfFirst = RdfNs + "first"
  private val RdfRest = RdfNs + "rest"
  private val RdfNil = RdfNs + "nil"

  /** Parse one JSON-LD document into ground quads; top-level content
    * lands in `defaultGraph`, named-graph node objects in their own
    * graph. Blank-node labels are namespaced by a document content
    * hash so nodes from different files can never collide. */
  def parse(doc: String, defaultGraph: String): Seq[Quad] =
    new LdParser(doc, defaultGraph).parseAll()

  /** Read a JSON-LD file (or directory of .jsonld files); one task per
    * file — see the scale note in the object doc. */
  def read(spark: SparkSession, path: String,
      defaultGraph: String = Quad.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", value = true).text(path)
      .as[String]
      .flatMap(doc => parse(doc, defaultGraph))
  }

  // ------------------------------------------------------------- sink

  /** One flattened JSON-LD node object per (graph, subject) — expanded
    * form, fully self-contained (no shared context): default-graph
    * subjects serialize as plain node objects, named-graph subjects as
    * `{"@id": g, "@graph": [node]}` wrappers, which both this reader
    * and any conformant JSON-LD processor (rdflib included) accept.
    * Predicates and values are sorted for deterministic output. Pure
    * Catalyst column expressions (codegen'd) — same design as the
    * N-Triples sink; rdf:type stays a regular predicate with an `@id`
    * object, which is valid expanded JSON-LD and roundtrips exactly. */
  def toNodeLines(quads: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def esc(c: org.apache.spark.sql.Column) = {
      // JSON string escaping: backslash first, then quote + the JSON
      // short escapes (other raw control chars are not expected in RDF
      // term values; the reader would still parse them if Jackson does)
      val bs = regexp_replace(c, "\\\\", "\\\\\\\\")
      val q = regexp_replace(bs, "\"", "\\\\\"")
      val nl = regexp_replace(q, "\n", "\\\\n")
      val cr = regexp_replace(nl, "\r", "\\\\r")
      val tb = regexp_replace(cr, "\t", "\\\\t")
      val bb = regexp_replace(tb, "\b", "\\\\b")
      regexp_replace(bb, "\f", "\\\\f")
    }
    val vjson =
      when(col("o_kind") === Quad.KindIri || col("o_kind") === Quad.KindBnode,
        concat(lit("{\"@id\":\""), esc(col("o_value")), lit("\"}")))
        .when(col("o_lang").isNotNull,
          concat(lit("{\"@value\":\""), esc(col("o_value")),
            lit("\",\"@language\":\""), col("o_lang"), lit("\"}")))
        .when(col("o_type").isNotNull,
          concat(lit("{\"@value\":\""), esc(col("o_value")),
            lit("\",\"@type\":\""), esc(col("o_type")), lit("\"}")))
        .otherwise(concat(lit("\""), esc(col("o_value")), lit("\"")))
    val perPred = quads
      .select(col("graph"), col("s"), col("p"), vjson.as("vj"))
      .groupBy(col("graph"), col("s"), col("p"))
      .agg(concat(lit("\""), esc(col("p")), lit("\":["),
        array_join(sort_array(collect_list(col("vj"))), ","),
        lit("]")).as("pj"))
    val node = concat(lit("{\"@id\":\""), esc(col("s")), lit("\","),
      array_join(sort_array(collect_list(col("pj"))), ","), lit("}"))
    perPred
      .groupBy(col("graph"), col("s"))
      .agg(when(col("graph") === Quad.DefaultGraph, node)
        .otherwise(concat(lit("{\"@id\":\""), esc(col("graph")),
          lit("\",\"@graph\":["), node, lit("]}"))).as("value"))
      .select(col("value"))
  }

  /** Write quads as JSON-LD: each part file is ONE valid JSON-LD
    * document (a JSON array of flattened node objects), so every file
    * is independently parseable — by this reader and by rdflib — and
    * the dataset still writes in parallel with one shuffle (the
    * subject grouping). The array framing is per-partition glue
    * (first/last line brackets), the one place a column expression
    * can't reach. */
  def write(quads: DataFrame, path: String): Unit = {
    import quads.sparkSession.implicits._
    toNodeLines(quads).as[String].mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        var first = true
        val framed = it.map { l =>
          if (first) { first = false; l } else ", " + l
        }
        Iterator("[") ++ framed ++ Iterator("]")
      }
    }.write.mode("overwrite").text(path)
  }

  // ObjectMapper is thread-safe after configuration; share one (same
  // pattern as JsonFlattener.sharedFactory).
  private val mapper = new ObjectMapper()

  /** One term's definition from an expanded `@context` entry. */
  private final case class TermDef(
      iri: String,
      coerceType: String, // datatype IRI, "@id", or null
      language: String, // term-level @language (may be explicit null)
      languageSet: Boolean,
      listContainer: Boolean)

  /** Active context: term definitions + document-level knobs. Immutable —
    * a node-level `@context` layers a copy, scoping over the subtree. */
  private final case class Ctx(
      terms: Map[String, TermDef],
      vocab: String,
      base: String,
      language: String)

  private final class LdParser(input: String, defaultGraph: String) {
    private val out = mutable.ArrayBuffer.empty[Quad]
    private var bnodeCounter = 0
    private val docTag =
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(input))
    // explicit `_:label` ids keep one minted label per document
    private val labeled = mutable.Map.empty[String, String]

    private def freshBnode(): String = {
      bnodeCounter += 1
      s"${Quad.BnodePrefix}j${docTag}_$bnodeCounter"
    }

    private def bnodeFor(label: String): String =
      labeled.getOrElseUpdate(label,
        s"${Quad.BnodePrefix}j${docTag}_${label.stripPrefix(Quad.BnodePrefix)}")

    def parseAll(): Seq[Quad] = {
      val root = mapper.readTree(input)
      val ctx = contextOf(root, Ctx(Map.empty, null, "", null))
      root match {
        case a if a.isArray => a.elements().asScala.foreach(processNode(_, ctx, defaultGraph))
        case o if o.isObject => processNode(o, ctx, defaultGraph)
        case other => throw new IllegalArgumentException(
          s"JSON-LD document must be an object or array, got: ${other.getNodeType}")
      }
      out.toSeq
    }

    // -------------------------------------------------------- context

    /** Layer `node`'s `@context` (if any) over `outer`. */
    private def contextOf(node: JsonNode, outer: Ctx): Ctx = {
      if (!node.isObject || !node.has("@context")) return outer
      val cs = node.get("@context")
      // an array of contexts layers left-to-right (JSON-LD 1.0 §5.1)
      val entries = if (cs.isArray) cs.elements().asScala.toSeq else Seq(cs)
      entries.foldLeft(outer) { (ctx, c) =>
        if (c.isTextual) throw new IllegalArgumentException(
          s"remote @context URLs are unsupported (zero-egress): ${c.asText}")
        require(c.isObject, s"@context must be an object, got ${c.getNodeType}")
        var vocab = ctx.vocab; var base = ctx.base; var lang = ctx.language
        val terms = mutable.Map.empty[String, TermDef] ++ ctx.terms
        // two passes so term definitions can reference prefixes declared
        // in the same context regardless of key order
        val fields = c.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        fields.foreach {
          case ("@vocab", v) => vocab = if (v.isNull) null else v.asText
          case ("@base", v) => base = if (v.isNull) "" else v.asText
          case ("@language", v) => lang = if (v.isNull) null else v.asText
          case (k, _) if k.startsWith("@") => () // @version etc — ignored
          case (term, v) if v.isTextual =>
            terms(term) = TermDef(v.asText, null, null, languageSet = false,
              listContainer = false)
          case _ => () // expanded definitions handled in pass 2
        }
        // resolve simple (string) term IRIs that are themselves compact
        val resolved = Ctx(terms.toMap, vocab, base, lang)
        fields.foreach {
          case (k, _) if k.startsWith("@") => ()
          case (term, v) if v.isTextual =>
            terms(term) = terms(term).copy(
              iri = expandIri(v.asText, resolved, vocabTerm = true))
          case (term, v) if v.isObject =>
            val id = if (v.has("@id")) expandIri(v.get("@id").asText, resolved,
              vocabTerm = true)
            else expandIri(term, resolved, vocabTerm = true)
            val ct = if (v.has("@type")) {
              val t = v.get("@type").asText
              if (t == "@id") "@id" else expandIri(t, resolved, vocabTerm = true)
            } else null
            val hasLang = v.has("@language")
            val lg = if (hasLang && !v.get("@language").isNull)
              v.get("@language").asText else null
            val list = v.has("@container") &&
              v.get("@container").asText == "@list"
            terms(term) = TermDef(id, ct, lg, hasLang, list)
          case (term, v) => throw new IllegalArgumentException(
            s"unsupported @context entry for '$term': ${v.getNodeType}")
        }
        Ctx(terms.toMap, vocab, base, lang)
      }
    }

    /** Expand a term/compact-IRI/relative-IRI. `vocabTerm` = property /
      * type position (vocab-mapped); otherwise document-relative (@base).
      * Returns null for a term that expands to nothing (dropped, per
      * spec's expansion of unmapped relative terms). */
    private def expandIri(s: String, ctx: Ctx, vocabTerm: Boolean): String = {
      if (s == null || s.startsWith("@")) return s // keyword
      ctx.terms.get(s) match {
        case Some(td) => return td.iri
        case None => ()
      }
      val colon = s.indexOf(':')
      if (colon > 0) {
        val prefix = s.substring(0, colon)
        val suffix = s.substring(colon + 1)
        // a compact IRI only when the prefix is a defined term and the
        // suffix doesn't start a blank-node or already-absolute form
        if (!suffix.startsWith("//")) ctx.terms.get(prefix) match {
          case Some(td) if prefix != "_" => return td.iri + suffix
          case _ => ()
        }
        return s // absolute IRI (has a scheme) or `_:bnode`
      }
      if (vocabTerm) { if (ctx.vocab != null) ctx.vocab + s else null }
      else resolveAgainst(ctx.base, s)
    }

    /** RFC 3986 merge for document-relative references, matching the
      * RDF/XML reader's base handling. */
    private def resolveAgainst(base: String, ref: String): String =
      if (base.isEmpty || ref.isEmpty) (if (ref.isEmpty) base else ref)
      else try new java.net.URI(base).resolve(ref).toString
      catch { case _: Exception => ref }

    // ---------------------------------------------------------- nodes

    /** Emit a node object's quads into `graph`; returns its subject
      * term (IRI or bnode). */
    private def processNode(node: JsonNode, outer: Ctx, graph: String): String = {
      require(node.isObject, s"node object expected, got ${node.getNodeType}")
      val ctx = contextOf(node, outer)
      val subject =
        if (node.has("@id")) {
          val raw = node.get("@id").asText
          if (raw.startsWith(Quad.BnodePrefix)) bnodeFor(raw)
          else expandIri(raw, ctx, vocabTerm = false)
        } else freshBnode()

      node.properties().asScala.foreach { e =>
        val (key, v) = (e.getKey, e.getValue)
        key match {
          case "@context" | "@id" => ()
          case "@type" =>
            val ts = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            ts.foreach { t =>
              val iri = expandIri(t.asText, ctx, vocabTerm = true)
              if (iri != null) out += Quad.iri(graph, subject, RdfType, iri)
            }
          case "@graph" =>
            // named graph when this node has an @id; a top-level
            // (id-less) @graph keeps the caller's graph
            val g = if (node.has("@id")) subject else graph
            val items = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
            items.foreach(processNode(_, ctx, g))
          case "@reverse" =>
            require(v.isObject, "@reverse requires an object value")
            v.properties().asScala.foreach { re =>
              val p = expandIri(re.getKey, ctx, vocabTerm = true)
              if (p != null) {
                val vs = if (re.getValue.isArray)
                  re.getValue.elements().asScala.toSeq else Seq(re.getValue)
                vs.foreach { child =>
                  val cid = processNode(child, ctx, graph)
                  out += Quad(graph, cid, p, subject, null, null,
                    kindOf(subject))
                }
              }
            }
          case "@index" => () // content-free annotation, legal to ignore
          case k if k.startsWith("@") => throw new IllegalArgumentException(
            s"unsupported JSON-LD keyword: $k")
          case term =>
            val td = ctx.terms.getOrElse(term,
              TermDef(expandIri(term, ctx, vocabTerm = true), null, null,
                languageSet = false, listContainer = false))
            if (td.iri != null)
              processValues(subject, td, v, ctx, graph)
        }
      }
      subject
    }

    private def kindOf(term: String): String =
      if (Quad.isBnode(term)) Quad.KindBnode else Quad.KindIri

    /** Emit quads for one property's value(s). JSON `null` drops the
      * entry entirely (JSON-LD 1.0 §6.1). */
    private def processValues(subject: String, td: TermDef, v: JsonNode,
        ctx: Ctx, graph: String): Unit = {
      if (v.isNull || (v.isObject && v.has("@value") && v.get("@value").isNull)) {
        ()
      } else if (td.listContainer && (v.isArray || !v.isObject || !v.has("@list"))) {
        // @container:@list coerces the bare value/array into a list
        val items = if (v.isArray) v.elements().asScala.toSeq else Seq(v)
        emitList(subject, td, items, ctx, graph)
      } else if (v.isArray) {
        v.elements().asScala.foreach(processValues(subject, td, _, ctx, graph))
      } else if (v.isObject && v.has("@list")) {
        val l = v.get("@list")
        require(l.isArray, "@list requires an array value")
        emitList(subject, td, l.elements().asScala.toSeq, ctx, graph)
      } else {
        val (value, kind, dt, lg) = objectTerm(v, td, ctx, graph)
        out += Quad(graph, subject, td.iri, value, dt, lg, kind)
      }
    }

    /** rdf:first/rest/nil cons chain; each cons cell is a fresh bnode.
      * The empty list is the IRI rdf:nil (JSON-LD 1.0 §10 list
      * conversion). Emits `subject td.iri <head>` plus the chain. */
    private def emitList(subject: String, td: TermDef, items: Seq[JsonNode],
        ctx: Ctx, graph: String): Unit = {
      if (items.isEmpty) {
        out += Quad.iri(graph, subject, td.iri, RdfNil)
        return
      }
      val cells = items.map(_ => freshBnode())
      out += Quad(graph, subject, td.iri, cells.head, null, null, Quad.KindBnode)
      // item values reuse the term's coercion but never its list container
      val itemTd = td.copy(listContainer = false)
      cells.zip(items).zipWithIndex.foreach { case ((cell, item), i) =>
        val (value, kind, dt, lg) = objectTerm(item, itemTd, ctx, graph)
        out += Quad(graph, cell, RdfFirst, value, dt, lg, kind)
        if (i + 1 < cells.length)
          out += Quad(graph, cell, RdfRest, cells(i + 1), null, null, Quad.KindBnode)
        else out += Quad.iri(graph, cell, RdfRest, RdfNil)
      }
    }

    /** One value → (o_value, o_kind, o_type, o_lang). Nested node
      * objects are processed for their side-effect quads. */
    private def objectTerm(v: JsonNode, td: TermDef, ctx: Ctx,
        graph: String): (String, String, String, String) = {
      if (v.isObject && v.has("@value")) {
        val value = v.get("@value")
        val dt = if (v.has("@type"))
          expandIri(v.get("@type").asText, ctx, vocabTerm = true) else null
        val lg = if (v.has("@language") && !v.get("@language").isNull)
          v.get("@language").asText else null
        require(dt == null || lg == null,
          "@value cannot carry both @type and @language")
        if (dt != null) literal(value.asText, dt, null)
        else if (lg != null) literal(value.asText, null, lg)
        // a bare @value wrapper still converts natives, but never picks
        // up the context default language (it carries its own, absent)
        else nativeLiteral(value, lang = null)
      } else if (v.isObject && v.has("@list")) {
        // only reachable for a list nested INSIDE a list: represent the
        // inner list via a fresh intermediate subject
        val inner = v.get("@list")
        require(inner.isArray, "@list requires an array value")
        val items = inner.elements().asScala.toSeq
        if (items.isEmpty) return (RdfNil, Quad.KindIri, null, null)
        val head = freshBnode()
        // reuse emitList by chaining from a synthetic cons: emit the
        // chain cells directly
        val cells = head +: items.drop(1).map(_ => freshBnode())
        cells.zip(items).zipWithIndex.foreach { case ((cell, item), i) =>
          val (value, kind, dt, lg) = objectTerm(item, td, ctx, graph)
          out += Quad(graph, cell, RdfFirst, value, dt, lg, kind)
          if (i + 1 < cells.length)
            out += Quad(graph, cell, RdfRest, cells(i + 1), null, null, Quad.KindBnode)
          else out += Quad.iri(graph, cell, RdfRest, RdfNil)
        }
        (head, Quad.KindBnode, null, null)
      } else if (v.isObject) {
        // node reference or nested node object
        val id = processNode(v, ctx, graph)
        (id, kindOf(id), null, null)
      } else if (td.coerceType == "@id" && v.isTextual) {
        val raw = v.asText
        val id = if (raw.startsWith(Quad.BnodePrefix)) bnodeFor(raw)
        else expandIri(raw, ctx, vocabTerm = false)
        (id, kindOf(id), null, null)
      } else if (td.coerceType != null && v.isTextual) {
        literal(v.asText, td.coerceType, null)
      } else {
        // term-level @language (explicit null clears) beats the
        // context default (JSON-LD 1.0 §6.9)
        val lang = if (td.languageSet) td.language else ctx.language
        nativeLiteral(v, lang)
      }
    }

    private def literal(value: String, dt: String,
        lg: String): (String, String, String, String) =
      // RDF 1.1: xsd:string-typed literal == plain literal (Quad.typed)
      (value, Quad.KindLiteral,
        if (dt == Quad.xsd.string) null else dt, lg)

    /** JSON native → RDF literal (JSON-LD 1.0 §10 native types);
      * `lang` applies to strings only. */
    private def nativeLiteral(v: JsonNode,
        lang: String): (String, String, String, String) = {
      if (v.isBoolean) literal(if (v.asBoolean) "true" else "false",
        Quad.xsd.boolean, null)
      else if (v.isIntegralNumber) literal(v.asText, Quad.xsd.integer, null)
      else if (v.isNumber) literal(v.asText, Quad.xsd.double, null)
      else if (v.isTextual) literal(v.asText, null, lang)
      else throw new IllegalArgumentException(
        s"unsupported JSON-LD value: ${v.getNodeType}")
    }
  }
}
