package graft.model

/** The engine's fundamental record: an RDF quad (named-graph triple).
  *
  * Mirrors the reference's data model where every statement lives in a
  * named graph (`/root/reference/airflow_files/dags/sparql_update.py:108-122`
  * wraps all inserts in `INSERT DATA { GRAPH <g> { ... } }`) and terms are
  * IRIs, blank nodes, or (typed / language-tagged) literals
  * (`/root/reference/airflow_files/dags/parse_functions.py:83,98-105`).
  *
  * Representation choices (SURVEY.md §1.1–1.2):
  *  - flat `String` columns → columnar-friendly at rest (parquet),
  *    codegen-friendly in flight;
  *  - blank nodes are encoded in the value with a `_:` prefix, so
  *    subject needs no separate kind column;
  *  - `oKind ∈ {iri, bnode, literal}` discriminates object terms;
  *  - plain literals have `oType = null`; RDF 1.1 semantics: a literal
  *    typed `xsd:string` is normalized to a plain literal;
  *  - `oLang` carries the language tag for `STRLANG`-produced literals.
  */
case class Quad(
    graph: String,
    s: String,
    p: String,
    o_value: String,
    o_type: String,
    o_lang: String,
    o_kind: String)

object Quad {
  val KindIri = "iri"
  val KindBnode = "bnode"
  val KindLiteral = "literal"

  val BnodePrefix = "_:"

  /** The unnamed default graph's storage name. SPARQL's default graph has
    * no IRI; the partitioned store still needs a partition value, so the
    * engine reserves this one. `LOAD` without `INTO GRAPH` and the
    * `DEFAULT` keyword in COPY/MOVE/ADD both resolve here. */
  val DefaultGraph = "urn:graft:default"

  object xsd {
    val ns = "http://www.w3.org/2001/XMLSchema#"
    val integer: String = ns + "integer"
    val double: String = ns + "double"
    val boolean: String = ns + "boolean"
    val string: String = ns + "string"
    val dateTime: String = ns + "dateTime"
    val decimal: String = ns + "decimal"
    val dayTimeDuration: String = ns + "dayTimeDuration"
    /** The full XSD numeric-type hierarchy (XSD 1.1 §3.3–3.4): the engine
      * itself only mints integer/double/decimal, but TTL / RDF-XML ingest
      * can carry any of these, and ISNUMERIC (SPARQL §17.4.2.4) must be
      * true for all of them. */
    val numericTypes: Seq[String] =
      Seq("integer", "decimal", "double", "float", "long", "int", "short",
        "byte", "nonNegativeInteger", "nonPositiveInteger",
        "negativeInteger", "positiveInteger", "unsignedLong", "unsignedInt",
        "unsignedShort", "unsignedByte").map(ns + _)
  }

  def iri(graph: String, s: String, p: String, o: String): Quad =
    Quad(graph, s, p, o, null, null, KindIri)

  def lit(graph: String, s: String, p: String, v: String): Quad =
    Quad(graph, s, p, v, null, null, KindLiteral)

  def typed(graph: String, s: String, p: String, v: String, dt: String): Quad =
    // RDF 1.1: xsd:string-typed literal == plain literal
    Quad(graph, s, p, v, if (dt == xsd.string) null else dt, null, KindLiteral)

  def isBnode(term: String): Boolean = term != null && term.startsWith(BnodePrefix)
}
