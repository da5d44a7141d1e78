package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Quad

/** N-Triples / N-Quads serialization (sink S5) and parsing (source S4).
  *
  * The reference serializes with rdflib's `.n3()` per term and joins with
  * `" . \n"` (`/root/reference/airflow_files/dags/sparql_update.py:135-141`)
  * and reads any RDF file via `Graph().parse`
  * (`/root/reference/airflow_files/dags/sparql_update.py:124-133`). Here:
  *
  *  - the writer is pure Catalyst column expressions (whole-stage
  *    codegen'd, no UDF) — `quads → one N-Triples line per row`;
  *  - the reader is a line-based `spark.read.text` + a small per-line
  *    recursive-descent parser in `mapPartitions` (N-Triples is a
  *    line-oriented format, so it splits perfectly across partitions —
  *    unlike Turtle, which would need a document-level parse).
  */
object NTriples {

  /** N-Triples string escaping per W3C spec: \ " \n \r \t. */
  private[rdf] def escapeCol(c: Column): Column = {
    val backslash = regexp_replace(c, "\\\\", "\\\\\\\\")
    val quote = regexp_replace(backslash, "\"", "\\\\\"")
    val nl = regexp_replace(quote, "\n", "\\\\n")
    val cr = regexp_replace(nl, "\r", "\\\\r")
    regexp_replace(cr, "\t", "\\\\t")
  }

  private[rdf] def subjectTerm(s: Column): Column =
    when(s.startsWith(Quad.BnodePrefix), s).otherwise(concat(lit("<"), s, lit(">")))

  private[rdf] def objectTerm(v: Column, kind: Column, dt: Column, lg: Column): Column =
    when(kind === Quad.KindIri, concat(lit("<"), v, lit(">")))
      .when(kind === Quad.KindBnode, v)
      .otherwise( // literal
        concat(lit("\""), escapeCol(v), lit("\""),
          when(lg.isNotNull, concat(lit("@"), lg))
            .when(dt.isNotNull, concat(lit("^^<"), dt, lit(">")))
            .otherwise(lit(""))))

  /** One N-Triples line per quad row (graph column is dropped — the
    * format is triple-scoped, like the reference's serializer). */
  def toLines(quads: DataFrame): DataFrame =
    quads.select(concat(
      subjectTerm(col("s")), lit(" "),
      concat(lit("<"), col("p"), lit(">")), lit(" "),
      objectTerm(col("o_value"), col("o_kind"), col("o_type"), col("o_lang")),
      lit(" .")).as("value"))

  def write(quads: DataFrame, path: String): Unit =
    toLines(quads).write.mode("overwrite").text(path)

  /** One N-Quads line per quad row: the N-Triples line plus the graph
    * label, omitted for default-graph statements per the N-Quads
    * grammar (RDF 1.1 N-Quads §2 — the graph label slot is optional). */
  def toQuadLines(quads: DataFrame): DataFrame =
    quads.select(concat(
      subjectTerm(col("s")), lit(" "),
      concat(lit("<"), col("p"), lit(">")), lit(" "),
      objectTerm(col("o_value"), col("o_kind"), col("o_type"), col("o_lang")),
      when(col("graph") === Quad.DefaultGraph, lit(""))
        .otherwise(concat(lit(" "), subjectTerm(col("graph")))),
      lit(" .")).as("value"))

  def writeQuads(quads: DataFrame, path: String): Unit =
    toQuadLines(quads).write.mode("overwrite").text(path)

  // ---------------------------------------------------------------- reader

  /** Parse one N-Triples line; returns null for blank/comment lines.
    * Malformed lines raise IllegalArgumentException carrying the line —
    * a raw index-out-of-bounds from one bad line in a huge ingest would
    * otherwise kill the job with no pointer to the culprit. */
  def parseLine(line: String, graph: String): Quad = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return null
    try {
      val p = new LineParser(t)
      val s = p.term()
      val pred = p.term()
      val obj = p.term()
      p.expectDot()
      Quad(graph, s._1, pred._1, obj._1, obj._3, obj._4, obj._2)
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new IllegalArgumentException(
          s"malformed N-Triples line: $t", e)
    }
  }

  /** (value, kind, datatype, lang) */
  private final class LineParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && (s(i) == ' ' || s(i) == '\t')) i += 1

    def term(): (String, String, String, String) = {
      ws()
      s(i) match {
        case '<' =>
          val end = s.indexOf('>', i)
          val v = s.substring(i + 1, end); i = end + 1
          (v, Quad.KindIri, null, null)
        case '_' =>
          val start = i
          while (i < s.length && s(i) != ' ' && s(i) != '\t') i += 1
          (s.substring(start, i), Quad.KindBnode, null, null)
        case '"' =>
          i += 1
          val sb = new StringBuilder
          while (s(i) != '"') {
            if (s(i) == '\\') {
              i += 1
              s(i) match {
                case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
                case 't' => sb.append('\t'); case '"' => sb.append('"')
                case '\\' => sb.append('\\')
                case 'u' =>
                  sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
                  i += 4
                case c => sb.append(c)
              }
            } else sb.append(s(i))
            i += 1
          }
          i += 1 // closing quote
          if (i < s.length && s(i) == '@') {
            val start = i + 1
            while (i < s.length && s(i) != ' ' && s(i) != '\t') i += 1
            (sb.toString, Quad.KindLiteral, null, s.substring(start, i))
          } else if (i + 1 < s.length && s(i) == '^' && s(i + 1) == '^') {
            i += 2
            val end = s.indexOf('>', i)
            val dt = s.substring(i + 1, end); i = end + 1
            (sb.toString, Quad.KindLiteral,
              if (dt == Quad.xsd.string) null else dt, null)
          } else (sb.toString, Quad.KindLiteral, null, null)
        case c => throw new IllegalArgumentException(s"bad N-Triples term at $i: $s")
      }
    }

    def expectDot(): Unit = { ws(); require(i < s.length && s(i) == '.', s"missing dot: $s") }

    /** N-Quads: a graph label (IRI or blank node) may sit between the
      * object and the final dot. */
    def optionalGraphLabel(): Option[String] = {
      ws()
      if (i < s.length && (s(i) == '<' || s(i) == '_')) Some(term()._1)
      else None
    }
  }

  /** Parse one N-Quads line: the N-Triples triple plus an OPTIONAL
    * graph label (IRI or blank node) before the dot; statements without
    * a label land in `defaultGraph`. Returns null for blank/comment
    * lines. N-Quads is line-oriented like N-Triples, so this splits
    * perfectly across partitions — the preferred bulk interchange
    * format for a multi-graph store at scale. */
  def parseQuadLine(line: String, defaultGraph: String): Quad = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#")) return null
    try {
      val p = new LineParser(t)
      val s = p.term()
      val pred = p.term()
      val obj = p.term()
      val g = p.optionalGraphLabel().getOrElse(defaultGraph)
      p.expectDot()
      Quad(g, s._1, pred._1, obj._1, obj._3, obj._4, obj._2)
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new IllegalArgumentException(
          s"malformed N-Quads line: $t", e)
    }
  }

  /** Read an N-Triples file (or directory of part files) into quads
    * bound to `graph`. */
  def read(spark: SparkSession, path: String, graph: String): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions(_.flatMap(l => Option(parseLine(l, graph))))
  }

  /** Read an N-Quads file (or directory of part files); each statement
    * keeps its own graph label, unlabeled statements go to
    * `defaultGraph`. */
  def readQuads(spark: SparkSession, path: String,
      defaultGraph: String = Quad.DefaultGraph): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions(_.flatMap(l => Option(parseQuadLine(l, defaultGraph))))
  }
}
