package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Quad

/** N-Triples serialization (sink S5) and parsing (source S4).
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
  private def escapeCol(c: Column): Column = {
    val backslash = regexp_replace(c, "\\\\", "\\\\\\\\")
    val quote = regexp_replace(backslash, "\"", "\\\\\"")
    val nl = regexp_replace(quote, "\n", "\\\\n")
    val cr = regexp_replace(nl, "\r", "\\\\r")
    regexp_replace(cr, "\t", "\\\\t")
  }

  private def subjectTerm(s: Column): Column =
    when(s.startsWith(Quad.BnodePrefix), s).otherwise(concat(lit("<"), s, lit(">")))

  private def objectTerm(v: Column, kind: Column, dt: Column, lg: Column): Column =
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
  }

  /** Read an N-Triples file (or directory of part files) into quads
    * bound to `graph`. */
  def read(spark: SparkSession, path: String, graph: String): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path)
      .mapPartitions(_.flatMap(l => Option(parseLine(l, graph))))
  }
}
