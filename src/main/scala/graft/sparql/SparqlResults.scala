package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** W3C SPARQL 1.1 Query Results serializers (JSON, CSV, TSV) — the
  * wire formats every SPARQL client stack (rdflib included, which is
  * how the reference's users consume Stardog answers) expects.
  *
  * Spark-first split: the PER-ROW serialization is a codegen'd column
  * expression over the term-struct result of
  * [[Compiler.runSelectTerms]] — `to_json` / `concat_ws` run
  * distributed, escaping included, so a 10⁹-row result serializes as a
  * map-only job writable straight to storage. Only the `*Document`
  * assemblers collect — they build ONE text document, which is by
  * definition result-sized and belongs wherever the client is.
  */
object SparqlResults {

  /** One W3C JSON binding object per term:
    * `{"type":"uri"|"literal"|"bnode","value":v[,"xml:lang":lg]
    * [,"datatype":dt]}`; null terms (unbound) stay null so `to_json`
    * omits the variable, as §3.2.2 requires. */
  private def bindingObj(c: Column): Column =
    when(c.isNull, lit(null).cast(
      "struct<type:string,value:string,`xml:lang`:string,datatype:string>"))
      .otherwise(struct(
        when(c.getField("k") === "iri", lit("uri"))
          .when(c.getField("k") === "bnode", lit("bnode"))
          .otherwise(lit("literal")).as("type"),
        c.getField("v").as("value"),
        c.getField("lg").as("xml:lang"),
        c.getField("dt").as("datatype")))

  /** Distributed per-row JSON serialization: one
    * `{"var":{binding},...}` object per line (to_json escapes values
    * and drops null fields — Spark's default ignoreNullFields). */
  def jsonBindings(terms: DataFrame): Dataset[String] = {
    import terms.sparkSession.implicits._
    terms.select(to_json(struct(
      terms.columns.map(v => bindingObj(col(v)).as(v)).toIndexedSeq: _*))
      .as("line")).as[String]
  }

  /** The complete §3 results document (head + bindings array). */
  def jsonDocument(terms: DataFrame): String = {
    val vars = terms.columns
      .map(v => "\"" + v + "\"").mkString(",")
    jsonBindings(terms).collect()
      .mkString(s"""{"head":{"vars":[$vars]},"results":{"bindings":[""",
        ",", "]}}")
  }

  /** The §3 boolean results document (ASK). */
  def askJsonDocument(result: Boolean): String =
    s"""{"head":{},"boolean":$result}"""

  /** RFC 4180 quoting for the CSV format (§4.1): quote when the value
    * contains a comma, quote, CR or LF; double inner quotes. Unbound →
    * empty field. */
  private def csvField(c: Column): Column = {
    val v = c.getField("v")
    when(v.isNull, lit(""))
      .when(v.rlike("[\",\r\n]"),
        concat(lit("\""), regexp_replace(v, "\"", "\"\""), lit("\"")))
      .otherwise(v)
  }

  /** Distributed CSV rows (no header — see [[csvDocument]]). */
  def csvRows(terms: DataFrame): Dataset[String] = {
    import terms.sparkSession.implicits._
    terms.select(concat_ws(",",
      terms.columns.map(v => csvField(col(v))).toIndexedSeq: _*)
      .as("line")).as[String]
  }

  /** Header + rows, CRLF-joined per §4.1. */
  def csvDocument(terms: DataFrame): String =
    (terms.columns.mkString(",") +: csvRows(terms).collect())
      .mkString("", "\r\n", "\r\n")

  /** TSV term syntax (§4.2): IRIs in `<>`, literals in SPARQL form
    * with `\`/`"`/tab/newline escaped and `@lang` / `^^<dt>` tags,
    * bnodes raw `_:label`; unbound → empty field. */
  private def tsvTerm(c: Column): Column = {
    val v = c.getField("v")
    val esc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      v, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\t", "\\\\t")
    when(c.isNull, lit(""))
      .when(c.getField("k") === "iri", concat(lit("<"), v, lit(">")))
      .when(c.getField("k") === "bnode", v)
      .otherwise(concat(lit("\""), esc, lit("\""),
        when(c.getField("lg").isNotNull, concat(lit("@"), c.getField("lg")))
          .otherwise(lit("")),
        when(c.getField("dt").isNotNull,
          concat(lit("^^<"), c.getField("dt"), lit(">")))
          .otherwise(lit(""))))
  }

  def tsvRows(terms: DataFrame): Dataset[String] = {
    import terms.sparkSession.implicits._
    terms.select(concat_ws("\t",
      terms.columns.map(v => tsvTerm(col(v))).toIndexedSeq: _*)
      .as("line")).as[String]
  }

  def tsvDocument(terms: DataFrame): String =
    (terms.columns.map("?" + _).mkString("\t") +: tsvRows(terms).collect())
      .mkString("", "\n", "\n")

  /** XML 1.0 content escaping for the XML results format: `&`, `<`,
    * `>`, plus CR as a character reference — a literal CR in element
    * content is LOST to the parser's line-ending normalization (§2.11),
    * the one corruption XML inflicts silently. */
  private def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\r", "&#13;")

  /** Attribute-value escaping: content escaping + double quotes. */
  private def xmlAttrEscape(c: Column): Column =
    regexp_replace(xmlEscape(c), "\"", "&quot;")

  /** One W3C XML `<result>` element per row (§2.3.1 of the SPARQL
    * Query Results XML Format): a `<binding name=...>` per BOUND
    * variable wrapping `<uri>`, `<bnode>` or `<literal>` (with
    * optional `xml:lang` / `datatype` attributes). Codegen'd column
    * concat — serializes distributed like the other formats. */
  private def xmlResult(vars: Seq[String]): Column = {
    val bindings = vars.map { v =>
      val c = col(v)
      val term =
        when(c.getField("k") === "iri",
          concat(lit("<uri>"), xmlEscape(c.getField("v")), lit("</uri>")))
          .when(c.getField("k") === "bnode",
            concat(lit("<bnode>"),
              regexp_replace(c.getField("v"), "^_:", ""), lit("</bnode>")))
          .otherwise(concat(
            lit("<literal"),
            when(c.getField("lg").isNotNull,
              concat(lit(" xml:lang=\""), c.getField("lg"), lit("\"")))
              .otherwise(lit("")),
            when(c.getField("dt").isNotNull,
              concat(lit(" datatype=\""), xmlAttrEscape(c.getField("dt")),
                lit("\""))).otherwise(lit("")),
            lit(">"), xmlEscape(c.getField("v")), lit("</literal>")))
      when(c.isNull, lit(""))
        .otherwise(concat(lit(s"""<binding name="$v">"""), term,
          lit("</binding>")))
    }
    concat(lit("<result>") +: bindings :+ lit("</result>"): _*)
  }

  /** Distributed XML `<result>` rows. */
  def xmlRows(terms: DataFrame): Dataset[String] = {
    import terms.sparkSession.implicits._
    terms.select(xmlResult(terms.columns.toIndexedSeq).as("line")).as[String]
  }

  /** The complete XML results document (head + results); `<result>`
    * elements newline-joined (insignificant whitespace — keeps the
    * document diffable and matches [[writeXmlDocument]] byte-for-byte). */
  def xmlDocument(terms: DataFrame): String = {
    val head = terms.columns
      .map(v => s"""<variable name="$v"/>""").mkString
    xmlRows(terms).collect().mkString(
      "<?xml version=\"1.0\"?>\n" +
        "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">" +
        s"<head>$head</head><results>",
      "\n", "</results></sparql>")
  }

  /** The XML boolean results document (ASK). */
  def askXmlDocument(result: Boolean): String =
    "<?xml version=\"1.0\"?>\n" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">" +
      s"<head/><boolean>$result</boolean></sparql>"

  // ------------------------------------------------- distributed sink

  /** Stream a row Dataset into ONE results document file at `path`.
    *
    * The `*Document` assemblers above `collect()` — right for a
    * protocol response, wrong for a 10⁹-row SELECT export. Here the
    * EXPENSIVE half (per-row serialization, escaping) runs distributed,
    * landing as text part files whose `lineSep` is the row TERMINATOR
    * the document needs; the epilogue then streams the parts RAW
    * (byte-for-byte — never re-split into lines, so values carrying
    * embedded newlines, e.g. CSV-quoted fields, survive) into the
    * single output file: header, parts in name order, footer. Driver
    * memory is CONSTANT regardless of result size — a small carry
    * buffer withholds the last `lineSep.length` bytes so formats whose
    * rows are SEPARATED (JSON's commas) can drop the final terminator.
    * (A single document file is inherently a single sequential writer;
    * what must never be result-sized is the MEMORY, not the final byte
    * stream.) */
  private def writeDocument(rows: Dataset[String], path: String,
      header: String, footer: String, lineSep: String,
      dropTrailingSep: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = rows.sparkSession
    val tmp = path + s".rows-${System.nanoTime()}"
    rows.write.option("lineSep", lineSep).text(tmp)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedOutputStream(
      fs.create(new Path(path), true), 1 << 20)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val sepBytes = lineSep.getBytes(utf8)
    try {
      out.write(header.getBytes(utf8))
      // carry = the last lineSep.length bytes seen so far, not yet
      // written; at EOF it is exactly the trailing terminator (when any
      // row was written) and is dropped or flushed per the format
      var carry = Array.emptyByteArray
      val parts = fs.listStatus(new Path(tmp)).toSeq
        .filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
      val buf = new Array[Byte](1 << 20)
      parts.foreach { p =>
        val in = fs.open(p.getPath)
        try {
          var n = in.read(buf)
          while (n > 0) {
            val all = carry ++ buf.take(n)
            val keep = math.min(sepBytes.length, all.length)
            out.write(all, 0, all.length - keep)
            carry = all.takeRight(keep)
            n = in.read(buf)
          }
        } finally in.close()
      }
      if (!(dropTrailingSep && carry.sameElements(sepBytes)))
        out.write(carry)
      out.write(footer.getBytes(utf8))
    } finally out.close()
    fs.delete(new Path(tmp), true)
  }

  /** File-streaming twin of [[jsonDocument]]: byte-identical output
    * (rows are comma-SEPARATED, so the trailing terminator drops). */
  def writeJsonDocument(terms: DataFrame, path: String): Unit = {
    val vars = terms.columns.map(v => "\"" + v + "\"").mkString(",")
    writeDocument(jsonBindings(terms), path,
      s"""{"head":{"vars":[$vars]},"results":{"bindings":[""", "]}}",
      ",", dropTrailingSep = true)
  }

  /** File-streaming twin of [[csvDocument]]: byte-identical output
    * (every row ends with CRLF per §4.1, the header line included). */
  def writeCsvDocument(terms: DataFrame, path: String): Unit =
    writeDocument(csvRows(terms), path,
      terms.columns.mkString(",") + "\r\n", "",
      "\r\n", dropTrailingSep = false)

  /** File-streaming twin of [[tsvDocument]]: byte-identical output. */
  def writeTsvDocument(terms: DataFrame, path: String): Unit =
    writeDocument(tsvRows(terms), path,
      terms.columns.map("?" + _).mkString("\t") + "\n", "",
      "\n", dropTrailingSep = false)

  /** File-streaming twin of [[xmlDocument]]: byte-identical output
    * (`<result>` elements are newline-joined in both). */
  def writeXmlDocument(terms: DataFrame, path: String): Unit = {
    val head = terms.columns
      .map(v => s"""<variable name="$v"/>""").mkString
    writeDocument(xmlRows(terms), path,
      "<?xml version=\"1.0\"?>\n" +
        "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">" +
        s"<head>$head</head><results>",
      "</results></sparql>", "\n", dropTrailingSep = true)
  }
}
