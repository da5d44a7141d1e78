package graft.sparql

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for SPARQL scalar functions that Spark lacks. */
object SparqlRuntime {
  /** SPARQL 1.1 ENCODE_FOR_URI — RFC 3986 percent-encoding: keep only
    * unreserved chars (ALPHA / DIGIT / '-' / '.' / '_' / '~'), encode
    * everything else as uppercase %XX over UTF-8 bytes. Note this differs
    * from java.net.URLEncoder (which keeps '+', '*' and space→'+').
    * Reference use: `tl_users_mapping.sparql:47`.
    */
  def encodeForUri(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c = b.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~')
        sb.append(c)
      else sb.append('%').append(f"$b%02X")
      i += 1
    }
    sb.toString
  }
}

/** Native Catalyst expression for ENCODE_FOR_URI (codegen'd, null-safe —
  * stays inside whole-stage codegen unlike a Scala UDF). */
case class EncodeForUriExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "encode_for_uri"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SparqlRuntime.encodeForUri(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sparql.SparqlRuntime.encodeForUri($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization runtime (java.text.Normalizer — the JDK's
  * ICU-derived implementation of UAX #15). A text pipeline normalizes
  * before hashing/dedup so that composed ("café") and decomposed
  * ("cafe" + U+0301) spellings of the same string collide. */
object NormalizeRuntime {
  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  def nfkc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
}

/** Native codegen'd NFC/NFKC normalization — a Catalyst expression, not
  * a UDF, so it stays inside whole-stage codegen on the token hot path. */
case class NormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  require(form == "NFC" || form == "NFKC", s"unsupported form $form")
  override def dataType: DataType = StringType
  override def prettyName: String = s"normalize_${form.toLowerCase}"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      if (form == "NFC") NormalizeRuntime.nfc(s) else NormalizeRuntime.nfkc(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (form == "NFC") "nfc" else "nfkc"
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sparql.NormalizeRuntime.$fn($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SparqlFunctions {
  /** Column wrapper for the native expression. */
  def encode_for_uri(c: Column): Column =
    GraftShim.column(EncodeForUriExpr(GraftShim.expression(c)))

  /** Unicode NFC normalization (native, codegen'd). */
  def normalize_nfc(c: Column): Column =
    GraftShim.column(NormalizeExpr(GraftShim.expression(c), "NFC"))

  /** Unicode NFKC normalization (native, codegen'd). */
  def normalize_nfkc(c: Column): Column =
    GraftShim.column(NormalizeExpr(GraftShim.expression(c), "NFKC"))
}
