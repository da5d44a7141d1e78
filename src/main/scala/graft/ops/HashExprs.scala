package graft.ops

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for the cross-engine polynomial rolling hash (see
  * [[Sketches.polyHash]] for the contract: fold over the string's
  * Unicode code points, `acc -> (acc*base + cp) mod (2^31-1)`), hoisted
  * out of the higher-order-function formulation into a single tight
  * loop. The HOF chain (regexp_replace per-char explode -> split ->
  * aggregate) allocates an array cell, a UTF8String, and a lambda
  * frame PER CHARACTER; this loop touches each code point once with
  * zero allocation — same math, bit-identical values (pinned by
  * `HashExprParitySpec` against the HOF formulation across ASCII,
  * Latin-1, CJK and supplementary-plane inputs), so every committed
  * DuckDB oracle replay (CMS / KMV / SimHash) is untouched.
  *
  * Precondition shared with [[Sketches.polyHashSql]]: the input must
  * contain no whitespace (tokens from `TextOps.tokens` by
  * construction) — the SQL replay round-trips characters through a
  * space-delimited split, so whitespace-bearing inputs would diverge
  * between engines even though this loop handles them fine.
  */
object HashRuntime {
  private val P = 2147483647L // 2^31 - 1

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whole-document 62-bit SimHash in ONE pass over the text — the
    * map-side form of [[Dedup.simhashAgg]]'s explode + 16-lane vote
    * aggregation (r12 verdict `dedup_simhash` fix): tokenize on Java
    * `\s+` runs (identical to `split(trim(text), "\\s+")` + the
    * `length > 0` filter), per token fold BOTH base-257/263 polynomial
    * code-point hashes in the same character loop, pack them into the
    * 62-bit token hash `h1 | h2 << 31`, vote each bit, and emit bit i
    * iff `2*count_i > ntok`. Same math as the aggregation formulation
    * and the committed DuckDB oracle (pinned by `HashExprParitySpec`),
    * but with NO explode, NO shuffle, and no 65536-tokens/doc lane-
    * carry cap (votes are 32-bit ints per bit here). Returns null for
    * token-less documents — the aggregation formulation emits no row
    * for those, so callers filter nulls to keep row parity. */
  def simhash(text: UTF8String): java.lang.Long = {
    val s = text.toString
    val counts = new Array[Int](62)
    var ntok = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        var h1 = 0L
        var h2 = 0L
        while (i < n && !isWs(s.charAt(i))) {
          val cp = s.codePointAt(i)
          h1 = (h1 * 257L + cp) % P
          h2 = (h2 * 263L + cp) % P
          i += Character.charCount(cp)
        }
        val h = h1 | (h2 << 31)
        var b = 0
        while (b < 62) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        ntok += 1L
      }
    }
    if (ntok == 0L) null
    else {
      var fp = 0L
      var b = 0
      while (b < 62) {
        if (2L * counts(b) > ntok) fp |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(fp)
    }
  }

  /** Token-level longest-common-prefix of two string arrays: count of
    * leading positions where both elements are present, non-null and
    * equal — exactly the zip_with(null-pad) + alive-fold semantics of
    * the HOF formulation it replaces (`Dedup.tokenLcpHof`, pinned by
    * `HashExprParitySpec`). One array walk, no per-element struct
    * allocation. */
  def tokenLcp(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return i
      if (!a.getUTF8String(i).equals(b.getUTF8String(i))) return i
      i += 1
    }
    n
  }

  def polyHash(s: UTF8String, base: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native codegen'd polynomial token hash — a Catalyst expression, not
  * a UDF, so the dedup/sketch token hot paths stay inside whole-stage
  * codegen with one virtual call per token instead of a per-character
  * HOF pipeline (the r12 verdict's `dedup_simhash` fix; precedent:
  * [[graft.sparql.EncodeForUriExpr]]). */
case class PolyHashExpr(child: Expression, base: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    HashRuntime.polyHash(input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.HashRuntime.polyHash($c, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd whole-document SimHash fingerprint (see
  * [[HashRuntime.simhash]] for the exact contract). Nullable: a
  * token-less document has no fingerprint. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashRuntime.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_fp = graft.ops.HashRuntime.simhash($c);
      if (${ev.value}_fp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_fp.longValue();
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native codegen'd token-array longest-common-prefix (see
  * [[HashRuntime.tokenLcp]]) — the adjacency test of the suffix-sort
  * dedup, evaluated 1:1 per sorted suffix pair, where the zip_with +
  * struct-fold HOF it replaces dominated the whole pass at 30x bench
  * scale (r13 sf3 rehearsal finding). */
case class TokenLcpExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_lcp"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashRuntime.tokenLcp(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.HashRuntime.tokenLcp($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HashExprs {
  /** Column wrapper for the native polynomial hash. */
  def poly_hash(c: Column, base: Long = 257L): Column =
    GraftShim.column(PolyHashExpr(GraftShim.expression(c), base))

  /** Column wrapper for the native whole-document SimHash. */
  def simhash64(c: Column): Column =
    GraftShim.column(SimHashExpr(GraftShim.expression(c)))

  /** Column wrapper for the native token-array LCP. */
  def token_lcp(a: Column, b: Column): Column =
    GraftShim.column(TokenLcpExpr(
      GraftShim.expression(a), GraftShim.expression(b)))
}
