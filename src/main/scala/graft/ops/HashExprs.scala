package graft.ops

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
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

object HashExprs {
  /** Column wrapper for the native polynomial hash. */
  def poly_hash(c: Column, base: Long = 257L): Column =
    GraftShim.column(PolyHashExpr(GraftShim.expression(c), base))

  /** Column wrapper for the native whole-document SimHash. */
  def simhash64(c: Column): Column =
    GraftShim.column(SimHashExpr(GraftShim.expression(c)))
}
