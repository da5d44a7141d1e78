package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.model.TermDictionary
import Algebra._

/** Plan-time context for dictionary-encoded SPARQL execution
  * ([[graft.model.DictQuadStore]]): constant-id lookups and the
  * boundary decode the compiler applies when a pattern block finishes.
  *
  * Scoped per operation through [[DictContext.current]] (the same
  * DynamicVariable discipline as [[CardEstimator]]): GraphEngine pushes
  * a fresh context around each compile, so the memo can never go stale
  * across an update sequence that grows the dictionary. Everything here
  * runs at PLAN TIME — the constructed DataFrame plan owns the dict
  * joins afterwards and needs no context to execute.
  */
final class DictContext(val dict: DataFrame) {

  /** term key → id, memoized. Bounded by the query text (constants),
    * never by data — the same driver-side envelope as k-means
    * centroids or VALUES rows. */
  private val memo = scala.collection.mutable.Map.empty[String, Option[Long]]

  /** One batched lookup for a query's whole constant set (one tiny
    * filtered dict scan instead of a job per constant). */
  def preload(terms: Set[String]): Unit = {
    val missing = terms -- memo.keySet
    if (missing.isEmpty) return
    val found = dict.filter(col("term").isin(missing.toSeq: _*))
      .select("term", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    missing.foreach(t => memo.update(t, found.get(t)))
  }

  /** Id of one constant term; None = the store has never seen it, so a
    * pattern using it matches nothing. Falls back to a single-term
    * lookup for any constant [[preload]]'s walk missed. */
  def idOf(term: String): Option[Long] =
    memo.getOrElseUpdate(term, {
      dict.filter(col("term") === term).select("id")
        .collect().headOption.map(_.getLong(0))
    })

  private def termStruct: Column =
    struct(col("v").as("v"), col("k").as("k"),
      col("dt").as("dt"), col("lg").as("lg"))

  /** Replace the named id (long) columns with their `(v,k,dt,lg)` term
    * structs — one dictionary equi-join per variable, applied ONCE at
    * the pattern-block boundary. This is the decode-on-projection step:
    * every join before it shuffled longs; everything after it is
    * result-shaped. Ids coming out of a pattern join always exist in
    * the dictionary, so the joins are inner. */
  def decode(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val idCol = s"_dec_$c"
      val tsCol = s"_ts_$c"
      d.join(dict.select(col("id").as(idCol), termStruct.as(tsCol)),
          col(c) === col(idCol))
        .drop(c, idCol)
        .withColumnRenamed(tsCol, c)
    }

  /** Decode every long column (a pattern-block frame's long columns are
    * exactly its id-bound variables). */
  def decode(df: DataFrame): DataFrame =
    decode(df, df.schema.fields.filter(_.dataType == LongType)
      .map(_.name).toIndexedSeq)

  // ---- decode-or-drop (project-early) ---------------------------------

  /** Whole-operation variable usage, set ONCE by the first compile entry
    * point (subqueries compiled mid-group must not overwrite the outer
    * analysis). None = no analysis — decode everything. */
  private var usage: Option[DictContext.VarUsage] = None
  private var usageSet = false

  def setUsageIfUnset(u: Option[DictContext.VarUsage]): Unit =
    if (!usageSet) { usage = u; usageSet = true }

  /** Block-boundary decode with DEAD-VARIABLE ELIMINATION: a variable
    * whose pattern-slot occurrences all lie inside THIS block and which
    * no projection/expression/other element ever references is pure
    * join glue (`?e` in `?e :type "x" . ?e :user ?u`) — dropping its id
    * column is semantically free (row multiplicity is untouched; it can
    * never be a join key elsewhere, by the usage analysis) and saves a
    * vocabulary-sized dictionary join per dropped var. Without usage
    * info every long column decodes (the safe default). */
  def decodeBlock(df: DataFrame, blockSlots: Map[String, Int],
      keepIds: Set[String] = Set.empty): DataFrame = {
    val longCols = df.schema.fields.filter(_.dataType == LongType)
      .map(_.name).toIndexedSeq.filterNot(keepIds)
    usage match {
      case Some(u) =>
        def slotsAllHere(v: String) =
          u.patternSlots.getOrElse(v, -1) == blockSlots.getOrElse(v, 0)
        val (drop, live) = longCols.partition(v =>
          !u.usedOutsidePatterns(v) && slotsAllHere(v))
        // COUNT-only vars stay RAW ids: COUNT/COUNT DISTINCT need
        // binding presence (and id-distinctness ≡ term-distinctness —
        // the dictionary is a bijection), never the term text, so the
        // vocabulary-sized decode join would broadcast a dictionary
        // projection that decodes nothing. Only safe when every pattern
        // slot of the var sits in THIS block — otherwise a later block
        // (or a SERVICE frame) could re-bind it as a term struct and
        // the long column would no longer align.
        val (_, dec) = live.partition(v => u.countOnly(v) && slotsAllHere(v))
        decode(df.drop(drop: _*), dec)
      case None => decode(df, longCols)
    }
  }

  /** The reverse boundary crossing: replace a term-struct column with
    * its dictionary id (canonical-key equi-join; rows whose term the
    * store has never seen drop — such a term can participate in no
    * stored edge, which is exactly the join semantics the caller
    * wants). Used to seed id-space path closures from already-decoded
    * bindings; result-sized, like decode. */
  def encodeTerm(df: DataFrame, c: String): DataFrame = {
    val f = col(c)
    val key = TermDictionary.objTerm(f.getField("v"), f.getField("dt"),
      f.getField("lg"), f.getField("k"))
    df.withColumn("_enc_key", key)
      .join(dict.select(col("term").as("_enc_term"),
        col("id").as(s"_enc_$c")), col("_enc_key") === col("_enc_term"))
      .drop(c, "_enc_key", "_enc_term")
      .withColumnRenamed(s"_enc_$c", c)
  }
}

object DictContext {
  /** Planner-scoped context, pushed by GraphEngine when its store is
    * dictionary-encoded; None = string-space compilation. */
  val current: scala.util.DynamicVariable[Option[DictContext]] =
    new scala.util.DynamicVariable[Option[DictContext]](None)

  /** The context the encoded pattern path requires. */
  def required: DictContext = current.value.getOrElse(
    throw new IllegalStateException(
      "encoded quads reached the compiler without a DictContext in scope " +
        "(run through GraphEngine over a DictQuadStore)"))

  /** Canonical dictionary key of a constant pattern node (IRIs/bnodes
    * raw, literals via the shared canonicalizer). */
  def keyOf(n: Node): Option[String] = n match {
    case I(iri) => Some(iri)
    case L(v, dt, lang) => Some(TermDictionary.literalKey(v, dt, lang))
    case V(_) => None
  }

  /** Every constant term a group's patterns can ask the dictionary for
    * — triple-pattern slots, closure endpoints, and the same inside
    * OPTIONAL/UNION/MINUS/GRAPH/EXISTS/subquery bodies. Fuel for
    * [[DictContext.preload]]; anything missed degrades to a per-term
    * lookup, never to a wrong answer. */
  def constantTerms(g: Group): Set[String] = {
    val out = Set.newBuilder[String]
    def node(n: Node): Unit = keyOf(n).foreach(out += _)
    def expr(e: Expr): Unit = e match {
      case ExistsE(inner, _) => walk(inner)
      case NotE(x) => expr(x)
      case AndE(l, r) => expr(l); expr(r)
      case OrE(l, r) => expr(l); expr(r)
      case _ => ()
    }
    def walk(g: Group): Unit = g.elems.foreach {
      case Pat(tp) => node(tp.s); node(tp.p); node(tp.o)
      case Opt(inner) => walk(inner)
      case Bind(_, _) => ()
      case FilterE(e) => expr(e)
      case UnionE(bs) => bs.foreach(walk)
      case MinusE(inner) => walk(inner)
      // VALUES joins in term space, but its ground terms also feed the
      // pushed In(ids) scan filter — preload them with the batch
      case ValuesE(_, rows) => rows.foreach(_.foreach(_.foreach(node)))
      case c: ClosureE => node(c.s); node(c.o); walk(c.edges)
      case GraphE(_, inner) => walk(inner)
      case SubSelectE(q) => walk(q.where)
      case ServiceE(_, inner, _) => walk(inner) // harmless if unused
    }
    walk(g)
    out.result()
  }

  /** Per-operation variable-usage summary for [[DictContext.decodeBlock]]:
    * how many triple-pattern SLOTS (s/p/o positions, anywhere in the
    * tree — OPTIONAL/UNION/MINUS/GRAPH/EXISTS bodies, subqueries,
    * closure edge groups) mention each variable, and which variables
    * anything OTHER than a pattern slot references (projections,
    * expressions, VALUES, closure endpoints, graph names, service
    * bodies). A var outside both sets for a given block is dead after
    * that block's join. `countOnly` ⊆ usedOutsidePatterns: vars whose
    * ONLY non-pattern use is as a plain COUNT([DISTINCT] ?v) argument —
    * they must survive the block (the aggregate consumes them) but
    * never need the decode join (COUNT sees presence; DISTINCT in id
    * space equals DISTINCT in term space). */
  final case class VarUsage(patternSlots: Map[String, Int],
      usedOutsidePatterns: Set[String],
      countOnly: Set[String] = Set.empty)

  /** Variables an expression references — stops at EXISTS bodies (those
    * are walked as groups, so their PRIVATE vars stay droppable). */
  private def exprVars(e: Any): Set[String] = e match {
    case VarRef(n) => Set(n)
    case BoundE(v) => Set(v)
    case ExistsE(_, _) => Set.empty
    case o: Option[_] => o.toSeq.flatMap(exprVars).toSet
    case i: Iterable[_] => i.flatMap(exprVars).toSet
    case p: Product => p.productIterator.flatMap(exprVars).toSet
    case _ => Set.empty
  }

  /** Compute [[VarUsage]] for one operation. `needs` = variables the
    * operation's OUTPUT consumes (projection/template/order/group...).
    * Returns None — "keep everything" — when any `SELECT *` appears
    * (its binding table must retain every bound variable). */
  def usageOf(g: Group, needs: Set[String]): Option[VarUsage] = {
    val slots = scala.collection.mutable.Map.empty[String, Int]
    val used = Set.newBuilder[String]
    val countArgs = Set.newBuilder[String]
    used ++= needs
    var keepAll = false
    def addSlot(n: Node): Unit = n match {
      case V(v) => slots(v) = slots.getOrElse(v, 0) + 1
      case _ => ()
    }
    def existsGroups(e: Any): Seq[Group] = e match {
      case ExistsE(inner, _) => Seq(inner)
      case o: Option[_] => o.toSeq.flatMap(existsGroups)
      case i: Iterable[_] => i.toSeq.flatMap(existsGroups)
      case p: Product => p.productIterator.flatMap(existsGroups).toSeq
      case _ => Seq.empty
    }
    def walkExpr(e: Expr): Unit = {
      used ++= exprVars(e)
      existsGroups(e).foreach(walk)
    }
    def walkSelect(q: SelectQuery): Unit = {
      if (q.projection.isEmpty) keepAll = true // SELECT *
      q.projection.foreach {
        case PVar(n) => used += n
        // plain COUNT([DISTINCT] ?v): record separately — if nothing
        // else references ?v it can stay a raw id (no decode join)
        case PAgg("COUNT", Some(VarRef(n)), _, _, _) => countArgs += n
        case PAgg(_, arg, _, _, _) => arg.foreach(a => used ++= exprVars(a))
        case PExpr(e, _) => used ++= exprVars(e)
      }
      used ++= q.groupBy
      q.having.foreach(h => used ++= exprVars(h))
      used ++= q.orderBy.map(_.v)
      q.trailingValues.foreach(v => used ++= v.vars)
      walk(q.where)
    }
    def walk(grp: Group): Unit = grp.elems.foreach {
      case Pat(tp) => Seq(tp.s, tp.p, tp.o).foreach(addSlot)
      case Opt(inner) => walk(inner)
      case Bind(e, _) => walkExpr(e)
      case FilterE(e) => walkExpr(e)
      case UnionE(bs) => bs.foreach(walk)
      case MinusE(inner) => walk(inner)
      case ValuesE(vs, _) => used ++= vs
      case c: ClosureE =>
        used ++= Seq(c.s, c.o).collect { case V(n) => n }
        used += c.ev1; used += c.ev2
        walk(c.edges)
      case GraphE(gn, inner) =>
        gn match { case V(n) => used += n; case _ => () }
        walk(inner)
      case SubSelectE(q) => walkSelect(q)
      case ServiceE(_, inner, _) =>
        // service patterns compile against unencoded frames; anything
        // they bind may join the outer block — keep it all
        used ++= inner.vars
        walk(inner)
    }
    walk(g)
    if (keepAll) None
    else {
      val usedSet = used.result()
      // count-only = counted somewhere AND referenced nowhere else;
      // still "used outside patterns" (the aggregate needs the column)
      val countOnly = countArgs.result() -- usedSet
      Some(VarUsage(slots.toMap, usedSet ++ countOnly, countOnly))
    }
  }
}
