package graft.sparql

/** Relational algebra for the SPARQL-update subset the reference uses
  * (SURVEY.md §2.3 Q1–Q15). A mapping query is:
  *
  *   `WITH <target> INSERT { template } USING g1 USING g2 WHERE { group }`
  *
  * The WHERE group is evaluated left-to-right (SPARQL's sequential group
  * semantics — BIND introduces its variable at its position in the group),
  * producing a binding table with one term-struct column per variable;
  * the INSERT template emits one quad per (template triple × binding row)
  * where all three slots are bound (Q10 partial-template semantics).
  */
object Algebra {

  // ---- pattern nodes -------------------------------------------------
  sealed trait Node
  /** variable slot */
  final case class V(name: String) extends Node
  /** constant IRI */
  final case class I(iri: String) extends Node
  /** constant literal (dt normalized: xsd:string → null) */
  final case class L(value: String, dt: String = null, lang: String = null) extends Node

  final case class TriplePattern(s: Node, p: Node, o: Node) {
    def vars: Seq[String] = Seq(s, p, o).collect { case V(n) => n }
  }

  // ---- group elements ------------------------------------------------
  sealed trait Element
  final case class Pat(tp: TriplePattern) extends Element
  final case class Opt(group: Group) extends Element
  final case class Bind(expr: Expr, as: String) extends Element
  final case class FilterE(expr: Expr) extends Element
  /** `{g1} UNION {g2} UNION ...` (single branch = plain nested group).
    * Variables bound in one branch only are unbound (null) in rows from
    * the others. */
  final case class UnionE(branches: Seq[Group]) extends Element
  /** `MINUS {g}` — drop bindings that join (on the shared variables)
    * with some solution of the inner group; no shared variables = no
    * removal, per SPARQL MINUS. */
  final case class MinusE(group: Group) extends Element
  /** `VALUES ?v { t ... }` / `VALUES (?v1 ?v2) { (t1 t2) ... }` —
    * inline binding table. Each row has one entry per variable; None is
    * `UNDEF` (the variable stays unbound in that row). */
  final case class ValuesE(vars: Seq[String],
      rows: Seq[Seq[Option[Node]]]) extends Element
  /** Path repetition `s path{minHops,maxHops} o` — the runtime node
    * behind `+` (1,∞), `*` (0,∞) and `?` (0,1). `edges` is the desugared
    * one-hop pattern group binding `(ev1, ev2)`; the compiler iterates
    * pair-doubling joins to the reachability fixpoint (skipped when
    * maxHops == 1), then constrains the endpoints by `s`/`o` (var or
    * constant IRI). minHops == 0 adds the zero-length identity pairs,
    * domain-restricted per the ALP semantics: every term of the scoped
    * graph, plus the query's own constant endpoints. Paths `/ ^ |`
    * desugar at parse time. */
  final case class ClosureE(s: Node, edges: Group, ev1: String, ev2: String,
      o: Node, minHops: Int = 1, maxHops: Int = Int.MaxValue) extends Element
  /** `GRAPH g { group }` — scope the inner group to one named graph
    * (constant IRI: partition-pruned read) or bind the graph per
    * solution (variable: every inner pattern also binds `?g`, so the
    * BGP joins align within a single graph automatically). */
  final case class GraphE(g: Node, group: Group) extends Element
  /** `{ SELECT ... }` subquery: evaluated bottom-up, its projection
    * (vars + aggregate aliases) joins into the enclosing group on the
    * shared variables. Aggregate outputs surface as typed literals. */
  final case class SubSelectE(query: SelectQuery) extends Element
  /** `SERVICE [SILENT] <iri> { ... }` (SPARQL 1.1 Federated Query),
    * re-homed for a Spark engine: the endpoint IRI resolves through
    * [[graft.sparql.Services]] to a REGISTERED quad dataset and the
    * inner group compiles against it, so the federated join is an
    * ordinary distributed join Catalyst can broadcast or shuffle —
    * instead of the driver-bottlenecked per-binding HTTP round-trips
    * a literal federation client would make (and this environment's
    * zero-egress policy forbids). SILENT + unregistered endpoint
    * degrades to the unit table, per spec. */
  final case class ServiceE(iri: String, group: Group, silent: Boolean)
    extends Element

  final case class Group(elems: Seq[Element]) {
    def vars: Set[String] = elems.flatMap {
      case Pat(tp) => tp.vars
      case Opt(g) => g.vars
      case Bind(_, as) => Seq(as)
      case FilterE(_) => Seq.empty
      case UnionE(bs) => bs.flatMap(_.vars)
      case MinusE(_) => Seq.empty // MINUS binds nothing outward
      case ValuesE(vs, _) => vs
      case c: ClosureE =>
        Seq(c.s, c.o).collect { case V(n) => n } // edge vars stay internal
      case GraphE(g, inner) =>
        (Seq(g).collect { case V(n) => n }) ++ inner.vars
      case SubSelectE(q) =>
        q.vars ++ q.aggs.map(_.as)
      case ServiceE(_, inner, _) => inner.vars
    }.toSet
  }

  // ---- scalar expressions (SURVEY.md §2.4) ---------------------------
  sealed trait Expr
  final case class VarRef(name: String) extends Expr
  final case class StrLit(value: String) extends Expr
  final case class TypedLit(value: String, dt: String) extends Expr
  final case class ConcatE(args: Seq[Expr]) extends Expr
  final case class UriE(arg: Expr) extends Expr
  final case class Md5E(arg: Expr) extends Expr
  final case class LcaseE(arg: Expr) extends Expr
  final case class ReplaceE(arg: Expr, pattern: String, replacement: String) extends Expr
  final case class StrAfterE(arg: Expr, sep: String) extends Expr
  final case class EncodeForUriE(arg: Expr) extends Expr
  final case class StrLangE(arg: Expr, lang: String) extends Expr
  final case class IfE(cond: Expr, thenE: Expr, elseE: Expr) extends Expr
  final case class BoundE(varName: String) extends Expr
  final case class StrStartsE(arg: Expr, prefix: Expr) extends Expr

  // ---- operator / builtin surface (SPARQL 1.1 §17 expression grammar;
  // the reference's own queries only need the constructs above, so these
  // are the engine's read-side extension) -------------------------------
  /** numeric literal; `lexical` keeps the written form (`42`, `-3.5`).
    * Integer vs double decided by the presence of `.`/exponent. */
  final case class NumLit(lexical: String) extends Expr {
    def isDouble: Boolean = lexical.exists(c => c == '.' || c == 'e' || c == 'E')
  }
  final case class BoolLit(value: Boolean) extends Expr
  /** op ∈ { = != < <= > >= }; numeric comparison when either side is
    * statically numeric, lexical-value comparison otherwise. */
  final case class CmpE(op: String, l: Expr, r: Expr) extends Expr
  final case class AndE(l: Expr, r: Expr) extends Expr
  final case class OrE(l: Expr, r: Expr) extends Expr
  final case class NotE(e: Expr) extends Expr
  /** `?x IN (e1, e2, ...)` / `?x NOT IN (...)` */
  final case class InE(e: Expr, terms: Seq[Expr], negated: Boolean) extends Expr
  /** op ∈ { + - * / }; evaluated as double arithmetic. */
  final case class ArithE(op: String, l: Expr, r: Expr) extends Expr
  /** XPath-regex match; flags subset: `i` (case-insensitive). */
  final case class RegexE(arg: Expr, pattern: String, flags: String) extends Expr
  final case class ContainsE(arg: Expr, sub: Expr) extends Expr
  final case class StrEndsE(arg: Expr, suffix: Expr) extends Expr
  /** STR(term) — the lexical form, for IRIs the IRI string. */
  final case class StrE(arg: Expr) extends Expr
  /** LANG(term) — language tag or "" (per spec, never null on literals). */
  final case class LangE(arg: Expr) extends Expr
  /** DATATYPE(term) — xsd:string for plain literals per RDF 1.1. */
  final case class DatatypeE(arg: Expr) extends Expr
  final case class StrLenE(arg: Expr) extends Expr
  final case class IsIriE(arg: Expr) extends Expr
  final case class IsLiteralE(arg: Expr) extends Expr
  final case class IsBlankE(arg: Expr) extends Expr
  /** langMatches(tag, range) — §17.4.3.1 basic language range match. */
  final case class LangMatchesE(tag: Expr, range: Expr) extends Expr
  /** sameTerm(a, b) — full term identity (kind + value + type + lang). */
  final case class SameTermE(l: Expr, r: Expr) extends Expr
  /** STRDT(lexical, datatypeIri) — typed-literal constructor. */
  final case class StrDtE(arg: Expr, dt: Expr) extends Expr
  final case class UcaseE(arg: Expr) extends Expr
  /** SUBSTR(s, start[, len]) — 1-based, per XPath fn:substring. */
  final case class SubstrE(arg: Expr, start: Expr, len: Option[Expr]) extends Expr
  /** STRBEFORE: prefix before the FIRST separator match; "" if absent. */
  final case class StrBeforeE(arg: Expr, sep: String) extends Expr
  final case class CoalesceE(args: Seq[Expr]) extends Expr
  /** fn ∈ { ABS ROUND CEIL FLOOR } over the numeric value (double). */
  final case class NumFnE(fn: String, arg: Expr) extends Expr
  /** fn ∈ { SHA1 SHA256 SHA384 SHA512 } — hex digest of the lexical
    * form (§17.4.4; MD5 has its own node for historical reasons). */
  final case class HashE(fn: String, arg: Expr) extends Expr
  /** fn ∈ { YEAR MONTH DAY HOURS MINUTES SECONDS TZ TIMEZONE } over an
    * xsd:dateTime lexical form (§17.4.5). Malformed input ⇒ unbound. */
  final case class DtFnE(fn: String, arg: Expr) extends Expr
  /** NOW() — one timestamp per query execution (§17.4.5.1). */
  case object NowE extends Expr
  /** UUID() (urn:uuid IRI) / STRUUID() (plain literal) — fresh per
    * solution (§17.4.4.13–14). */
  final case class UuidE(asIri: Boolean) extends Expr
  /** RAND() — xsd:double in [0,1), fresh per solution (§17.4.4.1). */
  case object RandE extends Expr
  /** BNODE() — fresh label per solution; BNODE(str) — label stable per
    * lexical argument within the query (§17.4.2.9). */
  final case class BNodeE(arg: Option[Expr]) extends Expr
  /** isNumeric(term) — literal with a numeric datatype (§17.4.2.4). */
  final case class IsNumericE(arg: Expr) extends Expr
  /** Aggregate call in expression position — HAVING (§11.5) permits
    * aggregates that are not projected, e.g. `HAVING (COUNT(?x) > 5)`.
    * The compiler pulls each occurrence into a hidden aggregate column. */
  final case class AggE(fn: String, arg: Option[Expr], distinct: Boolean) extends Expr
  /** `[NOT] EXISTS { group }` — valid only as a whole FILTER constraint
    * (it compiles to a semi/anti join, not a per-row expression). */
  final case class ExistsE(group: Group, negated: Boolean) extends Expr

  /** One SPARQL-update mapping task. `usingNamed` is the `USING NAMED`
    * list — the named-graph dataset GRAPH patterns in the WHERE clause
    * range over (same §13.2 rules as FROM NAMED on the read side). */
  final case class MappingQuery(
      name: String,
      targetGraph: String,
      usingGraphs: Seq[String],
      where: Group,
      template: Seq[TriplePattern],
      usingNamed: Seq[String] = Seq.empty)

  // ---- read-side query forms --------------------------------------
  /** One SELECT projection item: a plain variable or an aggregate. */
  sealed trait ProjItem
  final case class PVar(name: String) extends ProjItem
  /** `(FN([DISTINCT] expr|*) AS ?alias)`; arg None = `COUNT(*)`.
    * `sep` is GROUP_CONCAT's `; SEPARATOR="..."` (default " "). */
  final case class PAgg(fn: String, arg: Option[Expr], distinct: Boolean,
      as: String, sep: Option[String] = None) extends ProjItem
  /** `(expr AS ?alias)` — non-aggregate projection expression (17.4);
    * in grouped queries it may reference only grouped variables. */
  final case class PExpr(expr: Expr, as: String) extends ProjItem

  final case class OrderKey(v: String, asc: Boolean)

  /** A SPARQL SELECT query (read side). Empty `projection` = `SELECT *`
    * (all bound variables, name-sorted). `fromGraphs` scope like USING.
    * `having` applies over aggregate aliases (after grouping). */
  final case class SelectQuery(
      name: String,
      projection: Seq[ProjItem],
      distinct: Boolean,
      fromGraphs: Seq[String],
      where: Group,
      groupBy: Seq[String],
      having: Option[Expr],
      orderBy: Seq[OrderKey],
      limit: Option[Int],
      offset: Option[Int],
      /** `FROM NAMED` list (§13.2): the named-graph set GRAPH patterns
        * range over. Empty with a nonempty `fromGraphs` means GRAPH
        * matches nothing — per spec, any dataset clause makes the
        * dataset explicit. Both empty = whole-store default. */
      fromNamed: Seq[String] = Seq.empty,
      /** trailing `VALUES` clause (§18.2.4.3): joined with the
        * solutions — inside the WHERE join for plain queries, after
        * grouping and HAVING for aggregate queries. */
      trailingValues: Option[ValuesE] = None) {
    def vars: Seq[String] = projection.collect { case PVar(n) => n }
    def aggs: Seq[PAgg] = projection.collect { case a: PAgg => a }
  }

  /** `ASK [FROM g]* { group }` — does any solution exist. */
  final case class AskQuery(name: String, fromGraphs: Seq[String],
      where: Group, fromNamed: Seq[String] = Seq.empty)

  /** `DESCRIBE (<iri> | ?v) [FROM g]* [WHERE { group }]` — concise
    * bounded description of the target resource(s); the variable form
    * describes every IRI the WHERE group binds to ?v. */
  final case class DescribeQuery(
      target: Node,
      fromGraphs: Seq[String],
      where: Option[Group],
      fromNamed: Seq[String] = Seq.empty)

  /** `CONSTRUCT { template } [FROM g]* WHERE { group }` — instantiate
    * the template once per solution (unbound slots skip, like INSERT).
    * The `CONSTRUCT WHERE { triples }` shorthand reuses the pattern
    * group as the template. */
  final case class ConstructQuery(
      name: String,
      template: Seq[TriplePattern],
      fromGraphs: Seq[String],
      where: Group,
      fromNamed: Seq[String] = Seq.empty)

  // ---- DSL sugar for transcribing queries ----------------------------
  object dsl {
    val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    def v(n: String): V = V(n)
    def i(iri: String): I = I(iri)
    def l(s: String): L = L(s)

    def pat(s: Node, p: String, o: Node): Pat = Pat(TriplePattern(s, I(p), o))
    def opt(elems: Element*): Opt = Opt(Group(elems))
    def bind(e: Expr, as: String): Bind = Bind(e, as)

    def vr(n: String): VarRef = VarRef(n)
    def str(s: String): StrLit = StrLit(s)
    def cc(args: Expr*): ConcatE = ConcatE(args)
    def uri(e: Expr): UriE = UriE(e)
    def md5e(e: Expr): Md5E = Md5E(e)

    /** Anonymous-variable counter for `[ ... ]` bnode property paths (Q3). */
    private val anon = new java.util.concurrent.atomic.AtomicInteger
    def anonVar(): V = V(s"_anon${anon.incrementAndGet()}")
  }
}
