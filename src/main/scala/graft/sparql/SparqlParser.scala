package graft.sparql

import scala.collection.mutable

import graft.model.Quad
import Algebra._

/** Recursive-descent parser for the SPARQL 1.1 *update* subset the
  * reference exercises (SURVEY.md §2.3, entry point B — the reference
  * itself never parses SPARQL; it POSTs text to the store, so this
  * parser is the engine-side equivalent of the store's front end):
  *
  *   PREFIX decls; `WITH g INSERT {t} USING g... WHERE {...}`;
  *   `INSERT DATA { [GRAPH g] {...} }`; `CLEAR|DROP [SILENT] GRAPH g`;
  *   triple blocks with `;` / `,` lists, `a`, `[...]` blank-node
  *   property lists; OPTIONAL, BIND, FILTER; the §2.4 function library;
  *   plain / typed / language-tagged literals.
  *
  * Grammar per the public SPARQL 1.1 spec; only the subset needed for
  * the reference workload is implemented, with clear errors elsewhere.
  */
object SparqlParser {

  sealed trait UpdateOp
  final case class InsertWhere(query: MappingQuery) extends UpdateOp
  final case class InsertData(quads: Seq[Quad]) extends UpdateOp
  /** `DELETE { template } USING g WHERE { ... }` — the instantiated
    * template quads are REMOVED from the store. */
  final case class DeleteWhere(query: MappingQuery) extends UpdateOp
  final case class DeleteData(quads: Seq[Quad]) extends UpdateOp
  /** `[WITH g] DELETE { t1 } INSERT { t2 } USING g* WHERE { ... }` —
    * ONE binding evaluation against the pre-update state feeds both
    * templates; deletes apply before inserts (SPARQL 1.1 §3.1.3). */
  final case class ModifyWhere(
      deleteGraph: String, insertGraph: String, usingGraphs: Seq[String],
      where: Group, deleteTemplate: Seq[TriplePattern],
      insertTemplate: Seq[TriplePattern],
      usingNamed: Seq[String] = Seq.empty) extends UpdateOp
  /** Generalized DELETE/INSERT..WHERE whose templates are QUAD patterns
    * (§3.1.3 QuadPattern): each template triple carries its own graph
    * term — a constant IRI or a VARIABLE bound by the WHERE group. The
    * single-constant-graph ops below stay the fast path (their target
    * graph feeds the store's partition-scoped writes); the parser emits
    * this form only when a template actually mixes graphs or uses a
    * variable graph slot. */
  final case class QuadModifyWhere(
      delTemplate: Seq[(Node, TriplePattern)],
      insTemplate: Seq[(Node, TriplePattern)],
      using: Seq[String],
      where: Group,
      usingNamed: Seq[String]) extends UpdateOp

  final case class ClearGraphOp(graph: String, silent: Boolean) extends UpdateOp
  /** `CLEAR|DROP [SILENT] ALL|NAMED|DEFAULT` (§3.2.2-3) — scope is one
    * of "ALL", "NAMED", "DEFAULT". CLEAR and DROP coincide on a store
    * where a graph's existence IS its content. */
  final case class ClearScopeOp(scope: String, silent: Boolean) extends UpdateOp
  final case class DropGraphOp(graph: String, silent: Boolean) extends UpdateOp
  /** `COPY|MOVE|ADD [SILENT] [GRAPH] g1 TO [GRAPH] g2` — graph-level
    * management (SPARQL 1.1 Update §3.2.3-5). COPY replaces g2 with
    * g1's contents; MOVE additionally drops g1; ADD unions into g2. */
  final case class CopyGraphOp(from: String, to: String, silent: Boolean)
    extends UpdateOp
  final case class MoveGraphOp(from: String, to: String, silent: Boolean)
    extends UpdateOp
  final case class AddGraphOp(from: String, to: String, silent: Boolean)
    extends UpdateOp
  /** `LOAD [SILENT] <fileUrl> [INTO GRAPH g]` — read an RDF document
    * (N-Triples or Turtle, by extension) into a named graph. */
  final case class LoadOp(source: String, graph: Option[String],
      silent: Boolean) extends UpdateOp

  def parse(text: String, name: String = "parsed"): UpdateOp =
    new P(text, name).parseUpdate()

  /** Parse a full SPARQL 1.1 Update *request* (§3.1: `Update ::=
    * Prologue (Update1 (';' Update)?)?`) — one or more operations
    * separated by `;`, sharing one prologue scope. PREFIX/BASE
    * declarations carry forward across operations and may be
    * re-declared mid-request (later wins, as in rdflib/Stardog); a
    * trailing `;` and a prologue-only request are both legal. */
  def parseRequest(text: String, name: String = "request"): Seq[UpdateOp] =
    new P(text, name).parseUpdateRequest()

  /** Parse a SPARQL SELECT (the read-side entry; see
    * [[graft.GraphEngine.select]]). */
  def parseSelect(text: String, name: String = "select"): SelectQuery =
    new P(text, name).parseSelectTop()

  def parseAsk(text: String, name: String = "ask"): AskQuery =
    new P(text, name).parseAskTop()

  def parseConstruct(text: String, name: String = "construct"): ConstructQuery =
    new P(text, name).parseConstructTop()

  /** `DESCRIBE (<iri> | ?v) [FROM g]* [WHERE { group }]`. */
  def parseDescribe(text: String, name: String = "describe"): DescribeQuery =
    new P(text, name).parseDescribeTop()

  private final class P(input: String, queryName: String) {
    private var pos = 0
    private val prefixes = mutable.Map.empty[String, String]
    /** `BASE <iri>` — relative `<...>` refs resolve against it (RFC
      * 3986). Absent (the historical default), relative refs pass
      * through verbatim, which the engine's own test graphs rely on. */
    private var base: Option[String] = None
    private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:".r
    private var anonCounter = 0

    // ---------------- lexing helpers ----------------
    private def ws(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < input.length && input(pos).isWhitespace) { pos += 1; moved = true }
        if (pos < input.length && input(pos) == '#') {
          while (pos < input.length && input(pos) != '\n') pos += 1
          moved = true
        }
      }
    }

    private def peek: Char = if (pos < input.length) input(pos) else '\u0000'

    private def eat(c: Char): Unit = {
      ws()
      if (peek != c) fail(s"expected '$c'")
      pos += 1
    }

    private def tryEat(c: Char): Boolean = {
      ws(); if (peek == c) { pos += 1; true } else false
    }

    private def keyword(kw: String): Boolean = {
      ws()
      val end = pos + kw.length
      if (end <= input.length &&
          input.substring(pos, end).equalsIgnoreCase(kw) &&
          (end == input.length || !isNameChar(input(end)))) {
        pos = end; true
      } else false
    }

    private def expectKeyword(kw: String): Unit =
      if (!keyword(kw)) fail(s"expected $kw")

    private def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-'

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"SPARQL parse error at ${input.substring(math.max(0, pos - 10),
          math.min(input.length, pos + 25)).replace("\n", "\\n")}: $msg")

    // ---------------- terms ----------------
    private def iriRef(): String = {
      ws()
      if (peek == '<') {
        val end = input.indexOf('>', pos)
        val v = input.substring(pos + 1, end); pos = end + 1
        base match {
          case Some(b) if schemeRe.findFirstIn(v).isEmpty =>
            // RFC 3986 reference resolution, not concatenation: base
            // ".../dir/doc" + "rel" must drop the last segment
            new java.net.URI(b).resolve(v).toString
          case _ => v
        }
      } else prefixedName()
    }

    private def prefixedName(): String = {
      ws()
      val start = pos
      while (pos < input.length && isNameChar(input(pos))) pos += 1
      val pfx = input.substring(start, pos)
      if (peek != ':') fail(s"expected prefixed name, got '$pfx'")
      pos += 1
      // PN_LOCAL: name chars and '.', plus the PLX forms — '%' HEX HEX
      // kept verbatim (a percent-encoded IRI octet) and '\'-escaped
      // punctuation unescaped. The reference's provenance template mints
      // run IRIs through quote_plus, so ':scheduled__...T00%3A00' must
      // round-trip (`load_knowledge_graph.py:523-526`).
      val lbuf = new StringBuilder
      val escaped = new scala.collection.mutable.BitSet
      var more = true
      while (more && pos < input.length) {
        val c = input(pos)
        if (c == '%' && pos + 2 < input.length &&
          isHex(input(pos + 1)) && isHex(input(pos + 2))) {
          escaped ++= Seq(lbuf.length, lbuf.length + 1, lbuf.length + 2)
          lbuf ++= input.substring(pos, pos + 3); pos += 3
        } else if (c == '\\' && pos + 1 < input.length &&
          PnLocalEsc.indexOf(input(pos + 1).toInt) >= 0) {
          escaped += lbuf.length
          lbuf += input(pos + 1); pos += 2
        } else if (isNameChar(c) || c == '.') { lbuf += c; pos += 1 }
        else more = false
      }
      // PN_LOCAL may not end with '.', so give back trailing dots
      // (escaped ones — '\.' or inside %HH — are real content and stay)
      while (lbuf.nonEmpty && lbuf.last == '.' && !escaped(lbuf.length - 1)) {
        lbuf.deleteCharAt(lbuf.length - 1); pos -= 1
      }
      prefixes.getOrElse(pfx,
        fail(s"undeclared prefix '$pfx'")) + lbuf.result()
    }

    private val PnLocalEsc = "_~.-!$&'()*+,;=/?#@%"
    private def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    private def varName(): String = {
      ws()
      if (peek != '?' && peek != '$') fail("expected variable")
      pos += 1
      val start = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
      input.substring(start, pos)
    }

    private def stringLiteral(): String = {
      ws()
      val quote = peek
      if (quote != '"' && quote != '\'') fail("expected string literal")
      pos += 1
      val sb = new StringBuilder
      while (peek != quote) {
        if (pos >= input.length) fail("unterminated string literal")
        if (peek == '\\') {
          pos += 1
          sb.append(input(pos) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
        } else sb.append(peek)
        pos += 1
      }
      pos += 1
      sb.toString
    }

    /** literal with optional ^^datatype / @lang */
    private def literalNode(): L = {
      val s = stringLiteral()
      if (pos + 1 < input.length && peek == '^' && input(pos + 1) == '^') {
        pos += 2
        val dt = iriRef()
        L(s, if (dt == Quad.xsd.string) null else dt)
      } else if (peek == '@') {
        pos += 1
        val start = pos
        while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '-')) pos += 1
        L(s, null, input.substring(start, pos))
      } else L(s)
    }

    private def anonVar(): V = { anonCounter += 1; V(s"_parsed_anon$anonCounter") }

    // ---------------- triple blocks ----------------
    private val rdfTypeIri = dsl.rdfType

    // ---- property paths (SPARQL 1.1 §9, subset: / ^ | + * ?) ----
    // `/ ^ |` desugar at parse time into joins / UNION over fresh
    // anonymous variables; `+ * ?` survive as runtime ClosureE nodes
    // (min/max hop bounds; `* ?` add the zero-length identity).
    private sealed trait Path
    private final case class PIri(iri: String) extends Path
    private final case class PSeq(l: Path, r: Path) extends Path
    private final case class PAlt(l: Path, r: Path) extends Path
    private final case class PInv(p: Path) extends Path
    private final case class PPlus(p: Path) extends Path
    private final case class PStar(p: Path) extends Path
    private final case class PZeroOne(p: Path) extends Path
    /** Negated property set `!(iri|^iri|...)` — `fwd` excludes forward
      * predicates, `inv` excludes predicates on the inverted edge. */
    private final case class PNeg(fwd: Seq[String], inv: Seq[String])
        extends Path

    private def path(): Path = {
      var l = pathSeq()
      while ({ ws(); peek == '|' }) { pos += 1; l = PAlt(l, pathSeq()) }
      l
    }

    private def pathSeq(): Path = {
      var l = pathElt()
      while ({ ws(); peek == '/' }) { pos += 1; l = PSeq(l, pathElt()) }
      l
    }

    private def pathElt(): Path = {
      ws()
      if (peek == '^') { pos += 1; return PInv(pathElt()) }
      val base: Path = peek match {
        case '(' => pos += 1; val p = path(); eat(')'); p
        case 'a' if pos + 1 >= input.length || !isNameChar(input(pos + 1)) =>
          pos += 1; PIri(rdfTypeIri)
        case '!' => pos += 1; negatedPropertySet()
        case '*' | '+' => fail("path modifier needs a preceding element")
        case _ => PIri(iriRef())
      }
      // postfix modifiers bind ADJACENTLY (no whitespace) — a detached
      // '?' followed by a name char is the next variable, not a modifier
      peek match {
        case '+' => pos += 1; PPlus(base)
        case '*' => pos += 1; PStar(base)
        case '?' if pos + 1 >= input.length || !isNameChar(input(pos + 1)) =>
          pos += 1; PZeroOne(base)
        case _ => base
      }
    }

    /** `!` PathNegatedPropertySet (§9.1): a single member or a
      * `(a|^b|...)` list; each member an IRI, `a`, or its `^` inverse. */
    private def negatedPropertySet(): Path = {
      def member(): (String, Boolean) = {
        ws()
        val inverted = peek == '^'
        if (inverted) { pos += 1; ws() }
        val iri =
          if (peek == 'a' && (pos + 1 >= input.length || !isNameChar(input(pos + 1)))) {
            pos += 1; rdfTypeIri
          } else iriRef()
        (iri, inverted)
      }
      val members = mutable.Buffer.empty[(String, Boolean)]
      ws()
      if (peek == '(') {
        pos += 1; ws()
        if (peek != ')') {
          members += member()
          while ({ ws(); peek == '|' }) { pos += 1; members += member() }
        }
        eat(')')
      } else members += member()
      PNeg(members.collect { case (i, false) => i }.toSeq,
        members.collect { case (i, true) => i }.toSeq)
    }

    private def desugarPath(s: Node, p: Path, o: Node,
        out: mutable.Buffer[Element]): Unit = p match {
      case PIri(i) => out += Pat(TriplePattern(s, I(i), o))
      case PSeq(l, r) =>
        val v = anonVar()
        desugarPath(s, l, v, out); desugarPath(v, r, o, out)
      case PInv(inner) => desugarPath(o, inner, s, out)
      case PAlt(l, r) =>
        val lb = mutable.Buffer.empty[Element]
        val rb = mutable.Buffer.empty[Element]
        desugarPath(s, l, o, lb)
        desugarPath(s, r, o, rb)
        out += UnionE(Seq(Group(lb.toSeq), Group(rb.toSeq)))
      case PPlus(inner) => out += closureOf(s, inner, o, 1, Int.MaxValue)
      case PStar(inner) => out += closureOf(s, inner, o, 0, Int.MaxValue)
      case PZeroOne(inner) => out += closureOf(s, inner, o, 0, 1)
      case PNeg(fwd, inv) =>
        // a variable-predicate pattern plus a NOT IN filter on the anon
        // predicate var — the filter is a plain scan predicate Catalyst
        // pushes to the quad read; nothing iterative about negation.
        // Both-direction sets (§9.1) union the forward and inverted edge.
        def branch(su: Node, ob: Node, excl: Seq[String]): Seq[Element] = {
          val pv = anonVar()
          val pat = Pat(TriplePattern(su, pv, ob))
          if (excl.isEmpty) Seq(pat)
          else Seq(pat, FilterE(InE(VarRef(pv.name),
            excl.map(i => UriE(StrLit(i))), negated = true)))
        }
        (fwd.nonEmpty, inv.nonEmpty) match {
          case (_, false) => out ++= branch(s, o, fwd)
          case (false, true) => out ++= branch(o, s, inv)
          case _ => out += UnionE(Seq(
            Group(branch(s, o, fwd)), Group(branch(o, s, inv))))
        }
    }

    private def closureOf(s: Node, inner: Path, o: Node,
        minHops: Int, maxHops: Int): ClosureE = {
      val (v1, v2) = (anonVar(), anonVar())
      val eb = mutable.Buffer.empty[Element]
      desugarPath(v1, inner, v2, eb)
      ClosureE(s, Group(eb.toSeq), v1.name, v2.name, o, minHops, maxHops)
    }

    /** Parses TriplesSameSubject (with ; , [...] and — in WHERE groups —
      * property paths), appending elements to `out`. */
    private def triplesSameSubject(out: mutable.Buffer[Element],
        allowPaths: Boolean): Unit = {
      val subj: Node = { ws(); peek match {
        case '?' | '$' => V(varName())
        case '[' => // blank-node subject: [ props ] props?
          val bn = anonVar()
          eat('[')
          propertyList(bn, out, allowPaths)
          eat(']')
          ws()
          if (peek != '.' && peek != '}') propertyList(bn, out, allowPaths)
          return
        case _ => I(iriRef())
      }}
      propertyList(subj, out, allowPaths)
    }

    private def propertyList(subj: Node, out: mutable.Buffer[Element],
        allowPaths: Boolean): Unit = {
      var more = true
      while (more) {
        ws()
        val verb: Either[Node, Path] =
          if (peek == '?' || peek == '$') Left(V(varName()))
          else if (!allowPaths) {
            if (peek == 'a' &&
                (pos + 1 >= input.length || !isNameChar(input(pos + 1)))) {
              pos += 1; Left(I(rdfTypeIri)) // 'a' keyword = rdf:type
            } else Left(I(iriRef()))
          } else path() match {
            case PIri(i) => Left(I(i)) // plain predicate — common fast path
            case p => Right(p)
          }
        // object list
        var moreObjects = true
        while (moreObjects) {
          ws()
          val obj: Node = peek match {
            case '?' | '$' => V(varName())
            case '"' | '\'' => literalNode()
            case '[' =>
              val bn = anonVar()
              verb match {
                case Left(v) => out += Pat(TriplePattern(subj, v, bn))
                case Right(p) => desugarPath(subj, p, bn, out)
              }
              eat('[')
              propertyList(bn, out, allowPaths)
              eat(']')
              bn
            case _ => I(iriRef())
          }
          // the '[' branch already emitted its link triple
          if (!wasBnode(obj)) verb match {
            case Left(v) => out += Pat(TriplePattern(subj, v, obj))
            case Right(p) => desugarPath(subj, p, obj, out)
          }
          moreObjects = tryEat(',')
        }
        more = tryEat(';')
        ws()
        // trailing ';' before '.' or '}' is legal
        if (more && (peek == '.' || peek == '}' || peek == ']')) more = false
      }
    }

    private def wasBnode(n: Node): Boolean = n match {
      case V(name) if name.startsWith("_parsed_anon") => true
      case _ => false
    }

    // ---------------- groups ----------------
    private def group(): Group = {
      val elems = mutable.Buffer.empty[Element]
      eat('{')
      var done = false
      while (!done) {
        ws()
        if (peek == '}') { pos += 1; done = true }
        else if (keyword("OPTIONAL")) {
          elems += Opt(group())
          tryEat('.')
        } else if (keyword("BIND")) {
          eat('(')
          val e = expr()
          expectKeyword("AS")
          val v = varName()
          eat(')')
          elems += Bind(e, v)
          tryEat('.')
        } else if (keyword("FILTER")) {
          // FILTER Constraint — brackettedExpression or builtInCall; both
          // are primary() productions now, so one expr() call covers them
          elems += FilterE(expr())
          tryEat('.')
        } else if (keyword("MINUS")) {
          elems += MinusE(group())
          tryEat('.')
        } else if (keyword("GRAPH")) {
          ws()
          val gn: Node =
            if (peek == '?' || peek == '$') V(varName()) else I(iriRef())
          elems += GraphE(gn, group())
          tryEat('.')
        } else if (keyword("SERVICE")) {
          val silent = keyword("SILENT")
          ws()
          if (peek == '?' || peek == '$')
            throw new IllegalArgumentException(
              "variable SERVICE endpoints are unsupported (register a " +
                "dataset per IRI via graft.sparql.Services)")
          elems += ServiceE(iriRef(), group(), silent)
          tryEat('.')
        } else if (keyword("VALUES")) {
          elems += valuesBlock()
          tryEat('.')
        } else if (peek == '{') {
          val save = pos
          pos += 1
          val isSubSelect = { val p2 = pos; val r = keyword("SELECT"); pos = p2; r }
          if (isSubSelect) {
            // SubSelect: { SELECT ... } — prefixes inherit from the top
            elems += SubSelectE(selectBody())
            eat('}')
            tryEat('.')
          } else {
            pos = save
            // GroupOrUnionGraphPattern: {g} ('UNION' {g})*
            val branches = mutable.Buffer(group())
            while (keyword("UNION")) branches += group()
            elems += UnionE(branches.toSeq)
            tryEat('.')
          }
        } else {
          triplesSameSubject(elems, allowPaths = true)
          tryEat('.')
        }
      }
      Group(elems.toSeq)
    }

    // ------- expressions (SPARQL 1.1 §17 grammar, precedence-climbing) --

    /** Expression := ConditionalOrExpression */
    private def expr(): Expr = {
      var e = andExpr()
      while ({ ws(); peek == '|' && pos + 1 < input.length && input(pos + 1) == '|' }) {
        pos += 2; e = OrE(e, andExpr())
      }
      e
    }

    private def andExpr(): Expr = {
      var e = relExpr()
      while ({ ws(); peek == '&' && pos + 1 < input.length && input(pos + 1) == '&' }) {
        pos += 2; e = AndE(e, relExpr())
      }
      e
    }

    /** RelationalExpression: at most one comparison / IN / NOT IN. */
    private def relExpr(): Expr = {
      val l = addExpr()
      ws()
      val save = pos
      if (keyword("NOT")) {
        if (keyword("IN")) return InE(l, argList(), negated = true)
        pos = save // NOT here belongs to something else (shouldn't happen)
      } else if (keyword("IN")) return InE(l, argList(), negated = false)
      val op = peek match {
        case '=' => pos += 1; "="
        case '!' if pos + 1 < input.length && input(pos + 1) == '=' => pos += 2; "!="
        case '<' => pos += 1; if (peek == '=') { pos += 1; "<=" } else "<"
        case '>' => pos += 1; if (peek == '=') { pos += 1; ">=" } else ">"
        case _ => null
      }
      if (op == null) l else CmpE(op, l, addExpr())
    }

    private def addExpr(): Expr = {
      var e = mulExpr()
      var more = true
      while (more) {
        ws()
        if (peek == '+') { pos += 1; e = ArithE("+", e, mulExpr()) }
        else if (peek == '-') { pos += 1; e = ArithE("-", e, mulExpr()) }
        else more = false
      }
      e
    }

    private def mulExpr(): Expr = {
      var e = unaryExpr()
      var more = true
      while (more) {
        ws()
        if (peek == '*') { pos += 1; e = ArithE("*", e, unaryExpr()) }
        else if (peek == '/') { pos += 1; e = ArithE("/", e, unaryExpr()) }
        else more = false
      }
      e
    }

    private def unaryExpr(): Expr = {
      ws()
      if (peek == '!' && !(pos + 1 < input.length && input(pos + 1) == '=')) {
        pos += 1; NotE(unaryExpr())
      } else if (peek == '-' && pos + 1 < input.length && input(pos + 1).isDigit) {
        pos += 1; NumLit("-" + numericLexical()) // negative numeric literal
      } else if (peek == '-') {
        pos += 1; ArithE("-", NumLit("0"), unaryExpr())
      } else if (peek == '+' && !(pos + 1 < input.length && input(pos + 1).isWhitespace)) {
        pos += 1; unaryExpr()
      } else primary()
    }

    private def numericLexical(): String = {
      val start = pos
      while (pos < input.length && input(pos).isDigit) pos += 1
      if (peek == '.' && pos + 1 < input.length && input(pos + 1).isDigit) {
        pos += 1
        while (pos < input.length && input(pos).isDigit) pos += 1
      }
      if ((peek == 'e' || peek == 'E') && pos + 1 < input.length &&
          (input(pos + 1).isDigit || input(pos + 1) == '-' || input(pos + 1) == '+')) {
        pos += 2
        while (pos < input.length && input(pos).isDigit) pos += 1
      }
      input.substring(start, pos)
    }

    /** PrimaryExpression: brackets, var, literal, IRI constant, builtin. */
    private def primary(): Expr = {
      ws()
      peek match {
        case '(' => pos += 1; val e = expr(); eat(')'); e
        case '?' | '$' => VarRef(varName())
        case '<' => UriE(StrLit(iriRef())) // IRI constant in expr position
        case c if c.isDigit => NumLit(numericLexical())
        case '"' | '\'' =>
          literalNode() match {
            case L(v, null, null) => StrLit(v)
            case L(v, dt, null) => TypedLit(v, dt)
            case L(v, _, lang) => StrLit(v) // lang-tagged literal arg (unused)
          }
        case _ =>
          val start = pos
          while (pos < input.length &&
            (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
          if (peek == ':') { // prefixed-name IRI constant (e.g. xsd:integer)
            pos = start
            return UriE(StrLit(prefixedName()))
          }
          val fn = input.substring(start, pos).toUpperCase
          fn match {
            case "TRUE" => BoolLit(true)
            case "FALSE" => BoolLit(false)
            case "REGEX" => argList() match {
              case Seq(a, StrLit(p)) => RegexE(a, p, "")
              case Seq(a, StrLit(p), StrLit(f)) => RegexE(a, p, f)
              case _ => fail("REGEX(expr, 'pat'[, 'flags']) expected")
            }
            case "CONTAINS" => argList() match { case Seq(a, b) => ContainsE(a, b) }
            case "STRENDS" => argList() match { case Seq(a, b) => StrEndsE(a, b) }
            case "STR" => argList() match { case Seq(a) => StrE(a) }
            case "LANG" => argList() match { case Seq(a) => LangE(a) }
            case "LANGMATCHES" =>
              argList() match { case Seq(t, r) => LangMatchesE(t, r) }
            case "SAMETERM" =>
              argList() match { case Seq(a, b) => SameTermE(a, b) }
            case "STRDT" =>
              argList() match { case Seq(a, dt) => StrDtE(a, dt) }
            case "DATATYPE" => argList() match { case Seq(a) => DatatypeE(a) }
            case "STRLEN" => argList() match { case Seq(a) => StrLenE(a) }
            case "ISIRI" | "ISURI" => argList() match { case Seq(a) => IsIriE(a) }
            case "ISLITERAL" => argList() match { case Seq(a) => IsLiteralE(a) }
            case "ISBLANK" => argList() match { case Seq(a) => IsBlankE(a) }
            case "CONCAT" => ConcatE(argList())
            case "URI" | "IRI" => argList() match { case Seq(a) => UriE(a) }
            case "MD5" => argList() match { case Seq(a) => Md5E(a) }
            case "LCASE" => argList() match { case Seq(a) => LcaseE(a) }
            case "UCASE" => argList() match { case Seq(a) => UcaseE(a) }
            case "SUBSTR" => argList() match {
              case Seq(a, st) => SubstrE(a, st, None)
              case Seq(a, st, l) => SubstrE(a, st, Some(l))
              case _ => fail("SUBSTR(expr, start[, len]) expected")
            }
            case "STRBEFORE" => argList() match {
              case Seq(a, StrLit(sep)) => StrBeforeE(a, sep)
              case _ => fail("STRBEFORE(expr, 'sep') expected")
            }
            case "COALESCE" => CoalesceE(argList())
            case "ABS" | "ROUND" | "CEIL" | "FLOOR" =>
              argList() match { case Seq(a) => NumFnE(fn, a) }
            case "SHA1" | "SHA256" | "SHA384" | "SHA512" =>
              argList() match { case Seq(a) => HashE(fn, a) }
            case "YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" |
                 "SECONDS" | "TZ" | "TIMEZONE" =>
              argList() match { case Seq(a) => DtFnE(fn, a) }
            case "NOW" => emptyArgs(); NowE
            case "UUID" => emptyArgs(); UuidE(asIri = true)
            case "STRUUID" => emptyArgs(); UuidE(asIri = false)
            case "RAND" => emptyArgs(); RandE
            case "BNODE" =>
              eat('('); ws()
              if (peek == ')') { pos += 1; BNodeE(None) }
              else { val a = expr(); eat(')'); BNodeE(Some(a)) }
            case "ISNUMERIC" => argList() match { case Seq(a) => IsNumericE(a) }
            case agg if AggFns(agg) =>
              // aggregate in expression position (HAVING §11.5)
              eat('(')
              val distinct = keyword("DISTINCT")
              ws()
              val arg = if (peek == '*') { pos += 1; None } else Some(expr())
              eat(')')
              AggE(agg, arg, distinct)
            case "EXISTS" => ExistsE(group(), negated = false)
            case "NOT" =>
              expectKeyword("EXISTS"); ExistsE(group(), negated = true)
            case "REPLACE" => argList() match {
              case Seq(a, StrLit(p), StrLit(r)) => ReplaceE(a, p, r)
              case _ => fail("REPLACE(expr, 'pat', 'rep') expected")
            }
            case "STRAFTER" => argList() match {
              case Seq(a, StrLit(sep)) => StrAfterE(a, sep)
              case _ => fail("STRAFTER(expr, 'sep') expected")
            }
            case "ENCODE_FOR_URI" => argList() match { case Seq(a) => EncodeForUriE(a) }
            case "STRLANG" => argList() match {
              case Seq(a, StrLit(lang)) => StrLangE(a, lang)
              case _ => fail("STRLANG(expr, 'lang') expected")
            }
            case "IF" => argList() match { case Seq(c, t, f) => IfE(c, t, f) }
            case "BOUND" => { eat('('); val v = varName(); eat(')'); BoundE(v) }
            case "STRSTARTS" => argList() match { case Seq(a, b) => StrStartsE(a, b) }
            case other => fail(s"unsupported function $other")
          }
      }
    }

    private def argList(): Seq[Expr] = {
      eat('(')
      val args = mutable.Buffer(expr())
      while (tryEat(',')) args += expr()
      eat(')')
      args.toSeq
    }

    /** Nilary builtin call: `(` `)` with optional whitespace. */
    private def emptyArgs(): Unit = { eat('('); ws(); eat(')') }

    // ---------------- update forms ----------------
    private def parsePrefixes(): Unit = {
      var more = true
      while (more) {
        if (keyword("BASE")) {
          ws()
          if (peek != '<') fail("expected <iri> in BASE")
          val end = input.indexOf('>', pos)
          base = Some(input.substring(pos + 1, end))
          pos = end + 1
        } else if (keyword("PREFIX")) {
          ws()
          val start = pos
          while (pos < input.length && isNameChar(input(pos))) pos += 1
          val pfx = input.substring(start, pos)
          eat(':')
          ws()
          if (peek != '<') fail("expected <iri> in PREFIX")
          val end = input.indexOf('>', pos)
          // a PREFIX expansion may itself be relative to BASE
          prefixes(pfx) = base match {
            case Some(b) if schemeRe.findFirstIn(
              input.substring(pos + 1, end)).isEmpty =>
              new java.net.URI(b).resolve(input.substring(pos + 1, end)).toString
            case _ => input.substring(pos + 1, end)
          }
          pos = end + 1
        } else more = false
      }
      ws()
    }

    def parseUpdate(): UpdateOp = {
      parsePrefixes()
      if (keyword("CLEAR")) {
        val silent = keyword("SILENT")
        if (keyword("ALL")) ClearScopeOp("ALL", silent)
        else if (keyword("NAMED")) ClearScopeOp("NAMED", silent)
        else if (keyword("DEFAULT")) ClearScopeOp("DEFAULT", silent)
        else { expectKeyword("GRAPH"); ClearGraphOp(iriRef(), silent) }
      } else if (keyword("DROP")) {
        val silent = keyword("SILENT")
        if (keyword("ALL")) ClearScopeOp("ALL", silent)
        else if (keyword("NAMED")) ClearScopeOp("NAMED", silent)
        else if (keyword("DEFAULT")) ClearScopeOp("DEFAULT", silent)
        else { expectKeyword("GRAPH"); DropGraphOp(iriRef(), silent) }
      } else if (keyword("COPY")) {
        graphToGraph(CopyGraphOp)
      } else if (keyword("MOVE")) {
        graphToGraph(MoveGraphOp)
      } else if (keyword("ADD")) {
        graphToGraph(AddGraphOp)
      } else if (keyword("LOAD")) {
        val silent = keyword("SILENT")
        val source = iriRef()
        val graph =
          if (keyword("INTO")) Some(graphOrDefault()) else None
        LoadOp(source, graph, silent)
      } else {
        val withGraph = if (keyword("WITH")) Some(iriRef()) else None
        if (keyword("INSERT")) {
          if (keyword("DATA")) InsertData(parseQuadData(withGraph))
          else {
            val qt = quadTemplateBlock(withGraph)
            val (using, usingNamed) = usingClauses()
            expectKeyword("WHERE")
            val where = group()
            constGraphOf(qt) match {
              case Some((target, tpl)) => InsertWhere(
                MappingQuery(queryName, target, using, where, tpl, usingNamed))
              case None =>
                QuadModifyWhere(Seq.empty, qt, using, where, usingNamed)
            }
          }
        } else if (keyword("DELETE")) {
          if (keyword("DATA")) DeleteData(parseQuadData(withGraph))
          else if (keyword("WHERE")) {
            // §3.1.3.3 shorthand: one quad pattern is both template and
            // WHERE; without WITH/GRAPH it ranges over the default
            // graph. A variable graph term turns each quad into a
            // GRAPH-scoped pattern so ?g binds from the store.
            val qt = quadTemplateBlock(
              withGraph.orElse(Some(graft.model.Quad.DefaultGraph)))
            constGraphOf(qt) match {
              case Some((delGraph, delT)) =>
                DeleteWhere(MappingQuery(queryName, delGraph, Seq(delGraph),
                  Group(delT.map(Pat(_))), delT))
              case None =>
                val elems: Seq[Element] = qt.map { case (g, tp) =>
                  GraphE(g, Group(Seq(Pat(tp)))) }
                QuadModifyWhere(qt, Seq.empty, Seq.empty, Group(elems),
                  Seq.empty)
            }
          } else {
            val delQt = quadTemplateBlock(withGraph)
            if (keyword("INSERT")) {
              val insQt = quadTemplateBlock(withGraph)
              val (using, usingNamed) = usingClauses()
              expectKeyword("WHERE")
              val where = group()
              (constGraphOf(delQt), constGraphOf(insQt)) match {
                case (Some((dg, dt)), Some((ig, it))) =>
                  ModifyWhere(dg, ig, using, where, dt, it, usingNamed)
                case _ =>
                  QuadModifyWhere(delQt, insQt, using, where, usingNamed)
              }
            } else {
              val (using, usingNamed) = usingClauses()
              expectKeyword("WHERE")
              val where = group()
              constGraphOf(delQt) match {
                case Some((dg, dt)) => DeleteWhere(
                  MappingQuery(queryName, dg, using, where, dt, usingNamed))
                case None =>
                  QuadModifyWhere(delQt, Seq.empty, using, where, usingNamed)
              }
            }
          }
        } else fail("expected INSERT or DELETE")
      }
    }

    /** The request grammar, iteratively: parse prologue, stop at EOF
      * (covers the prologue-only and trailing-`;` cases), else one
      * operation, then demand `;` or EOF. The inner `parsePrefixes()`
      * in [[parseUpdate]] is an idempotent no-op here, and the shared
      * `prefixes`/`base` state is exactly the spec's request-wide
      * prologue scope. */
    def parseUpdateRequest(): Seq[UpdateOp] = {
      val ops = mutable.Buffer.empty[UpdateOp]
      var more = true
      while (more) {
        parsePrefixes()
        ws()
        if (pos >= input.length) more = false
        else {
          ops += parseUpdate()
          ws()
          if (pos >= input.length) more = false
          else if (!tryEat(';'))
            fail("expected ';' between update operations or end of request")
        }
      }
      ops.toSeq
    }

    /** `[SILENT] (DEFAULT | [GRAPH] g1) TO (DEFAULT | [GRAPH] g2)`
      * (shared by COPY/MOVE/ADD). `DEFAULT` names the unnamed default
      * graph, stored under [[graft.model.Quad.DefaultGraph]]. */
    private def graphToGraph(
        mk: (String, String, Boolean) => UpdateOp): UpdateOp = {
      val silent = keyword("SILENT")
      val from = graphOrDefault()
      expectKeyword("TO")
      mk(from, graphOrDefault(), silent)
    }

    /** `DEFAULT | [GRAPH] <iri>` → the graph's storage name. */
    private def graphOrDefault(): String =
      if (keyword("DEFAULT")) graft.model.Quad.DefaultGraph
      else { keyword("GRAPH"); iriRef() }

    /** QuadPattern template block (§3.1.3): bare triple runs (→ WITH's
      * graph, or the default graph) interleaved with any number of
      * `GRAPH (<iri> | ?var) { triples }` blocks. */
    private def quadTemplateBlock(
        withGraph: Option[String]): Seq[(Node, TriplePattern)] = {
      eat('{')
      val out = mutable.Buffer.empty[(Node, TriplePattern)]
      var more = true
      while (more) {
        ws()
        if (peek == '}') more = false
        else if (keyword("GRAPH")) {
          val g: Node = {
            ws()
            if (peek == '?' || peek == '$') V(varName()) else I(iriRef())
          }
          eat('{')
          val block = mutable.Buffer.empty[TriplePattern]
          templateTriples(block)
          eat('}')
          ws(); tryEat('.')
          out ++= block.map(g -> _)
        } else {
          // one subject-group per pass, so a following GRAPH block is
          // seen by the outer loop rather than read as a subject
          val g = I(withGraph.getOrElse(graft.model.Quad.DefaultGraph))
          val buf = mutable.Buffer.empty[Element]
          triplesSameSubject(buf, allowPaths = false)
          tryEat('.')
          out ++= buf.map {
            case Pat(tp) => g -> tp
            case other => fail(s"template may only contain triples, got $other")
          }
        }
      }
      eat('}')
      out.toSeq
    }

    /** Every template quad in ONE constant graph → the legacy
      * (targetGraph, triples) form, which keeps the store's
      * partition-scoped write path. */
    private def constGraphOf(
        t: Seq[(Node, TriplePattern)]): Option[(String, Seq[TriplePattern])] =
      t.map(_._1).distinct match {
        case Seq(I(g)) => Some(g -> t.map(_._2))
        case _ => None
      }

    // ---------------- query (read) forms ----------------
    private val AggFns = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
      "GROUP_CONCAT")

    /** `(FN([DISTINCT] expr | * [; SEPARATOR="s"]) AS ?alias)` */
    /** `(FN(...) AS ?v)` (aggregate) or `(expr AS ?v)` (17.4 projection
      * expression) — disambiguated by whether the leading identifier is
      * an aggregate function name. */
    private def parenProjection(): ProjItem = {
      val save = pos
      eat('(')
      ws()
      val start = pos
      while (pos < input.length &&
        (input(pos).isLetter || input(pos) == '_')) pos += 1
      val fn = input.substring(start, pos).toUpperCase
      pos = save
      if (AggFns(fn)) aggItem()
      else {
        eat('(')
        val e = expr()
        expectKeyword("AS")
        val as = varName()
        eat(')')
        PExpr(e, as)
      }
    }

    private def aggItem(): PAgg = {
      eat('(')
      ws()
      val start = pos
      while (pos < input.length &&
        (input(pos).isLetter || input(pos) == '_')) pos += 1
      val fn = input.substring(start, pos).toUpperCase
      if (!AggFns(fn)) fail(s"expected aggregate function, got $fn")
      eat('(')
      val distinct = keyword("DISTINCT")
      ws()
      val arg = if (peek == '*') { pos += 1; None } else Some(expr())
      ws()
      val sep = if (peek == ';') {
        pos += 1
        expectKeyword("SEPARATOR")
        ws(); eat('='); ws()
        Some(stringLiteral())
      } else None
      if (sep.isDefined && fn != "GROUP_CONCAT")
        fail(s"SEPARATOR is only valid on GROUP_CONCAT, got $fn")
      eat(')')
      expectKeyword("AS")
      val as = varName()
      eat(')')
      if (fn != "COUNT" && arg.isEmpty) fail(s"$fn(*) is not valid SPARQL")
      PAgg(fn, arg, distinct, as, sep)
    }

    private def intAfter(kw: String): Option[Int] =
      if (keyword(kw)) {
        ws()
        val start = pos
        while (pos < input.length && input(pos).isDigit) pos += 1
        if (pos == start) fail(s"$kw needs an integer")
        Some(input.substring(start, pos).toInt)
      } else None

    def parseSelectTop(): SelectQuery = {
      parsePrefixes()
      selectBody()
    }

    /** SELECT body (no prefix decls) — shared by the top-level form and
      * `{ SELECT ... }` subqueries. */
    private def selectBody(): SelectQuery = {
      expectKeyword("SELECT")
      // REDUCED permits (without requiring) duplicate elimination; the
      // engine eliminates — deterministic output, conformant cardinality
      val distinct = keyword("DISTINCT") || keyword("REDUCED")
      val proj = mutable.Buffer.empty[ProjItem]
      ws()
      if (peek == '*') pos += 1
      else {
        var more = true
        while (more) {
          ws()
          if (peek == '?' || peek == '$') proj += PVar(varName())
          else if (peek == '(') proj += parenProjection()
          else more = false
        }
        if (proj.isEmpty) fail("SELECT needs ?vars, (AGG(...) AS ?v), or *")
      }
      val (from, fromNamed) = datasetClauses()
      expectKeyword("WHERE")
      val where = group()
      val groupVars = mutable.Buffer.empty[String]
      if (keyword("GROUP")) {
        expectKeyword("BY")
        while ({ ws(); peek == '?' || peek == '$' }) groupVars += varName()
        if (groupVars.isEmpty) fail("GROUP BY needs ?vars")
      }
      val having =
        if (keyword("HAVING")) { eat('('); val e = expr(); eat(')'); Some(e) }
        else None
      val order = mutable.Buffer.empty[OrderKey]
      if (keyword("ORDER")) {
        expectKeyword("BY")
        var more = true
        while (more) {
          ws()
          if (keyword("ASC")) { eat('('); order += OrderKey(varName(), asc = true); eat(')') }
          else if (keyword("DESC")) { eat('('); order += OrderKey(varName(), asc = false); eat(')') }
          else if (peek == '?' || peek == '$') order += OrderKey(varName(), asc = true)
          else more = false
        }
        if (order.isEmpty) fail("ORDER BY needs keys")
      }
      // LimitOffsetClauses: either order, each at most once
      var limit = intAfter("LIMIT")
      val offset = intAfter("OFFSET")
      if (limit.isEmpty) limit = intAfter("LIMIT")
      // trailing ValuesClause (18.2.4.3): joined with the solutions
      val tv = if (keyword("VALUES")) Some(valuesBlock()) else None
      SelectQuery(queryName, proj.toSeq, distinct, from, where,
        groupVars.toSeq, having, order.toSeq, limit, offset, fromNamed, tv)
    }

    /** A VALUES data block (after the keyword): inline in a group, or
      * the trailing ValuesClause of a SELECT (§18.2.4.3). */
    private def valuesBlock(): ValuesE = {
      def term(): Option[Node] = {
        ws()
        if (keyword("UNDEF")) None
        else Some(peek match {
          case '<' => I(iriRef())
          case '"' | '\'' => literalNode()
          case c if c.isLetter || c == '_' => I(iriRef()) // prefixed name
          case _ => fail("VALUES terms must be IRIs, literals, or UNDEF")
        })
      }
      ws()
      if (peek == '(') {
        // multi-var form: VALUES (?a ?b) { (t1 t2) (UNDEF t3) ... }
        pos += 1
        val vars = mutable.Buffer.empty[String]
        ws()
        while (peek == '?' || peek == '$') { vars += varName(); ws() }
        eat(')')
        if (vars.isEmpty) fail("VALUES needs at least one variable")
        eat('{')
        val rows = mutable.Buffer.empty[Seq[Option[Node]]]
        ws()
        while (peek == '(') {
          pos += 1
          val row = mutable.Buffer.empty[Option[Node]]
          ws()
          while (peek != ')') { row += term(); ws() }
          eat(')')
          if (row.size != vars.size) fail(
            s"VALUES row has ${row.size} terms for ${vars.size} vars")
          rows += row.toSeq
          ws()
        }
        eat('}')
        ValuesE(vars.toSeq, rows.toSeq)
      } else {
        val v = varName()
        eat('{')
        val rows = mutable.Buffer.empty[Seq[Option[Node]]]
        ws()
        while (peek != '}') { rows += Seq(term()); ws() }
        eat('}')
        ValuesE(Seq(v), rows.toSeq)
      }
    }

    /** `(FROM [NAMED] <iri>)*` — default-graph and named-graph lists. */
    private def datasetClauses(): (Seq[String], Seq[String]) = {
      val from = mutable.Buffer.empty[String]
      val named = mutable.Buffer.empty[String]
      while (keyword("FROM")) {
        if (keyword("NAMED")) named += iriRef() else from += iriRef()
      }
      (from.toSeq, named.toSeq)
    }

    def parseAskTop(): AskQuery = {
      parsePrefixes()
      expectKeyword("ASK")
      val (from, fromNamed) = datasetClauses()
      keyword("WHERE") // optional before the group
      AskQuery(queryName, from, group(), fromNamed)
    }

    def parseDescribeTop(): DescribeQuery = {
      parsePrefixes()
      expectKeyword("DESCRIBE")
      ws()
      val target: Node =
        if (peek == '?' || peek == '$') V(varName()) else I(iriRef())
      val (from, fromNamed) = datasetClauses()
      val where = if (keyword("WHERE")) Some(group()) else None
      target match {
        case V(_) if where.isEmpty =>
          fail("DESCRIBE ?var needs a WHERE group binding it")
        case _ =>
      }
      DescribeQuery(target, from, where, fromNamed)
    }

    def parseConstructTop(): ConstructQuery = {
      parsePrefixes()
      expectKeyword("CONSTRUCT")
      ws()
      if (peek == '{') {
        eat('{')
        val template = mutable.Buffer.empty[TriplePattern]
        templateTriples(template)
        eat('}')
        val (from, fromNamed) = datasetClauses()
        expectKeyword("WHERE")
        ConstructQuery(queryName, template.toSeq, from, group(), fromNamed)
      } else {
        // `CONSTRUCT WHERE { triples }` shorthand (§10.2.2): the pattern
        // group doubles as the template — plain triples only, no paths/
        // FILTER/OPTIONAL (those desugar to non-Pat elements and fail).
        val (from, fromNamed) = datasetClauses()
        expectKeyword("WHERE")
        val g = group()
        val template = g.elems.map {
          case Pat(tp) => tp
          case other => fail(
            s"CONSTRUCT WHERE shorthand allows only triple patterns, got $other")
        }
        ConstructQuery(queryName, template, from, g, fromNamed)
      }
    }

    /** `(USING [NAMED] <iri>)*` — the update-side dataset clauses
      * (3.1.3): USING feeds patterns outside GRAPH, USING NAMED the
      * GRAPH patterns. */
    private def usingClauses(): (Seq[String], Seq[String]) = {
      val using = mutable.Buffer.empty[String]
      val named = mutable.Buffer.empty[String]
      while (keyword("USING")) {
        if (keyword("NAMED")) named += iriRef() else using += iriRef()
      }
      (using.toSeq, named.toSeq)
    }

    private def templateTriples(out: mutable.Buffer[TriplePattern]): Unit = {
      var more = true
      while (more) {
        ws()
        if (peek == '}') more = false
        else {
          val buf = mutable.Buffer.empty[Element]
          triplesSameSubject(buf, allowPaths = false) // no paths in templates
          out ++= buf.map {
            case Pat(tp) => tp
            case other => fail(s"template may only contain triples, got $other")
          }
          tryEat('.')
          ws()
          if (peek == '}') more = false
        }
      }
    }

    private def parseQuadData(withGraph: Option[String]): Seq[Quad] = {
      eat('{')
      // QuadData allows any number of `GRAPH g {...}` blocks interleaved
      // with bare triples (which go to WITH's graph, or the default)
      val quads = mutable.Buffer.empty[(String, TriplePattern)]
      var more = true
      while (more) {
        ws()
        if (peek == '}') more = false
        else if (keyword("GRAPH")) {
          val g = iriRef()
          eat('{')
          val block = mutable.Buffer.empty[TriplePattern]
          templateTriples(block)
          eat('}')
          ws(); tryEat('.')
          quads ++= block.map(g -> _)
        } else {
          // one subject-group per pass, so a following GRAPH block is
          // seen by the outer loop rather than read as a subject
          val g = withGraph.getOrElse(graft.model.Quad.DefaultGraph)
          val buf = mutable.Buffer.empty[Element]
          triplesSameSubject(buf, allowPaths = false)
          tryEat('.')
          quads ++= buf.map {
            case Pat(tp) => g -> tp
            case other => fail(s"quad data may only contain triples, got $other")
          }
        }
      }
      eat('}')
      quads.toSeq.map { case (g, tp) =>
        val s = tp.s match {
          case I(iri) => iri
          case _ => fail("INSERT DATA requires ground subjects")
        }
        val p = tp.p match {
          case I(iri) => iri
          case _ => fail("INSERT DATA requires ground predicates")
        }
        tp.o match {
          case I(iri) => Quad.iri(g, s, p, iri)
          case L(v, dt, null) if dt != null => Quad.typed(g, s, p, v, dt)
          case L(v, null, lang) if lang != null =>
            Quad(g, s, p, v, null, lang, Quad.KindLiteral)
          case L(v, _, _) => Quad.lit(g, s, p, v)
          case V(_) => fail("INSERT DATA requires ground objects")
        }
      }
    }
  }
}
