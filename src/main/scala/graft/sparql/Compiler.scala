package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Quad
import Algebra._

/** Compiles the SPARQL algebra to DataFrame operations (SURVEY.md §2.3
  * Q1–Q15 mappings).
  *
  * Every SPARQL variable becomes one struct column `(v, k, dt, lg)` —
  * lexical value, term kind, datatype IRI, language tag — so term
  * identity (IRI vs literal vs bnode, datatype, lang) survives joins and
  * expressions (SURVEY.md §7.4.5). Struct equality in Spark compares
  * field-by-field with nested nulls equal, which is exactly SPARQL term
  * equality for join compatibility.
  *
  * Physical mapping:
  *  - triple pattern → pushdown-friendly `filter` on (p, o...) + project;
  *  - BGP → multi-way equi-join on shared variables, greedily ordered:
  *    most-selective pattern first (constant object ≫ constant predicate),
  *    then always join a pattern connected to the bound set — disconnected
  *    components produce an explicit crossJoin (SURVEY.md §7.4.6);
  *  - OPTIONAL group → compile inner group fully, then one left join
  *    (all-or-nothing group semantics, SURVEY.md §7.4.3);
  *  - BIND → withColumn; null propagation gives SPARQL's error-as-unbound
  *    (SURVEY.md §7.4.2);
  *  - INSERT template → per-triple projection, skip rows with unbound
  *    slots, unionByName + distinct (Q10/Q11).
  */
object Compiler {

  private val nullStr = lit(null).cast("string")

  private def term(v: Column, k: Column, dt: Column, lg: Column): Column =
    when(v.isNull, lit(null).cast(
      "struct<v:string,k:string,dt:string,lg:string>"))
      .otherwise(struct(v.as("v"), k.as("k"), dt.as("dt"), lg.as("lg")))

  private def iriTerm(v: Column): Column = term(v, lit(Quad.KindIri), nullStr, nullStr)
  private def litTerm(v: Column, dt: Column, lg: Column): Column =
    term(v, lit(Quad.KindLiteral), dt, lg)

  private def subjectTerm(s: Column): Column =
    term(s,
      when(s.startsWith(Quad.BnodePrefix), Quad.KindBnode).otherwise(Quad.KindIri),
      nullStr, nullStr)

  private def objectTerm(): Column =
    term(col("o_value"), col("o_kind"), col("o_type"), col("o_lang"))

  // ------------------------------------------------------------ patterns

  /** Dict mode marker: [[graft.model.DictQuadStore]] hands the engine
    * `(graph, s_id, p_id, o_id)` frames; the compiler sniffs the schema
    * and switches the pattern block into id space. */
  private def isEncoded(quads: DataFrame): Boolean =
    quads.columns.contains("s_id")

  /** One triple pattern → DataFrame with a term-struct column per var.
    * `graphVar`: inside `GRAPH ?g {}` every pattern also binds ?g from
    * the quad's graph column, so shared-var joins stay graph-aligned. */
  private[sparql] def compilePattern(quads: DataFrame, tp: TriplePattern,
      graphVar: Option[String] = None,
      valuesIn: Map[String, Seq[Node]] = Map.empty): DataFrame = {
    if (isEncoded(quads))
      return compilePatternEncoded(quads, tp, graphVar, valuesIn)
    var df = quads
    // VALUES-pushdown (semijoin reduction): a variable slot whose var a
    // same-group ground VALUES binds can only ever take those constants
    // — the inner join with the VALUES table eliminates everything else
    // later anyway, so an IN-filter on the SCAN is free pruning (pushed
    // to parquet; the join still runs for multiplicity/other vars).
    def slotIn(name: String, iriCond: Seq[Node] => Column): Unit =
      valuesIn.get(name).foreach { nodes => df = df.where(iriCond(nodes)) }
    // constant filters (these reach the parquet scan as pushed predicates)
    tp.s match {
      case I(iri) => df = df.where(col("s") === iri)
      case L(_, _, _) => throw new IllegalArgumentException("literal subject")
      case V(n) => slotIn(n, nodes => {
        val iris = nodes.collect { case I(iri) => iri }
        if (iris.isEmpty) lit(false) // literal-only VALUES: no subject
        else col("s").isin(iris: _*)
      })
    }
    tp.p match {
      case I(iri) => df = df.where(col("p") === iri)
      case V(n) => slotIn(n, nodes => {
        val iris = nodes.collect { case I(iri) => iri }
        if (iris.isEmpty) lit(false)
        else col("p").isin(iris: _*)
      })
      case _ => throw new IllegalArgumentException("literal predicate")
    }
    tp.o match {
      case I(iri) =>
        df = df.where(col("o_kind") === Quad.KindIri && col("o_value") === iri)
      case L(value, dt, lang) =>
        df = df.where(col("o_kind") === Quad.KindLiteral &&
          col("o_value") === value &&
          col("o_type") <=> Option(dt).map(lit).getOrElse(nullStr) &&
          col("o_lang") <=> Option(lang).map(lit).getOrElse(nullStr))
      case V(n) => slotIn(n, nodes => nodes.map {
        case I(iri) =>
          col("o_kind") === Quad.KindIri && col("o_value") === iri
        case L(value, dt, lang) =>
          col("o_kind") === Quad.KindLiteral && col("o_value") === value &&
            col("o_type") <=> Option(dt).map(lit).getOrElse(nullStr) &&
            col("o_lang") <=> Option(lang).map(lit).getOrElse(nullStr)
        case V(_) => lit(false) // unreachable: VALUES terms are ground
      }.reduceOption(_ || _).getOrElse(lit(false)))
    }
    // project variables as term structs
    val pairs: Seq[(String, Column)] = (Seq(
      tp.s -> subjectTerm(col("s")),
      tp.p -> iriTerm(col("p")),
      tp.o -> objectTerm()
    ).collect { case (V(n), c) => (n, c) }) ++
      graphVar.map(g => g -> iriTerm(col("graph")))
    // same-var-twice patterns (?x p ?x): equality filter, keep one column
    pairs.groupBy(_._1).values.filter(_.size > 1).foreach { dup =>
      df = df.where(dup.map(_._2).sliding(2)
        .map(w => w.head === w.last).reduce(_ && _))
    }
    df.select(pairs.distinctBy(_._1).map { case (n, c) => c.as(n) }: _*)
  }

  /** Id-space triple pattern (Q1, dict mode): constants become one
    * dictionary lookup at PLAN time (bounded by the query text, memoized
    * in [[DictContext]]) and then filter the encoded scan on a LONG —
    * pushed to parquet like any scalar predicate, with 8-byte row-group
    * stats instead of strings. A constant the dictionary has never seen
    * matches nothing (`lit(false)` — the scan short-circuits). Variables
    * project as long id columns under their var names; the pattern-block
    * join in [[compileGroupTracked]] then shuffles only longs, and the
    * block decodes once when it completes. Term identity is id equality
    * by construction: the canonical dictionary key bakes kind, datatype
    * and language into the term string, so the string path's
    * `o_kind === ... && o_value === ... && o_type <=> ...` collapses to
    * one `o_id === const`. */
  private def compilePatternEncoded(quads: DataFrame, tp: TriplePattern,
      graphVar: Option[String],
      valuesIn: Map[String, Seq[Node]] = Map.empty): DataFrame = {
    val ctx = DictContext.required
    var df = quads
    def constFilter(c: Column, n: Node): Unit = n match {
      // VALUES-pushdown, id space: the ground terms become one In(ids)
      // long filter on the encoded scan — plan-time dictionary lookups,
      // terms the store never saw drop from the list (they can match
      // nothing), an all-unknown list short-circuits the scan
      case V(name) if valuesIn.contains(name) =>
        val ids = valuesIn(name)
          .flatMap(DictContext.keyOf).flatMap(ctx.idOf)
        df = if (ids.isEmpty) df.where(lit(false))
          else df.where(c.isin(ids: _*))
      case _ =>
        DictContext.keyOf(n).foreach { key =>
          df = ctx.idOf(key) match {
            case Some(id) => df.where(c === id)
            case None => df.where(lit(false))
          }
        }
    }
    tp.s match {
      case L(_, _, _) => throw new IllegalArgumentException("literal subject")
      case n => constFilter(col("s_id"), n)
    }
    tp.p match {
      case L(_, _, _) => throw new IllegalArgumentException("literal predicate")
      case n => constFilter(col("p_id"), n)
    }
    constFilter(col("o_id"), tp.o)
    val idPairs: Seq[(String, Column)] = Seq(
      tp.s -> col("s_id"), tp.p -> col("p_id"), tp.o -> col("o_id")
    ).collect { case (V(n), c) => (n, c) }
    // same-var-twice (?x p ?x): id equality — longs, not structs
    idPairs.groupBy(_._1).values.filter(_.size > 1).foreach { dup =>
      df = df.where(dup.map(_._2).sliding(2)
        .map(w => w.head === w.last).reduce(_ && _))
    }
    graphVar match {
      case Some(g) if idPairs.exists(_._1 == g) =>
        // `GRAPH ?g { ?g ... }`: ?g is bound by a pattern slot AND the
        // graph column. Decode the slot's id binding (this one pattern
        // only) so it can equal the graph's term struct; sibling
        // patterns bind ?g as a struct too, so block joins stay aligned.
        val others = idPairs.filter(_._1 != g).distinctBy(_._1)
        val slot = idPairs.find(_._1 == g).get._2
        val tmp = df.select(others.map { case (n, c) => c.as(n) } ++
          Seq(slot.as(g), col("graph").as("_gname")): _*)
        ctx.decode(tmp, Seq(g))
          .where(col(g) === iriTerm(col("_gname")))
          .drop("_gname")
      case Some(g) =>
        df.select(idPairs.distinctBy(_._1).map { case (n, c) => c.as(n) } :+
          iriTerm(col("graph")).as(g): _*)
      case None =>
        df.select(idPairs.distinctBy(_._1).map { case (n, c) => c.as(n) }: _*)
    }
  }

  /** Selectivity rank: lower = more selective = join earlier. */
  private def rank(tp: TriplePattern): Int = (tp.s, tp.p, tp.o) match {
    case (_, _, L(_, _, _)) => 0 // constant object literal (e.g. label probe)
    case (_, _, I(_)) => 1       // constant object IRI
    case (I(_), _, _) => 2       // constant subject
    case (_, I(_), _) => 3       // predicate-only
    case _ => 4
  }

  private def sharedVars(a: DataFrame, b: DataFrame): Seq[String] =
    a.columns.intersect(b.columns).toSeq

  /** SPARQL-compatible join (§18.5): two solutions join when every shared
    * variable is equal OR unbound on either side. Shared vars that are
    * statically never-null on both sides (the overwhelmingly common case
    * — pattern-bound vars) join as plain equi keys, keeping the hash
    * join; only maybe-unbound vars (OPTIONAL / union-padded / BIND) get
    * the null-tolerant disjunction, and the merged column takes the
    * bound side (coalesce). */
  private def compatJoin(a: DataFrame, aNullable: Set[String],
      b: DataFrame, bNullable: Set[String], joinType: String): DataFrame = {
    val shared = sharedVars(a, b)
    if (shared.isEmpty) return a.crossJoin(b)
    val soft = shared.filter(v => aNullable(v) || bNullable(v))
    if (soft.isEmpty) return a.join(b, shared, joinType)
    val hard = shared.filterNot(soft.contains)
    if (hard.isEmpty && joinType == "inner")
      return compatJoinAllSoft(a, b, soft)
    val l = a.alias("_l"); val r = b.alias("_r")
    val conds =
      hard.map(v => col(s"_l.$v") === col(s"_r.$v")) ++
      soft.map(v => col(s"_l.$v").isNull || col(s"_r.$v").isNull ||
        col(s"_l.$v") === col(s"_r.$v"))
    val joined = l.join(r, conds.reduce(_ && _), joinType)
    val aOnly = a.columns.filterNot(shared.contains).toSeq
    val bOnly = b.columns.filterNot(shared.contains).toSeq
    joined.select(
      hard.map(v => col(s"_l.$v").as(v)) ++
      soft.map(v => coalesce(col(s"_l.$v"), col(s"_r.$v")).as(v)) ++
      aOnly.map(v => col(s"_l.$v").as(v)) ++
      bOnly.map(v => col(s"_r.$v").as(v)): _*)
  }

  /** The degenerate compat-join shape: EVERY shared var is maybe-unbound,
    * so the OR/isNull disjunction gives Spark no equi key at all and the
    * join falls back to a nested loop over the FULL pair space. Split on
    * the first soft var's bound/unbound status instead — three disjoint
    * compatibility cases, unioned:
    *   C  both sides bind v0      → plain equi key on v0 (HASH join — the
    *                                bulk of the data takes this branch)
    *   A  left v0 unbound         → nested loop, but only over the rows
    *   B  right v0 unbound, left    that actually left v0 unbound (the
    *      bound                     OPTIONAL/UNION-miss minority slice)
    * Remaining soft vars keep the disjunction inside each branch — one
    * recovered equi key is what flips the plan from NLJ to hash.
    * Left-outer all-soft joins (rare: an OPTIONAL whose ENTIRE overlap
    * with the base is maybe-unbound) still take the disjunction path —
    * documented trade-off, shape pinned in CompatJoinSpec. */
  private def compatJoinAllSoft(
      a: DataFrame, b: DataFrame, soft: Seq[String]): DataFrame = {
    val v0 = soft.head
    val rest = soft.tail
    val l = a.alias("_l"); val r = b.alias("_r")
    def restConds = rest.map(v =>
      col(s"_l.$v").isNull || col(s"_r.$v").isNull ||
        col(s"_l.$v") === col(s"_r.$v"))
    val cases = Seq(
      (col(s"_l.$v0") === col(s"_r.$v0")) +: restConds,
      col(s"_l.$v0").isNull +: restConds,
      (col(s"_l.$v0").isNotNull && col(s"_r.$v0").isNull) +: restConds)
    val aOnly = a.columns.filterNot(soft.contains).toSeq
    val bOnly = b.columns.filterNot(soft.contains).toSeq
    cases.map { conds =>
      l.join(r, conds.reduce(_ && _), "inner").select(
        soft.map(v => coalesce(col(s"_l.$v"), col(s"_r.$v")).as(v)) ++
        aOnly.map(v => col(s"_l.$v").as(v)) ++
        bOnly.map(v => col(s"_r.$v").as(v)): _*)
    }.reduce(_ unionAll _)
  }

  /** All-or-nothing option sequence (bound-join binding serialization:
    * one unshippable term anywhere = fall back to the full fetch). */
  private def traverseOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get).toSeq) else None

  private def joinStep(acc: Option[DataFrame], accNullable: Set[String],
      next: DataFrame, nextNullable: Set[String]): DataFrame =
    acc match {
      case None => next
      case Some(a) => compatJoin(a, accNullable, next, nextNullable, "inner")
    }

  // ------------------------------------------------------------- groups

  /** Sequential group evaluation. `outer` is the binding table built so
    * far (None = start of a fresh group). Consecutive triple patterns are
    * batched and greedily reordered before joining. */
  private[sparql] def compileGroup(
      quads: DataFrame, group: Group, outer: Option[DataFrame],
      namedQuads: Option[DataFrame] = None): DataFrame =
    compileGroupTracked(quads, group, outer.map((_, Set.empty[String])),
      None, namedQuads)._1

  /** compileGroup + static per-variable nullability: the returned set
    * holds every variable that MAY be unbound (null) in some row —
    * introduced under OPTIONAL, missing from a UNION branch, or computed
    * by BIND. Joins consult it so that only those vars pay for SPARQL's
    * null-tolerant compatible-join; everything else stays an equi key. */
  private def compileGroupTracked(
      quads: DataFrame, group: Group,
      outer: Option[(DataFrame, Set[String])],
      graphVar: Option[String] = None,
      // the GRAPH-pattern dataset (§13.2): None = same as `quads`
      // (whole-store default); Some = the FROM NAMED scope, possibly
      // empty when the query declared FROM without FROM NAMED
      namedQuads: Option[DataFrame] = None,
      // dict mode: vars the CALLER wants kept as raw id longs across
      // the flush decode (ClosureE's edge endpoints — the BFS then
      // iterates over 8-byte ids and decodes once at the end)
      idVars: Set[String] = Set.empty): (DataFrame, Set[String]) = {

    var acc: Option[DataFrame] = outer.map(_._1)
    var nullable: Set[String] = outer.map(_._2).getOrElse(Set.empty)

    // VALUES-pushdown scope: vars a SAME-GROUP ground VALUES fully
    // binds (no UNDEF rows, ≤100 rows — past that an IN-list stops
    // being a scan win). These restrict this group's DIRECT pattern
    // slots only; Opt/Union/Minus/EXISTS bodies compile through their
    // own group call and collect their own VALUES — an outer
    // restriction must never leak into an anti-joined or optional
    // subtree, where eliminating a scan row changes semantics instead
    // of just pre-applying the join. Multiple VALUES on one var
    // intersect (each is a necessary condition).
    val valuesIn: Map[String, Seq[Node]] = {
      val m = scala.collection.mutable.Map.empty[String, Seq[Node]]
      group.elems.foreach {
        case ValuesE(vars, rows) if rows.nonEmpty && rows.length <= 100 =>
          vars.zipWithIndex.foreach { case (v, i) =>
            val colTerms = rows.map(_(i))
            if (colTerms.forall(_.isDefined)) {
              val nodes = colTerms.flatten.distinct
              m(v) = m.get(v).map(_.intersect(nodes)).getOrElse(nodes)
            }
          }
        case _ => ()
      }
      m.toMap
    }

    def joinPatternBatch(batch: Seq[TriplePattern]): Unit = {
      if (batch.isEmpty) return
      val encoded = isEncoded(quads)
      // Id-space block (dict mode): with NO outer bindings the whole
      // batch — i.e. the BGP, the shuffle-dominant shape (Q2) — joins
      // over long ids and decodes ONCE when the block completes, so no
      // term string enters an intermediate shuffle. A batch that joins
      // into existing term-struct bindings (post-OPTIONAL/BIND tails)
      // decodes each pattern slice first instead: its constants still
      // filter the encoded scan by id, but the join keys must align
      // with the struct-space accumulator.
      val idBlock = encoded && acc.isEmpty
      // static shape rank, unless a CardEstimator is in planner scope
      // (GraphEngine.withCardinalityStats) — then data-driven estimates
      // pick the order ([[CardEstimator]]; orderOf mirrors this loop)
      val ceOpt = CardEstimator.current.value
      val est: TriplePattern => Double = ceOpt match {
        case Some(ce) => tp => ce.estimate(tp)
        case None => tp => rank(tp).toDouble
      }
      val remaining = batch.sortBy(est).toBuffer
      // constant predicates already joined per subject VARIABLE — feeds
      // the characteristic-set conditional estimate, which corrects the
      // independence assumption for correlated star predicates
      val starPreds = scala.collection.mutable.Map.empty[String, Set[String]]
        .withDefaultValue(Set.empty)
      while (remaining.nonEmpty) {
        val boundVars: Set[String] =
          acc.map(_.columns.toSet).getOrElse(Set.empty)
        // prefer a connected pattern; among connected, smallest
        // conditional (cset) estimate, else most selective (sorted);
        // disconnected → crossJoin (explicit, SURVEY §7.4.6)
        val idx = CardEstimator.pickNext(remaining.toSeq, boundVars,
          starPreds, ceOpt, est)
        val tp = remaining.remove(idx)
        (tp.s, tp.p) match {
          case (V(v), I(p)) => starPreds(v) = starPreds(v) + p
          case _ => ()
        }
        val pat0 = compilePattern(quads, tp, graphVar, valuesIn)
        val pat = if (encoded && !idBlock)
          DictContext.required.decodeBlock(pat0, slotCounts(Seq(tp)), idVars)
          else pat0
        acc = Some(joinStep(acc, nullable, pat, Set.empty))
        // an (inner) join against a pattern leaves its vars bound
        nullable --= tp.vars
      }
      // decode-on-projection: the block's id-bound vars become term
      // structs here, in one dictionary join per variable — result-
      // sized work, never intermediate-sized — and vars the usage
      // analysis proves dead after this block (pure join glue) are
      // DROPPED instead, skipping their decode join entirely
      if (idBlock)
        acc = acc.map(
          DictContext.required.decodeBlock(_, slotCounts(batch), idVars))
    }

    var patternBatch = Vector.empty[TriplePattern]
    def flush(): Unit = {
      joinPatternBatch(patternBatch)
      patternBatch = Vector.empty
    }

    group.elems.foreach {
      case Pat(tp) => patternBatch :+= tp
      case Opt(inner) =>
        flush()
        val (innerDf, innerNullable) = compileGroupTracked(quads, inner, None, graphVar, namedQuads)
        acc match {
          case None => // OPTIONAL with empty base — degenerate
            acc = Some(innerDf); nullable ++= innerNullable
          case Some(a) =>
            val newVars = innerDf.columns.toSet -- a.columns.toSet
            acc = Some(compatJoin(a, nullable, innerDf, innerNullable, "left_outer"))
            nullable ++= newVars // unmatched base rows leave them unbound
        }
      case Bind(e, as) =>
        flush()
        acc = Some(acc.getOrElse(unitRow(quads)).withColumn(as, compileExpr(e)))
        nullable += as // expression errors surface as unbound
      case FilterE(e) =>
        flush()
        existsOf(e) match {
          case Some((inner, negated)) =>
            // FILTER [NOT] EXISTS = semi/anti join on the shared vars
            // (no per-row subquery — one distinct + one hash join)
            val (innerDf, _) = compileGroupTracked(quads, inner, None, graphVar, namedQuads)
            val a = acc.getOrElse(unitRow(quads))
            val shared = sharedVars(a, innerDf)
            val joinType = if (negated) "left_anti" else "left_semi"
            acc = Some(
              if (shared.isEmpty) a.join(innerDf.limit(1), lit(true), joinType)
              else a.join(innerDf.select(shared.map(col): _*).dropDuplicates(),
                shared, joinType))
          case None =>
            acc = Some(acc.getOrElse(unitRow(quads)).where(compileBool(e)))
        }
      case UnionE(branches) =>
        flush()
        val compiled = branches.map(b => compileGroupTracked(quads, b, None, graphVar, namedQuads))
        // align branch schemas: a variable bound in one branch only is
        // unbound (null term) in rows from the others
        val allVars = compiled.flatMap(_._1.columns).distinct
        val nullTerm = lit(null)
          .cast("struct<v:string,k:string,dt:string,lg:string>")
        val unioned = compiled.map { case (df, _) =>
          val have = df.columns.toSet
          df.select(allVars.map(v =>
            (if (have(v)) col(v) else nullTerm).as(v)): _*)
        }.reduce(_ unionAll _)
        val unionNullable = allVars.filterNot(v =>
          compiled.forall { case (df, ns) => df.columns.contains(v) && !ns(v) }).toSet
        acc match {
          case None =>
            acc = Some(unioned); nullable ++= unionNullable
          case Some(a) =>
            val nonNullLeft = a.columns.toSet -- nullable
            val nonNullRight = unioned.columns.toSet -- unionNullable
            acc = Some(compatJoin(a, nullable, unioned, unionNullable, "inner"))
            // after the inner compat join a shared var is bound whenever
            // EITHER side binds it (coalesce)
            nullable = (nullable ++ unionNullable) -- nonNullLeft -- nonNullRight
        }
      case MinusE(inner) =>
        flush()
        val (innerDf, _) = compileGroupTracked(quads, inner, None, graphVar, namedQuads)
        acc = Some(acc match {
          case None => unitRow(quads) // MINUS with empty base — degenerate
          case Some(a) =>
            val shared = sharedVars(a, innerDf)
            // SPARQL MINUS: disjoint domains remove nothing
            if (shared.isEmpty) a
            else if (shared.forall(v => !nullable(v)))
              a.join(innerDf.select(shared.map(col): _*)
                .dropDuplicates(), shared, "left_anti")
            else {
              // maybe-unbound shared vars: remove a row iff some inner
              // row is compatible on every shared var AND the bound
              // domains actually overlap (§18.5 Minus)
              val l = a.alias("_l")
              val r = innerDf.select(shared.map(col): _*)
                .dropDuplicates().alias("_r")
              val compat = shared.map(v =>
                col(s"_l.$v").isNull || col(s"_r.$v").isNull ||
                  col(s"_l.$v") === col(s"_r.$v")).reduce(_ && _)
              val overlaps = shared.map(v =>
                col(s"_l.$v").isNotNull && col(s"_r.$v").isNotNull)
                .reduce(_ || _)
              l.join(r, compat && overlaps, "left_anti")
                .select(a.columns.toSeq.map(v => col(s"_l.$v").as(v)): _*)
            }
        })
      case SubSelectE(q) =>
        flush()
        val sub = compileSubSelect(q, quads)
        acc = Some(joinStep(acc, nullable, sub, Set.empty))
        nullable --= sub.columns
      case ServiceE(iri, inner, silent) =>
        flush()
        // the endpoint's registered dataset replaces `quads` wholesale:
        // the inner group sees only the service's data (its own default
        // graph), never the local store, GRAPH var, or FROM scoping —
        // matching how a remote endpoint evaluates the pattern. The
        // result joins back on shared vars like any sub-group, as one
        // distributed (broadcastable) join.
        // registry first (the scale path); an unregistered http(s) IRI
        // degrades to a live federated fetch of the endpoint's dataset,
        // evaluated with the same local-join plan. SILENT unchanged:
        // any failure (unreachable host, non-200, bad JSON) = unit table.
        //
        // BOUND JOIN (opt-in per endpoint via Services.enableBoundJoin;
        // SPARQL 1.1 Fed §2.4 / the FedX VALUES-injection strategy):
        // when the SERVICE group is a pure BGP, local bindings exist,
        // and every shared variable is definitely bound, ship the BGP
        // plus ONE batched VALUES block of the distinct shared bindings
        // — the REMOTE engine does the selection and only
        // join-surviving bindings cross the wire, instead of the whole
        // endpoint dataset. Falls back to the full fetch whenever the
        // shape can't carry it (non-BGP group, bnode bindings, no/soft
        // shared vars, more than BoundJoinMaxBindings distinct rows).
        val isHttp =
          iri.startsWith("http://") || iri.startsWith("https://")
        val registered = Services.lookup(iri)
        val bgpPats: Seq[TriplePattern] =
          inner.elems.collect { case Pat(tp) => tp }
        val bjShared: Seq[String] =
          if (registered.isEmpty && isHttp && Services.boundJoinEnabled(iri)
            && acc.isDefined && bgpPats.length == inner.elems.length
            && bgpPats.nonEmpty)
            acc.get.columns.intersect(inner.vars.toSeq)
              .filterNot(nullable).toSeq.sorted
          else Seq.empty
        // None = bound join not attempted (fall through to full fetch);
        // Some(None) = attempted, SILENT failure (unit table);
        // Some(Some(df)) = the remote's join-surviving bindings.
        val boundJoin: Option[Option[DataFrame]] =
          if (bjShared.isEmpty) None
          else {
            val rows = acc.get.select(bjShared.map(col): _*).distinct()
              .limit(HttpService.BoundJoinMaxBindings + 1).collect()
            val texts: Option[Seq[Seq[String]]] =
              if (rows.length > HttpService.BoundJoinMaxBindings) None
              else traverseOpt(rows.toSeq.map { r =>
                traverseOpt(bjShared.indices.map { i =>
                  Option(r.getStruct(i)).flatMap(t =>
                    HttpService.termText(t.getAs[String]("v"),
                      t.getAs[String]("k"), t.getAs[String]("dt"),
                      t.getAs[String]("lg")))
                })
              })
            texts match {
              case None => None // unshippable bindings → full fetch
              // empty local side: the join result is KNOWN empty — a
              // zero-row VALUES block is grammatically legal but
              // rejected by some endpoints and always a wasted round
              // trip, so answer locally with the empty bindings frame
              case Some(vals) if vals.isEmpty =>
                Some(Some(HttpService.emptyBindings(
                  quads.sparkSession, inner.vars.toSeq.sorted)))
              case Some(vals) =>
                val projVars = inner.vars.toSeq.sorted
                HttpService.boundPatternQuery(
                    bgpPats, projVars, bjShared, vals) match {
                  // unserializable pattern IRI → full fetch
                  case None => None
                  case Some(q) =>
                    try Some(Some(HttpService.selectBindings(
                      quads.sparkSession, iri, q, projVars)))
                    catch {
                      case scala.util.control.NonFatal(e) =>
                        if (silent) Some(None) else throw e
                    }
                }
            }
          }
        boundJoin match {
          case Some(Some(bindings)) =>
            // pure BGP: the remote binds every projected var in every
            // surviving row, so nothing here is maybe-unbound
            acc = Some(joinStep(acc, nullable, bindings, Set.empty))
          case Some(None) => () // §4: SILENT failure = unit table
          case None =>
            val svcData = registered.orElse {
              if (!isHttp) None
              else if (silent)
                scala.util.Try(HttpService.fetchDataset(quads.sparkSession, iri))
                  .toOption
              else Some(HttpService.fetchDataset(quads.sparkSession, iri))
            }
            svcData match {
              case Some(svcQuads) =>
                val (innerDf, innerNullable) =
                  compileGroupTracked(svcQuads, inner, None, None, None)
                acc = Some(joinStep(acc, nullable, innerDf, innerNullable))
                nullable ++= innerNullable
              case None if silent => () // §4: SILENT failure = unit table
              case None => throw new IllegalArgumentException(
                s"unregistered SERVICE endpoint: <$iri> " +
                  "(register it via graft.sparql.Services.register)")
            }
        }
      case GraphE(gNode, inner) =>
        flush()
        // GRAPH patterns range over the named-graph dataset, which is
        // `quads` itself unless FROM/FROM NAMED made the dataset explicit
        val graphScope = namedQuads.getOrElse(quads)
        gNode match {
          case I(iri) =>
            // constant graph → a partition-prunable filter on the read
            val (innerDf, innerNullable) = compileGroupTracked(
              graphScope.where(col("graph") === iri), inner, None, graphVar,
              namedQuads)
            acc = Some(joinStep(acc, nullable, innerDf, innerNullable))
            nullable ++= innerNullable
          case V(name) =>
            // variable graph → every inner pattern also binds ?name, so
            // the BGP joins align within one graph per solution —
            // including `+`/`*` closures, whose pair sets are built and
            // iterated per graph (see ClosureE below).
            val (innerDf, innerNullable) =
              compileGroupTracked(graphScope, inner, None, Some(name), namedQuads)
            acc = Some(joinStep(acc, nullable, innerDf, innerNullable))
            nullable ++= innerNullable
          case L(_, _, _) =>
            throw new IllegalArgumentException("literal GRAPH name")
        }
      case ClosureE(sN, edgeGroup, v1, v2, oN, minHops, maxHops) =>
        flush()
        // Inside GRAPH ?g the closure is PER GRAPH: edge pairs carry the
        // graph term as `_g`, the doubling join keys on it, and the
        // zero-length domain is drawn graph-by-graph — so ?g is bound
        // and constrained by the path like by any other pattern.
        val gSel = graphVar.map(g => col(g).as("_g")).toSeq
        val gKey = graphVar.map(_ => col("_g")).toSeq
        // ID-SPACE CLOSURE (dict mode): when the edge endpoints are
        // touched by nothing but pattern slots (the overwhelmingly
        // common desugared-path shape), keep them as raw dictionary
        // ids — every BFS/doubling round then shuffles 8-byte longs
        // instead of 4-string term structs, and the closure decodes
        // ONCE at its result boundary like any pattern block. Falls
        // back to term structs whenever ids can't carry the semantics:
        // an expression referencing an endpoint, an endpoint bound
        // under OPTIONAL/UNION inside the edge group (flushed to
        // structs there), ?g doubling as an endpoint, or a zero-length
        // path whose CONSTANT endpoint the dictionary has never seen
        // (no id can represent it in the identity pairs).
        val encoded = isEncoded(quads)
        val dictCtx = if (encoded) Some(DictContext.required) else None
        val evFree = encoded && DictContext.usageOf(edgeGroup, Set.empty)
          .exists(u => !u.usedOutsidePatterns(v1) && !u.usedOutsidePatterns(v2))
        val rawPairs = compileGroupTracked(quads, edgeGroup, None, graphVar,
          namedQuads, if (evFree) Set(v1, v2) else Set.empty)._1
        def nodeId(n: Node): Option[Option[Long]] =
          DictContext.keyOf(n).map(k => dictCtx.get.idOf(k))
        val idSpace = evFree &&
          Seq(v1, v2).forall(n => rawPairs.schema(n).dataType ==
            org.apache.spark.sql.types.LongType) &&
          !graphVar.exists(g => Seq(sN, oN).contains(V(g))) &&
          !(minHops == 0 && Seq(sN, oN).exists(n =>
            nodeId(n).exists(_.isEmpty)))
        // one-hop edge pairs from the desugared inner path; checkpointed
        // so the iterative plan below stays flat (lineage pitfall)
        val edgePairs = {
          val proj = rawPairs
            .select(gSel ++ Seq(col(v1).as("_src"), col(v2).as("_dst")): _*)
          // struct path over a dict store: decode any id endpoints
          (if (encoded && !idSpace) dictCtx.get.decode(proj) else proj)
            .dropDuplicates().localCheckpoint()
        }
        // Reachability strategy by endpoint shape:
        //  - constant endpoint → SEEDED BFS: only the seed's reachable
        //    set is materialized, and every round joins a FRONTIER
        //    (shrinking) against the edge set — the full pair set never
        //    exists. This is the 100 TB path PLANS.md prescribes for
        //    closures: `<x> p+ ?y` over a dense graph costs O(reach(x))
        //    instead of O(all pairs). Diameter-bounded at 64 rounds.
        //  - both ends variables → PAIR DOUBLING: round k covers paths
        //    up to 2^k hops, so 20 bounded rounds reach any practical
        //    diameter with one equi-join + distinct per round — each
        //    shuffles on the join endpoint, never all-pairs.
        // (Both bounds are pragmatic envelopes of the spec's unbounded
        // semantics.) maxHops == 1 (`?`) needs no iteration at all.
        def seedTerm(node: Node): Option[Column] = node match {
          case _ if idSpace =>
            // a constant the dictionary lacks gets the impossible id -1
            // (real ids are >= 0) — the seeded BFS correctly yields the
            // empty reachable set
            nodeId(node).map(id => lit(id.getOrElse(-1L)))
          case I(iri) => Some(iriTerm(lit(iri)))
          case L(value, dt, lang) => Some(litTerm(lit(value),
            Option(dt).map(lit).getOrElse(nullStr),
            Option(lang).map(lit).getOrElse(nullStr)))
          case V(_) => None
        }
        val fwdSeed = seedTerm(sN)
        val bwdSeed = if (fwdSeed.isEmpty) seedTerm(oN) else None
        val gJoin = graphVar.map(_ => "_g").toSeq
        // Shared frontier expansion for both seeded shapes: `start`
        // holds (carry..., _dst) rows, `step` the (graph..., _src,
        // _dst) edges; expands until no new (carry, _dst) appears.
        // 4 hops per round in ONE job (the per-round fixed cost —
        // checkpoint + emptiness count — dominates on long chains, so
        // batching hops cuts jobs 4× at unchanged semantics); 64
        // rounds cover 256-hop paths.
        def bfsExpand(start: DataFrame, step: DataFrame,
            carry: Seq[String]): DataFrame = {
          val carryCols = carry.map(col)
          val stepB = step.select(gKey ++ Seq(col("_src").as("_dst"),
            col("_dst").as("_hop")): _*)
          def hop(df: DataFrame): DataFrame = df.join(stepB, gJoin :+ "_dst")
            .select(carryCols :+ col("_hop").as("_dst"): _*)
          var reach = start
          var frontier = start
          var rounds = 0
          var growing = frontier.count() > 0
          while (growing && rounds < 64) {
            val hops = Iterator.iterate(frontier)(hop).slice(1, 5).toSeq
            val fresh = hops.reduce(_ unionAll _).dropDuplicates()
              .join(reach, carry :+ "_dst", "left_anti")
              .localCheckpoint()
            growing = fresh.count() > 0
            if (growing) {
              reach = reach.unionAll(fresh).localCheckpoint()
              frontier = fresh
            }
            rounds += 1
          }
          reach
        }
        var closure = edgePairs
        if (maxHops > 1) (fwdSeed orElse bwdSeed) match {
          case Some(seedT) =>
            val fwd = fwdSeed.isDefined
            // walk edges forward from a const subject, backward to a
            // const object — one relation, flipped once
            val step =
              if (fwd) edgePairs
              else edgePairs.select(gKey ++ Seq(col("_dst").as("_src"),
                col("_src").as("_dst")): _*)
            val reach = bfsExpand(
              step.where(col("_src") <=> seedT)
                .select(gKey :+ col("_dst"): _*).dropDuplicates()
                .localCheckpoint(),
              step, gJoin)
            closure =
              if (fwd) reach.select(gKey ++ Seq(seedT.as("_src"), col("_dst")): _*)
              else reach.select(gKey ++ Seq(col("_dst").as("_src"),
                seedT.as("_dst")): _*)
          case None =>
            // Var-var closure. SEMI-JOIN SEEDING (round 8): when a
            // SIBLING element compiled before this one already binds the
            // subject or object var (and not nullably, i.e. not out of
            // an OPTIONAL), only pairs whose bound end is one of those
            // values can survive the upcoming join — so run the seeded
            // BFS from that DISTINCT binding set, carrying the origin
            // through the hops. Cost drops from O(all reachable pairs)
            // to O(Σ reach(seed)); the join with `acc` afterwards is
            // unchanged, so results are identical. Full pair doubling
            // remains only for a closure with NO bound end — where the
            // spec's result IS the full pair set.
            val seedBinding: Option[(DataFrame, String, Boolean)] =
              acc.flatMap { a =>
                def ok(node: Node): Option[String] = node match {
                  case V(nm) if a.columns.contains(nm) &&
                    !nullable.contains(nm) => Some(nm)
                  case _ => None
                }
                // per-graph seeding needs ?g bound alongside the endpoint
                if (!graphVar.forall(a.columns.contains)) None
                else ok(sN).map((a, _, true)).orElse(ok(oN).map((a, _, false)))
              }
            seedBinding match {
              case Some((a, nm, fwd)) =>
                val step =
                  if (fwd) edgePairs
                  else edgePairs.select(gKey ++ Seq(col("_dst").as("_src"),
                    col("_src").as("_dst")): _*)
                val seeds0 = a.select(graphVar.map(g => col(g).as("_g")).toSeq
                  :+ col(nm).as("_src"): _*)
                  .dropDuplicates()
                // id-space: the sibling binding is a decoded struct —
                // cross back (one result-sized dictionary join; a term
                // the store never saw seeds nothing, same as having no
                // matching edge)
                val seeds = (if (idSpace) dictCtx.get.encodeTerm(seeds0, "_src")
                  else seeds0).localCheckpoint()
                val reach = bfsExpand(
                  seeds.join(step, gJoin :+ "_src")
                    .select(gKey ++ Seq(col("_src").as("_origin"),
                      col("_dst")): _*)
                    .dropDuplicates().localCheckpoint(),
                  step, gJoin :+ "_origin")
                closure =
                  if (fwd) reach.select(gKey ++ Seq(
                    col("_origin").as("_src"), col("_dst")): _*)
                  else reach.select(gKey ++ Seq(col("_dst").as("_src"),
                    col("_origin").as("_dst")): _*)
              case None =>
                var n = closure.count()
                var changed = n > 0
                var rounds = 0
                while (changed && rounds < 20) {
                  val doubled = closure.join(
                    closure.select(gKey ++ Seq(col("_src").as("_dst"),
                      col("_dst").as("_hop")): _*),
                    gJoin :+ "_dst")
                    .select(gKey ++ Seq(col("_src"), col("_hop").as("_dst")): _*)
                  val next = closure.unionAll(doubled).dropDuplicates().localCheckpoint()
                  val m = next.count()
                  changed = m != n
                  n = m
                  closure = next
                  rounds += 1
                }
            }
        }
        if (minHops == 0) {
          // zero-length identity, domain-restricted (ALP §18.4): every
          // term of the scoped graph — subject or object position — plus
          // the query's own constant endpoints (a constant matches its
          // zero-length path whether or not the graph mentions it). One
          // distinct over narrow term structs; partitionable at scale.
          // Per graph when ?g is in scope: each graph contributes its
          // own terms, and constants pair with every graph in scope.
          val gTermSel = graphVar.map(_ => iriTerm(col("graph")).as("_g")).toSeq
          val termDomain: DataFrame =
            if (idSpace)
              // stay in id space end to end — the distinct runs over
              // (graph, long) and the identity pairs carry 8-byte ids
              quads.select(gTermSel :+ col("s_id").as("_t"): _*)
                .unionAll(quads.select(gTermSel :+ col("o_id").as("_t"): _*))
            else if (isEncoded(quads)) {
              // dict store but struct-path closure: dedup the (graph,
              // id) domain in id space and decode the survivors
              val ids = quads.select(gTermSel :+ col("s_id").as("_t_id"): _*)
                .unionAll(quads.select(gTermSel :+ col("o_id").as("_t_id"): _*))
                .dropDuplicates()
              DictContext.required.decode(ids, Seq("_t_id"))
                .withColumnRenamed("_t_id", "_t")
            } else
              quads.select(gTermSel :+ subjectTerm(col("s")).as("_t"): _*)
                .unionAll(quads.select(gTermSel :+ objectTerm().as("_t"): _*))
          val constHost = graphVar match {
            case Some(_) => quads.select(iriTerm(col("graph")).as("_g")).dropDuplicates()
            case None => unitRow(quads)
          }
          val constTerms =
            if (idSpace) Seq(sN, oN).flatMap(n => nodeId(n).map(id =>
              // ids exist — the idSpace guard required them under */{0,n}
              constHost.select(gKey :+ lit(id.get).as("_t"): _*)))
            else Seq(sN, oN).collect {
              case I(iri) => constHost.select(gKey :+ iriTerm(lit(iri)).as("_t"): _*)
              case L(value, dt, lang) => constHost.select(gKey :+ litTerm(lit(value),
                Option(dt).map(lit).getOrElse(nullStr),
                Option(lang).map(lit).getOrElse(nullStr)).as("_t"): _*)
            }
          val domain = constTerms.foldLeft(termDomain)(_ unionAll _)
            .dropDuplicates()
          closure = closure
            .unionAll(domain.select(gKey ++ Seq(col("_t").as("_src"),
              col("_t").as("_dst")): _*))
            .dropDuplicates()
        }
        var res = closure
        val outCols = Vector.newBuilder[(String, Column)]
        // constant-endpoint constraint: in id space one long equality
        // (full term identity by construction); -1 = absent from the
        // dictionary = matches nothing
        def idConstraint(c: Column, n: Node): Column =
          c === lit(nodeId(n).get.getOrElse(-1L))
        sN match {
          case V(name) => outCols += name -> col("_src")
          case I(iri) =>
            res = if (idSpace) res.where(idConstraint(col("_src"), sN))
              else res.where(col("_src").getField("v") === iri)
          case L(_, _, _) => throw new IllegalArgumentException("literal path subject")
        }
        oN match {
          case V(name) => outCols += name -> col("_dst")
          case I(iri) =>
            res = if (idSpace) res.where(idConstraint(col("_dst"), oN))
              else res.where(col("_dst").getField("v") === iri)
          case L(value, dt, lang) =>
            res = if (idSpace) res.where(idConstraint(col("_dst"), oN))
              else res.where(col("_dst") <=> litTerm(lit(value),
                Option(dt).map(lit).getOrElse(nullStr),
                Option(lang).map(lit).getOrElse(nullStr)))
        }
        graphVar.foreach(g => outCols += g -> col("_g"))
        val colsAll = outCols.result()
        // a var bound twice (`?x p+ ?x` cycle test, or ?g doubling as an
        // endpoint): every repeat is an equality filter on its columns
        val cols = colsAll.distinctBy(_._1)
        colsAll.groupBy(_._1).valuesIterator.filter(_.size > 1).foreach { dups =>
          dups.map(_._2).sliding(2).foreach {
            case Seq(a, b) => res = res.where(a === b)
            case _ =>
          }
        }
        val projected0 =
          if (cols.nonEmpty) res.select(cols.map { case (nm, c) => c.as(nm) }: _*)
          else res.limit(1).select() // fully-ground path: existence row
        // id-space closures decode ONCE here — the result boundary,
        // like a pattern block's flush
        val projected =
          if (idSpace) dictCtx.get.decode(projected0) else projected0
        acc = Some(joinStep(acc, nullable, projected, Set.empty))
        nullable --= cols.map(_._1)
      case ValuesE(vars, rows) =>
        flush()
        val nullTerm = lit(null)
          .cast("struct<v:string,k:string,dt:string,lg:string>")
        def termCol(t: Option[Node]): Column = t match {
          case Some(I(iri)) => iriTerm(lit(iri))
          case Some(L(value, dt, lang)) =>
            litTerm(lit(value), Option(dt).map(lit).getOrElse(nullStr),
              Option(lang).map(lit).getOrElse(nullStr))
          case Some(V(_)) =>
            throw new IllegalArgumentException("VALUES needs ground terms")
          case None => nullTerm // UNDEF
        }
        val table = rows.map { r =>
          unitRow(quads).select(vars.zip(r).map {
            case (v, t) => termCol(t).as(v)
          }: _*)
        }.reduceOption(_ unionAll _).getOrElse {
          // `VALUES ?v { }` is legal SPARQL: the empty table — zero
          // solutions, but the vars still need their term-struct schema
          unitRow(quads).limit(0)
            .select(vars.map(v => nullTerm.as(v)): _*)
        }
        // a var some row UNDEFs joins null-tolerantly; fully-ground
        // vars are plain equi keys and leave the nullable set
        val soft = vars.zipWithIndex
          .filter { case (_, i) => rows.exists(r => r(i).isEmpty) }
          .map(_._1).toSet
        acc = Some(joinStep(acc, nullable, table, soft))
        nullable = (nullable ++ soft) -- vars.filterNot(soft)
    }
    flush()
    (acc.getOrElse(unitRow(quads)), nullable)
  }

  /** Pattern-slot occurrences per variable within one batch — the unit
    * [[DictContext.VarUsage]] counts in, for the dead-var check. */
  private def slotCounts(batch: Seq[TriplePattern]): Map[String, Int] = {
    val m = scala.collection.mutable.Map.empty[String, Int]
    batch.foreach(tp => Seq(tp.s, tp.p, tp.o).foreach {
      case V(n) => m(n) = m.getOrElse(n, 0) + 1
      case _ => ()
    })
    m.toMap
  }

  /** A FILTER constraint that is (possibly negated) EXISTS. */
  private def existsOf(e: Expr): Option[(Group, Boolean)] = e match {
    case ExistsE(g, n) => Some((g, n))
    case NotE(inner) => existsOf(inner).map { case (g, n) => (g, !n) }
    case _ => None
  }

  /** one row, ZERO columns — a leading BIND starts from this, so no
    * helper column can collide with a user variable (e.g. `?id`) */
  private def unitRow(quads: DataFrame): DataFrame =
    quads.sparkSession.range(1).toDF().drop("id")

  // -------------------------------------------------------- expressions

  /** Expr → term-struct Column (null = unbound; SPARQL error-as-unbound
    * falls out of Spark null propagation). */
  private[sparql] def compileExpr(e: Expr): Column = e match {
    case VarRef(n) => col(n)
    case StrLit(s) => litTerm(lit(s), nullStr, nullStr)
    case TypedLit(v, dt) =>
      val d = if (dt == Quad.xsd.string) null else dt
      litTerm(lit(v), Option(d).map(lit).getOrElse(nullStr), nullStr)
    case ConcatE(args) =>
      litTerm(concat(args.map(a => valueOf(a)): _*), nullStr, nullStr)
    case UriE(a) => iriTerm(valueOf(a))
    case Md5E(a) => litTerm(md5(valueOf(a)), nullStr, nullStr)
    case LcaseE(a) => litTerm(lower(valueOf(a)), nullStr, nullStr)
    case ReplaceE(a, p, r) =>
      litTerm(regexp_replace(valueOf(a), p, r), nullStr, nullStr)
    case StrAfterE(a, sep) =>
      val s = valueOf(a)
      val pos = instr(s, sep)
      // SPARQL STRAFTER: "" when separator absent; suffix after FIRST match
      litTerm(when(s.isNull, nullStr)
        .when(pos > 0, substring_index_after(s, pos, sep))
        .otherwise(lit("")), nullStr, nullStr)
    case EncodeForUriE(a) =>
      litTerm(SparqlFunctions.encode_for_uri(valueOf(a)), nullStr, nullStr)
    case StrLangE(a, lang) => litTerm(valueOf(a), nullStr, lit(lang))
    case IfE(c, t, f) =>
      when(compileBool(c), compileExpr(t)).otherwise(compileExpr(f))
    case NumLit(lex) =>
      litTerm(lit(lex),
        lit(if (e.asInstanceOf[NumLit].isDouble) Quad.xsd.double else Quad.xsd.integer),
        nullStr)
    case BoolLit(b) =>
      litTerm(lit(if (b) "true" else "false"), lit(Quad.xsd.boolean), nullStr)
    case ArithE(_, _, _) =>
      // numeric result; lexical form via Spark's double→string cast
      litTerm(numValueOf(e).cast("string"), lit(Quad.xsd.double), nullStr)
    case StrE(a) => litTerm(valueOf(a), nullStr, nullStr)
    case UcaseE(a) => litTerm(upper(valueOf(a)), nullStr, nullStr)
    case SubstrE(a, start, len) =>
      val s = valueOf(a)
      val from = numValueOf(start).cast("int")
      val sub = len match {
        case Some(l) => s.substr(from, numValueOf(l).cast("int"))
        case None => s.substr(from, length(s))
      }
      litTerm(sub, nullStr, nullStr)
    case StrBeforeE(a, sep) =>
      val s = valueOf(a)
      val pos = instr(s, sep)
      litTerm(when(s.isNull, nullStr)
        .when(pos > 0, s.substr(lit(1), pos - 1))
        .otherwise(lit("")), nullStr, nullStr)
    case CoalesceE(args) => coalesce(args.map(compileExpr): _*)
    case NumFnE(fn, a) =>
      val v = numValueOf(a)
      val r = fn match {
        case "ABS" => abs(v)
        case "ROUND" => round(v, 0)
        case "CEIL" => ceil(v).cast("double")
        case "FLOOR" => floor(v).cast("double")
        case other => throw new IllegalArgumentException(s"numeric fn $other")
      }
      litTerm(r.cast("string"), lit(Quad.xsd.double), nullStr)
    case HashE(fn, a) =>
      val v = valueOf(a)
      val h = fn match {
        case "SHA1" => sha1(v)
        case "SHA256" => sha2(v, 256)
        case "SHA384" => sha2(v, 384)
        case "SHA512" => sha2(v, 512)
        case other => throw new IllegalArgumentException(s"hash fn $other")
      }
      litTerm(h, nullStr, nullStr)
    case DtFnE(fn, a) => compileDtFn(fn, valueOf(a))
    case NowE =>
      // Spark evaluates current_timestamp once per query — exactly
      // SPARQL's "same value for the whole query execution"
      litTerm(date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
        lit(Quad.xsd.dateTime), nullStr)
    case UuidE(asIri) =>
      if (asIri) iriTerm(concat(lit("urn:uuid:"), expr("uuid()")))
      else litTerm(expr("uuid()"), nullStr, nullStr)
    case RandE =>
      litTerm(rand().cast("string"), lit(Quad.xsd.double), nullStr)
    case BNodeE(arg) =>
      val label = arg match {
        // stable per lexical argument (md5 keeps it deterministic and
        // collision-safe at bnode-label granularity); unbound arg
        // null-propagates to an unbound result
        case Some(a) => concat(lit(Quad.BnodePrefix + "b"), md5(valueOf(a)))
        case None => concat(lit(Quad.BnodePrefix + "f"),
          expr("replace(uuid(), '-', '')"))
      }
      term(label, lit(Quad.KindBnode), nullStr, nullStr)
    case ExistsE(_, _) => throw new IllegalArgumentException(
      "EXISTS is only supported as a whole FILTER constraint")
    case AggE(_, _, _) => throw new IllegalArgumentException(
      "aggregate expressions are only valid in HAVING")
    case LangE(a) =>
      litTerm(coalesce(compileExpr(a).getField("lg"), lit("")), nullStr, nullStr)
    case DatatypeE(a) =>
      val t = compileExpr(a)
      // plain literal → xsd:string per RDF 1.1; IRIs/bnodes → unbound
      litTerm(when(t.getField("k") === Quad.KindLiteral,
        coalesce(t.getField("dt"), lit(Quad.xsd.string))), nullStr, nullStr)
    case StrLenE(a) =>
      litTerm(length(valueOf(a)).cast("string"), lit(Quad.xsd.integer), nullStr)
    case StrDtE(a, dt) => litTerm(valueOf(a), valueOf(dt), nullStr)
    case BoundE(_) | StrStartsE(_, _) | CmpE(_, _, _) | AndE(_, _) | OrE(_, _) |
         NotE(_) | InE(_, _, _) | RegexE(_, _, _) | ContainsE(_, _) |
         StrEndsE(_, _) | IsIriE(_) | IsLiteralE(_) | IsBlankE(_) |
         LangMatchesE(_, _) | SameTermE(_, _) | IsNumericE(_) =>
      // boolean expr used in term position (e.g. BIND(?a > ?b AS ?x))
      litTerm(when(compileBool(e), lit("true")).otherwise(lit("false")),
        lit(Quad.xsd.boolean), nullStr)
  }

  /** xsd:dateTime lexical shape (§17.4.5): date, time with optional
    * fractional seconds, optional timezone (Z or ±HH:MM). Extraction is
    * pure string work — the accessor semantics are over the WRITTEN form
    * (a "+02:00" dateTime keeps its own wall-clock fields), so a cast
    * through Spark's session-zoned TimestampType would be wrong. */
  private val dtPat =
    "^(-?\\d{4,})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2}(?:\\.\\d+)?)(Z|[+-]\\d{2}:\\d{2})?$"

  private def compileDtFn(fn: String, lex: Column): Column = {
    def g(i: Int) = regexp_extract(lex, dtPat, i)
    // "" on no-match; try_cast turns that into null = error-as-unbound
    def intField(i: Int) =
      litTerm(g(i).try_cast("int").cast("string"), lit(Quad.xsd.integer), nullStr)
    fn match {
      case "YEAR" => intField(1)
      case "MONTH" => intField(2)
      case "DAY" => intField(3)
      case "HOURS" => intField(4)
      case "MINUTES" => intField(5)
      case "SECONDS" =>
        // xsd:decimal per spec; canonicalized through double so "13" and
        // "13.0" agree ("13.815" keeps its fraction)
        litTerm(g(6).try_cast("double").cast("string"),
          lit(Quad.xsd.decimal), nullStr)
      case "TZ" =>
        // simple literal: offset text, "" when the dateTime has none;
        // unbound only when the whole lexical form is malformed
        litTerm(when(lex.rlike(dtPat), g(7)), nullStr, nullStr)
      case "TIMEZONE" =>
        // canonical xsd:dayTimeDuration of the offset; absent ⇒ unbound
        val tz = g(7)
        val hh = substring(tz, 2, 2).try_cast("int")
        val mm = substring(tz, 5, 2).try_cast("int")
        val sign = when(tz.startsWith("-"), lit("-")).otherwise(lit(""))
        val dur = when(tz === "Z" || (hh === 0 && mm === 0), lit("PT0S"))
          .when(tz === "" || tz.isNull, lit(null).cast("string"))
          .otherwise(concat(sign, lit("PT"),
            when(hh > 0, concat(hh.cast("string"), lit("H"))).otherwise(lit("")),
            when(mm > 0, concat(mm.cast("string"), lit("M"))).otherwise(lit(""))))
        litTerm(dur, lit(Quad.xsd.dayTimeDuration), nullStr)
      case other => throw new IllegalArgumentException(s"datetime fn $other")
    }
  }

  private def substring_index_after(s: Column, pos: Column, sep: String): Column =
    s.substr(pos + lit(sep.length), length(s))

  /** Boolean-valued expressions (filters / IF conditions). Every boolean
    * Algebra node terminates here — no fall-through back to compileExpr
    * for these shapes, so the two functions cannot mutually recurse. */
  private[sparql] def compileBool(e: Expr): Column = e match {
    case BoundE(v) => col(v).isNotNull
    case BoolLit(b) => lit(b)
    case StrStartsE(a, p) => valueOf(a).startsWith(valueOf(p))
    case StrEndsE(a, s) => valueOf(a).endsWith(valueOf(s))
    case ContainsE(a, s) => valueOf(a).contains(valueOf(s))
    case RegexE(a, pattern, flags) =>
      // XPath flag subset: `i` → Java embedded case-insensitivity
      val p = if (flags != null && flags.contains("i")) "(?i)" + pattern else pattern
      valueOf(a).rlike(p)
    case AndE(l, r) => compileBool(l) && compileBool(r)
    case OrE(l, r) => compileBool(l) || compileBool(r)
    case NotE(x) => !compileBool(x)
    case CmpE(op, l, r) => compileCmp(op, l, r)
    case InE(x, terms, negated) =>
      // SPARQL §17.4.1.9: IN == chained `=`; same numeric-vs-lexical
      // promotion per member as a standalone comparison
      val any = terms.map(t => compileCmp("=", x, t)).reduce(_ || _)
      if (negated) !any else any
    case IsIriE(a) => compileExpr(a).getField("k") === Quad.KindIri
    case IsLiteralE(a) => compileExpr(a).getField("k") === Quad.KindLiteral
    case IsBlankE(a) => compileExpr(a).getField("k") === Quad.KindBnode
    case IsNumericE(a) =>
      // the full XSD numeric hierarchy (externally loaded TTL/RDF-XML can
      // carry xsd:float/long/int/... even though the engine only mints
      // integer/double/decimal); non-literal kinds and plain/string
      // literals are false per §17.4.2.4. A plain literal's dt is NULL —
      // isin would three-value to NULL and a negated filter would drop
      // the row, so pin it to false.
      val t = compileExpr(a)
      t.getField("k") === Quad.KindLiteral &&
        coalesce(t.getField("dt").isin(Quad.xsd.numericTypes: _*), lit(false))
    case LangMatchesE(tagE, rangeE) =>
      // §17.4.3.1 basic language range: "*" matches any non-empty tag;
      // otherwise case-insensitive equality or a hyphen-extended prefix
      // ("fr" matches "fr-BE"). LANG() yields "" for untagged literals,
      // which matches nothing but "" itself — per spec.
      val t = lower(valueOf(tagE))
      val r = lower(valueOf(rangeE))
      when(r === "*", t =!= "")
        .otherwise(t === r || t.startsWith(concat(r, lit("-"))))
    case SameTermE(l, r) =>
      // struct comparison is field-wise with null==null — exactly RDF
      // term identity over (value, kind, datatype, lang)
      compileExpr(l) === compileExpr(r)
    case IfE(c, t, f) =>
      when(compileBool(c), compileBool(t)).otherwise(compileBool(f))
    case other =>
      // truthy literal — effective boolean value of a term expression
      valueOf(other) === lit("true")
  }

  /** Comparison with SPARQL §17.3 operator promotion: numeric comparison
    * when either side is statically numeric (a variable's lexical form is
    * then cast to double — non-numeric lexical forms become null, i.e.
    * type-error-as-unbound, which drops the row in a FILTER); plain
    * lexical comparison otherwise. */
  private def compileCmp(op: String, l: Expr, r: Expr): Column = {
    val (a, b) =
      if (isNumericExpr(l) || isNumericExpr(r)) (numValueOf(l), numValueOf(r))
      else (valueOf(l), valueOf(r))
    op match {
      case "=" => a === b
      case "!=" => a =!= b
      case "<" => a < b
      case "<=" => a <= b
      case ">" => a > b
      case ">=" => a >= b
      case other => throw new IllegalArgumentException(s"comparison op $other")
    }
  }

  private def isNumericExpr(e: Expr): Boolean = e match {
    case NumLit(_) | ArithE(_, _, _) | StrLenE(_) => true
    case TypedLit(_, dt) => dt == Quad.xsd.integer || dt == Quad.xsd.double
    case IfE(_, t, f) => isNumericExpr(t) && isNumericExpr(f)
    case _ => false
  }

  /** Numeric value of an expression: its lexical form try_cast to double
    * — null for non-numeric forms, i.e. SPARQL type error → unbound
    * (a plain cast would THROW under Spark's ANSI mode). ArithE recurses
    * directly so nested arithmetic stays in the double domain instead of
    * round-tripping through a string literal. */
  private[sparql] def numValueOf(e: Expr): Column = e match {
    case NumLit(lex) => lit(lex.toDouble)
    case StrLenE(a) => length(valueOf(a)).cast("double")
    case ArithE(op, l, r) =>
      val (a, b) = (numValueOf(l), numValueOf(r))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        // ANSI mode raises DIVIDE_BY_ZERO; SPARQL wants type error → unbound
        case "/" => when(b =!= 0.0, a / b)
        case other => throw new IllegalArgumentException(s"arithmetic op $other")
      }
    case other => valueOf(other).try_cast("double")
  }

  /** Lexical value of an expression (the `v` field of its term). */
  private def valueOf(e: Expr): Column = e match {
    case VarRef(n) => col(n).getField("v")
    case StrLit(s) => lit(s)
    case TypedLit(v, _) => lit(v)
    case other => compileExpr(other).getField("v")
  }

  // ---------------------------------------------------------- templates

  /** INSERT template → quads. Rows with any unbound slot are skipped per
    * template triple; the rest of the template still inserts (Q10).
    *
    * Compiled as ONE pass over the bindings: each template triple becomes
    * a struct in an `explode(array(...))` projection — not one DataFrame
    * union branch per triple, which would re-execute the whole join tree
    * once per template triple (a 14-triple template = 14× the work and an
    * unplannable physical plan at scale). */
  /** Template slot → term-struct column (shared by the triple- and
    * quad-template instantiators). */
  private def templateTerm(n: Node, position: String): Column = n match {
    case V(name) => col(name)
    case I(iri) => iriTerm(lit(iri))
    case L(v, dt, lang) if position == "o" =>
      litTerm(lit(v), Option(dt).map(lit).getOrElse(nullStr),
        Option(lang).map(lit).getOrElse(nullStr))
    case _ => throw new IllegalArgumentException(s"literal in $position slot")
  }

  private def templateQuadStruct(tp: TriplePattern): Column = {
    val s = templateTerm(tp.s, "s")
    val p = templateTerm(tp.p, "p")
    val o = templateTerm(tp.o, "o")
    struct(
      s.getField("v").as("s"),
      p.getField("v").as("p"),
      o.getField("v").as("o_value"),
      o.getField("dt").as("o_type"),
      o.getField("lg").as("o_lang"),
      o.getField("k").as("o_kind"))
  }

  private[sparql] def instantiate(
      bindings: DataFrame, template: Seq[TriplePattern], targetGraph: String): DataFrame =
    bindings
      .select(explode(array(template.map(templateQuadStruct): _*)).as("q"))
      .select(lit(targetGraph).as("graph"), col("q.*"))
      .where(col("s").isNotNull && col("p").isNotNull && col("o_value").isNotNull)
      .dropDuplicates()

  /** Quad-template instantiation (§3.1.3 QuadPattern): each template
    * triple carries its own graph term. Constants inline; a VARIABLE
    * graph slot takes the binding's lexical value, and rows whose graph
    * binding is unbound or not an IRI are skipped — graph names are
    * IRIs, the same skip rule unbound template slots follow (Q10). */
  def instantiateQuads(bindings: DataFrame,
      template: Seq[(Node, TriplePattern)]): DataFrame = {
    val quadStructs = template.map { case (g, tp) =>
      val (gv, gk) = g match {
        case I(iri) => (lit(iri), lit(Quad.KindIri))
        case V(name) =>
          (col(name).getField("v"), col(name).getField("k"))
        case other =>
          throw new IllegalArgumentException(s"graph term $other")
      }
      struct(gv.as("graph"), gk.as("g_kind"),
        templateQuadStruct(tp).as("t"))
    }
    bindings
      .select(explode(array(quadStructs: _*)).as("q"))
      .select(col("q.graph").as("graph"), col("q.g_kind").as("g_kind"),
        col("q.t.*"))
      .where(col("graph").isNotNull && col("g_kind") === Quad.KindIri &&
        col("s").isNotNull && col("p").isNotNull && col("o_value").isNotNull)
      .drop("g_kind")
      .dropDuplicates()
  }

  // ------------------------------------------------------------ running

  /** Run a mapping query against the USING-scoped quads, returning the
    * quads its template produces (not yet merged into a store). */
  /** Per-operation dict-mode prep (no-op in string mode): batch the
    * query's constant-id lookups — one filtered dict scan for the whole
    * WHERE tree instead of a tiny job per constant — and run the
    * variable-usage analysis that lets pattern-block flushes drop dead
    * join-glue vars instead of decoding them. `needs` = the variables
    * the operation's output consumes; None = keep everything (callers
    * that instantiate templates the compiler can't see). Usage is set
    * by the FIRST entry point only, so a subquery compiled mid-group
    * never overwrites the whole-operation analysis. */
  private def prepare(g: Group, needs: Option[Set[String]]): Unit =
    DictContext.current.value.foreach { ctx =>
      ctx.preload(DictContext.constantTerms(g))
      ctx.setUsageIfUnset(needs.flatMap(n => DictContext.usageOf(g, n)))
    }

  /** [[prepare]] for a SELECT: wrapping the query as a subselect lets
    * [[DictContext.usageOf]]'s own clause walker collect projection/
    * group/order/having needs (and bail to keep-everything on `*`). */
  private def prepareSelect(q: SelectQuery): Unit =
    DictContext.current.value.foreach { ctx =>
      ctx.preload(DictContext.constantTerms(q.where))
      ctx.setUsageIfUnset(
        DictContext.usageOf(Group(Seq(SubSelectE(q))), Set.empty))
    }

  def run(query: MappingQuery, scopedQuads: DataFrame,
      namedQuads: Option[DataFrame] = None): DataFrame = {
    prepare(query.where, Some(query.template.flatMap(_.vars).toSet))
    val bindings = compileGroup(scopedQuads, query.where, None, namedQuads)
    instantiate(bindings, query.template, query.targetGraph)
  }

  /** The WHERE group's binding table (for callers that instantiate more
    * than one template from one evaluation — DELETE/INSERT WHERE). */
  def bindingsOf(where: Group, scopedQuads: DataFrame,
      namedQuads: Option[DataFrame] = None): DataFrame = {
    prepare(where, None) // templates invisible here — keep every var
    compileGroup(scopedQuads, where, None, namedQuads)
  }

  /** Public face of [[instantiate]] for multi-template updates. */
  def instantiateTemplate(bindings: DataFrame, template: Seq[TriplePattern],
      targetGraph: String): DataFrame =
    instantiate(bindings, template, targetGraph)

  /** DESCRIBE: the concise bounded description of one IRI — its
    * triples, plus (bounded-depth) the triples of blank nodes reached
    * through object position, which have no addressable name of their
    * own. Each round is one equi-join on subject. */
  def runDescribe(iri: String, scopedQuads: DataFrame): DataFrame = {
    val spark = scopedQuads.sparkSession
    import spark.implicits._
    runDescribeSeeded(Seq(iri).toDF("s"), scopedQuads)
  }

  /** DESCRIBE ?v WHERE { ... }: describe every IRI/bnode the group
    * binds to the target var. One group evaluation seeds the same
    * bounded-closure walk the constant form uses. */
  def runDescribeQuery(q: DescribeQuery, scopedQuads: DataFrame,
      namedQuads: Option[DataFrame] = None): DataFrame = q.target match {
    case I(iri) => runDescribe(iri, scopedQuads)
    case V(name) =>
      val bindings = compileGroup(scopedQuads,
        q.where.getOrElse(throw new IllegalArgumentException(
          "DESCRIBE ?var needs a WHERE group")), None, namedQuads)
      val seed = bindings
        .where(col(name).getField("k").isin(Quad.KindIri, Quad.KindBnode))
        .select(col(name).getField("v").as("s")).dropDuplicates()
      runDescribeSeeded(seed, scopedQuads)
    case L(_, _, _) =>
      throw new IllegalArgumentException("cannot DESCRIBE a literal")
  }

  private def runDescribeSeeded(seed: DataFrame,
      scopedQuads: DataFrame): DataFrame = {
    var subjects = seed.localCheckpoint()
    var described = scopedQuads.join(subjects, "s")
    var rounds = 0
    var newCount = 1L
    while (newCount > 0 && rounds < 8) {
      val bnodes = described.where(col("o_kind") === Quad.KindBnode)
        .select(col("o_value").as("s")).dropDuplicates()
        .join(subjects, Seq("s"), "left_anti").localCheckpoint()
      newCount = bnodes.count()
      if (newCount > 0) {
        subjects = subjects.unionAll(bnodes).localCheckpoint()
        described = scopedQuads.join(subjects, "s")
      }
      rounds += 1
    }
    described
  }

  /** Run a SELECT against the FROM-scoped quads. Result columns are the
    * projected variables' term VALUES (IRI or literal lexical form) —
    * the shape a DataFrame consumer wants; kind/datatype stay internal —
    * while aggregate columns come back NATIVE (long counts, double
    * sums), which is what a DataFrame consumer of an analytics query
    * wants. DISTINCT / GROUP BY / ORDER / LIMIT compile to
    * dropDuplicates / groupBy-agg (partial map-side combine for free) /
    * orderBy / limit, so Catalyst plans them (a LIMIT under ORDER BY
    * becomes TakeOrderedAndProject — no global sort materializes). */
  def runSelect(query0: SelectQuery, scopedQuads: DataFrame,
      namedQuads: Option[DataFrame] = None): DataFrame = {
    // trailing VALUES (§18.2.4.3): for a plain query the join with the
    // solutions commutes into the WHERE group (and UNDEF-tolerant join
    // machinery already lives there); aggregate queries join after
    // grouping/HAVING below, per the spec's operator order
    val query = query0.trailingValues match {
      case Some(v) if query0.aggs.isEmpty =>
        query0.copy(where = Group(query0.where.elems :+ v))
      case _ => query0
    }
    prepareSelect(query)
    val bindings = compileGroup(scopedQuads, query.where, None, namedQuads)
    // A query is GROUPED when it has projected aggregates, a GROUP BY, or
    // a HAVING (the latter two force grouping even with zero projected
    // aggregates, §11.4 — routing them to the plain branch would silently
    // drop both, returning ungrouped unfiltered rows)
    val isGrouped =
      query.aggs.nonEmpty || query.groupBy.nonEmpty || query.having.nonEmpty
    var out: DataFrame =
      if (!isGrouped) {
        // (expr AS ?v) projections compute like BIND, then project the
        // lexical value with everything else
        val withExprs = query.projection
          .collect { case PExpr(e, as) => (e, as) }
          .foldLeft(bindings) { case (df, (e, as)) =>
            df.withColumn(as, compileExpr(e))
          }
        val names =
          if (query.projection.nonEmpty) query.projection.collect {
            case PVar(n) => n
            case PExpr(_, as) => as
          }
          else bindings.columns.toSeq.sorted // SELECT *: every bound variable
        withExprs.select(names.map(v => col(v).getField("v").as(v)): _*)
      } else {
        val (havingRw, hiddenAggs) = extractHavingAggs(query.having)
        val allAggs = query.aggs ++ hiddenAggs
        val aggCols = allAggs.map(compileAgg)
        val aggAliases = allAggs.map(_.as).toSet
        val grouped =
          if (aggCols.isEmpty) {
            // GROUP BY with zero aggregate columns anywhere (projection or
            // HAVING): grouping just collapses each group to one key row
            if (query.groupBy.isEmpty) throw new IllegalArgumentException(
              "HAVING without GROUP BY or any aggregate is not a grouped query")
            bindings.select(query.groupBy.map(col): _*).dropDuplicates()
          }
          else if (query.groupBy.isEmpty) bindings.agg(aggCols.head, aggCols.tail: _*)
          else bindings.groupBy(query.groupBy.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
        val postHaving =
          havingRw.fold(grouped)(h => grouped.where(havingBool(h, aggAliases)))
        // aggregate query + trailing VALUES: join the grouped solutions
        // with the data block (UNDEF rows are null → compatible-with-any)
        val havinged = query.trailingValues match {
          case None => postHaving
          case Some(v) =>
            val vt = compileGroup(scopedQuads, Group(Seq(v)), None, namedQuads)
            val shared = vt.columns.toSeq.intersect(postHaving.columns.toSeq)
            if (shared.isEmpty) postHaving.crossJoin(vt)
            else {
              val vtr = shared.foldLeft(vt)((d, c) =>
                d.withColumnRenamed(c, "_tv_" + c))
              val cond = shared.map(c =>
                col("_tv_" + c).isNull || col("_tv_" + c) === col(c)).reduce(_ && _)
              postHaving.join(vtr, cond).drop(shared.map("_tv_" + _): _*)
            }
        }
        havinged.select(query.projection.map {
          case PVar(n) =>
            if (!query.groupBy.contains(n))
              throw new IllegalArgumentException(
                s"?$n is projected but neither grouped nor aggregated")
            col(n).getField("v").as(n)
          case PAgg(_, _, _, as, _) => col(as)
          case PExpr(e, as) =>
            // grouped-query projection expression: legal over grouped
            // vars only (they survive the agg as term structs)
            compileExpr(e).getField("v").as(as)
        }: _*)
      }
    if (query.distinct) out = out.dropDuplicates()
    if (query.orderBy.nonEmpty)
      out = out.orderBy(query.orderBy.map(k =>
        if (k.asc) col(k.v).asc else col(k.v).desc): _*)
    query.offset.foreach(n => out = out.offset(n))
    query.limit.foreach(n => out = out.limit(n))
    out
  }

  /** Full-term SELECT execution: same pipeline as [[runSelect]] but the
    * result keeps complete `(v, k, dt, lg)` term structs — aggregates
    * wrapped back into typed literals — which is what the W3C results
    * serializers ([[SparqlResults]]) need to emit `"type"`/`"datatype"`
    * /`"xml:lang"` faithfully. */
  def runSelectTerms(query: SelectQuery, scopedQuads: DataFrame,
      namedQuads: Option[DataFrame] = None): DataFrame =
    compileSubSelect(query, scopedQuads, namedQuads)

  /** `{ SELECT ... }` subquery → binding table in TERM-STRUCT form (so
    * the enclosing group joins it like any other element). Plain vars
    * pass through as structs; aggregate aliases are wrapped back into
    * typed literals (COUNT → xsd:integer, SUM/AVG → xsd:double, MIN/
    * MAX/SAMPLE → plain literal of the lexical form). */
  private def compileSubSelect(query: SelectQuery, quads: DataFrame,
      namedQuads: Option[DataFrame] = None): DataFrame = {
    prepareSelect(query)
    val bindings = compileGroup(quads, query.where, None, namedQuads)
    var out: DataFrame =
      if (query.aggs.isEmpty && query.groupBy.isEmpty && query.having.isEmpty) {
        val withExprs = query.projection
          .collect { case PExpr(e, as) => (e, as) }
          .foldLeft(bindings) { case (df, (e, as)) =>
            df.withColumn(as, compileExpr(e))
          }
        val names =
          if (query.projection.nonEmpty) query.projection.collect {
            case PVar(n) => n
            case PExpr(_, as) => as
          }
          else bindings.columns.toSeq.sorted
        withExprs.select(names.map(col): _*)
      } else {
        val (havingRw, hiddenAggs) = extractHavingAggs(query.having)
        val allAggs = query.aggs ++ hiddenAggs
        val aggCols = allAggs.map(compileAgg)
        val aggAliases = allAggs.map(_.as).toSet
        val grouped =
          if (aggCols.isEmpty) {
            if (query.groupBy.isEmpty) throw new IllegalArgumentException(
              "HAVING without GROUP BY or any aggregate is not a grouped query")
            bindings.select(query.groupBy.map(col): _*).dropDuplicates()
          }
          else if (query.groupBy.isEmpty) bindings.agg(aggCols.head, aggCols.tail: _*)
          else bindings.groupBy(query.groupBy.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
        val havinged =
          havingRw.fold(grouped)(h => grouped.where(havingBool(h, aggAliases)))
        havinged.select(query.projection.map {
          case PVar(n) => col(n)
          case PAgg(fn, _, _, as, _) =>
            val dt = fn match {
              case "COUNT" => Quad.xsd.integer
              case "SUM" | "AVG" => Quad.xsd.double
              case _ => null
            }
            litTerm(col(as).cast("string"),
              Option(dt).map(lit).getOrElse(nullStr), nullStr).as(as)
        }: _*)
      }
    if (query.distinct) out = out.dropDuplicates()
    // ORDER in a subquery only matters under LIMIT/OFFSET; struct sort
    // orders by the leading `v` field, i.e. the lexical form
    if (query.orderBy.nonEmpty)
      out = out.orderBy(query.orderBy.map(k =>
        if (k.asc) col(k.v).asc else col(k.v).desc): _*)
    query.offset.foreach(n => out = out.offset(n))
    query.limit.foreach(n => out = out.limit(n))
    out
  }

  /** SPARQL aggregate → native-typed Spark aggregate. COUNT counts
    * bound terms; SUM/AVG coerce numerically (non-numeric → null →
    * ignored by the agg, SPARQL's error-drop); MIN/MAX/SAMPLE work on
    * the lexical form. */
  private def compileAgg(a: PAgg): Column = (a.fn match {
    case "COUNT" => a.arg match {
      case None => count(lit(1))
      case Some(e) =>
        if (a.distinct) countDistinct(compileExpr(e)) else count(compileExpr(e))
    }
    case "SUM" => sum(numValueOf(a.arg.get))
    case "AVG" => avg(numValueOf(a.arg.get))
    case "MIN" => min(valueOf(a.arg.get))
    case "MAX" => max(valueOf(a.arg.get))
    case "SAMPLE" => first(valueOf(a.arg.get), ignoreNulls = true)
    case "GROUP_CONCAT" =>
      // SPARQL leaves concatenation order undefined; sorting the group's
      // lexical forms makes the result deterministic (and thus testable)
      // on any partitioning — the engine's documented semantics.
      val vals = {
        val v = valueOf(a.arg.get)
        if (a.distinct) collect_set(v) else collect_list(v)
      }
      array_join(array_sort(vals), a.sep.getOrElse(" "))
    case other => throw new IllegalArgumentException(s"aggregate $other")
  }).as(a.as)

  /** HAVING compiles over the NATIVE aggregate alias columns (not term
    * structs) — comparisons, boolean combinators and arithmetic only. */
  /** Inline aggregates in HAVING (§11.5): pull each AggE into a hidden
    * aggregate column (`_hav0`…) and rewrite the expression to reference
    * it — the grouped plan then computes projection + hidden aggregates
    * in ONE aggregation pass and the filter stays a plain post-agg
    * Filter over native columns. */
  private def extractHavingAggs(having: Option[Expr]): (Option[Expr], Seq[PAgg]) = {
    val hidden = scala.collection.mutable.Buffer.empty[PAgg]
    def rw(e: Expr): Expr = e match {
      case AggE(fn, arg, distinct) =>
        val as = s"_hav${hidden.length}"
        hidden += PAgg(fn, arg, distinct, as)
        VarRef(as)
      case CmpE(op, l, r) => CmpE(op, rw(l), rw(r))
      case AndE(l, r) => AndE(rw(l), rw(r))
      case OrE(l, r) => OrE(rw(l), rw(r))
      case NotE(x) => NotE(rw(x))
      case ArithE(op, l, r) => ArithE(op, rw(l), rw(r))
      case other => other
    }
    (having.map(rw), hidden.toSeq)
  }

  private def havingBool(e: Expr, aggAliases: Set[String]): Column =
    e match {
      case CmpE(op, l, r) =>
        val (a, b) = (havingVal(l, aggAliases), havingVal(r, aggAliases))
        op match {
          case "=" => a === b
          case "!=" => a =!= b
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
          case other => throw new IllegalArgumentException(s"comparison $other")
        }
      case AndE(l, r) => havingBool(l, aggAliases) && havingBool(r, aggAliases)
      case OrE(l, r) => havingBool(l, aggAliases) || havingBool(r, aggAliases)
      case NotE(x) => !havingBool(x, aggAliases)
      case other =>
        throw new IllegalArgumentException(s"unsupported HAVING shape: $other")
    }

  private def havingVal(e: Expr, aggAliases: Set[String]): Column =
    e match {
      case VarRef(n) if aggAliases(n) =>
        col(n) // an aggregate alias — already native
      case VarRef(n) =>
        // a GROUPED variable referenced in HAVING: its column is still a
        // term struct; HAVING comparisons are numeric, so take the
        // lexical form's numeric value (non-numeric → null → filtered)
        col(n).getField("v").cast("double")
      case NumLit(lex) => lit(lex.toDouble)
      case StrLit(s) => lit(s)
      case ArithE(op, l, r) =>
        val (a, b) = (havingVal(l, aggAliases), havingVal(r, aggAliases))
        op match {
          case "+" => a + b; case "-" => a - b
          case "*" => a * b; case "/" => when(b =!= 0.0, a / b)
          case other => throw new IllegalArgumentException(s"arith $other")
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported HAVING operand: $other")
    }

  /** ASK: does any solution exist. LIMIT 1 keeps the scan short-
    * circuiting — Spark stops producing once one row is collected. */
  def runAsk(query: AskQuery, scopedQuads: DataFrame,
      namedQuads: Option[DataFrame] = None): Boolean = {
    prepare(query.where, Some(Set.empty)) // existence only — every var is glue
    compileGroup(scopedQuads, query.where, None, namedQuads)
      .limit(1).count() > 0
  }

  /** CONSTRUCT: instantiate the template per solution; emitted quads
    * carry `targetGraph` (CONSTRUCT results are a graph value, not a
    * store write — callers pick the name). */
  def runConstruct(query: ConstructQuery, scopedQuads: DataFrame,
      targetGraph: String,
      namedQuads: Option[DataFrame] = None): DataFrame = {
    prepare(query.where, Some(query.template.flatMap(_.vars).toSet))
    instantiate(compileGroup(scopedQuads, query.where, None, namedQuads),
      query.template, targetGraph)
  }
}
