package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Knowledge-graph inference and curation operators the reference's
  * Stardog backend provides natively and the engine must therefore own:
  * RDFS forward-chaining materialization (the `reasoning=true` query
  * flag in Stardog — here a one-pass stratified materializer), owl:sameAs
  * canonicalization ("smushing" — the entity-resolution step every
  * multi-source KG like the reference's LDAP+Teamleader+MAM merge
  * needs), SHACL-style constraint validation (the data-quality gate an
  * ETL pipeline runs before promoting staging graphs,
  * `/root/reference/airflow_files/dags/load_knowledge_graph.py:386-617`
  * promotes without one), and named-graph diff (the sync primitive for
  * incremental reloads of the source graphs at `:269-334`).
  *
  * Scale design, common to all four: the SCHEMA (ontology edges, shape
  * definitions) is vocabulary-sized — KBs against the instance data's
  * TBs — so every operator computes schema closures on the tiny schema
  * frame only (bounded path-doubling fixpoint) and then applies them to
  * instance data with ONE broadcast join pass. No rule iterates over
  * instance-sized data; sameAs components use the same bounded
  * min-label propagation as [[Dedup.clusterAssign]] (alias cliques are
  * shallow), and diff/validation are single anti-join / aggregation
  * passes.
  */
object Inference {

  private val ns = "http://localhost/"
  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val rdfsNs = "http://www.w3.org/2000/01/rdf-schema#"
  val SubClassOf: String = rdfsNs + "subClassOf"
  val SubPropertyOf: String = rdfsNs + "subPropertyOf"
  val Domain: String = rdfsNs + "domain"
  val Range: String = rdfsNs + "range"

  private val T = ns + "type/" // classes minted from event_type values
  private val C = ns + "cls/"  // ontology-level classes

  // ---------------------------------------------------------------------
  // RDFS materialization
  // ---------------------------------------------------------------------

  /** Strict transitive closure of a tiny (a, b) edge frame by path
    * doubling: P := P ∪ P⋈P until the row count stops growing. Runs on
    * the SCHEMA frame only (vocabulary-sized by assumption — the
    * standard reasoner contract; Jena/Stardog hold the TBox in memory
    * for the same reason), so each round is a sub-second job and depth-d
    * hierarchies converge in ⌈log2 d⌉ rounds. localCheckpoint per round
    * truncates the doubling lineage (the iterative-DataFrame pitfall —
    * see [[Dedup.clusterAssign]]). */
  def transitiveClosure(edges: DataFrame): DataFrame = {
    var paths = edges.select(col("a"), col("b")).distinct().localCheckpoint()
    var n = paths.count()
    var growing = true
    var rounds = 0
    while (growing && rounds < 8) {
      val next = paths.union(
        paths.as("l").join(paths.as("r"), col("l.b") === col("r.a"))
          .select(col("l.a").as("a"), col("r.b").as("b")))
        .distinct().localCheckpoint()
      val m = next.count()
      if (m == n) growing = false
      else { paths = next; n = m; rounds += 1 }
    }
    paths
  }

  /** Incremental transitive closure: `closure(base ∪ delta)` from a
    * PRECOMPUTED `closure(base)` without re-closing the base — the
    * semi-naive shape that keeps hierarchy maintenance O(delta·reach)
    * when a batch of edges arrives. Every new path alternates base
    * segments and delta edges, i.e. is in `(C? Δ)+ C?` — so D₁ =
    * C?·Δ·C? (one-delta paths, three broadcast-friendly joins against
    * the small delta) seeds a path-doubling loop whose composition
    * absorbs the shared middle C? (C?∘C? = C? by transitivity), and the
    * answer is C ∪ D⁺. The base closure is never iterated over. */
  def incrementalClosure(baseClosure: DataFrame, delta: DataFrame): DataFrame = {
    def compose(x: DataFrame, y: DataFrame): DataFrame =
      x.as("l").join(y.as("r"), col("l.b") === col("r.a"))
        .select(col("l.a").as("a"), col("r.b").as("b"))
    val c = baseClosure.select(col("a"), col("b"))
    val d0 = delta.select(col("a"), col("b")).distinct()
    // D1 = Δ ∪ CΔ ∪ ΔC ∪ CΔC (C? = C ∪ identity, expanded)
    var d = d0.union(compose(c, d0)).union(compose(d0, c))
      .union(compose(compose(c, d0), c))
      .distinct().localCheckpoint()
    var n = d.count()
    var growing = true
    var rounds = 0
    while (growing && rounds < 8) {
      val next = d.union(compose(d, d)).distinct().localCheckpoint()
      val m = next.count()
      if (m == n) growing = false
      else { d = next; n = m; rounds += 1 }
    }
    c.union(d).distinct()
  }

  /** One-pass stratified RDFS materialization over a statement frame
    * `(s, p, o, kind)` that carries both schema triples (subClassOf /
    * subPropertyOf / domain / range) and instance triples.
    *
    * Rule order: rdfs5+7 (subPropertyOf closure, applied to instance
    * statements), then rdfs2/3 (domain/range over the property-closed
    * statements — so a domain declared on a superproperty fires for its
    * subproperties), then rdfs9+11 (subClassOf closure over all type
    * triples, including the domain/range-inferred ones). Because no
    * RDFS rule derives a schema triple from an instance triple (no
    * metamodeling), this single stratified pass IS the fixpoint — no
    * instance-sized iteration. Closures are broadcast: the instance
    * side is scanned exactly twice (once for properties, once for
    * types). */
  def rdfsMaterialize(statements: DataFrame): DataFrame = {
    def schema(p: String) = statements.filter(col("p") === p)
      .select(col("s").as("a"), col("o").as("b"))
    val sc = transitiveClosure(schema(SubClassOf))
    val sp = transitiveClosure(schema(SubPropertyOf))
    val dom = schema(Domain).select(col("a").as("dp"), col("b").as("dc"))
    val rng = schema(Range).select(col("a").as("rp"), col("b").as("rc"))

    val schemaPreds = Seq(SubClassOf, SubPropertyOf, Domain, Range)
    val inst = statements.filter(!col("p").isin(schemaPreds: _*))
    val baseProps = inst.filter(col("p") =!= RdfType)

    // rdfs7: (s p o), (p ⊑* q) ⇒ (s q o)
    val superProps = baseProps
      .join(broadcast(sp), baseProps("p") === sp("a"))
      .select(col("s"), col("b").as("p"), col("o"), col("kind"))
    val allProps = baseProps.unionByName(superProps)

    // rdfs2: (s p o), domain(p, c) ⇒ (s type c)
    val domTypes = allProps.join(broadcast(dom), col("p") === col("dp"))
      .select(col("s"), col("dc").as("o"))
    // rdfs3: (s p o), range(p, c), o is IRI ⇒ (o type c)
    val rngTypes = allProps.filter(col("kind") === "iri")
      .join(broadcast(rng), col("p") === col("rp"))
      .select(col("o").as("s"), col("rc").as("o"))

    val baseTypes = inst.filter(col("p") === RdfType).select(col("s"), col("o"))
    val types0 = baseTypes.unionByName(domTypes).unionByName(rngTypes)
    // rdfs9: (s type c), (c ⊑* d) ⇒ (s type d)
    val superTypes = types0.join(broadcast(sc), types0("o") === sc("a"))
      .select(col("s"), col("b").as("o"))
    val allTypes = types0.unionByName(superTypes)
      .select(col("s"), lit(RdfType).as("p"), col("o"), lit("iri").as("kind"))

    allProps.unionByName(allTypes).distinct()
  }

  val OwlInverseOf = "http://www.w3.org/2002/07/owl#inverseOf"
  val OwlSymmetric = "http://www.w3.org/2002/07/owl#SymmetricProperty"
  val OwlTransitive = "http://www.w3.org/2002/07/owl#TransitiveProperty"

  /** OWL property-rule materialization (the owl-horst subset a KG
    * actually uses: inverseOf / SymmetricProperty / TransitiveProperty)
    * over a statement frame `(s, p, o, kind)` carrying both the
    * property schema and instance triples.
    *
    * Stratification: (1) symmetric + inverse expansion (statement-
    * local, broadcast schema); (2) transitive closure per DECLARED
    * transitive predicate over the post-(1) edge set (bounded
    * path-doubling — instance-sized but hierarchy-shaped, the same
    * envelope as the SPARQL path closures); (3) one more inverse pass
    * so a transitive predicate's inverse mirrors its closure. This is
    * the fixpoint provided no predicate is both symmetric and
    * transitive (that combination is an equivalence closure — use
    * [[fuseSameAs]]'s component machinery instead) — asserted loudly. */
  def owlMaterialize(statements: DataFrame): DataFrame = {
    val schemaRows = statements
      .filter(col("p") === OwlInverseOf ||
        (col("p") === RdfType && col("o").isin(OwlSymmetric, OwlTransitive)))
      .collect()
    val inv = schemaRows.filter(_.getString(1) == OwlInverseOf)
      .map(r => (r.getString(0), r.getString(2)))
    val symmetric = schemaRows.filter(r => r.getString(1) == RdfType &&
      r.getString(2) == OwlSymmetric).map(_.getString(0)).toSet
    val transitive = schemaRows.filter(r => r.getString(1) == RdfType &&
      r.getString(2) == OwlTransitive).map(_.getString(0)).toSet
    require(symmetric.intersect(transitive).isEmpty,
      "symmetric+transitive predicates need component fusion, not closure")

    val inst = statements.filter(col("p") =!= OwlInverseOf &&
      !(col("p") === RdfType && col("o").isin(OwlSymmetric, OwlTransitive)))

    def inversePass(df: DataFrame): DataFrame = {
      val flips = inv.flatMap { case (p, q) => Seq((p, q), (q, p)) }
      val flipped = flips.map { case (from, to) =>
        df.filter(col("p") === from)
          .select(col("o").as("s"), lit(to).as("p"), col("s").as("o"),
            lit("iri").as("kind"))
      }
      if (flipped.isEmpty) df else flipped.foldLeft(df)(_ unionByName _)
    }
    val symRows = symmetric.toSeq.sorted.map(p =>
      inst.filter(col("p") === p)
        .select(col("o").as("s"), col("p"), col("s").as("o"),
          lit("iri").as("kind")))
    val pass1 = inversePass(
      symRows.foldLeft(inst)(_ unionByName _)).distinct()

    val closures = transitive.toSeq.sorted.map { p =>
      transitiveClosure(pass1.filter(col("p") === p)
        .select(col("s").as("a"), col("o").as("b")))
        .select(col("a").as("s"), lit(p).as("p"), col("b").as("o"),
          lit("iri").as("kind"))
    }
    val pass2 = closures.foldLeft(pass1)(_ unionByName _)
    inversePass(pass2).distinct()
  }

  /** Fixture for OWL rules over the TPC-H hierarchy: customer ∈ nation
    * ∈ region ∈ world as a TransitiveProperty chain, supplier
    * reports_to nation with a declared inverse, and same-region nation
    * adjacency as a SymmetricProperty. */
  private def owlStatements(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = Seq(
      (ns + "reports_to", OwlInverseOf, ns + "manages"),
      (ns + "connected", RdfType, OwlSymmetric),
      (ns + "parent_org", RdfType, OwlTransitive))
      .toDF("s", "p", "o").withColumn("kind", lit("iri"))
    val parent = ns + "parent_org"
    val cust = Tables.customer(s, d).select(
      concat(lit("urn:c:"), col("c_custkey").cast("string")).as("s"),
      lit(parent).as("p"),
      concat(lit("urn:n:"), col("c_nationkey").cast("string")).as("o"),
      lit("iri").as("kind"))
    val nat = Tables.nation(s, d).select(
      concat(lit("urn:n:"), col("n_nationkey").cast("string")).as("s"),
      lit(parent).as("p"),
      concat(lit("urn:r:"), col("n_regionkey").cast("string")).as("o"),
      lit("iri").as("kind"))
    val reg = Tables.region(s, d).select(
      concat(lit("urn:r:"), col("r_regionkey").cast("string")).as("s"),
      lit(parent).as("p"), lit("urn:world").as("o"), lit("iri").as("kind"))
    val supp = Tables.supplier(s, d).select(
      concat(lit("urn:s:"), col("s_suppkey").cast("string")).as("s"),
      lit(ns + "reports_to").as("p"),
      concat(lit("urn:n:"), col("s_nationkey").cast("string")).as("o"),
      lit("iri").as("kind"))
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("k1"), col("n_regionkey").as("rk"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk"))
    val adj = n1.join(n2, "rk").filter(col("k1") < col("k2"))
      .select(concat(lit("urn:n:"), col("k1").cast("string")).as("s"),
        lit(ns + "connected").as("p"),
        concat(lit("urn:n:"), col("k2").cast("string")).as("o"),
        lit("iri").as("kind"))
    schema.unionByName(cust).unionByName(nat).unionByName(reg)
      .unionByName(supp).unionByName(adj)
  }

  /** Fixture: schema + instance statements derived from `events`. The
    * ontology exercises depth-3 subClassOf chains, a subPropertyOf
    * chain, a domain and a range declaration; instances are one type +
    * one user (IRI object) + one value (literal) triple per event. */
  private def eventStatements(s: SparkSession, d: String): DataFrame =
    eventStatementsSlice(s, d, lit(true))

  /** Id-sliced variant (incremental-materialization fixtures). */
  private def eventStatementsSlice(s: SparkSession, d: String,
      keep: Column): DataFrame = {
    import s.implicits._
    val schema = Seq(
      (T + "purchase", SubClassOf, C + "conversion"),
      (T + "signup", SubClassOf, C + "conversion"),
      (C + "conversion", SubClassOf, C + "interaction"),
      (T + "click", SubClassOf, C + "engagement"),
      (T + "view", SubClassOf, C + "engagement"),
      (C + "engagement", SubClassOf, C + "interaction"),
      (C + "interaction", SubClassOf, C + "event"),
      (T + "error", SubClassOf, C + "event"),
      (ns + "user_id", SubPropertyOf, ns + "actor"),
      (ns + "actor", SubPropertyOf, ns + "participant"),
      (ns + "value", Domain, C + "measured"),
      (ns + "user_id", Range, C + "user"))
      .toDF("s", "p", "o").withColumn("kind", lit("iri"))
    val ev = Tables.events(s, d).filter(keep)
    val subj = concat(lit("urn:ev:"), col("event_id").cast("string"))
    val types = ev.select(subj.as("s"), lit(RdfType).as("p"),
      concat(lit(T), col("event_type")).as("o"), lit("iri").as("kind"))
    val users = ev.filter(col("user_id").isNotNull)
      .select(subj.as("s"), lit(ns + "user_id").as("p"),
        concat(lit("urn:user:"), col("user_id").cast("string")).as("o"),
        lit("iri").as("kind"))
    val values = ev.filter(col("value").isNotNull)
      .select(subj.as("s"), lit(ns + "value").as("p"),
        floor(col("value")).cast("long").cast("string").as("o"),
        lit("literal").as("kind"))
    schema.unionByName(types).unionByName(users).unionByName(values)
  }

  // ---------------------------------------------------------------------
  // owl:sameAs canonicalization (smushing)
  // ---------------------------------------------------------------------

  /** Rewrite every statement onto the canonical member (minimum IRI) of
    * its subject's sameAs component. Components come from the same
    * bounded min-label propagation as near-dup clustering — identity
    * cliques are shallow (an entity has a handful of aliases), so the
    * loop converges in a few single-shuffle rounds; the final
    * alias→canon map is identity-count-sized and broadcast into one
    * rewrite join over the instance data. */
  def fuseSameAs(statements: DataFrame, sameAsEdges: DataFrame): DataFrame = {
    val reps = Dedup.clusterAssign(
      sameAsEdges.select(col("s").as("i"), col("o").as("j")))
    statements.join(broadcast(reps),
        statements("s") === reps("doc_id"), "left")
      .select(coalesce(col("cluster_rep"), statements("s")).as("s"),
        col("p"), col("o"), col("kind"))
  }

  // ---------------------------------------------------------------------
  // SHACL-lite validation
  // ---------------------------------------------------------------------

  /** A property shape over one predicate: cardinality bounds, a closed
    * value set, and a numeric lower bound — the SHACL constraint kinds
    * (sh:minCount / sh:maxCount / sh:in / sh:minInclusive) a
    * load-gate actually uses. */
  final case class PropShape(
      path: String,
      minCount: Option[Int] = None,
      maxCount: Option[Int] = None,
      inSet: Option[Seq[String]] = None,
      minInclusive: Option[Double] = None,
      // sh:nodeKind — required term kind of every value ("iri" /
      // "literal" / "bnode")
      nodeKind: Option[String] = None,
      // sh:pattern — regex every value's lexical form must match
      pattern: Option[String] = None,
      // sh:datatype proxy on the untyped fixture frame: the value must
      // CAST cleanly to this Spark/SQL type ("bigint", "double", ...)
      castsTo: Option[String] = None)

  /** Validate `statements` against `shapes`, with the target set =
    * distinct statement subjects. Every constraint is one declarative
    * pass: cardinality = groupBy(s) count per path joined against the
    * target list (so minCount catches subjects with ZERO values — the
    * anti-join case a naive groupBy misses), sh:in / sh:minInclusive =
    * filters over the path's statements. Returns one row per violated
    * (focus, constraint) with the observed count. */
  def shaclValidate(statements: DataFrame, shapes: Seq[PropShape]): DataFrame = {
    val targets = statements.select(col("s").as("focus")).distinct()
    val reports = shapes.flatMap { sh =>
      val vals = statements.filter(col("p") === sh.path)
      val counts = targets.join(
          vals.groupBy(col("s").as("focus")).agg(count(lit(1)).as("cnt")),
          Seq("focus"), "left")
        .select(col("focus"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val minV = sh.minCount.map(k => counts.filter(col("cnt") < k)
        .select(col("focus"), lit(s"minCount(${short(sh.path)})").as("violation"),
          col("cnt").as("n")))
      val maxV = sh.maxCount.map(k => counts.filter(col("cnt") > k)
        .select(col("focus"), lit(s"maxCount(${short(sh.path)})").as("violation"),
          col("cnt").as("n")))
      val inV = sh.inSet.map(allowed => vals.filter(!col("o").isin(allowed: _*))
        .groupBy(col("s").as("focus"))
        .agg(count(lit(1)).as("n"))
        .select(col("focus"), lit(s"in(${short(sh.path)})").as("violation"),
          col("n")))
      val minIncV = sh.minInclusive.map(lo =>
        vals.filter(col("o").cast("double") < lo)
          .groupBy(col("s").as("focus"))
          .agg(count(lit(1)).as("n"))
          .select(col("focus"), lit(s"minInclusive(${short(sh.path)})").as("violation"),
            col("n")))
      val kindV = sh.nodeKind.map(k =>
        vals.filter(col("kind") =!= k)
          .groupBy(col("s").as("focus"))
          .agg(count(lit(1)).as("n"))
          .select(col("focus"), lit(s"nodeKind(${short(sh.path)})").as("violation"),
            col("n")))
      val patV = sh.pattern.map(re =>
        vals.filter(!col("o").rlike(re))
          .groupBy(col("s").as("focus"))
          .agg(count(lit(1)).as("n"))
          .select(col("focus"), lit(s"pattern(${short(sh.path)})").as("violation"),
            col("n")))
      val castV = sh.castsTo.map(t =>
        vals.filter(col("o").try_cast(t).isNull && col("o").isNotNull)
          .groupBy(col("s").as("focus"))
          .agg(count(lit(1)).as("n"))
          .select(col("focus"), lit(s"datatype(${short(sh.path)})").as("violation"),
            col("n")))
      minV.toSeq ++ maxV ++ inV ++ minIncV ++ kindV ++ patV ++ castV
    }
    reports.reduce(_ unionByName _)
  }

  private def short(iri: String): String = iri.substring(iri.lastIndexOf('/') + 1)

  /** Fixture: event statements with deterministically planted defects
    * (dropped / duplicated user triples, negated values, out-of-set
    * types) so every constraint kind fires; the oracle recomputes the
    * same defects from `events` directly. */
  private def defectiveStatements(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val subj = concat(lit("urn:ev:"), col("event_id").cast("string"))
    val users = ev.filter(col("user_id").isNotNull && pmod(col("event_id"), lit(37)) =!= 0)
      .select(subj.as("s"), lit(ns + "user_id").as("p"),
        concat(lit("urn:user:"), col("user_id").cast("string")).as("o"),
        // planted nodeKind defect: every 61st user value is a literal
        when(pmod(col("event_id"), lit(61)) === 0, "literal")
          .otherwise("iri").as("kind"))
    val dupUsers = ev.filter(pmod(col("event_id"), lit(41)) === 0)
      .select(subj.as("s"), lit(ns + "user_id").as("p"),
        lit("urn:user:dup").as("o"), lit("iri").as("kind"))
    val values = ev.filter(col("value").isNotNull)
      .select(subj.as("s"), lit(ns + "value").as("p"),
        when(pmod(col("event_id"), lit(53)) === 0, -abs(col("value")) - 1)
          .otherwise(col("value")).cast("string").as("o"),
        lit("literal").as("kind"))
    // %67 → UPPERCASED type (pattern + in-set defect, takes precedence),
    // else %59 → out-of-set 'unknown_' prefix (in-set defect only)
    val types = ev.select(subj.as("s"), lit(ns + "etype").as("p"),
      when(pmod(col("event_id"), lit(67)) === 0, upper(col("event_type")))
        .when(pmod(col("event_id"), lit(59)) === 0,
          concat(lit("unknown_"), col("event_type")))
        .otherwise(col("event_type")).as("o"),
      lit("literal").as("kind"))
    // %71 → non-numeric code (datatype defect)
    val codes = ev.select(subj.as("s"), lit(ns + "code").as("p"),
      when(pmod(col("event_id"), lit(71)) === 0,
        concat(lit("x"), col("event_id").cast("string")))
        .otherwise(col("event_id").cast("string")).as("o"),
      lit("literal").as("kind"))
    users.unionByName(dupUsers).unionByName(values).unionByName(types)
      .unionByName(codes)
  }

  // ---------------------------------------------------------------------
  // Named-graph diff
  // ---------------------------------------------------------------------

  /** Statement-level diff between two graph versions: rows only in
    * `after` are adds, rows only in `before` are removes. Two anti-joins
    * on the full statement key — at scale both sides shuffle once on the
    * same key (or co-locate for free when both versions live in the
    * bucketed store layout). */
  def diffGraphs(before: DataFrame, after: DataFrame): DataFrame = {
    val key = Seq("s", "p", "o")
    val added = after.select(key.map(col): _*)
      .join(before.select(key.map(col): _*), key, "left_anti")
      .withColumn("op", lit("add"))
    val removed = before.select(key.map(col): _*)
      .join(after.select(key.map(col): _*), key, "left_anti")
      .withColumn("op", lit("remove"))
    added.unionByName(removed)
  }

  /** Fixture: two versions of the event graph — v2 drops a different
    * id-slice than v1 and rewrites the type of every 11th event — so
    * the diff carries adds, removes, and rewrite pairs. Values are
    * floored to integers so the statement key is format-stable across
    * engines. */
  private def versionedStatements(s: SparkSession, d: String, keepMod: Int,
      migrate: Boolean): DataFrame = {
    val ev = Tables.events(s, d).filter(pmod(col("event_id"), lit(keepMod)) =!= 0)
    val subj = concat(lit("urn:ev:"), col("event_id").cast("string"))
    val etype = if (migrate)
      when(pmod(col("event_id"), lit(11)) === 0, lit("migrated"))
        .otherwise(col("event_type"))
    else col("event_type")
    val types = ev.select(subj.as("s"), lit(ns + "etype").as("p"), etype.as("o"))
    val users = ev.filter(col("user_id").isNotNull)
      .select(subj.as("s"), lit(ns + "user_id").as("p"),
        concat(lit("urn:user:"), col("user_id").cast("string")).as("o"))
    val values = ev.filter(col("value").isNotNull)
      .select(subj.as("s"), lit(ns + "value").as("p"),
        floor(col("value")).cast("long").cast("string").as("o"))
    types.unionByName(users).unionByName(values)
  }

  // ---------------------------------------------------------------------
  // Driver-visible queries
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RDFS entailment, type view: every (instance, class) membership
    // after materialization — base types, domain/range inferences, and
    // their subClassOf super-types — counted per class.
    "rdfs_entailment_types" -> ((s, d) =>
      rdfsMaterialize(eventStatements(s, d))
        .filter(col("p") === RdfType)
        .groupBy(col("o").as("cls"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("cls"))),

    // RDFS entailment, property view: statement counts per predicate
    // after subPropertyOf closure (user_id triples reappear under
    // actor and participant).
    "rdfs_entailment_props" -> ((s, d) =>
      rdfsMaterialize(eventStatements(s, d))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("s")).as("n_subj"))
        .orderBy(col("p"))),

    // O(delta) incremental materialization: RDFS rules are STATEMENT-
    // local (each consumes one instance triple + broadcast schema), so
    // materialize(base ∪ delta) ≡ materialize(base) ∪ materialize(delta)
    // — a new batch infers over batch-sized input only. The oracle is
    // the FULL recompute, so the identity is checked, not assumed.
    "rdfs_incremental" -> ((s, d) => {
      val seventh = pmod(col("event_id"), lit(7))
      val base = rdfsMaterialize(eventStatementsSlice(s, d, seventh =!= 0))
      val delta = rdfsMaterialize(eventStatementsSlice(s, d, seventh === 0))
      base.unionByName(delta).distinct()
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("s")).as("n_subj"))
        .orderBy(col("p"))
    }),

    // Incremental hierarchy maintenance: close the base org hierarchy
    // once, then absorb a delta batch of new membership edges via the
    // semi-naive loop — the result must equal the full closure over
    // ALL edges (the oracle), with the base closure never re-derived.
    "owl_incremental_closure" -> ((s, d) => {
      val third = pmod(col("c_custkey"), lit(3))
      def custEdges(keep: Column) = Tables.customer(s, d).filter(keep)
        .select(concat(lit("urn:c:"), col("c_custkey").cast("string")).as("a"),
          concat(lit("urn:n:"), col("c_nationkey").cast("string")).as("b"))
      val natEdges = Tables.nation(s, d)
        .select(concat(lit("urn:n:"), col("n_nationkey").cast("string")).as("a"),
          concat(lit("urn:r:"), col("n_regionkey").cast("string")).as("b"))
      val regEdges = Tables.region(s, d)
        .select(concat(lit("urn:r:"), col("r_regionkey").cast("string")).as("a"),
          lit("urn:world").as("b"))
      val base = custEdges(third =!= 0).unionByName(natEdges)
        .unionByName(regEdges)
      val full = incrementalClosure(transitiveClosure(base),
        custEdges(third === 0))
      full.groupBy(substring(col("b"), 1, 6).as("target_kind"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("a")).as("n_sources"))
        .orderBy(col("target_kind"))
    }),

    // OWL property rules over the TPC-H hierarchy: transitive
    // parent_org closure (customer→nation→region→world), inverse
    // manages edges mirrored from reports_to, symmetric same-region
    // nation adjacency — per-predicate statement counts.
    "owl_entailment" -> ((s, d) =>
      owlMaterialize(owlStatements(s, d))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("s")).as("n_subj"))
        .orderBy(col("p"))),

    // sameAs smushing: three minted aliases per user joined by a
    // 2-edge sameAs chain; events attach to different aliases by type;
    // after fusing, per-canonical-entity stats must equal the per-user
    // stats computed straight off the relational table.
    "rdf_sameas_fuse" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      val uid = col("user_id").cast("string")
      val u = concat(lit("urn:u:"), uid)
      val acct = concat(lit("urn:acct:"), uid)
      val mail = concat(lit("urn:mail:"), uid)
      val alias = when(col("event_type").isin("purchase", "error"), acct)
        .when(col("event_type").isin("click", "view"), u)
        .otherwise(mail)
      val stmts = ev.select(alias.as("s"), lit(ns + "did").as("p"),
        col("event_type").as("o"), lit("literal").as("kind"))
      val sameAs = ev.select(u.as("s"), acct.as("o"))
        .unionByName(ev.select(acct.as("s"), mail.as("o"))).distinct()
      fuseSameAs(stmts, sameAs)
        .groupBy(col("s").as("canon"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("o")).as("n_types"))
        .orderBy(col("canon"))
    }),

    // SHACL validation report over the planted-defect staging graph:
    // one row per (focus, violated constraint) with the observed count.
    "shacl_report" -> ((s, d) =>
      shaclValidate(defectiveStatements(s, d), Seq(
        PropShape(ns + "user_id", minCount = Some(1), maxCount = Some(1),
          nodeKind = Some("iri")),
        PropShape(ns + "value", minInclusive = Some(0.0)),
        PropShape(ns + "etype",
          inSet = Some(Seq("click", "error", "purchase", "signup", "view")),
          pattern = Some("^[a-z_]+$")),
        PropShape(ns + "code", castsTo = Some("bigint"))))
        .orderBy(col("focus"), col("violation"))),

    // Named-graph diff between two event-graph versions, aggregated per
    // (op, predicate) with subject counts.
    "rdf_graph_diff" -> ((s, d) => {
      val v1 = versionedStatements(s, d, keepMod = 5, migrate = false)
      val v2 = versionedStatements(s, d, keepMod = 7, migrate = true)
      diffGraphs(v1, v2)
        .groupBy(col("op"), col("p"))
        .agg(count(lit(1)).as("n"), countDistinct(col("s")).as("n_subj"))
        .orderBy(col("op"), col("p"))
    }))

  // ---------------------------------------------------------------------
  // DuckDB oracles — each recomputes the full pipeline from `events`,
  // including the schema closures (recursive CTEs) and the planted
  // defects, so the engine's rule implementations are checked end to
  // end, not against precomputed answers.
  // ---------------------------------------------------------------------

  private val ontologySubClassValues =
    s"""VALUES ('${T}purchase', '${C}conversion'),
              ('${T}signup', '${C}conversion'),
              ('${C}conversion', '${C}interaction'),
              ('${T}click', '${C}engagement'),
              ('${T}view', '${C}engagement'),
              ('${C}engagement', '${C}interaction'),
              ('${C}interaction', '${C}event'),
              ('${T}error', '${C}event')"""

  private val oracleCommon =
    s"""WITH RECURSIVE
        subc(a, b) AS ($ontologySubClassValues),
        sc(a, b) AS (
          SELECT a, b FROM subc
          UNION
          SELECT sc.a, subc.b FROM sc JOIN subc ON sc.b = subc.a),
        subp(a, b) AS (VALUES ('${ns}user_id', '${ns}actor'),
                              ('${ns}actor', '${ns}participant')),
        sp(a, b) AS (
          SELECT a, b FROM subp
          UNION
          SELECT sp.a, subp.b FROM sp JOIN subp ON sp.b = subp.a),
        inst_type(s, o) AS (
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR),
                 '$T' || event_type
          FROM events),
        inst_prop(s, p, o, kind) AS (
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}user_id',
                 'urn:user:' || CAST(user_id AS VARCHAR), 'iri'
          FROM events WHERE user_id IS NOT NULL
          UNION ALL
          SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}value',
                 CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 'literal'
          FROM events WHERE value IS NOT NULL),
        -- NOTE: inside WITH RECURSIVE, DuckDB gives any UNION-form CTE
        -- recursive base/step semantics (no global distinct), so every
        -- non-recursive combining CTE below dedups explicitly with
        -- DISTINCT over UNION ALL.
        allprop(s, p, o, kind) AS (
          SELECT DISTINCT s, p, o, kind FROM (
            SELECT s, p, o, kind FROM inst_prop
            UNION ALL
            SELECT i.s, sp.b, i.o, i.kind FROM inst_prop i JOIN sp ON i.p = sp.a)),
        dom(p, c) AS (VALUES ('${ns}value', '${C}measured')),
        rng(p, c) AS (VALUES ('${ns}user_id', '${C}user')),
        types0(s, o) AS (
          SELECT DISTINCT s, o FROM (
            SELECT s, o FROM inst_type
            UNION ALL
            SELECT a.s, dom.c FROM allprop a JOIN dom ON a.p = dom.p
            UNION ALL
            SELECT a.o, rng.c FROM allprop a JOIN rng ON a.p = rng.p
              WHERE a.kind = 'iri')),
        types(s, o) AS (
          SELECT DISTINCT s, o FROM (
            SELECT s, o FROM types0
            UNION ALL
            SELECT t.s, sc.b FROM types0 t JOIN sc ON t.o = sc.a))"""

  def oracleSql: Map[String, String] = Map(
    "rdfs_entailment_types" ->
      s"""$oracleCommon
          SELECT o AS cls, count(*) AS n FROM types GROUP BY o ORDER BY cls""",

    "rdfs_entailment_props" ->
      s"""$oracleCommon,
          stmts(s, p, o) AS (
            SELECT DISTINCT s, p, o FROM (
              SELECT s, p, o FROM allprop
              UNION ALL
              SELECT s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', o
              FROM types))
          SELECT p, count(*) AS n, count(DISTINCT s) AS n_subj
          FROM stmts GROUP BY p ORDER BY p""",

    // identical to rdfs_entailment_props: the incremental union must
    // land on the full-recompute state exactly
    "rdfs_incremental" ->
      s"""$oracleCommon,
          stmts(s, p, o) AS (
            SELECT DISTINCT s, p, o FROM (
              SELECT s, p, o FROM allprop
              UNION ALL
              SELECT s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', o
              FROM types))
          SELECT p, count(*) AS n, count(DISTINCT s) AS n_subj
          FROM stmts GROUP BY p ORDER BY p""",

    // full closure over ALL edges — the incremental path must match
    "owl_incremental_closure" ->
      """WITH RECURSIVE
          e(a, b) AS (
            SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR),
                   'urn:n:' || CAST(c_nationkey AS VARCHAR) FROM customer
            UNION ALL
            SELECT 'urn:n:' || CAST(n_nationkey AS VARCHAR),
                   'urn:r:' || CAST(n_regionkey AS VARCHAR) FROM nation
            UNION ALL
            SELECT 'urn:r:' || CAST(r_regionkey AS VARCHAR), 'urn:world'
            FROM region),
          c(a, b) AS (
            SELECT a, b FROM e
            UNION
            SELECT c.a, e.b FROM c JOIN e ON c.b = e.a)
          SELECT substr(b, 1, 6) AS target_kind,
                 count(*) AS n_pairs, count(DISTINCT a) AS n_sources
          FROM c GROUP BY 1 ORDER BY target_kind""",

    "owl_entailment" ->
      s"""WITH RECURSIVE
          par(a, b) AS (
            SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR),
                   'urn:n:' || CAST(c_nationkey AS VARCHAR) FROM customer
            UNION ALL
            SELECT 'urn:n:' || CAST(n_nationkey AS VARCHAR),
                   'urn:r:' || CAST(n_regionkey AS VARCHAR) FROM nation
            UNION ALL
            SELECT 'urn:r:' || CAST(r_regionkey AS VARCHAR), 'urn:world'
            FROM region),
          parc(a, b) AS (
            SELECT a, b FROM par
            UNION
            SELECT parc.a, par.b FROM parc JOIN par ON parc.b = par.a),
          rep(a, b) AS (
            SELECT 'urn:s:' || CAST(s_suppkey AS VARCHAR),
                   'urn:n:' || CAST(s_nationkey AS VARCHAR) FROM supplier),
          conn(a, b) AS (
            SELECT DISTINCT
              'urn:n:' || CAST(n1.n_nationkey AS VARCHAR),
              'urn:n:' || CAST(n2.n_nationkey AS VARCHAR)
            FROM nation n1 JOIN nation n2
              ON n1.n_regionkey = n2.n_regionkey
             AND n1.n_nationkey <> n2.n_nationkey),
          stmts(s, p, o) AS (
            SELECT DISTINCT s, p, o FROM (
              SELECT a, '${ns}parent_org', b FROM parc
              UNION ALL
              SELECT a, '${ns}reports_to', b FROM rep
              UNION ALL
              SELECT b, '${ns}manages', a FROM rep
              UNION ALL
              SELECT a, '${ns}connected', b FROM conn) t(s, p, o))
          SELECT p, count(*) AS n, count(DISTINCT s) AS n_subj
          FROM stmts GROUP BY p ORDER BY p""",

    "rdf_sameas_fuse" ->
      """SELECT 'urn:acct:' || CAST(user_id AS VARCHAR) AS canon,
                count(*) AS n_events,
                count(DISTINCT event_type) AS n_types
         FROM events WHERE user_id IS NOT NULL
         GROUP BY user_id ORDER BY canon""",

    "shacl_report" ->
      s"""WITH f AS (
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR) AS focus,
                   event_id, user_id, event_type, value,
                   (CASE WHEN user_id IS NOT NULL AND event_id % 37 <> 0
                         THEN 1 ELSE 0 END)
                   + (CASE WHEN event_id % 41 = 0 THEN 1 ELSE 0 END) AS ucnt
            FROM events)
          SELECT focus, 'minCount(user_id)' AS violation, CAST(ucnt AS BIGINT) AS n
            FROM f WHERE ucnt < 1
          UNION ALL
          SELECT focus, 'maxCount(user_id)', CAST(ucnt AS BIGINT)
            FROM f WHERE ucnt > 1
          UNION ALL
          SELECT focus, 'minInclusive(value)', CAST(1 AS BIGINT)
            FROM f WHERE value IS NOT NULL
              AND (CASE WHEN event_id % 53 = 0 THEN -abs(value) - 1
                        ELSE value END) < 0
          UNION ALL
          SELECT focus, 'in(etype)', CAST(1 AS BIGINT)
            FROM f WHERE event_id % 67 = 0 OR event_id % 59 = 0
          UNION ALL
          SELECT focus, 'pattern(etype)', CAST(1 AS BIGINT)
            FROM f WHERE event_id % 67 = 0
          UNION ALL
          SELECT focus, 'nodeKind(user_id)', CAST(1 AS BIGINT)
            FROM f WHERE user_id IS NOT NULL AND event_id % 37 <> 0
              AND event_id % 61 = 0
          UNION ALL
          SELECT focus, 'datatype(code)', CAST(1 AS BIGINT)
            FROM f WHERE event_id % 71 = 0
          ORDER BY focus, violation""",

    "rdf_graph_diff" ->
      s"""WITH v1 AS (
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR) AS s,
                   '${ns}etype' AS p, event_type AS o
            FROM events WHERE event_id % 5 <> 0
            UNION ALL
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}user_id',
                   'urn:user:' || CAST(user_id AS VARCHAR)
            FROM events WHERE event_id % 5 <> 0 AND user_id IS NOT NULL
            UNION ALL
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}value',
                   CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
            FROM events WHERE event_id % 5 <> 0 AND value IS NOT NULL),
          v2 AS (
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR) AS s,
                   '${ns}etype' AS p,
                   CASE WHEN event_id % 11 = 0 THEN 'migrated'
                        ELSE event_type END AS o
            FROM events WHERE event_id % 7 <> 0
            UNION ALL
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}user_id',
                   'urn:user:' || CAST(user_id AS VARCHAR)
            FROM events WHERE event_id % 7 <> 0 AND user_id IS NOT NULL
            UNION ALL
            SELECT 'urn:ev:' || CAST(event_id AS VARCHAR), '${ns}value',
                   CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
            FROM events WHERE event_id % 7 <> 0 AND value IS NOT NULL),
          d AS (
            SELECT 'add' AS op, s, p, o FROM (
              SELECT s, p, o FROM v2 EXCEPT SELECT s, p, o FROM v1)
            UNION ALL
            SELECT 'remove', s, p, o FROM (
              SELECT s, p, o FROM v1 EXCEPT SELECT s, p, o FROM v2))
          SELECT op, p, count(*) AS n, count(DISTINCT s) AS n_subj
          FROM d GROUP BY op, p ORDER BY op, p""")
}
