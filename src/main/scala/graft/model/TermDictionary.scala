package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary encoding for RDF terms — the load-bearing trick of every
  * disk-based triple store (RDF-3X, Virtuoso, Jena TDB): map each
  * distinct term string to a dense integer id once, then run all joins
  * over 8-byte longs instead of 50–200-byte IRIs/literals.
  *
  * Why it matters at 100 TB: a BGP self-join shuffles its join keys.
  * Over raw quads those keys are full IRI strings, so shuffle volume —
  * the scarce resource on a 1000-executor cluster — is dominated by
  * term text repeated once per triple occurrence. Encoded, every
  * intermediate row is three longs; the strings exist exactly once, in
  * the dictionary, and are joined back only for the FINAL projection
  * (result-sized, not intermediate-sized).
  *
  * Ids are the term's rank in the globally sorted distinct-term set —
  * deterministic (so the DuckDB oracle recomputes them with
  * `row_number() OVER (ORDER BY term)`), and sorted assignment is what
  * RDF-3X does too (it makes the dictionary range-prunable: terms
  * sharing an IRI namespace prefix get contiguous ids).
  *
  * The reference holds terms as strings inside Stardog
  * (`sparql_update.py` posts text; the store's own dictionary is
  * opaque to it) — this module is the engine-side equivalent surface.
  */
object TermDictionary {

  /** Canonical term string for the object slot, N-Triples-shaped so the
    * three kinds can share one dictionary without collisions: IRIs and
    * bnodes keep their raw form (IRIs never start with `"`, bnodes
    * start `_:`), literals are quoted with `\`/`"` escaped and carry
    * their datatype/lang tags — `"v"`, `"v"^^<dt>`, `"v"@lang`. */
  def objTerm(value: Column, dt: Column, lang: Column, kind: Column): Column =
    when(kind === "literal",
      concat(lit("\""),
        regexp_replace(regexp_replace(value, "\\\\", "\\\\\\\\"),
          "\"", "\\\\\""),
        lit("\""),
        when(dt.isNotNull, concat(lit("^^<"), dt, lit(">"))).otherwise(lit("")),
        when(lang.isNotNull, concat(lit("@"), lang)).otherwise(lit(""))))
      .otherwise(value)

  private def objTermOf(quads: DataFrame): Column =
    objTerm(col("o_value"), col("o_type"), col("o_lang"), col("o_kind"))

  /** Driver-side twin of [[objTerm]] for QUERY CONSTANTS: the canonical
    * dictionary key of one literal, computed in Scala so a compiled
    * pattern can look up its constant's id without a Column round-trip.
    * Must stay escape-for-escape identical to the Column version — the
    * DictEncodingSpec pins the two against each other. */
  def literalKey(value: String, dt: String, lang: String): String = {
    val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
    val d = if (dt != null) "^^<" + dt + ">" else ""
    val l = if (lang != null) "@" + lang else ""
    "\"" + esc + "\"" + d + l
  }

  /** Build the dictionary: every distinct term in any s/p/o slot →
    * dense 0-based id in global sorted order.
    *
    * Shape at scale: one union-distinct (map-side partial dedup), one
    * range-partitioned total sort, then `zipWithIndex` — each partition
    * numbers its rows after one lightweight count-per-partition job, no
    * single-partition window (a `row_number()` window without
    * PARTITION BY would funnel the whole term set through one task).
    * This is the documented exception where an RDD primitive beats the
    * DataFrame API: Spark SQL has no distributed global-rank operator.
    *
    * The sorted term frame is persisted across the two passes the
    * numbering needs (zipWithIndex's count-per-partition job at call
    * time, then whatever action consumes the result) — without the pin
    * the union + distinct + range sort ran twice per consumer (r13;
    * the extendDictionary append path got the same fix). The SQL cache
    * dedupes identical plans, so repeated builds over the same input
    * reuse one entry; the bench clears it at the family boundary. */
  def dictionary(quads: DataFrame): DataFrame = {
    val spark = quads.sparkSession
    import spark.implicits._
    val terms = quads.select(col("s").as("term"))
      .unionByName(quads.select(col("p").as("term")))
      .unionByName(quads.select(objTermOf(quads).as("term")))
      .distinct()
      .orderBy("term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val indexed = terms.as[String].rdd.zipWithIndex()
    spark.createDataFrame(indexed).toDF("term", "id")
  }

  /** Incremental dictionary maintenance: terms of `newQuads` that the
    * existing dictionary doesn't know get fresh ids appended AFTER the
    * current range (sorted among themselves). Existing ids are FROZEN —
    * nothing downstream (encoded quads on disk, indexes keyed by id)
    * ever needs rewriting, which is the whole point: at 100 TB the
    * dictionary is a persisted artifact and a daily increment touches
    * only its own new terms (anti-join + sort of increment-sized data),
    * never the corpus. Same frozen-base pattern as the IVFADC
    * incremental append. The max-id read is a 1-row aggregate. */
  def append(dict: DataFrame, newQuads: DataFrame): DataFrame = {
    val spark = newQuads.sparkSession
    import spark.implicits._
    val fresh = newQuads.select(col("s").as("term"))
      .unionByName(newQuads.select(col("p").as("term")))
      .unionByName(newQuads.select(objTermOf(newQuads).as("term")))
      .distinct()
      .join(dict.select(col("term")), Seq("term"), "left_anti")
      .orderBy("term")
      // pinned for the same two-pass reason as [[dictionary]]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = dict.agg(coalesce(max(col("id")) + 1L, lit(0L)))
      .first().getLong(0)
    val indexed = fresh.as[String].rdd.zipWithIndex()
      .map { case (t, i) => (t, i + base) }
    dict.unionByName(spark.createDataFrame(indexed).toDF("term", "id"))
  }

  /** Rewrite quads to id space: (graph, s_id, p_id, o_id). Graph names
    * stay as strings — they are the partition key, low-cardinality, and
    * never join-shuffled. The s/o joins shuffle by term; the p join
    * broadcasts the predicate slice of the dictionary (predicates are a
    * few hundred terms in any real vocabulary, megabytes at worst). */
  def encode(quads: DataFrame, dict: DataFrame): DataFrame = {
    val sDict = dict.select(col("term").as("enc_s_term"), col("id").as("s_id"))
    val pDict = dict
      .join(quads.select(col("p").as("term")).distinct(), Seq("term"))
      .select(col("term").as("enc_p_term"), col("id").as("p_id"))
    val oDict = dict.select(col("term").as("enc_o_term"), col("id").as("o_id"))
    quads
      .withColumn("o_term", objTermOf(quads))
      .join(sDict, col("s") === col("enc_s_term"))
      .join(broadcast(pDict), col("p") === col("enc_p_term"))
      .join(oDict, col("o_term") === col("enc_o_term"))
      .select(col("graph"), col("s_id"), col("p_id"), col("o_id"))
  }

  /** Decode an id column back to its term string (a join against the
    * dictionary — do this on FINAL projections only; intermediates stay
    * in id space). */
  def decode(df: DataFrame, dict: DataFrame, idCol: String,
      asCol: String): DataFrame =
    df.join(dict.select(col("term").as(asCol), col("id").as(s"dec_$idCol")),
      col(idCol) === col(s"dec_$idCol"))
      .drop(s"dec_$idCol")

  /** Look up the ids of a handful of constant terms (query constants —
    * bounded by the query text, never by data; the few-row collect is
    * the literal-centroid pattern). */
  def constantIds(dict: DataFrame, terms: Seq[String]): Map[String, Long] =
    dict.filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}
