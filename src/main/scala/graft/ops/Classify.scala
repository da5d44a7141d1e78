package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Trained-in-engine document classifiers — the model-based curation
  * step of a training-data pipeline (quality/domain classifiers à la
  * CCNet / fastText-style source filtering): a multinomial Naive Bayes
  * over token counts and a Rocchio (nearest-class-centroid) classifier
  * over the embedding column. Both TRAIN inside the engine with
  * order-independent integer-quantized arithmetic (the contract shared
  * with the k-means / PQ trainers — see [[SemanticOps]]), so the full
  * train→predict loop is a pure function of the data and the DuckDB
  * oracle recomputes it bit-for-bit: counts are exact integers,
  * per-term log-likelihoods are quantized to micro-nats
  * (`floor(ln(x)·1e6 + 0.5)` as BIGINT) before the order-free integer
  * sum, and argmax ties break on the class key.
  *
  * Scale shape: NB's model is (vocab × classes) count rows built by one
  * partial-agg shuffle over the token stream; scoring joins the
  * per-document term counts against the model on the token key — the
  * class dimension fans out ONLY the per-document distinct-term rows
  * (|classes| × |doc vocab|), never the corpus. Rocchio's model is
  * classes × dim doubles — collected once (bounded, the
  * literal-centroid pattern) and applied as map-side codegen'd
  * distances, no shuffle after the centroid agg.
  */
object Classify {

  /** Quantized micro-nat log-likelihood: deterministic across engines
    * up to 1 ulp of ln (both sides evaluate IEEE doubles; the 1e-6
    * quantization absorbs the difference). */
  private def qln(x: Column): Column =
    floor(log(x) * lit(1000000.0) + lit(0.5)).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- CCNet-style REFERENCE-model perplexity bucketing (Wenzek et
    // al. 2020 shape): a bigram LM is trained on a reference slice
    // (doc_id % 10 < 3 — at production scale the curated "clean"
    // corpus), every document scores its average negative
    // log-likelihood under THAT model, and the corpus splits into
    // head/middle/tail terciles — the standard quality-bucketing a
    // pretraining pipeline runs. Unlike text_unigram/bigram_surprise
    // (self-corpus statistics), the model here is EXTERNAL to the
    // scored document, which is what makes low perplexity mean
    // "looks like the reference" rather than "is repetitive".
    // Cross-engine exactness: per-bigram log-likelihoods quantize to
    // micro-nats (the NB discipline) so the integer sums are
    // order-free; Laplace-1 over (c1 + V). Scale: counts are two
    // map-side-combined aggregations over reference bigrams; scoring
    // is one broadcast-or-shuffle join per bigram table; tercile
    // bucketing is CUT-POINT based, not a global window over DOCUMENTS
    // — the nll is already quantized to a 1e-4 grid (`kq =
    // floor(nll·1e4 + 0.5)` as BIGINT), so the key histogram is
    // bounded by the VALUE RANGE (≤ ~max_nll·10⁴ distinct keys, a few
    // hundred thousand at any corpus size), never by the corpus: one
    // hash-groupBy builds it, the two tercile cut points come from a
    // HISTOGRAM-sized cumulative window (the corpus_percentiles_approx
    // pattern — bounded rows, so the single-partition window is free),
    // and every document buckets MAP-SIDE against the broadcast 1-row
    // cut table. The whole thing is ONE lazy plan with the per-doc
    // aggregate PERSISTED (doc-sized, MEMORY_AND_DISK): both consumers
    // read the cache, so the corpus-sized bigram scoring pass runs
    // once — no driver-side cumsum, no reliance on exchange reuse
    // (column pruning reorders the two branches' aggregate function
    // lists, which defeats ReuseExchange — plan-verified, see
    // plans/r13) and no localCheckpoint (the r12→r13 interim version's
    // extra materialization).
    // Tie rule: a key on the boundary goes to the lower bucket
    // (c_k = min key whose cumulative count reaches k·n/3) — the
    // DuckDB oracle replays the identical histogram + rule.
    "text_ref_perplexity" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val bi = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val ref = bi.filter(pmod(col("doc_id"), lit(10)) < 3)
      val c2 = ref.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = ref.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val v = ref.select(col("w1").as("w"))
        .unionAll(ref.select(col("w2").as("w")))
        .distinct().agg(count(lit(1)).as("v"))
      val contrib = bi
        .join(c2, Seq("w1", "w2"), "left").na.fill(0L, Seq("c2"))
        .join(c1, Seq("w1"), "left").na.fill(0L, Seq("c1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"), qln((col("c2") + 1).cast("double")
          / (col("c1") + col("v")).cast("double")).as("q"))
      // kq is the exact integer 1e-4-grid key; nll = kq / 1e4 renders
      // it (both engines divide the same integer by the same double).
      val scored = contrib.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          floor((-(sum(col("q")).cast("double")
            / count(lit(1))) / 1e6) * 10000 + lit(0.5))
            .cast("long").as("kq"))
        .withColumn("nll", col("kq").cast("double") / 10000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // histogram-sized cumulative window (bounded by the value grid,
      // never the corpus) -> one 1-row cut table, broadcast back
      val hist = scored.groupBy(col("kq")).agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy(col("kq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.orderBy(col("kq"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cuts = hist
        .select(col("kq"), sum(col("c")).over(wCum).as("cum"),
          sum(col("c")).over(wTot).as("tot"))
        .agg(
          min(when(lit(3) * col("cum") >= col("tot"), col("kq"))).as("c1"),
          min(when(lit(3) * col("cum") >= lit(2) * col("tot"), col("kq"))).as("c2"))
      scored.crossJoin(broadcast(cuts))
        .withColumn("bucket", when(col("kq") <= col("c1"), 1)
          .when(col("kq") <= col("c2"), 2).otherwise(3))
        .select(col("doc_id"), col("n_bigrams"), col("nll"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    // ---- multinomial Naive Bayes, trained on the corpus's own source
    // labels and evaluated on it (the mechanics, not a holdout claim):
    // Laplace-1 smoothing, priors from document counts. Output is the
    // confusion matrix.
    "text_classify_nb" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      val toks = Tables.fanOut(docs).select(col("doc_id"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      val classes = docs.select(col("source").as("cls")).distinct()
      val priors = docs.groupBy(col("source").as("cls"))
        .agg(count(lit(1)).as("dc"))
        .crossJoin(docs.agg(count(lit(1)).as("dtot")))
      val cw = toks.groupBy(col("source").as("cls"), col("tok"))
        .agg(count(lit(1)).as("cw"))
      val tc = toks.groupBy(col("source").as("cls")).agg(count(lit(1)).as("tc"))
      val vocab = toks.agg(countDistinct(col("tok")).as("v"))
      val ndw = toks.groupBy(col("doc_id"), col("source"), col("tok"))
        .agg(count(lit(1)).as("n"))
      // class fan-out over per-document DISTINCT terms only; unseen
      // (class, term) pairs take the smoothed zero count
      val grid = ndw.join(broadcast(classes))
        .join(cw, Seq("cls", "tok"), "left").na.fill(0L, Seq("cw"))
        .join(broadcast(tc), Seq("cls"))
        .crossJoin(broadcast(vocab))
      val term = col("n") * qln((col("cw") + 1).cast("double")
        / (col("tc") + col("v")).cast("double"))
      val scores = grid.select(col("doc_id"), col("source"), col("cls"),
          term.as("contrib"))
        .groupBy(col("doc_id"), col("source"), col("cls"))
        .agg(sum(col("contrib")).as("ll"))
        .join(broadcast(priors), Seq("cls"))
        .withColumn("score",
          col("ll") + qln(col("dc").cast("double") / col("dtot").cast("double")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cls"))
      scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("source").as("actual"), col("cls").as("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("actual"), col("predicted"))
    }),

    // ---- Rocchio / nearest-class-centroid over the embeddings: class
    // centroids are order-free quantized means (one (label, dim)
    // partial-agg shuffle, labels × dim rows collected as plan
    // literals); prediction is a map-side argmin over codegen'd
    // literal-centroid distances, rounded to 6 decimals with
    // label-ascending tie-break. Confusion matrix out.
    "embed_classify_rocchio" -> ((s, d) => {
      val base = Tables.fanOut(Similarity.vecsN(s, d))
        .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")),
          Seq("vec_id"))
      val sums = base
        .select(col("label"), posexplode(transform(col("v"),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")))
          .as(Seq("dim", "xi")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val labels = sums.map(_.getInt(0)).distinct.sorted
      val dim = sums.map(_.getInt(1)).max + 1
      val centroids = labels.map { lb =>
        val c = new Array[Double](dim)
        sums.filter(_.getInt(0) == lb).foreach(r =>
          c(r.getInt(1)) = (r.getLong(2).toDouble / r.getLong(3)) / 1e6)
        c
      }
      val dists = array(centroids.toIndexedSeq.map(c =>
        round(Similarity.sqDist(col("v"), lit(c)), 6)): _*)
      base.withColumn("dists", dists)
        .withColumn("predicted", element_at(lit(labels),
          array_position(col("dists"), array_min(col("dists"))).cast("int")))
        .groupBy(col("label").as("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("actual"), col("predicted"))
    }))

  def oracleSql: Map[String, String] = Map(
    // the whole reference-LM pipeline replayed: same bigrams, same
    // Laplace-1 micro-nat quantization, same double division order,
    // same histogram cut points (c_k = min grid key whose cumulative
    // count reaches k·n/3; boundary keys take the lower bucket)
    "text_ref_perplexity" ->
      """WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
           FROM documents),
         bi AS (
           SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
                 FROM toks WHERE len(t) >= 2) x),
         ref AS (SELECT * FROM bi WHERE doc_id % 10 < 3),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM ref GROUP BY w1, w2),
         c1 AS (SELECT w1, count(*) AS c1 FROM ref GROUP BY w1),
         v AS (SELECT count(DISTINCT w) AS v FROM (
                 SELECT w1 AS w FROM ref
                 UNION ALL SELECT w2 FROM ref) u),
         contrib AS (
           SELECT b.doc_id,
             CAST(floor(ln((COALESCE(c2.c2, 0) + 1) * 1.0
               / (COALESCE(c1.c1, 0) + v.v)) * 1000000.0 + 0.5) AS BIGINT)
               AS q
           FROM bi b
           LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
           LEFT JOIN c1 ON b.w1 = c1.w1
           CROSS JOIN v),
         sc AS (
           SELECT doc_id, count(*) AS n_bigrams,
             CAST(floor((-(CAST(sum(q) AS DOUBLE) / count(*)) / 1e6)
               * 10000 + 0.5) AS BIGINT) AS kq
           FROM contrib GROUP BY doc_id),
         hist AS (SELECT kq, count(*) AS c FROM sc GROUP BY kq),
         cum AS (SELECT kq, sum(c) OVER (ORDER BY kq) AS cum,
                        sum(c) OVER () AS tot
                 FROM hist),
         cuts AS (SELECT
             min(CASE WHEN 3 * cum >= tot THEN kq END) AS c1,
             min(CASE WHEN 3 * cum >= 2 * tot THEN kq END) AS c2
           FROM cum)
         SELECT doc_id, n_bigrams, kq / 10000.0 AS nll,
           CAST(CASE WHEN kq <= c1 THEN 1 WHEN kq <= c2 THEN 2
                     ELSE 3 END AS INT) AS bucket
         FROM sc CROSS JOIN cuts ORDER BY doc_id""",
    "text_classify_nb" ->
      """WITH toks AS (
           SELECT doc_id, source,
                  unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM documents),
         classes AS (SELECT DISTINCT source AS cls FROM documents),
         priors AS (SELECT source AS cls, count(*) AS dc
                    FROM documents GROUP BY source),
         dtot AS (SELECT count(*) AS dtot FROM documents),
         cw AS (SELECT source AS cls, tok, count(*) AS cw
                FROM toks GROUP BY 1, 2),
         tc AS (SELECT source AS cls, count(*) AS tc FROM toks GROUP BY 1),
         vocab AS (SELECT count(DISTINCT tok) AS v FROM toks),
         ndw AS (SELECT doc_id, source, tok, count(*) AS n
                 FROM toks GROUP BY 1, 2, 3),
         scores AS (
           SELECT ndw.doc_id, ndw.source, c.cls,
             sum(ndw.n * CAST(floor(ln(
               (COALESCE(cw.cw, 0) + 1) * 1.0 / (tc.tc + vocab.v))
               * 1000000.0 + 0.5) AS BIGINT)) AS ll
           FROM ndw CROSS JOIN classes c
           JOIN tc ON tc.cls = c.cls
           CROSS JOIN vocab
           LEFT JOIN cw ON cw.cls = c.cls AND cw.tok = ndw.tok
           GROUP BY 1, 2, 3),
         scored AS (
           SELECT s.doc_id, s.source, s.cls,
             s.ll + CAST(floor(ln(p.dc * 1.0 / d.dtot) * 1000000.0 + 0.5)
               AS BIGINT) AS score
           FROM scores s JOIN priors p ON p.cls = s.cls CROSS JOIN dtot d),
         pred AS (
           SELECT doc_id, source, cls,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cls) AS rn
           FROM scored)
         SELECT source AS actual, cls AS predicted, count(*) AS n
         FROM pred WHERE rn = 1
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "embed_classify_rocchio" ->
      """WITH p AS (SELECT CAST(max(len(embedding)) AS INT) AS dm
                    FROM embeddings),
         di AS (SELECT unnest(range(1, (SELECT dm FROM p) + 1)) AS i),
         v AS (SELECT e.vec_id, e.label,
                 list_transform(range(1, p.dm + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE)) AS v
               FROM embeddings e CROSS JOIN p),
         sums AS (
           SELECT x.label, di.i AS dim,
             sum(CAST(floor(x.v[di.i] * 1000000.0 + 0.5) AS BIGINT)) AS sx,
             count(*) AS n
           FROM v x CROSS JOIN di GROUP BY x.label, di.i),
         cent AS (
           SELECT label AS k,
             list((CAST(sx AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
           FROM sums GROUP BY label),
         dists AS (
           SELECT x.vec_id, x.label AS actual, c.k,
             round(list_sum(list_transform(range(1, p.dm + 1),
               i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))), 6) AS dist
           FROM v x CROSS JOIN p CROSS JOIN cent c),
         pred AS (
           SELECT vec_id, actual, k,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, k) AS rn
           FROM dists)
         SELECT actual, k AS predicted, count(*) AS n
         FROM pred WHERE rn = 1
         GROUP BY 1, 2 ORDER BY 1, 2""")
}
