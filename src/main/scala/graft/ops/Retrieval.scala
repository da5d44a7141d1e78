package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Tables

/** Sparse + hybrid retrieval over the `documents`/`embeddings` tables:
  * Okapi BM25 top-k (the inverted-index scoring every eval-retrieval
  * and RAG data pipeline runs) and reciprocal-rank fusion of the BM25
  * list with the exact dense-cosine list (the standard hybrid-search
  * combiner; Cormack, Clarke & Buettcher, SIGIR 2009).
  *
  * Scale shape (100 TB design point):
  *  - The postings table (doc, term, tf) IS the inverted index: scoring
  *    is a term equi-join postings ⨝ query-terms — shuffle-partitioned
  *    by term, never a doc × query cross join. At cluster scale the
  *    postings would be bucketed by term; the per-(query, doc) combine
  *    shuffles only matched candidates.
  *  - Corpus statistics (N, avgdl) are a 1-row broadcast; df rides a
  *    window over the postings table itself (each (doc, term) row is
  *    one containing doc — no second corpus pass).
  *  - RRF consumes the two top-k lists (k rows per query each), so the
  *    fusion join is bounded by queries × 2k rows regardless of corpus
  *    size.
  *
  * Determinism contract (same trick as the k-means family): per-term
  * BM25 contributions are quantized to 1e-6 integers and summed as
  * longs — integer addition is order-free, so the score is identical
  * on every partitioning and in DuckDB; ranking uses the rounded score
  * with doc-id tie-break on both engines.
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75
  private val QueryMod = 50   // query docs: doc_id % 50 == 0
  private val QueryTerms = 8  // first-8-token prefix is the query text
  private val FuseDepth = 20  // per-list depth entering the fusion
  private val RrfK = 60       // the standard RRF dampening constant

  private def round4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** Stop-term prune: query terms contained in more than 90% of the
    * corpus are dropped from scoring. Their idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` is ≈ 0.1 — they cannot move
    * the ranking — but each one matches df ≈ N postings rows PER QUERY,
    * so at 100 TB a single "the" in a query batch turns the scoring
    * join quadratic (queries × corpus). The integer predicate
    * `10·df <= 9·N` is mirrored exactly by the oracle;
    * RetrievalScaleProbe measures the candidate-volume difference under
    * a planted everywhere-word. (90%, not 50%: this synthetic corpus
    * has a 31-term vocabulary with median df ≈ 0.78·N — a natural-text
    * stop-list fraction would prune ordinary content terms here.) */
  private val StopNum = 9
  private val StopDen = 10

  /** (doc_id, term, tf, dl, df) postings with per-doc length and
    * per-term document frequency — one corpus pass: tf aggregates on
    * (doc, term) carrying dl through; df is a `groupBy(term).count` over
    * the aggregated postings (each row is one distinct containing doc)
    * joined back. NOT a count-over-term window: a window shuffles AND
    * sorts full postings rows per term, so at 100 TB the "the"/"a"
    * partitions become giant single-partition sorts. The aggregation
    * gets map-side partial counts (hot terms collapse per-partition
    * before the shuffle), the df table is |vocab| narrow rows (AQE
    * broadcasts it when it fits, and AQE skew-join splits the hot-term
    * join partitions when it does not), and the join-back rides the
    * same term exchange the query-terms join needs anyway. */
  private[ops] def postingsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    val tf = toks.select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
  }

  private def postings(s: SparkSession, d: String): DataFrame =
    postingsOf(Tables.documents(s, d))

  // ---- persisted positional inverted index ---------------------------
  // The IVFADC lifecycle applied to sparse retrieval: build once →
  // parquet → serve many → append. Postings are term-BUCKETED (16
  // layout buckets via xxhash64 — partitionBy(term) would explode into
  // |vocab| directories at real scale), so the scoring join carries the
  // bucket key and Spark's dynamic partition pruning skips every bucket
  // no query term hashes into.

  private val IndexBuckets = 16

  /** Term → layout bucket. Pure LAYOUT detail — bucket ids never cross
    * the oracle boundary, so a fast non-cross-engine hash is fine. */
  private def bucketOf(term: Column): Column =
    pmod(xxhash64(term), lit(IndexBuckets)).cast("int")

  /** Write ONE ingest of the persisted index under `dir`:
    *  - `postings/ingest=<tag>/bucket=<b>` — (term, doc_id, dl,
    *    positions) rows; tf is `cardinality(positions)`, so BM25 and
    *    positional phrase search serve from the SAME table;
    *  - `terms/ingest=<tag>` — this ingest's (term, df) dictionary;
    *  - `stats/ingest=<tag>` — this ingest's (n_docs, sum_dl) row.
    * Append lifecycle (mirrors `ann_ivfpq_append`): a later batch of
    * DISJOINT doc ids writes its own ingest subdirectories and nothing
    * existing is rewritten — df and corpus stats are additive over
    * disjoint doc sets, and the per-ingest dictionaries the read side
    * sums are vocab-sized, so an append is O(batch) while serving stays
    * byte-identical to a full rebuild (retrieval_index_append shares
    * retrieval_bm25_topk's oracle to prove exactly that). */
  private[ops] def writePostingsIngest(
      docs: DataFrame, dir: String, tag: String): Unit = {
    val toks = Tables.fanOut(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    val postings = toks
      .select(col("doc_id"), size(col("tk")).as("dl"),
        posexplode(col("tk")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(first(col("dl")).as("dl"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", bucketOf(col("term")))
    postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings/ingest=$tag")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/terms/ingest=$tag")
    toks.agg(count(lit(1)).as("n_docs"), sum(size(col("tk"))).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats/ingest=$tag")
  }

  /** Delete `deadDocs` from a persisted index WITHOUT rebuilding it —
    * the opt-out / right-to-erasure path of sparse retrieval, the
    * `ann_index_delete` twin. The removal lands as three O(delta)
    * artifacts beside the index; nothing existing is rewritten:
    *  - `_tombstones/ingest=<tag>` — the doc-id list every postings
    *    read anti-joins (broadcast: it is the opt-out list, not the
    *    corpus);
    *  - a NEGATIVE dictionary ingest `terms/ingest=<tag>` — per-term
    *    −(deleted docs containing the term), so the served df sum is
    *    exactly the survivors' df;
    *  - a NEGATIVE stats ingest — −n_docs / −sum_dl.
    * BM25 is df- and avgdl-sensitive, so tombstoning the postings
    * alone would serve WRONG scores for every SURVIVING doc; the
    * negative ingests ride the additive per-ingest sums the read side
    * already does, making deletion exact. Cost is one scan emitting
    * the deleted docs' postings rows (O(delta × terms-per-doc));
    * the oracle — full BM25 over the surviving corpus — proves
    * delete-then-serve ≡ never-indexed bit-for-bit. */
  private[ops] def deleteFromIndex(s: SparkSession, dir: String,
      tag: String, deadDocs: DataFrame): Unit = {
    val dead = s.read.parquet(s"$dir/postings")
      .join(broadcast(deadDocs.select(col("doc_id"))), Seq("doc_id"),
        "left_semi")
    dead.groupBy(col("term"))
      .agg((-count(lit(1))).as("df"))
      .write.mode("overwrite").parquet(s"$dir/terms/ingest=$tag")
    dead.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg((-count(lit(1))).as("n_docs"), (-sum(col("dl"))).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats/ingest=$tag")
    deadDocs.select(col("doc_id")).write.mode("overwrite")
      .parquet(s"$dir/_tombstones/ingest=$tag")
  }

  /** Fold an index's whole ingest history — base build, appends, and
    * tombstone deletions with their negative dictionary/stats ingests —
    * into ONE fresh ingest under `out`: the MOR store's `compact()`
    * applied to sparse retrieval, completing the index lifecycle
    * (build → append → delete → compact). Reads ONLY index artifacts;
    * the corpus is never re-tokenized:
    *  - live postings (minus tombstoned docs) rewrite in the same
    *    term-bucketed layout — O(live index), embarrassingly parallel;
    *  - the per-ingest dictionaries and stats fold by the EXACT
    *    additive sums [[servedIndex]] computes on every query, so
    *    serving from the compacted index is byte-identical by
    *    construction (the oracle still proves it end to end);
    *  - terms whose containing docs were all erased drop out
    *    (folded df ≤ 0), and the tombstone list disappears.
    * After enough append/delete cycles this is what stops the read
    * side paying per query for dead history: the anti-join, the
    * multi-ingest dictionary fold, and the deleted postings rows all
    * go away in one corpus-free rewrite. */
  private[ops] def compactIndex(s: SparkSession, dir: String,
      out: String): Unit = {
    livePostings(s, dir)
      .select(col("term"), col("doc_id"), col("dl"), col("positions"),
        col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$out/postings/ingest=base")
    s.read.parquet(s"$dir/terms")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
      .write.mode("overwrite").parquet(s"$out/terms/ingest=base")
    s.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$out/stats/ingest=base")
  }

  /** The live postings scan — every serving path (BM25 scoring, phrase
    * adjacency) reads through here, so tombstoned docs are unfindable
    * everywhere. The existence probe is metadata-only; the anti-join
    * broadcasts the (tiny) tombstone list over the bucket-pruned scan. */
  private def livePostings(s: SparkSession, dir: String): DataFrame = {
    val post = s.read.parquet(s"$dir/postings")
    val tPath = new org.apache.hadoop.fs.Path(s"$dir/_tombstones")
    val fs = tPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(tPath))
      post.join(broadcast(s.read.parquet(s"$dir/_tombstones")
          .select(col("doc_id"))), Seq("doc_id"), "left_anti")
    else post
  }

  /** Build-or-reuse the memoized full-corpus index (one per session ×
    * corpus — the production build-once/serve-many shape; the bench
    * clears it at the family boundary). */
  private val postingsIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  def clearCaches(): Unit = postingsIndexCache.clear()

  private def postingsIndexDir(s: SparkSession, d: String): String =
    postingsIndexCache.computeIfAbsent((s, d), { _ =>
      val p = s"${System.getProperty("java.io.tmpdir")}/graft-postings-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(p)
      writePostingsIngest(Tables.documents(s, d), p, "base")
      p
    })

  /** The served index read: per-ingest dictionaries/stats summed
    * (vocab-sized aggregations), postings exposed with derived tf. */
  private def servedIndex(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val stats = s.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        (sum(col("sum_dl")).cast("double") / sum(col("n_docs"))).as("avgdl"))
    val dfreq = s.read.parquet(s"$dir/terms")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    (livePostings(s, dir), dfreq, stats)
  }

  /** Adjacent (t1, t2) candidate bigrams for the phrase search,
    * ADJACENCY-FIRST: the two vocab-pruned positional streams join on
    * (doc_id, pos) — each document position holds exactly one token, so
    * the join emits at most one candidate per t1-vocab occurrence:
    * volume is LINEAR in the pruned postings no matter how skewed the
    * query phrases are. The tempting phrase-side-first shapes are both
    * quadratic under a hot first term: joining postings to per-QUERY
    * phrases on t1 costs df(t1) × queries, and even deduping to
    * distinct phrases still costs df(t1) × |phrases starting t1| —
    * both products grow with N² when "the …" dominates (and the BM25
    * stop-term prune cannot apply: adjacency needs those positions).
    * PhraseSkewProbe plants exactly that hot first term and measures
    * the three volumes. */
  private[ops] def phraseBigramCandidates(s: SparkSession, dir: String,
      phrases: DataFrame): DataFrame = {
    def pruned(terms: DataFrame) =
      livePostings(s, dir)
        .join(broadcast(terms.distinct()
          .withColumn("bucket", bucketOf(col("term")))),
          Seq("bucket", "term"), "left_semi")
        .select(col("doc_id"), col("term"),
          explode(col("positions")).as("pos"))
    val p1 = pruned(phrases.select(col("t1").as("term")))
      .select(col("doc_id"), col("term").as("t1"), col("pos"))
    val p2 = pruned(phrases.select(col("t2").as("term")))
      .select(col("doc_id"), col("term").as("t2"),
        (col("pos") - 1).as("pos"))
    p1.join(p2, Seq("doc_id", "pos"))
  }

  /** Positional phrase hits (query_id, doc_id, n_occur) served from the
    * persisted index (positions come off the SAME bucket-pruned
    * postings the BM25 side reads): adjacency-first candidates, then
    * the distinct-phrase filter, then per-(phrase, doc) occurrence
    * counts fan back out to queries only at OUTPUT size. */
  private[ops] def phraseHitsFrom(s: SparkSession, dir: String,
      phrases: DataFrame): DataFrame = {
    val ph = phrases.select(col("t1"), col("t2")).distinct()
    val occ = phraseBigramCandidates(s, dir, phrases)
      .join(broadcast(ph), Seq("t1", "t2"))
      .groupBy(col("t1"), col("t2"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_occur"))
    occ.join(broadcast(phrases), Seq("t1", "t2"))
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("n_occur"))
  }

  /** BM25 ranks SERVED from a persisted index: the scoring join carries
    * the bucket partition key (dynamic partition pruning skips buckets
    * with no query term), tf derives from the positions list, and the
    * quantized arithmetic is the exact expression [[bm25Ranks]] used to
    * compute inline — served output is byte-identical. */
  private[ops] def bm25RanksFrom(s: SparkSession, dir: String,
      docs: DataFrame, depth: Int): DataFrame = {
    val (post, dfreq, stats) = servedIndex(s, dir)
    // stop-term prune on the QUERY side, against the vocab-sized
    // dictionary, BEFORE any postings row is touched: a stop term's
    // df ≈ N postings rows are never even scanned (strictly better
    // than the inline pipeline's postings-side prune)
    val qt = queryTermsOf(docs).withColumn("bucket", bucketOf(col("term")))
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .where(col("df") * StopDen <= col("n_docs") * StopNum)
    val contrib = post
      .select(col("bucket"), col("term"), col("doc_id"),
        size(col("positions")).cast("long").as("tf"), col("dl"))
      .join(qt, Seq("bucket", "term"))
      .where(col("doc_id") =!= col("query_id"))
      .withColumn("ci",
        floor(log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * (lit(K1) + 1)
          / (col("tf") + lit(K1) * (lit(1) - lit(B) + lit(B) * col("dl") / col("avgdl")))
          * lit(1000000.0) + lit(0.5)).cast("long"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(round4(sum(col("ci")) / lit(1000000.0)).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= depth)
  }

  /** (query_id, term) — the distinct first-[[QueryTerms]] tokens of
    * each query document. */
  private[ops] def queryTermsOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("doc_id") % QueryMod === 0)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(TextOps.tokens(col("text")), 1, QueryTerms)))
          .as("term"))

  private def queryTerms(s: SparkSession, d: String): DataFrame =
    queryTermsOf(Tables.documents(s, d))

  /** BM25-ranked (query_id, rank, doc_id, score) down to `depth`,
    * SERVED FROM THE PERSISTED INDEX ([[postingsIndexDir]] — built once
    * per session × corpus, reused by every retrieval query).
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the always-positive
    * Robertson/Spärck Jones form); the arithmetic is written in the
    * exact textual order the oracle uses so both engines fold the same
    * doubles — the oracle is unchanged from the rebuilt-per-run
    * pipeline this replaced. */
  private[ops] def bm25Ranks(s: SparkSession, d: String, depth: Int): DataFrame =
    bm25RanksFrom(s, postingsIndexDir(s, d), Tables.documents(s, d), depth)

  /** Dense ranks for the same query ids over `embeddings` (vec_id ≡
    * doc_id in this corpus), down to `depth` — SERVED FROM THE PERSISTED
    * IVFADC INDEX (cell-pruned partition scan over 8-byte PQ codes, ADC
    * top-250, exact re-rank; [[Similarity.ivfadcServedRanks]]). The old
    * broadcast-NLJ exact-cosine scan was O(corpus × queries) full-vector
    * work per batch — correct, but the one hybrid-retrieval stage that
    * could not survive a 100x corpus. It survives below as the recall
    * audit baseline ([[denseRanksExact]] / `retrieval_dense_recall`). */
  private[ops] def denseRanks(s: SparkSession, d: String, depth: Int): DataFrame =
    Similarity.ivfadcServedRanks(s, d, _ % QueryMod === 0,
        adcDepth = 250, finalDepth = depth)
      .select(col("query_id"), col("rn").as("rank"),
        col("neighbor").as("doc_id"))

  /** The exact brute-force dense top-`depth` — the recall yardstick the
    * index-served ranks are audited against (never the serving path). */
  private[ops] def denseRanksExact(s: SparkSession, d: String, depth: Int): DataFrame = {
    val vecs = Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
    val q = vecs.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = vecs.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        round(Similarity.dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= depth)
      .select(col("query_id"), col("rank"), col("vec_id").as("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Okapi BM25 top-5: each query doc's first-8-token prefix
    // scored against the whole corpus through the inverted index.
    "retrieval_bm25_topk" -> ((s, d) =>
      bm25Ranks(s, d, depth = 5)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("doc_id"), col("score"))
        .orderBy(col("query_id"), col("rank"))),

    // ---- hybrid sparse+dense fusion: RRF over the BM25 top-20 and the
    // exact-cosine top-20, rrf = Σ 1/(60 + rank) across the lists a doc
    // appears in (absent list contributes 0). The fusion input is two
    // top-k lists — queries × 2k narrow rows — so fusion cost is
    // independent of corpus size; the rrf score is a sum of exact
    // reciprocals evaluated sparse-then-dense on both engines, rounded
    // to 6 decimals for the rank tie-break contract.
    "retrieval_hybrid_rrf" -> ((s, d) => {
      val sparse = bm25Ranks(s, d, FuseDepth)
        .select(col("query_id"), col("doc_id"), col("rank").as("rs"))
      val dense = denseRanks(s, d, FuseDepth)
        .select(col("query_id"), col("doc_id"), col("rank").as("rd"))
      val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          floor((coalesce(lit(1.0) / (lit(RrfK) + col("rs")), lit(0.0))
            + coalesce(lit(1.0) / (lit(RrfK) + col("rd")), lit(0.0)))
            * lit(1000000.0) + lit(0.5)) / 1000000)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("doc_id"), col("rrf"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- positional phrase search: the inverted index extended with
    // token POSITIONS — the "exact phrase" query bag-of-words BM25
    // cannot answer. Each query doc's first two tokens form its
    // phrase; a hit is adjacent positions (p, p+1) in another doc.
    // Scale shape: positional postings are pruned to the PHRASE
    // VOCABULARY first (broadcast semi-join on the distinct query
    // terms), so the adjacency self-join runs over candidate rows
    // only, shuffled on (doc, term, pos) — never the whole postings
    // table, and never doc × query.
    "retrieval_phrase" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val phrases = docs.filter(col("doc_id") % QueryMod === 0)
        .select(col("doc_id").as("query_id"),
          element_at(TextOps.tokens(col("text")), 1).as("t1"),
          element_at(TextOps.tokens(col("text")), 2).as("t2"))
      phraseHitsFrom(s, postingsIndexDir(s, d), phrases)
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // ---- incremental index append (the `ann_ivfpq_append` of sparse
    // retrieval): base corpus indexed, a disjoint batch appended as its
    // own ingest — postings, dictionary, and stats subdirectories only,
    // nothing rewritten — then BM25 served over base+batch. Shares
    // retrieval_bm25_topk's oracle verbatim: append-then-serve must be
    // byte-identical to single-shot full-corpus indexing.
    "retrieval_index_append" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-postapp-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val docs = Tables.documents(s, d)
      writePostingsIngest(docs.filter(col("doc_id") % 5 =!= 4), dir, "base")
      writePostingsIngest(docs.filter(col("doc_id") % 5 === 4), dir, "b1")
      bm25RanksFrom(s, dir, docs, depth = 5)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("doc_id"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- index DELETION without rebuild: a batch of opt-out doc ids
    // (never the query docs — the erasure request targets corpus
    // content) lands as a tombstone list + negative dictionary/stats
    // ingests; BM25 then serves over the survivors with EXACT df and
    // avgdl — shares the full-rebuild arithmetic, and the oracle
    // recomputes BM25 over `documents` minus the deleted set, so one
    // stale df or one surviving tombstoned doc is a hash mismatch.
    "retrieval_index_delete" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-postdel-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val docs = Tables.documents(s, d)
      writePostingsIngest(docs, dir, "base")
      deleteFromIndex(s, dir, "d1",
        docs.filter(col("doc_id") % 7 === 3 && col("doc_id") % QueryMod =!= 0)
          .select(col("doc_id")))
      bm25RanksFrom(s, dir, docs, depth = 5)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("doc_id"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- index COMPACTION: the full lifecycle — base build over 2/3
    // of the corpus, an append ingest for the rest, a tombstone
    // deletion batch — folded into one fresh ingest, then served. The
    // compacted index must answer exactly like the fragmented one, and
    // the oracle recomputes BM25 from scratch over the surviving
    // corpus, so the fold must preserve df/avgdl/n_docs to the bit
    // while physically dropping every tombstone and dead-history row.
    "retrieval_index_compact" -> ((s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-postcmp-${System.nanoTime()}"
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-postcmp-out-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      graft.util.TempDirs.deleteOnExit(out)
      val docs = Tables.documents(s, d)
      writePostingsIngest(docs.filter(col("doc_id") % 3 =!= 2), dir, "base")
      writePostingsIngest(docs.filter(col("doc_id") % 3 === 2), dir, "a1")
      deleteFromIndex(s, dir, "d1",
        docs.filter(col("doc_id") % 5 === 0 && col("doc_id") % QueryMod =!= 0)
          .select(col("doc_id")))
      compactIndex(s, dir, out)
      bm25RanksFrom(s, out, docs, depth = 5)
        .select(col("query_id"), col("rank").cast("int").as("rank"),
          col("doc_id"), col("score"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- recall audit for the index-served dense side (mirror of the
    // ann_*_recall twins): |served top-20 ∩ exact top-20| / |exact|
    // must clear the 0.7 floor — a deterministic property of the fixed
    // trained centroids/codebooks on this corpus, so the one-row
    // summary is oracle-checkable. Runs BOTH pipelines by design.
    "retrieval_dense_recall" -> ((s, d) => {
      val exact = denseRanksExact(s, d, FuseDepth)
        .select(col("query_id"), col("doc_id"))
      val served = denseRanks(s, d, FuseDepth)
        .select(col("query_id"), col("doc_id"))
      val hits = exact.join(served, Seq("query_id", "doc_id"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
        .select(col("n_exact"), col("n_hit"),
          (col("n_hit") >= col("n_exact") * 0.7).cast("int").as("recall_ok"))
    }))

  /** Shared BM25 CTE block: postings, corpus stats, query terms, and
    * the ranked list down to `depth` — the same arithmetic order as the
    * Scala pipeline, contributions quantized to 1e-6 longs before the
    * order-free sum. */
  private def bm25Ctes(depth: Int, docWhere: String = "TRUE"): String =
    s"""toks AS (SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS tk
           FROM documents WHERE $docWhere),
        dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
               GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        stats AS (SELECT count(*) AS n_docs,
            sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
        q AS (SELECT DISTINCT query_id, term FROM (
                SELECT doc_id AS query_id, unnest(tk[1:$QueryTerms]) AS term
                FROM toks WHERE doc_id % $QueryMod = 0) qt),
        contrib AS (
          SELECT q.query_id, tf.doc_id,
            CAST(floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
              * tf * ($K1 + 1)
              / (tf + $K1 * (1 - $B + $B * dl.dl / avgdl))
              * 1000000.0 + 0.5) AS BIGINT) AS ci
          FROM q JOIN tf USING (term) JOIN dfreq USING (term)
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats
          WHERE tf.doc_id <> q.query_id
            AND df * $StopDen <= n_docs * $StopNum),
        bmscored AS (
          SELECT query_id, doc_id,
            floor((sum(ci) / 1000000.0) * 10000 + 0.5) / 10000 AS score
          FROM contrib GROUP BY 1, 2),
        bmranked AS (
          SELECT query_id, doc_id, score,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS rank
          FROM bmscored QUALIFY rank <= $depth)"""

  private val bm25TopkSql =
    s"""WITH ${bm25Ctes(5)}
       SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
       FROM bmranked ORDER BY query_id, rank"""

  def oracleSql: Map[String, String] = Map(
    "retrieval_bm25_topk" -> bm25TopkSql,
    // append-then-serve ≡ full rebuild: the incremental index must
    // reproduce the single-shot BM25 answer bit-for-bit
    "retrieval_index_append" -> bm25TopkSql,
    // delete-then-serve ≡ never-indexed: BM25 recomputed from scratch
    // over the SURVIVING corpus (df, avgdl, n_docs all shrink) — the
    // query docs are excluded from the erasure set, so the query side
    // is unchanged
    "retrieval_index_delete" ->
      s"""WITH ${bm25Ctes(5, s"NOT (doc_id % 7 = 3 AND doc_id % $QueryMod <> 0)")}
         SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
         FROM bmranked ORDER BY query_id, rank""",
    // compact(base + append + delete) ≡ one fresh index over the
    // survivors: same from-scratch recomputation shape as the delete
    // oracle, different erasure set
    "retrieval_index_compact" ->
      s"""WITH ${bm25Ctes(5, s"NOT (doc_id % 5 = 0 AND doc_id % $QueryMod <> 0)")}
         SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
         FROM bmranked ORDER BY query_id, rank""",
    // dense side = the full IVFADC index search recomputed end-to-end
    // (training CTEs included — the same block ann_ivfpq_bucketed's
    // oracle runs), ranked exactly as the served pipeline ranks
    "retrieval_hybrid_rrf" ->
      s"""WITH ${bm25Ctes(FuseDepth)},
          ${Similarity.ivfadcSearchCtes("TRUE", s"vec_id % $QueryMod = 0", 250)},
          dsranked AS (
            SELECT query_id, neighbor AS doc_id, rank FROM (
              SELECT query_id, neighbor,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor) AS rank
              FROM rer) t
            WHERE rank <= $FuseDepth),
          fused AS (
            SELECT COALESCE(s.query_id, d.query_id) AS query_id,
              COALESCE(s.doc_id, d.doc_id) AS doc_id,
              floor((COALESCE(1.0 / ($RrfK + s.rank), 0.0)
                + COALESCE(1.0 / ($RrfK + d.rank), 0.0))
                * 1000000.0 + 0.5) / 1000000 AS rrf
            FROM bmranked s FULL OUTER JOIN dsranked d
              ON d.query_id = s.query_id AND d.doc_id = s.doc_id)
         SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf FROM (
           SELECT query_id, doc_id, rrf,
             row_number() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, doc_id) AS rank
           FROM fused) t
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // phrase = the query doc's first two tokens; adjacency replayed on
    // 1-based list positions (only counts cross the engine boundary)
    "retrieval_phrase" ->
      s"""WITH toks AS (SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS t FROM documents),
          posting AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, t
                      FROM toks),
          post AS (SELECT doc_id, pos, t[pos] AS term FROM posting),
          phr AS (SELECT doc_id AS query_id, t[1] AS t1, t[2] AS t2
                  FROM toks WHERE doc_id % $QueryMod = 0),
          hits AS (SELECT p.query_id, a.doc_id
                   FROM phr p
                   JOIN post a ON a.term = p.t1
                   JOIN post b ON b.doc_id = a.doc_id
                     AND b.pos = a.pos + 1 AND b.term = p.t2
                   WHERE a.doc_id <> p.query_id)
         SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_occur
         FROM hits GROUP BY query_id, doc_id ORDER BY query_id, doc_id""",
    // the audit fully REPLAYED (the Similarity-audit fix applied here
    // too — the last hardcoded audit oracle): exact brute-force
    // top-FuseDepth, the index-served search (the shared IVFADC CTEs),
    // and the recall comparison itself — n_exact/n_hit/recall_ok are
    // all DERIVED, so a fixture or depth change surfaces as a recall
    // failure, never an opaque hash mismatch
    "retrieval_dense_recall" ->
      s"""WITH ${Similarity.ivfadcSearchCtes(
              "TRUE", s"vec_id % $QueryMod = 0", 250)},
          served AS (
            SELECT query_id, neighbor AS doc_id FROM (
              SELECT query_id, neighbor,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor) AS rank
              FROM rer) t
            WHERE rank <= $FuseDepth),
          ex_scored AS (
            SELECT q.vec_id AS query_id, b.vec_id AS doc_id,
              round(CAST(list_cosine_similarity(q.embedding, b.embedding)
                AS DOUBLE), 4) AS cos
            FROM embeddings q JOIN embeddings b ON b.vec_id <> q.vec_id
            WHERE q.vec_id % $QueryMod = 0),
          ex AS (
            SELECT query_id, doc_id FROM (
              SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, doc_id) AS rank
              FROM ex_scored) t
            WHERE rank <= $FuseDepth),
          hits AS (
            SELECT e.query_id FROM ex e JOIN served v
            ON v.query_id = e.query_id AND v.doc_id = e.doc_id)
          SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
            CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hit,
            CAST(CASE WHEN (SELECT count(*) FROM hits)
                  >= 0.7 * (SELECT count(*) FROM ex)
                THEN 1 ELSE 0 END AS INT) AS recall_ok""")
}
