package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Empirical scale probe for the dedup/ANN candidate-generation claims
  * (round-5 verdict item 3): the df-cap, the MinHash band parameters,
  * and the LSH bucket join are argued to keep candidate volume ~linear
  * in corpus size even under boilerplate skew — this main MEASURES that
  * on synthetic corpora scaled 1×/3×/10× from the sf documents table.
  *
  * Corpus construction:
  *  - each scale factor unions k suffix-perturbed copies of the corpus
  *    (every token gets a `zzK` suffix, which PRESERVES the per-copy
  *    shingle statistics exactly), so copies share no shingles and the
  *    true near-dup structure replicates exactly k× — linear candidate
  *    growth is the CORRECT answer, quadratic is the failure mode
  *    being probed;
  *  - a third of all docs (hashed choice) get the same 40-token
  *    boilerplate tail, the planted skew: its shingles reach df ≈ n/3,
  *    far past the 1000 cap at 10× — without the cap those keys alone
  *    would contribute C(n/3, 2) candidate rows.
  *
  * Prints one JSON line per factor; BENCH_NOTES.md records the table.
  */
object ScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-scale-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val boiler = (1 to 40).map(i => s"boilerplate$i").mkString(" ")

    factors.foreach { f =>
      val docs = (0 until f).map { rep =>
        docs0.select(
          concat(col("doc_id").cast("string"), lit(s"_r$rep")).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1zz$rep").as("text"))
      }.reduce(_ unionAll _)
      val skewed = docs.withColumn("text",
        when(abs(xxhash64(col("doc_id"))) % 3 === 0,
          concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))

      // shingle table (same construction as Dedup.shingleTables)
      val sh = skewed
        .select(col("doc_id"), Dedup.shingles(TextOps.tokens(col("text"))).as("sh"))
        .filter(size(col("sh")) > 0)
      val ex = sh
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("hs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = skewed.count()
      val nShingleRows = ex.count()

      // skew evidence: df distribution + the candidate-row volume the
      // df-cap avoids, computed analytically (sum of C(df,2) per key)
      val dfs = ex.groupBy(col("hs")).agg(count(lit(1)).as("df")).persist()
      val Array(maxDf, hotKeys, uncappedRows, cappedRows) = dfs.agg(
        max(col("df")),
        sum(when(col("df") > Dedup.ShingleDfCap, 1L).otherwise(0L)),
        sum(col("df") * (col("df") - 1) / 2),
        sum(when(col("df") <= Dedup.ShingleDfCap,
          col("df") * (col("df") - 1) / 2).otherwise(0L)))
        .collect().head.toSeq.map(x => x.toString.toDouble.toLong).toArray
      dfs.unpersist()

      // measured capped candidate generation (the shipped path)
      val (nCand, tCand) = timed(Dedup.shinglePairsCapped(ex, Dedup.ShingleDfCap).count())
      // MinHash band-bucket candidates (the shipped 16x3 parameters)
      val (nBand, tBand) = timed {
        val bands = Dedup.minhashBands(Dedup.belowCap(ex, Dedup.ShingleDfCap))
        val a = bands.select(col("doc_id").as("i"), col("band"), col("bandHash"))
        val b = bands.select(col("doc_id").as("j"), col("band"), col("bandHash"))
        a.join(b, Seq("band", "bandHash")).filter(col("i") < col("j"))
          .select(col("i"), col("j")).distinct().count()
      }
      // Bloom decontamination path: survivors of the might_contain
      // prefilter vs total corpus shingle rows — i.e. the exact-verify
      // join's probe side. Linear scaling looks like
      // survivors ≈ true_hits + FPR × train_rows at every factor.
      val shim = org.apache.spark.sql.GraftShim
      val isEval = abs(xxhash64(col("doc_id"))) % 97 === 0
      val evalHs = ex.filter(isEval).select(col("hs")).distinct()
      val trainHs = ex.filter(!isEval)
      val bloomDf = evalHs.agg(
        shim.bloomFilterAgg(col("hs"), 1L << 20, 1L << 23).as("bf"))
      val (nSurv, tBloom) = timed {
        trainHs.filter(shim.mightContain(
          shim.scalarSubquery(bloomDf), col("hs"))).count()
      }
      val nTrue = trainHs.join(evalHs, "hs").count()
      val nTrain = trainHs.count()

      ex.unpersist()

      // embedding LSH bucket join at the same replication factor
      val emb0 = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val dim = Similarity.embDim(spark, sfDir)
      val emb = (0 until f).map { rep =>
        // rep-scaled copies: shift each copy by a tiny rep-dependent
        // offset on one dimension so copies are distinct but clustered
        emb0.select(
          concat(col("vec_id").cast("string"), lit(s"_r$rep")).as("doc_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(rep * 1e-3f)).otherwise(x))
            .as("embedding"))
      }.reduce(_ unionAll _)
      // candidate-pair VOLUME analytically (sum of C(bucket,2) over
      // buckets) — the join itself at 10x would materialize exactly the
      // quadratic blow-up being measured, so count it, don't run it
      val (nEmbCand, tEmb) = timed {
        val rows = Similarity.lshRowsFor(emb.count())
        val banded = emb.select(col("doc_id"),
          posexplode(Similarity.lshBands(col("embedding"), dim, rows))
            .as(Seq("band", "sig")))
        banded.groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
          .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")))
          .collect().head.getLong(0)
      }

      println(s"""{"factor":$f,"docs":$nDocs,"shingle_rows":$nShingleRows,""" +
        s""""max_df":$maxDf,"hot_keys":$hotKeys,""" +
        s""""uncapped_cand_rows":$uncappedRows,"capped_cand_rows":$cappedRows,""" +
        s""""ngram_candidates":$nCand,"ngram_sec":${f"$tCand%.2f"},""" +
        s""""minhash_candidates":$nBand,"minhash_sec":${f"$tBand%.2f"},""" +
        s""""emb_lsh_candidates":$nEmbCand,"emb_lsh_sec":${f"$tEmb%.2f"},""" +
        s""""bloom_train_rows":$nTrain,"bloom_survivors":$nSurv,""" +
        s""""bloom_true_hits":$nTrue,"bloom_sec":${f"$tBloom%.2f"}}""")
    }
    spark.stop()
  }
}

/** Streaming-state scale probe (round 8 — the streaming analog of
  * [[ScaleProbe]]'s candidate-volume proof): measures state-store rows
  * and bytes for the three stateful streaming shapes (session windows,
  * stream-stream join, exact dedup) at 1×/3×/10× event volume.
  *
  * Scaling model: copies are shifted in TIME (same per-window event
  * rate, k× longer stream — how a production stream actually grows),
  * so WATERMARK EVICTION should hold session/join state ~FLAT while
  * input grows k×; the unbounded-without-watermark baseline is the
  * input row count itself. Dedup state (no watermark by design) is
  * bounded by KEY cardinality — constant here since copies share the
  * user×type key space. The scaled stream is written as 8 time-ordered
  * parquet slices consumed one per micro-batch (`maxFilesPerTrigger=1`)
  * — with one mega-batch the watermark would never advance and
  * eviction would never run, and the probe would measure nothing.
  *
  * Prints one JSON line per factor; BENCH_NOTES.md records the table.
  */
object StreamStateProbe {

  import org.apache.spark.sql.streaming.Trigger

  private def stateOf(df: DataFrame, mode: String): (Long, Long, Long) = {
    val q = df.writeStream.outputMode(mode).format("noop")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
    val perBatch = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
    val finalRows = perBatch.lastOption.getOrElse(0L)
    val maxRows = perBatch.foldLeft(0L)(math.max)
    val bytes = progs.lastOption
      .map(_.stateOperators.map(_.memoryUsedBytes).sum).getOrElse(0L)
    (finalRows, maxRows, bytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val spark = SparkSession.builder()
      .appName("graft-stream-state-probe")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev0 = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val Array(loTs, hiTs) = ev0
      .agg(min(col("ts").cast("long")), max(col("ts").cast("long")))
      .collect().head.toSeq.map(_.toString.toLong).toArray
    val span = hiTs - loTs + 3600

    factors.foreach { f =>
      val scaled = (0 until f).map { r =>
        ev0.withColumn("ts",
          (col("ts").cast("long") + lit(r.toLong * span)).cast("timestamp"))
          .withColumn("event_id", col("event_id") + lit(r.toLong * 1000000000L))
      }.reduce(_ unionAll _)
      val nInput = scaled.count()

      // time-ordered slices, one file per micro-batch. The slice COUNT
      // scales with the factor so each micro-batch covers a CONSTANT
      // time horizon (a real stream's trigger interval doesn't stretch
      // because the stream got longer) — with a fixed slice count the
      // per-batch state would grow with f and mask the eviction story.
      val nSlices = 8 * f
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-ssp-$f").toString
      val streamDir = s"$dir/stream"
      new java.io.File(streamDir).mkdirs()
      val sliceSpan = math.max(1L, span * f / nSlices)
      (0 until nSlices).foreach { i =>
        val stage = s"$dir/stage$i"
        scaled.filter(
          ((col("ts").cast("long") - loTs) / sliceSpan).cast("int")
            === math.min(i, nSlices - 1))
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(streamDir, f"s$i%03d.parquet"))
      }
      def stream = spark.readStream
        .schema(spark.read.parquet(streamDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir)

      // session windows: watermark closes sessions 30 min behind the
      // max event time — state = open sessions, flat in stream length
      val (sessF, sessM, sessB) = stateOf(
        stream.withWatermark("ts", "30 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events")), "append")

      // stream-stream join: watermarks bound BOTH buffers to the
      // 30-minute match horizon
      val views = stream.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .withWatermark("v_ts", "30 minutes")
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "30 minutes")
      val (joinF, joinM, joinB) = stateOf(
        views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES")),
        "append")

      // exact dedup: state = distinct keys (no watermark by design) —
      // bounded by key cardinality, not stream length
      val (dedF, dedM, dedB) = stateOf(
        stream.select(col("user_id"), col("event_type"))
          .dropDuplicates("user_id", "event_type"), "append")

      println(s"""{"factor":$f,"input_rows":$nInput,""" +
        s""""session_state_final":$sessF,"session_state_max":$sessM,""" +
        s""""session_state_bytes":$sessB,""" +
        s""""join_state_final":$joinF,"join_state_max":$joinM,""" +
        s""""join_state_bytes":$joinB,""" +
        s""""dedup_state_final":$dedF,"dedup_state_max":$dedM,""" +
        s""""dedup_state_bytes":$dedB}""")
    }
    spark.stop()
  }
}

/** Dictionary-encoding shuffle-bytes probe (round 8): measures the
  * actual shuffle WRITE bytes of the same 4-pattern BGP executed over
  * raw term strings vs dictionary-encoded longs, at 1×/3×/10× quad
  * volume — the empirical backing for TermDictionary's claim that id
  * space shrinks query-time shuffles by the average-term-length
  * factor. The one-time dictionary build+encode cost is measured
  * separately (it shuffles strings by construction); the claim is
  * about QUERY-time shuffles over the persisted encoded form.
  *
  * Prints one JSON line per factor; BENCH_NOTES.md records the table.
  */
/** Retrieval-family scale probe (round-9 verdict item 7 — the analog
  * of [[ScaleProbe]]'s dedup candidate-volume proof): measures BM25
  * scoring-join volume and IVF probe volume at 1×/3×/10× corpus with a
  * PLANTED STOP WORD ("the" prepended to every document, so it lands in
  * every doc AND every query's first-8-token prefix with df = N).
  *
  * Scaling model: suffix-perturbed copies (disjoint vocabularies, so
  * per-copy df stays constant) — normal query terms match only their
  * own copy and the matched-postings volume grows LINEARLY; the planted
  * stop term matches EVERY copy, so without the [[Retrieval]] stop-term
  * prune its contribution alone is queries × corpus = QUADRATIC in the
  * factor. Volumes are computed analytically (Σ df over query terms) —
  * materializing the uncapped join at 10× would BE the blow-up being
  * probed. Prints one JSON line per factor; BENCH_NOTES.md records the
  * table.
  */
object RetrievalScaleProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-retrieval-scale-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel

    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

    factors.foreach { f =>
      // doc_id stays LONG (query selection is doc_id % 50): copies get
      // disjoint id ranges; the planted stop word leads every text so
      // it enters each query's first-8-token prefix
      val docs = (0 until f).map { rep =>
        docs0.select(
          (col("doc_id") + lit(rep * 1000000000L)).as("doc_id"),
          concat(lit("the "),
            regexp_replace(col("text"), "(\\S+)", s"$$1zz$rep")).as("text"))
      }.reduce(_ unionAll _)

      val post = Retrieval.postingsOf(docs)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nDocs = docs.count()
      val nPost = post.count()
      val qt = Retrieval.queryTermsOf(docs)
      val nQueries = qt.select(col("query_id")).distinct().count()

      // vocabulary stats + the planted skew's footprint
      val dfreq = post.select(col("term"), col("df")).distinct()
      val Array(vocab, maxDf, stopTerms) = dfreq.agg(
        count(lit(1)), max(col("df")),
        sum(when(col("df") * 10 > nDocs * 9, 1L).otherwise(0L)))
        .collect().head.toSeq.map(x => x.toString.toDouble.toLong).toArray

      // scoring-join volume, analytically: Σ over (query, term) of df —
      // the exact row count the postings⨝query join materializes
      val qdf = qt.join(dfreq, "term")
      val Array(uncapped, capped) = qdf.agg(
        sum(col("df")),
        sum(when(col("df") * 10 <= nDocs * 9, col("df")).otherwise(0L)))
        .collect().head.toSeq.map(x => x.toString.toDouble.toLong).toArray

      // the shipped capped path, end to end (top-5 per query)
      val (nRanked, tBm25) = timed {
        val stats = docs
          .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("dl"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
        val contrib = post
          .crossJoin(broadcast(stats))
          .where(col("df") * 10 <= col("n_docs") * 9)
          .join(qt, "term")
          .where(col("doc_id") =!= col("query_id"))
        contrib.groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("tf")).as("s"))
          .count()
      }
      post.unpersist()

      // IVF probe volume at the same factor: candidates = Σ over
      // (query, probed cell) of cell size, vs brute = queries × corpus.
      // Copies shift one dimension so cells separate per copy.
      val emb0 = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val dim = Similarity.embDim(spark, sfDir)
      val emb = (0 until f).map { rep =>
        emb0.select(
          (col("vec_id") + lit(rep * 1000000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(rep * 1e-3f)).otherwise(x))
            .as("embedding"))
      }.reduce(_ unionAll _)
      // one training, two query populations: ann search (% 250) and
      // hard-negative mining (% 28) — embed_hard_negatives' index-served
      // candidate volume is probed by the same machinery it serves from
      val ((vols, nVecs), tIvf) = timed {
        Similarity.ivfProbeVolumes(emb, dim, Seq(250, 28))
      }
      val (ivfCand, nEmbQ) = vols(250)
      val (hnCand, nHnQ) = vols(28)

      println(s"""{"factor":$f,"docs":$nDocs,"posting_rows":$nPost,""" +
        s""""vocab":$vocab,"max_df":$maxDf,"stop_terms":$stopTerms,""" +
        s""""queries":$nQueries,"uncapped_join_rows":$uncapped,""" +
        s""""capped_join_rows":$capped,"bm25_scored_pairs":$nRanked,""" +
        s""""bm25_sec":${f"$tBm25%.2f"},"ivf_candidates":$ivfCand,""" +
        s""""ivf_brute_pairs":${nEmbQ * nVecs},""" +
        s""""hn_candidates":$hnCand,""" +
        s""""hn_brute_pairs":${nHnQ * nVecs},""" +
        s""""ivf_sec":${f"$tIvf%.2f"}}""")
    }
    spark.stop()
  }
}

object DictShuffleProbe {

  private final class ShuffleBytes
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** Run `f`, return (result, shuffle bytes its stages wrote). The
    * listener bus is async; a short settle keeps the tally complete —
    * fine for a probe, never used in the engine. */
  private def measured[T](spark: SparkSession)(f: => T): (T, Long) = {
    val l = new ShuffleBytes
    spark.sparkContext.addSparkListener(l)
    val r = f
    Thread.sleep(1500)
    spark.sparkContext.removeSparkListener(l)
    (r, l.bytes.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-dict-shuffle-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE may elide small shuffles entirely; keep it ON (production
      // shape) — the comparison is like-for-like on both sides
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel

    val ev0 = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))

    factors.foreach { f =>
      val ev = (0 until f).map(r =>
        ev0.withColumn("event_id", col("event_id") + lit(r * 1000000000L)))
        .reduce(_ unionAll _)
      val g = lit(graft.model.Quad.DefaultGraph).as("graph")
      val subj = concat(lit("http://ex/ev/"), col("event_id")).as("s")
      val nullS = lit(null).cast("string")
      val quads = ev.select(g, subj, lit("http://ex/p/type").as("p"),
          col("event_type").as("o_value"), nullS.as("o_type"),
          nullS.as("o_lang"), lit("literal").as("o_kind"))
        .unionByName(ev.select(g, subj, lit("http://ex/p/user").as("p"),
          concat(lit("http://ex/u/"), col("user_id")).as("o_value"),
          nullS.as("o_type"), nullS.as("o_lang"), lit("iri").as("o_kind")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nQuads = quads.count()

      // raw-string BGP: users with both a purchase and an error event
      def rawQuery(): Long = {
        def typed(t: String) = quads
          .filter(col("p") === "http://ex/p/type" && col("o_value") === t)
          .select(col("s"))
        val userEdge = quads.filter(col("p") === "http://ex/p/user")
          .select(col("s"), col("o_value").as("u"))
        typed("purchase").join(userEdge, "s").select(col("u"))
          .intersect(typed("error").join(userEdge, "s").select(col("u")))
          .count()
      }

      // one-time build: dictionary + encoded quads, materialized
      import graft.model.TermDictionary
      val ((dict, enc), buildBytes) = measured(spark) {
        val dict = TermDictionary.dictionary(quads)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val enc = TermDictionary.encode(quads, dict)
          .persist(StorageLevel.MEMORY_AND_DISK)
        dict.count(); enc.count()
        (dict, enc)
      }

      def dictQuery(): Long = {
        val ids = TermDictionary.constantIds(dict, Seq(
          "http://ex/p/type", "http://ex/p/user",
          "\"purchase\"", "\"error\""))
        def typed(t: String) = enc
          .filter(col("p_id") === ids("http://ex/p/type") &&
            col("o_id") === ids("\"" + t + "\""))
          .select(col("s_id"))
        val userEdge = enc.filter(col("p_id") === ids("http://ex/p/user"))
          .select(col("s_id"), col("o_id").as("u_id"))
        typed("purchase").join(userEdge, "s_id").select(col("u_id"))
          .intersect(typed("error").join(userEdge, "s_id").select(col("u_id")))
          .count()
      }

      val (nRaw, rawBytes) = measured(spark)(rawQuery())
      val (nDict, dictBytes) = measured(spark)(dictQuery())
      require(nRaw == nDict, s"raw=$nRaw dict=$nDict must agree")

      println(s"""{"factor":$f,"quads":$nQuads,"result_rows":$nRaw,""" +
        s""""raw_query_shuffle_bytes":$rawBytes,""" +
        s""""dict_query_shuffle_bytes":$dictBytes,""" +
        s""""dict_build_shuffle_bytes":$buildBytes,""" +
        s""""query_ratio":${
          if (dictBytes > 0) f"${rawBytes.toDouble / dictBytes}%.2f" else "null"}}""")
      dict.unpersist(blocking = false)
      enc.unpersist(blocking = false)
      quads.unpersist(blocking = false)
    }
    spark.stop()
  }
}

/** Scale probe for the round-8 inference + incremental-maintenance
  * operators. Two claims, both measured rather than argued:
  *
  *  1. RDFS materialization is LINEAR in instance volume with a fixed
  *     ontology — the schema closure is constant-sized, so inferred
  *     rows and shuffle bytes must both track the replication factor.
  *  2. Non-monotone incremental refresh is O(batch), not O(corpus):
  *     with a FIXED delta and a growing base corpus (on the
  *     merge-on-read store, where retractions are tombstones), the
  *     refresh's shuffle bytes must stay flat — the base is touched
  *     only by a map-side pruned scan, never shuffled.
  *
  * Prints one JSON line per (probe, factor); summarized in
  * BENCH_NOTES.md.
  */
object InferenceScaleProbe {

  private final class ShuffleBytes
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def measured[T](spark: SparkSession)(f: => T): (T, Long) = {
    val l = new ShuffleBytes
    spark.sparkContext.addSparkListener(l)
    val r = f
    Thread.sleep(1500)
    spark.sparkContext.removeSparkListener(l)
    (r, l.bytes.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-inference-scale-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ns = "http://localhost/"
    val nullS = lit(null).cast("string")

    def replicate(f: Int) = {
      val ev0 = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      (0 until f).map(r =>
        ev0.withColumn("event_id", col("event_id") + lit(r * 1000000000L)))
        .reduce(_ unionAll _)
    }

    // ---- probe 1: materialization linearity
    factors.foreach { f =>
      val ev = replicate(f)
      val subj = concat(lit("urn:ev:"), col("event_id").cast("string"))
      val inst = ev.select(subj.as("s"),
          lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").as("p"),
          concat(lit(ns + "type/"), col("event_type")).as("o"),
          lit("iri").as("kind"))
        .unionByName(ev.filter(col("user_id").isNotNull).select(subj.as("s"),
          lit(ns + "user_id").as("p"),
          concat(lit("urn:user:"), col("user_id").cast("string")).as("o"),
          lit("iri").as("kind")))
      import spark.implicits._
      val T = ns + "type/"; val C = ns + "cls/"
      val schema = Seq(
        (T + "purchase", Inference.SubClassOf, C + "conversion"),
        (T + "signup", Inference.SubClassOf, C + "conversion"),
        (C + "conversion", Inference.SubClassOf, C + "interaction"),
        (T + "click", Inference.SubClassOf, C + "engagement"),
        (T + "view", Inference.SubClassOf, C + "engagement"),
        (C + "engagement", Inference.SubClassOf, C + "interaction"),
        (C + "interaction", Inference.SubClassOf, C + "event"),
        (T + "error", Inference.SubClassOf, C + "event"),
        (ns + "user_id", Inference.SubPropertyOf, ns + "actor"),
        (ns + "actor", Inference.SubPropertyOf, ns + "participant"),
        (ns + "user_id", Inference.Range, C + "user"))
        .toDF("s", "p", "o").withColumn("kind", lit("iri"))
      val nIn = inst.count()
      val ((nOut), bytes) = measured(spark) {
        Inference.rdfsMaterialize(schema.unionByName(inst)).count()
      }
      println(s"""{"probe":"rdfs_materialize","factor":$f,"instance_rows":$nIn,""" +
        s""""materialized_rows":$nOut,"shuffle_bytes":$bytes}""")
    }

    // ---- probe 2: refresh cost vs base size (fixed delta, MOR store)
    factors.foreach { f =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-infprobe-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(spark, dir)
      val gStage = "http://ex/staging/events"
      val gDelta = "http://ex/staging/late_values"
      val ev = replicate(f)
      val subj = concat(lit("urn:ev:"), col("event_id").cast("string"))
      store.appendDistinct(ev.select(lit(gStage).as("graph"), subj.as("s"),
        lit(ns + "event_type").as("p"), col("event_type").as("o_value"),
        nullS.as("o_type"), nullS.as("o_lang"), lit("literal").as("o_kind")))
      val engine = new graft.GraphEngine(store)
      engine.update(s"""
        PREFIX src: <$ns>
        PREFIX ex: <http://ex/>
        WITH <http://ex/scored>
        INSERT { ?e ex:scored "no" }
        USING <$gStage>
        WHERE { ?e src:event_type ?t }""")
      // compaction after the bulk load — the production shape: the
      // read-optimized base then skips latest-wins aggregation and the
      // refresh's shuffles are tail-sized (see MergeOnReadStore.readMerged)
      store.compact(gStage)
      store.compact("http://ex/scored")
      // FIXED-size delta regardless of factor: the 1x slice's %97 events
      val delta = Tables.events(spark, sfDir)
        .filter(pmod(col("event_id"), lit(97)) === 0 && col("value").isNotNull)
      val dq = delta.select(lit(gDelta).as("graph"),
        concat(lit("urn:ev:"), col("event_id").cast("string")).as("s"),
        lit(ns + "value").as("p"),
        floor(col("value")).cast("long").cast("string").as("o_value"),
        nullS.as("o_type"), nullS.as("o_lang"), lit("literal").as("o_kind"))
      store.appendDistinct(dq.withColumn("graph", lit(gStage)))
      store.appendDistinct(dq)
      val nDelta = dq.count()
      val (_, bytes) = measured(spark) {
        engine.update(s"""
          PREFIX src: <$ns>
          PREFIX ex: <http://ex/>
          WITH <http://ex/scored>
          DELETE { ?e ex:scored ?old }
          INSERT { ?e ex:scored "yes" }
          WHERE {
            GRAPH <$gDelta> { ?e src:value ?dv }
            OPTIONAL { ?e ex:scored ?old }
          }""")
      }
      val nYes = store.readGraphs(Seq("http://ex/scored"))
        .filter(col("o_value") === "yes").count()
      require(nYes == nDelta, s"refresh must rewrite exactly the delta: $nYes vs $nDelta")
      println(s"""{"probe":"refresh_fixed_delta","factor":$f,"delta_rows":$nDelta,""" +
        s""""refresh_shuffle_bytes":$bytes}""")
    }
    spark.stop()
  }
}

/** Hot-phrase skew probe (BENCH_NOTES): plants a corpus-wide hot FIRST
  * term — every doc starts `hbq x<id>`, so every query's phrase starts
  * with a term whose df equals the whole corpus, the worst case the
  * BM25 stop-term prune cannot help with (adjacency needs those
  * positions). Measures, at 1×/3×/10× corpus:
  *  - `naive_rows`   = df(t1)·queries — the per-query-join shape;
  *  - `dedup_rows`   = df(t1)·|distinct phrases| — the distinct-phrase
  *    join shape (still quadratic here: t2 differs per query);
  *  - `adjacency_rows` — the SHIPPED adjacency-first candidate count,
  *    which must stay linear in the corpus;
  * plus the end-to-end served phrase search time and output rows.
  */
object PhraseSkewProbe {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-phrase-skew-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

    factors.foreach { f =>
      // disjoint id ranges per copy; per-copy token suffix keeps the
      // body vocabularies apart; the planted prefix `hbq x<id>` makes
      // t1 corpus-hot (df = N) while every query's t2 stays unique
      val docs = (0 until f).map { rep =>
        docs0.select(
          (col("doc_id") + lit(rep * 1000000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1zz$rep").as("text"))
      }.reduce(_ unionAll _)
        .select(col("doc_id"),
          concat(lit("hbq x"), col("doc_id"), lit(" "), col("text")).as("text"))

      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-phskew-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      Retrieval.writePostingsIngest(docs, dir, "base")

      val phrases = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          element_at(TextOps.tokens(col("text")), 1).as("t1"),
          element_at(TextOps.tokens(col("text")), 2).as("t2"))
      val nQ = phrases.count()
      val nPhrases = phrases.select(col("t1"), col("t2")).distinct().count()

      // df(t1) summed over the queries' first terms = occurrences the
      // t1 side of any phrase join must carry
      val hot = spark.read.parquet(s"$dir/postings")
        .select(col("term"), size(col("positions")).cast("long").as("tf"))
        .where(col("term") === "hbq")
        .agg(coalesce(sum(col("tf")), lit(0L))).collect().head.getLong(0)
      val naive = hot * nQ
      val dedup = hot * nPhrases

      val adjacency = Retrieval
        .phraseBigramCandidates(spark, dir, phrases).count()
      val ((nOut), tSec) = timed {
        Retrieval.phraseHitsFrom(spark, dir, phrases).count()
      }

      println(s"""{"factor":$f,"docs":${docs.count()},"queries":$nQ,""" +
        s""""hot_df":$hot,"naive_rows":$naive,"dedup_rows":$dedup,""" +
        s""""adjacency_rows":$adjacency,"out_rows":$nOut,""" +
        s""""phrase_sec":${f"$tSec%.2f"}}""")
    }
    spark.stop()
  }
}

/** Round-10 probe: the id-space claim measured at the ENGINE level, not
  * the demo level — the SAME SPARQL text runs through GraphEngine over
  * the string-space [[graft.model.GraphStore]] and the dict-encoded
  * [[graft.model.DictQuadStore]], both persisted on disk, and the
  * query's shuffle-write bytes are compared per replication factor.
  * This is the DictShuffleProbe experiment after VERDICT r9 #1: the
  * encoding is no longer hand-written — the compiler's encoded-pattern
  * path produces it from the parsed query. Expect the dict engine's
  * query bytes flat-to-N× lower (BGP exchanges carry 8-byte ids; only
  * the projected variable decodes), with the one-time ingest paying the
  * dictionary build. Prints one JSON line per factor; summarized in
  * BENCH_NOTES.md.
  */
object DictEngineProbe {

  private final class ShuffleBytes
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def measured[T](spark: SparkSession)(f: => T): (T, Long, Double) = {
    val l = new ShuffleBytes
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    spark.sparkContext.removeSparkListener(l)
    (r, l.bytes.get, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-dict-engine-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev0 = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))

    val sparql = """
      PREFIX p: <http://ex/p/>
      SELECT DISTINCT ?u WHERE {
        ?e1 p:type "purchase" ; p:user ?u .
        ?e2 p:type "error" ;    p:user ?u .
      }"""

    factors.foreach { f =>
      val ev = (0 until f).map(r =>
        ev0.withColumn("event_id", col("event_id") + lit(r * 1000000000L)))
        .reduce(_ unionAll _)
      val g = lit(graft.model.Quad.DefaultGraph).as("graph")
      val subj = concat(lit("http://ex/ev/"), col("event_id")).as("s")
      val nullS = lit(null).cast("string")
      val quads = ev.select(g, subj, lit("http://ex/p/type").as("p"),
          col("event_type").as("o_value"), nullS.as("o_type"),
          nullS.as("o_lang"), lit("literal").as("o_kind"))
        .unionByName(ev.select(g, subj, lit("http://ex/p/user").as("p"),
          concat(lit("http://ex/u/"), col("user_id")).as("o_value"),
          nullS.as("o_type"), nullS.as("o_lang"), lit("iri").as("o_kind")))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-dep-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(base)

      val strStore = new graft.model.GraphStore(spark, s"$base/str")
      val (_, strIngestB, strIngestS) =
        measured(spark)(strStore.append(quads))
      val dictStore = new graft.model.DictQuadStore(spark, s"$base/dict")
      val (_, dictIngestB, dictIngestS) =
        measured(spark)(dictStore.appendDistinct(quads))

      val strEng = new graft.GraphEngine(strStore)
      val dictEng = new graft.GraphEngine(dictStore)
      val (nStr, strB, strS) = measured(spark)(strEng.select(sparql).count())
      val (nDict, dictB, dictS) = measured(spark)(dictEng.select(sparql).count())
      require(nStr == nDict, s"string=$nStr dict=$nDict must agree")

      println(s"""{"factor":$f,"result_rows":$nStr,""" +
        s""""string_query_shuffle_bytes":$strB,"dict_query_shuffle_bytes":$dictB,""" +
        s""""query_ratio":${
          if (dictB > 0) f"${strB.toDouble / dictB}%.2f" else "null"},""" +
        f""""string_query_sec":$strS%.2f,"dict_query_sec":$dictS%.2f,""" +
        s""""string_ingest_shuffle_bytes":$strIngestB,""" +
        s""""dict_ingest_shuffle_bytes":$dictIngestB,""" +
        f""""string_ingest_sec":$strIngestS%.2f,"dict_ingest_sec":$dictIngestS%.2f}""")
    }
    spark.stop()
  }
}

/** CHANGE-DATA-FEED scale probe: is [[graft.model.MergeOnReadStore.changesBetween]]
  * O(window) rather than O(store)? A FIXED-size change window (the 1×
  * slice's %97 inserts + %193 tombstones) is applied to a base store
  * grown 1×/3×/10×, and the CDF read's shuffle-write bytes are
  * measured. The history prune is a broadcast semi-join — map-side, no
  * shuffle of the base — and both endpoint-state aggregations run over
  * touched keys only, so bytes must stay flat while the base grows.
  */
object CdcScaleProbe {

  private final class ShuffleBytes
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def measured[T](spark: SparkSession)(f: => T): (T, Long) = {
    val l = new ShuffleBytes
    spark.sparkContext.addSparkListener(l)
    val r = f
    Thread.sleep(1500)
    spark.sparkContext.removeSparkListener(l)
    (r, l.bytes.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-cdc-scale-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = "http://ex/events"
    val nullS = lit(null).cast("string")

    def quadsOf(ev: org.apache.spark.sql.DataFrame) = ev.select(
      lit(g).as("graph"),
      concat(lit("urn:ev:"), col("event_id").cast("string")).as("s"),
      lit("etype").as("p"), col("event_type").as("o_value"),
      nullS.as("o_type"), nullS.as("o_lang"), lit("literal").as("o_kind"))

    factors.foreach { f =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-cdcprobe-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val store = new graft.model.MergeOnReadStore(spark, dir)
      val ev0 = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"))
      val base = (0 until f).map(r =>
        ev0.withColumn("event_id", col("event_id") + lit(r * 1000000000L)))
        .reduce(_ unionAll _)
      store.appendDelta(quadsOf(base), 1L)
      // FIXED-size window regardless of factor: new values in, a slice
      // of the ORIGINAL base out
      val ins = quadsOf(ev0.filter(pmod(col("event_id"), lit(97)) === 0)
        .withColumn("event_type", concat(col("event_type"), lit("#late"))))
      val del = quadsOf(ev0.filter(pmod(col("event_id"), lit(193)) === 0))
      store.appendDelta(ins, 2L)
      store.appendDelta(del, 3L, op = "d")
      val nBase = base.count()
      val (nChanges, bytes) = measured(spark) {
        store.changesBetween(1L, 3L).count()
      }
      println(s"""{"probe":"cdc_fixed_window","factor":$f,"base_rows":$nBase,""" +
        s""""change_rows":$nChanges,"cdf_shuffle_bytes":$bytes}""")
    }
    spark.stop()
  }
}

/** HOT-ID SKEW probe for id-space joins (VERDICT r10 #6): dictionary
  * encoding shrinks shuffle ROWS to 8-byte ids, but
  * `hashpartitioning(o_id)` still concentrates a hot object id — every
  * real graph has its `rdf:type`-shaped hot terms — onto one task. The
  * probe plants a hot category object on 70% of a fact-sized pattern
  * side, grows the data 1×/3×/10×, runs a REAL 2-pattern dict BGP
  * (`?a p:cat ?c . ?c p:meta ?m` — the o_id↔s_id dimension-join shape)
  * through the encoded compiler path, and measures per-task
  * shuffle-read skew on the join stage plus wall time.
  *
  * AQE's skew-join split is the production mitigation; its default
  * trigger (256 MB skewed-partition threshold) never fires at probe
  * scale, so the thresholds are scaled down (64 KB) to exercise the
  * MECHANISM exactly as a 100 TB run would — what's being validated is
  * that the encoded join's skew is the kind AQE can split (one hot
  * partition on the fact side, a duplicable dimension row on the
  * other), not a both-sides-hot output explosion (q34's salted-join
  * territory). Verdict rule: wire `util.Skew.saltedJoin` into the
  * encoded path ONLY if this measures non-flat.
  */
object DictSkewProbe {

  /** Per-task shuffle-read record counts, grouped by stage. */
  private final class TaskSkew
      extends org.apache.spark.scheduler.SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        val recs = m.shuffleReadMetrics.recordsRead
        if (recs > 0) {
          byStage.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(recs)
          ()
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-dict-skew-probe")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      // scale AQE's skew-split trigger to probe data volume (the 256 MB
      // default is sized for real executors); mechanism, not magnitude
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev0 = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"))
    val nullS = lit(null).cast("string")
    val g = lit(graft.model.Quad.DefaultGraph).as("graph")

    val sparql = """
      PREFIX p: <http://ex/p/>
      SELECT ?m (COUNT(?a) AS ?n) WHERE {
        ?a p:cat ?c .
        ?c p:meta ?m .
      } GROUP BY ?m ORDER BY ?m"""

    factors.foreach { f =>
      val ev = (0 until f).map(r =>
        ev0.withColumn("event_id", col("event_id") + lit(r * 1000000000L)))
        .reduce(_ unionAll _)
      // fact side: 70% of subjects point at cat/0 (the hot object);
      // the rest spread over user-derived cats. Dimension side: ONE
      // p:meta row per cat object.
      val catOf = when(pmod(col("event_id"), lit(10)) < 7, lit(0L))
        .otherwise(pmod(col("user_id"), lit(997)) + 1)
      val facts = ev.select(g,
        concat(lit("http://ex/ev/"), col("event_id")).as("s"),
        lit("http://ex/p/cat").as("p"),
        concat(lit("http://ex/cat/"), catOf).as("o_value"),
        nullS.as("o_type"), nullS.as("o_lang"), lit("iri").as("o_kind"))
      val dims = facts.select(col("o_value")).distinct()
        .select(g, col("o_value").as("s"),
          lit("http://ex/p/meta").as("p"),
          concat(col("o_value"), lit("/m")).as("o_value"),
          nullS.as("o_type"), nullS.as("o_lang"), lit("iri").as("o_kind"))
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-skew-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(base)
      val store = new graft.model.DictQuadStore(spark, base)
      store.appendDistinct(facts.unionByName(dims))
      val engine = new graft.GraphEngine(store)

      val l = new TaskSkew
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      val df = engine.select(sparql)
      val rows = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(l)
      // did AQE's skew-split actually fire on the final plan?
      val plan = df.queryExecution.executedPlan.toString
      val skewSplit = plan.contains("skew=true")

      // the join stage = the stage with the largest total shuffle read
      import scala.jdk.CollectionConverters._
      val stages = l.byStage.asScala.map { case (sid, q) =>
        val xs = q.asScala.toSeq
        (sid, xs.sum, xs.max, xs.sum.toDouble / xs.size, xs.size)
      }.toSeq
      val (sid, total, mx, mean, nTasks) =
        if (stages.isEmpty) (-1, 0L, 0L, 0.0, 0)
        else stages.maxBy(_._2)
      println(s"""{"factor":$f,"result_rows":$rows,""" +
        s""""join_stage":$sid,"join_stage_tasks":$nTasks,""" +
        s""""stage_records":$total,"task_records_max":$mx,""" +
        f""""task_records_mean":$mean%.0f,""" +
        f""""skew_ratio":${if (mean > 0) mx / mean else 0.0}%.2f,""" +
        s""""aqe_skew_split":$skewSplit,""" +
        f""""sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
