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
