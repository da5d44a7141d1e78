package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture-scale correctness demos: constant-cost regardless of SF,
    // so they'd pollute a throughput metric. Verify still runs them.
    val fixtureDemos = Set(
      "rdf_mapping_pipeline", "rdf_sparql_update", "rdf_json_file_source")
    // JVM/codegen warmup (untimed): classload Catalyst + janino + parquet
    // reader, broadcast-join, window, and vector-kernel paths so the
    // first timed query doesn't pay one-time costs.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("r_regionkey")).orderBy(col("n_nationkey"))))
        .groupBy(col("r_name")).agg(count(lit(1))).collect()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(8)
        .select(graft.ops.Similarity.cosine(
          transform(col("embedding"), x => x.cast("double")),
          transform(col("embedding"), x => x.cast("double"))).as("c"))
        .collect()
    } catch { case _: Throwable => () }
    // optional focused run: SPARK_GRAFT_ONLY=regex benches matching names
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = (SparkEntry.queries -- fixtureDemos).filter { case (n, _) =>
      only.forall(_.findFirstIn(n).isDefined)
    }
    // Sorted order groups query families (ann_*, dedup_*, q*, rdf_*,
    // stream_*, text_*) so caches an earlier family persisted for
    // intra-family reuse can be dropped at the family boundary — cached
    // blocks a later query never reads otherwise inflate its GC time.
    def family(n: String) = if (n.matches("^q\\d.*")) "q" else n.takeWhile(_ != '_')
    // Clear ALL cached frames at every family boundary (the policy the
    // r2 bench ran with). Deferring the clears to keep the dedup
    // shingle cache warm across families (so graph_triangles /
    // text_fp_recall skip a ~10 s rebuild) saved less than it risked:
    // with 110 queries in one JVM every cached frame lives for the
    // whole run, so one noisy window compounds across the entire tail
    // instead of a single family, and attribution of a slow query
    // becomes impossible. Two bounded out-of-family rebuilds are the
    // cheap side of that trade.
    val ordered = selected.toSeq.sortBy(_._1)
    var prevFamily: String = null
    val results = ordered.map { case (name, fn) =>
      if (prevFamily != null && family(name) != prevFamily) {
        graft.ops.Dedup.clearCaches()
        graft.ops.Similarity.clearCaches()
        spark.catalog.clearCache()
      }
      prevFamily = family(name)
      val t0 = System.nanoTime()
      // a failed query must NOT report its (fast) elapsed time as if it
      // were a result — record the -1 sentinel so regressions are visible
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
