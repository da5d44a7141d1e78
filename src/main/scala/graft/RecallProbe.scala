package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local tuning aid (not driver-facing): prints the actual recall@5 of
  * each approximate ANN variant vs the brute-force exact top-k, so the
  * pinned recall-audit floors are set from measurements, not guesses.
  *
  * Usage: `sbt "runMain graft.RecallProbe /root/testdata/sf0.1"`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = graft.ops.Similarity.queries("ann_bruteforce_topk")(spark, sfDir)
      .select(col("query_id"), col("neighbor")).cache()
    val nExact = exact.count()
    for (v <- Seq("ann_lsh_bucketed", "ann_ivf_bucketed", "ann_pq_rerank",
        "ann_ivfpq_bucketed")) {
      val approx = graft.ops.Similarity.queries(v)(spark, sfDir)
        .select(col("query_id"), col("neighbor"))
      val hits = exact.join(approx, Seq("query_id", "neighbor"), "left_semi").count()
      println(f"RECALL $v%-22s $hits%3d / $nExact%3d = ${hits.toDouble / nExact}%.3f")
    }
    spark.stop()
  }
}
