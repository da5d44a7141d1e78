package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codegen-compile attribution probe for the iterative dedup_clusters
  * query (round-5 verdict item 4): prints janino compile counts for the
  * cold shingle-pair pipeline, the CC-loop setup, and EACH label-
  * propagation round. Round-6 finding, pinned by the numbers in
  * BENCH_NOTES.md: the per-round plans are shape-stable (the initial
  * checkpoint mirrors the 3-column round output), so rounds 3+ compile
  * NOTHING — compile cost is O(1) in round count, and the bulk of the
  * cold cost (46 compiles) is the one-time shingle pipeline shared by
  * the whole dedup family. args: [sfDir] [minRounds].
  */
object CgProbe {
  def compiles: Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var c0 = compiles
    val pairs = Dedup.neardupPairs(spark, d)
    pairs.count()
    println(s"pairs-stage compiles: ${compiles - c0}")
    // replicate clusterAssign loop with per-round compile accounting
    c0 = compiles
    val edges = pairs.select(col("i").as("a"), col("j").as("b"))
      .union(pairs.select(col("j").as("a"), col("i").as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("old"), col("doc_id").as("lbl"))
      .localCheckpoint()
      .select(col("doc_id"), col("lbl"))
    println(s"setup compiles: ${compiles - c0}")
    var changed = 1L
    var rounds = 0
    val minRounds = if (args.length > 1) args(1).toInt else 0
    while ((changed > 0 || rounds < minRounds) && rounds < 64) {
      c0 = compiles
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("lbl").as("nlbl")), "b")
        .groupBy(col("a").as("doc_id")).agg(min(col("nlbl")).as("nmin"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val cMid = compiles
      changed = next.filter(col("lbl") < col("old")).count()
      labels = next.select(col("doc_id"), col("lbl"))
      rounds += 1
      println(s"round $rounds: checkpoint compiles=${cMid - c0}, count compiles=${compiles - cMid}, changed=$changed")
    }
    spark.stop()
  }
}
