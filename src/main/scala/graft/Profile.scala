package graft

import org.apache.spark.sql.SparkSession

/** Throwaway phase profiler for bench hotspots (not part of the API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("maxmem " + Runtime.getRuntime.maxMemory() / (1L << 20) + " MB")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f ($r)")
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.util.Tables
    import graft.ops.TextOps
    // suffixRepeats inlined with phase timers + variable sort width
    def phased(parts: Int): Unit = {
      val docs = Tables.fanOut(Tables.documents(spark, sfDir))
      val sfx = docs
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "_t")))
        .where(size(col("toks")) - col("pos") >= 10)
        .select(col("doc_id"), col("pos"),
          slice(col("toks"), col("pos") + 1, lit(24)).as("sfx"))
      var sorted: org.apache.spark.sql.DataFrame = null
      t(s"p$parts sort_checkpoint")({
        sorted = sfx
          .repartitionByRange(parts, col("sfx"))
          .sortWithinPartitions(col("sfx"), col("doc_id"), col("pos"))
          .withColumn("pid", spark_partition_id())
          .localCheckpoint()
        sorted.count()
      })
      val w = Window.partitionBy(col("pid"))
        .orderBy(col("sfx"), col("doc_id"), col("pos"))
      t(s"p$parts lead_lcp")({
        sorted.select(col("sfx"), lead(col("sfx"), 1).over(w).as("nxt"))
          .where(col("nxt").isNotNull)
          .select(graft.ops.Dedup.tokenLcp(col("sfx"), col("nxt")).as("lcp"))
          .where(col("lcp") >= 10).count()
      })
      sorted.unpersist()
    }
    phased(32)
    phased(128)
    phased(32)
    spark.stop()
  }
}
