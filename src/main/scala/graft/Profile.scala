package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway phase profiler for bench hotspots (not part of the API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f ($r)")
    }
    import org.apache.spark.sql.functions._
    import graft.util.Tables
    import graft.ops.GraphAlgos

    def run(label: String): Unit = {
      val cust = Tables.customer(spark, sfDir)
      val k = col("c_custkey")
      val base = cust.filter(k % 10 =!= 1)
        .select(k.as("i"), (k - 1).as("j"))
      val delta = cust.filter(k % 10 === 1 && k % 50 =!= 1)
        .select(k.as("i"), (k - 1).as("j"))
        .unionAll(cust.filter(k % 100 === 0)
          .select(k.as("i"), (k + 1000000).as("j")))
      var baseLabels: DataFrame = null
      t(s"$label base CC")({
        baseLabels = GraphAlgos.componentsLargeSmallStar(base)
        baseLabels.count()
      })
      var out: DataFrame = null
      t(s"$label incremental fold")({
        out = GraphAlgos.componentsIncremental(baseLabels, delta)
        out.count()
      })
      t(s"$label final orderBy count")(out.orderBy(col("doc_id")).count())
    }
    run("cold")
    run("warm")
    spark.stop()
  }
}
