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
    // reader paths so the first timed query doesn't pay one-time costs.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy(col("n_regionkey")).agg(count(lit(1))).collect()
    } catch { case _: Throwable => () }
    // optional focused run: SPARK_GRAFT_ONLY=regex benches matching names
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = (SparkEntry.queries -- fixtureDemos).filter { case (n, _) =>
      only.forall(_.findFirstIn(n).isDefined)
    }
    val results = selected.map { case (name, fn) =>
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
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
