package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Measurement-sweep knobs change driver results WITHOUT changing
    // the SQL oracles — a leftover conf would silently hash-diverge
    // the whole ANN family. Fail loudly instead.
    Seq("spark.graft.ivf.probes", "spark.graft.ivf.adcDepth").foreach { k =>
      require(scala.util.Try(spark.conf.get(k)).isFailure,
        s"$k is set: unset sweep overrides before running the correctness gate")
    }
    new java.io.File(outDir).mkdirs()
    // queries are independent and write to disjoint dirs — run them on a
    // bounded pool so driver-side planning/codegen and the many tiny
    // jobs overlap (serial execution is wall-clock-dominated by per-
    // query constant overhead at verification scale)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      // optional focused run (local iteration): SPARK_GRAFT_ONLY=regex
      val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
      val selected = SparkEntry.queries.toSeq.filter { case (n, _) =>
        only.forall(_.findFirstIn(n).isDefined)
      }
      val futures = selected.map { case (name, fn) =>
        Future {
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
