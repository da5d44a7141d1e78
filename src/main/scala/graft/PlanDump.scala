package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for optimization rounds
  * (`plans/r<N>/<query>_{before,after}.txt`).
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1> <q2> ..."`
  * Writes `<outDir>/<query>_<suffix>.txt`. Every dump is the ANALYZED
  * formatted plan (pre-execution, the `.explain("formatted")` text) plus
  * the executed post-AQE plan, because AQE decisions (broadcast
  * conversions, coalesced reads) only exist after a run.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "args: sfDir outDir suffix query...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val out = new StringBuilder
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        out ++= s"== $name ($suffix) explain(formatted) at $sfDir ==\n\n"
        out ++= df.queryExecution.explainString(FormattedMode)
        df.collect()
        out ++= "\n\n== executed plan (post-AQE) ==\n\n"
        out ++= df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
          .replaceAll("#\\d+L?", "")
      } catch {
        case e: Throwable =>
          out ++= s"\nFAILED: ${e.getClass.getName}: ${e.getMessage}\n"
      }
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), out.toString)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
