package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 (10×-bench) SCALE REHEARSAL (VERDICT r11 #3): materialize a
  * full 10× table directory and run the most expensive benched queries
  * at both scales, so "designed for 100 TB" gains a measured decade
  * between the probes' in-memory 10× candidate counts and the design
  * arguments. BENCH_NOTES.md records the table with a per-row
  * adjudication.
  *
  * Growth model (one decision per table, chosen so each replica is
  * INTERNALLY isomorphic to the base corpus and replicas are mutually
  * independent — how a corpus actually grows, and the model the scale
  * probes established):
  *  - dimensions (region, nation): unchanged — dimensions don't scale.
  *  - TPC-H facts (customer/supplier/part/orders/lineitem) and events:
  *    key columns offset per replica (consistent across tables, so
  *    joins keep exactly 10× their matches); event users grow 10× at
  *    constant per-user density.
  *  - documents: ids offset; every token suffixed per replica, so
  *    within-replica dedup/repeat structure is preserved and no
  *    cross-replica near-dups appear.
  *  - embeddings: ids offset; each replica's vectors CIRCULARLY
  *    ROTATED by its replica index — norms and all within-replica
  *    cosines are EXACTLY the base corpus's, while cross-replica
  *    cosines are near-zero (high-dim rotation), so the near-dup/ANN
  *    structure grows 10× linearly instead of collapsing into one
  *    giant cluster of perturbed copies.
  *
  * Usage:
  *   runMain graft.ops.ScaleRehearsal gen <srcSfDir> <outDir> [factor]
  *   runMain graft.ops.ScaleRehearsal run <dirA> <dirB> <nameRegex>
  */
object ScaleRehearsal {

  private def reps(base: DataFrame, factor: Int)(
      perturb: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => perturb(base, r)).reduce(_ unionAll _)

  def generate(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[rehearsal] wrote $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    val C = 10000000L   // customer/supplier/part key stride
    val O = 100000000L  // order key stride
    val E = 1000000000L // event/doc/vec id stride
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(reps(rd("customer"), factor)((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * C))), "customer")
    wr(reps(rd("supplier"), factor)((d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * C))), "supplier")
    wr(reps(rd("part"), factor)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * C))), "part")
    wr(reps(rd("orders"), factor)((d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * O))
        .withColumn("o_custkey", col("o_custkey") + lit(r * C))), "orders")
    wr(reps(rd("lineitem"), factor)((d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * O))
        .withColumn("l_partkey", col("l_partkey") + lit(r * C))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * C))), "lineitem")
    wr(reps(rd("events"), factor)((d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * E))
        .withColumn("user_id", col("user_id") + lit(r * C))), "events")
    wr(reps(rd("documents"), factor)((d, r) =>
      d.withColumn("doc_id", col("doc_id") + lit(r * E))
        .withColumn("text",
          if (r == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", s"$$1zz$r"))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")
    val dim = spark.read.parquet(s"$src/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)
    wr(reps(rd("embeddings"), factor)((d, r) =>
      d.withColumn("vec_id", col("vec_id") + lit(r * E))
        .withColumn("embedding",
          if (r == 0) col("embedding")
          else concat(
            slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r)))), "embeddings")
  }

  /** Bench-protocol timing (min of 2 runs) of every SparkEntry query
    * matching `nameRegex`, at `dirA` then `dirB`, with the bench's
    * family-boundary cache clears. One JSON line per query. */
  def run(spark: SparkSession, dirA: String, dirB: String,
      nameRegex: String): Unit = {
    val re = nameRegex.r
    val selected = graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => re.findFirstIn(n).isDefined }
      .sortBy(_._1)
    def family(n: String) =
      if (n.matches("^q\\d.*")) "q" else n.takeWhile(_ != '_')
    def timeAll(dir: String): Map[String, Double] = {
      Dedup.clearCaches(); Similarity.clearCaches()
      SemanticOps.clearCaches(); Retrieval.clearCaches()
      spark.catalog.clearCache()
      var prev: String = null
      selected.map { case (name, fn) =>
        if (prev != null && family(name) != prev) {
          Dedup.clearCaches(); Similarity.clearCaches()
          SemanticOps.clearCaches(); Retrieval.clearCaches()
          spark.catalog.clearCache()
        }
        prev = family(name)
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[rehearsal] $dir $name runs=${runs.map(r => f"$r%.2f").mkString("/")}")
        name -> runs.min
      }.toMap
    }
    val a = timeAll(dirA)
    val b = timeAll(dirB)
    selected.foreach { case (name, _) =>
      val (ta, tb) = (a(name), b(name))
      println(f"""{"query":"$name","a_sec":$ta%.2f,"b_sec":$tb%.2f,"ratio":${tb / ta}%.2f}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-scale-rehearsal")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toSeq match {
      case Seq("gen", src, out) => generate(spark, src, out, 10)
      case Seq("gen", src, out, f) => generate(spark, src, out, f.toInt)
      case Seq("run", a, b, regex) => run(spark, a, b, regex)
      // recall-vs-probes sweep at a given scale: the IVF trade surfaced
      // by the sf1 rehearsal, measured instead of argued
      // (`spark.graft.ivf.probes` is the session knob being swept)
      // each entry is probes[:adcDepth]; "default" leaves both unset
      case Seq("probes", dir, list) =>
        list.split(",").foreach { spec =>
          val (p, depth) = spec.split(":") match {
            case Array(a, b) => (a, Some(b))
            case Array(a) => (a, None)
          }
          spark.conf.unset("spark.graft.ivf.adcDepth")
          depth.foreach(spark.conf.set("spark.graft.ivf.adcDepth", _))
          if (p == "default") spark.conf.unset("spark.graft.ivf.probes")
          else spark.conf.set("spark.graft.ivf.probes", p)
          val t0 = System.nanoTime()
          val row = graft.SparkEntry.queries("retrieval_dense_recall")(
            spark, dir).collect().head
          val dt = (System.nanoTime() - t0) / 1e9
          val (ne, nh) = (row.getLong(0), row.getLong(1))
          println(f"""{"probes":"$p","adc_depth":"${depth.getOrElse("default")}",""" +
            f""""n_exact":$ne,"n_hit":$nh,""" +
            f""""recall":${nh.toDouble / ne}%.3f,"sec":$dt%.2f}""")
        }
        spark.conf.unset("spark.graft.ivf.probes")
        spark.conf.unset("spark.graft.ivf.adcDepth")
      case other => sys.error(s"usage: gen <src> <out> [factor] | " +
        s"run <dirA> <dirB> <nameRegex> | probes <dir> <p1,p2,...>; " +
        s"got: $other")
    }
    spark.stop()
  }
}
