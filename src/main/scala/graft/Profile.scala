package graft

import org.apache.spark.sql.SparkSession

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
      f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // warmup
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // rdf_sparql_delete_mor lifecycle breakdown (r13 verdict task 3)
    import org.apache.spark.sql.functions._
    import graft.util.Tables
    (1 to 3).foreach { round =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-prof-delmor-$round-${System.nanoTime()}"
      graft.util.TempDirs.deleteOnExit(dir)
      val g = "http://ex/nations"
      val store = new graft.model.MergeOnReadStore(spark, dir)
      val quads = Tables.nation(spark, sfDir).select(
        lit(g).as("graph"),
        concat(lit("nation:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o_value"),
        lit(null).cast("string").as("o_type"),
        lit(null).cast("string").as("o_lang"),
        lit("literal").as("o_kind"))
      t(s"r$round a_appendDistinct")(store.appendDistinct(quads))
      val engine = new graft.GraphEngine(store)
      val updText = s"""
        WITH <$g>
        DELETE { ?s <name> ?n }
        USING <$g>
        WHERE { ?s <name> ?n . FILTER (STRSTARTS(?n, 'NATION_1')) }"""
      // sub-steps of the DeleteWhere path
      var ops: Seq[graft.sparql.SparqlParser.UpdateOp] = null
      t(s"r$round b1_parse")({ ops = graft.sparql.SparqlParser.parseRequest(updText, "p") })
      val q = ops.head.asInstanceOf[graft.sparql.SparqlParser.DeleteWhere].query
      var scoped: org.apache.spark.sql.DataFrame = null
      t(s"r$round b2_scope")({ scoped = store.readGraphs(Seq(g)) })
      var matched: org.apache.spark.sql.DataFrame = null
      t(s"r$round b3_compile")({ matched = graft.sparql.Compiler.run(q, scoped) })
      t(s"r$round b4a_matched_count")(matched.count())
      val mchk = matched.localCheckpoint()
      t(s"r$round b4b_checkpoint")(())
      t(s"r$round b4c_write_only")(store.deleteQuads(mchk, Some(Seq(g))))
      t(s"r$round c_read_final")(
        store.readGraphs(Seq(g)).select(col("s"), col("o_value"))
          .orderBy(col("s")).collect())
      t(s"r$round TOTAL")(())
    }
    spark.stop()
  }
}
