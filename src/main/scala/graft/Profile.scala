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

    {
      import org.apache.spark.sql.functions._
      val base = graft.util.Tables.fanOut(
        graft.util.Tables.documents(spark, sfDir))
      t("docs_scan")(base.count())
      val tok = base.select(col("doc_id"),
        graft.ops.TextOps.tokens(col("text")).as("toks"))
      t("tokenize")(tok.agg(sum(size(col("toks")))).collect())
      val sh = base.select(col("doc_id"),
        graft.ops.Dedup.shingles(graft.ops.TextOps.tokens(col("text"))).as("sh"))
      t("shingle_arrays")(sh.agg(sum(size(col("sh")))).collect())
      val ex = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("hs"))
      t("explode_hash")(ex.count())
      t("explode_hash_again")(ex.count())
    }
    t("ngram_first_materializes_shingles")(
      SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
    t("minhash_after_warm_shingles")(
      SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    t("minhash_again")(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())

    val ns = "http://localhost/"
    val g = "https://data.example.org/graph/profile_rdf"
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-prof-${System.nanoTime()}"
    graft.util.TempDirs.deleteOnExit(dir)
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.events(spark, sfDir).select(to_json(struct(
      col("event_type"), col("user_id"), col("event_id"))).as("json"))
    val store = new graft.model.GraphStore(spark, dir)
    t("mapping_flatten_append")(
      store.append(graft.ingest.JsonFlattener.flatten(docs, "json", g, ns).toDF()))
    val engine = new graft.GraphEngine(store)
    t("mapping_update")(engine.update(s"""
        PREFIX src: <$ns>
        PREFIX ex: <http://ex/>
        WITH <http://ex/user_activity_prof>
        INSERT { ?u ex:did ?etype }
        USING <$g>
        WHERE {
          ?e src:event_type ?etype ;
             src:user_id ?uid ;
             src:event_id ?eid .
          BIND (URI(CONCAT('http://ex/user/', ?uid)) AS ?u)
        }"""))
    t("mapping_read")(
      store.readGraphs(Seq("http://ex/user_activity_prof"))
        .orderBy(col("s"), col("o_value")).count())
    spark.stop()
  }
}
