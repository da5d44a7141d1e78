package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout clustering: the bit interleave must be the Morton
  * curve (checked against hand-computed values), and the end-to-end
  * query must report that the z-ordered layout's worst-case file
  * pruning beats the single-dim sort's across the two canonical box
  * shapes — the property that makes the layout worth a rewrite at
  * 100 TB. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("zInterleave is the Morton curve on 8-bit dims") {
    import spark.implicits._
    val cases = Seq(
      (0, 0, 0),       // origin
      (1, 0, 1),       // x -> even bit positions
      (0, 1, 2),       // y -> odd bit positions
      (3, 0, 5),       // 11 -> 0101
      (0, 3, 10),      // 11 -> 1010
      (255, 0, 21845), // 01...01
      (0, 255, 43690), // 10...10
      (255, 255, 65535),
      (170, 85, 26214))
    val got = cases.toDF("x", "y", "want")
      .select(graft.ops.Layout.zInterleave(col("x"), col("y")).as("z"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("z-order layout beats single-dim sort on worst-case file pruning") {
    val out = graft.ops.Layout.queries("layout_zorder")(spark, TestSpark.sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("zorder_prunes") == 1),
      "z-order worst-case hit count must be below the linear layout's")
  }

  test("clusterGraph: file subject-ranges are pairwise disjoint, content preserved") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cluster").toString
    val store = new graft.model.GraphStore(spark, dir + "/store")
    val g = "http://ex/g"
    val quads = (1 to 500).map(i =>
      (g, f"urn:s$i%04d", "p", s"v$i", null: String, null: String, "literal"))
      .toDF("graph", "s", "p", "o_value", "o_type", "o_lang", "o_kind")
    store.append(quads.repartition(8))
    val before = store.read().orderBy("s").collect().map(_.getString(1)).toSeq
    store.clusterGraph(g, numFiles = 4)
    val after = store.read().orderBy("s").collect().map(_.getString(1)).toSeq
    assert(after == before, "cluster rewrite changed the content")
    val boxes = spark.read.parquet(dir + "/store")
      .groupBy(input_file_name()).agg(min(col("s")), max(col("s")))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(boxes.length > 1, "expected a multi-file layout")
    // disjoint: sorted by lo, each file's hi < the next file's lo
    val sorted = boxes.sortBy(_._1).toSeq
    sorted.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $sorted")
      case _ => ()
    }
  }
}
