package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the trained-in-engine classifiers (their
  * value-level correctness is oracle-checked end to end by the driver
  * gate — both queries hash-match a DuckDB recomputation of the full
  * train→predict loop).
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("NB confusion matrix partitions the corpus; predictions stay in-vocabulary") {
    val rows = SparkEntry.queries("text_classify_nb")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(total == nDocs) // every document classified exactly once
    val classes = graft.util.Tables.documents(spark, sf)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet.subsetOf(classes))
    assert(rows.map(_.getString(1)).toSet.subsetOf(classes))
    rows.foreach(r => assert(r.getLong(2) > 0)) // no empty cells emitted
  }

  test("Rocchio confusion matrix partitions the embedding set") {
    val rows = SparkEntry.queries("embed_classify_rocchio")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val nVecs = graft.util.Tables.embeddings(spark, sf).count()
    assert(total == nVecs)
    val labels = graft.util.Tables.embeddings(spark, sf)
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(rows.map(_.getInt(1)).toSet.subsetOf(labels))
  }

  test("NB is deterministic across runs (quantized order-free sums)") {
    val a = SparkEntry.queries("text_classify_nb")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("text_classify_nb")(spark, sf).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
