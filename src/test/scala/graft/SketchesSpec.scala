package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** CMS invariants at fixture scale (the sketch itself is oracle-
  * recomputed bit-for-bit by the driver gate).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("CMS never underestimates and ranks true heavy hitters first") {
    val rows = SparkEntry.queries("sketch_cms_heavyhitters")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"${r.getString(0)}: CMS must not underestimate")
      assert(r.getLong(2) >= r.getLong(1))
    }
    // top-10 exact counts are non-increasing in the output order
    val exact = rows.map(_.getLong(1))
    assert(exact.zip(exact.tail).forall { case (a, b) => a >= b })
  }

  test("polynomial hash is stable and character-order-sensitive") {
    import spark.implicits._
    val got = Seq("ab", "ba", "ab").toDF("tok")
      .select(graft.ops.Sketches.polyHash(col("tok")).as("h"))
      .collect().map(_.getLong(0))
    assert(got(0) == got(2))
    assert(got(0) != got(1))
    assert(got(0) == ('a'.toLong * 257 + 'b'.toLong) % 2147483647L)
  }
}
