package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every declared query has oracle coverage or is marked rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed, but oracles must not dangle
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
    info(s"rows-only queries: ${noOracle.toSeq.sorted.mkString(", ")}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run non-empty on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, TestSpark.sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("q01 aggregates correctly on a known slice") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, TestSpark.sf)
    val total = df.selectExpr("sum(count_order)").head().getLong(0)
    import org.apache.spark.sql.functions._
    val expected = graft.util.Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .count()
    assert(total == expected)
  }
}
