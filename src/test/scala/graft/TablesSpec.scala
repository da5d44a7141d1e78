package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Tables

/** Guards against test-data generator schema drift on `events.ts`.
  *
  * Round 6 shipped against an `events.parquet` whose `ts` was parquet
  * TIMESTAMP(NANOS) (Spark reads it as long under the legacy conf);
  * round 7's regenerated data switched to TIMESTAMP_NTZ, which silently
  * fell through the old long-only normalization and broke every
  * events-based query. This spec pins all three representations to the
  * same TIMESTAMP (ltz) output so the next drift fails here, loudly.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeAndLoad(build: => org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("events-drift").toFile
    dir.deleteOnExit()
    build.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir.toString)
  }

  // 2024-01-01T00:00:01.5Z as epoch micros
  private val epochUs = 1704067201500000L

  test("ts as epoch-nanos long normalizes to TIMESTAMP at the same instant") {
    import spark.implicits._
    val got = writeAndLoad(
      Seq((1L, epochUs * 1000L)).toDF("event_id", "ts"))
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) == epochUs)
  }

  test("ts as TIMESTAMP_NTZ normalizes to TIMESTAMP at the same instant (UTC session)") {
    import spark.implicits._
    val got = writeAndLoad(
      Seq((1L, epochUs)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) == epochUs)
  }

  test("ts already TIMESTAMP passes through unchanged") {
    import spark.implicits._
    val got = writeAndLoad(
      Seq((1L, epochUs)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) == epochUs)
  }

  test("the real events table loads with a TIMESTAMP ts at every committed SF") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == TimestampType, s"sf=$sf")
      assert(df.limit(1).count() == 1, s"sf=$sf")
    }
  }

  test("fanOut widens a small file scan to full parallelism without driver RDD work") {
    // a one-row-group parquet file estimates to 1 split -> repartition
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val fanned = Tables.fanOut(df)
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // projections still hit the file-relation estimate path (no change
    // in behavior vs the old per-call df.rdd probe)
    val proj = Tables.fanOut(df.select(org.apache.spark.sql.functions.col("doc_id")))
    assert(proj.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // in-memory frames fall back and stay untouched when already wide
    import spark.implicits._
    val mem = spark.range(1000).toDF("n").repartition(spark.sparkContext.defaultParallelism)
    assert(Tables.fanOut(mem).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }
}
