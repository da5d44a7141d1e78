package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor directory.
  * Reads are plain `spark.read.parquet` so Catalyst handles column
  * pruning + predicate pushdown; at cluster scale these would be
  * directory-partitioned datasets and the same code applies unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** Normalize `events.ts` to TIMESTAMP (ltz) whatever the generator
    * wrote: TIMESTAMP(NANOS) (Spark can't represent it — read as long
    * via the legacy conf and truncate to micros), TIMESTAMP_NTZ (cast;
    * sessions run UTC so wall-clock == instant), or already TIMESTAMP.
    * Set per-read so the session the driver builds needs no special conf.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(s, d, "events"))
  }

  private[graft] def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: `/` would go through double and lose
        // precision (epoch nanos ~1.7e18 > 2^53)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Fan a narrow input out to the session's full parallelism before
    * CPU-heavy per-row work (tokenize/shingle, JSON flatten, vector
    * math). At cluster scale inputs arrive as many splits and this is a
    * no-op (guarded on the current partition count); on the local
    * single-row-group test files it is the difference between 1 busy
    * core and all of them. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = estimatedScanPartitions(df)
      // non-file inputs (tests, in-memory frames): fall back to the RDD
      // lineage count — rare, and still correct
      .getOrElse(df.rdd.getNumPartitions.toLong)
    if (parts >= target) df else df.repartition(target)
  }

  /** Estimate the scan's input-split count from the ANALYZED plan's file
    * relations (bytes / maxPartitionBytes per file listing) — no
    * optimization, physical planning, or RDD materialization on the
    * driver, which `df.rdd.getNumPartitions` would trigger on every
    * call. The estimate only feeds the fan-out guard: at cluster scale
    * any real dataset is ≥ parallelism splits either way. */
  private def estimatedScanPartitions(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val maxBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val perLeaf = leaves.map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(math.max(1L, (fs.location.sizeInBytes + maxBytes - 1) / maxBytes))
        case _ => None
      }
      case _ => None
    }
    if (perLeaf.nonEmpty && perLeaf.forall(_.isDefined)) Some(perLeaf.flatten.sum)
    else None
  }
}
