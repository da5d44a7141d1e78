package graft.util

import org.apache.spark.sql.DataFrame

/** Bucketed-layout helpers: pre-shuffling fact tables into N buckets on
  * the join key so repeated fact-fact joins (orders ⋈ lineitem at every
  * SF, quad self-joins at 100 TB) are co-located — the shuffle happens
  * once at write time instead of per query.
  */
object Bucketing {

  /** Write `df` as a bucketed (+ in-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
}
