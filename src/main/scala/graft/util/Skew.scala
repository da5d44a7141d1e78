package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution AQE's runtime
  * skew-join splitting cannot fix (e.g. a single pathological key on
  * BOTH sides). Classic salting: fan the skewed side out over
  * `saltBuckets` sub-keys and replicate the other side once per bucket.
  * Deterministic (salt = hash of the row) so results are reproducible.
  */
object Skew {

  /** Equi-join `left ⋈ right ON leftKey = rightKey` with salting.
    * `left` is the large/skewed side. */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would null-extend every replicated right copy →
    // saltBuckets duplicates per unmatched right row
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types only, got $joinType")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets))
        .cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("_salt") === saltedRight("_salt"), joinType)
      .drop("_salt")
  }
}
