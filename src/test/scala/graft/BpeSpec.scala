package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE merge semantics on hand-checked words (the full 3-round training
  * is oracle-recomputed at the driver gate).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def merge(word: String, l: String, r: String): Seq[String] = {
    import spark.implicits._
    Seq(word).toDF("w")
      .select(Bpe.mergePair(Bpe.charSyms(col("w")), l, r).as("s"))
      .collect().head.getSeq[String](0).toSeq
  }

  test("greedy left-to-right merge handles overlapping runs like canonical BPE") {
    assert(merge("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(merge("aaa", "a", "a") == Seq("aa", "a"))
    assert(merge("banana", "a", "n") == Seq("b", "an", "an", "a"))
  }

  test("merged symbol is atomic: no re-merge across the new boundary") {
    // after (a,b)->ab, the pair (b,a) must not match inside "ab a"
    assert(merge("aba", "b", "a") == Seq("a", "ba"))
    assert(merge("abab", "a", "b") == Seq("ab", "ab"))
  }

  test("single-char and no-match words pass through") {
    assert(merge("x", "a", "b") == Seq("x"))
    assert(merge("xyz", "a", "b") == Seq("x", "y", "z"))
  }

  test("fixture training: merges reduce the weighted symbol count monotonically") {
    val rows = SparkEntry.queries("text_bpe_train")(spark, sf).collect()
    assert(rows.length == Bpe.Rounds)
    val counts = rows.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => b < a },
      "each merge strictly shrinks the corpus symbol count")
    val pairCounts = rows.map(_.getLong(3))
    assert(pairCounts.forall(_ > 0))
  }
}
