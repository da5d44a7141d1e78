package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sparql.SparqlFunctions.{normalize_nfc, normalize_nfkc}

/** Unicode normalization expression semantics (NFC oracle-checked at
  * the driver gate; NFKC has no DuckDB twin, so its compatibility
  * foldings are pinned here).
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(c: org.apache.spark.sql.Column, input: String): String = {
    import spark.implicits._
    Seq(input).toDF("s").select(c.as("n")).collect().head.getString(0)
  }

  test("NFC composes combining sequences") {
    assert(run(normalize_nfc(col("s")), "café") == "café")
    assert(run(normalize_nfc(col("s")), "Å") == "Å")
    assert(run(normalize_nfc(col("s")), "plain") == "plain")
  }

  test("NFKC additionally folds compatibility characters") {
    // U+FB01 LATIN SMALL LIGATURE FI -> "fi"; U+FF21 FULLWIDTH A -> "A"
    assert(run(normalize_nfkc(col("s")), "ﬁle") == "file")
    assert(run(normalize_nfkc(col("s")), "ＡBC") == "ABC")
    // NFC leaves compatibility characters alone
    assert(run(normalize_nfc(col("s")), "ﬁle") == "ﬁle")
  }

  test("null propagates; expression survives both eval paths") {
    import spark.implicits._
    val df = Seq(Some("é"), None).toDF("s")
    val got = df.select(normalize_nfc(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("é"), None))
    // interpreted path (no codegen): same result
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val got2 = df.select(normalize_nfc(col("s")).as("n"))
        .collect().map(r => Option(r.getString(0)))
      assert(got2.toSeq == Seq(Some("é"), None))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
