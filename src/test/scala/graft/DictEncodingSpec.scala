package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.{Quad, TermDictionary}

class DictEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    Seq(
      Quad.iri("g1", "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.iri("g2", "http://ex/b", "http://ex/p", "http://ex/a"),
      Quad.lit("g1", "http://ex/a", "http://ex/q", "plain \"quoted\" \\slash"),
      Quad.typed("g1", "http://ex/a", "http://ex/q", "42", Quad.xsd.integer),
      Quad("g1", "http://ex/a", "http://ex/q", "hallo", null, "nl",
        Quad.KindLiteral),
      Quad("g1", "_:b1", "http://ex/p", "_:b2", null, null, Quad.KindBnode)
    ).toDF()
  }

  test("dictionary ids are dense 0..n-1 in term sort order") {
    val dict = TermDictionary.dictionary(fixture)
    val rows = dict.orderBy("id").collect()
    assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
    val terms = rows.map(_.getString(0)).toSeq
    assert(terms == terms.sorted)
    assert(terms.distinct.size == terms.size)
    // mixed kinds collide nowhere: the quoted literal, the typed
    // literal, the lang literal, IRIs and bnodes are all distinct terms
    assert(terms.contains("\"plain \\\"quoted\\\" \\\\slash\""))
    assert(terms.contains("\"42\"^^<" + Quad.xsd.integer + ">"))
    assert(terms.contains("\"hallo\"@nl"))
    assert(terms.contains("_:b2"))
  }

  test("encode → decode round-trips; intermediates are all-long") {
    val quads = fixture
    val dict = TermDictionary.dictionary(quads)
    val enc = TermDictionary.encode(quads, dict)
    assert(enc.schema.fields.filter(_.name.endsWith("_id"))
      .forall(_.dataType == org.apache.spark.sql.types.LongType))
    assert(enc.count() == quads.count())
    // graph survives as the partition-key string
    assert(enc.select("graph").distinct().count() == 2)
    val dec = TermDictionary.decode(
      TermDictionary.decode(
        TermDictionary.decode(enc, dict, "s_id", "s"),
        dict, "p_id", "p"),
      dict, "o_id", "o")
    val back = dec.select("graph", "s", "p", "o").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    val expected = quads.select(col("graph"), col("s"), col("p"),
      TermDictionary.objTerm(col("o_value"), col("o_type"), col("o_lang"),
        col("o_kind")).as("o")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(back == expected)
  }

  test("append freezes base ids and appends only new terms after range") {
    import spark.implicits._
    val base = fixture
    val dict0 = TermDictionary.dictionary(base)
    val n0 = dict0.count()
    val newQuads = Seq(
      // one fully-known quad (no new terms) and one with two new terms
      Quad.iri("g1", "http://ex/a", "http://ex/p", "http://ex/b"),
      Quad.lit("g1", "http://ex/zz", "http://ex/p", "fresh")).toDF()
    val dict1 = TermDictionary.append(dict0, newQuads)
    // base ids unchanged
    val frozen = dict1.join(dict0.withColumnRenamed("id", "id0"), "term")
    assert(frozen.filter(org.apache.spark.sql.functions
      .col("id") =!= org.apache.spark.sql.functions.col("id0")).count() == 0)
    // exactly the two unseen terms got the next ids, sorted
    val added = dict1.join(dict0.select("term"), Seq("term"), "left_anti")
      .orderBy("id").collect()
    assert(added.map(_.getString(0)).toSeq == Seq("\"fresh\"", "http://ex/zz"))
    assert(added.map(_.getLong(1)).toSeq == Seq(n0, n0 + 1))
  }

  test("constantIds resolves exactly the asked-for terms") {
    val dict = TermDictionary.dictionary(fixture)
    val ids = TermDictionary.constantIds(dict,
      Seq("http://ex/p", "\"hallo\"@nl", "urn:absent"))
    assert(ids.size == 2)
    assert(ids.contains("http://ex/p") && ids.contains("\"hallo\"@nl"))
  }
}
