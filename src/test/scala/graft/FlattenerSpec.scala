package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.JsonFlattener
import graft.model.Quad

/** Pins every flattener behavior listed in FIXTURES.md §6 / SURVEY.md §2.2. */
class FlattenerSpec extends AnyFunSuite {
  private val ns = "http://localhost/"
  private def flat(json: String, instanceNs: Option[String] = None) =
    JsonFlattener.flattenRecord(json, "g", ns, "t", instanceNs)

  test("null values are dropped") {
    assert(flat("""{"a": null}""").isEmpty)
  }

  test("scalar array: same predicate, typed literals per element") {
    val qs = flat("""{"a": [1, 2.5, true, "x"]}""")
    assert(qs.size == 4)
    assert(qs.forall(_.p == ns + "a"))
    assert(qs.map(q => (q.o_value, q.o_type)) == Seq(
      ("1", Quad.xsd.integer),
      ("2.5", Quad.xsd.double),
      ("true", Quad.xsd.boolean),
      ("x", null)))
    // all on the same (root) subject
    assert(qs.map(_.s).distinct.size == 1)
  }

  test("nested object: parent→child link triple + child literal") {
    val qs = flat("""{"a": {"b": 1}}""")
    assert(qs.size == 2)
    val link = qs.head
    assert(link.p == ns + "a" && link.o_kind == Quad.KindBnode)
    val leaf = qs(1)
    assert(leaf.s == link.o_value && leaf.p == ns + "b" && leaf.o_value == "1")
  }

  test("array of objects: distinct bnodes, property restored after each") {
    val qs = flat("""{"a": [{"b":1},{"b":2}]}""")
    assert(qs.size == 4)
    val links = qs.filter(_.p == ns + "a")
    assert(links.size == 2)
    assert(links.map(_.o_value).distinct.size == 2)
    val leaves = qs.filter(_.p == ns + "b")
    assert(leaves.map(_.o_value).sorted == Seq("1", "2"))
    // each leaf hangs off its own bnode
    assert(leaves.map(_.s).toSet == links.map(_.o_value).toSet)
  }

  test("top-level array of objects: independent subgraphs, no root link") {
    val qs = flat("""[{"x":1},{"x":2}]""")
    assert(qs.size == 2)
    assert(qs.map(_.s).distinct.size == 2)
    assert(qs.forall(_.p == ns + "x"))
  }

  test("instance_ns mode numbers subjects ns/0, ns/1, ...") {
    val qs = flat("""[{"x":1},{"x":2}]""", Some("http://ex/i/"))
    assert(qs.map(_.s) == Seq("http://ex/i/0", "http://ex/i/1"))
  }

  test("property save/restore across nested map inside array") {
    // after the nested {"c":2} closes, the array property "a" is restored
    val qs = flat("""{"a": [1, {"c": 2}, 3]}""")
    val byPred = qs.groupBy(_.p)
    assert(byPred(ns + "a").size == 3) // 1, link, 3
    assert(byPred(ns + "c").size == 1)
    val rootSubjects = byPred(ns + "a").map(_.s).distinct
    assert(rootSubjects.size == 1)
  }

  test("deep nesting links chain correctly") {
    val qs = flat("""{"a": {"b": {"c": "leaf"}}}""")
    assert(qs.size == 3)
    val la = qs.find(_.p == ns + "a").get
    val lb = qs.find(_.p == ns + "b").get
    val lc = qs.find(_.p == ns + "c").get
    assert(lb.s == la.o_value && lc.s == lb.o_value && lc.o_value == "leaf")
  }

  test("distributed flatten produces unique bnodes across rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("""{"a":{"b":1}}""", """{"a":{"b":2}}""").toDF("json")
    val quads = JsonFlattener.flatten(df, "json", "g").collect()
    assert(quads.length == 4)
    val allSubjects = quads.map(_.s).distinct
    assert(allSubjects.forall(Quad.isBnode))
    assert(allSubjects.length == 4) // 2 roots + 2 children, all distinct
  }
}
