package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{GraphStore, Quad}
import graft.pipeline.Pipeline
import graft.queries.ReferenceMappings._
import graft.sparql.Compiler

/** Golden end-to-end test of the 16 mapping queries over FIXTURES.md
  * fixtures — SURVEY.md §5.2 item 3/5. MD5 skolemization makes every
  * expected IRI computable in the test (SURVEY.md §4.2).
  */
class MappingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  lazy val store: GraphStore = {
    val st = graft.queries.Fixtures.ingestAll(spark,
      Files.createTempDirectory("kg").toString + "/quads")
    val p = new Pipeline(st)
    p.runMappings()
    p.addProvenance("run_1", "2026-01-01T00:00:00")
    st
  }

  private lazy val out: Set[(String, String, String, String, String, String)] =
    store.readGraphs(Seq(gOrganizations)).collect().map(r =>
      (r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6))).toSet

  private def has(s: String, p: String, o: String,
      dt: String = null, lang: String = null, kind: String = Quad.KindIri): Boolean =
    out.contains((s, p, o, dt, lang, kind))
  private def hasLit(s: String, p: String, o: String,
      dt: String = null, lang: String = null): Boolean =
    has(s, p, o, dt, lang, Quad.KindLiteral)

  private val rdfType = graft.sparql.Algebra.dsl.rdfType
  private val org1 = idNs + "OR-w66976m"
  private val orgTl = idNs + "OR-tl1"

  test("map_mam_tenants: minimal end-to-end slice") {
    assert(hasLit(org1, mh + "label", "Tenant display name"))
  }

  test("ldap_mapping_org: full org with address skolemization") {
    assert(has(org1, rdfType, orgNs + "Organization"))
    assert(hasLit(org1, schemaNs + "identifier", "OR-w66976m"))
    assert(hasLit(org1, skos + "altLabel", "Main Org"))
    assert(hasLit(org1, meemoo + "sector", "Cultuur"))
    val site = idNs + md5hex("OR-w66976m-primary")
    val siteAddress = idNs + md5hex("Straat 19000Gent")
    assert(has(org1, orgNs + "hasPrimarySite", site))
    assert(has(org1, orgNs + "hasSite", site))
    assert(has(site, orgNs + "siteAddress", siteAddress))
    assert(hasLit(siteAddress, schemaNs + "streetAddress", "Straat 1"))
    assert(hasLit(siteAddress, schemaNs + "addressCountry", "BE"))
    assert(hasLit(siteAddress, schemaNs + "addressRegion", "Oost-Vlaanderen"))
  }

  test("ldap_mapping_org: partial optionals skip only unbound template triples") {
    val org2 = idNs + "OR-school1"
    assert(has(org2, rdfType, orgNs + "Organization"))
    assert(hasLit(org2, skos + "altLabel", "School Org"))
    // site is derived from orid only → bound even without address
    val site2 = idNs + md5hex("OR-school1-primary")
    assert(has(org2, orgNs + "hasPrimarySite", site2))
    // siteAddress needs street+postal+city → unbound → no triple
    assert(!out.exists(q => q._1 == site2 && q._2 == orgNs + "siteAddress"))
    assert(!out.exists(q => q._1 == org2 && q._2 == meemoo + "sector"))
  }

  test("ldap classifiers: businessCategory / objectClass variants") {
    assert(has(org1, rdfType, meemoo + "ContentPartner"))
    assert(has(idNs + "OR-school1", rdfType, meemoo + "School"))
    assert(has(idNs + "OR-edu1", rdfType, meemoo + "EducationalOrganization"))
    assert(!out.exists(q => q._3 == meemoo + "ServiceProvider"))
  }

  test("ldap_mapping_unit: 3-hop structural join") {
    val unit = idNs + md5hex("OR-w66976m-unit")
    val usite = idNs + md5hex("OR-w66976m-unit-site")
    val uaddr = idNs + md5hex("Unitstraat 29001Gent")
    assert(has(org1, orgNs + "hasUnit", unit))
    assert(has(unit, orgNs + "unitOf", org1))
    assert(hasLit(unit, schemaNs + "identifier", "OR-w66976m-unit"))
    assert(hasLit(unit, skos + "prefLabel", "Unit name"))
    assert(has(unit, orgNs + "hasPrimarySite", usite))
    assert(has(usite, orgNs + "siteAddress", uaddr))
    assert(hasLit(uaddr, schemaNs + "addressLocality", "Gent"))
    // unit has no sector fixture → no sector triple
    assert(!out.exists(q => q._1 == unit && q._2 == meemoo + "sector"))
  }

  test("tl_companies_mapping_org: custom-field join + conditionals") {
    assert(has(orgTl, rdfType, orgNs + "Organization"))
    assert(hasLit(orgTl, schemaNs + "identifier", "OR-tl1"))
    assert(hasLit(orgTl, skos + "prefLabel", "Company BV"))
    // STRSTARTS/IF: www-prefixed website → http://
    assert(has(orgTl, foaf + "homepage", "http://www.example.be"))
    // STRLANG description
    assert(hasLit(orgTl, dct + "description", "Beschrijving", lang = "nl"))
    val site = idNs + md5hex("OR-tl1-site")
    val siteAddress = idNs + md5hex("Straat 19000Gent")
    assert(has(orgTl, orgNs + "hasPrimarySite", site))
    assert(has(site, orgNs + "siteAddress", siteAddress))
    assert(hasLit(siteAddress, schemaNs + "addressCountry", "BE"))
    // account manager both directions
    val am = idNs + md5hex("tl-user-1")
    assert(has(orgTl, meemoo + "hasAccountManager", am))
    assert(has(am, meemoo + "isAccountManagerOf", orgTl))
  }

  test("tl_companies_mapping_contactpoint: correlated nested optional") {
    val contact = idNs + md5hex("OR-tl1-primary")
    assert(has(orgTl, schemaNs + "contactPoint", contact))
    assert(has(contact, rdfType, schemaNs + "ContactPoint"))
    assert(hasLit(contact, schemaNs + "contactType", "primary"))
    assert(hasLit(contact, schemaNs + "email", "info@example.be"))
    // telephone correlated on ?etype: only the "primary" number matches
    assert(hasLit(contact, schemaNs + "telephone", "+3291234567"))
    assert(!out.exists(q => q._3 == "+3290000001")) // fax type has no email
    val onts = idNs + md5hex("OR-tl1-ontsluiting")
    assert(hasLit(onts, schemaNs + "contactType", "ontsluiting"))
    assert(hasLit(onts, schemaNs + "email", "onts@example.be"))
    assert(hasLit(onts, schemaNs + "telephone", "+329000000"))
    val fact = idNs + md5hex("OR-tl1-facturatie")
    assert(hasLit(fact, schemaNs + "email", "fact@example.be"))
    assert(hasLit(orgTl, meemoo + "requestForm", "https://forms.example.be/x"))
  }

  test("tl_companies cp/classification/overlay") {
    assert(has(orgTl, rdfType, meemoo + "ContentPartner"))
    // LCASE(REPLACE(STRAFTER('1 - Type - Cultuur Instelling',' - '),' ','_'))
    val cls = "https://data.hetarchief.be/id/organization-type/type_-_cultuur_instelling"
    assert(has(orgTl, orgNs + "classification", cls))
    assert(hasLit(orgTl, meemoo + "allowsOverlay", "true", dt = Quad.xsd.boolean))
    assert(hasLit(orgTl, meemoo + "allowsBZT", "false", dt = Quad.xsd.boolean))
  }

  test("tl_users_mapping: partial template + ENCODE_FOR_URI") {
    val am1 = idNs + md5hex("u-1")
    val post1 = idNs + md5hex("u-1Account manager")
    val role1 = "https://data.hetarchief.be/id/organization-role/Account%20manager"
    assert(has(am1, rdfType, schemaNs + "Person"))
    assert(has(am1, rdfType, foaf + "Agent"))
    assert(hasLit(am1, schemaNs + "givenName", "An"))
    assert(hasLit(am1, schemaNs + "email", "mailto:an@meemoo.be")) // literal, not IRI
    assert(hasLit(am1, schemaNs + "telephone", "+32470000000"))
    assert(has(am1, orgNs + "holds", post1))
    assert(has(post1, orgNs + "postIn", idNs + "OR-w66976m"))
    assert(has(post1, orgNs + "role", role1))
    assert(hasLit(role1, skos + "prefLabel", "Account manager", lang = "nl"))
    // user without function: Person inserted, post/role skipped (Q10)
    val am2 = idNs + md5hex("u-2")
    assert(has(am2, rdfType, schemaNs + "Person"))
    assert(hasLit(am2, schemaNs + "givenName", "Jan"))
    assert(!out.exists(q => q._1 == am2 && q._2 == orgNs + "holds"))
  }

  test("logo overlays (inline ml / tl_ml)") {
    assert(has(orgTl, schemaNs + "logo", "https://assets.viaa.be/images/OR-tl1"))
    assert(has(org1, schemaNs + "logo", "https://assets.viaa.be/images/OR-w66976m"))
  }

  test("provenance quads (task mp)") {
    val prov = "http://www.w3.org/ns/prov#"
    val prv = store.readGraphs(Seq(gProvenance)).collect()
    assert(prv.length == 9)
    assert(prv.count(_.getString(2) == prov + "wasDerivedFrom") == 3)
  }

  test("full pipeline lifecycle: run() drops staging and compacts target") {
    val st = graft.queries.Fixtures.ingestAll(spark,
      Files.createTempDirectory("kglife").toString + "/quads")
    val p = new Pipeline(st)
    p.run("run_life", "2026-01-01T00:00:00")
    // staging graphs dropped (d1-d5)
    p.stagingGraphs.foreach(g => assert(st.countGraph(g) == 0, g))
    // target populated and compacted to a single file
    assert(st.countGraph(gOrganizations) > 0)
    assert(st.countGraph(gProvenance) == 9)
    val dir = new java.io.File(st.path,
      "graph=" + java.net.URLEncoder.encode(gOrganizations, "UTF-8")
        .replace("+", "%20"))
    // partition dir exists with exactly one parquet data file
    if (dir.exists()) {
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, files.mkString(", "))
    }
  }

  test("set semantics: overlapping ContentPartner inserts collapse") {
    // ldap_mapping_cp and tl_companies_mapping_cp both assert rdf:type
    // ContentPartner; the merged graph holds each statement once
    val cpCount = store.readGraphs(Seq(gOrganizations)).collect()
      .count(r => r.getString(1) == org1 && r.getString(2) == rdfType &&
        r.getString(3) == meemoo + "ContentPartner")
    assert(cpCount == 1)
  }
}
