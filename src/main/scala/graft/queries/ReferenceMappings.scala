package graft.queries

import graft.sparql.Algebra._
import graft.sparql.Algebra.dsl._

/** The reference's 16 mapping tasks (13 file-based + map_mam_tenants +
  * 2 inline logo overlays), hand-transcribed from SPARQL to the engine's
  * algebra. Citations are to `/root/reference/airflow_files/dags/`.
  *
  * Each query reads the USING graphs (merged), evaluates the WHERE group,
  * and inserts the template quads into `graphs:organizations`.
  */
object ReferenceMappings {

  // vocabularies (as declared in the reference PREFIX headers)
  val graphs = "https://data.hetarchief.be/graph/"
  val source = "https://data.hetarchief.be/ns/source/"
  val orgNs = "http://www.w3.org/ns/org#"
  val schemaNs = "https://schema.org/"
  val skos = "http://www.w3.org/2004/02/skos/core#"
  val meemoo = "https://data.hetarchief.be/ns/organization/"
  val foaf = "http://xmlns.com/foaf/0.1/"
  val dct = "http://purl.org/dc/terms/"
  val mh = "https://data.hetarchief.be/ns/mediahaven/"
  val xsdNs = "http://www.w3.org/2001/XMLSchema#"
  val idNs = "https://data.hetarchief.be/id/organization/"

  val gOrganizations = graphs + "organizations"
  val gLdap = graphs + "ldap_organizations"
  val gTlUsers = graphs + "tl_users"
  val gTlCompanies = graphs + "tl_companies"
  val gTlCustomFields = graphs + "tl_custom_fields"
  val gMamTenants = graphs + "mediahaven_tenants"
  val gProvenance = graphs + "provenance"

  private def bindNs = bind(str(idNs), "ns")
  private def orgFromOrid = bind(uri(cc(str(idNs), vr("orid"))), "org")

  /** `?o source:custom_fields [ source:value ?v; source:definition
    * [ source:id ?idVar ] ]` — the Q3 bnode property path, expanded with
    * generated anon variables (`tl_companies_mapping_org.sparql:40-46`). */
  private def customFieldBranch(oVar: String, valueNode: Node, idVar: String,
      tag: String): Seq[Element] = {
    val cf = s"_cf_$tag"
    val cfDef = s"_cfdef_$tag"
    Seq(
      pat(v(oVar), source + "custom_fields", v(cf)),
      pat(v(cf), source + "value", valueNode),
      pat(v(cf), source + "definition", v(cfDef)),
      pat(v(cfDef), source + "id", v(idVar)))
  }

  /** `?cfVar source:id ?idVar; source:label "<label>"` — the dimension
    * probe against tl_custom_fields (~1 row; broadcast-join fodder). */
  private def customFieldDef(cfVar: String, idVar: String, label: String): Seq[Element] =
    Seq(
      pat(v(cfVar), source + "id", v(idVar)),
      pat(v(cfVar), source + "label", l(label)))

  // ------------------------------------------------------------------
  // ldap_mapping_org.sparql (m1)
  val ldapOrg: MappingQuery = MappingQuery(
    name = "ldap_mapping_org",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gLdap),
    where = Group(Seq(
      bindNs,
      pat(v("o"), source + "objectClass", l("organization")),
      pat(v("o"), source + "o", v("orid")),
      pat(v("o"), source + "description", v("orgName")),
      bind(uri(cc(vr("ns"), vr("orid"))), "org"),
      opt(pat(v("o"), source + "street", v("streetAddress"))),
      opt(pat(v("o"), source + "postalCode", v("postalCode"))),
      opt(pat(v("o"), source + "l", v("city"))),
      opt(pat(v("o"), source + "st", v("region"))),
      opt(pat(v("o"), source + "x-be-viaa-sector", v("sector"))),
      bind(uri(cc(vr("ns"), md5e(cc(vr("orid"), str("-primary"))))), "site"),
      bind(uri(cc(vr("ns"), md5e(cc(vr("streetAddress"), vr("postalCode"),
        vr("city"))))), "siteAddress"))),
    template = Seq(
      TriplePattern(v("org"), i(rdfType), i(orgNs + "Organization")),
      TriplePattern(v("org"), i(schemaNs + "identifier"), v("orid")),
      TriplePattern(v("org"), i(skos + "altLabel"), v("orgName")),
      TriplePattern(v("org"), i(meemoo + "sector"), v("sector")),
      TriplePattern(v("org"), i(orgNs + "hasPrimarySite"), v("site")),
      TriplePattern(v("org"), i(orgNs + "hasSite"), v("site")),
      TriplePattern(v("site"), i(rdfType), i(orgNs + "Site")),
      TriplePattern(v("site"), i(orgNs + "siteAddress"), v("siteAddress")),
      TriplePattern(v("siteAddress"), i(rdfType), i(schemaNs + "PostalAddress")),
      TriplePattern(v("siteAddress"), i(schemaNs + "streetAddress"), v("streetAddress")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressCountry"), l("BE")),
      TriplePattern(v("siteAddress"), i(schemaNs + "postalCode"), v("postalCode")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressRegion"), v("region")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressLocality"), v("city"))))

  // ------------------------------------------------------------------
  // ldap_mapping_unit.sparql (m11) — the 3-hop structural join
  val ldapUnit: MappingQuery = MappingQuery(
    name = "ldap_mapping_unit",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gLdap),
    where = Group(Seq(
      bindNs,
      pat(v("u"), source + "objectClass", l("organizationalUnit")),
      pat(v("u"), source + "ou", v("ou")),
      pat(v("u"), source + "description", v("name")),
      pat(v("units"), source + "attributes", v("u")),
      pat(v("x"), source + "units", v("units")),
      pat(v("x"), source + "attributes", v("o")),
      pat(v("o"), source + "objectClass", l("organization")),
      pat(v("o"), source + "o", v("orid")),
      bind(uri(cc(vr("ns"), vr("orid"))), "org"),
      opt(pat(v("u"), source + "street", v("streetAddress"))),
      opt(pat(v("u"), source + "postalCode", v("postalCode"))),
      opt(pat(v("u"), source + "l", v("city"))),
      opt(pat(v("u"), source + "st", v("region"))),
      opt(pat(v("u"), source + "x-be-viaa-sector", v("sector"))),
      bind(uri(cc(vr("ns"), md5e(vr("ou")))), "unit"),
      bind(uri(cc(vr("ns"), md5e(cc(vr("ou"), str("-site"))))), "site"),
      bind(uri(cc(vr("ns"), md5e(cc(vr("streetAddress"), vr("postalCode"),
        vr("city"))))), "siteAddress"))),
    template = Seq(
      TriplePattern(v("org"), i(orgNs + "hasUnit"), v("unit")),
      TriplePattern(v("unit"), i(rdfType), i(orgNs + "OrganizationalUnit")),
      TriplePattern(v("unit"), i(orgNs + "unitOf"), v("org")),
      TriplePattern(v("unit"), i(schemaNs + "identifier"), v("ou")),
      TriplePattern(v("unit"), i(skos + "prefLabel"), v("name")),
      TriplePattern(v("unit"), i(meemoo + "sector"), v("sector")),
      TriplePattern(v("unit"), i(orgNs + "hasPrimarySite"), v("site")),
      TriplePattern(v("unit"), i(orgNs + "hasSite"), v("site")),
      TriplePattern(v("site"), i(rdfType), i(orgNs + "Site")),
      TriplePattern(v("site"), i(orgNs + "siteAddress"), v("siteAddress")),
      TriplePattern(v("siteAddress"), i(rdfType), i(schemaNs + "PostalAddress")),
      TriplePattern(v("siteAddress"), i(schemaNs + "streetAddress"), v("streetAddress")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressCountry"), l("BE")),
      TriplePattern(v("siteAddress"), i(schemaNs + "postalCode"), v("postalCode")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressRegion"), v("region")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressLocality"), v("city"))))

  // ------------------------------------------------------------------
  // businessCategory / objectClass classifier family (m4, m5, m9, m12, m13)
  private def ldapClassifier(name: String, typeIri: String,
      businessCategory: Option[String],
      objectClass: String = "organization"): MappingQuery =
    MappingQuery(
      name = name,
      targetGraph = gOrganizations,
      usingGraphs = Seq(gLdap),
      where = Group(
        Seq(pat(v("o"), source + "objectClass", l(objectClass))) ++
        businessCategory.map(bc =>
          pat(v("o"), source + "businessCategory", l(bc))).toSeq ++
        Seq(pat(v("o"), source + "o", v("orid")), orgFromOrid)),
      template = Seq(TriplePattern(v("org"), i(rdfType), i(typeIri))))

  val ldapSchool: MappingQuery =
    ldapClassifier("ldap_mapping_school", meemoo + "School", Some("School"))
  val ldapEduOrg: MappingQuery =
    ldapClassifier("ldap_mapping_eduorg", meemoo + "EducationalOrganization",
      None, objectClass = "x-be-viaa-educationalOrganization")
  val ldapCp: MappingQuery =
    ldapClassifier("ldap_mapping_cp", meemoo + "ContentPartner", Some("Content Partner"))
  val ldapSp: MappingQuery =
    ldapClassifier("ldap_mapping_sp", meemoo + "ServiceProvider", Some("Service Provider"))
  val ldapSc: MappingQuery =
    ldapClassifier("ldap_mapping_sc", meemoo + "ServiceConsumer", Some("Customer"))

  // ------------------------------------------------------------------
  // tl_companies_mapping_org.sparql (m3)
  val tlCompaniesOrg: MappingQuery = MappingQuery(
    name = "tl_companies_mapping_org",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gTlCompanies, gTlCustomFields),
    where = Group(
      Seq[Element](bindNs) ++
      customFieldDef("cf_orid", "cf_orid_id", "5.1 - OR-ID") ++
      customFieldBranch("o", v("orid"), "cf_orid_id", "orid") ++
      Seq(
        bind(uri(cc(vr("ns"), vr("orid"))), "org"),
        bind(uri(cc(vr("ns"), md5e(cc(vr("orid"), str("-site"))))), "site"),
        opt(pat(v("o"), source + "name", v("orgName"))),
        opt(
          pat(v("o"), source + "website", v("website")),
          bind(uri(IfE(StrStartsE(vr("website"), str("www")),
            cc(str("http://"), vr("website")), vr("website"))), "homepage")),
        opt(
          pat(v("o"), source + "addresses", v("addresses")),
          pat(v("addresses"), source + "type", v("addressType")),
          pat(v("addresses"), source + "address", v("address")),
          pat(v("address"), source + "line_1", v("streetAddress")),
          pat(v("address"), source + "postal_code", v("postalCode")),
          pat(v("address"), source + "city", v("city")),
          pat(v("address"), source + "country", v("country"))),
        bind(uri(cc(vr("ns"), md5e(cc(vr("streetAddress"), vr("postalCode"),
          vr("city"))))), "siteAddress"),
        Opt(Group(
          customFieldDef("cf_omsch", "cf_omsch_id", "CP - Omschrijving (200 tek.)") ++
          customFieldBranch("o", v("omschrijving_field"), "cf_omsch_id", "omsch") :+
          bind(StrLangE(vr("omschrijving_field"), "nl"), "desc"))),
        opt(
          pat(v("o"), source + "responsible_user", v("_ru")),
          pat(v("_ru"), source + "id", v("amid"))),
        bind(uri(cc(vr("ns"), md5e(vr("amid")))), "am"))),
    template = Seq(
      TriplePattern(v("org"), i(rdfType), i(orgNs + "Organization")),
      TriplePattern(v("org"), i(schemaNs + "identifier"), v("orid")),
      TriplePattern(v("org"), i(skos + "prefLabel"), v("orgName")),
      TriplePattern(v("org"), i(foaf + "homepage"), v("homepage")),
      TriplePattern(v("org"), i(dct + "description"), v("desc")),
      TriplePattern(v("org"), i(orgNs + "hasPrimarySite"), v("site")),
      TriplePattern(v("org"), i(orgNs + "hasSite"), v("site")),
      TriplePattern(v("site"), i(rdfType), i(orgNs + "Site")),
      TriplePattern(v("site"), i(orgNs + "siteAddress"), v("siteAddress")),
      TriplePattern(v("siteAddress"), i(rdfType), i(schemaNs + "PostalAddress")),
      TriplePattern(v("siteAddress"), i(schemaNs + "streetAddress"), v("streetAddress")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressCountry"), v("country")),
      TriplePattern(v("siteAddress"), i(schemaNs + "postalCode"), v("postalCode")),
      TriplePattern(v("siteAddress"), i(schemaNs + "addressLocality"), v("city")),
      TriplePattern(v("org"), i(meemoo + "hasAccountManager"), v("am")),
      TriplePattern(v("am"), i(meemoo + "isAccountManagerOf"), v("org"))))

  // ------------------------------------------------------------------
  // tl_companies_mapping_contactpoint.sparql (m6)
  val tlCompaniesContactPoint: MappingQuery = MappingQuery(
    name = "tl_companies_mapping_contactpoint",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gTlCompanies, gTlCustomFields),
    where = Group(
      Seq[Element](bindNs) ++
      customFieldDef("cf_orid", "cf_orid_id", "5.1 - OR-ID") ++
      customFieldBranch("o", v("orid"), "cf_orid_id", "orid") ++
      Seq(
        opt(
          pat(v("o"), source + "emails", v("emails")),
          pat(v("emails"), source + "type", v("etype")),
          pat(v("emails"), source + "email", v("email")),
          opt(
            pat(v("o"), source + "telephones", v("telephones")),
            pat(v("telephones"), source + "type", v("etype")),
            pat(v("telephones"), source + "number", v("telnumber")))),
        bind(uri(cc(vr("ns"), vr("orid"))), "org"),
        bind(uri(cc(vr("ns"), md5e(cc(vr("orid"), str("-"), vr("etype"))))), "contact"),
        bind(uri(cc(vr("ns"), md5e(cc(vr("orid"), str("-ontsluiting"))))),
          "contact_ontsluiting"),
        bind(uri(cc(vr("ns"), md5e(cc(vr("orid"), str("-facturatie"))))),
          "contact_facturatie"),
        Opt(Group(
          customFieldDef("cf_email_onts", "cf_email_onts_id", "E-mail Ontsluiting") ++
          customFieldBranch("o", v("email_ontsluiting"), "cf_email_onts_id", "eo"))),
        Opt(Group(
          customFieldDef("cf_tel_onts", "cf_tel_onts_id", "Telefoon Ontsluiting") ++
          customFieldBranch("o", v("telnumber_ontsluiting"), "cf_tel_onts_id", "to"))),
        Opt(Group(
          customFieldDef("cf_email_fact", "cf_email_fact_id", "E-mail Facturatie") ++
          customFieldBranch("o", v("email_facturatie"), "cf_email_fact_id", "ef"))),
        Opt(Group(
          customFieldDef("cf_form", "cf_form_id", "CP - Link aanvraagformulier") ++
          customFieldBranch("o", v("aanvraagformulier"), "cf_form_id", "form"))))),
    template = Seq(
      TriplePattern(v("org"), i(schemaNs + "contactPoint"), v("contact")),
      TriplePattern(v("org"), i(schemaNs + "contactPoint"), v("contact_ontsluiting")),
      TriplePattern(v("org"), i(schemaNs + "contactPoint"), v("contact_facturatie")),
      TriplePattern(v("org"), i(meemoo + "requestForm"), v("aanvraagformulier")),
      TriplePattern(v("contact"), i(rdfType), i(schemaNs + "ContactPoint")),
      TriplePattern(v("contact"), i(schemaNs + "contactType"), v("etype")),
      TriplePattern(v("contact"), i(schemaNs + "email"), v("email")),
      TriplePattern(v("contact"), i(schemaNs + "telephone"), v("telnumber")),
      TriplePattern(v("contact_ontsluiting"), i(rdfType), i(schemaNs + "ContactPoint")),
      TriplePattern(v("contact_ontsluiting"), i(schemaNs + "contactType"), l("ontsluiting")),
      TriplePattern(v("contact_ontsluiting"), i(schemaNs + "email"), v("email_ontsluiting")),
      TriplePattern(v("contact_ontsluiting"), i(schemaNs + "telephone"),
        v("telnumber_ontsluiting")),
      TriplePattern(v("contact_facturatie"), i(rdfType), i(schemaNs + "ContactPoint")),
      TriplePattern(v("contact_facturatie"), i(schemaNs + "contactType"), l("facturatie")),
      TriplePattern(v("contact_facturatie"), i(schemaNs + "email"), v("email_facturatie"))))

  // ------------------------------------------------------------------
  // tl_companies_mapping_cp.sparql (m7) — two bnode branches on one ?o
  val tlCompaniesCp: MappingQuery = MappingQuery(
    name = "tl_companies_mapping_cp",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gTlCompanies, gTlCustomFields),
    where = Group(
      customFieldDef("cf_orid", "cf_orid_id", "5.1 - OR-ID") ++
      customFieldDef("cf_status", "cf_status_id", "2.2 - CP status") ++
      customFieldBranch("o", v("orid"), "cf_orid_id", "orid") ++
      customFieldBranch("o", l("ja"), "cf_status_id", "status") :+
      orgFromOrid),
    template = Seq(TriplePattern(v("org"), i(rdfType), i(meemoo + "ContentPartner"))))

  // ------------------------------------------------------------------
  // tl_companies_mapping_classification.sparql (m8) — string surgery
  val tlCompaniesClassification: MappingQuery = MappingQuery(
    name = "tl_companies_mapping_classification",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gTlCompanies, gTlCustomFields),
    where = Group(
      customFieldBranch("o", v("orid"), "cf_orid_id", "orid") ++
      customFieldDef("cf_orid", "cf_orid_id", "5.1 - OR-ID") :+
      Opt(Group(
        customFieldBranch("o", v("class_field"), "cf_class_id", "class") ++
        customFieldDef("cf_class", "cf_class_id", "1.1 - Type organisatie") :+
        bind(uri(cc(str("https://data.hetarchief.be/id/organization-type/"),
          LcaseE(ReplaceE(StrAfterE(vr("class_field"), " - "), " ", "_")))),
          "class"))) :+
      orgFromOrid),
    template = Seq(TriplePattern(v("org"), i(orgNs + "classification"), v("class"))))

  // ------------------------------------------------------------------
  // tl_companies_mapping_overlay.sparql (m10) — boolean feature flags
  val tlCompaniesOverlay: MappingQuery = MappingQuery(
    name = "tl_companies_mapping_overlay",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gTlCompanies, gTlCustomFields),
    where = Group(
      customFieldDef("cf_orid", "cf_orid_id", "5.1 - OR-ID") ++
      customFieldDef("cf_overlay", "cf_overlay_id", "4.2 - Watermerk") ++
      customFieldDef("cf_bzt", "cf_bzt_id", "4.1 - Bezoekertool") ++
      customFieldBranch("o", v("orid"), "cf_orid_id", "orid") ++
      customFieldBranch("o", v("overlay"), "cf_overlay_id", "overlay") ++
      customFieldBranch("o", v("bzt"), "cf_bzt_id", "bzt") ++
      Seq(
        // IF(BOUND(...)) is vacuous here (the branches are required) but
        // transcribed as written — `tl_companies_mapping_overlay.sparql:48-49`
        bind(IfE(BoundE("overlay"), vr("overlay"),
          TypedLit("false", xsdNs + "boolean")), "overlay_value"),
        bind(IfE(BoundE("bzt"), vr("bzt"),
          TypedLit("false", xsdNs + "boolean")), "bzt_value"),
        orgFromOrid)),
    template = Seq(
      TriplePattern(v("org"), i(meemoo + "allowsOverlay"), v("overlay_value")),
      TriplePattern(v("org"), i(meemoo + "allowsBZT"), v("bzt_value"))))

  // ------------------------------------------------------------------
  // tl_users_mapping.sparql (m2)
  val tlUsers: MappingQuery = MappingQuery(
    name = "tl_users_mapping",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gTlUsers),
    where = Group(Seq(
      bindNs,
      pat(v("ru"), source + "id", v("amid")),
      pat(v("ru"), source + "first_name", v("fn")),
      pat(v("ru"), source + "last_name", v("ln")),
      pat(v("ru"), source + "email", v("email")),
      opt(
        pat(v("ru"), source + "telephones", v("tel")),
        pat(v("tel"), source + "type", v("tel_type")),
        pat(v("tel"), source + "number", v("tel_nr"))),
      opt(pat(v("ru"), source + "function", v("function"))),
      bind(StrLangE(vr("function"), "nl"), "function_label"),
      bind(uri(cc(vr("ns"), md5e(cc(vr("amid"), vr("function"))))), "post"),
      bind(uri(cc(str("https://data.hetarchief.be/id/organization-role/"),
        EncodeForUriE(vr("function")))), "role"),
      bind(uri(cc(vr("ns"), md5e(vr("amid")))), "am"),
      bind(cc(str("mailto:"), vr("email")), "mbox"))), // plain literal, as-is quirk
    template = Seq(
      TriplePattern(v("am"), i(rdfType), i(schemaNs + "Person")),
      TriplePattern(v("am"), i(rdfType), i(foaf + "Agent")),
      TriplePattern(v("am"), i(schemaNs + "givenName"), v("fn")),
      TriplePattern(v("am"), i(schemaNs + "familyName"), v("ln")),
      TriplePattern(v("am"), i(schemaNs + "email"), v("mbox")),
      TriplePattern(v("am"), i(schemaNs + "telephone"), v("tel_nr")),
      TriplePattern(v("am"), i(orgNs + "holds"), v("post")),
      TriplePattern(v("post"), i(rdfType), i(orgNs + "Post")),
      TriplePattern(v("post"), i(orgNs + "postIn"), i(idNs + "OR-w66976m")),
      TriplePattern(v("post"), i(orgNs + "role"), v("role")),
      TriplePattern(v("role"), i(rdfType), i(orgNs + "Role")),
      TriplePattern(v("role"), i(skos + "prefLabel"), v("function_label"))))

  // ------------------------------------------------------------------
  // map_mam_tenants.sparql (mt) — the minimal end-to-end slice
  val mamTenants: MappingQuery = MappingQuery(
    name = "map_mam_tenants",
    targetGraph = gOrganizations,
    usingGraphs = Seq(gMamTenants),
    where = Group(Seq(
      pat(v("x"), source + "Name", v("Name")),
      pat(v("x"), source + "ExternalId", v("ExternalId")),
      bind(uri(cc(str(idNs), vr("ExternalId"))), "org"))),
    template = Seq(TriplePattern(v("org"), i(mh + "label"), v("Name"))))

  // ------------------------------------------------------------------
  // inline logo overlays (ml, tl_ml — `load_knowledge_graph.py:547-618`)
  def tlCompaniesLogo(assetsNs: String = "https://assets.viaa.be/images/"): MappingQuery =
    MappingQuery(
      name = "tl_companies_logo",
      targetGraph = gOrganizations,
      usingGraphs = Seq(gTlCompanies, gTlCustomFields),
      where = Group(
        customFieldDef("cf_orid", "cf_orid_id", "5.1 - OR-ID") ++
        customFieldBranch("o", v("orid"), "cf_orid_id", "orid") ++
        Seq(orgFromOrid,
          bind(uri(cc(str(assetsNs), vr("orid"))), "logo"))),
      template = Seq(
        TriplePattern(v("org"), i(rdfType), i(orgNs + "Organization")),
        TriplePattern(v("org"), i(schemaNs + "logo"), v("logo"))))

  def ldapLogo(assetsNs: String = "https://assets.viaa.be/images/"): MappingQuery =
    MappingQuery(
      name = "ldap_logo",
      targetGraph = gOrganizations,
      usingGraphs = Seq(gLdap),
      where = Group(Seq(
        pat(v("o"), source + "objectClass", l("organization")),
        pat(v("o"), source + "o", v("orid")),
        orgFromOrid,
        bind(uri(cc(str(assetsNs), vr("orid"))), "logo"))),
      template = Seq(
        TriplePattern(v("org"), i(rdfType), i(orgNs + "Organization")),
        TriplePattern(v("org"), i(schemaNs + "logo"), v("logo"))))

  /** All mapping tasks in DAG order (m1..m13, mt, ml, tl_ml). */
  def all: Seq[MappingQuery] = Seq(
    ldapOrg, tlUsers, tlCompaniesOrg, ldapSchool, ldapEduOrg,
    tlCompaniesContactPoint, tlCompaniesCp, tlCompaniesClassification,
    ldapCp, tlCompaniesOverlay, ldapUnit, ldapSp, ldapSc, mamTenants,
    tlCompaniesLogo(), ldapLogo())
}
