package graft.queries

import org.apache.spark.sql.SparkSession

import graft.ingest.JsonFlattener
import graft.model.GraphStore
import graft.queries.ReferenceMappings._

/** Source-shaped fixture documents (FIXTURES.md) — the JSON shapes the
  * reference extracts from Postgres/file sources, used for the
  * end-to-end pipeline demo query and the golden mapping tests.
  */
object Fixtures {

  val ldapDocs: Seq[String] = Seq(
    """{
      "attributes": {
        "objectClass": ["top", "organization"],
        "o": "OR-w66976m",
        "description": "Main Org",
        "businessCategory": "Content Partner",
        "street": "Straat 1", "postalCode": "9000", "l": "Gent",
        "st": "Oost-Vlaanderen", "x-be-viaa-sector": "Cultuur"
      },
      "units": { "attributes": {
        "objectClass": "organizationalUnit",
        "ou": "OR-w66976m-unit", "description": "Unit name",
        "street": "Unitstraat 2", "postalCode": "9001", "l": "Gent"
      }}
    }""",
    """{"attributes": {"objectClass": "organization", "o": "OR-school1",
        "description": "School Org", "businessCategory": "School"}}""",
    """{"attributes": {"objectClass": "x-be-viaa-educationalOrganization",
        "o": "OR-edu1", "description": "Edu Org"}}""")

  val tlCompanyDocs: Seq[String] = Seq(
    """{
      "name": "Company BV",
      "website": "www.example.be",
      "addresses": [{"type": "primary", "address": {
        "line_1": "Straat 1", "postal_code": "9000",
        "city": "Gent", "country": "BE"}}],
      "emails": [{"type": "primary", "email": "info@example.be"}],
      "telephones": [{"type": "primary", "number": "+3291234567"},
                     {"type": "fax", "number": "+3290000001"}],
      "responsible_user": {"id": "tl-user-1"},
      "custom_fields": [
        {"value": "OR-tl1", "definition": {"id": "cf-orid"}},
        {"value": "ja", "definition": {"id": "cf-status"}},
        {"value": "Beschrijving", "definition": {"id": "cf-omsch"}},
        {"value": "1 - Type - Cultuur Instelling", "definition": {"id": "cf-class"}},
        {"value": true, "definition": {"id": "cf-overlay"}},
        {"value": false, "definition": {"id": "cf-bzt"}},
        {"value": "onts@example.be", "definition": {"id": "cf-email-onts"}},
        {"value": "+329000000", "definition": {"id": "cf-tel-onts"}},
        {"value": "fact@example.be", "definition": {"id": "cf-email-fact"}},
        {"value": "https://forms.example.be/x", "definition": {"id": "cf-form"}}
      ]
    }""")

  val customFieldDocs: Seq[String] = Seq(
    """{"id": "cf-orid", "label": "5.1 - OR-ID"}""",
    """{"id": "cf-status", "label": "2.2 - CP status"}""",
    """{"id": "cf-class", "label": "1.1 - Type organisatie"}""",
    """{"id": "cf-overlay", "label": "4.2 - Watermerk"}""",
    """{"id": "cf-bzt", "label": "4.1 - Bezoekertool"}""",
    """{"id": "cf-omsch", "label": "CP - Omschrijving (200 tek.)"}""",
    """{"id": "cf-email-onts", "label": "E-mail Ontsluiting"}""",
    """{"id": "cf-tel-onts", "label": "Telefoon Ontsluiting"}""",
    """{"id": "cf-email-fact", "label": "E-mail Facturatie"}""",
    """{"id": "cf-form", "label": "CP - Link aanvraagformulier"}""")

  val tlUserDocs: Seq[String] = Seq(
    """{"id": "u-1", "first_name": "An", "last_name": "Peeters",
       "email": "an@meemoo.be",
       "telephones": [{"type": "mobile", "number": "+32470000000"}],
       "function": "Account manager"}""",
    """{"id": "u-2", "first_name": "Jan", "last_name": "Janssens",
       "email": "jan@meemoo.be"}""")

  val mamDoc: Seq[String] = Seq(
    """[{"Name": "Tenant display name", "ExternalId": "OR-w66976m"}]""")

  /** Ingest all fixtures into a fresh store at `path`. */
  def ingestAll(spark: SparkSession, path: String): GraphStore =
    ingestAllInto(new GraphStore(spark, path)).asInstanceOf[GraphStore]

  /** Backend-agnostic fixture ingest (set-semantics append works on
    * both the merge-on-write and merge-on-read stores). */
  def ingestAllInto(st: graft.model.QuadStore): graft.model.QuadStore = {
    val spark = st.spark
    import spark.implicits._
    def ingest(docs: Seq[String], graph: String): Unit =
      st.appendDistinct(
        JsonFlattener.flatten(docs.toDF("json"), "json", graph, source).toDF(),
        Some(Seq(graph)))
    ingest(ldapDocs, gLdap)
    ingest(tlCompanyDocs, gTlCompanies)
    ingest(customFieldDocs, gTlCustomFields)
    ingest(tlUserDocs, gTlUsers)
    ingest(mamDoc, gMamTenants)
    st
  }
}
