package graft.pipeline

/** Entry point B of the reference DAG: the task texts it actually posts.
  *
  * The reference executes SPARQL UPDATE *files* plus a handful of
  * Jinja-templated inline queries (`load_knowledge_graph.py:178-195`:
  * `sparql_update` reads the file when the query names one, else posts
  * the text). This object carries exactly those texts — the 14 file
  * names the DAG references (`load_knowledge_graph.py:386-508`), loaded
  * from disk when the reference checkout is present, and the inline
  * logo/provenance templates (`load_knowledge_graph.py:510-618`) with
  * their Jinja holes (`{{params.env}}`, `{{ quote_plus(run_id) }}`,
  * `{{ list_to_nt(params.sources) }}`, `{{ ts }}`) rendered by the same
  * macro semantics (`load_knowledge_graph.py:55-56`).
  *
  * [[Pipeline.runMappingsFromTexts]] parses these texts and drives the
  * same scoped-cache/parallel-compile/single-merge machinery as the DSL
  * transcriptions in [[graft.queries.ReferenceMappings]] — the
  * VerbatimMappingSpec asserts the two paths produce identical graphs.
  */
object ReferenceTexts {

  /** Default checkout location of the reference's query files. */
  val defaultDir = "/root/reference/airflow_files/dags/sparql"

  /** The 14 query files, in DAG task order m1–m14
    * (`load_knowledge_graph.py:386-508`). */
  val mappingFiles: Seq[String] = Seq(
    "ldap_mapping_org.sparql",
    "tl_users_mapping.sparql",
    "tl_companies_mapping_org.sparql",
    "ldap_mapping_school.sparql",
    "ldap_mapping_eduorg.sparql",
    "ldap_mapping_unit.sparql",
    "ldap_mapping_cp.sparql",
    "ldap_mapping_sp.sparql",
    "ldap_mapping_sc.sparql",
    "tl_companies_mapping_cp.sparql",
    "tl_companies_mapping_contactpoint.sparql",
    "tl_companies_mapping_classification.sparql",
    "tl_companies_mapping_overlay.sparql",
    "map_mam_tenants.sparql")

  /** Read the verbatim file texts, or None when no reference checkout
    * exists (callers then fall back to the DSL transcriptions). */
  def loadMappingTexts(dir: String = defaultDir): Option[Seq[(String, String)]] = {
    val d = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(d)) None
    else Some(mappingFiles.map { f =>
      val p = d.resolve(f)
      if (!java.nio.file.Files.isReadable(p)) return None
      f -> new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    })
  }

  /** python urllib.parse.quote_plus (`load_knowledge_graph.py:55`) —
    * NOT java URLEncoder, which diverges on '*' (kept) and '~'
    * (encoded). Built on encodeForUri (same unreserved set); %20 → '+'
    * cannot touch user data because a literal '%' was already %25. */
  def quotePlus(s: String): String =
    graft.sparql.SparqlRuntime.encodeForUri(s).replace("%20", "+")

  /** `list_to_nt` macro (`load_knowledge_graph.py:56`). */
  def listToNt(iris: Seq[String]): String =
    iris.map(u => s"<$u>").mkString(", ")

  /** Inline task ml "add_logo" (`load_knowledge_graph.py:547-583`) with
    * `{{params.env}}` rendered — prd maps to assets.viaa.be. */
  def tlCompaniesLogoText(
      assetsNs: String = "https://assets.viaa.be/images/"): String = s"""
    PREFIX org:        <http://www.w3.org/ns/org#>
    PREFIX schema: <https://schema.org/>

    PREFIX graphs: <https://data.hetarchief.be/graph/>
    PREFIX source: <https://data.hetarchief.be/ns/source/>

    WITH graphs:organizations
    INSERT {
            ?org a org:Organization;
                    schema:logo ?logo.
    }
    USING graphs:tl_companies
    USING graphs:tl_custom_fields
    WHERE {
        # Organizations
        ?cf_orid source:id ?cf_orid_id; source:label "5.1 - OR-ID" .
        ?o source:custom_fields [
            source:value ?orid;
            source:definition [
                source:id ?cf_orid_id
            ]
        ] .
        BIND (URI(CONCAT('https://data.hetarchief.be/id/organization/', ?orid)) AS ?org)
        BIND (URI(CONCAT('$assetsNs', ?orid)) AS ?logo)
    }"""

  /** Inline task tl_ml "add_ldap_logo" (`load_knowledge_graph.py:586-618`). */
  def ldapLogoText(
      assetsNs: String = "https://assets.viaa.be/images/"): String = s"""
    PREFIX org:        <http://www.w3.org/ns/org#>
    PREFIX schema: <https://schema.org/>

    PREFIX graphs: <https://data.hetarchief.be/graph/>
    PREFIX source: <https://data.hetarchief.be/ns/source/>

    WITH graphs:organizations
    INSERT {
            ?org a org:Organization;
                    schema:logo ?logo.
    }
    USING graphs:ldap_organizations
    WHERE {
        # Organization
        ?o source:objectClass "organization";
            source:o ?orid.

        BIND (URI(CONCAT('https://data.hetarchief.be/id/organization/', ?orid)) AS ?org)
        BIND (URI(CONCAT('$assetsNs', ?orid)) AS ?logo)
    }"""

  /** Inline task mp "add_provenance" (`load_knowledge_graph.py:510-545`)
    * with the run-scoped Jinja holes rendered. The verbatim template
    * names the reference's own executor (etl:AirflowRun /
    * etl:ApacheAirflow); [[Pipeline.addProvenance]] honestly records
    * this engine instead (etl:SparkRun / etl:ApacheSpark) — the only
    * deliberate divergence between the two provenance paths. */
  def provenanceText(runId: String, startedAt: String,
      sources: Seq[String] = Seq(
        "https://data.hetarchief.be/graph/tl_companies",
        "https://data.hetarchief.be/graph/tl_users",
        "https://data.hetarchief.be/graph/ldap_organizations"),
      result: String = "https://data.hetarchief.be/graph/organizations",
      graph: String = "https://data.hetarchief.be/graph/provenance"): String = s"""
    PREFIX prov: <http://www.w3.org/ns/prov#>
    PREFIX xsd:  <http://www.w3.org/2001/XMLSchema#>
    PREFIX : <https://data.hetarchief.be/id/etl/>
    PREFIX etl: <https://data.hetarchief.be/ns/etl/>

    INSERT DATA
    {
        GRAPH <$graph> {
            <$result> prov:wasDerivedFrom ${listToNt(sources)};
                                prov:wasGeneratedBy :${quotePlus(runId)}.

            :${quotePlus(runId)} a prov:Activity, etl:AirflowRun;
                prov:generated <$result>;
                prov:used          etl:ApacheAirflow;
                prov:startedAtTime "$startedAt"^^xsd:dateTime.

        }
    }"""
}
