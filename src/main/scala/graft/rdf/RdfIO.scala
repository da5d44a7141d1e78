package graft.rdf

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Quad

/** One-call format dispatch over the full reader/writer matrix — the
  * engine-level mirror of rdflib's `Graph().parse(file)` /
  * `serialize(format=...)` convenience (the reference leans on the
  * former for every ingest, `sparql_update.py:124-133`).
  *
  * Formats by extension: `.nt` (N-Triples), `.nq` (N-Quads), `.ttl` /
  * `.n3` (Turtle), `.trig` (TriG), `.rdf` / `.xml` / `.owl` (RDF/XML),
  * `.jsonld` / `.json-ld` (JSON-LD), `.hext` (HexTuples NDJSON),
  * `.trix` (TriX).
  * Quad-scoped formats (N-Quads, TriG, JSON-LD, HexTuples, TriX) carry
  * each statement's graph; triple-scoped ones read into `defaultGraph`
  * and drop the graph column on write.
  * Unknown extensions fail loudly — silent misparses are worse.
  */
object RdfIO {

  private def ext(path: String): String =
    path.substring(path.lastIndexOf('.') + 1).toLowerCase

  def read(spark: SparkSession, path: String,
      defaultGraph: String = Quad.DefaultGraph): Dataset[Quad] = ext(path) match {
    case "nt" => NTriples.read(spark, path, defaultGraph)
    case "nq" => NTriples.readQuads(spark, path, defaultGraph)
    case "ttl" | "n3" => Turtle.read(spark, path, defaultGraph)
    case "trig" => Turtle.readTrig(spark, path, defaultGraph)
    case "rdf" | "xml" | "owl" => RdfXml.read(spark, path, defaultGraph)
    case "jsonld" | "json-ld" => JsonLd.read(spark, path, defaultGraph)
    case "hext" => HexTuples.read(spark, path, defaultGraph)
    case "trix" => TriX.read(spark, path, defaultGraph)
    case other => throw new IllegalArgumentException(
      s"unknown RDF extension '.$other' for $path")
  }

  def write(quads: DataFrame, path: String): Unit = ext(path) match {
    case "nt" => NTriples.write(quads, path)
    case "nq" => NTriples.writeQuads(quads, path)
    case "ttl" | "n3" => Turtle.write(quads, path)
    case "trig" => Turtle.writeTrig(quads, path)
    case "rdf" | "xml" | "owl" => RdfXml.write(quads, path)
    case "jsonld" | "json-ld" => JsonLd.write(quads, path)
    case "hext" => HexTuples.write(quads, path)
    case "trix" => TriX.write(quads, path)
    case other => throw new IllegalArgumentException(
      s"unknown RDF extension '.$other' for $path")
  }
}
