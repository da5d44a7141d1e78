package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Quad

/** SERVICE against a LIVE local SPARQL endpoint (SPARQL 1.1 Federated
  * Query + Protocol): an unregistered http(s) IRI degrades to a real
  * results-JSON fetch instead of an error, evaluated with the same
  * local-join plan as a registered dataset. The reference's own remote
  * store is exactly such an endpoint (`sparql_update.py:77-106`).
  */
class HttpServiceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ex = "http://ex/"

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try { server.start(); f(server, server.getAddress.getPort) }
    finally server.stop(0)
  }

  private def freshEngine(): GraphEngine = {
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-httpsvc-${System.nanoTime()}"
    graft.util.TempDirs.deleteOnExit(dir)
    val store = new graft.model.GraphStore(spark, dir)
    store.append(Seq(
      Quad.lit("http://g/main", ex + "x", ex + "type", "view"),
      Quad.lit("http://g/main", ex + "y", ex + "type", "error")).toDF())
    new GraphEngine(store)
  }

  private val resultsJson =
    """{"head": {"vars": ["g", "s", "p", "o"]},
      | "results": {"bindings": [
      |  {"s": {"type": "uri", "value": "urn:m1"},
      |   "p": {"type": "uri", "value": "http://ex/etype"},
      |   "o": {"type": "literal", "value": "view"}},
      |  {"s": {"type": "uri", "value": "urn:m1"},
      |   "p": {"type": "uri", "value": "http://ex/stage"},
      |   "o": {"type": "literal", "value": "browse"}},
      |  {"s": {"type": "bnode", "value": "b0"},
      |   "p": {"type": "uri", "value": "http://ex/size"},
      |   "o": {"type": "literal", "value": "10",
      |         "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
      |  {"s": {"type": "uri", "value": "urn:m2"},
      |   "p": {"type": "uri", "value": "http://ex/label"},
      |   "o": {"type": "literal", "value": "hoi", "xml:lang": "nl"}},
      |  {"g": {"type": "uri", "value": "http://g/other"},
      |   "s": {"type": "uri", "value": "urn:named"},
      |   "p": {"type": "uri", "value": "http://ex/etype"},
      |   "o": {"type": "literal", "value": "hidden"}}
      | ]}}""".stripMargin

  test("SERVICE <http://…> falls back to a live endpoint fetch and joins") {
    withServer { (server, port) =>
      @volatile var posted: String = null
      @volatile var accept: String = null
      server.createContext("/sparql", (exch: HttpExchange) => {
        posted = new String(exch.getRequestBody.readAllBytes(), "UTF-8")
        accept = exch.getRequestHeaders.getFirst("Accept")
        val bytes = resultsJson.getBytes("UTF-8")
        exch.getResponseHeaders.set(
          "Content-Type", "application/sparql-results+json")
        exch.sendResponseHeaders(200, bytes.length)
        exch.getResponseBody.write(bytes); exch.close()
      })
      val engine = freshEngine()
      val got = engine.select(s"""
        SELECT ?s ?stage FROM <http://g/main>
        WHERE { ?s <${ex}type> ?t .
                SERVICE <http://127.0.0.1:$port/sparql> {
                  ?m <${ex}etype> ?t ; <${ex}stage> ?stage } }""").collect()
      assert(got.length == 1)
      assert(got.head.getString(0) == ex + "x")
      assert(got.head.getString(1) == "browse")
      // protocol shape: form-encoded POST, results-JSON accept
      assert(posted != null && posted.startsWith("query="))
      assert(accept == "application/sparql-results+json")
      // engine convention (same as the registry path): the WHOLE
      // fetched dataset is the service's data — named-graph rows
      // participate in plain inner patterns, with provenance kept in
      // the graph column
      val named = engine.select(s"""
        SELECT ?m WHERE {
          SERVICE <http://127.0.0.1:$port/sparql> {
            ?m <${ex}etype> "hidden" } }""").collect()
      assert(named.length == 1 && named.head.getString(0) == "urn:named")
      // typed + lang literals and bnode subjects arrive intact
      val typed = engine.select(s"""
        SELECT ?m ?v WHERE {
          SERVICE <http://127.0.0.1:$port/sparql> {
            ?m <${ex}size> ?v } }""").collect()
      assert(typed.length == 1 && typed.head.getString(0).startsWith("_:"))
    }
  }

  test("opt-in bound join ships the BGP + VALUES; remote does the selection") {
    import java.net.URLDecoder
    withServer { (server, port) =>
      val boundJson =
        """{"head": {"vars": ["m", "stage", "t"]},
          | "results": {"bindings": [
          |  {"m": {"type": "uri", "value": "urn:m1"},
          |   "stage": {"type": "literal", "value": "browse"},
          |   "t": {"type": "literal", "value": "view"}}
          | ]}}""".stripMargin
      val queries = scala.collection.mutable.ArrayBuffer.empty[String]
      server.createContext("/sparql", (exch: HttpExchange) => {
        val posted = new String(exch.getRequestBody.readAllBytes(), "UTF-8")
        val q = URLDecoder.decode(posted.stripPrefix("query="), "UTF-8")
        queries.synchronized { queries += q; () }
        // a bound-join request is evaluated; anything else gets the
        // full-dataset document (the fetch fallback)
        val body = if (q.contains("VALUES")) boundJson else resultsJson
        val bytes = body.getBytes("UTF-8")
        exch.getResponseHeaders.set(
          "Content-Type", "application/sparql-results+json")
        exch.sendResponseHeaders(200, bytes.length)
        exch.getResponseBody.write(bytes); exch.close()
      })
      val endpoint = s"http://127.0.0.1:$port/sparql"
      graft.sparql.Services.enableBoundJoin(endpoint)
      try {
        val engine = freshEngine()
        val got = engine.select(s"""
          SELECT ?s ?stage FROM <http://g/main>
          WHERE { ?s <${ex}type> ?t .
                  SERVICE <$endpoint> {
                    ?m <${ex}etype> ?t ; <${ex}stage> ?stage } }""").collect()
        assert(got.length == 1)
        assert(got.head.getString(0) == ex + "x")
        assert(got.head.getString(1) == "browse")
        val bound = queries.synchronized(queries.toSeq)
          .filter(_.contains("VALUES"))
        assert(bound.nonEmpty, s"no bound-join request seen: $queries")
        // the shipped query is the BGP + the two distinct local ?t
        // bindings, nothing else — the endpoint's dataset never moves
        assert(bound.head.contains(s"?m <${ex}etype> ?t ."))
        assert(bound.head.contains(s"?m <${ex}stage> ?stage ."))
        assert(bound.head.contains("VALUES (?t)"))
        assert(bound.head.contains("(\"view\")") &&
          bound.head.contains("(\"error\")"))
        // a non-BGP SERVICE group falls back to the whole-dataset fetch
        queries.synchronized(queries.clear())
        val opt = engine.select(s"""
          SELECT ?s ?stage FROM <http://g/main>
          WHERE { ?s <${ex}type> ?t .
                  SERVICE <$endpoint> {
                    ?m <${ex}etype> ?t
                    OPTIONAL { ?m <${ex}stage> ?stage } } }""").collect()
        assert(opt.length == 1) // only ?t="view" matches the fetched data
        assert(queries.synchronized(queries.toSeq)
          .forall(!_.contains("VALUES")))
      } finally graft.sparql.Services.disableBoundJoin(endpoint)
    }
  }

  test("paged fetch (default): executors pull LIMIT/OFFSET pages; quads ≡ single fetch") {
    import java.net.URLDecoder
    // 7 canonical rows, page size 3 → count + 3 page requests
    val data = (1 to 7).map(i =>
      (s"urn:s$i", "http://ex/p", s"v$i"))
    def bindingJson(rows: Seq[(String, String, String)]): String = {
      val bs = rows.map { case (s, p, o) =>
        s"""{"s": {"type": "uri", "value": "$s"},
           | "p": {"type": "uri", "value": "$p"},
           | "o": {"type": "literal", "value": "$o"}}""".stripMargin
      }.mkString(",\n")
      s"""{"head": {"vars": ["g","s","p","o"]},
         | "results": {"bindings": [$bs]}}""".stripMargin
    }
    withServer { (server, port) =>
      val queries = scala.collection.mutable.ArrayBuffer.empty[String]
      server.createContext("/sparql", (exch: HttpExchange) => {
        val posted = new String(exch.getRequestBody.readAllBytes(), "UTF-8")
        val q = URLDecoder.decode(posted.stripPrefix("query="), "UTF-8")
        queries.synchronized { queries += q; () }
        val body =
          if (q.contains("COUNT("))
            s"""{"head": {"vars": ["n"]}, "results": {"bindings": [
               |  {"n": {"type": "literal", "value": "${data.length}",
               |   "datatype": "http://www.w3.org/2001/XMLSchema#integer"}}
               |]}}""".stripMargin
          else if (q.contains("OFFSET")) {
            val limit = "LIMIT (\\d+)".r.findFirstMatchIn(q).get.group(1).toInt
            val offset = "OFFSET (\\d+)".r.findFirstMatchIn(q).get.group(1).toInt
            bindingJson(data.slice(offset, offset + limit))
          } else bindingJson(data)
        val bytes = body.getBytes("UTF-8")
        exch.getResponseHeaders.set(
          "Content-Type", "application/sparql-results+json")
        exch.sendResponseHeaders(200, bytes.length)
        exch.getResponseBody.write(bytes); exch.close()
      })
      val endpoint = s"http://127.0.0.1:$port/sparql"
      val single = graft.sparql.HttpService.fetchQuads(spark, endpoint)
        .collect().map(_.toSeq).toSet
      val paged = graft.sparql.HttpService
        .fetchQuadsPaged(spark, endpoint, pageSize = 3)
        .collect().map(_.toSeq).toSet
      assert(paged == single, "paged fetch diverged from the single fetch")
      assert(paged.size == 7)
      // the pages really were LIMIT/OFFSET requests (count + 3 pages)
      val pageReqs = queries.synchronized(queries.toSeq).filter(_.contains("OFFSET"))
      assert(pageReqs.length == 3, s"expected 3 page requests: $queries")
      assert(pageReqs.forall(_.contains("ORDER BY ?g ?s ?p ?o")),
        "pages must be totally ordered for LIMIT/OFFSET to be well-defined")
      // the compiler routes an UNREGISTERED endpoint through the pager
      // BY DEFAULT (VERDICT r11 #4) — no opt-in anywhere
      queries.synchronized(queries.clear())
      val engine = freshEngine()
      val got = engine.select(s"""
        SELECT ?s WHERE {
          SERVICE <$endpoint> { ?s <http://ex/p> "v5" } }""").collect()
      assert(got.length == 1 && got.head.getString(0) == "urn:s5")
      assert(queries.synchronized(queries.toSeq).exists(_.contains("OFFSET")),
        "SERVICE full fetch did not page by default")
      // a custom page size keeps working through the registry
      graft.sparql.Services.enablePagedFetch(endpoint, pageSize = 3)
      try {
        queries.synchronized(queries.clear())
        val got3 = engine.select(s"""
          SELECT ?s WHERE {
            SERVICE <$endpoint> { ?s <http://ex/p> "v5" } }""").collect()
        assert(got3.length == 1 && got3.head.getString(0) == "urn:s5")
        val pageReqs3 = queries.synchronized(queries.toSeq)
          .filter(_.contains("OFFSET"))
        assert(pageReqs3.length == 3,
          s"custom page size 3 should yield 3 page requests: $queries")
      } finally graft.sparql.Services.resetPagedFetch(endpoint)
      // explicit OPT-OUT takes the single-document fetch (no paging)
      graft.sparql.Services.disablePagedFetch(endpoint)
      try {
        queries.synchronized(queries.clear())
        val gotS = engine.select(s"""
          SELECT ?s WHERE {
            SERVICE <$endpoint> { ?s <http://ex/p> "v5" } }""").collect()
        assert(gotS.length == 1 && gotS.head.getString(0) == "urn:s5")
        val reqs = queries.synchronized(queries.toSeq)
        assert(reqs.forall(q => !q.contains("OFFSET") && !q.contains("COUNT(")),
          s"opted-out endpoint must not page: $reqs")
      } finally graft.sparql.Services.resetPagedFetch(endpoint)
    }
  }

  test("SILENT catches a mid-page failure (count ok, pages 500)") {
    withServer { (server, port) =>
      server.createContext("/sparql", (exch: HttpExchange) => {
        val posted = new String(exch.getRequestBody.readAllBytes(), "UTF-8")
        val q = java.net.URLDecoder.decode(posted.stripPrefix("query="), "UTF-8")
        if (q.contains("COUNT(")) {
          val body =
            """{"head": {"vars": ["n"]}, "results": {"bindings": [
              |  {"n": {"type": "literal", "value": "6",
              |   "datatype": "http://www.w3.org/2001/XMLSchema#integer"}}
              |]}}""".stripMargin.getBytes("UTF-8")
          exch.getResponseHeaders.set(
            "Content-Type", "application/sparql-results+json")
          exch.sendResponseHeaders(200, body.length)
          exch.getResponseBody.write(body); exch.close()
        } else { // every page request fails
          exch.sendResponseHeaders(500, -1); exch.close()
        }
      })
      val endpoint = s"http://127.0.0.1:$port/sparql"
      val engine = freshEngine()
      // pages are fetched EAGERLY (localCheckpoint inside fetchQuadsPaged),
      // so the executor-side page failure lands inside the compiler's
      // Try and SILENT degrades to the unit table (ADVICE r11)
      val silent = engine.select(s"""
        SELECT ?s FROM <http://g/main>
        WHERE { ?s <${ex}type> ?t .
                SERVICE SILENT <$endpoint> { ?m <${ex}etype> ?t } }""")
        .collect()
      assert(silent.length == 2)
      // non-SILENT: loud, with the pagination diagnosis
      val e = intercept[Exception] {
        engine.select(s"""
          SELECT ?s WHERE {
            SERVICE <$endpoint> { ?s <${ex}p> ?o } }""").collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("paged fetch failed")),
        s"expected the paged-fetch diagnosis, got: ${messages(e)}")
    }
  }

  test("paged fetch on a dead endpoint: SILENT degrades, non-SILENT is loud") {
    val deadPort = {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val p = s.getAddress.getPort; s.stop(0); p
    }
    val endpoint = s"http://127.0.0.1:$deadPort/sparql"
    graft.sparql.Services.enablePagedFetch(endpoint, pageSize = 3)
    try {
      val engine = freshEngine()
      // the count request fails eagerly on the driver; page requests
      // fail eagerly too (localCheckpoint) — SILENT's Try catches both
      val silent = engine.select(s"""
        SELECT ?s FROM <http://g/main>
        WHERE { ?s <${ex}type> ?t .
                SERVICE SILENT <$endpoint> { ?m <${ex}etype> ?t } }""")
        .collect()
      assert(silent.length == 2)
      intercept[Exception] {
        engine.select(s"""
          SELECT ?s WHERE {
            SERVICE <$endpoint> { ?s <${ex}p> ?o } }""").collect()
      }
    } finally graft.sparql.Services.disablePagedFetch(endpoint)
  }

  test("SILENT bound join on a dead endpoint degrades to the unit table") {
    val deadPort = {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val p = s.getAddress.getPort; s.stop(0); p
    }
    val endpoint = s"http://127.0.0.1:$deadPort/sparql"
    graft.sparql.Services.enableBoundJoin(endpoint)
    try {
      val engine = freshEngine()
      val silent = engine.select(s"""
        SELECT ?s FROM <http://g/main>
        WHERE { ?s <${ex}type> ?t .
                SERVICE SILENT <$endpoint> {
                  ?m <${ex}etype> ?t } }""").collect()
      assert(silent.length == 2) // outer rows survive
      intercept[Exception] {
        engine.select(s"""
          SELECT ?s FROM <http://g/main>
          WHERE { ?s <${ex}type> ?t .
                  SERVICE <$endpoint> { ?m <${ex}etype> ?t } }""").collect()
      }
    } finally graft.sparql.Services.disableBoundJoin(endpoint)
  }

  test("SILENT swallows dead endpoints; non-SILENT HTTP errors are loud") {
    // grab a port, then stop the server: connection refused
    val deadPort = {
      val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      val p = s.getAddress.getPort; s.stop(0); p
    }
    val engine = freshEngine()
    val silent = engine.select(s"""
      SELECT ?s FROM <http://g/main>
      WHERE { ?s <${ex}type> ?t .
              SERVICE SILENT <http://127.0.0.1:$deadPort/sparql> {
                ?m <${ex}etype> ?t } }""").collect()
    assert(silent.length == 2) // unit table: outer rows survive
    intercept[Exception] {
      engine.select(s"""
        SELECT ?s WHERE {
          SERVICE <http://127.0.0.1:$deadPort/sparql> {
            ?s <${ex}p> ?o } }""").collect()
    }
    // non-http schemes keep the registry-only error message
    val e = intercept[IllegalArgumentException] {
      engine.select(
        s"SELECT ?s WHERE { SERVICE <urn:svc:nope> { ?s <${ex}p> ?o } }")
        .collect()
    }
    assert(e.getMessage.contains("unregistered SERVICE"))
  }
}
