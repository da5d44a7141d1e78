package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.HttpSync

class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expressions are callable from SQL text after registration") {
    org.apache.spark.sql.GraftShim.registerFunctions(spark)
    val r1 = spark.sql("SELECT encode_for_uri('Les fonds: 100%') AS e")
      .head().getString(0)
    assert(r1 == "Les%20fonds%3A%20100%25")
    val r2 = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r2 == 32.0)
  }

  test("GraftSparkExtensions injects the functions at session build time") {
    import org.apache.spark.sql.SparkSession
    val prior = spark // force TestSpark init so the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, NEW session. `spark.sql.extensions` is a
      // STATIC conf — it only applies when the SparkContext itself is
      // created (spark-submit), so the test drives the SAME class
      // through the builder's programmatic extensions hook instead.
      val s2 = SparkSession.builder()
        .withExtensions(new graft.sparql.GraftSparkExtensions()(_))
        .getOrCreate()
      assert(s2 ne prior)
      val r = s2.sql("""SELECT encode_for_uri('a b') AS e,
                        vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""")
        .head()
      assert(r.getString(0) == "a%20b")
      assert(r.getDouble(1) == 11.0)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("encode_for_uri matches SPARQL 1.1 spec examples") {
    import graft.sparql.SparqlRuntime.encodeForUri
    assert(encodeForUri("Los Angeles") == "Los%20Angeles")
    assert(encodeForUri("~bob") == "~bob")           // unreserved kept
    assert(encodeForUri("100% organic") == "100%25%20organic")
    assert(encodeForUri("a+b") == "a%2Bb")           // differs from URLEncoder
    assert(encodeForUri("été") == "%C3%A9t%C3%A9")   // UTF-8 bytes
  }
}

class HttpSyncSpec extends AnyFunSuite {

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try { server.start(); f(server, server.getAddress.getPort) }
    finally server.stop(0)
  }

  test("trigger POSTs and pollUntil waits for job_running=false") {
    withServer { (server, port) =>
      @volatile var triggered = false
      @volatile var polls = 0
      server.createContext("/sync", (ex: HttpExchange) => {
        triggered = ex.getRequestMethod == "POST"
        ex.sendResponseHeaders(200, 0); ex.close()
      })
      server.createContext("/status", (ex: HttpExchange) => {
        polls += 1
        val body =
          if (polls >= 3) """{"job_running": false}"""
          else """{"job_running": true}"""
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      })
      val sync = new HttpSync()
      assert(sync.trigger(s"http://127.0.0.1:$port/sync",
        """{"full_sync": true}""") == 200)
      assert(triggered)
      assert(sync.pollUntil(s"http://127.0.0.1:$port/status",
        sync.jobNotRunning, pokeIntervalMs = 10, maxPolls = 10))
      assert(polls >= 3)
    }
  }

  test("pollUntil gives up after maxPolls") {
    withServer { (server, port) =>
      server.createContext("/status", (ex: HttpExchange) => {
        val bytes = """{"job_running": true}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      })
      val sync = new HttpSync()
      assert(!sync.pollUntil(s"http://127.0.0.1:$port/status",
        sync.jobNotRunning, pokeIntervalMs = 5, maxPolls = 3))
    }
  }
}
