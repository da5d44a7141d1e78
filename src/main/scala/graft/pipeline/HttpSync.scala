package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Upstream-sync orchestration helper (operator S8 — the reference's
  * HttpSensor / SimpleHttpOperator chain, `load_knowledge_graph.py:
  * 213-267`): trigger a sync service and poll until its job finishes.
  * Pure driver-side orchestration — not a query operator (SURVEY.md
  * §2.1 S8).
  */
final class HttpSync(
    client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10)).build()) {

  /** POST a JSON body (the reference posts `{"full_sync": bool}`). */
  def trigger(url: String, jsonBody: String): Int = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(jsonBody)).build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  /** Poll `url` every `pokeIntervalMs` (reference: 5 s) until
    * `check(body)` holds or `maxPolls` is exhausted.
    * @return true when the check passed */
  def pollUntil(
      url: String,
      check: String => Boolean,
      pokeIntervalMs: Long = 5000,
      maxPolls: Int = 720): Boolean = {
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    var i = 0
    while (i < maxPolls) {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200 && check(resp.body())) return true
      i += 1
      if (i < maxPolls) Thread.sleep(pokeIntervalMs)
    }
    false
  }

  /** The reference's check: response JSON has `"job_running": false`
    * (`load_knowledge_graph.py:206-208`). */
  def jobNotRunning(body: String): Boolean =
    body.replaceAll("\\s", "").contains("\"job_running\":false")
}
