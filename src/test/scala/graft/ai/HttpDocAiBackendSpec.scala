package graft.ai

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Hermetic e2e for the real-model HTTP backend: an in-process JDK
  * HttpServer speaks the wire protocol by DELEGATING to the
  * deterministic local backend, so the HTTP path must reproduce the
  * local backend's answers byte-for-byte — protocol, escaping and
  * envelope handling are what's under test, with zero egress.
  * Also pins the retry semantics: 5xx retries then succeeds, 4xx
  * fails fast (exactly one request).
  */
class HttpDocAiBackendSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Start a protocol server delegating to DeterministicLocalBackend;
    * returns (baseUrl, hit-counter, stop). `failFirst` makes every
    * endpoint 500 on its first hit (retry-path exercise).
    */
  private def startServer(failFirst: Boolean = false): (String, AtomicInteger, () => Unit) = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val d = DeterministicLocalBackend
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    def handle(path: String)(f: Array[Byte] => String): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val n = hits.incrementAndGet()
        val body = ex.getRequestBody.readAllBytes()
        if (failFirst && n == 1) reply(ex, 503, "warming up")
        else reply(ex, 200, f(body))
      })
    def json(b: Array[Byte]) = mapper.readTree(new String(b, StandardCharsets.UTF_8))
    handle("/extract") { b =>
      val j = json(b)
      import scala.jdk.CollectionConverters._
      val prompts = j.path("prompts").fieldNames().asScala
        .map(f => f -> j.path("prompts").path(f).asText()).toMap
      val out = mapper.createObjectNode()
      val resp = out.putObject("response")
      d.answerAll(j.path("text").asText(), prompts)
        .foreach { case (f, a) => resp.put(f, a) }
      mapper.writeValueAsString(out)
    }
    handle("/classify") { b =>
      val out = mapper.createObjectNode()
      out.putObject("response")
        .put("document_class", d.classify(json(b).path("text").asText()))
      mapper.writeValueAsString(out)
    }
    handle("/parse") { b =>
      val out = mapper.createObjectNode()
      out.put("content", d.parse(b))
      mapper.writeValueAsString(out)
    }
    handle("/complete") { b =>
      val j = json(b)
      val out = mapper.createObjectNode()
      out.put("completion", d.complete(j.path("model").asText(), j.path("prompt").asText()))
      mapper.writeValueAsString(out)
    }
    server.createContext("/badrequest", (ex: HttpExchange) => {
      hits.incrementAndGet()
      ex.getRequestBody.readAllBytes()
      reply(ex, 400, """{"error":"bad request"}""")
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}", hits,
      () => server.stop(0))
  }

  // text with every escape hazard: quotes, backslash, newline, tab,
  // non-ASCII — the round trip must survive JSON both ways
  private val text = "The \"total\" is $1,234.56.\nVendor: ACME \\ Co.\tInvoice date is 2026-01-15. Ünïcödé too."
  private val prompts = Map(
    "total" -> "What is the total amount?",
    "vendor" -> "Who is the vendor or supplier?",
    "date" -> "What is the invoice date?")

  test("HTTP backend reproduces the local backend through the wire protocol") {
    val (url, _, stop) = startServer()
    try {
      val http = new HttpDocAiBackend(url, attempts = 1)
      val d = DeterministicLocalBackend
      assert(http.answerAll(text, prompts) == d.answerAll(text, prompts))
      assert(http.answer(text, "Who is the vendor?") ==
        d.answer(text, "Who is the vendor?"))
      assert(http.classify(text) == d.classify(text))
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      assert(http.parse(bytes) == d.parse(bytes))
      assert(http.complete("mistral-7b", text) == d.complete("mistral-7b", text))
      assert(http.complete("m", "Generate a JSON object of field: question pairs for class 'invoice'") ==
        d.complete("m", "Generate a JSON object of field: question pairs for class 'invoice'"))
    } finally stop()
  }

  test("5xx retries (AI4) and then succeeds; 4xx fails FAST with one request") {
    val (url, hits, stop) = startServer(failFirst = true)
    try {
      val http = new HttpDocAiBackend(url, attempts = 3, retryDelayMs = 10)
      // first hit 503s, retry succeeds with the same answer
      assert(http.classify(text) == DeterministicLocalBackend.classify(text))
      assert(hits.get() == 2, s"expected 1 failure + 1 retry, got ${hits.get()}")
      // 4xx: exactly ONE request despite attempts = 3
      hits.set(0)
      val e = intercept[HttpDocAiBackend.HttpStatusError] {
        new HttpDocAiBackend(s"$url/badrequest", attempts = 3, retryDelayMs = 10)
          .classify(text)
      }
      assert(e.code == 400, e.getMessage)
      assert(hits.get() == 1, s"4xx must not retry: ${hits.get()} requests")
    } finally stop()
  }

  test("transport errors exhaust attempts then surface (error-as-row upstream)") {
    // nothing listens here — connection refused on every attempt
    val http = new HttpDocAiBackend("http://127.0.0.1:1", attempts = 2, retryDelayMs = 10)
    intercept[Exception](http.classify(text))
  }
}
