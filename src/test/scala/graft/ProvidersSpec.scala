package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.embed._
import graft.persist.Json

/**
 * Provider wire-contract tests against a local mock server — mirrors
 * reference embed_openai_test.go:23-87 and embed_ollama_test.go:16-77
 * (assert URL path, method, auth header, request body; canned response).
 */
class ProvidersSpec extends AnyFunSuite {

  private val stub = "[-0.40824828, 0.40824828, 0.81649655]"

  private def withServer(
      expectPath: String,
      checks: HttpExchange => Unit,
      response: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var failure: Option[Throwable] = None
    server.createContext("/", (ex: HttpExchange) => {
      try {
        assert(ex.getRequestMethod === "POST")
        assert(ex.getRequestURI.getPath === expectPath)
        checks(ex)
      } catch { case t: Throwable => failure = Some(t) }
      val bytes = response.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      f(s"http://localhost:${server.getAddress.getPort}")
      failure.foreach(throw _)
    } finally server.stop(0)
  }

  private def body(ex: HttpExchange): Map[String, Any] =
    Json.parse(new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)).asInstanceOf[Map[String, Any]]

  test("OpenAI-compat: path, bearer auth, body, parse (embed_openai_test.go)") {
    withServer("/v1/embeddings",
      ex => {
        assert(ex.getRequestHeaders.getFirst("Authorization") === "Bearer secret")
        val b = body(ex)
        assert(b("input") === "hello world" && b("model") === "model-small")
      },
      s"""{"data": [{"embedding": $stub}]}""") { base =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "secret", "model-small")
      val v = f.embed("hello world")
      assert(v.toSeq === Seq(-0.40824828f, 0.40824828f, 0.81649655f))
    }
  }

  test("Ollama: /api/embed, body {model, input}, embeddings[0] (embed_ollama_test.go)") {
    withServer("/api/embed",
      ex => {
        val b = body(ex)
        assert(b("model") === "model-small" && b("input") === "hello world")
      },
      s"""{"embeddings": [$stub]}""") { base =>
      val f = new OllamaEmbeddingFunc("model-small", s"$base/api")
      assert(f.embed("hello world").toSeq ===
        Seq(-0.40824828f, 0.40824828f, 0.81649655f))
    }
  }

  test("Cohere: prefix stripped into input_type; bearer auth") {
    withServer("/v1/embed",
      ex => {
        assert(ex.getRequestHeaders.getFirst("Authorization") === "Bearer ckey")
        val b = body(ex)
        assert(b("input_type") === "search_document")
        assert(b("texts").asInstanceOf[List[Any]] === List("hello world"))
      },
      s"""{"embeddings": [$stub]}""") { base =>
      val f = new CohereEmbeddingFunc("ckey", "embed-english-v3.0", s"$base/v1")
      assert(f.embed(CohereEmbeddingFunc.SearchDocumentPrefix + "hello world")
        .length === 3)
    }
  }

  test("Cohere: missing input-type prefix rejected") {
    val f = new CohereEmbeddingFunc("k")
    val e = intercept[IllegalArgumentException](f.embed("no prefix here"))
    assert(e.getMessage === "text must start with a valid input type plus colon and space")
  }

  test("Vertex: predict URL, instances/content body, predictions parse") {
    withServer("/v1/projects/proj1/locations/us-central1/publishers/google/models/m1:predict",
      ex => {
        val b = body(ex)
        val inst = b("instances").asInstanceOf[List[Any]].head.asInstanceOf[Map[String, Any]]
        assert(inst("content") === "hello world")
      },
      s"""{"predictions": [{"embeddings": {"values": $stub}}]}""") { base =>
      val f = new VertexEmbeddingFunc("vkey", "proj1", "m1", s"$base/v1")
      assert(f.embed("hello world").length === 3)
    }
  }

  test("non-normalized response is normalized once-checked (embed_openai.go:148-158)") {
    withServer("/v1/embeddings", _ => (),
      """{"data": [{"embedding": [3.0, 4.0, 0.0]}]}""") { base =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m")
      val v = f.embed("x")
      assert(math.abs(graft.functions.VectorFunctions.norm(v) - 1.0) < 1e-6)
      assert(math.abs(v(0) - 0.6f) < 1e-6)
    }
  }

  test("OpenAI-compat batch: ONE request per batch, array input, index-ordered parse") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/v1/embeddings",
      ex => {
        counter.incrementAndGet()
        val b = body(ex)
        assert(b("input").asInstanceOf[List[Any]] === List("t0", "t1", "t2"))
      },
      // deliberately out of order: parse must sort by index
      """{"data": [
        |  {"index": 2, "embedding": [0.0, 0.0, 1.0]},
        |  {"index": 0, "embedding": [1.0, 0.0, 0.0]},
        |  {"index": 1, "embedding": [0.0, 1.0, 0.0]}]}""".stripMargin) { base =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m", Some(true))
      val vs = f.embedBatch(Iterator("t0", "t1", "t2")).toSeq
      assert(counter.get() === 1, "batch must be ONE http request")
      assert(vs.map(_.toSeq) === Seq(
        Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(0f, 0f, 1f)))
    }
  }

  test("Ollama batch: ONE request, array input, order preserved") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/api/embed",
      ex => {
        counter.incrementAndGet()
        val b = body(ex)
        assert(b("input").asInstanceOf[List[Any]] === List("a", "b"))
      },
      """{"embeddings": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]}""") { base =>
      val f = new OllamaEmbeddingFunc("m", s"$base/api")
      val vs = f.embedBatch(Iterator("a", "b")).toSeq
      assert(counter.get() === 1)
      assert(vs.map(_.toSeq) === Seq(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)))
    }
  }

  test("batch count mismatch is a clear error") {
    withServer("/v1/embeddings", _ => (),
      """{"data": [{"index": 0, "embedding": [1.0, 0.0, 0.0]}]}""") { base =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m", Some(true))
      val e = intercept[RuntimeException](f.embedBatch(Iterator("a", "b")).toSeq)
      assert(e.getMessage.contains("returned 1 embeddings for 2 inputs"))
    }
  }

  test("providers without array support fall back to per-text requests (Cohere)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/v1/embed",
      _ => counter.incrementAndGet(),
      s"""{"embeddings": [$stub]}""") { base =>
      val f = new CohereEmbeddingFunc("k", "m", s"$base/v1")
      val vs = f.embedBatch(Iterator(
        CohereEmbeddingFunc.SearchQueryPrefix + "a",
        CohereEmbeddingFunc.SearchQueryPrefix + "b")).toSeq
      assert(vs.length === 2 && counter.get() === 2)
    }
  }

  test("error status surfaces as API error") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    try {
      val f = new OpenAICompatEmbeddingFunc(
        s"http://localhost:${server.getAddress.getPort}/v1", "k", "m")
      val e = intercept[RuntimeException](f.embed("x"))
      assert(e.getMessage.contains("error response from the embedding API"))
    } finally server.stop(0)
  }

  /** Sequenced-status server for the retry tests: response n gets
    * statuses(min(n, last)); 200s carry the stub embedding. */
  private def withSequencedServer(statuses: Seq[Int])(
      f: (String, () => Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/", (ex: HttpExchange) => {
      val n = calls.getAndIncrement()
      val code = statuses(math.min(n, statuses.length - 1))
      if (code == 200) {
        val bytes = s"""{"data": [{"embedding": $stub}]}"""
          .getBytes(StandardCharsets.UTF_8)
        // a retried request must be honored with a Retry-After so the
        // test never sleeps the default backoff — keep the suite fast
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
      } else {
        ex.getResponseHeaders.set("Retry-After", "0")
        ex.sendResponseHeaders(code, -1)
      }
      ex.close()
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}",
      () => calls.get())
    finally server.stop(0)
  }

  test("opt-in retry absorbs a 429-then-200 sequence (r14 hardening)") {
    withSequencedServer(Seq(429, 200)) { (base, calls) =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m") {
        override protected def maxRetries: Int = 3
      }
      val v = f.embed("x")
      assert(v.length === 3)
      assert(calls() === 2, "exactly one retry after the 429")
    }
  }

  test("retry budget exhausts: persistent 429 still surfaces as API error") {
    withSequencedServer(Seq(429)) { (base, calls) =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m") {
        override protected def maxRetries: Int = 2
      }
      val e = intercept[RuntimeException](f.embed("x"))
      assert(e.getMessage.contains("429"))
      assert(calls() === 3, "initial attempt + 2 retries")
    }
  }

  test("default budget is zero (reference parity) and 4xx never retries") {
    withSequencedServer(Seq(429, 200)) { (base, calls) =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m")
      intercept[RuntimeException](f.embed("x"))
      assert(calls() === 1, "no retry without opting in")
    }
    withSequencedServer(Seq(400, 200)) { (base, calls) =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m") {
        override protected def maxRetries: Int = 3
      }
      intercept[RuntimeException](f.embed("x"))
      assert(calls() === 1, "a non-429 4xx is permanent — never retried")
    }
  }

  test("batch path shares the retry core: 503-then-200 on array input") {
    withSequencedServer(Seq(503, 200)) { (base, calls) =>
      val f = new OpenAICompatEmbeddingFunc(s"$base/v1", "k", "m") {
        override protected def maxRetries: Int = 1
      }
      val vs = f.embedBatch(Iterator("a")).toSeq
      assert(vs.length === 1 && vs.head.length === 3)
      assert(calls() === 2)
    }
  }
}
