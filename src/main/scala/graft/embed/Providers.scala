package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.atomic.AtomicReference

import graft.functions.VectorFunctions
import graft.persist.Json

/**
 * HTTP embedding providers — wire-contract parity with the reference's
 * provider family (embed_openai.go, embed_ollama.go, embed_cohere.go,
 * embed_vertex.go, embed_compat.go), on java.net.http.
 *
 * Executor integration: EmbeddingFunc is Serializable; the HttpClient is
 * a JVM-wide shared singleton (companion object), so every deserialized
 * copy of a func — closure capture hands each TASK its own instance, a
 * per-instance transient would rebuild the pool per task — reuses one
 * pooled client with live keep-alive connections per executor: the
 * reference's one-client-per-func design (embed_openai.go:77) mapped to
 * Spark's process model.
 *
 * Normalized-once caching: whether the provider returns normalized
 * vectors is decided on the first response and cached (sync.Once pattern,
 * embed_openai.go:79-80,148-158). The cache is per deserialized copy, so
 * a fresh task re-decides once — one isNormalized pass over one vector,
 * not an extra HTTP call.
 */
abstract class HttpEmbeddingFunc extends EmbeddingFunc {

  private def client: HttpClient = HttpEmbeddingFunc.sharedClient

  // null = undecided, TRUE/FALSE = cached decision
  private val checkedNormalized = new AtomicReference[java.lang.Boolean](null)
  protected def normalizedHint: Option[Boolean] = None

  protected def request(text: String): HttpRequest
  protected def parseResponse(body: String): Array[Float]

  /** Providers whose wire format accepts ARRAY inputs override these two;
    * `embedBatch` then sends one request per `maxBatchSize` texts instead
    * of one per text — at ingest scale the request count is the dominant
    * embedding cost. Must return vectors in input order. */
  protected def batchRequest(texts: Seq[String]): Option[HttpRequest] = None
  protected def parseBatchResponse(body: String): Seq[Array[Float]] = Seq.empty
  protected def maxBatchSize: Int = 256

  /** Opt-in bounded retry budget for TRANSIENT failures (429 / 5xx
    * responses and IOException sends). Default 0 = reference parity —
    * chromem-go's providers fail the call on the first bad status
    * (embed_openai.go:117-121) and so does this class out of the box.
    * At ingest scale the calculus differs: one rate-limited request
    * fails its task, and Spark's task retry re-embeds the WHOLE
    * partition (hundreds of paid requests) to retry one — a
    * request-level retry absorbs the 429 where it happens. Set
    * GRAFT_EMBED_RETRIES=n (executor env) or override this def.
    * Backoff: 0.5s·2^attempt capped at 8s, or the server's
    * Retry-After seconds (capped at 30s) when present. 4xx other than
    * 429 never retries — a bad request stays bad. */
  protected def maxRetries: Int =
    sys.env.get("GRAFT_EMBED_RETRIES")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .map(n => math.max(0, n)).getOrElse(0)

  /** Send with the retry budget above. Shared by the single and batch
    * wire paths so both see identical transient-failure semantics. */
  private def send(req: HttpRequest): HttpResponse[String] = {
    val budget = maxRetries
    var attempt = 0
    while (true) {
      val resp =
        try client.send(req, HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException =>
            if (attempt >= budget) throw e
            null // connection-level transient: retry below
        }
      if (resp != null) {
        val code = resp.statusCode()
        val transient = code == 429 || code >= 500
        if (!transient || attempt >= budget) return resp
        val retryAfter = {
          val h = resp.headers().firstValue("Retry-After")
          if (h.isPresent) scala.util.Try(h.get().trim.toLong).toOption
          else None
        }
        retryAfter match {
          case Some(sec) if sec >= 0 =>
            Thread.sleep(math.min(sec, 30L) * 1000L)
          case _ =>
            Thread.sleep(math.min(500L << attempt, 8000L))
        }
      } else Thread.sleep(math.min(500L << attempt, 8000L))
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  override def embed(text: String): Array[Float] = {
    val resp = send(request(text))
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"error response from the embedding API: ${resp.statusCode()}")
    val v = parseResponse(resp.body())
    if (v.isEmpty)
      throw new RuntimeException("no embeddings found in the response")
    maybeNormalize(v)
  }

  /** One HTTP request per batch for providers with array-input support;
    * per-text fallback otherwise (reference parity, collection.go:266-271). */
  override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.grouped(maxBatchSize).flatMap { chunk =>
      batchRequest(chunk) match {
        case None => chunk.map(embed)
        case Some(req) =>
          val resp = send(req)
          if (resp.statusCode() != 200)
            throw new RuntimeException(
              s"error response from the embedding API: ${resp.statusCode()}")
          val vs = parseBatchResponse(resp.body())
          if (vs.length != chunk.length)
            throw new RuntimeException(
              s"embedding API returned ${vs.length} embeddings for ${chunk.length} inputs")
          // same empty-vector guard as embed(): an empty entry stored now
          // would crash far from the cause (length-mismatch in the dot
          // kernel) and could poison the normalized-once decision
          if (vs.exists(_.isEmpty))
            throw new RuntimeException("no embeddings found in the response")
          vs.map(maybeNormalize)
      }
    }

  private def maybeNormalize(v: Array[Float]): Array[Float] = {
    val normalized = normalizedHint.getOrElse {
      if (checkedNormalized.get() == null)
        checkedNormalized.compareAndSet(null, VectorFunctions.isNormalized(v))
      checkedNormalized.get().booleanValue()
    }
    if (normalized) v else VectorFunctions.normalize(v)
  }

  protected def post(url: String, body: String, headers: (String, String)*): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(url))
      // request timeout, not just connect: a stalled response body would
      // otherwise block the executor task forever (connectTimeout only
      // covers the TCP handshake)
      .timeout(Duration.ofSeconds(120))
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    headers.foreach { case (k, v) => b.header(k, v) }
    b.build()
  }

  protected def floats(xs: Any): Array[Float] =
    xs.asInstanceOf[List[Any]].map(_.asInstanceOf[Double].toFloat).toArray
}

object HttpEmbeddingFunc {
  /** One pooled client per JVM (see the class doc): HttpClient is
    * thread-safe, and a static singleton is the only scope that
    * survives per-task closure deserialization. */
  private lazy val sharedClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
}

/**
 * OpenAI-compatible API — reference embed_openai.go:60-161.
 * POST {baseURL}/embeddings, body {"input": text, "model": model},
 * `Authorization: Bearer <key>`; response data[0].embedding.
 */
class OpenAICompatEmbeddingFunc(
    baseURL: String,
    apiKey: String,
    model: String,
    normalized: Option[Boolean] = None,
    extraHeaders: Map[String, String] = Map.empty,
    queryParams: Map[String, String] = Map.empty) extends HttpEmbeddingFunc {

  override protected def normalizedHint: Option[Boolean] = normalized

  // shared by the single and batch wire paths — one place to change the
  // encoding or headers keeps the two paths identical
  @transient private lazy val qs: String =
    if (queryParams.isEmpty) ""
    else "?" + queryParams.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
      java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
  @transient private lazy val requestHeaders: Seq[(String, String)] = Seq(
    "Content-Type" -> "application/json",
    "Authorization" -> s"Bearer $apiKey") ++ extraHeaders.toSeq

  override protected def request(text: String): HttpRequest =
    post(s"$baseURL/embeddings$qs",
      Json.obj("input" -> Json.str(text), "model" -> Json.str(model)),
      requestHeaders: _*)

  override protected def parseResponse(body: String): Array[Float] = {
    val data = Json.parse(body).asInstanceOf[Map[String, Any]]
      .getOrElse("data", List.empty).asInstanceOf[List[Any]]
    if (data.isEmpty) Array.empty
    else floats(data.head.asInstanceOf[Map[String, Any]]("embedding"))
  }

  /** OpenAI `input` accepts an array — one request embeds the batch. */
  override protected def batchRequest(texts: Seq[String]): Option[HttpRequest] =
    Some(post(s"$baseURL/embeddings$qs",
      Json.obj("input" -> Json.arr(texts.map(Json.str)), "model" -> Json.str(model)),
      requestHeaders: _*))

  /** data[] ordered by `index` (the API may reorder entries). */
  override protected def parseBatchResponse(body: String): Seq[Array[Float]] = {
    val data = Json.parse(body).asInstanceOf[Map[String, Any]]
      .getOrElse("data", List.empty).asInstanceOf[List[Any]]
    data.map(_.asInstanceOf[Map[String, Any]])
      .sortBy(d => d.getOrElse("index", 0.0).asInstanceOf[Double])
      .map(d => floats(d("embedding")))
  }
}

object OpenAIEmbedding {
  val BaseURL = "https://api.openai.com/v1"
  val Model3Small = "text-embedding-3-small"
  val Model3Large = "text-embedding-3-large"
  val ModelAda2 = "text-embedding-ada-002"

  /** Reference NewEmbeddingFuncOpenAI: OpenAI output is normalized. */
  def apply(apiKey: String, model: String = Model3Small): OpenAICompatEmbeddingFunc =
    new OpenAICompatEmbeddingFunc(BaseURL, apiKey, model, Some(true))

  /** Azure OpenAI — api-key header + api-version query param
    * (reference embed_compat.go azure wrapper / headers+queryParams hook). */
  def azure(apiKey: String, deploymentURL: String, apiVersion: String): OpenAICompatEmbeddingFunc =
    new OpenAICompatEmbeddingFunc(deploymentURL, "", "", None,
      extraHeaders = Map("api-key" -> apiKey),
      queryParams = Map("api-version" -> apiVersion))

  /** Mistral (normalized output) — reference embed_compat.go:4-18. */
  def mistral(apiKey: String): OpenAICompatEmbeddingFunc =
    new OpenAICompatEmbeddingFunc("https://api.mistral.ai/v1", apiKey,
      "mistral-embed", Some(true))

  /** Jina — reference embed_compat.go:21-39. */
  def jina(apiKey: String, model: String = "jina-embeddings-v2-base-en"): OpenAICompatEmbeddingFunc =
    new OpenAICompatEmbeddingFunc("https://api.jina.ai/v1", apiKey, model)

  /** Mixedbread — reference embed_compat.go:42-72. */
  def mixedbread(apiKey: String, model: String): OpenAICompatEmbeddingFunc =
    new OpenAICompatEmbeddingFunc("https://api.mixedbread.ai", apiKey, model)

  /** LocalAI — reference embed_compat.go:75-87. */
  def localAI(model: String): OpenAICompatEmbeddingFunc =
    new OpenAICompatEmbeddingFunc("http://localhost:8080/v1", "", model)
}

/**
 * Ollama — reference embed_ollama.go:20-100.
 * POST {baseURL}/embed, body {"model": ..., "input": ...};
 * response embeddings[0].
 */
class OllamaEmbeddingFunc(
    model: String,
    baseURL: String = "http://localhost:11434/api") extends HttpEmbeddingFunc {

  override protected def request(text: String): HttpRequest =
    post(s"$baseURL/embed",
      Json.obj("model" -> Json.str(model), "input" -> Json.str(text)),
      "Content-Type" -> "application/json")

  override protected def parseResponse(body: String): Array[Float] = {
    val embs = Json.parse(body).asInstanceOf[Map[String, Any]]
      .getOrElse("embeddings", List.empty).asInstanceOf[List[Any]]
    if (embs.isEmpty) Array.empty else floats(embs.head)
  }

  /** Ollama `/embed` accepts an array input — one request per batch. */
  override protected def batchRequest(texts: Seq[String]): Option[HttpRequest] =
    Some(post(s"$baseURL/embed",
      Json.obj("model" -> Json.str(model), "input" -> Json.arr(texts.map(Json.str))),
      "Content-Type" -> "application/json"))

  /** embeddings[] in input order. */
  override protected def parseBatchResponse(body: String): Seq[Array[Float]] = {
    val embs = Json.parse(body).asInstanceOf[Map[String, Any]]
      .getOrElse("embeddings", List.empty).asInstanceOf[List[Any]]
    embs.map(floats)
  }
}

/**
 * Cohere — reference embed_cohere.go. Text must carry an input-type
 * prefix ("search_document: ", "search_query: ", "classification: ",
 * "clustering: ") which is stripped and sent as input_type.
 */
class CohereEmbeddingFunc(
    apiKey: String,
    model: String = "embed-english-v3.0",
    baseURL: String = "https://api.cohere.com/v1") extends HttpEmbeddingFunc {

  import CohereEmbeddingFunc._

  override protected def request(text: String): HttpRequest = {
    val (inputType, stripped) = InputTypePrefixes
      .collectFirst { case (t, p) if text.startsWith(p) => (t, text.stripPrefix(p)) }
      .getOrElse(throw new IllegalArgumentException(
        "text must start with a valid input type plus colon and space"))
    post(s"$baseURL/embed",
      Json.obj(
        "model" -> Json.str(model),
        "texts" -> Json.arr(Seq(Json.str(stripped))),
        "input_type" -> Json.str(inputType)),
      "Accept" -> "application/json",
      "Content-Type" -> "application/json",
      "Authorization" -> s"Bearer $apiKey")
  }

  override protected def parseResponse(body: String): Array[Float] = {
    val embs = Json.parse(body).asInstanceOf[Map[String, Any]]
      .getOrElse("embeddings", List.empty).asInstanceOf[List[Any]]
    if (embs.isEmpty) Array.empty else floats(embs.head)
  }
}

object CohereEmbeddingFunc {
  val SearchDocumentPrefix = "search_document: "
  val SearchQueryPrefix = "search_query: "
  val ClassificationPrefix = "classification: "
  val ClusteringPrefix = "clustering: "
  val InputTypePrefixes: Seq[(String, String)] = Seq(
    "search_document" -> SearchDocumentPrefix,
    "search_query" -> SearchQueryPrefix,
    "classification" -> ClassificationPrefix,
    "clustering" -> ClusteringPrefix)
}

/**
 * Google Vertex AI — reference embed_vertex.go.
 * POST {endpoint}/projects/{p}/locations/us-central1/publishers/google/
 * models/{m}:predict with instances[0].content; response
 * predictions[0].embeddings.values.
 */
class VertexEmbeddingFunc(
    apiKey: String,
    project: String,
    model: String = "text-embedding-004",
    apiEndpoint: String = "https://us-central1-aiplatform.googleapis.com/v1",
    autoTruncate: Boolean = false) extends HttpEmbeddingFunc {

  override protected def request(text: String): HttpRequest =
    post(s"$apiEndpoint/projects/$project/locations/us-central1/publishers/google/models/$model:predict",
      Json.obj(
        "instances" -> Json.arr(Seq(Json.obj("content" -> Json.str(text)))),
        "parameters" -> Json.obj("autoTruncate" ->
          (if (autoTruncate) "true" else "false"))),
      "Accept" -> "application/json",
      "Content-Type" -> "application/json",
      "Authorization" -> s"Bearer $apiKey")

  override protected def parseResponse(body: String): Array[Float] = {
    val preds = Json.parse(body).asInstanceOf[Map[String, Any]]
      .getOrElse("predictions", List.empty).asInstanceOf[List[Any]]
    if (preds.isEmpty) Array.empty
    else floats(preds.head.asInstanceOf[Map[String, Any]]("embeddings")
      .asInstanceOf[Map[String, Any]]("values"))
  }
}
