package graft.api

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's REST surface (api.py:112-281, FastAPI + uvicorn)
  * over [[GraftApi]], on the JDK's built-in HTTP server — zero new
  * dependencies (Jackson rides in with Spark). Routes, validation
  * semantics and error bodies mirror the reference:
  *
  *   - `GET /health`                         → `{"status":"ok",...}`
  *   - `GET /cases?judge=&year=`             → newest-200 summaries;
  *     400 when neither filter is given (api.py:164-168), 422 when
  *     `year` falls outside [1900, 2100] (FastAPI Query validation)
  *   - `GET /cases/{case_number}`            → detail + parties array
  *     (api.py:221-270); 404 when unknown
  *   - `POST /cases/search` `{query, limit}` → top-k semantic search;
  *     422 for a sub-2-char query or a limit outside [1, 50]
  *     (SearchRequest validators, api.py:64-74)
  *
  * Failures serialize as `{"error": "..."}` exactly like the
  * reference's exception handlers (api.py:137-150). The driver-side
  * pool of the reference (AsyncConnectionPool) maps to a fixed thread
  * pool feeding Spark jobs — Spark's scheduler multiplexes concurrent
  * queries the way the connection pool multiplexed connections.
  *
  * Serving is a driver-side concern: each request runs a small
  * already-optimized Spark plan (point lookup / pruned scan /
  * broadcast search) and collects a bounded result — the engine side
  * stays fully distributed.
  */
final class GraftHttpServer(api: GraftApi, port: Int = 0, poolSize: Int = 8) {

  private val mapper = new ObjectMapper()
  mapper.registerModule(DefaultScalaModule)

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(Executors.newFixedThreadPool(poolSize))
  server.createContext("/", (ex: HttpExchange) => handle(ex))

  /** Actual bound port (pass 0 to pick a free one). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)

  private final case class HttpError(status: Int, message: String)
    extends RuntimeException(message)

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod
    try {
      (method, path) match {
        case ("GET", "/health") =>
          respond(ex, 200, Map("status" -> "ok", "engine" -> "spark"))
        case ("GET", "/cases") => listCases(ex)
        case ("POST", "/cases/search") => search(ex)
        case ("POST", "/search/keyword") =>
          termSearch(ex, (t, k) => api.keywordSearch(t, k))
        case ("POST", "/search/bm25") =>
          termSearch(ex, (t, k) => api.bm25Search(t, k))
        case ("POST", "/search/phrase") => phraseSearch(ex)
        case ("POST", "/search/hybrid") => hybridSearch(ex)
        case ("POST", "/search/ann") => annSearch(ex)
        case ("GET", p) if p.startsWith("/cases/") =>
          getCase(ex, URLDecoder.decode(p.stripPrefix("/cases/"), "UTF-8"))
        case _ => throw HttpError(404, s"no route for $method $path")
      }
    } catch {
      case HttpError(status, msg) => respond(ex, status, Map("error" -> msg))
      case e: IllegalArgumentException =>
        // API-layer validation rejections (unknown filter fields,
        // out-of-range values) — FastAPI's 422 class (api.py:64-73)
        respond(ex, 422, Map("error" -> e.getMessage))
      case e: Exception =>
        respond(ex, 500, Map("error" -> s"Internal server error: ${e.getMessage}"))
    } finally ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def listCases(ex: HttpExchange): Unit = {
    val params = queryParams(ex)
    val judge = params.get("judge").filter(_.nonEmpty)
    val year = params.get("year").map { y =>
      val v = y.toIntOption.getOrElse(
        throw HttpError(422, "year must be an integer"))
      if (v < 1900 || v > 2100)
        throw HttpError(422, "year must be in [1900, 2100]")
      v
    }
    if (judge.isEmpty && year.isEmpty)
      throw HttpError(400, "At least one of 'judge' or 'year' must be provided")
    respond(ex, 200, api.listCases(judge, year).collect().toSeq)
  }

  private def getCase(ex: HttpExchange, caseNumber: String): Unit =
    api.getCase(caseNumber) match {
      case None => throw HttpError(404, s"Case $caseNumber not found")
      case Some(d) =>
        respond(ex, 200, Map(
          "case_number" -> d.case_number, "title" -> d.title,
          "filed_date" -> d.filed_date, "docket_text" -> d.docket_text,
          "status" -> d.status, "judge" -> d.judge, "court" -> d.court,
          "case_type" -> d.case_type,
          "parties" -> api.getParties(caseNumber)))
    }

  private def search(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val node = try mapper.readTree(body) catch {
      case _: Exception => throw HttpError(422, "request body must be JSON")
    }
    val query = Option(node.path("query").asText(null)).map(_.trim).getOrElse("")
    if (query.length < 2)
      throw HttpError(422, "query must be at least 2 characters")
    val limit = if (node.has("limit")) node.get("limit").asInt(-1) else 5
    if (limit < 1 || limit > 50)
      throw HttpError(422, "limit must be in [1, 50]")
    respond(ex, 200, api.searchDockets(query, limit))
  }

  /** Shared body parsing for the parameterized full-text endpoints
    * (r10 verdict item 5): `{terms: [...], limit}` with the
    * reference's validation conventions — 422 on empty/blank terms or
    * a limit outside [1, 50] (api.py:64-73's pattern), 500s from a
    * missing index stay 500 (server misconfiguration, not bad input).
    */
  private def termSearch(ex: HttpExchange,
      run: (Seq[String], Int) => Any): Unit = {
    val node = parseJson(ex)
    val termsNode = node.path("terms")
    if (!termsNode.isArray || termsNode.size() == 0)
      throw HttpError(422, "terms must be a non-empty array")
    val terms = (0 until termsNode.size())
      .map(i => termsNode.get(i).asText("").trim).filter(_.nonEmpty)
    if (terms.isEmpty)
      throw HttpError(422, "at least one non-blank term is required")
    respond(ex, 200, run(terms, limitOf(node, default = 20)))
  }

  /** `{phrase: "breach of contract", limit}` — the phrase splits on
    * whitespace into the positional pattern.
    */
  private def phraseSearch(ex: HttpExchange): Unit = {
    val node = parseJson(ex)
    val phrase = Option(node.path("phrase").asText(null))
      .map(_.trim).getOrElse("")
    if (phrase.length < 2)
      throw HttpError(422, "phrase must be at least 2 characters")
    val terms = phrase.split("\\s+").filter(_.nonEmpty).toSeq
    respond(ex, 200, api.phraseSearch(terms, limitOf(node, default = 20)))
  }

  /** `{query: "...", limit, where: {field: value}}` — BM25 + dense
    * RRF, both legs stored-index probes (GraftApi.hybridSearchDockets);
    * the optional equality-filter object narrows both legs to cases
    * matching every field (422 on unknown fields).
    */
  private def hybridSearch(ex: HttpExchange): Unit = {
    val node = parseJson(ex)
    val query = Option(node.path("query").asText(null))
      .map(_.trim).getOrElse("")
    if (query.length < 2)
      throw HttpError(422, "query must be at least 2 characters")
    respond(ex, 200, api.hybridSearchDockets(query,
      limitOf(node, default = 10), whereOf(node)))
  }

  /** `{query: "...", limit, where: {field: value}}` — dense-only
    * case-level search over the stored chunk-ANN index with the
    * adaptive filtered probe (GraftApi.annSearchDockets).
    */
  private def annSearch(ex: HttpExchange): Unit = {
    val node = parseJson(ex)
    val query = Option(node.path("query").asText(null))
      .map(_.trim).getOrElse("")
    if (query.length < 2)
      throw HttpError(422, "query must be at least 2 characters")
    respond(ex, 200, api.annSearchDockets(query,
      limitOf(node, default = 10), whereOf(node)))
  }

  /** The optional `where` equality-filter object: every value must be
    * a scalar and every field one of [[GraftApi.FilterFields]] — 422
    * otherwise, the reference's unknown-field validation convention.
    */
  private def whereOf(node: com.fasterxml.jackson.databind.JsonNode):
      Map[String, String] = {
    val w = node.path("where")
    if (w.isMissingNode || w.isNull) return Map.empty
    if (!w.isObject) throw HttpError(422, "where must be an object")
    val fields = scala.jdk.CollectionConverters
      .IteratorHasAsScala(w.fields()).asScala.toSeq
    fields.map { e =>
      if (!GraftApi.FilterFields(e.getKey))
        throw HttpError(422, s"unknown filter field: ${e.getKey}")
      if (!e.getValue.isValueNode || e.getValue.isNull)
        throw HttpError(422, s"filter value for ${e.getKey} must be a scalar")
      e.getKey -> e.getValue.asText()
    }.toMap
  }

  private def parseJson(ex: HttpExchange): com.fasterxml.jackson.databind.JsonNode = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    try mapper.readTree(body) catch {
      case _: Exception => throw HttpError(422, "request body must be JSON")
    }
  }

  private def limitOf(node: com.fasterxml.jackson.databind.JsonNode,
      default: Int): Int = {
    val limit = if (node.has("limit")) node.get("limit").asInt(-1) else default
    if (limit < 1 || limit > 50)
      throw HttpError(422, "limit must be in [1, 50]")
    limit
  }

  private def respond(ex: HttpExchange, status: Int, value: Any): Unit = {
    val bytes = mapper.writeValueAsBytes(value)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
