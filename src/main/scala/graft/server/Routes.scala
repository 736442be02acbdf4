package graft.server

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import graft.encoding.Encoders
import graft.sources.TableSource

/** Transport-agnostic request handling for the HTTP API: one routing table
  * shared by every HTTP transport (JDK HTTP/1.1 server in [[HttpApp]], Netty
  * h2c in [[Http2App]]), so protocol parity is by construction — the same
  * reference surface (roapi/src/api/routes.rs) over any framing. */
object Routes {

  final case class ApiError(code: Int, error: String, message: String)
      extends RuntimeException(message)

  /** `body` is pulled lazily — GET handlers never read it. */
  final case class Request(method: String, path: String, rawQuery: Option[String],
                           accept: Option[String], body: () => Array[Byte],
                           authorization: Option[String] = None)

  sealed trait Response { def status: Int; def mime: String }
  final case class Full(status: Int, mime: String, body: Array[Byte]) extends Response
  /** Unknown length, written incrementally (chunked in HTTP/1.1, DATA frames
    * in HTTP/2) one partition at a time — full-table exports never
    * materialize in a buffer, on any transport. */
  final case class Streamed(mime: String, write: java.io.OutputStream => Unit)
      extends Response { def status: Int = 200 }

  private val mapper = new ObjectMapper()

  /** Permissive CORS, mirroring the reference's tower-http layer
    * (roapi/src/server/http/mod.rs:61-66: allow GET/POST/OPTIONS, any
    * origin, no credentials). The layer wraps EVERY route on every HTTP
    * transport: transports stamp [[corsHeadersFor]] on each response, and
    * [[route]] answers any preflight OPTIONS with 204 no-body (the
    * allow-methods/allow-headers pair only appears on preflight, like the
    * reference layer). Without this, a browser page not served from the
    * same origin — including /ui behind a proxy — cannot call /api/sql. */
  def corsHeadersFor(method: String): Seq[(String, String)] =
    if (method == "OPTIONS")
      Seq("Access-Control-Allow-Origin" -> "*",
        "Access-Control-Allow-Methods" -> "GET, POST, OPTIONS",
        "Access-Control-Allow-Headers" -> "*")
    else Seq("Access-Control-Allow-Origin" -> "*")

  /** The single-file console page, embedded on the classpath the way the
    * reference embeds roapi-ui's dist (rust_embed in http/ui.rs). */
  private lazy val consoleHtml: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/ui/console.html")
    require(in != null, "console.html missing from classpath")
    try in.readAllBytes() finally in.close()
  }

  /** Per-request access-log sink — one line per handled request (method,
    * path, status, micros) on EVERY transport sharing this routing table,
    * the analogue of the reference's tower logging middleware
    * (roapi/src/server/http/layers.rs:16-60, HttpLoggerLayer). Pluggable so
    * specs can assert the line fires; the default writes to stderr like the
    * rest of the server's diagnostics. */
  @volatile var accessLog: String => Unit = line => System.err.println(line)

  /** Route + execute; every failure becomes the reference's error JSON
    * (`{"code":N,"error":slug,"message":..}`, roapi/src/error.rs). */
  def handle(engine: Engine, req: Request): Response = {
    val t0 = System.nanoTime()
    // one FAIR pool per request (round-12 verdict #3): the route's plan
    // execution AND the Streamed body's partition-at-a-time encode jobs
    // (which run later, on the transport's writer thread) both carry it,
    // so a heavy request cannot head-of-line-block cheap concurrent ones
    val pool = engine.nextRequestPool()
    val resp =
      try engine.withRequestPool(pool)(route(engine, req)) match {
        case Streamed(mime, write) =>
          Streamed(mime, out => engine.withRequestPool(pool)(write(out)))
        case full => full
      }
      catch {
        case e: ApiError => errorResponse(e)
        case e: graft.frontend.RestQuery.RestError =>
          errorResponse(ApiError(400, e.error, e.message))
        case e: graft.frontend.GraphQl.GraphQlError =>
          errorResponse(ApiError(400, "invalid graphql query", e.message))
        case e: Throwable =>
          errorResponse(ApiError(400, "query_execution", String.valueOf(e.getMessage)))
      }
    // response-ready time: for Streamed bodies the partitions write after
    // this line fires, exactly like the reference's on-response log point
    val micros = (System.nanoTime() - t0) / 1000
    try accessLog(s"${req.method} ${req.path} ${resp.status} ${micros}us")
    catch { case _: Throwable => () } // a broken sink must never fail a request
    resp
  }

  private def route(engine: Engine, req: Request): Response = {
    // auth layer (the reference's unshipped roadmap item): everything but
    // the liveness probe and CORS preflight needs credentials when
    // configured — a 401 through the standard error JSON + access log
    if (req.method != "OPTIONS" && req.path.stripSuffix("/") != "/health" &&
        !engine.authorize(req.authorization))
      throw ApiError(401, "unauthorized",
        "missing or invalid Authorization credentials")
    (req.method, req.path.stripSuffix("/").split('/').toList.drop(1)) match {
      // CORS preflight: permissive 204 for any path (the reference's
      // CorsLayer answers preflight before routing, so unknown paths
      // preflight successfully there too)
      case ("OPTIONS", _) => Full(204, "text/plain", Array.emptyByteArray)
      case ("GET", List("health")) => Full(200, "text/plain", "OK".getBytes(UTF_8))
      // Web console under /ui, as the reference mounts its wasm UI
      // (roapi/src/server/http/ui.rs ui_router: "/", "/index.html", fallback).
      case ("GET", List("ui")) | ("GET", List("ui", "index.html")) =>
        Full(200, "text/html", consoleHtml)
      case ("GET", "ui" :: _) =>
        Full(404, "text/plain", "404 Not Found".getBytes(UTF_8))
      case ("GET", List("api", "version")) =>
        Full(200, "application/json", "\"0.1.0\"".getBytes(UTF_8))
      // auto-generated OpenAPI doc for the REST layer (the reference's
      // unshipped roadmap item, README.md:331) — regenerated per request
      // so it always reflects the live registry
      case ("GET", List("api", "openapi")) =>
        Full(200, "application/json", OpenApi.document(engine).getBytes(UTF_8))
      case ("POST", List("api", "sql")) =>
        sqlResponse(engine, bodyString(req), req.accept)
      case ("POST", List("api", "graphql")) =>
        val q = bodyString(req)
        cachedResponse(engine, "gql:" + q, req.accept)(engine.queryGraphQl(q))
      case ("GET", List("api", "tables", t)) =>
        cachedResponse(engine, "rest:" + t + "?" + req.rawQuery.getOrElse(""),
          req.accept)(engine.queryRest(t, queryParams(req)))
      case ("GET", List("api", "schema")) =>
        Full(200, "application/json", engine.allSchemasJson.getBytes(UTF_8))
      case ("GET", List("api", "schema", t)) =>
        // reference: unknown table name is 404 "invalid table name"
        // (roapi/src/context.rs:155-164), not a query-execution error
        if (engine.knownSource(t).isEmpty)
          throw ApiError(404, "not_found", "invalid table name")
        Full(200, "application/json", engine.schemaJson(t).getBytes(UTF_8))
      // the pipeline-operator catalog over the SAME frontend surface: every
      // SparkEntry catalog query (dedup/ANN/tokenizer/quality/...) is
      // servable with the full ACCEPT negotiation (JSON/CSV/Arrow/parquet),
      // so the training-data operators are first-class API citizens, not a
      // Scala-only library. `dir` selects the dataset root (defaults to the
      // engine's configured pipeline dir); names are a fixed catalog, so an
      // unknown name is a 404, never an execution attempt.
      case ("GET", List("api", "pipeline")) =>
        val names = graft.SparkEntry.queries.keySet.toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]")
        Full(200, "application/json", names.getBytes(UTF_8))
      case ("GET", List("api", "pipeline", name)) =>
        val q = graft.SparkEntry.queries.getOrElse(name,
          throw ApiError(404, "not_found", s"unknown pipeline query `$name`"))
        // `dir` is client input naming a filesystem path: when a pipeline
        // root IS configured, the override must resolve under it (a
        // configured root is a constraint, not just a default — otherwise
        // any HTTP client can point Spark at arbitrary readable paths and
        // populate the per-dir memo caches). With no configured root the
        // operator has opted into the same trust model as registering
        // tables from URIs: local/dev use only.
        val dir = queryParams(req).get("dir") match {
          case Some(d) =>
            engine.pipelineDir.foreach { root =>
              val rp = java.nio.file.Paths.get(root).toAbsolutePath.normalize
              val dp = java.nio.file.Paths.get(d).toAbsolutePath.normalize
              if (!dp.startsWith(rp))
                throw ApiError(403, "forbidden",
                  s"`dir` must be under the configured pipeline dir")
            }
            d
          case None => engine.pipelineDir.getOrElse(
            throw ApiError(400, "bad_request",
              "no `dir` param and no configured pipeline dir"))
        }
        queryResponse(q(engine.spark, dir), req.accept, engine.responseFormat)
      case ("GET", List("api", "kv", name, key)) =>
        // reference split: unknown store = 400 invalid_kv_name
        // (columnq.rs:359-363), missing key = 404 (roapi/src/api/kv.rs)
        if (!engine.hasKv(name))
          throw ApiError(400, "invalid_kv_name",
            s"keyvalue store name `$name` doesn't exist")
        engine.kvGet(name, key) match {
          case Some(v) => Full(200, "text/plain", v.getBytes(UTF_8))
          case None => throw ApiError(404, "not_found", s"key $key not found")
        }
      case ("POST", List("api", "table")) =>
        if (engine.readOnly)
          // reference shape: 403 + this exact message (roapi/src/error.rs:92-98)
          throw ApiError(403, "read_only_mode",
            "Write operation is not allowed in read-only mode")
        registerTables(engine, bodyString(req))
        Full(200, "application/json", Array.emptyByteArray)
      case ("POST", List("api", "tables", "drop")) =>
        if (engine.readOnly)
          throw ApiError(403, "read_only_mode",
            "Write operation is not allowed in read-only mode")
        // reference wire shape: a JSON ARRAY of {tableName} entries
        // (roapi/src/api/drop.rs, api_test.rs:31-36); a bare object is
        // accepted too. Unknown names are the reference's 404.
        val node = mapper.readTree(bodyString(req))
        val entries =
          if (node.isArray) {
            val b = Seq.newBuilder[com.fasterxml.jackson.databind.JsonNode]
            node.forEach(e => b += e)
            b.result()
          } else Seq(node)
        val names = entries.map(_.get("tableName").asText())
        // validate the WHOLE batch before dropping anything: a 404 must
        // mean nothing was dropped, not "some prefix was"
        names.foreach { name =>
          if (engine.knownSource(name).isEmpty)
            throw ApiError(404, "not_found",
              s"Table `$name` source does not exist")
        }
        names.foreach(engine.dropTable)
        Full(200, "application/json", Array.emptyByteArray)
      case _ => throw ApiError(404, "not_found", s"${req.method} ${req.path}")
    }
  }

  /** ACCEPT-negotiated result encoding: stream the footer-less formats,
    * buffer the footer-ful ones (Arrow file, Parquet). `default` is the
    * engine's configured `response_format` — what serves when the request
    * carries no (or an unknown) ACCEPT header, exactly the reference's
    * fallback rule (roapi/src/api/mod.rs:25-35; note the star-slash-star
    * wildcard ACCEPT is Json there regardless of the configured default,
    * and here too). */
  /** The SQL path rides the engine's encoded-result cache: a repeated
    * identical (sql, content-type) request answers from bytes — no job, no
    * collect, no re-encode (registered tables are immutable snapshots
    * between registry changes; the engine fences with the plan-cache
    * epoch). Misses stream normally while a CAPPED tee captures the wire
    * bytes for next time — an oversized result just stops capturing, the
    * client stream is unaffected. */
  private def sqlResponse(engine: Engine, sql: String,
                          accept: Option[String]): Response =
    // "sql:" prefix: the three frontends share one cache map, so their
    // keyspaces must be disjoint — an unprefixed raw-SQL key could collide
    // with a literal "rest:..."/"gql:..." POST body (review finding)
    cachedResponse(engine, "sql:" + sql, accept)(engine.querySql(sql))

  /** Generalized over the three query frontends: `key` identifies the
    * request (raw SQL / REST table+params / GraphQL body) and `mk` builds
    * the frame on a miss. */
  private def cachedResponse(engine: Engine, key: String,
                             accept: Option[String])
                            (mk: => org.apache.spark.sql.DataFrame): Response = {
    val ct = Encoders.fromAccept(accept, engine.responseFormat)
    engine.lookupResult(key, ct.mime) match {
      case Some(bytes) => Full(200, ct.mime, bytes)
      case None =>
        val epoch = engine.resultEpoch
        val df = mk
        // cacheability decided ONCE, up front: an uncacheable request
        // (info-schema, rand()/now()) must not pay the capture buffer or a
        // second plan walk in the offer (review finding)
        val wantCache = engine.shouldCacheResult(key, df)
        ct match {
          case Encoders.Json | Encoders.Csv | Encoders.ArrowStream =>
            def writeTo(out: java.io.OutputStream): Unit = ct match {
              case Encoders.Json => Encoders.writeJson(df, out)
              case Encoders.Csv => Encoders.writeCsv(df, out)
              case _ => org.apache.spark.sql.GraftArrowBridge.writeIpcStream(df, out)
            }
            if (!wantCache) Streamed(ct.mime, writeTo)
            else Streamed(ct.mime, out => {
              val cap = new CappedCapture(Engine.resultEntryCapBytes)
              writeTo(new TeeOutputStream(out, cap))
              cap.result().foreach(engine.offerResult(key, ct.mime, _, epoch))
            })
          case _ =>
            val bytes = Encoders.encode(df, ct)
            if (wantCache) engine.offerResult(key, ct.mime, bytes, epoch)
            Full(200, ct.mime, bytes)
        }
    }
  }

  /** Buffers up to `cap` bytes, then abandons capture (result() = None). */
  private final class CappedCapture(cap: Int) extends java.io.OutputStream {
    private val buf = new java.io.ByteArrayOutputStream(8192)
    private var overflowed = false
    override def write(b: Int): Unit =
      if (!overflowed) { if (buf.size() >= cap) overflowed = true else buf.write(b) }
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      if (!overflowed) {
        if (buf.size() + len > cap) overflowed = true else buf.write(b, off, len)
      }
    def result(): Option[Array[Byte]] =
      if (overflowed) None else Some(buf.toByteArray)
  }

  /** Writes to the client stream and the capture in lockstep. */
  private final class TeeOutputStream(a: java.io.OutputStream,
                                      b: CappedCapture) extends java.io.OutputStream {
    override def write(x: Int): Unit = { a.write(x); b.write(x) }
    override def write(x: Array[Byte], off: Int, len: Int): Unit = {
      a.write(x, off, len); b.write(x, off, len)
    }
    override def flush(): Unit = a.flush()
    override def close(): Unit = a.close()
  }

  private def queryResponse(df: org.apache.spark.sql.DataFrame,
                            accept: Option[String],
                            default: Encoders.ContentType): Response =
    Encoders.fromAccept(accept, default) match {
      case ct @ (Encoders.Json | Encoders.Csv | Encoders.ArrowStream) =>
        Streamed(ct.mime, out => ct match {
          case Encoders.Json => Encoders.writeJson(df, out)
          case Encoders.Csv => Encoders.writeCsv(df, out)
          case _ => org.apache.spark.sql.GraftArrowBridge.writeIpcStream(df, out)
        })
      case ct => Full(200, ct.mime, Encoders.encode(df, ct))
    }

  /** Register body: `[{"tableName": "...", "uri": "...", "option": {...}}]`
    * (reference: roapi/src/api/register.rs SourceConfig). */
  private def registerTables(engine: Engine, body: String): Unit = {
    val node = mapper.readTree(body)
    require(node.isArray, "register body must be a JSON array")
    node.forEach { cfg =>
      val name = cfg.get("tableName").asText()
      Option(cfg.get("uri")).filterNot(_.isNull).map(_.asText()) match {
        case Some(uri) =>
          val opts = Option(cfg.get("option")).map { o =>
            val b = Map.newBuilder[String, String]
            o.properties().forEach(e => b += (e.getKey -> e.getValue.asText()))
            b.result()
          }.getOrElse(Map.empty[String, String])
          engine.registerTable(TableSource.fromOptions(name, uri, opts))
        case None =>
          // no uri = RE-register a known table from its original source —
          // the reference's refresh-on-demand arm (roapi/src/api/
          // register.rs:35-38); unknown names keep the reference error
          engine.knownSource(name) match {
            case Some(src) => engine.registerTable(src)
            // reference: register failures are 500 (error.rs:84-90)
            case None => throw ApiError(500, "register_table",
              s"Table `$name` source not exists")
          }
      }
    }
  }

  def errorResponse(e: ApiError): Full = {
    val body =
      s"""{"code":${e.code},"error":${mapper.writeValueAsString(e.error)},"message":${mapper.writeValueAsString(e.message)}}"""
    Full(e.code, "application/json", body.getBytes(UTF_8))
  }

  private def bodyString(req: Request): String = new String(req.body(), UTF_8)

  private def queryParams(req: Request): Map[String, String] =
    req.rawQuery.map {
      _.split('&').toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(urlDecode(k) -> urlDecode(v))
          case Array(k)    => Some(urlDecode(k) -> "")
          case _           => None
        }
      }.toMap
    }.getOrElse(Map.empty)

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)
}
