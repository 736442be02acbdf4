package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.encoding.Encoders
import graft.sources.TableSource

/** Multi-protocol read-only query server over one Engine — the HTTP frontend
  * (reference: roapi/src/api/routes.rs):
  *
  *   GET  /api/version            GET  /api/tables/{t}?params
  *   POST /api/sql                POST /api/graphql
  *   GET  /api/schema[/{t}]       GET  /api/kv/{name}/{key}
  *   POST /api/table (register)   POST /api/tables/drop
  *   GET  /health
  *
  * Content negotiation via ACCEPT (json/csv/arrow stream/arrow file/parquet);
  * errors as `{"code":N,"error":slug,"message":..}` (roapi/src/error.rs).
  * Register/drop are rejected in read-only mode (roapi/src/context.rs:112-131).
  */
final class HttpApp(engine: Engine, port: Int = 0) {

  final case class ApiError(code: Int, error: String, message: String)
      extends RuntimeException(message)

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  def start(): HttpApp = {
    server.createContext("/", handle _)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  // ---- routing -------------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    try {
      (method, path.stripSuffix("/").split('/').toList.drop(1)) match {
        case ("GET", List("health")) => respondRaw(ex, 200, "OK".getBytes(UTF_8), "text/plain")
        case ("GET", List("api", "version")) =>
          respondRaw(ex, 200, "\"0.1.0\"".getBytes(UTF_8), "application/json")
        case ("POST", List("api", "sql")) =>
          respondQuery(ex, engine.querySql(bodyString(ex)))
        case ("POST", List("api", "graphql")) =>
          respondQuery(ex, engine.queryGraphQl(bodyString(ex)))
        case ("GET", List("api", "tables", t)) =>
          respondQuery(ex, engine.queryRest(t, queryParams(ex)))
        case ("GET", List("api", "schema")) =>
          respondRaw(ex, 200, engine.allSchemasJson.getBytes(UTF_8), "application/json")
        case ("GET", List("api", "schema", t)) =>
          respondRaw(ex, 200, engine.schemaJson(t).getBytes(UTF_8), "application/json")
        case ("GET", List("api", "kv", name, key)) =>
          engine.kvGet(name, key) match {
            case Some(v) => respondRaw(ex, 200, v.getBytes(UTF_8), "text/plain")
            case None => throw ApiError(404, "not_found", s"key `$key` not found in kv `$name`")
          }
        case ("POST", List("api", "table")) =>
          if (engine.readOnly)
            throw ApiError(400, "read_only_mode", "table registration is disabled in read-only mode")
          registerTables(bodyString(ex))
          respondRaw(ex, 200, Array.emptyByteArray, "application/json")
        case ("POST", List("api", "tables", "drop")) =>
          if (engine.readOnly)
            throw ApiError(400, "read_only_mode", "table drop is disabled in read-only mode")
          val node = mapper.readTree(bodyString(ex))
          engine.dropTable(node.get("tableName").asText())
          respondRaw(ex, 200, Array.emptyByteArray, "application/json")
        case _ => throw ApiError(404, "not_found", s"$method $path")
      }
    } catch {
      case e: ApiError => respondError(ex, e)
      case e: graft.frontend.RestQuery.RestError =>
        respondError(ex, ApiError(400, e.error, e.message))
      case e: graft.frontend.GraphQl.GraphQlError =>
        respondError(ex, ApiError(400, "invalid graphql query", e.message))
      case e: Throwable =>
        respondError(ex, ApiError(400, "query_execution", String.valueOf(e.getMessage)))
    } finally ex.close()
  }

  /** Register body: `[{"tableName": "...", "uri": "...", "option": {...}}]`
    * (reference: roapi/src/api/register.rs SourceConfig). */
  private def registerTables(body: String): Unit = {
    val node = mapper.readTree(body)
    require(node.isArray, "register body must be a JSON array")
    node.forEach { cfg =>
      val name = cfg.get("tableName").asText()
      val uri = Option(cfg.get("uri")).map(_.asText())
        .getOrElse(throw ApiError(400, "register_table", s"Table `$name` source not exists"))
      val opts = Option(cfg.get("option")).map { o =>
        val b = Map.newBuilder[String, String]
        o.properties().forEach(e => b += (e.getKey -> e.getValue.asText()))
        b.result()
      }.getOrElse(Map.empty[String, String])
      engine.registerTable(TableSource.fromOptions(name, uri, opts))
    }
  }

  // ---- helpers -------------------------------------------------------------

  private def bodyString(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map {
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

  private def respondQuery(ex: HttpExchange, df: org.apache.spark.sql.DataFrame): Unit = {
    val accept = Option(ex.getRequestHeaders.getFirst("Accept"))
    Encoders.fromAccept(accept) match {
      // JSON/CSV/Arrow-stream respond chunked, one partition at a time — a
      // full-table export never materializes on the driver or in a buffer
      case ct @ (Encoders.Json | Encoders.Csv | Encoders.ArrowStream) =>
        ex.getResponseHeaders.set("Content-Type", ct.mime)
        ex.sendResponseHeaders(200, 0) // chunked
        val out = ex.getResponseBody
        ct match {
          case Encoders.Json => Encoders.writeJson(df, out)
          case Encoders.Csv => Encoders.writeCsv(df, out)
          case _ => org.apache.spark.sql.GraftArrowBridge.writeIpcStream(df, out)
        }
        out.close()
      // Arrow *file* and Parquet need a trailing footer, so they buffer
      case ct => respondRaw(ex, 200, Encoders.encode(df, ct), ct.mime)
    }
  }

  private def respondError(ex: HttpExchange, e: ApiError): Unit = {
    val body =
      s"""{"code":${e.code},"error":${mapper.writeValueAsString(e.error)},"message":${mapper.writeValueAsString(e.message)}}"""
    respondRaw(ex, e.code, body.getBytes(UTF_8), "application/json")
  }

  private def respondRaw(ex: HttpExchange, code: Int, body: Array[Byte], mime: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", mime)
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
  }
}

/** Server entry point.
  *
  *   runMain graft.server.ServerMain table1=uri1,opt=val ...
  *   runMain graft.server.ServerMain --config server.yml
  *
  * Boots the HTTP frontend and (if configured or GRAFT_PG_PORT is set) the
  * Postgres wire frontend over one shared engine — sibling servers over one
  * context, as in the reference (roapi/src/startup.rs:140-177). */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val cfg = args match {
      case Array("--config", path) =>
        Config.parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      case _ => Config.Loaded(None, None, args.toSeq.map(TableSource.parseUriArg), Seq.empty, Map.empty)
    }
    val spark = graft.GraftSession.get()
    cfg.sparkConf.foreach { case (k, v) => spark.conf.set(k, v) }
    val readOnly = !sys.env.get("GRAFT_READ_WRITE").exists(_.toBoolean)
    val engine = new Engine(spark, readOnly)
    cfg.tables.foreach(engine.registerTable)
    cfg.kvs.foreach(kv => engine.registerKv(kv.name, kv.source, kv.key, kv.value))
    val httpPort = cfg.httpAddr.map(_._2)
      .orElse(sys.env.get("GRAFT_PORT").map(_.toInt)).getOrElse(8080)
    val app = new HttpApp(engine, httpPort).start()
    println(s"graft http listening on 127.0.0.1:${app.boundPort}")
    cfg.pgAddr.map(_._2).orElse(sys.env.get("GRAFT_PG_PORT").map(_.toInt)).foreach { p =>
      val pg = new PostgresServer(engine, p).start()
      println(s"graft postgres listening on 127.0.0.1:${pg.boundPort}")
    }
    Thread.currentThread().join()
  }
}

/** One-shot / interactive SQL CLI over the same engine
  * (reference: columnq-cli/src/main.rs:46-99 console loop + cmd_sql).
  *
  *   runMain graft.Cli table1=uri1 ... [-q "SELECT ..."] [--format json|csv|table]
  *
  * Without `-q` it enters the interactive console: a `graft(sql)> ` prompt,
  * `exit`/`quit`/`q` (or EOF) to leave, per-query errors printed without
  * killing the session. (Plain stdin line reading — no readline/history lib
  * offline; the reference uses rustyline.)
  */
object CliMain {

  private[server] def render(engine: Engine, sql: String, fmt: String,
                             out: java.io.PrintStream): Unit = {
    val df = engine.querySql(sql)
    fmt match {
      case "json" => out.println(new String(graft.encoding.Encoders.toJsonBytes(df), "UTF-8"))
      case "csv"  => out.print(new String(graft.encoding.Encoders.toCsvBytes(df), "UTF-8"))
      case _      => scala.Console.withOut(out)(df.show(1000, truncate = false))
    }
  }

  /** The interactive loop, parameterized over streams so specs can drive it. */
  private[server] def consoleLoop(engine: Engine, in: java.io.BufferedReader,
                                  out: java.io.PrintStream, fmt: String): Unit = {
    var open = true
    while (open) {
      out.print("graft(sql)> "); out.flush()
      val line = in.readLine()
      Option(line).map(_.trim) match {
        case None | Some("exit") | Some("quit") | Some("q") =>
          out.println("Good bye!"); open = false
        case Some("") => ()
        case Some(sql) =>
          try render(engine, sql, fmt, out)
          catch { case e: Throwable => out.println(s"Error: ${e.getMessage}") }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    var sql = ""
    var fmt = "table"
    val tableArgs = Seq.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-q" => sql = args(i + 1); i += 2
        case "--format" => fmt = args(i + 1); i += 2
        case other => tableArgs += other; i += 1
      }
    }
    val spark = graft.GraftSession.get()
    val engine = new Engine(spark, readOnly = true)
    tableArgs.result().foreach(a => engine.registerTable(TableSource.parseUriArg(a)))
    if (sql.nonEmpty) render(engine, sql, fmt, System.out)
    else consoleLoop(engine,
      new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out, fmt)
    spark.stop()
  }
}
