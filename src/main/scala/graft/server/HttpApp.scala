package graft.server

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

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
final class HttpApp(engine: Engine, port: Int = 0,
                    host: String = "127.0.0.1") {

  // TCP_NODELAY: without it the JDK server's small responses sit in Nagle's
  // buffer waiting for the client's delayed ACK — a flat ~40 ms floor on
  // every request that no amount of server-side speed can cross (the
  // serving bench measured exactly that). Must be set before create().
  HttpApp.ensureNoDelay()

  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)

  def boundPort: Int = server.getAddress.getPort

  // daemon workers + explicit shutdown: a stopped HttpApp must not pin the
  // JVM (the bench embeds one; non-daemon pool threads kept the process
  // alive after main returned)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "graft-http-worker"); t.setDaemon(true); t
  })

  def start(): HttpApp = {
    server.createContext("/", handle _)
    server.setExecutor(pool)
    server.start()
    this
  }

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // ---- transport adapter (routing lives in Routes, shared with Http2App) ---

  private def handle(ex: HttpExchange): Unit = {
    val req = Routes.Request(
      ex.getRequestMethod, ex.getRequestURI.getPath,
      Option(ex.getRequestURI.getRawQuery),
      Option(ex.getRequestHeaders.getFirst("Accept")),
      () => ex.getRequestBody.readAllBytes(),
      authorization = Option(ex.getRequestHeaders.getFirst("Authorization")))
    try {
      // permissive CORS on every response (roapi/src/server/http/mod.rs:61-66)
      Routes.corsHeadersFor(req.method).foreach { case (k, v) =>
        ex.getResponseHeaders.set(k, v)
      }
      Routes.handle(engine, req) match {
        case Routes.Full(status, mime, body) =>
          ex.getResponseHeaders.set("Content-Type", mime)
          if (status == 401) // RFC 7235: tell the client how to authenticate
            ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"graft\"")
          ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
          if (body.nonEmpty) ex.getResponseBody.write(body)
        case Routes.Streamed(mime, write) =>
          ex.getResponseHeaders.set("Content-Type", mime)
          ex.sendResponseHeaders(200, 0) // chunked
          val out = ex.getResponseBody
          write(out)
          out.close()
      }
    } finally ex.close()
  }
}

object HttpApp {
  private lazy val noDelay: Unit = {
    if (System.getProperty("sun.net.httpserver.nodelay") == null)
      System.setProperty("sun.net.httpserver.nodelay", "true")
  }
  private def ensureNoDelay(): Unit = noDelay
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

  /** CLI surface mirroring the reference binary's flags
    * (roapi/src/config.rs:95-245): positional `name=uri,opt=val` tables,
    * `-c/--config` (YAML or TOML by extension), `--addr-http` /
    * `--addr-postgres` / `--addr-flight-sql` overrides, `-d/
    * --disable-read-only`, `-r/--reload-interval` (which, like the
    * reference, REQUIRES read-write mode), `-f/--response-format`.
    * Factored out of main so specs drive it without booting servers. */
  /** Flags that take an operand / that are boolean — the CLOSED grammar:
    * any other '-' token is a usage error in BOTH passes (round-10 advice:
    * the old skip-2 guess silently swallowed the next flag and then
    * registered `--addr-http` as a table named "--addr-http"). */
  private val operandFlags = Set("--config", "-c", "--addr-http",
    "--addr-postgres", "--addr-flight-sql", "--reload-interval", "-r",
    "--response-format", "-f")
  private val booleanFlags = Set("--disable-read-only", "-d")

  private[server] def buildConfig(rawArgs: Array[String]): Config.Loaded = {
    // clap-style `--flag=value` spelling normalizes to two tokens first —
    // but only for flags that TAKE a value: `--disable-read-only=true`
    // would otherwise leave a stray "true" token that pass 2 parses as a
    // table arg (round-11 review finding)
    val args = rawArgs.flatMap { a =>
      if (a.startsWith("--") && a.contains('=') &&
          operandFlags(a.substring(0, a.indexOf('='))))
        Array(a.substring(0, a.indexOf('=')), a.substring(a.indexOf('=') + 1))
      else if (a.startsWith("--") && a.contains('=') &&
          booleanFlags(a.substring(0, a.indexOf('='))))
        throw new IllegalArgumentException(
          s"flag ${a.substring(0, a.indexOf('='))} takes no value")
      else Array(a)
    }
    // a flag missing its operand must die with a usage message, not an
    // ArrayIndexOutOfBoundsException
    def operand(i: Int, flag: String): String = {
      require(i + 1 < args.length, s"missing value for $flag")
      args(i + 1)
    }
    // PASS 1: locate and load the config file — like the reference's clap
    // handling, flags apply ON TOP of the config regardless of where
    // --config sits on the command line (a `-d` BEFORE `--config` must
    // not be clobbered by the load)
    var cfg = Config.Loaded(None, None, Seq.empty, Seq.empty, Map.empty)
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--config" | "-c" =>
          val path = operand(i, args(i))
          val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
          cfg = if (path.endsWith(".toml")) Config.parseToml(text)
                else Config.parse(text)
          i += 2
        case f if booleanFlags(f) => i += 1
        case f if operandFlags(f) => i += 2
        case f if f.startsWith("-") =>
          throw new IllegalArgumentException(
            s"unknown flag `$f` (known: ${(operandFlags ++ booleanFlags).toSeq.sorted.mkString(", ")})")
        case _ => i += 1
      }
    }
    // PASS 2: flag overrides in order
    val tables = Seq.newBuilder[TableSource]
    var reload: Option[Long] = None
    i = 0
    while (i < args.length) {
      args(i) match {
        case "--config" | "-c" => i += 2
        case f @ ("--addr-http") =>
          cfg = cfg.copy(httpAddr = Config.splitAddr(operand(i, f))); i += 2
        case f @ ("--addr-postgres") =>
          cfg = cfg.copy(pgAddr = Config.splitAddr(operand(i, f))); i += 2
        case f @ ("--addr-flight-sql") =>
          cfg = cfg.copy(flightAddr = Config.splitAddr(operand(i, f))); i += 2
        case "--disable-read-only" | "-d" =>
          cfg = cfg.copy(disableReadOnly = true); i += 1
        case f @ ("--reload-interval" | "-r") =>
          reload = Some(operand(i, f).toLong); i += 2
        case f @ ("--response-format" | "-f") =>
          cfg = cfg.copy(responseFormat = Config.parseResponseFormat(operand(i, f)))
          i += 2
        case other => tables += TableSource.parseUriArg(other); i += 1
      }
    }
    reload.foreach { r =>
      // reference rule (config.rs:228-233): reload only makes sense when
      // tables can actually be re-registered
      require(cfg.disableReadOnly,
        "Table reload not supported in read-only mode. " +
          "Try specify the --disable-read-only option.")
      cfg = cfg.copy(reloadIntervalSec = Some(r))
    }
    cfg.copy(tables = cfg.tables ++ tables.result())
  }

  def main(args: Array[String]): Unit = {
    val cfg = buildConfig(args)
    val spark = graft.GraftSession.get()
    cfg.sparkConf.foreach { case (k, v) => spark.conf.set(k, v) }
    cfg.sqlDialect.foreach(Config.applySqlDialect(spark, _))
    // read-write via the reference's `disable_read_only: true` config key
    // or the env override
    val readOnly = !(cfg.disableReadOnly ||
      sys.env.get("GRAFT_READ_WRITE").exists(_.toBoolean))
    val engine = new Engine(spark, readOnly,
      pipelineDir = sys.env.get("GRAFT_PIPELINE_DIR"),
      responseFormat = cfg.responseFormat,
      defaultReloadSec = cfg.reloadIntervalSec,
      httpAuthBasic = cfg.httpAuthBasic,
      httpAuthBearer = cfg.httpAuthBearer.toSet)
    cfg.tables.foreach(engine.registerTable)
    cfg.kvs.foreach(kv => engine.registerKv(kv.name, kv.source, kv.key, kv.value))
    // the configured HOST is honored, not just the port (round-10 advice:
    // `--addr-http 0.0.0.0:9000` used to silently bind loopback)
    def hostOf(addr: Option[(String, Int)]): String =
      addr.map(_._1).filter(_.nonEmpty).getOrElse("127.0.0.1")
    val httpPort = cfg.httpAddr.map(_._2)
      .orElse(sys.env.get("GRAFT_PORT").map(_.toInt)).getOrElse(8080)
    val httpHost = hostOf(cfg.httpAddr)
    val app = new HttpApp(engine, httpPort, httpHost).start()
    println(s"graft http listening on $httpHost:${app.boundPort}")
    cfg.pgAddr.map(_._2).orElse(sys.env.get("GRAFT_PG_PORT").map(_.toInt)).foreach { p =>
      val h = hostOf(cfg.pgAddr)
      val pg = new PostgresServer(engine, p, h).start()
      println(s"graft postgres listening on $h:${pg.boundPort}")
    }
    cfg.http2Addr.map(_._2)
      .orElse(sys.env.get("GRAFT_HTTP2_PORT").map(_.toInt)).foreach { p =>
      val h = hostOf(cfg.http2Addr)
      val h2 = new Http2App(engine, p, h).start()
      println(s"graft http2 (h2c) listening on $h:${h2.boundPort}")
    }
    cfg.flightAddr.map(_._2)
      .orElse(sys.env.get("GRAFT_FLIGHT_PORT").map(_.toInt)).foreach { p =>
      val h = hostOf(cfg.flightAddr)
      val fs = new graft.server.flight.FlightSqlServer(
        engine, p, cfg.flightAuthBasic, cfg.flightAuthToken, cfg.flightTls, h).start()
      val proto = if (cfg.flightTls.isDefined) "grpc/tls" else "grpc/h2c"
      println(s"graft flight-sql ($proto) listening on $h:${fs.boundPort}")
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
                             out: java.io.PrintStream): Unit =
    renderDf(engine.querySql(sql), fmt, out)

  private[server] def renderDf(df: org.apache.spark.sql.DataFrame, fmt: String,
                               out: java.io.PrintStream): Unit =
    fmt match {
      case "json" => out.println(new String(graft.encoding.Encoders.toJsonBytes(df), "UTF-8"))
      case "csv"  => out.print(new String(graft.encoding.Encoders.toCsvBytes(df), "UTF-8"))
      // binary formats straight to the stream, the reference's
      // bytes_to_stdout (columnq-cli/src/main.rs:102-156)
      case "parquet" => out.write(graft.encoding.Encoders.toParquetBytes(df)); out.flush()
      case "arrow"   => out.write(org.apache.spark.sql.GraftArrowBridge.toIpcFileBytes(df)); out.flush()
      case "arrows"  => out.write(org.apache.spark.sql.GraftArrowBridge.toIpcStreamBytes(df)); out.flush()
      case "table"   => scala.Console.withOut(out)(df.show(1000, truncate = false))
      case other => throw new IllegalArgumentException(
        s"unsupported output format: $other")
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
    var pipeline = ""
    var pipelineDir = ""
    val tableArgs = Seq.newBuilder[String]
    // reference subcommand forms (columnq-cli/src/main.rs:165-215):
    // `sql <SQL> -t name=uri -o json` and `console -t name=uri`; bare
    // positionals stay table args for backward compatibility otherwise
    val sqlMode = args.headOption.contains("sql")
    val rest = if (sqlMode || args.headOption.contains("console")) args.drop(1) else args
    def operand(i: Int, flag: String): String = {
      require(i + 1 < rest.length, s"missing value for $flag")
      rest(i + 1)
    }
    var i = 0
    while (i < rest.length) {
      rest(i) match {
        case f @ "-q" => sql = operand(i, f); i += 2
        case f @ ("-t" | "--table") => tableArgs += operand(i, f); i += 2
        case f @ ("--format" | "-o" | "--output") => fmt = operand(i, f); i += 2
        // one-shot pipeline-operator run: --pipeline <name> --dir <sfDir>
        // (the CLI face of the /api/pipeline route; names come from the
        // fixed SparkEntry catalog, so a typo fails with the known list)
        case f @ "--pipeline" => pipeline = operand(i, f); i += 2
        case f @ "--dir" => pipelineDir = operand(i, f); i += 2
        // in `sql` mode the first bare positional IS the query
        case other if sqlMode && sql.isEmpty => sql = other; i += 1
        case other => tableArgs += other; i += 1
      }
    }
    val spark = graft.GraftSession.get()
    val engine = new Engine(spark, readOnly = true)
    tableArgs.result().foreach(a => engine.registerTable(TableSource.parseUriArg(a)))
    if (pipeline.nonEmpty) {
      val q = graft.SparkEntry.queries.getOrElse(pipeline,
        sys.error(s"unknown pipeline query `$pipeline`; known: " +
          graft.SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")))
      require(pipelineDir.nonEmpty, "--pipeline requires --dir <dataset root>")
      renderDf(q(spark, pipelineDir), fmt, System.out)
    }
    else if (sql.nonEmpty) render(engine, sql, fmt, System.out)
    else consoleLoop(engine,
      new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out, fmt)
    spark.stop()
  }
}
