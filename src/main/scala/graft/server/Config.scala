package graft.server

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.sources.TableSource

/** YAML server config (reference: roapi/src/config.rs):
  *
  * {{{
  * addr:
  *   http: 127.0.0.1:8080
  *   postgres: 127.0.0.1:5432
  * tables:
  *   - name: cities
  *     uri: /data/cities.csv
  *     option: {format: csv, has_header: "true"}
  *     reload_interval: 30
  * kvstores:
  *   - name: names
  *     uri: /data/users.parquet
  *     key: id
  *     value: name
  * spark:
  *   spark.sql.shuffle.partitions: "32"
  * }}}
  *
  * The `spark:` block is the analogue of the reference's `datafusion:`
  * config pass-through (roapi/src/config.rs:246-261): every key is applied
  * verbatim to the session conf.
  */
object Config {

  final case class Kv(name: String, source: TableSource, key: String, value: String)
  final case class Loaded(httpAddr: Option[(String, Int)],
                          pgAddr: Option[(String, Int)],
                          tables: Seq[TableSource],
                          kvs: Seq[Kv],
                          sparkConf: Map[String, String],
                          http2Addr: Option[(String, Int)] = None,
                          flightAddr: Option[(String, Int)] = None,
                          flightAuthBasic: Option[(String, String)] = None,
                          flightAuthToken: Option[String] = None,
                          datafusionConf: Map[String, String] = Map.empty,
                          flightTls: Option[graft.server.flight.FlightSqlServer.Tls] = None,
                          responseFormat: graft.encoding.Encoders.ContentType =
                            graft.encoding.Encoders.Json,
                          /** Top-level `disable_read_only` (reference
                            * config.rs:48: true = serve read-write). */
                          disableReadOnly: Boolean = false,
                          /** Top-level `reload_interval` seconds — the
                            * default refresh cadence for tables without
                            * their own (config.rs:46). */
                          reloadIntervalSec: Option[Long] = None,
                          /** Top-level `auth:` block — the reference's
                            * unshipped "authentication layer" roadmap item:
                            * `basic: {user: pass, ...}` and/or
                            * `bearer: [token, ...]`; absent = open. */
                          httpAuthBasic: Map[String, String] = Map.empty,
                          httpAuthBearer: Seq[String] = Seq.empty) {
    /** `datafusion.sql_parser.dialect` from the reference's config surface
      * (roapi/src/config.rs:246-261, roapi/tests/config_test.rs:12-17). */
    def sqlDialect: Option[String] = datafusionConf.get("sql_parser.dialect")
  }

  /** Map the reference's `sql_parser.dialect` onto the Spark session.
    * Spark SQL's native grammar is HiveQL-derived, so `hive`/`generic`/
    * `spark` need no switch; `ansi`/`postgresql` enable ANSI mode; any
    * other DataFusion dialect has no Spark equivalent and errors LOUDLY
    * rather than silently parsing with different semantics. */
  def applySqlDialect(spark: org.apache.spark.sql.SparkSession, dialect: String): Unit =
    dialect.toLowerCase match {
      case "hive" | "generic" | "spark" => ()
      case "ansi" | "postgresql" | "postgres" =>
        spark.conf.set("spark.sql.ansi.enabled", "true")
      case d => throw new IllegalArgumentException(
        s"sql_parser.dialect `$d` is not supported by the Spark engine " +
          "(supported: generic, hive, spark, ansi, postgresql)")
    }

  def parse(yamlText: String): Loaded = parseRoot(
    Option(new Yaml().load[java.util.Map[String, Object]](yamlText))
      .getOrElse(new java.util.HashMap[String, Object]()))

  /** TOML config with the same keys — the reference accepts both formats
    * by file extension (roapi/src/config.rs:185-199). */
  def parseToml(tomlText: String): Loaded = parseRoot(Toml.parse(tomlText))

  private[server] def splitAddr(v: Object): Option[(String, Int)] =
    Option(v).map(_.toString).map { s =>
      val i = s.lastIndexOf(':')
      (s.substring(0, i), s.substring(i + 1).toInt)
    }

  private def parseRoot(root: java.util.Map[String, Object]): Loaded = {
    val addr = obj(root.get("addr"))
    val tables = list(root.get("tables")).map { t =>
      val m = obj(t)
      val opts = obj(m.get("option")).asScala.map { case (k, v) => k -> String.valueOf(v) }.toMap
      val base = TableSource.fromOptions(str(m, "name"), str(m, "uri"), opts)
      val withReload = Option(m.get("reload_interval")).map(_.toString.toLong)
        .map(s => base.copy(reloadIntervalSec = Some(s))).getOrElse(base)
      // reference parses a top-level per-table batch_size (mod.rs:569-572);
      // accepted + recorded, no-op in Spark (see TableSource.batchSize)
      Option(m.get("batch_size")).map(_.toString.toInt)
        .map(b => withReload.copy(batchSize = Some(b))).getOrElse(withReload)
    }
    val kvs = list(root.get("kvstores")).map { t =>
      val m = obj(t)
      val opts = obj(m.get("option")).asScala.map { case (k, v) => k -> String.valueOf(v) }.toMap
      Kv(str(m, "name"),
        TableSource.fromOptions(str(m, "name") + "_src", str(m, "uri"), opts),
        str(m, "key"), str(m, "value"))
    }
    val sparkConf = flattenConf(obj(root.get("spark")))
    // reference: addr.flight_sql (roapi/src/server/flight_sql.rs:936-941)
    // plus flight_sql_config.auth_basic / auth_token (config.rs FlightSqlConfig)
    val fsc = obj(root.get("flight_sql_config"))
    val authBasic = {
      val b = obj(fsc.get("auth_basic"))
      (Option(b.get("username")), Option(b.get("password"))) match {
        case (Some(u), Some(p)) => Some((u.toString, p.toString))
        case _ => None
      }
    }
    // the reference's `datafusion:` engine-conf block: dotted keys kept
    // verbatim; nested maps flattened to the same dotted form
    val dfConf = flattenConf(obj(root.get("datafusion")))
    // flight_sql_config.tls: PEM cert/key + client CA, all three required
    // when the block is present (the reference struct's fields are
    // non-optional Strings — roapi/src/config.rs FlightSqlTlsConfig)
    val flightTls = Option(fsc.get("tls")).map { t =>
      val m = obj(t)
      graft.server.flight.FlightSqlServer.Tls(
        str(m, "cert"), str(m, "key"), str(m, "client_ca"))
    }
    // `response_format`: the default encoder when a request has no/unknown
    // ACCEPT (reference config.rs ContentType serde variants; mime aliases
    // accepted too); an unknown value errors loudly rather than silently
    // serving Json
    val respFmt = Option(root.get("response_format")).map(_.toString)
      .map(parseResponseFormat).getOrElse(graft.encoding.Encoders.Json)
    val authBlock = obj(root.get("auth"))
    val httpBasic = obj(authBlock.get("basic")).asScala
      .map { case (k, v) => k -> String.valueOf(v) }.toMap
    val httpBearer = list(authBlock.get("bearer")).map(String.valueOf(_))
    Loaded(splitAddr(addr.get("http")), splitAddr(addr.get("postgres")),
      tables, kvs, sparkConf, splitAddr(addr.get("http2")),
      splitAddr(addr.get("flight_sql")), authBasic,
      Option(fsc.get("auth_token")).map(_.toString), dfConf, flightTls, respFmt,
      disableReadOnly =
        Option(root.get("disable_read_only")).exists(_.toString.toBoolean),
      reloadIntervalSec =
        Option(root.get("reload_interval")).map(_.toString.toLong),
      httpAuthBasic = httpBasic,
      httpAuthBearer = httpBearer)
  }

  /** Engine-conf blocks (`spark:`, `datafusion:`) flattened to dotted
    * string keys at ANY nesting depth: YAML writes the dotted key
    * verbatim, but TOML's natural `spark.sql.shuffle.partitions = "32"`
    * spelling parses as nested tables — both must reach the session conf
    * as one `spark.sql.shuffle.partitions` entry, never a stringified
    * map under `spark` (which Spark would accept and silently ignore). */
  private def flattenConf(m: java.util.Map[String, Object],
                          prefix: String = ""): Map[String, String] =
    m.asScala.flatMap {
      case (k, nested: java.util.Map[_, _]) =>
        flattenConf(nested.asInstanceOf[java.util.Map[String, Object]],
          prefix + k + ".")
      case (k, v) => Map(prefix + k -> String.valueOf(v))
    }.toMap

  /** The reference's ContentType variant names (config.rs serde), plus the
    * mime aliases; unknown values error loudly. Shared by the YAML key and
    * the `--response-format` CLI flag. */
  def parseResponseFormat(v: String): graft.encoding.Encoders.ContentType = {
    import graft.encoding.Encoders
    v.toLowerCase.replace("_", "").replace("-", "") match {
      case "json" | "application/json" => Encoders.Json
      case "csv" | "application/csv" => Encoders.Csv
      case "arrowfile" | "application/vnd.apache.arrow.file" => Encoders.ArrowFile
      case "arrowstream" | "application/vnd.apache.arrow.stream" => Encoders.ArrowStream
      case "parquet" | "application/parquet" => Encoders.Parquet
      case "msgpack" | "application/msgpack" => Encoders.MsgPack
      case _ => throw new IllegalArgumentException(
        s"config: unknown response_format `$v` " +
          "(expected Json, Csv, ArrowFile, ArrowStream, Parquet, or MsgPack)")
    }
  }

  private def obj(v: Object): java.util.Map[String, Object] = v match {
    case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Object]]
    case _ => new java.util.HashMap[String, Object]()
  }
  private def list(v: Object): Seq[Object] = v match {
    case l: java.util.List[_] => l.asScala.toSeq.asInstanceOf[Seq[Object]]
    case _ => Seq.empty
  }
  private def str(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(_.toString)
      .getOrElse(throw new IllegalArgumentException(s"config: missing `$k`"))
}
