package graft.server

import graft.SparkSpec

class ConfigSpec extends SparkSpec {

  test("yaml config parses addrs, tables, kvstores, spark conf") {
    val cfg = Config.parse(
      """addr:
        |  http: 127.0.0.1:8080
        |  postgres: 127.0.0.1:5433
        |  http2: 127.0.0.1:8443
        |tables:
        |  - name: cities
        |    uri: /data/cities.csv
        |    option:
        |      format: csv
        |      has_header: "false"
        |    reload_interval: 30
        |  - name: li
        |    uri: /data/lineitem.parquet
        |kvstores:
        |  - name: names
        |    uri: /data/customer.parquet
        |    key: c_name
        |    value: c_custkey
        |spark:
        |  spark.sql.shuffle.partitions: "16"
        |""".stripMargin)
    assert(cfg.httpAddr.contains(("127.0.0.1", 8080)))
    assert(cfg.pgAddr.contains(("127.0.0.1", 5433)))
    assert(cfg.http2Addr.contains(("127.0.0.1", 8443)))
    assert(cfg.tables.map(_.name) == Seq("cities", "li"))
    assert(cfg.tables.head.resolvedFormat == "csv")
    assert(cfg.tables.head.options("has_header") == "false")
    assert(cfg.tables.head.reloadIntervalSec.contains(30L))
    assert(cfg.tables(1).resolvedFormat == "parquet")
    assert(cfg.kvs.head.key == "c_name")
    assert(cfg.sparkConf("spark.sql.shuffle.partitions") == "16")
  }

  test("toml config parses the same surface (reference accepts both formats)") {
    val cfg = Config.parseToml(
      """# roapi-style config, toml spelling
        |disable_read_only = true
        |reload_interval = 45
        |response_format = "Csv"
        |
        |[addr]
        |http = "127.0.0.1:8080"
        |postgres = "127.0.0.1:5433"
        |
        |[[tables]]
        |name = "cities"
        |uri = "/data/cities.csv"
        |reload_interval = 30
        |
        |[tables.option]
        |format = "csv"
        |has_header = "false"
        |
        |[[tables]]
        |name = "li"
        |uri = "/data/lineitem.parquet"
        |option = { format = "parquet", use_memory_table = true }
        |
        |[[kvstores]]
        |name = "names"
        |uri = "/data/customer.parquet"
        |key = "c_name"
        |value = "c_custkey"
        |
        |[spark]
        |"spark.sql.shuffle.partitions" = "16"
        |
        |[flight_sql_config.tls]
        |cert = "/p/server.pem"
        |key = "/p/server.key"
        |client_ca = "/p/ca.pem"
        |""".stripMargin)
    assert(cfg.httpAddr.contains(("127.0.0.1", 8080)))
    assert(cfg.pgAddr.contains(("127.0.0.1", 5433)))
    assert(cfg.disableReadOnly && cfg.reloadIntervalSec.contains(45L))
    assert(cfg.responseFormat === graft.encoding.Encoders.Csv)
    assert(cfg.tables.map(_.name) == Seq("cities", "li"))
    assert(cfg.tables.head.resolvedFormat == "csv")
    assert(cfg.tables.head.options("has_header") == "false")
    assert(cfg.tables.head.reloadIntervalSec.contains(30L))
    assert(cfg.tables(1).memTable.contains(true))
    assert(cfg.kvs.head.key == "c_name")
    assert(cfg.sparkConf("spark.sql.shuffle.partitions") == "16")
    assert(cfg.flightTls.exists(_.clientCa == "/p/ca.pem"))
  }

  test("flags apply over the config regardless of position; missing operands fail") {
    // clap applies flags position-independently over the config; a -d
    // BEFORE --config must not be clobbered by the load (review finding)
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yml")
    java.nio.file.Files.writeString(f, "addr:\n  http: 127.0.0.1:8080\n")
    val cfg = ServerMain.buildConfig(Array("-d", "--config", f.toString))
    assert(cfg.disableReadOnly)
    assert(cfg.httpAddr.contains(("127.0.0.1", 8080)))
    val e = intercept[IllegalArgumentException](
      ServerMain.buildConfig(Array("--addr-http")))
    assert(e.getMessage.contains("missing value"))
  }

  test("toml natural dotted spark keys flatten to the session conf form") {
    // `spark.sql.shuffle.partitions = "32"` parses as nested TOML tables;
    // the conf block must flatten to the dotted key, never a stringified
    // map under `spark` (review finding)
    val cfg = Config.parseToml(
      """[spark]
        |spark.sql.shuffle.partitions = "32"
        |""".stripMargin)
    assert(cfg.sparkConf === Map("spark.sql.shuffle.partitions" -> "32"))
  }

  test("server CLI flags mirror the reference binary") {
    val cfg = ServerMain.buildConfig(Array(
      "cities=/data/cities.csv,format=csv",
      "--addr-http", "0.0.0.0:9000",
      "--addr-postgres", "0.0.0.0:5439",
      "--addr-flight-sql", "0.0.0.0:32010",
      "-d", "-r", "60", "-f", "Parquet"))
    assert(cfg.tables.map(_.name) == Seq("cities"))
    assert(cfg.httpAddr.contains(("0.0.0.0", 9000)))
    assert(cfg.pgAddr.contains(("0.0.0.0", 5439)))
    assert(cfg.flightAddr.contains(("0.0.0.0", 32010)))
    assert(cfg.disableReadOnly && cfg.reloadIntervalSec.contains(60L))
    assert(cfg.responseFormat === graft.encoding.Encoders.Parquet)
    // the reference refuses reload in read-only mode (config.rs:228-233)
    val e = intercept[IllegalArgumentException](
      ServerMain.buildConfig(Array("-r", "60")))
    assert(e.getMessage.contains("read-only"))
  }

  test("per-table batch_size is accepted for reference-config compatibility") {
    // the reference parses batch_size on every table (mod.rs:569-572);
    // Spark sizes partitions by bytes, so the value is recorded as a no-op
    val cfg = Config.parse(
      """tables:
        |  - name: t1
        |    uri: /data/t1.parquet
        |    batch_size: 4096
        |  - name: t2
        |    uri: /data/t2.csv
        |""".stripMargin)
    assert(cfg.tables.head.batchSize.contains(4096))
    assert(cfg.tables(1).batchSize.isEmpty)
    // and via the CLI/URI option grammar
    val src = graft.sources.TableSource.parseUriArg("t3=/d/t3.parquet,batch_size=1024")
    assert(src.batchSize.contains(1024))
    assert(!src.options.contains("batch_size"), "must not leak to the reader options")
  }

  test("--flag=value spelling parses; unknown flags are rejected, not guessed") {
    // round-10 advice: `--addr-http=X --config y` used to swallow --config
    // in pass 1 and then register "--addr-http" as a table in pass 2
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".yml")
    java.nio.file.Files.writeString(f, "disable_read_only: true\n")
    val cfg = ServerMain.buildConfig(Array(
      "--addr-http=0.0.0.0:9000", "--config", f.toString))
    assert(cfg.httpAddr.contains(("0.0.0.0", 9000)))
    assert(cfg.disableReadOnly, "config file after an =-form flag must load")
    assert(cfg.tables.isEmpty)
    val e = intercept[IllegalArgumentException](
      ServerMain.buildConfig(Array("--no-such-flag", "x")))
    assert(e.getMessage.contains("unknown flag"))
    // a boolean flag given an =value must error, not leak a stray token
    // that pass 2 would parse as a table arg (review finding)
    val e2 = intercept[IllegalArgumentException](
      ServerMain.buildConfig(Array("--disable-read-only=true")))
    assert(e2.getMessage.contains("takes no value"))
  }

  test("servers bind the configured host, not hard-coded loopback") {
    // round-10 advice: --addr-http 0.0.0.0:9000 used to silently bind
    // 127.0.0.1. Bind all-interfaces on an ephemeral port and verify the
    // wildcard took effect.
    val eng = new Engine(graft.GraftSession.get(), readOnly = true)
    val app = new HttpApp(eng, 0, "0.0.0.0").start()
    try {
      val s = new java.net.Socket()
      // reachable via a non-loopback spelling of localhost only when bound 0.0.0.0
      s.connect(new java.net.InetSocketAddress("127.0.0.2", app.boundPort), 2000)
      s.close()
    } finally app.stop()
  }

  test("empty config is valid") {
    val cfg = Config.parse("")
    assert(cfg.tables.isEmpty && cfg.httpAddr.isEmpty)
    assert(cfg.flightAddr.isEmpty && cfg.flightAuthBasic.isEmpty)
  }

  // reference: roapi/tests/config_test.rs:12-17 — the datafusion engine-conf
  // block with a dotted sql_parser.dialect key (test_datafusion_config.yml
  // shape), applied to the Spark session where an equivalent exists
  test("sql_parser.dialect config passes through and unsupported dialects fail") {
    val cfg = Config.parse(
      """datafusion:
        |  sql_parser.dialect: "Hive"
        |  explain.physical_plan_only: true
        |  optimizer.max_passes: 10
        |  execution.batch_size: 100
        |""".stripMargin)
    assert(cfg.sqlDialect.contains("Hive"))
    assert(cfg.datafusionConf("optimizer.max_passes") == "10")
    Config.applySqlDialect(spark, "Hive") // no-op: Spark SQL is HiveQL-derived
    // nested form parses to the same dotted key
    val nested = Config.parse(
      """datafusion:
        |  sql_parser:
        |    dialect: ansi
        |""".stripMargin)
    assert(nested.sqlDialect.contains("ansi"))
    // ansi maps onto spark.sql.ansi.enabled
    val before = spark.conf.get("spark.sql.ansi.enabled")
    try {
      Config.applySqlDialect(spark, "ansi")
      assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    } finally spark.conf.set("spark.sql.ansi.enabled", before)
    // a dialect with no Spark equivalent errors loudly, naming it
    val e = intercept[IllegalArgumentException](Config.applySqlDialect(spark, "clickhouse"))
    assert(e.getMessage.contains("clickhouse"))
  }

  // reference: addr.flight_sql + flight_sql_config (roapi/src/config.rs)
  test("flight_sql addr and auth config parse") {
    val cfg = Config.parse(
      """addr:
        |  flight_sql: 127.0.0.1:32010
        |flight_sql_config:
        |  auth_basic:
        |    username: flight_user
        |    password: flight_password
        |  auth_token: secret-token
        |""".stripMargin)
    assert(cfg.flightAddr.contains(("127.0.0.1", 32010)))
    assert(cfg.flightAuthBasic.contains(("flight_user", "flight_password")))
    assert(cfg.flightAuthToken.contains("secret-token"))
  }

  test("disable_read_only and top-level reload_interval parse") {
    val cfg = Config.parse(
      """disable_read_only: true
        |reload_interval: 30
        |""".stripMargin)
    assert(cfg.disableReadOnly)
    assert(cfg.reloadIntervalSec === Some(30L))
    assert(!Config.parse("").disableReadOnly)
    assert(Config.parse("").reloadIntervalSec === None)
  }

  test("response_format parses the reference's variants; unknown values fail") {
    import graft.encoding.Encoders
    assert(Config.parse("").responseFormat === Encoders.Json)
    assert(Config.parse("response_format: Csv").responseFormat === Encoders.Csv)
    assert(Config.parse("response_format: ArrowStream").responseFormat === Encoders.ArrowStream)
    assert(Config.parse("response_format: arrow_file").responseFormat === Encoders.ArrowFile)
    assert(Config.parse("response_format: application/parquet").responseFormat === Encoders.Parquet)
    val e = intercept[IllegalArgumentException](Config.parse("response_format: yaml"))
    assert(e.getMessage.contains("response_format"))
  }
}
