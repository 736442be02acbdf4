package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.TableSource

/** HTTP/2 parity: the reference's axum server speaks h2 (pinned by its HTTP/2
  * API test in roapi/tests/api_test.rs); here the same API must answer over
  * h2c — upgrade, prior knowledge, and plain-1.1 fallback all on one port —
  * with bodies identical to the HTTP/1.1 frontend's. */
class Http2AppSpec extends SparkSpec {

  private lazy val engine = {
    val e = new Engine(spark, readOnly = true)
    e.registerTable(TableSource("h2_region", s"$sf0001/region.parquet", Some("parquet")))
    e
  }
  private lazy val app = new Http2App(engine, 0).start()
  private lazy val h1app = new HttpApp(engine, 0).start()

  private def client(v: HttpClient.Version) =
    HttpClient.newBuilder().version(v).build()

  private def get(c: HttpClient, port: Int, path: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def postSql(c: HttpClient, port: Int, sql: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/sql"))
      .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET over h2c upgrade negotiates HTTP/2 and serves the API") {
    val c = client(HttpClient.Version.HTTP_2)
    val r = get(c, app.boundPort, "/api/version")
    assert(r.version() === HttpClient.Version.HTTP_2)
    assert(r.statusCode() === 200)
    assert(r.body() === "\"0.1.0\"")
  }

  test("POST with a body as the FIRST request on a fresh connection succeeds") {
    // the h2c Upgrade request itself carries the SQL body here — a
    // zero-length aggregation bound would 413 it (review finding)
    val c = client(HttpClient.Version.HTTP_2)
    val r = postSql(c, app.boundPort, "SELECT count(*) AS n FROM h2_region")
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"n\":5"))
  }

  test("POST /api/sql over an established h2 connection matches the 1.1 body") {
    val c = client(HttpClient.Version.HTTP_2)
    get(c, app.boundPort, "/health") // upgrade happens here; the pool reuses h2
    val sql = "SELECT r_regionkey, r_name FROM h2_region ORDER BY r_regionkey"
    val r2 = postSql(c, app.boundPort, sql)
    assert(r2.version() === HttpClient.Version.HTTP_2)
    val r1 = postSql(client(HttpClient.Version.HTTP_1_1), h1app.boundPort, sql)
    assert(r2.body() === r1.body())
    assert(r2.body().startsWith("[{\"r_regionkey\":0"))
  }

  test("CORS headers ride both h2 and the 1.1-fallback transports") {
    // same permissive layer as the HTTP/1.1 frontend
    // (roapi/src/server/http/mod.rs:61-66): allow-origin on every
    // response, preflight OPTIONS 204 with the methods list
    val c2 = client(HttpClient.Version.HTTP_2)
    val r2 = postSql(c2, app.boundPort, "SELECT count(*) AS n FROM h2_region")
    assert(r2.version() === HttpClient.Version.HTTP_2)
    assert(r2.headers().firstValue("access-control-allow-origin").get == "*")
    val c1 = client(HttpClient.Version.HTTP_1_1)
    val r1 = postSql(c1, app.boundPort, "SELECT count(*) AS n FROM h2_region")
    assert(r1.headers().firstValue("Access-Control-Allow-Origin").get == "*")
    val pre = c2.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${app.boundPort}/api/sql"))
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody())
      .header("Origin", "http://elsewhere.example")
      .header("Access-Control-Request-Method", "POST").build(),
      HttpResponse.BodyHandlers.ofString())
    assert(pre.statusCode() === 204)
    assert(pre.headers().firstValue("access-control-allow-origin").get == "*")
    assert(pre.headers().firstValue("access-control-allow-methods").get.contains("POST"))
  }

  test("REST route with query params and error bodies work over h2") {
    val c = client(HttpClient.Version.HTTP_2)
    val ok = get(c, app.boundPort, "/api/tables/h2_region?limit=2&columns=r_name")
    assert(ok.version() === HttpClient.Version.HTTP_2)
    assert(ok.body() === """[{"r_name":"AFRICA"},{"r_name":"AMERICA"}]""")
    // unknown kv STORE is the reference's 400 invalid_kv_name
    // (columnq.rs:359-363), distinct from a 404 missing key
    val err = get(c, app.boundPort, "/api/kv/nope/k")
    assert(err.statusCode() === 400)
    assert(err.body().contains("\"error\":\"invalid_kv_name\""))
  }

  test("a multi-megabyte streamed result arrives intact over h2 DATA frames") {
    val c = client(HttpClient.Version.HTTP_2)
    get(c, app.boundPort, "/health") // establish h2
    // ~60k rows of CSV: far beyond one DATA frame and the default h2
    // connection flow-control window, so chunking + window updates are real
    val sql = "SELECT id, id * 2 AS dbl, repeat('x', 32) AS pad FROM range(60000) ORDER BY id"
    val r2 = c.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${app.boundPort}/api/sql"))
      .header("Accept", "application/csv")
      .POST(HttpRequest.BodyPublishers.ofString(sql)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r2.version() === HttpClient.Version.HTTP_2)
    val r1 = postSql(client(HttpClient.Version.HTTP_1_1), h1app.boundPort, sql) // json; only for row count sanity
    assert(r2.body().linesIterator.size === 60001) // header + rows
    assert(r2.body().startsWith("id,dbl,pad"))
    assert(r2.body().length > 2 * 1024 * 1024)
    assert(r1.statusCode() === 200)
  }

  test("plain HTTP/1.1 clients are served on the same port") {
    val c = client(HttpClient.Version.HTTP_1_1)
    val r = get(c, app.boundPort, "/api/version")
    assert(r.version() === HttpClient.Version.HTTP_1_1)
    assert(r.body() === "\"0.1.0\"")
  }

  test("h2c prior knowledge: the server answers the raw client preface with SETTINGS") {
    val sock = new java.net.Socket("127.0.0.1", app.boundPort)
    try {
      val out = sock.getOutputStream
      out.write("PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(UTF_8))
      // empty client SETTINGS frame (len=0, type=0x4, flags=0, stream=0)
      out.write(Array[Byte](0, 0, 0, 4, 0, 0, 0, 0, 0))
      out.flush()
      val in = sock.getInputStream
      val head = new Array[Byte](9)
      var n = 0
      while (n < 9) {
        val k = in.read(head, n, 9 - n)
        assert(k >= 0, "connection closed before a SETTINGS frame arrived")
        n += k
      }
      assert(head(3) === 4, s"first frame type must be SETTINGS, got ${head(3)}")
    } finally sock.close()
  }
}
