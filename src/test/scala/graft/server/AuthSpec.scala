package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import graft.SparkSpec
import graft.sources.TableSource

/** The HTTP authentication layer — the reference's unshipped roadmap item
  * (README.md:334) implemented over every HTTP route: Basic users + Bearer
  * tokens, /health and CORS preflight stay open, 401s carry the standard
  * error JSON and WWW-Authenticate. */
class AuthSpec extends SparkSpec {

  private lazy val engine = {
    val e = new Engine(spark, readOnly = true,
      httpAuthBasic = Map("alice" -> "s3cret", "bob" -> "hunter2"),
      httpAuthBearer = Set("tok-123"))
    e.registerTable(TableSource("auth_region", s"$sf0001/region.parquet",
      Some("parquet")))
    e
  }
  private lazy val app = new HttpApp(engine, 0).start()
  private lazy val base = s"http://127.0.0.1:${app.boundPort}"
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String, auth: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path)).GET()
    auth.foreach(a => b.header("Authorization", a))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def basic(u: String, p: String): String =
    "Basic " + Base64.getEncoder.encodeToString(s"$u:$p".getBytes("UTF-8"))

  test("unauthenticated requests get 401 + WWW-Authenticate; /health stays open") {
    val r = get("/api/tables/auth_region")
    assert(r.statusCode() == 401)
    assert(r.body().contains("unauthorized"))
    assert(r.headers().firstValue("WWW-Authenticate").orElse("").startsWith("Basic"))
    assert(get("/health").statusCode() == 200)
    // CORS preflight must stay open or browsers can never even ask
    val pre = client.send(HttpRequest.newBuilder(URI.create(base + "/api/sql"))
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(pre.statusCode() == 204)
  }

  test("valid Basic and Bearer credentials pass; invalid ones do not") {
    assert(get("/api/tables/auth_region?limit=1",
      Some(basic("alice", "s3cret"))).statusCode() == 200)
    assert(get("/api/tables/auth_region?limit=1",
      Some(basic("bob", "hunter2"))).statusCode() == 200)
    assert(get("/api/tables/auth_region?limit=1",
      Some("Bearer tok-123")).statusCode() == 200)
    // wrong password / unknown user / unknown token / malformed base64
    assert(get("/api/tables/auth_region", Some(basic("alice", "wrong"))).statusCode() == 401)
    assert(get("/api/tables/auth_region", Some(basic("mallory", "s3cret"))).statusCode() == 401)
    assert(get("/api/tables/auth_region", Some("Bearer nope")).statusCode() == 401)
    assert(get("/api/tables/auth_region", Some("Basic !!!not-base64")).statusCode() == 401)
    assert(get("/api/tables/auth_region", Some("Negotiate blah")).statusCode() == 401)
  }

  test("POST /api/sql honors auth; an open engine stays open") {
    val post = HttpRequest.newBuilder(URI.create(base + "/api/sql"))
      .header("Authorization", basic("alice", "s3cret"))
      .POST(HttpRequest.BodyPublishers.ofString(
        "SELECT count(*) AS n FROM auth_region")).build()
    val r = client.send(post, HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200 && r.body().contains("\"n\":5"), r.body())
    val noAuth = client.send(HttpRequest.newBuilder(URI.create(base + "/api/sql"))
      .POST(HttpRequest.BodyPublishers.ofString("SELECT 1")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(noAuth.statusCode() == 401)
    // an engine with no auth configured serves without credentials
    val open = new Engine(spark, readOnly = true)
    open.registerTable(TableSource("auth_open", s"$sf0001/region.parquet",
      Some("parquet")))
    val openApp = new HttpApp(open, 0).start()
    try {
      val rr = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${openApp.boundPort}/api/tables/auth_open"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(rr.statusCode() == 200)
    } finally openApp.stop()
  }

  test("h2c transport enforces the same layer") {
    val h2 = new Http2App(engine, 0).start()
    try {
      val h2c = HttpClient.newBuilder()
        .version(HttpClient.Version.HTTP_2).build()
      def send(auth: Option[String]): HttpResponse[String] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${h2.boundPort}/api/sql"))
          .POST(HttpRequest.BodyPublishers.ofString(
            "SELECT count(*) AS n FROM auth_region"))
        auth.foreach(a => b.header("Authorization", a))
        h2c.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      val unauth = send(None)
      assert(unauth.statusCode() == 401)
      // RFC 7235: the h2c transport must carry the challenge too
      assert(unauth.headers().firstValue("www-authenticate").orElse("")
        .startsWith("Basic"))
      assert(send(Some("Bearer tok-123")).statusCode() == 200)
    } finally h2.stop()
  }

  test("the auth: config block parses basic users and bearer tokens") {
    val yml =
      """auth:
        |  basic:
        |    alice: s3cret
        |  bearer:
        |    - tok-9
        |tables: []
        |""".stripMargin
    val cfg = Config.parse(yml)
    assert(cfg.httpAuthBasic == Map("alice" -> "s3cret"))
    assert(cfg.httpAuthBearer == Seq("tok-9"))
  }
}
