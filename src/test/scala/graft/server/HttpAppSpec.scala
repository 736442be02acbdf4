package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.sources.TableSource

class HttpAppSpec extends SparkSpec {

  private lazy val engine = {
    val e = new Engine(spark, readOnly = true)
    e.registerTable(TableSource("nation", s"$sf0001/nation.parquet", Some("parquet")))
    e.registerTable(TableSource("region", s"$sf0001/region.parquet", Some("parquet")))
    e.registerKv("region_names",
      TableSource("region_kv", s"$sf0001/region.parquet", Some("parquet")),
      keyCol = "r_name", valueCol = "r_regionkey")
    e
  }
  private lazy val app = new HttpApp(engine, 0).start()
  private lazy val base = s"http://127.0.0.1:${app.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String, accept: Option[String] = None): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + path)).GET()
    accept.foreach(a => b.header("Accept", a))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /api/sql returns JSON array of objects") {
    val r = post("/api/sql", "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 2")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get == "application/json")
    assert(r.body().startsWith("""[{"r_regionkey":0,"r_name":"""))
  }

  test("CORS: allow-origin on /api/sql responses, preflight OPTIONS answers 204") {
    // the reference wraps every route in a permissive CORS layer
    // (roapi/src/server/http/mod.rs:61-66) — without it a browser page on
    // another origin cannot call the API at all
    val r = post("/api/sql", "SELECT r_regionkey FROM region LIMIT 1")
    assert(r.headers().firstValue("Access-Control-Allow-Origin").get == "*")
    val pre = client.send(HttpRequest.newBuilder(URI.create(base + "/api/sql"))
      .method("OPTIONS", HttpRequest.BodyPublishers.noBody())
      .header("Origin", "http://elsewhere.example")
      .header("Access-Control-Request-Method", "POST").build(),
      HttpResponse.BodyHandlers.ofString())
    assert(pre.statusCode() == 204)
    assert(pre.headers().firstValue("Access-Control-Allow-Origin").get == "*")
    assert(pre.headers().firstValue("Access-Control-Allow-Methods").get.contains("POST"))
    assert(pre.headers().firstValue("Access-Control-Allow-Headers").isPresent)
  }

  test("unknown tables answer the reference's invalid_table error") {
    // columnq/src/error.rs:193-198, via REST and GraphQL alike
    val rest = get("/api/tables/never_registered")
    assert(rest.statusCode() == 400)
    assert(rest.body().contains(""""error":"invalid_table""""))
    assert(rest.body().contains("Failed to load table never_registered"))
    val gql = post("/api/graphql", "{ never_registered { x } }")
    assert(gql.statusCode() == 400)
    assert(gql.body().contains(""""error":"invalid_table""""))
  }

  test("GET /api/tables/{t} applies REST params") {
    val r = get("/api/tables/nation?filter[n_regionkey]=0&columns=n_name&sort=n_name&limit=2")
    assert(r.statusCode() == 200)
    val names = """"n_name":"([^"]+)"""".r.findAllMatchIn(r.body()).map(_.group(1)).toSeq
    assert(names.length == 2 && names == names.sorted)
  }

  test("POST /api/graphql") {
    val r = post("/api/graphql",
      """{ region(sort: [{field: "r_regionkey", order: "desc"}], limit: 1) { r_regionkey r_name } }""")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""r_regionkey":4"""))
  }

  test("ACCEPT negotiation: csv body with header row") {
    val r = get("/api/tables/region?sort=r_regionkey&limit=2", Some("application/csv"))
    assert(r.headers().firstValue("Content-Type").get == "application/csv")
    val lines = r.body().trim.split('\n')
    assert(lines.head == "r_regionkey,r_name")
    assert(lines.length == 3)
  }

  test("ACCEPT negotiation: parquet and arrow stream round-trip") {
    val pq = client.send(HttpRequest.newBuilder(
      URI.create(base + "/api/tables/region?limit=3"))
      .header("Accept", "application/parquet").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(pq.body().take(4).sameElements("PAR1".getBytes))
    val ar = client.send(HttpRequest.newBuilder(
      URI.create(base + "/api/tables/region?limit=3"))
      .header("Accept", "application/vnd.apache.arrow.stream").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(ar.body().length > 0)
  }

  test("GET /api/schema/{t} returns arrow-shaped fields") {
    val r = get("/api/schema/region")
    assert(r.body() ==
      """{"fields":[{"name":"r_regionkey","data_type":"Int32","nullable":true},{"name":"r_name","data_type":"Utf8","nullable":true}]}""")
    // unknown table: the reference's 404 "invalid table name"
    // (roapi/src/context.rs:155-164)
    val unknown = get("/api/schema/never_registered")
    assert(unknown.statusCode() == 404)
    assert(unknown.body().contains("invalid table name"))
  }

  test("GET /api/pipeline lists the operator catalog") {
    val r = get("/api/pipeline")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get == "application/json")
    assert(r.body().contains("\"dedup_exact\""))
    assert(r.body().contains("\"q1_pricing_summary\""))
  }

  test("GET /api/pipeline/{name} runs a catalog query with ACCEPT negotiation") {
    val dir = java.net.URLEncoder.encode(sf0001, "UTF-8")
    val r = get(s"/api/pipeline/doc_quality?dir=$dir")
    assert(r.statusCode() == 200)
    assert(r.body().startsWith("""[{"doc_id":"""))
    val csv = get(s"/api/pipeline/doc_quality?dir=$dir", Some("application/csv"))
    assert(csv.headers().firstValue("Content-Type").get == "application/csv")
    assert(csv.body().trim.split('\n').head.startsWith("doc_id,"))
  }

  test("pipeline route: unknown name is 404, missing dir is 400") {
    val unk = get("/api/pipeline/no_such_query?dir=x")
    assert(unk.statusCode() == 404)
    assert(unk.body().contains("not_found"))
    // this engine has no configured pipelineDir, so dir is required
    val nodir = get("/api/pipeline/doc_quality")
    assert(nodir.statusCode() == 400)
    assert(nodir.body().contains("bad_request"))
  }

  test("pipeline route: a configured pipeline dir CONSTRAINS `dir` overrides") {
    // round-9 advice: `dir` is a client-supplied filesystem path — when a
    // root is configured it must be a constraint, not just a default
    val e2 = new Engine(spark, readOnly = true, pipelineDir = Some(sf0001))
    val app2 = new HttpApp(e2, 0).start()
    try {
      val base2 = s"http://127.0.0.1:${app2.boundPort}"
      def get2(path: String) = client.send(
        HttpRequest.newBuilder(URI.create(base2 + path)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      // no dir param: the configured root serves
      assert(get2("/api/pipeline/doc_quality").statusCode() == 200)
      // dir under the root (here: the root itself) is allowed
      val sameDir = java.net.URLEncoder.encode(sf0001, "UTF-8")
      assert(get2(s"/api/pipeline/doc_quality?dir=$sameDir").statusCode() == 200)
      // a path outside the root — including a ../ escape — is refused
      val outside = java.net.URLEncoder.encode("/root/testdata/sf0.01", "UTF-8")
      val r = get2(s"/api/pipeline/doc_quality?dir=$outside")
      assert(r.statusCode() == 403 && r.body().contains("forbidden"))
      val escape = java.net.URLEncoder.encode(s"$sf0001/../sf0.01", "UTF-8")
      assert(get2(s"/api/pipeline/doc_quality?dir=$escape").statusCode() == 403)
    } finally app2.stop()
  }

  test("response_format config sets the no-ACCEPT default encoder") {
    // reference: roapi/src/api/mod.rs:25-35 — no/unknown ACCEPT falls back
    // to the configured response_format; `*/*` is Json regardless
    val e2 = new Engine(spark, readOnly = true,
      responseFormat = graft.encoding.Encoders.Csv)
    e2.registerTable(TableSource("rf_region", s"$sf0001/region.parquet", Some("parquet")))
    val app2 = new HttpApp(e2, 0).start()
    try {
      val base2 = s"http://127.0.0.1:${app2.boundPort}"
      def get2(path: String, accept: Option[String]) = {
        val b = HttpRequest.newBuilder(URI.create(base2 + path)).GET()
        accept.foreach(a => b.header("Accept", a))
        client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      val noAccept = get2("/api/tables/rf_region?limit=1", None)
      assert(noAccept.headers().firstValue("Content-Type").get == "application/csv")
      assert(noAccept.body().startsWith("r_regionkey,r_name"))
      val unknown = get2("/api/tables/rf_region?limit=1", Some("text/html"))
      assert(unknown.headers().firstValue("Content-Type").get == "application/csv")
      // explicit json still negotiates json; */* is Json per the reference
      assert(get2("/api/tables/rf_region?limit=1", Some("application/json"))
        .headers().firstValue("Content-Type").get == "application/json")
      assert(get2("/api/tables/rf_region?limit=1", Some("*/*"))
        .headers().firstValue("Content-Type").get == "application/json")
    } finally app2.stop()
  }

  test("GET /api/kv/{name}/{key} and 404 error shape") {
    val hit = get("/api/kv/region_names/ASIA")
    assert(hit.statusCode() == 200)
    val miss = get("/api/kv/region_names/NOWHERE")
    assert(miss.statusCode() == 404)
    assert(miss.body().contains(""""code":404""") && miss.body().contains(""""error":"not_found""""))
    // unknown STORE is the reference's 400 invalid_kv_name, not a 404
    val badStore = get("/api/kv/no_such_store/k")
    assert(badStore.statusCode() == 400)
    assert(badStore.body().contains(""""error":"invalid_kv_name""""))
    assert(badStore.body().contains("doesn't exist"))
  }

  test("read-only mode rejects register and drop with the reference's 403 shape") {
    // roapi/src/error.rs:92-98: FORBIDDEN + this exact message
    val r = post("/api/table", """[{"tableName": "x", "uri": "/tmp/x.csv"}]""")
    assert(r.statusCode() == 403 && r.body().contains("read_only_mode"))
    assert(r.body().contains("Write operation is not allowed in read-only mode"))
    val d = post("/api/tables/drop", """{"tableName": "region"}""")
    assert(d.statusCode() == 403)
  }

  test("GET /ui serves the embedded console; unknown assets 404") {
    val ui = get("/ui")
    assert(ui.statusCode() == 200)
    assert(ui.headers().firstValue("Content-Type").get == "text/html")
    // the page drives the same wire API the reference UI does
    assert(ui.body().contains("/api/sql") && ui.body().contains("/api/schema"))
    assert(get("/ui/index.html").body() == ui.body())
    val miss = get("/ui/missing.js")
    assert(miss.statusCode() == 404 && miss.body() == "404 Not Found")
  }

  test("bad SQL yields query_execution error json") {
    val r = post("/api/sql", "SELECT FROM nowhere")
    assert(r.statusCode() == 400)
    assert(r.body().contains(""""code":400"""))
  }

  test("every handled request fires one access-log line (incl. errors)") {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val prev = Routes.accessLog
    Routes.accessLog = l => { lines.add(l); () }
    try {
      assert(get("/health").statusCode() == 200)
      assert(get("/api/nope").statusCode() == 404)
      val got = lines.toArray(Array.empty[String])
      assert(got.exists(_.matches("GET /health 200 \\d+us")), got.mkString("; "))
      assert(got.exists(_.matches("GET /api/nope 404 \\d+us")), got.mkString("; "))
    } finally Routes.accessLog = prev
  }
}
