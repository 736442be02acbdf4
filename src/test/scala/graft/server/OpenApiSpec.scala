package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec
import graft.sources.TableSource

/** `/api/openapi` — the auto-generated OpenAPI 3.0 doc for the REST layer
  * (the reference's unshipped roadmap item): paths per registered table
  * with the real query grammar, component schemas from live Spark
  * schemas, and liveness against register/drop. */
class OpenApiSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private lazy val engine = {
    val e = new Engine(spark, readOnly = false)
    e.registerTable(TableSource("oa_region", s"$sf0001/region.parquet",
      Some("parquet")))
    e.registerTable(TableSource("oa_orders", s"$sf0001/orders.parquet",
      Some("parquet")))
    e
  }
  private lazy val app = new HttpApp(engine, 0).start()

  private def fetch(): com.fasterxml.jackson.databind.JsonNode = {
    val r = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${app.boundPort}/api/openapi")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").orElse("")
      .startsWith("application/json"))
    mapper.readTree(r.body())
  }

  test("doc carries table paths, the REST grammar, and typed schemas") {
    val doc = fetch()
    assert(doc.get("openapi").asText() == "3.0.3")
    val paths = doc.get("paths")
    assert(paths.has("/api/sql") && paths.has("/api/graphql") &&
      paths.has("/api/schema"))
    val rg = paths.get("/api/tables/oa_region").get("get")
    val paramNames = rg.get("parameters").elements()
    val names = Iterator.continually(paramNames).takeWhile(_.hasNext)
      .map(_.next().get("name").asText()).toSet
    assert(Set("columns", "sort", "limit", "page").subsetOf(names), names)
    assert(names.contains("filter[r_regionkey]") && names.contains("filter[r_name]"))
    // component schema types come from the live Spark schema
    val region = doc.get("components").get("schemas").get("oa_region")
    assert(region.get("type").asText() == "object")
    assert(region.get("properties").get("r_regionkey").get("type").asText() == "integer")
    assert(region.get("properties").get("r_name").get("type").asText() == "string")
    // orders has a timestamp-typed or date-typed column mapped to string
    val orders = doc.get("components").get("schemas").get("oa_orders")
    assert(orders.get("properties").has("o_orderdate"))
    // the 200 response references the component schema
    val ref = rg.get("responses").get("200").get("content")
      .get("application/json").get("schema").get("items").get("$ref").asText()
    assert(ref == "#/components/schemas/oa_region")
  }

  test("the doc tracks the live registry across register and drop") {
    assert(fetch().get("paths").has("/api/tables/oa_orders"))
    engine.dropTable("oa_orders")
    val doc = fetch()
    assert(!doc.get("paths").has("/api/tables/oa_orders"))
    assert(doc.get("paths").has("/api/tables/oa_region"))
    engine.registerTable(TableSource("oa_orders", s"$sf0001/orders.parquet",
      Some("parquet"))) // restore for other tests
  }
}
