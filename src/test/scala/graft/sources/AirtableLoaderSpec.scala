package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Airtable loader (reference roadmap box README.md:320) against a local mock
  * of the public `GET /v0/{base}/{table}` API — pagination via the `offset`
  * cursor, Bearer auth, sparse `fields` objects, and the JSON typing lattice. */
class AirtableLoaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.get()
  private var server: HttpServer = _
  private var base: String = _
  @volatile private var sawPageSizes: List[String] = Nil

  // Page 1: two records, sparse fields, arrays; hands back an offset cursor.
  private val page1 =
    """{"records":[
      |  {"id":"rec001","createdTime":"2024-01-05T10:00:00.000Z",
      |   "fields":{"Name":"alice","Score":42,"Active":true,
      |             "Tags":["red","blue"],"Meta":{"k":1}}},
      |  {"id":"rec002","createdTime":"2024-01-06T11:00:00.000Z",
      |   "fields":{"Name":"bob","Score":7.5,"Tags":["green"]}}
      |],"offset":"itrCURSOR/rec002"}""".stripMargin

  // Page 2: a field (`Note`) unseen on page 1; `Active` missing here; an
  // explicit JSON-null offset must read as "last page", not a cursor.
  private val page2 =
    """{"records":[
      |  {"id":"rec003","createdTime":"2024-01-07T12:00:00.000Z",
      |   "fields":{"Name":"carol","Score":-3,"Note":"vip","Tags":["x",null]}}
      |],"offset":null}""".stripMargin

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v0/appBASE/People", (ex: HttpExchange) => {
      if (!Option(ex.getRequestHeaders.getFirst("Authorization"))
            .contains("Bearer patTOKEN")) {
        ex.sendResponseHeaders(401, -1); ex.close()
      } else {
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split('&').flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _           => None
        }).toMap
        params.get("pageSize").foreach(p => sawPageSizes = p :: sawPageSizes)
        val body = if (params.get("offset").contains("itrCURSOR/rec002")) page2
                   else page1
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length)
        ex.getResponseBody.write(b); ex.close()
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def source(opts: Map[String, String] = Map.empty) =
    TableSource("people", "airtable://appBASE/People",
      options = Map("api_base" -> base, "auth_token" -> "patTOKEN") ++ opts)

  test("uri with no extension resolves to the airtable format") {
    assert(source().resolvedFormat == "airtable")
  }

  test("paginates via the offset cursor and unions sparse field sets") {
    val df = Loaders.load(spark, source())
    assert(df.count() == 3)
    assert(df.columns.toSeq ==
      Seq("_id", "_created_time", "Name", "Score", "Active", "Tags", "Meta", "Note"))
    // int + float votes coerce to double; bool stays bool; Tags is array<string>
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("Score") == DoubleType)
    assert(byName("Active") == BooleanType)
    assert(byName("Tags") == ArrayType(StringType))
    assert(byName("Meta") == StringType) // object -> raw json text
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("rec001").getAs[Double]("Score") == 42.0)
    assert(rows("rec001").getAs[scala.collection.Seq[String]]("Tags").toSeq
      == Seq("red", "blue"))
    assert(rows("rec001").getAs[String]("Meta").contains("\"k\":1"))
    assert(rows("rec002").getAs[Any]("Active") == null)   // omitted field -> null
    assert(rows("rec003").getAs[String]("Note") == "vip") // page-2-only column
    // null array element survives as SQL NULL, not the string "null"
    assert(rows("rec003").getAs[scala.collection.Seq[String]]("Tags").toSeq
      == Seq("x", null))
  }

  test("airtable scheme wins over an extension-looking table name") {
    assert(TableSource("t", "airtable://appX/Orders.csv").resolvedFormat == "airtable")
  }

  test("page_size and view options are forwarded; bad token rejected") {
    sawPageSizes = Nil
    Loaders.load(spark, source(Map("page_size" -> "2", "view" -> "Grid view")))
    assert(sawPageSizes.forall(_ == "2") && sawPageSizes.size == 2)
    val bad = intercept[IllegalArgumentException] {
      Loaders.load(spark, source(Map("auth_token" -> "wrong")))
    }
    assert(bad.getMessage.contains("HTTP 401"))
  }

  test("rejects malformed uris and missing auth") {
    intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("t", "airtable://justbase",
        options = Map("auth_token" -> "x")))
    }
    intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("t", "airtable://appBASE/People",
        options = Map("api_base" -> base)))
    }
  }
}
