package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The reference's Sheets v4 flow + parse-vote typing lattice against a local
  * mock of the API (columnq/src/table/google_spreadsheets.rs:106-183,260-311;
  * egress is blocked, so the HTTP shapes are served from a JDK HttpServer). */
class GsheetLoaderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.get()
  private var server: HttpServer = _
  private var base: String = _

  private val metaJson =
    """{"sheets":[
      |  {"properties":{"sheetId":111,"index":1,"title":"Extras"}},
      |  {"properties":{"sheetId":0,"index":0,"title":"Main Sheet"}}
      |]}""".stripMargin

  private val mainValues =
    """{"range":"Main Sheet!A1:D4","majorDimension":"ROWS","values":[
      |  ["name","score","ratio","active"],
      |  ["alice","42","0.5","true"],
      |  ["bob","7","2","false"],
      |  ["carol","-3","1e3","TRUE"]
      |]}""".stripMargin

  private val extrasValues =
    """{"range":"Extras!A1:B3","majorDimension":"ROWS","values":[
      |  ["mixed","short row"],
      |  ["12","x"],
      |  ["note"]
      |]}""".stripMargin

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    def reply(ex: HttpExchange, body: String, code: Int = 200): Unit = {
      require(Option(ex.getRequestHeaders.getFirst("Authorization"))
        .exists(_.startsWith("Bearer ")), "missing bearer token")
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/v4/spreadsheets/SHEET123/values/",
      (ex: HttpExchange) => {
        val title = ex.getRequestURI.getPath.split('/').last // decoded by HttpServer
        reply(ex, if (title == "Main Sheet") mainValues else extrasValues)
      })
    server.createContext("/v4/spreadsheets/SHEET123",
      (ex: HttpExchange) => reply(ex, metaJson))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def source(opts: Map[String, String] = Map.empty, frag: String = "") =
    TableSource("gs", s"https://docs.google.com/spreadsheets/d/SHEET123$frag",
      format = Some("gsheet"),
      options = Map("api_base" -> base, "auth_token" -> "tok") ++ opts)

  test("loads the index-0 sheet by default with voted types") {
    val df = Loaders.load(spark, source())
    assert(df.schema === StructType(Seq(
      StructField("name", StringType, nullable = true),
      StructField("score", LongType, nullable = true),
      StructField("ratio", DoubleType, nullable = true),
      StructField("active", BooleanType, nullable = true))))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(rows === Set(("alice", 42L, 0.5, true), ("bob", 7L, 2.0, false),
      ("carol", -3L, 1000.0, true)))
  }

  test("#gid fragment selects the sheet by id; short rows null-pad") {
    val df = Loaders.load(spark, source(frag = "#gid=111"))
    assert(df.columns.toSeq === Seq("mixed", "short_row"))
    // "12" and "note" vote Int64+Utf8 => Utf8
    assert(df.schema.fields(0).dataType === StringType)
    val rows = df.collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows === Set(("12", Some("x")), ("note", None)))
  }

  test("explicit sheet_title bypasses metadata resolution") {
    val df = Loaders.load(spark, source(opts = Map("sheet_title" -> "Extras")))
    assert(df.count() === 2)
  }

  test("typing lattice matches the reference's coerce table") {
    import GsheetLoader._
    assert(inferValueType("42") === LongType)
    assert(inferValueType("+7") === LongType)
    assert(inferValueType("0.5") === DoubleType)
    assert(inferValueType("1e3") === DoubleType)
    assert(inferValueType("TRUE") === BooleanType)
    assert(inferValueType("hello") === StringType)
    assert(coerce(LongType, DoubleType) === DoubleType)
    assert(coerce(BooleanType, LongType) === StringType)
    assert(coerce(BooleanType, BooleanType) === BooleanType)
    // int-looking then bool => Utf8 (set fold through coerce)
    assert(inferSchema(Seq(Vector("c"), Vector("1"), Vector("true")))
      .fields.head.dataType === StringType)
  }

  test("non-sheets uri is rejected") {
    intercept[IllegalArgumentException] {
      GsheetLoader.load(spark, TableSource("x", "https://example.com/nope",
        format = Some("gsheet"), options = Map("auth_token" -> "t")))
    }
  }
}
