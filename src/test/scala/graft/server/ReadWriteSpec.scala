package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TableSource

/** Read-write mode: live register/drop over HTTP, and the snapshot-swap
  * refresh loop (the reference's only dynamic behavior, SURVEY.md §1). */
class ReadWriteSpec extends SparkSpec {

  private lazy val engine = new Engine(spark, readOnly = false)
  private lazy val app = new HttpApp(engine, 0).start()
  private lazy val base = s"http://127.0.0.1:${app.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("register a table over HTTP, query it, then drop it") {
    val dir = Files.createTempDirectory("graft_rw")
    val csv = dir.resolve("pets.csv")
    Files.writeString(csv, "name,age\nrex,3\nmia,5\n")
    val reg = post("/api/table",
      s"""[{"tableName": "pets", "uri": "$csv", "option": {"format": "csv"}}]""")
    assert(reg.statusCode() == 200)
    val rows = get("/api/tables/pets?sort=name&columns=name,age")
    assert(rows.body() == """[{"name":"mia","age":5},{"name":"rex","age":3}]""")
    val drop = post("/api/tables/drop", """{"tableName": "pets"}""")
    assert(drop.statusCode() == 200)
    val gone = get("/api/tables/pets")
    assert(gone.statusCode() == 400)
  }

  test("register without uri re-registers a known table (refresh-on-demand)") {
    // reference: roapi/src/api/register.rs:35-38 — a body entry naming a
    // registered table with no uri reloads it from its original source
    val dir = Files.createTempDirectory("graft_rereg")
    val csv = dir.resolve("counts.csv")
    Files.writeString(csv, "k,v\na,1\n")
    val reg = post("/api/table",
      s"""[{"tableName": "rereg_counts", "uri": "$csv", "option": {"format": "csv"}}]""")
    assert(reg.statusCode() == 200)
    assert(get("/api/tables/rereg_counts").body().count(_ == '{') == 1)
    Files.writeString(csv, "k,v\na,1\nb,2\n")
    val rereg = post("/api/table", """[{"tableName": "rereg_counts"}]""")
    assert(rereg.statusCode() == 200)
    assert(get("/api/tables/rereg_counts").body().count(_ == '{') == 2)
    // unknown name with no uri keeps the reference error shape
    // (error.rs:84-90: register failures are 500)
    val unknown = post("/api/table", """[{"tableName": "never_was"}]""")
    assert(unknown.statusCode() == 500)
    assert(unknown.body().contains("source not exists"))
    post("/api/tables/drop", """{"tableName": "rereg_counts"}""")
    ()
  }

  test("drop takes the reference's array body; unknown tables are 404") {
    val dir = Files.createTempDirectory("graft_drop")
    val csv = dir.resolve("d.csv")
    Files.writeString(csv, "k\n1\n")
    assert(post("/api/table",
      s"""[{"tableName": "drop_a", "uri": "$csv", "option": {"format": "csv"}},
         | {"tableName": "drop_b", "uri": "$csv", "option": {"format": "csv"}}]""".stripMargin)
      .statusCode() == 200)
    // the reference shape: an array of {tableName} (api_test.rs:31-36)
    val both = post("/api/tables/drop",
      """[{"tableName": "drop_a"}, {"tableName": "drop_b"}]""")
    assert(both.statusCode() == 200)
    assert(get("/api/tables/drop_a").statusCode() == 400)
    // unknown table: the reference's 404 "source does not exist"
    val unknown = post("/api/tables/drop", """[{"tableName": "drop_a"}]""")
    assert(unknown.statusCode() == 404)
    assert(unknown.body().contains("source does not exist"))
  }

  test("a drop batch with an unknown name drops NOTHING (atomic validation)") {
    val dir = Files.createTempDirectory("graft_drop_atomic")
    val csv = dir.resolve("d.csv")
    Files.writeString(csv, "k\n1\n")
    assert(post("/api/table",
      s"""[{"tableName": "keep_me", "uri": "$csv", "option": {"format": "csv"}}]""")
      .statusCode() == 200)
    val r = post("/api/tables/drop",
      """[{"tableName": "keep_me"}, {"tableName": "no_such"}]""")
    assert(r.statusCode() == 404)
    // the valid prefix must NOT have been dropped (review finding)
    assert(get("/api/tables/keep_me").statusCode() == 200)
    post("/api/tables/drop", """[{"tableName": "keep_me"}]""")
    ()
  }

  test("reload_interval re-reads the source and swaps the view") {
    val dir = Files.createTempDirectory("graft_refresh")
    val csv = dir.resolve("counts.csv")
    Files.writeString(csv, "k,v\na,1\n")
    engine.registerTable(TableSource("counts", csv.toString, Some("csv"),
      reloadIntervalSec = Some(1L)))
    assert(spark.table("counts").count() == 1)
    Files.writeString(csv, "k,v\na,1\nb,2\nc,3\n")
    val deadline = System.currentTimeMillis() + 15000
    var n = 0L
    while (n != 3L && System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      n = spark.table("counts").count()
    }
    assert(n == 3L, "refresh loop did not swap the view within 15s")
    // drop cancels the refresh task — otherwise it ticks (and logs) for the
    // rest of the test JVM and races later suites' catalog activity
    engine.dropTable("counts")
  }

  test("engine-wide reload_interval refreshes tables that declare none") {
    // reference: a table's own interval wins, the global default covers
    // the rest (columnq.rs:191 t.reload_interval.or(self.reload_interval))
    val e2 = new Engine(spark, readOnly = false, defaultReloadSec = Some(1L))
    val dir = Files.createTempDirectory("graft_refresh_global")
    val csv = dir.resolve("gcounts.csv")
    Files.writeString(csv, "k,v\na,1\n")
    e2.registerTable(TableSource("gcounts", csv.toString, Some("csv")))
    assert(spark.table("gcounts").count() == 1)
    Files.writeString(csv, "k,v\na,1\nb,2\n")
    val deadline = System.currentTimeMillis() + 15000
    var n = 0L
    while (n != 2L && System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      n = spark.table("gcounts").count()
    }
    assert(n == 2L, "global default refresh did not swap the view within 15s")
    e2.dropTable("gcounts")
  }
}
