package graft.server

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.TableSource

/** The encoded-result cache on the SQL serving path: correctness of the
  * invalidation rules matters more than the speedup (a stale cached byte
  * array would be a silently wrong API response forever). */
class ResultCacheSpec extends SparkSpec {

  private lazy val engine = {
    val e = new Engine(spark, readOnly = false)
    e.registerTable(TableSource("region", s"$sf0001/region.parquet",
      format = Some("parquet")))
    e
  }

  private def post(sql: String, accept: Option[String] = None): (Int, Array[Byte]) = {
    val req = Routes.Request("POST", "/api/sql", None, accept,
      () => sql.getBytes(UTF_8))
    Routes.handle(engine, req) match {
      case Routes.Full(status, _, body) => (status, body)
      case Routes.Streamed(_, write) =>
        val out = new ByteArrayOutputStream(); write(out); (200, out.toByteArray)
    }
  }

  test("repeated identical SQL answers from encoded bytes, bit-identical") {
    val sql = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    val (s1, b1) = post(sql)
    assert(s1 == 200)
    val before = engine.resultCacheHits.get()
    val (s2, b2) = post(sql)
    assert(s2 == 200)
    assert(engine.resultCacheHits.get() == before + 1, "second request must hit")
    assert(b1.toSeq == b2.toSeq, "cached bytes must be bit-identical")
  }

  test("content types cache independently") {
    val sql = "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 2"
    val (_, json) = post(sql)
    val (_, csv) = post(sql, Some("application/csv"))
    assert(new String(json, UTF_8).startsWith("["))
    assert(!(csv.toSeq == json.toSeq))
    val before = engine.resultCacheHits.get()
    post(sql); post(sql, Some("application/csv"))
    assert(engine.resultCacheHits.get() == before + 2)
  }

  test("registry changes invalidate: no stale bytes after drop/re-register") {
    val sql = "SELECT count(*) AS n FROM mutable_t"
    engine.registerTable(TableSource("mutable_t", s"$sf0001/region.parquet",
      format = Some("parquet")))
    val (_, b1) = post(sql)
    post(sql) // now cached
    // re-register the name against a DIFFERENT table
    engine.registerTable(TableSource("mutable_t", s"$sf0001/nation.parquet",
      format = Some("parquet")))
    val (_, b2) = post(sql)
    assert(new String(b1, UTF_8) != new String(b2, UTF_8),
      "re-registration must invalidate the cached count")
    engine.dropTable("mutable_t")
  }

  test("REST and GraphQL ride the same cache, keyed on the raw request") {
    def get(path: String, q: String): Array[Byte] =
      Routes.handle(engine, Routes.Request("GET", path, Some(q), None,
        () => Array.emptyByteArray)) match {
        case Routes.Full(_, _, b) => b
        case Routes.Streamed(_, w) =>
          val o = new ByteArrayOutputStream(); w(o); o.toByteArray
      }
    val b1 = get("/api/tables/region", "columns=r_regionkey&limit=3")
    val before = engine.resultCacheHits.get()
    val b2 = get("/api/tables/region", "columns=r_regionkey&limit=3")
    assert(engine.resultCacheHits.get() == before + 1)
    assert(b1.toSeq == b2.toSeq)
    // different params = different key
    get("/api/tables/region", "columns=r_regionkey&limit=2")
    assert(engine.resultCacheHits.get() == before + 1)
    val gql = "{ region(limit: 2) { r_regionkey } }"
    def postGql(): Array[Byte] = {
      Routes.handle(engine, Routes.Request("POST", "/api/graphql", None, None,
        () => gql.getBytes(UTF_8))) match {
        case Routes.Full(_, _, b) => b
        case Routes.Streamed(_, w) =>
          val o = new ByteArrayOutputStream(); w(o); o.toByteArray
      }
    }
    val g1 = postGql()
    val beforeG = engine.resultCacheHits.get()
    assert(postGql().toSeq == g1.toSeq)
    assert(engine.resultCacheHits.get() == beforeG + 1)
  }

  test("a reload_interval refresh that changes rows invalidates all three frontends") {
    // the reference's swap semantics (columnq.rs load_table): a refresh
    // tick re-registers the table; every cached byte keyed on the old
    // snapshot must die with that epoch, on the SQL, REST, and GraphQL
    // faces alike
    def fetch(req: Routes.Request): Array[Byte] =
      Routes.handle(engine, req) match {
        case Routes.Full(_, _, b) => b
        case Routes.Streamed(_, w) =>
          val o = new ByteArrayOutputStream(); w(o); o.toByteArray
      }
    def sqlB() = fetch(Routes.Request("POST", "/api/sql", None, None,
      () => "SELECT sum(v) AS s FROM ticking".getBytes(UTF_8)))
    def restB() = fetch(Routes.Request("GET", "/api/tables/ticking",
      Some("columns=v&sort=-v&limit=1"), None, () => Array.emptyByteArray))
    def gqlB() = fetch(Routes.Request("POST", "/api/graphql", None, None,
      () => "{ ticking(limit: 1, sort: [{field: \"v\", order: \"desc\"}]) { v } }".getBytes(UTF_8)))
    val dir = java.nio.file.Files.createTempDirectory("tick").toString
    val csv = java.nio.file.Paths.get(dir, "t.csv")
    java.nio.file.Files.write(csv, "v\n1\n2\n".getBytes(UTF_8))
    engine.registerTable(TableSource("ticking", csv.toString,
      format = Some("csv"), reloadIntervalSec = Some(1L)))
    try {
      val (s1, r1, g1) = (new String(sqlB(), UTF_8), new String(restB(), UTF_8),
        new String(gqlB(), UTF_8))
      assert(s1.contains("3") && r1.contains("2") && g1.contains("2"),
        s"initial snapshot: $s1 / $r1 / $g1")
      // prime the cache on every face. The 1 s refresh tick clears the
      // cache asynchronously, so a single prime->hit observation can race
      // a tick — retry until one full prime+refetch cycle lands inside a
      // tick window (each attempt takes ~ms; flaking 20 in a row would
      // mean hits are genuinely broken)
      val cached = (1 to 20).exists { _ =>
        sqlB(); restB(); gqlB()
        val hitsBefore = engine.resultCacheHits.get()
        sqlB(); restB(); gqlB()
        engine.resultCacheHits.get() >= hitsBefore + 3
      }
      assert(cached, "all three faces must be cache-resident before the refresh")
      // rows change on disk; the NEXT tick must swap them in
      java.nio.file.Files.write(csv, "v\n10\n20\n".getBytes(UTF_8))
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def refreshed(): Boolean =
        new String(sqlB(), UTF_8).contains("30") &&
          new String(restB(), UTF_8).contains("20") &&
          new String(gqlB(), UTF_8).contains("20")
      while (!refreshed() && System.nanoTime() < deadline) Thread.sleep(200)
      assert(refreshed(),
        "refresh tick must invalidate every frontend's cached bytes: " +
          s"sql=${new String(sqlB(), UTF_8)} rest=${new String(restB(), UTF_8)} " +
          s"gql=${new String(gqlB(), UTF_8)}")
    } finally engine.dropTable("ticking")
  }

  test("nondeterministic and time-valued queries never cache") {
    val before = engine.resultCacheHits.get()
    post("SELECT rand() AS r")
    post("SELECT rand() AS r")
    post("SELECT current_timestamp() AS t")
    post("SELECT current_timestamp() AS t")
    assert(engine.resultCacheHits.get() == before,
      "rand()/now() responses must never be served from cache")
  }

  test("information_schema queries never cache (snapshot-per-call)") {
    val before = engine.resultCacheHits.get()
    post("SELECT table_name FROM information_schema.tables")
    post("SELECT table_name FROM information_schema.tables")
    assert(engine.resultCacheHits.get() == before)
  }
}
