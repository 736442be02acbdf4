package graft

/** Scratch profiler for the cold serving path (run via Test/runMain). */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import graft.server.Engine
    import graft.sources.TableSource
    val engine = new Engine(spark, readOnly = true)
    engine.registerTable(TableSource("uk_cities",
      "/root/reference/test_data/uk_cities_with_headers.csv"))
    val sqlBase =
      "SELECT city, lat, lng FROM uk_cities WHERE lat > 51 ORDER BY lat DESC LIMIT 10"
    // warm codegen etc.
    (1 to 30).foreach { i =>
      engine.querySql(s"$sqlBase -- warm $i").collect()
    }
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e6)
    }
    val n = 40
    var tParse = 0.0; var tAnalyze = 0.0; var tOpt = 0.0; var tExec = 0.0
    var tCollect = 0.0
    (1 to n).foreach { i =>
      val sql = s"$sqlBase -- nonce $i"
      val (df, d1) = t(spark.sql(sql))          // parse + analysis trigger? sql() parses + analyzes lazily?
      val (_, d2) = t(df.queryExecution.analyzed)
      val (_, d3) = t(df.queryExecution.executedPlan)
      val (rows, d4) = t(df.queryExecution.executedPlan.executeCollect())
      require(rows.nonEmpty)
      tParse += d1; tAnalyze += d2; tOpt += d3; tExec += d4
      val (r2, d5) = t(df.collect())
      require(r2.nonEmpty)
      tCollect += d5
    }
    println(f"[coldprofile] per-query ms: spark.sql=${tParse / n}%.2f analyzed=${tAnalyze / n}%.2f plan=${tOpt / n}%.2f executeCollect=${tExec / n}%.2f dataset.collect=${tCollect / n}%.2f")
    val plan = spark.sql(s"$sqlBase -- planshape").queryExecution.executedPlan
    println("[coldprofile] plan:\n" + plan.toString.take(2000))
    // engine path (querySql + cacheablePlan + result cache bookkeeping)
    var tEng = 0.0
    (1 to n).foreach { i =>
      val (rows, d) = t(engine.querySql(s"$sqlBase -- eng $i").collect())
      require(rows.nonEmpty); tEng += d
    }
    println(f"[coldprofile] engine.querySql+collect=${tEng / n}%.2f ms")
    // full HTTP path
    val app = new graft.server.HttpApp(engine, 0).start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val uri = java.net.URI.create(s"http://127.0.0.1:${app.boundPort}/api/sql")
      def once(q: String): Double = {
        val t0 = System.nanoTime()
        val r = client.send(java.net.http.HttpRequest.newBuilder(uri)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(q)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(r.statusCode() == 200, r.body().take(200))
        (System.nanoTime() - t0) / 1e6
      }
      (1 to 20).foreach(i => once(s"$sqlBase -- hw $i"))
      val lat = (1 to n).map(i => once(s"$sqlBase -- http $i")).sorted
      println(f"[coldprofile] http cold p50=${lat(n / 2)}%.2f ms p90=${lat(n * 9 / 10)}%.2f ms")
    } finally app.stop()
  }
}
