package graft.queries

/** Dev tool: time labeled stages of a query interactively.
  * Usage: runMain graft.queries.TimeIt <sfDir> */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.shingles
    import graft.functions.VectorFunctions.bitsetFromIds
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[timeit] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    val d = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
    val inv = d.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("warmup count")(d.count())
    time("inv count")(inv.count())
    time("nSh distinct count")(inv.select("shingle").distinct().count())
    val nWords = (931 + 63) / 64
    val vocab = inv.select(col("shingle")).distinct()
      .withColumn("bit", (row_number().over(Window.orderBy(col("shingle"))) - 1).cast("long"))
    val enc = inv.join(broadcast(vocab), "shingle")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("bit")).as("bits"), count(lit(1)).as("n_sh"))
      .select(col("doc_id"), bitsetFromIds(col("bits"), nWords).as("bs"), col("n_sh"))
      .as[(Long, Array[Long], Long)]
    val collected = time("enc collect")(enc.collect().sortBy(_._1))
    time("driver kernel only") {
      val keys = collected.map(_._1)
      var cnt = 0L
      var a = 0
      while (a < collected.length) {
        val (ida, bsa, na) = collected(a)
        var k = a + 1
        while (k < collected.length) {
          val (idb, bsb, nb) = collected(k)
          var inter = 0L; var i = 0
          val n = math.min(bsa.length, bsb.length)
          while (i < n) { inter += java.lang.Long.bitCount(bsa(i) & bsb(i)); i += 1 }
          if (inter.toDouble / (na + nb - inter).toDouble >= 0.25) cnt += 1
          k += 1
        }
        a += 1
      }
      cnt
    }
    time("bitsetJaccard count")(PipelineOps.bitsetJaccard(inv, 0.25, 931).count())
    spark.stop()
  }
}
