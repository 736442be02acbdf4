package graft.queries

/** Dev tool: run named catalog queries twice each (cold + warm) and print
  * wall-clock per run — separates one-time codegen from steady state.
  * Usage: runMain graft.queries.TimeIt <sfDir> <query1> [query2 ...] */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.drop(1).foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[timeit] $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
