package graft

/** Dev tool: print formatted physical plans for catalog queries.
  * Usage: runMain graft.Explain <sfDir> <query1> [query2 ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    args.drop(1).foreach { name =>
      println(s"\n================ $name ================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
