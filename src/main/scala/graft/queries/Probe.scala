package graft.queries

import org.apache.spark.sql.functions._

/** Dev tool: one-off corpus shape measurements (not part of the catalog). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.functions.TextFunctions.tokens
    val t = tokens(col("text"))
    def gramsOf(ts: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), greatest(size(ts) - 2, lit(0))),
        i => array_join(slice(ts, i + 1, lit(2)), " "))
    val docs = PipelineOps.docs(spark, dir)
    // warm
    docs.select(col("doc_id"), gramsOf(t).as("g")).select(explode(col("g"))).count()
    time("inline-split grams x3") {
      (1 to 3).foreach(_ =>
        docs.select(col("doc_id"), gramsOf(t).as("g")).select(explode(col("g"))).count())
    }
    val pre = docs.select(col("doc_id"), t.as("ts"))
      .select(col("doc_id"), gramsOf(col("ts")).as("g"))
    pre.select(explode(col("g"))).count()
    time("pre-tokenized grams x3") {
      (1 to 3).foreach(_ => pre.select(explode(col("g"))).count())
    }
    time("repetition-shaped x3") {
      (1 to 3).foreach(_ => PipelineOps.dfQueries("doc_repetition")(spark, dir).count())
    }
    // shingles native expr for comparison (distinct 2-windows, close cousin)
    time("native shingles x3") {
      (1 to 3).foreach(_ => docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 2)).as("w")).count())
    }
    spark.stop()
  }
}
