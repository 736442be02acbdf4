package graft.queries

import org.apache.spark.sql.functions._

/** Dev tool: one-off corpus shape measurements (not part of the catalog). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = PipelineOps.docs(spark, dir)
    println("[probe] docs=" + d.count())
    val tok = d.select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    println("[probe] tokens=" + tok.count())
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    println("[probe] tf_rows=" + tf.count())
    println("[probe] vocab=" + tf.select("term").distinct().count())
    spark.stop()
  }
}
