package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins: pre-shuffle both sides ONCE at write time so
  * every subsequent join on the bucket key plans with zero exchanges.
  *
  * This is the canonical 100 TB pattern for repeated fact-fact joins: a
  * shuffle of the full table costs O(data) network every query, while
  * bucketed layout pays it once. Spark's bucketing (hash of the key into N
  * buckets, recorded in the table catalog) lets the planner prove
  * co-partitioning and skip the Exchange on BOTH sides; with `sortBy` the
  * SortMergeJoin's sorts collapse too. Verified in the spec by asserting the
  * joined plan contains no shuffle exchange.
  *
  * Both sides must use the SAME bucket count on the SAME key type — a
  * mismatch silently falls back to normal shuffle planning.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table at `path`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /** Join two registered bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Count shuffle exchanges in the executed plan (0 for a co-located join).
    * AQE wraps the final plan in AdaptiveSparkPlanExec and materialized
    * shuffles in ShuffleQueryStageExec leaves, so both layers are unwrapped —
    * a naive collect over the root sees neither. */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => 0
      }
      self + nested + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
