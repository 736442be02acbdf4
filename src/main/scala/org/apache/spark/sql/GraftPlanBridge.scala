package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** Bridge into `private[sql]` plan constructors, the [[GraftArrowBridge]]
  * pattern: the serving engine's fast local path needs to wrap an
  * already-folded logical plan as a DataFrame without re-entering the full
  * optimizer pipeline through the SQL text route. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
