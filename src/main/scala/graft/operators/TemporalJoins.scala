package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators the reference (and vanilla Spark SQL)
  * lack as primitives, composed Spark-first so Catalyst plans them with
  * ordinary exchanges instead of a custom physical operator.
  *
  * Scale shapes:
  *   - asofJoin: union + window over (key, time). ONE shuffle on the key,
  *     state per window partition is one key's rows. No point-in-interval
  *     explosion, no broadcast of an unbounded side. This is the standard
  *     distributed as-of plan (a backward fill over the merged timeline).
  *   - rangeJoin: intervals explode to the fixed-width bins they cover, the
  *     join runs on (key, bin) equality, and the exact BETWEEN filter runs
  *     inside the matched bin only. A point lives in exactly one bin, so no
  *     dedup is needed. Bin width trades replication (long intervals -> many
  *     bins) against candidate density; both sides shuffle once.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, attach the single most recent
    * right row with rightTime <= leftTime for the same key. Right-side rows
    * must be unique per (key, rightTime) — pre-aggregate otherwise, or the
    * pick among ties is arbitrary (same caveat every as-of engine has).
    *
    * Implementation: tag both sides, union on a merged timeline, window
    * last-value-ignoring-nulls ordered by (time, side) so a right row at
    * exactly leftTime wins, then keep left rows. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.contains(key), "rightCols should exclude the key")

    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts after right at equal times
      .select((Seq(col("_t"), col("_side"), col(key).as("_k")) ++
        leftCols.map(c => col(c).as(s"_l_$c")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c"))): _*)
    val rTagged = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((Seq(col("_t"), col("_side"), col(key).as("_k")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        rightCols.map(c => col(c).as(s"_r_$c"))): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select((Seq(col("_k").as(key)) ++
        leftCols.filterNot(_ == key).map(c => col(s"_l_$c").as(c)) ++
        rightCols.map(c => col(s"_r_$c").as(c))): _*)
  }

  /** Key + range join: points (key, pt) against intervals [start, end]
    * (inclusive) with the same key, via fixed-width bin bucketing.
    * `binWidth` is in the units of the numeric range column (pass epoch
    * seconds/days as appropriate). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                pt: String, start: String, end: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(pt) / binWidth))
    val i = intervals
      .withColumn("_bin",
        explode(sequence(floor(col(start) / binWidth), floor(col(end) / binWidth))))
    p.join(i, Seq(key, "_bin"))
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop("_bin")
  }
}
