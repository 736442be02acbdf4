package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events table.
  *
  * The reference has NO streaming surface (its only dynamic behavior is
  * whole-table refresh, SURVEY.md §1) — this module is part of the
  * beyond-reference pipeline capabilities: the same event analytics the batch
  * catalog runs (hourly windows, sessionization) expressed as incremental
  * streaming queries, so a 100 TB/day event feed doesn't need nightly
  * recomputes. Watermarks bound state; `flatMapGroupsWithState` holds one
  * small session struct per user, partitioned by the grouping key.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, startMs: Long, endMs: Long, n_events: Long)

  /** The raw stream: events parquet with the ns->us normalization applied. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(batchSchema).parquet(path)
    graft.Tables.normalizeNanoTs(raw, "ts")
  }

  /** Tumbling-window counts with a watermark (late data bounded at 1 hour). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Stateful sessionization: 30-minute inactivity gap closes a session.
    * State per user is one (start, last, count) triple; an EVENT-time timeout
    * (watermark-driven) flushes a session once the stream's watermark passes
    * its gap deadline — bounded state, deterministic w.r.t. event time. */
  def sessionize(events: DataFrame)(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => SessionOut(userId, s.start, s.last, s.n)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session when the watermark passes last + gap
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
        })
  }
}
