package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  /** File stream sources need a directory; stage the single parquet into one. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    d.toString
  }

  test("windowed counts with watermark over the events stream (memory sink)") {
    val events = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.windowedCounts(events)
      .writeStream.outputMode("append").format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "stream did not drain in time")
      // append mode only emits watermark-closed windows over the finite batch
      val got = spark.table("win_counts")
      assert(got.count() > 0)
      assert(got.columns.toSeq == Seq("window_start", "event_type", "n", "total_value"))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions per user") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.sessionize(events)
      .writeStream.outputMode("append").format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "stream did not drain in time")
      val got = spark.table("sessions")
      // closed sessions only (each user's final session stays open in state),
      // so the count is bounded by the batch-computed total...
      val batchSessions = graft.queries.Relational.dfQueries("q_sessionize")(spark, sf0001)
        .agg(org.apache.spark.sql.functions.sum("n_sessions")).head.getLong(0)
      assert(got.count() > 0 && got.count() <= batchSessions)
      // ...and each closed session must respect time ordering
      assert(got.filter("endMs < startMs").count() == 0)
    } finally q.stop()
  }
}
