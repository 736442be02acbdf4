package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.sources.{DeltaDml, DeltaWriter, IcebergWriter}

/** The tailing driver over the incremental reads: persisted (from, to]
  * offsets, replay of a crashed batch with its PINNED range, and the
  * idempotent `batch=<id>` + `_SUCCESS` sink — a three-commit upstream
  * sequence consumed across simulated restarts must land each change
  * exactly once (round-19 verdict #2). */
class ChangeTailSpec extends SparkSpec {

  import spark.implicits._

  private def newBase(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[(Long, String, String)] =
    df.select("id", "name", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("delta CDF tail: exactly-once across crash-before-commit and crash-after-sink") {
    val base = newBase("graft_tail_d")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), table) // v0
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "name"), table) // v1
    DeltaDml.deleteWhere(spark, table, "id = 2") // v2
    val proc = ChangeTail.parquetSink(sink)

    // batch 0: history up to v1, pinned by endAt
    val b0 = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L, endAt = Some(1L)).get
    assert((b0.from, b0.to) == (-1L, 1L))
    assert(rows(ChangeTail.readSink(spark, sink)) == Set(
      (1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert")))

    // CRASH SHAPE 1 — planned but nothing landed: offsets/1 exists, no
    // sink dir, no commit marker. The next poll must replay THE PINNED
    // RANGE even though the table has since moved to v2.
    Files.writeString(java.nio.file.Path.of(ckpt + "/offsets/1"), "1,2")
    val b1 = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L).get
    assert((b1.batchId, b1.from, b1.to) == (1L, 1L, 2L))
    assert(rows(ChangeTail.readSink(spark, sink)) == Set(
      (1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert"),
      (2L, "b", "delete")))

    // CRASH SHAPE 2 — sink committed but the commit marker lost: replay
    // must SKIP the landing (the sink's _SUCCESS is the idempotency
    // gate), then re-mark. No duplicates.
    assert(new java.io.File(ckpt + "/commits/1").delete())
    val b1again = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L).get
    assert((b1again.batchId, b1again.from, b1again.to) == (1L, 1L, 2L))
    val all = ChangeTail.readSink(spark, sink)
    assert(all.count() == 4L, "a replayed committed batch must not re-land")

    // drained: nothing new
    assert(ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L).isEmpty)
    // a new upstream commit resumes from the durable cursor
    DeltaWriter.write(Seq((4L, "d")).toDF("id", "name"), table) // v3
    val b2 = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L).get
    assert((b2.from, b2.to) == (2L, 3L))
    assert(rows(ChangeTail.readSink(spark, sink))
      .contains((4L, "d", "insert")))
  }

  test("iceberg changes tail: the row-level changelog lands through the driver") {
    val base = newBase("graft_tail_ic")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), table)
    graft.sources.IcebergDml.deleteWhere(spark, table, "id = 1")
    val proc = ChangeTail.parquetSink(sink)
    assert(ChangeTail.tailIcebergChanges(spark, table, ckpt, proc).isDefined)
    assert(rows(ChangeTail.readSink(spark, sink)) == Set(
      (1L, "a", "insert"), (2L, "b", "insert"), (1L, "a", "delete")))
    assert(ChangeTail.tailIcebergChanges(spark, table, ckpt, proc).isEmpty)
  }

  test("drain: batch-per-poll until dry, maxBatches honored") {
    val base = newBase("graft_tail_dr")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "name"), table) // v0
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "name"), table) // v1
    val proc = ChangeTail.parquetSink(sink)
    def end(): Long = graft.sources.DeltaLoader.snapshot(spark, table).version
    def load(f: Long, t: Long) =
      graft.sources.DeltaCdf.loadChanges(spark, table, f, Some(t))
    // maxBatches = 0: nothing consumed, nothing planned
    assert(ChangeTail.drain(spark, ckpt, () => end(), load, -1L, proc,
      maxBatches = 0).isEmpty)
    // one drain consumes the whole backlog (one batch to the current
    // end), then reports dry
    val drained = ChangeTail.drain(spark, ckpt, () => end(), load, -1L, proc)
    assert(drained.map(b => (b.from, b.to)) == Seq((-1L, 1L)))
    assert(ChangeTail.drain(spark, ckpt, () => end(), load, -1L, proc).isEmpty)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "name"), table) // v2
    val more = ChangeTail.drain(spark, ckpt, () => end(), load, -1L, proc)
    assert(more.map(b => (b.from, b.to)) == Seq((1L, 2L)))
    assert(ChangeTail.readSink(spark, sink).count() == 3L)
  }

  test("iceberg appends tail: snapshot-id cursor, one batch per poll") {
    val base = newBase("graft_tail_i")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), table)
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), table)
    val proc = ChangeTail.parquetSink(sink)
    val b0 = ChangeTail.tailIcebergAppends(spark, table, ckpt, proc).get
    def ids(): Set[Long] = ChangeTail.readSink(spark, sink)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids() == Set(1L, 2L))
    // drained — snapshot ids are random longs, so "nothing new" must be
    // an equality test on the cursor, not an ordering test
    assert(ChangeTail.tailIcebergAppends(spark, table, ckpt, proc).isEmpty)
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "name"), table)
    val b1 = ChangeTail.tailIcebergAppends(spark, table, ckpt, proc).get
    assert(b1.from == b0.to)
    assert(ids() == Set(1L, 2L, 3L))
  }
}
