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

  test("invalid range throws BEFORE the offsets marker persists (no wedge)") {
    val base = newBase("graft_tail_val")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "name"), table) // v0
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "name"), table) // v1
    val proc = ChangeTail.parquetSink(sink)
    assert(ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L, endAt = Some(1L)).isDefined)
    // a STALE endAt below the cursor: load validation trips loadChanges'
    // own require — the poll must throw WITHOUT pinning the bad range
    intercept[IllegalArgumentException] {
      ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
        startFrom = -1L, endAt = Some(0L))
    }
    assert(!new java.io.File(ckpt + "/offsets/1").exists(),
      "a failed range validation must not persist an offsets marker")
    // the checkpoint is NOT wedged: a sane poll proceeds normally
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "name"), table) // v2
    val b = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      startFrom = -1L).get
    assert((b.from, b.to) == (1L, 2L))
  }

  test("WAL retention: markers beyond tailWalRetain are retired, resume intact") {
    val base = newBase("graft_tail_ret")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    spark.conf.set("spark.graft.tailWalRetain", "3")
    try {
      (0 until 7).foreach { i =>
        DeltaWriter.write(Seq((i.toLong, s"r$i")).toDF("id", "name"), table)
      }
      val proc = ChangeTail.parquetSink(sink)
      // one version per batch -> 8 batches for versions (-1, 6]
      val drained = ChangeTail.drain(spark, ckpt,
        () => graft.sources.DeltaLoader.snapshot(spark, table).version,
        (f, t) => graft.sources.DeltaCdf.loadChanges(spark, table, f, Some(t)),
        -1L, proc,
        chop = Some((f: Long, e: Long) => math.min(f + 1, e)))
      assert(drained.size == 7)
      def names(d: String): Set[String] =
        Option(new java.io.File(ckpt + "/" + d).list()).map(_.toSet)
          .getOrElse(Set.empty)
      assert(names("offsets").flatMap(_.toLongOption).size == 3,
        s"offsets WAL must hold the retained window only: ${names("offsets")}")
      assert(names("commits").flatMap(_.toLongOption).size == 3)
      // the cursor survives retention: nothing new -> None; a new commit
      // resumes from the retained tail
      assert(ChangeTail.tailDeltaCdf(spark, table, ckpt, proc).isEmpty)
      DeltaWriter.write(Seq((99L, "z")).toDF("id", "name"), table)
      val b = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc).get
      assert((b.from, b.to) == (6L, 7L))
      assert(rows(ChangeTail.readSink(spark, sink))
        .contains((99L, "z", "insert")))
    } finally spark.conf.unset("spark.graft.tailWalRetain")
  }

  test("catch-up chopping: 100-commit backlog, cap 10 -> 10 batches, sink equality") {
    val base = newBase("graft_tail_chop")
    val table = base + "/t"
    // one 100-version history: v0..v99, one row each
    (0 until 100).foreach { i =>
      DeltaWriter.write(Seq((i.toLong, s"r$i")).toDF("id", "name")
        .coalesce(1), table)
    }
    def end(): Long = graft.sources.DeltaLoader.snapshot(spark, table).version
    def load(f: Long, t: Long) =
      graft.sources.DeltaCdf.loadChanges(spark, table, f, Some(t))
    // capped: 10 batches of 10 versions
    val capped = ChangeTail.drain(spark, base + "/ckptA", () => end(), load,
      -1L, ChangeTail.parquetSink(base + "/sinkA"),
      chop = Some((f: Long, e: Long) => math.min(f + 10, e)))
    assert(capped.size == 10)
    assert(capped.map(b => (b.from, b.to)).head == (-1L, 9L))
    assert(capped.map(b => (b.from, b.to)).last == (89L, 99L))
    // uncapped: one giant batch — same landed content
    val uncapped = ChangeTail.drain(spark, base + "/ckptB", () => end(), load,
      -1L, ChangeTail.parquetSink(base + "/sinkB"))
    assert(uncapped.size == 1)
    val a = rows(ChangeTail.readSink(spark, base + "/sinkA"))
    val b = rows(ChangeTail.readSink(spark, base + "/sinkB"))
    assert(a == b && a.size == 100, "chopped and uncapped runs must land " +
      s"identical change sets (${a.size} vs ${b.size})")
  }

  test("iceberg chop: maxSnapshotsPerBatch walks the sequence order") {
    val base = newBase("graft_tail_ichop")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    (0 until 5).foreach { i =>
      IcebergWriter.write(Seq((i.toLong, s"r$i")).toDF("id", "name"), table)
    }
    val proc = ChangeTail.parquetSink(sink)
    val batches = Iterator.continually(
      ChangeTail.tailIcebergAppends(spark, table, ckpt, proc,
        maxSnapshotsPerBatch = Some(2)))
      .takeWhile(_.isDefined).map(_.get).toSeq
    assert(batches.size == 3, s"5 snapshots at cap 2 -> 3 batches, got " +
      s"${batches.size}")
    assert(ChangeTail.readSink(spark, sink)
      .select("id").collect().map(_.getLong(0)).toSet == (0L until 5L).toSet)
  }

  test("fence: two pollers against one checkpoint -> one survivor, loud loser") {
    val base = newBase("graft_tail_fence")
    val table = base + "/t"
    val ckpt = base + "/ckpt"
    val sink = base + "/sink"
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "name"), table) // v0
    val proc = ChangeTail.parquetSink(sink)
    val fenceA = ChangeTail.openFence(spark, ckpt)
    assert(ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      fence = Some(fenceA)).isDefined)
    // a second tailer takes over the checkpoint
    val fenceB = ChangeTail.openFence(spark, ckpt)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "name"), table) // v1
    val err = intercept[IllegalArgumentException] {
      ChangeTail.tailDeltaCdf(spark, table, ckpt, proc, fence = Some(fenceA))
    }
    assert(err.getMessage.contains("fenced out"))
    // the loser wrote no marker for v1 — B consumes it exactly once
    val b = ChangeTail.tailDeltaCdf(spark, table, ckpt, proc,
      fence = Some(fenceB)).get
    assert((b.from, b.to) == (0L, 1L))
    assert(rows(ChangeTail.readSink(spark, sink)) == Set(
      (1L, "a", "insert"), (2L, "b", "insert")))
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
