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
  final case class RetEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class RetState(cohortWeek: Long, seen: Seq[Long])
  final case class RetOut(user_id: Long, cohort: java.sql.Date, week_n: Long)
  final case class PackDoc(doc_id: Long, source: String, n_tokens: Long)
  final case class PackState(shard: Long, fill: Long)
  final case class PackOut(doc_id: Long, source: String, n_tokens: Long,
                           shard_id: Long, shard_offset: Long)

  /** The raw stream: events parquet with the ns->us normalization applied.
    * Watermarks require TIMESTAMP (LTZ); driver-regenerated parquet may
    * carry ts as naive timestamp[us] (TIMESTAMP_NTZ), so normalize — the
    * session TZ is UTC, making the cast a pure type change. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(batchSchema).parquet(path)
    val norm = graft.Tables.normalizeNanoTs(raw, "ts")
    if (norm.schema.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.TimestampNTZType))
      norm.withColumn("ts", col("ts").cast("timestamp_ltz"))
    else norm
  }

  /** Tumbling-window counts with a watermark (late data bounded at 1 hour). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup for a document ingest feed: first occurrence wins;
    * state holds ONE fingerprint per distinct doc inside the watermark
    * horizon and is evicted as the watermark advances — the streaming face of
    * `dedup_exact`, with bounded state at any feed rate. Input needs
    * (ts, text, ...); the fingerprint is the codegen'd rolling hash. */
  def dedupDocStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.rollingFingerprint(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream interval join: each view joined to the same user's
    * follow-up actions within 30 minutes. Both sides are watermarked, so join
    * state is bounded by (watermark + interval); the shuffle key is user_id on
    * both sides — co-partitioned, no broadcast of an unbounded stream. */
  def viewToAction(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour").alias("views")
    val actions = events.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts").as("act_ts"),
        col("event_type").as("action"), col("value"))
      .withWatermark("act_ts", "1 hour").alias("actions")
    views.join(actions,
      expr("""views.user_id = actions.user_id AND
              act_ts >= view_ts AND act_ts <= view_ts + INTERVAL 30 MINUTES"""))
      .select(col("views.user_id"), col("view_id"), col("view_ts"),
        col("action"), col("act_ts"), col("value"))
  }

  /** Streaming quality gate: the batch quality score as a per-row projection
    * on an ingest stream — stateless, so any feed rate just scales with
    * executors. The streaming face of `doc_quality` as a FILTER. */
  def qualityFilterStream(docs: DataFrame, minQuality: Double): DataFrame =
    docs.withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)

  /** Streaming corpus mixing: the per-source deterministic keep-rate filter
    * (`PipelineOps.mixtureSample`) applied at ingest — stateless (the keep
    * decision is pure hash arithmetic on the row), so the mixture a batch
    * pipeline would produce is EXACTLY what the stream admits, no
    * reconciliation pass needed. */
  def mixtureSampleStream(docs: DataFrame, rates: Map[String, Double],
                          defaultRate: Double): DataFrame = {
    val h = graft.functions.TextFunctions.fnvMix64(
      concat(lit("mix-42-"), col("doc_id").cast("string")))
    // prefixed internal column, dropped after the filter: the sink sees the
    // input schema unchanged, and a user column named "h" survives intact
    graft.queries.PipelineOps.mixtureSample(docs.withColumn("graft_mix_h", h),
        rates, defaultRate, sourceCol = "source", hashCol = "graft_mix_h")
      .drop("graft_mix_h")
  }

  /** Streaming decontamination: STREAM-STATIC join — the benchmark probe
    * n-gram set is a static (broadcast) table; each micro-batch's doc
    * n-grams join against it and aggregate hits per doc. State is the
    * running per-doc counts (update mode); the static side re-broadcasts
    * per batch, so probe-set refreshes are picked up without restart. The
    * streaming face of `doc_decontaminate`. */
  def decontaminateStream(docs: DataFrame, probeNgrams: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), n)).as("shingle"))
      .join(broadcast(probeNgrams), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** Self-deduplicating document ingest: each micro-batch (a) finds its
    * WITHIN-batch near-dup pairs, (b) probes the persisted MinHash band
    * index for pairs against ALL history, then (c) appends its own
    * signatures to the index — so across the stream's lifetime every
    * near-dup pair is emitted exactly once and no document is ever
    * re-hashed. This is the streaming face of `dedup_minhash_incr`:
    * batch-at-a-time processing is indistinguishable from running the
    * full [[graft.queries.PipelineOps.minhashLshJoin]] over everything
    * seen (the equivalence the spec pins). State lives in the index
    * parquet, NOT executor memory — a 100 TB/day feed's history costs
    * index storage, not stream state, and the probe join prunes to
    * band-hash buckets like the batch path. `emit` receives each batch's
    * pair DataFrame and MUST materialize it before returning (the index
    * append below it would otherwise race the lazy read).
    *
    * IDEMPOTENT under batch re-execution (the foreachBatch contract): each
    * batch's signatures land in a `batch=<batchId>` index partition whose
    * job-level `_SUCCESS` is the commit marker, so a retry (a) never
    * appends its signatures twice — an already-committed partition is
    * skipped, a half-written one is overwritten — and (b) EXCLUDES its own
    * committed partition from the history probe, so a doc never matches
    * itself at jaccard 1.0. `emit` itself keeps foreachBatch's native
    * at-least-once semantics (a crash between emit and the stream's commit
    * re-emits that batch's pairs); the INDEX — the state that compounds —
    * is exactly-once. */
  def nearDupStream(docs: DataFrame, indexDir: String, threshold: Double,
                    emit: DataFrame => Unit,
                    compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.queries.PipelineOps
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // query-scoped batch id: retry-idempotent within a checkpoint
        // lineage, collision-free across runs sharing the index dir
        val eb = effectiveBatchId(spark, batchId)
        val sh = batch.select(col("doc_id"),
          graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
        sh.persist() // read three ways: within-join, cross-probe, append
        try {
          // a compaction crash in a PREVIOUS run leaves a marker dir; heal
          // before probing so the probe never reads a mid-swap index.
          // Unconditional (not gated on compactEvery): a restart with
          // compaction off must still heal a crash from a prior run that
          // had it on — two fs.exists calls on the no-crash path.
          if (PipelineOps.indexNeedsRepair(spark, indexDir))
            PipelineOps.repairBandIndex(spark, indexDir)
          val within = PipelineOps.minhashLshJoin(sh, threshold)
          val pairs =
            if (PipelineOps.indexHasData(spark, indexDir,
                  excludeBatch = Some(eb)))
              within.unionByName(
                PipelineOps.minhashDedupIncremental(sh, indexDir, threshold,
                  excludeBatch = Some(eb)))
            else within
          emit(pairs)
          PipelineOps.minhashIndexAppend(sh, indexDir, eb)
          // periodic small-dirs rewrite: micro-batches run sequentially, so
          // compacting HERE races no append or probe; the row-level
          // src_batch stamp + kept _SUCCESS markers preserve the retry
          // idempotency contract across the fold (minhashIndexCompact doc)
          if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1)) {
            PipelineOps.minhashIndexCompact(spark, indexDir); ()
          }
        } finally { sh.unpersist(); () }
    }
  }

  /** Self-deduplicating IMAGE ingest — the multimodal face of
    * [[nearDupStream]]: each micro-batch decodes its payloads and computes
    * perceptual hashes ON EXECUTORS ([[graft.operators.Multimodal.imagePhash]]),
    * finds within-batch near-dup images via the pigeonhole chunk join,
    * probes the persisted phash index for cross-batch duplicates, and
    * appends its own hashes. State is a parquet index (never executor
    * memory); the append is idempotent under batch re-execution (the
    * `batch=<id>` + `_SUCCESS` + `src_batch` discipline). Input schema:
    * `(doc_id: long, payload: binary)`. `compactEvery > 0` periodically
    * folds the accumulated `batch=` dirs into one base dir (same
    * staged-swap + crash-repair machinery as the text stream — a long
    * ingest otherwise grows one parquet dir per micro-batch forever). */
  def imageDedupStream(images: DataFrame, indexDir: String,
                       maxHamming: Int = 3,
                       emit: DataFrame => Unit,
                       compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    hashDedupStream(images, indexDir, maxHamming, emit, compactEvery) {
      (spark, batch) =>
        import spark.implicits._
        val media = batch.select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, p) => graft.operators.Multimodal.MediaRow(id, p, "image") }
        graft.operators.Multimodal.imagePhash(media)
          .select(col("doc_id"), col("phash").as("sh"))
    }

  /** Self-deduplicating AUDIO ingest: identical machinery to
    * [[imageDedupStream]] with the banded-energy PCM fingerprint
    * ([[graft.operators.Multimodal.audioFingerprint]]) as the 64-bit
    * near-dup key — decode and hashing on executors, state in the same
    * parquet index layout, same compaction/repair story. */
  def audioDedupStream(audio: DataFrame, indexDir: String,
                       maxHamming: Int = 3,
                       emit: DataFrame => Unit,
                       compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    hashDedupStream(audio, indexDir, maxHamming, emit, compactEvery) {
      (spark, batch) =>
        import spark.implicits._
        val media = batch.select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .map { case (id, p) => graft.operators.Multimodal.MediaRow(id, p, "audio/wav") }
        graft.operators.Multimodal.audioFingerprints(media)
          .select(col("doc_id"), col("afp").as("sh"))
    }

  /** Namespace a micro-batch id by the streaming QUERY id — stable across
    * driver restarts from the same checkpoint (it lives in the checkpoint
    * metadata), fresh for a new query. Without it, a stream restarted
    * with a NEW checkpoint over an EXISTING index restarts batchIds at 0:
    * its batch-0 append is skipped as an "already committed retry" AND
    * its probe excludes the old run's batch-0 rows — silent missed
    * duplicates both ways (review finding). With it, a same-checkpoint
    * retry maps to the same effective id (idempotent, exclusion correct)
    * while a new run's ids land in their own namespace (probes ALL prior
    * runs, appends commit). 43 hash bits + 20 batch bits, sign bit clear
    * (so the id never collides with the `batch=-1` compaction base);
    * a batchId at or past 2^20 fails loudly instead of wrapping into an
    * earlier batch's id (one million micro-batches per query; a stream
    * that long-lived restarts with a fresh checkpoint = new namespace). */
  private[streaming] def effectiveBatchId(spark: org.apache.spark.sql.SparkSession,
                                          batchId: Long): Long = {
    val key = org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY
    Option(spark.sparkContext.getLocalProperty(key)) match {
      case Some(qid) =>
        // fail LOUDLY at the wrap boundary: past 2^20 micro-batches the
        // masked id would collide with an earlier batch in the same
        // namespace — the append would be silently skipped as a committed
        // retry and the probe would exclude the old rows, losing hashes
        // with no signal (round-12 advice). A query that long-lived must
        // restart with a fresh checkpoint (new namespace) by design.
        require(batchId >= 0 && batchId < (1L << 20),
          s"micro-batch id $batchId exceeds the 2^20 ids available per " +
            "streaming query; restart the stream with a fresh checkpoint " +
            "so its batches get a new index namespace")
        (graft.functions.TextFunctions.fnv64(qid) & 0x7FFFFFFFFFF00000L) |
          batchId
      case None => batchId // non-streaming caller: plain ids
    }
  }

  /** THE 64-bit-hash dedup stream machinery, shared by the image and audio
    * faces so the index discipline cannot drift between modalities:
    * `hashOf` maps a `(doc_id, payload)` micro-batch to `(doc_id, sh)`
    * rows; everything downstream — pigeonhole within-join, history probe,
    * idempotent append, compaction, crash repair — is modality-blind. */
  private def hashDedupStream(media: DataFrame, indexDir: String,
                              maxHamming: Int,
                              emit: DataFrame => Unit,
                              compactEvery: Int)(
      hashOf: (org.apache.spark.sql.SparkSession, DataFrame) => DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.queries.PipelineOps
    // chunk geometry scales with the requested radius (pigeonhole: h+1
    // chunks, single-chunk keys are complete for hamming <= h) and is
    // validated HERE — a bad knob must fail at stream construction, not
    // terminate the query on its first micro-batch (review finding). The
    // upper bound keeps the candidate blow-up sane: h=8 keys on nine
    // evenly-split chunks (one 8-bit, eight 7-bit).
    require(maxHamming >= 1 && maxHamming <= 8,
      s"maxHamming must be in [1, 8], got $maxHamming")
    val chunks = maxHamming + 1
    media.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // query-scoped batch id: retry-idempotent within a checkpoint
        // lineage, collision-free across runs sharing the index dir
        val eb = effectiveBatchId(spark, batchId)
        val sh = hashOf(spark, batch)
        sh.persist() // read three ways: within-join, cross-probe, append
        try {
          // heal a prior run's mid-compaction crash before probing —
          // unconditional, same rule as nearDupStream (a restart with
          // compaction off must still repair)
          if (PipelineOps.indexNeedsRepair(spark, indexDir))
            PipelineOps.repairBandIndex(spark, indexDir)
          val within = PipelineOps.simhashNearDup(sh, maxHamming,
            chunks = chunks, comboSize = 1)
          val pairs =
            if (PipelineOps.indexHasData(spark, indexDir,
                  excludeBatch = Some(eb))) {
              // retried-batch exclusion via the ONE shared reader (an
              // inline copy drifted from minhashDedupIncremental's rule)
              val idx = PipelineOps.readIndexExcluding(spark, indexDir,
                Some(eb))
              within.unionByName(PipelineOps.hashCrossNearDup(
                idx.select(col("doc_id"), col("phash").as("sh")), sh,
                maxHamming, chunks = chunks, comboSize = 1))
            } else within
          emit(pairs)
          PipelineOps.phashIndexAppend(
            sh.select(col("doc_id"), col("sh").as("phash")), indexDir, eb)
          // periodic small-dirs rewrite, identical discipline to
          // nearDupStream: minhashIndexCompact is schema-agnostic (per-dir
          // read + src_batch stamp + staged swap), so the phash index
          // folds with the same crash-repair and retry-idempotency story
          if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1)) {
            PipelineOps.minhashIndexCompact(spark, indexDir); ()
          }
        } finally { sh.unpersist(); () }
    }
  }

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

  /** Streaming cohort retention — the streaming face of `q_retention`:
    * per user, ONE state record (the cohort week fixed at first sight +
    * the weeks already emitted), so state is bounded by the user
    * population, not the event volume; each micro-batch emits exactly the
    * NEW distinct (user, week) activity cells, and a downstream aggregate
    * over (cohort, week_n) reproduces the batch retention table.
    * Contract: feed in event-time order (the watermarked-ingest shape) —
    * the cohort is fixed at first observation, so an event from BEFORE a
    * user's recorded cohort (possible only under out-of-order replay) is
    * dropped rather than silently emitting a negative week. Week starts
    * are computed in UTC, matching the batch query's session timezone. */
  def retentionStream(events: DataFrame)
                     (implicit spark: SparkSession): Dataset[RetOut] = {
    import spark.implicits._
    events.select(col("user_id"), col("ts")).as[RetEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) => {
          def weekStart(t: java.sql.Timestamp): Long = {
            val d = t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
            d.toEpochDay - (d.getDayOfWeek.getValue - 1) // back to Monday
          }
          val weeks = rows.map(e => weekStart(e.ts)).toSeq.distinct.sorted
          val st = state.getOption
          val cohort = st.map(_.cohortWeek).getOrElse(weeks.min)
          val seen = st.map(_.seen.toSet).getOrElse(Set.empty[Long])
          val fresh = weeks.filter(w => w >= cohort && !seen(w))
          state.update(RetState(cohort, (seen ++ fresh).toSeq))
          fresh.iterator.map(w => RetOut(uid,
            java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(cohort)),
            (w - cohort) / 7))
        })
  }

  /** Streaming token-budget shard packing — the streaming face of
    * `doc_pack`, with the one semantic a live packer needs that the batch
    * cumsum form doesn't have: a document NEVER straddles shards (greedy
    * bin-close: a shard closes when the next doc would overflow it; an
    * oversize doc gets a shard of its own). Packing is per `source` key,
    * so each source's shard sequence is independent and the state per
    * group is ONE (shard, fill) pair — bounded by the number of sources
    * at any feed rate, and the shuffle key is the source, so a 100 TB/day
    * feed fans packing out across executors. Within a micro-batch, docs
    * pack in (doc_id) order; across batches, in arrival order — both
    * deterministic for replay, and the spec pins the whole assignment
    * against a driver-side sequential fold. */
  def packStream(docs: DataFrame, budget: Long)
                (implicit spark: SparkSession): Dataset[PackOut] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .as[PackDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[PackDoc], state: GroupState[PackState]) => {
          var s = state.getOption.getOrElse(PackState(0L, 0L))
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            if (s.fill > 0 && s.fill + d.n_tokens > budget)
              s = PackState(s.shard + 1, 0L)
            val o = PackOut(d.doc_id, source, d.n_tokens, s.shard, s.fill)
            s = PackState(s.shard, s.fill + d.n_tokens)
            o
          }
          state.update(s)
          out.iterator
        })
  }
}
