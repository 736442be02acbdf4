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

  test("streaming dedup keeps one row per distinct text within the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String)]
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    in.addData((t(0), "alpha doc"), (t(1), "beta doc"), (t(2), "alpha doc"),
      (t(3), "gamma doc"), (t(4), "beta doc"))
    val q = EventStream.dedupDocStream(
      in.toDF().toDF("ts", "text"), horizon = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "stream did not drain in time")
      val texts = spark.table("dedup_stream").select("text")
        .collect().map(_.getString(0)).toSeq
      assert(texts.sorted === Seq("alpha doc", "beta doc", "gamma doc"))
    } finally q.stop()
  }

  test("stream-stream interval join pairs views with follow-up actions") {
    val events = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.viewToAction(events)
      .writeStream.outputMode("append").format("memory").queryName("view_act")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(180000), "stream did not drain in time")
      val got = spark.table("view_act")
      // must agree exactly with the equivalent batch interval join
      val batch = graft.Tables.t(spark, sf0001, "events")
      val v = batch.filter("event_type = 'view'")
        .selectExpr("user_id", "ts AS view_ts", "event_id AS view_id")
      val a = batch.filter("event_type IN ('click','purchase')")
        .selectExpr("user_id AS a_uid", "ts AS act_ts", "event_type AS action", "value")
      val expected = v.join(a, v("user_id") === a("a_uid") &&
        a("act_ts") >= v("view_ts") &&
        a("act_ts") <= v("view_ts") + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
        .count()
      assert(got.count() === expected)
      assert(got.filter("act_ts < view_ts").count() === 0)
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

  test("streaming quality filter drops low-quality docs statelessly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val good = Seq.fill(8)(
      "the quick brown fox jumps over the lazy dog and it is a good day to run").mkString(" ")
    in.addData(good, "!!!", "a b")
    val q = EventStream.qualityFilterStream(in.toDF().toDF("text"), minQuality = 0.8)
      .writeStream.outputMode("append").format("memory").queryName("qfilter")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "stream did not drain in time")
      val texts = spark.table("qfilter").select("text").collect().map(_.getString(0))
      assert(texts.length === 1 && texts.head.startsWith("the quick"))
    } finally q.stop()
  }

  test("self-deduplicating stream emits exactly the full-corpus near-dup pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf0001, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val idxDir = java.nio.file.Files.createTempDirectory("mhstream").toString + "/idx"
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set[(Long, Long)]()
    val q = EventStream.nearDupStream(
        in.toDF().toDF("doc_id", "text"), idxDir, threshold = 0.3,
        emit = pairs => got ++= pairs.select("doc_a", "doc_b").collect()
          .map(r => (math.min(r.getLong(0), r.getLong(1)),
            math.max(r.getLong(0), r.getLong(1)))))
      .start()
    try {
      // three arrival waves; each must dedup against itself AND all history
      for (wave <- 0 until 3) {
        in.addData(docs.filter(_._1 % 3 == wave).toSeq: _*)
        q.processAllAvailable()
      }
      val full = graft.queries.PipelineOps.minhashLshJoin(
          graft.Tables.t(spark, sf0001, "documents").select(col("doc_id"),
            graft.functions.TextFunctions.shingles(col("text"), 3).as("sh")),
          threshold = 0.3)
        .select("doc_a", "doc_b").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      assert(full.nonEmpty, "fixture corpus should contain near-dups")
      assert(got.toSet == full,
        s"stream pairs != batch pairs: missing ${full -- got}, extra ${got.toSet -- full}")
    } finally q.stop()
  }

  test("image-dedup stream finds within-batch and cross-batch duplicate images") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.Multimodal
    // ids congruent mod 256 render IDENTICAL images: (17, 273) duplicates
    // split across waves, (20, 276) within one wave
    val wave1 = Seq(17L, 20L, 276L)
    val wave2 = Seq(273L, 19L)
    val all = wave1 ++ wave2
    def img(id: Long): (Long, Array[Byte]) = (id, Multimodal.synthImageBytes(id)._1)
    val idxDir = java.nio.file.Files.createTempDirectory("phstream").toString + "/idx"
    val in = MemoryStream[(Long, Array[Byte])]
    val got = scala.collection.mutable.Set[(Long, Long)]()
    val q = EventStream.imageDedupStream(
        in.toDF().toDF("doc_id", "payload"), idxDir, maxHamming = 3,
        emit = pairs => got ++= pairs.select("doc_a", "doc_b").collect()
          .map(r => (math.min(r.getLong(0), r.getLong(1)),
            math.max(r.getLong(0), r.getLong(1)))))
      .start()
    try {
      in.addData(wave1.map(img): _*); q.processAllAvailable()
      in.addData(wave2.map(img): _*); q.processAllAvailable()
      // brute expectation over every ingested image
      val ph = all.map(id =>
        id -> Multimodal.grayPhash(Multimodal.decodeImage(Multimodal.synthImageBytes(id)._1))).toMap
      val expected = (for {
        a <- all; b <- all if a < b
        if java.lang.Long.bitCount(ph(a) ^ ph(b)) <= 3
      } yield (a, b)).toSet
      assert(expected.contains((20L, 276L)), "within-wave duplicate expected")
      assert(expected.contains((17L, 273L)), "cross-wave duplicate expected")
      assert(got.toSet == expected,
        s"stream pairs != brute pairs: missing ${expected -- got}, extra ${got.toSet -- expected}")
    } finally q.stop()
  }

  test("effectiveBatchId: plain outside streams, query-scoped and retry-stable inside") {
    val sc = spark.sparkContext
    val key = org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY
    assert(sc.getLocalProperty(key) == null)
    assert(EventStream.effectiveBatchId(spark, 7L) == 7L)
    try {
      sc.setLocalProperty(key, "q-one")
      val a0 = EventStream.effectiveBatchId(spark, 0L)
      val a1 = EventStream.effectiveBatchId(spark, 1L)
      assert(a0 >= 0L && a0 != -1L, "must never collide with the batch=-1 base dir")
      assert((a0 & 0xFFFFFL) == 0L && (a1 & 0xFFFFFL) == 1L)
      assert(EventStream.effectiveBatchId(spark, 0L) == a0, "retry-stable")
      sc.setLocalProperty(key, "q-two")
      assert(EventStream.effectiveBatchId(spark, 0L) != a0,
        "a different query must land in its own namespace")
    } finally sc.setLocalProperty(key, null)
  }

  test("audio-dedup stream finds within-batch and cross-batch duplicate audio") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.Multimodal
    // ids congruent mod 256 carry IDENTICAL waveforms: (17, 273) split
    // across waves, (20, 276) within one wave
    val wave1 = Seq(17L, 20L, 276L)
    val wave2 = Seq(273L, 19L)
    val all = wave1 ++ wave2
    def wav(id: Long): (Long, Array[Byte]) =
      (id, Multimodal.wavBytes(Multimodal.synthDedupAudioSamples(id)))
    val idxDir = java.nio.file.Files.createTempDirectory("afpstream").toString + "/idx"
    val in = MemoryStream[(Long, Array[Byte])]
    val got = scala.collection.mutable.Set[(Long, Long)]()
    val q = EventStream.audioDedupStream(
        in.toDF().toDF("doc_id", "payload"), idxDir, maxHamming = 3,
        emit = pairs => got ++= pairs.select("doc_a", "doc_b").collect()
          .map(r => (math.min(r.getLong(0), r.getLong(1)),
            math.max(r.getLong(0), r.getLong(1)))),
        compactEvery = 1)
      .start()
    try {
      in.addData(wave1.map(wav): _*); q.processAllAvailable()
      in.addData(wave2.map(wav): _*); q.processAllAvailable()
      val fp = all.map(id =>
        id -> Multimodal.audioFingerprint(Multimodal.synthDedupAudioSamples(id))).toMap
      val expected = (for {
        a <- all; b <- all if a < b
        if java.lang.Long.bitCount(fp(a) ^ fp(b)) <= 3
      } yield (a, b)).toSet
      assert(expected.contains((20L, 276L)), "within-wave duplicate expected")
      assert(expected.contains((17L, 273L)), "cross-wave duplicate expected")
      assert(got.toSet == expected,
        s"stream pairs != brute pairs: missing ${expected -- got}, extra ${got.toSet -- expected}")
    } finally q.stop()
  }

  test("image-dedup stream compaction: identical pairs across fold, crash, and re-fold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.queries.PipelineOps
    val wave1 = Seq(17L, 20L, 276L)
    val wave2 = Seq(273L, 19L)
    def img(id: Long): (Long, Array[Byte]) = (id, Multimodal.synthImageBytes(id)._1)
    val root = java.nio.file.Files.createTempDirectory("phcompact").toString + "/idx"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs = fs.listStatus(rootPath).filter(s => s.isDirectory &&
      fs.listStatus(s.getPath).exists(_.getPath.getName.startsWith("part-")))
    val in = MemoryStream[(Long, Array[Byte])]
    val got = scala.collection.mutable.Set[(Long, Long)]()
    def norm(pairs: org.apache.spark.sql.DataFrame) =
      pairs.select("doc_a", "doc_b").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1))))
    val q = EventStream.imageDedupStream(
        in.toDF().toDF("doc_id", "payload"), root, maxHamming = 3,
        emit = pairs => got ++= norm(pairs), compactEvery = 1)
      .start()
    try {
      in.addData(wave1.map(img): _*); q.processAllAvailable()
      // batch 0 folded into the single base dir, source cleared to marker
      assert(dataDirs.map(_.getPath.getName).toSeq == Seq("batch=-1"))
      // mid-swap crash from a "previous" compaction: base parked away
      assert(fs.rename(new org.apache.hadoop.fs.Path(rootPath, "batch=-1"),
        new org.apache.hadoop.fs.Path(rootPath, ".compact_old")))
      assert(PipelineOps.indexNeedsRepair(spark, root))
      // next micro-batch heals before probing: the cross-wave pair appears
      in.addData(wave2.map(img): _*); q.processAllAvailable()
      assert(dataDirs.map(_.getPath.getName).toSeq == Seq("batch=-1"),
        "re-fold after crash repair must leave a single base dir")
      val all = wave1 ++ wave2
      val ph = all.map(id =>
        id -> Multimodal.grayPhash(Multimodal.decodeImage(Multimodal.synthImageBytes(id)._1))).toMap
      val expected = (for {
        a <- all; b <- all if a < b
        if java.lang.Long.bitCount(ph(a) ^ ph(b)) <= 3
      } yield (a, b)).toSet
      assert(expected.contains((17L, 273L)), "cross-wave duplicate expected")
      assert(got.toSet == expected,
        s"compacted stream pairs != brute pairs: missing ${expected -- got}, extra ${got.toSet -- expected}")
    } finally q.stop()
    // restart with compaction OFF after another mid-swap crash: the repair
    // must still run (unconditional), or the probe silently misses history
    assert(fs.rename(new org.apache.hadoop.fs.Path(rootPath, "batch=-1"),
      new org.apache.hadoop.fs.Path(rootPath, ".compact_old")))
    val in2 = MemoryStream[(Long, Array[Byte])]
    val got2 = scala.collection.mutable.Set[(Long, Long)]()
    val q2 = EventStream.imageDedupStream(
        in2.toDF().toDF("doc_id", "payload"), root, maxHamming = 3,
        emit = pairs => got2 ++= norm(pairs), compactEvery = 0)
      .start()
    try {
      // 529 % 256 == 17: identical image to 17 AND 273. The new query's
      // batch ids are namespaced by its query id (effectiveBatchId), so
      // the prior run's batch-0 rows are NOT mistaken for this query's
      // own retry — BOTH history pairs must surface (a bare batchId
      // exclusion silently dropped (17, 529))
      in2.addData(img(529L)); q2.processAllAvailable()
      assert(got2.contains((273L, 529L)) && got2.contains((17L, 529L)),
        s"fresh run over an existing index must probe ALL history, got $got2")
    } finally q2.stop()
  }

  test("near-dup index append is idempotent and retry-safe under batch re-execution") {
    import org.apache.spark.sql.functions._
    import graft.queries.PipelineOps
    val root = java.nio.file.Files.createTempDirectory("mhretry").toString + "/idx"
    val sh = graft.Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
    // half-written garbage (no _SUCCESS) is not index state
    val partial = new java.io.File(root + "/batch=0")
    partial.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(root + "/batch=0/part-00000-junk"),
      Array[Byte](1, 2, 3))
    assert(!PipelineOps.indexHasData(spark, root),
      "uncommitted part- files must not count as index data")
    assert(!PipelineOps.indexBatchCommitted(spark, root, 0L))
    // committed append; a retry of the same batchId is a no-op
    PipelineOps.minhashIndexAppend(sh, root, batchId = 0L)
    assert(PipelineOps.indexBatchCommitted(spark, root, 0L))
    val n1 = spark.read.parquet(root).count()
    PipelineOps.minhashIndexAppend(sh, root, batchId = 0L) // the retry
    assert(spark.read.parquet(root).count() === n1,
      "retried append duplicated signatures")
    // a retried batch excludes its own committed partition from the probe:
    // no history besides itself -> nothing to probe, and no self-pairs
    assert(!PipelineOps.indexHasData(spark, root, excludeBatch = Some(0L)),
      "a batch's own partition is not probe-able history for its retry")
    assert(PipelineOps.indexHasData(spark, root),
      "the committed partition IS history for later batches")
    // even probing an index that already contains the incoming docs emits
    // no jaccard-1.0 self-pairs (the doc_a =!= doc_b guard)
    val selfPairs = PipelineOps.minhashDedupIncremental(sh, root, threshold = 0.3)
      .filter(col("doc_a") === col("doc_b")).count()
    assert(selfPairs === 0L, "self-pairs leaked through the incremental probe")
    // a later batch both probes history and commits its own partition
    val sh2 = graft.Tables.t(spark, sf0001, "documents")
      .filter(col("doc_id") >= 20 && col("doc_id") < 40)
      .select(col("doc_id"), graft.functions.TextFunctions.shingles(col("text"), 3).as("sh"))
    PipelineOps.minhashIndexAppend(sh2, root, batchId = 1L)
    assert(PipelineOps.indexBatchCommitted(spark, root, 1L))
    assert(spark.read.parquet(root).count() > n1)
  }

  test("streaming mixture sampling admits exactly the batch mixture") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf0001, "documents")
    val rates = Map("src0" -> 1.0, "src1" -> 0.0)
    val in = MemoryStream[(Long, String)]
    in.addData(docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
    val q = EventStream.mixtureSampleStream(
        in.toDF().toDF("doc_id", "source"), rates, defaultRate = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("mixgate")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "stream did not drain in time")
      val got = spark.table("mixgate").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      val h = graft.functions.TextFunctions.fnvMix64(
        concat(lit("mix-42-"), col("doc_id").cast("string")))
      val expect = graft.queries.PipelineOps.mixtureSample(
          docs.withColumn("h", h), rates, defaultRate = 0.5,
          sourceCol = "source", hashCol = "h")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect && got.nonEmpty)
    } finally q.stop()
  }

  test("streaming decontamination agrees with the batch operator (stream-static join)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf0001, "documents")
    val probes = docs.filter(col("source") === "src0")
      .select(explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("shingle"))
      .distinct()
    val train = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text")).limit(100)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    in.addData(train.toSeq)
    val q = EventStream.decontaminateStream(in.toDF().toDF("doc_id", "text"), probes, n = 5)
      .writeStream.outputMode("complete").format("memory").queryName("decontam")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(180000), "stream did not drain in time")
      val got = spark.table("decontam").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val trainInv = docs.filter(col("source") =!= "src0")
        .join(spark.createDataset(train.map(_._1).toSeq).toDF("doc_id"), "doc_id")
        .select(col("doc_id"), explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("shingle"))
      val expected = graft.queries.PipelineOps.decontaminate(trainInv, probes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming shard packing: never-straddle bins, state carries across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val in = MemoryStream[(Long, String, String)]
    // two sources, word counts 3/2/4; budget 5 forces bin closes
    val b1 = Seq(
      (1L, "web", "a b c"), (2L, "web", "d e"), (3L, "web", "f g h i"),
      (10L, "book", "one two three four"))
    val b2 = Seq(
      (4L, "web", "j k l"), (11L, "book", "five six seven"),
      (12L, "book", "eight"))
    val q = EventStream.packStream(
        in.toDF().toDF("doc_id", "source", "text"), budget = 5L)
      .writeStream.outputMode("append").format("memory").queryName("pack_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("pack_stream")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      // driver replica: per-source greedy fold over the same arrival order
      def fold(docs: Seq[(Long, Long)], start: (Long, Long)): (Seq[(Long, Long, Long)], (Long, Long)) = {
        var (shard, fill) = start
        val out = docs.map { case (id, n) =>
          if (fill > 0 && fill + n > 5) { shard += 1; fill = 0 }
          val o = (id, shard, fill); fill += n; o
        }
        (out, (shard, fill))
      }
      val (w1, ws) = fold(Seq((1L, 3L), (2L, 2L), (3L, 4L)), (0L, 0L))
      val (w2, _) = fold(Seq((4L, 3L)), ws)
      val (k1, ks) = fold(Seq((10L, 4L)), (0L, 0L))
      val (k2, _) = fold(Seq((11L, 3L), (12L, 1L)), ks)
      val expect = (w1 ++ w2).map { case (id, sh, off) => (id, "web", sh, off) } ++
        (k1 ++ k2).map { case (id, sh, off) => (id, "book", sh, off) }
      val expectSorted = expect.sortBy(_._1)
      assert(got.map(g => (g._1, g._2, g._4, g._5)) == expectSorted)
      // no shard exceeds the budget (the never-straddle property)
      val byShard = got.groupBy(g => (g._2, g._4)).values
      assert(byShard.forall(docs => docs.map(_._3).sum <= 5 || docs.size == 1))
    } finally q.stop()
  }

  test("streaming cohort retention equals the batch q_retention table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = graft.Tables.t(spark, sf0001, "events")
      .select(col("user_id"), col("ts").cast("timestamp_ltz").as("ts"))
      .orderBy(col("ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    // two event-time-ordered micro-batches (the watermarked-ingest contract)
    val (b1, b2) = events.splitAt(events.length / 2)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStream.retentionStream(in.toDF().toDF("user_id", "ts"))
      .writeStream.outputMode("append").format("memory").queryName("ret_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("ret_stream")
        .groupBy(col("cohort"), col("week_n"))
        .agg(count(lit(1)).as("n_active"))
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      val expect = graft.SparkEntry.queries("q_retention")(spark, sf0001)
        .select(col("cohort"), col("week_n"), col("n_active"))
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == expect)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("retention stream drops pre-cohort stragglers instead of emitting negative weeks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.LocalDate.of(2024, 1, day).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStream.retentionStream(in.toDF().toDF("user_id", "ts"))
      .writeStream.outputMode("append").format("memory").queryName("ret_oo")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((7L, ts(15))); q.processAllAvailable()   // cohort = week of Jan 15
      in.addData((7L, ts(2)), (7L, ts(22))); q.processAllAvailable() // Jan 2 is PRE-cohort
      val got = spark.table("ret_oo").collect()
        .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
      // week 0 (first sight) and week 1 (Jan 22); the Jan 2 straggler is dropped
      assert(got == Seq((7L, 0L), (7L, 1L)))
    } finally q.stop()
  }
}
