package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Delta Change Data Feed: incremental consumption of row-level changes
  * between two table versions (delta.io PROTOCOL.md §Change Data Files &
  * §Add CDC File — the `cdc` action + `_change_data/` files, plus the
  * protocol's permitted reconstruction of changes from add/remove actions
  * when a commit carries no cdc action).
  *
  * Why this matters at 100 TB: [[DeltaDml]] produces row-level changes for
  * O(touched-file bitmaps), but a downstream pipeline could only consume
  * them by rescanning the full snapshot after every upstream commit. With
  * CDF, the consumer reads exactly the delta: cdc files when the writer
  * recorded them (O(changed rows) on disk, zero reconstruction), or a
  * synthesized stream from the log's add/remove/DV actions otherwise.
  *
  * Output schema: the table's columns plus `_change_type`
  * (`insert` / `delete` / `update_preimage` / `update_postimage`),
  * `_commit_version`, `_commit_timestamp` — upstream's column contract.
  *
  * Synthesis rules for commits WITHOUT cdc actions (each `dataChange=true`
  * action; `dataChange=false` housekeeping — compaction, checkpoint-adds —
  * contributes nothing, per protocol):
  *  - add(path) paired with remove(path) in the same commit is a DV swap:
  *    the changed rows are (new DV) \ (old DV) of that file → `delete`
  *    (with pre-image values read from the file — the data bytes are
  *    immutable, only the bitmap moved). A swap whose bitmap SHRANK is a
  *    RESTORE (revert to an ancestor's DV): the un-doomed rows
  *    (old DV) \ (new DV) re-enter the feed as `insert`. Per file the two
  *    cannot mix — bitmaps only grow along a commit chain and a restore
  *    reverts to an ancestor's subset, so one side is always contained in
  *    the other and the EXACT cardinality metadata picks the direction
  *    without decoding anything;
  *  - an unpaired add is a fresh file: its live rows (minus any DV the add
  *    carries) → `insert`;
  *  - an unpaired remove drops a whole file: its rows live at removal
  *    (minus the remove's DV) → `delete`.
  * UPDATEs synthesize as delete+insert pairs (the protocol's fallback has
  * no way to correlate pre/post images); writers that want true
  * `update_preimage`/`update_postimage` rows enable CDF so [[DeltaDml]]
  * records cdc files.
  *
  * Scale shape: planning is driver-side metadata (the commit JSONs of the
  * range — the same order as any log replay); data reads are distributed
  * parquet scans of ONLY the changed files. DV deltas are computed as
  * (file, row) ANTI-JOINS of tombstone DataFrames whose decode site is
  * picked from the descriptors' EXACT cardinality metadata — at or below
  * `spark.graft.dvBroadcastRows` the bins decode on the driver and the
  * joins broadcast (zero jobs, the loader's own comfort bound); past it
  * the descriptors (tiny) ship to executors, each task decodes its own
  * bins, and the joins shuffle. Neither the driver nor any single
  * executor ever holds a big DML commit's changed-row set (review
  * finding: the old path decoded every bin driver-side and broadcast the
  * pairs — one commit deleting 1% of a 100 TB table via DVs would OOM
  * the consumer's driver).
  *
  * Column-mapped tables are supported: files (data AND cdc) read the
  * PHYSICALIZED schema and project back to logical names, and
  * partitionValues keys resolve through each column's physical name — the
  * same read-logical split the loader uses. */
object DeltaCdf {

  private val mapper = new ObjectMapper()

  /** Enable CDF on an existing table: one commit that upgrades the
    * protocol with the `changeDataFeed` writer feature (surgical, like the
    * DV upgrade) and sets `delta.enableChangeDataFeed=true`. From the NEXT
    * commit on, [[DeltaDml]] records cdc files. Returns the committed
    * version (or -1 when already enabled). */
  def enableCdf(spark: SparkSession, dir: String): Long = {
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = DeltaWriter.logDirOf(root)
    val snap = DeltaLoader.snapshot(spark, dir)
    val protoLine = DeltaDml.protocolUpgradeLine(snap.protocolJson,
      "changeDataFeed", readerToo = false)
    val metaLine: Option[String] = snap.metaDataJson.flatMap { raw =>
      val node = mapper.readTree(raw)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val cfg = Option(node.get("configuration")).filterNot(_.isNull)
        .map(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
        .getOrElse(node.putObject("configuration"))
      if (Option(cfg.get("delta.enableChangeDataFeed"))
          .exists(v => !v.isNull && v.asText() == "true")) None
      else {
        cfg.put("delta.enableChangeDataFeed", "true")
        Some(s"""{"metaData":${mapper.writeValueAsString(node)}}""")
      }
    }
    if (protoLine.isEmpty && metaLine.isEmpty) return -1L
    val now = System.currentTimeMillis()
    val commitInfo =
      s"""{"commitInfo":{"timestamp":$now,"operation":"SET TBLPROPERTIES",""" +
        """"operationParameters":{},"engineInfo":"graft-delta-writer"}}"""
    val version = snap.version + 1
    require(DeltaWriter.commitJson(fs, new HPath(logDir, f"$version%020d.json"),
        (Seq(commitInfo) ++ protoLine.toSeq ++ metaLine.toSeq)
          .mkString("", "\n", "\n")),
      s"enableCdf lost a commit race at version $version; re-run against " +
        "the refreshed table")
    version
  }

  /** The change rows of versions (fromVersion, toVersion] — EXCLUSIVE of
    * `fromVersion` (the consumer has already seen that state), inclusive
    * of `toVersion` (default: the latest version). */
  def loadChanges(spark: SparkSession, dir: String, fromVersion: Long,
                  toVersion: Option[Long] = None): DataFrame = {
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = DeltaWriter.logDirOf(root)
    require(fs.isDirectory(logDir), s"`$dir` is not a Delta table")
    val snap = DeltaLoader.snapshot(spark, dir)
    val to = toVersion.getOrElse(snap.version)
    require(fromVersion <= to,
      s"loadChanges: fromVersion $fromVersion is above toVersion $to")

    val commitRx = raw"(\d{20})\.json".r
    val inRange = fs.listStatus(logDir).map(_.getPath.getName).collect {
      case n @ commitRx(v) if v.toLong > fromVersion && v.toLong <= to =>
        v.toLong -> n
    }.sortBy(_._1)
    // EVERY version of the range must be present — a partially-retired
    // range (cleanupLog took the older half) must refuse, not silently
    // skip the missing versions' changes (delta versions are consecutive
    // integers, so presence is checkable exactly)
    val missing = ((fromVersion + 1) to to).filterNot(inRange.map(_._1).toSet)
    require(missing.isEmpty,
      s"loadChanges: commit JSON for version(s) ${missing.take(5).mkString(", ")}" +
        s" of ($fromVersion, $to] was log-retired (cleanupLog); change " +
        "feeds need the range's commits retained")

    val logicalData = org.apache.spark.sql.types.StructType(
      snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    // column mapping: files store PHYSICAL names — read those, project back
    val dataSchema =
      if (snap.columnMappingMode == "none") logicalData
      else DeltaLoader.physicalize(logicalData)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    val frames = inRange.flatMap { case (v, name) =>
      commitChanges(spark, fs, dir, logDir, name, v, snap, logicalData, dataSchema)
    }
    if (frames.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(snap.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_commit_timestamp",
            org.apache.spark.sql.types.TimestampType))))
      return empty
    }
    // pairwise: a thousand-commit range must not plan a thousand-deep
    // union (review finding — DeltaWriter.unionTree's blow-up, same cure)
    DistKit.unionTree(frames.toIndexedSeq)
  }

  // ---- per-commit change extraction ------------------------------------------

  private def commitChanges(spark: SparkSession, fs: FileSystem, dir: String,
                            logDir: HPath, name: String, v: Long,
                            snap: DeltaLoader.Snapshot,
                            logicalData: org.apache.spark.sql.types.StructType,
                            dataSchema: org.apache.spark.sql.types.StructType)
      : Seq[DataFrame] = {
    // physical -> logical projection (no-op when unmapped); extras carry
    def toLogical(df: DataFrame, extras: Seq[String]): DataFrame =
      if (snap.columnMappingMode == "none") df
      else df.select(logicalData.fields.zip(dataSchema.fields).map {
        case (lf, pf) => col(s"`${pf.name}`").cast(lf.dataType).as(lf.name)
      }.toIndexedSeq ++ extras.map(e => col(s"`$e`")): _*)
    val in = fs.open(new HPath(logDir, name))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val lines = text.split('\n').filter(_.nonEmpty).map(mapper.readTree)

    val ts: Long = lines.iterator
      .flatMap(n => Option(n.get("commitInfo")).filterNot(_.isNull))
      .flatMap(ci => Option(ci.get("timestamp")).filterNot(_.isNull))
      .map(_.asLong()).nextOption()
      .getOrElse(fs.getFileStatus(new HPath(logDir, name)).getModificationTime)
    def stamp(df: DataFrame, changeType: Option[String]): DataFrame = {
      val base = changeType.fold(df)(t => df.withColumn("_change_type", lit(t)))
      base
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          (lit(ts) / lit(1000.0)).cast("timestamp"))
    }
    def abs(p: String): String =
      if (p.contains("://") || p.startsWith("/")) p
      else new HPath(dir, java.net.URLDecoder.decode(p, "UTF-8")).toString
    def pvOf(node: JsonNode): Map[String, String] =
      Option(node.get("partitionValues")).filterNot(_.isNull).map { p =>
        p.properties().asScala.map(e => e.getKey ->
          (if (e.getValue.isNull) null else e.getValue.asText())).toMap
      }.getOrElse(Map.empty)
    def withPartitions(df: DataFrame, pv: Map[String, String]): DataFrame =
      snap.partitionColumns.foldLeft(df) { (acc, c) =>
        val f = snap.schema(c)
        // partitionValues keys are PHYSICAL under column mapping
        val value = pv.getOrElse(DeltaLoader.physName(f), pv.getOrElse(c, null))
        acc.withColumn(c, lit(value).cast(f.dataType))
      }
    val cdcs = lines.flatMap(n => Option(n.get("cdc")).filterNot(_.isNull))
    if (cdcs.nonEmpty) {
      // protocol rule: when a commit carries cdc actions, they are the
      // COMPLETE change record — add/remove are ignored for change capture
      val cdcSchema = dataSchema.add("_change_type",
        org.apache.spark.sql.types.StringType)
      return cdcs.toSeq.groupBy(pvOf).map { case (pv, actions) =>
        val df = spark.read.schema(cdcSchema)
          .parquet(actions.map(a => abs(a.get("path").asText())): _*)
        stamp(withPartitions(toLogical(df, Seq("_change_type")), pv), None)
          .select(outputColumns(snap): _*)
      }.toSeq
    }

    // synthesis from file actions — grouped so plan branches scale with
    // touched PARTITION TUPLES, not files: a DML commit touching 10k files
    // in one partition synthesizes as ONE grouped scan per (tuple, mode)
    // (review finding). An action MISSING `dataChange` reads as TRUE (the
    // data-changing default): the protocol marks the field required, and a
    // lenient external writer omitting it must surface its changes, not
    // have them silently dropped from the feed (review finding — the old
    // `.exists` filtered absent-field actions out as housekeeping).
    def dataChanging(n: JsonNode): Boolean =
      Option(n.get("dataChange")).filterNot(_.isNull).forall(_.asBoolean(true))
    val adds = lines.flatMap(n => Option(n.get("add")).filterNot(_.isNull))
      .filter(dataChanging)
    val removes = lines.flatMap(n => Option(n.get("remove")).filterNot(_.isNull))
      .filter(dataChanging)
    val addByPath = adds.map(a => a.get("path").asText() -> a).toMap
    val removeByPath = removes.map(r => r.get("path").asText() -> r).toMap
    def scanKey(path: String): String = PartitionLayout.scanPathKey(abs(path))
    def descOf(node: JsonNode): Option[DeletionVectors.Descriptor] =
      DeltaCdcShim.parseDv(node.get("deletionVector"))

    // (path, pv) slices per mode, with their DV descriptors kept AS
    // DESCRIPTORS — decode happens inside [[dvTombstones]], site chosen
    // from the exact cardinality metadata, never unconditionally on the
    // driver (review finding)
    val swaps = Seq.newBuilder[(String, Map[String, String],
      Option[DeletionVectors.Descriptor], Option[DeletionVectors.Descriptor])]
    val freshAdds = Seq.newBuilder[(String, Map[String, String],
      Option[DeletionVectors.Descriptor])]
    val fullRemoves = Seq.newBuilder[(String, Map[String, String],
      Option[DeletionVectors.Descriptor])]
    addByPath.foreach { case (path, add) =>
      removeByPath.get(path) match {
        case Some(rm) =>
          // DV swap: the asymmetric bitmap delta is this commit's changes
          // — grown (deletes) or shrunk (restore inserts). Equal
          // cardinality with the SAME stored vector is a no-op (skip the
          // scan); equal cardinality with a DIFFERENT vector is a
          // nonconforming writer's combined restore+delete — keep it and
          // diff BOTH directions below rather than trusting the
          // containment invariant (review finding: silently skipping it
          // lost both the deletes and the re-inserts)
          val fresh = descOf(add)
          val old = descOf(rm)
          val sameVector = fresh.map(d => (d.storageType, d.pathOrInlineDv,
            d.offset)) == old.map(d => (d.storageType, d.pathOrInlineDv,
            d.offset))
          if (fresh.map(_.cardinality).getOrElse(0L) !=
                old.map(_.cardinality).getOrElse(0L) || !sameVector)
            swaps += ((path, pvOf(add), fresh, old))
        case None =>
          freshAdds += ((path, pvOf(add), descOf(add)))
      }
    }
    removeByPath.foreach { case (path, rm) =>
      if (!addByPath.contains(path))
        fullRemoves += ((path, pvOf(rm), descOf(rm)))
    }
    val threshold = spark.conf.getOption("spark.graft.dvBroadcastRows")
      .map(_.toLong).getOrElse(DeltaLoader.dvBroadcastRows)

    // swap deltas: (bigger DV) \ (smaller DV) over (file, row) — an
    // anti-join of the two tombstone frames, the
    // [[IcebergIncremental.changesBetween]] plan shape. Below the
    // threshold both sides are broadcast-decoded and the delta
    // re-broadcasts for the semi-join (tiny by construction); past it
    // everything shuffles. Grown bitmaps feed the `delete` leg, shrunk
    // ones (RESTORE commits) the `insert` leg — per file exactly one
    // applies, decided from the descriptors' exact cardinalities.
    def cardOf(d: Option[DeletionVectors.Descriptor]): Long =
      d.map(_.cardinality).getOrElse(0L)
    val swapsL = swaps.result()
    // >= / <= : an equal-cardinality different-vector swap (nonconforming
    // writer) rides BOTH legs — each direction's asymmetric diff yields
    // its own changes; conforming swaps land in exactly one leg
    val delSwaps = swapsL.filter(s => cardOf(s._3) >= cardOf(s._4))
    val insSwaps = swapsL.filter(s => cardOf(s._3) <= cardOf(s._4))
    // broadcast hints go on JOIN RIGHT SIDES ONLY, at the use site: a
    // hint baked into the tombstone frame lands on the LEFT of the swap
    // anti-join, where the only broadcast-capable anti-join is a
    // NESTED-LOOP — O(old x new) row comparisons, a 20x regression at
    // bench scale before it ever reaches 100 TB (review finding)
    def bc(frame: (DataFrame, Long)): DataFrame =
      if (frame._2 <= threshold) broadcast(frame._1) else frame._1
    def swapDeltaOf(slices: Seq[(String, Map[String, String],
        Option[DeletionVectors.Descriptor], Option[DeletionVectors.Descriptor])],
        grown: Boolean): Option[(DataFrame, Long)] = {
      if (slices.isEmpty) return None
      val bigger = slices.flatMap { s =>
        (if (grown) s._3 else s._4).map(d => (scanKey(s._1), d)) }
      val smaller = slices.flatMap { s =>
        (if (grown) s._4 else s._3).map(d => (scanKey(s._1), d)) }
      val bigCard = bigger.map(_._2.cardinality).sum
      val smallCard = smaller.map(_._2.cardinality).sum
      if (bigCard == 0L) None
      else if (bigCard + smallCard <= threshold) {
        // both bitmaps are driver-decode-sized: the delta comes from a
        // sorted merge-walk per file (decoded row indexes are ascending),
        // so the plan embeds only the TRUE changed rows — anti-joining
        // two cumulative-bitmap local relations to extract a 100-row
        // delta dominated the whole read (review finding)
        import spark.implicits._
        val conf = spark.sparkContext.hadoopConfiguration
        val smallByKey = smaller.groupBy(_._1)
        val pairs = bigger.flatMap { case (k, d) =>
          val big = DeletionVectors.read(conf, dir, d)
          val small = smallByKey.get(k)
            .map(s => DeletionVectors.read(conf, dir, s.head._2))
            .getOrElse(Array.empty[Long])
          sortedMinus(big, small).map(ri => (k, ri))
        }
        if (pairs.isEmpty) None
        else Some((pairs.toDF("__fp", "__ri"), pairs.size.toLong))
      } else dvTombstones(spark, dir, bigger, threshold)
        .map { case (big, _) =>
          val delta = dvTombstones(spark, dir, smaller, threshold)
            .fold(big)(small =>
              big.join(bc(small), Seq("__fp", "__ri"), "left_anti"))
          // the delta is at most the bigger bitmap — its cardinality
          // bound rides along for the semi-join's broadcast decision
          (delta, bigCard)
        }
    }
    val swapDelete = swapDeltaOf(delSwaps, grown = true)
    val swapRestore = swapDeltaOf(insSwaps, grown = false)
    val addTombs = dvTombstones(spark, dir, freshAdds.result().flatMap {
      case (p, _, d) => d.map(x => (scanKey(p), x)) }, threshold)
    val removeTombs = dvTombstones(spark, dir, fullRemoves.result().flatMap {
      case (p, _, d) => d.map(x => (scanKey(p), x)) }, threshold)

    /** ONE scan per synthesis mode — not per partition tuple. Partition
      * values ride a tiny broadcast (file -> tuple) relation joined on
      * `__fp`, so plan width per commit is the MODE count (≤4) and the
      * tombstone relations stop multiplying by the table's partition
      * count (review finding: the per-tuple union branches made Catalyst
      * analysis the dominant cost of the read — 5+ driver seconds on a
      * 6-tuple fixture). `include` semi-joins the tombstones (row-level
      * deltas), exclude mode anti-joins them (live rows of whole files). */
    def modeFrame(slices: Seq[(String, Map[String, String])],
                  tombs: Option[(DataFrame, Long)], include: Boolean,
                  ct: String): Seq[DataFrame] = {
      if (slices.isEmpty || (include && tombs.isEmpty)) return Seq.empty
      val scan = toLogical(
        spark.read.schema(dataSchema).parquet(slices.map(g => abs(g._1)): _*)
          .withColumn("__fp", org.apache.spark.sql.functions.regexp_replace(
            col("_metadata.file_path"), "^file:/+", "/"))
          .withColumn("__ri", col("_metadata.row_index")),
        Seq("__fp", "__ri"))
      val joined = tombs match {
        case None => scan
        case Some(t) => scan.join(bc(t), Seq("__fp", "__ri"),
          if (include) "left_semi" else "left_anti")
      }
      val withPv =
        if (snap.partitionColumns.isEmpty) joined
        else {
          val pvSchema = org.apache.spark.sql.types.StructType(
            org.apache.spark.sql.types.StructField("__fp",
              org.apache.spark.sql.types.StringType, nullable = false) +:
            snap.partitionColumns.map(c => org.apache.spark.sql.types
              .StructField("__pv_" + c,
                org.apache.spark.sql.types.StringType, nullable = true)))
          val rows = slices.map { case (p, pv) =>
            org.apache.spark.sql.Row.fromSeq(
              scanKey(p) +: snap.partitionColumns.map { c =>
                val f = snap.schema(c)
                // partitionValues keys are PHYSICAL under column mapping
                pv.getOrElse(DeltaLoader.physName(f), pv.getOrElse(c, null))
              })
          }
          val pvDf = spark.createDataFrame(rows.asJava, pvSchema)
          snap.partitionColumns.foldLeft(
            joined.join(broadcast(pvDf), Seq("__fp"))) { (acc, c) =>
              acc.withColumn(c, col("__pv_" + c).cast(snap.schema(c).dataType))
          }.drop(snap.partitionColumns.map("__pv_" + _): _*)
        }
      Seq(stamp(withPv.drop("__fp", "__ri"), Some(ct))
        .select(outputColumns(snap): _*))
    }

    modeFrame(delSwaps.map(s => (s._1, s._2)), swapDelete,
        include = true, "delete") ++
      modeFrame(insSwaps.map(s => (s._1, s._2)), swapRestore,
        include = true, "insert") ++
      modeFrame(freshAdds.result().map(s => (s._1, s._2)), addTombs,
        include = false, "insert") ++
      modeFrame(fullRemoves.result().map(s => (s._1, s._2)), removeTombs,
        include = false, "delete")
  }

  /** The (file, row) tombstones of a DV set as a `(__fp, __ri)` DataFrame
    * — `__fp` in the scan's path domain — plus the EXACT total cardinality
    * so call sites can make their own broadcast decisions. Decode site
    * picked from the descriptors' cardinality metadata (free, like the
    * loader's): at or below `threshold` total rows the bins decode on the
    * driver (one small local relation, zero jobs); past it the
    * DESCRIPTORS (tiny) ship to executors and each task decodes its own
    * bins — the (file, row) pairs never ride the driver (review finding).
    * NO broadcast hint is attached here: the frame lands on BOTH sides of
    * the swap anti-join, and a hint on the left would force the planner's
    * only broadcast-capable anti-join, a nested loop (review finding). */
  private def dvTombstones(spark: SparkSession, dir: String,
                           dvs: Seq[(String, DeletionVectors.Descriptor)],
                           threshold: Long): Option[(DataFrame, Long)] = {
    if (dvs.isEmpty) return None
    import spark.implicits._
    val total = dvs.map(_._2.cardinality).sum
    Some((if (total <= threshold) {
      dvs.flatMap { case (fp, d) =>
        DeletionVectors.read(spark.sparkContext.hadoopConfiguration, dir, d)
          .map(ri => (fp, ri))
      }.toDF("__fp", "__ri")
    } else {
      val entries = DistKit.confEntries(spark.sparkContext.hadoopConfiguration)
      val uri = dir
      val slices = math.min(dvs.size,
        spark.sparkContext.defaultParallelism).max(1)
      spark.createDataset(dvs.map { case (fp, d) =>
          (fp, DeletionVectors.descriptorJson(d)) })
        .repartition(slices)
        .flatMap { case (fp, dj) =>
          val conf = DistKit.rebuildConf(entries)
          DeletionVectors.read(conf, uri,
            DeletionVectors.parseDescriptorJson(dj)).iterator.map(ri => (fp, ri))
        }.toDF("__fp", "__ri")
    }, total))
  }

  /** a \ b over two ASCENDING row-index arrays (decoded DV order) — one
    * linear walk, no boxing, no Set (advisor finding: toSet+filterNot
    * boxed cumulative bitmaps on the driver). */
  private def sortedMinus(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    val out = Array.newBuilder[Long]
    var i = 0; var j = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) out += a(i)
      i += 1
    }
    out.result()
  }

  private def outputColumns(snap: DeltaLoader.Snapshot): Seq[Column] =
    snap.schema.fieldNames.toSeq.map(n => col(s"`$n`")) ++
      Seq(col("_change_type"), col("_commit_version"), col("_commit_timestamp"))
}

/** Descriptor parsing shared with the loader (kept tiny and local — the
  * loader's parseDv is private). */
private[sources] object DeltaCdcShim {
  def parseDv(node: JsonNode): Option[DeletionVectors.Descriptor] =
    Option(node).filterNot(_.isNull).map { d =>
      DeletionVectors.Descriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong())
    }
}
