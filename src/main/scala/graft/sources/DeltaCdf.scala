package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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
  * Scale shape — the whole RANGE plans a BOUNDED number of scans: one per
  * change leg (cdc files, fresh adds, full removes, del-swaps, ins-swaps
  * — at most five), never one per commit or per partition tuple. The
  * per-file commit version, timestamp, and partition values ride tiny
  * broadcast (file → metadata) relations joined on the scan's
  * `_metadata.file_path`, so a MERGE touching 10k hour-partitions or a
  * 1,000-commit cold catch-up plans ~5 scans instead of thousands of
  * union branches (review finding: first the synthesis leg and then the
  * cdc leg — the PRIMARY leg for CDF-enabled tables — multiplied plan
  * branches by touched partition tuples per commit; Catalyst analysis was
  * the dominant cost of the read). Data reads remain distributed parquet
  * scans of ONLY the changed files. DV deltas are computed as
  * (file, version, row) ANTI-JOINS of tombstone DataFrames whose decode
  * site is picked from the descriptors' EXACT cardinality metadata — at
  * or below `spark.graft.dvBroadcastRows` the bins decode on the driver
  * and the joins broadcast (zero jobs, the loader's own comfort bound);
  * past it the descriptors (tiny) ship to executors, each task decodes
  * its own bins, and the joins shuffle. Neither the driver nor any single
  * executor ever holds a big DML commit's changed-row set (review
  * finding: the old path decoded every bin driver-side and broadcast the
  * pairs — one commit deleting 1% of a 100 TB table via DVs would OOM
  * the consumer's driver).
  *
  * A `metaData` action INSIDE the range whose schema is incompatible with
  * the range-end schema (a rename or retype — anything but added columns;
  * physical names compare under column mapping, where renames are
  * metadata-only) REFUSES loudly instead of silently null-filling rows
  * read under the old shape — Spark CDF's own behavior (round-19 verdict
  * #4).
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

  // one (path, partitionValues, version, timestamp) slice of a leg; DV
  // descriptors stay AS DESCRIPTORS — decode happens inside the tombstone
  // builders, site chosen from exact cardinality metadata
  private final case class Slice(path: String, pv: Map[String, String],
                                 v: Long, ts: Long,
                                 dv: Option[DeletionVectors.Descriptor] = None)
  private final case class Swap(path: String, pv: Map[String, String],
                                v: Long, ts: Long,
                                fresh: Option[DeletionVectors.Descriptor],
                                old: Option[DeletionVectors.Descriptor])

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

    val logicalData = StructType(
      snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    // column mapping: files store PHYSICAL names — read those, project back
    val dataSchema =
      if (snap.columnMappingMode == "none") logicalData
      else DeltaLoader.physicalize(logicalData).asInstanceOf[StructType]

    def abs(p: String): String =
      if (p.contains("://") || p.startsWith("/")) p
      else new HPath(dir, java.net.URLDecoder.decode(p, "UTF-8")).toString
    def scanKey(path: String): String = PartitionLayout.scanPathKey(abs(path))
    def pvOf(node: JsonNode): Map[String, String] =
      Option(node.get("partitionValues")).filterNot(_.isNull).map { p =>
        p.properties().asScala.map(e => e.getKey ->
          (if (e.getValue.isNull) null else e.getValue.asText())).toMap
      }.getOrElse(Map.empty)
    def descOf(node: JsonNode): Option[DeletionVectors.Descriptor] =
      DeltaCdcShim.parseDv(node.get("deletionVector"))

    // ---- driver-side classification of the WHOLE range ---------------------
    // one pass over the range's commit JSONs (the same order as any log
    // replay) accumulating per-leg slices; the plan below is built ONCE
    // from the accumulated range, never per commit
    val cdcS = Seq.newBuilder[Slice]
    val freshAdds = Seq.newBuilder[Slice]
    val fullRemoves = Seq.newBuilder[Slice]
    val delSwaps = Seq.newBuilder[Swap]
    val insSwaps = Seq.newBuilder[Swap]
    val metaActs = Seq.newBuilder[(Long, JsonNode)]
    inRange.foreach { case (v, name) =>
      val in = fs.open(new HPath(logDir, name))
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val lines = text.split('\n').filter(_.nonEmpty).map(mapper.readTree)
      val ts: Long = lines.iterator
        .flatMap(n => Option(n.get("commitInfo")).filterNot(_.isNull))
        .flatMap(ci => Option(ci.get("timestamp")).filterNot(_.isNull))
        .map(_.asLong()).nextOption()
        .getOrElse(fs.getFileStatus(new HPath(logDir, name)).getModificationTime)

      lines.flatMap(n => Option(n.get("metaData")).filterNot(_.isNull))
        .foreach(m => metaActs += ((v, m)))

      val cdcs = lines.flatMap(n => Option(n.get("cdc")).filterNot(_.isNull))
      if (cdcs.nonEmpty) {
        // protocol rule: when a commit carries cdc actions, they are the
        // COMPLETE change record — add/remove are ignored for change capture
        cdcs.foreach(a => cdcS += Slice(a.get("path").asText(), pvOf(a), v, ts))
      } else {
        // synthesis from file actions. An action MISSING `dataChange`
        // reads as TRUE (the data-changing default): the protocol marks
        // the field required, and a lenient external writer omitting it
        // must surface its changes, not have them silently dropped from
        // the feed (review finding — the old `.exists` filtered
        // absent-field actions out as housekeeping).
        def dataChanging(n: JsonNode): Boolean =
          Option(n.get("dataChange")).filterNot(_.isNull).forall(_.asBoolean(true))
        val adds = lines.flatMap(n => Option(n.get("add")).filterNot(_.isNull))
          .filter(dataChanging)
        val removes = lines.flatMap(n => Option(n.get("remove"))
          .filterNot(_.isNull)).filter(dataChanging)
        val addByPath = adds.map(a => a.get("path").asText() -> a).toMap
        val removeByPath = removes.map(r => r.get("path").asText() -> r).toMap
        addByPath.foreach { case (path, add) =>
          removeByPath.get(path) match {
            case Some(rm) =>
              // DV swap: the asymmetric bitmap delta is this commit's
              // changes — grown (deletes) or shrunk (restore inserts).
              // Equal cardinality with the SAME stored vector is a no-op
              // (skip the scan); equal cardinality with a DIFFERENT
              // vector is a nonconforming writer's combined
              // restore+delete — keep it and diff BOTH directions rather
              // than trusting the containment invariant (review finding:
              // silently skipping it lost both the deletes and the
              // re-inserts)
              val fresh = descOf(add)
              val old = descOf(rm)
              val sameVector = fresh.map(d => (d.storageType, d.pathOrInlineDv,
                d.offset)) == old.map(d => (d.storageType, d.pathOrInlineDv,
                d.offset))
              val fc = fresh.map(_.cardinality).getOrElse(0L)
              val oc = old.map(_.cardinality).getOrElse(0L)
              if (fc != oc || !sameVector) {
                val s = Swap(path, pvOf(add), v, ts, fresh, old)
                // >= / <= : an equal-cardinality different-vector swap
                // rides BOTH legs — each direction's asymmetric diff
                // yields its own changes; conforming swaps land in
                // exactly one leg
                if (fc >= oc) delSwaps += s
                if (fc <= oc) insSwaps += s
              }
            case None =>
              freshAdds += Slice(path, pvOf(add), v, ts, descOf(add))
          }
        }
        removeByPath.foreach { case (path, rm) =>
          if (!addByPath.contains(path))
            fullRemoves += Slice(path, pvOf(rm), v, ts, descOf(rm))
        }
      }
    }

    // schema-evolution guard: a metaData action anywhere in the range
    // means the schema MAY have moved — every schema in force during the
    // range (the range-start snapshot's, when there is one, and each
    // in-range metaData's) must be read-compatible with the range-end
    // schema the scans use, or rows written under the old shape would
    // silently null-fill / misread (round-19 verdict #4; Spark CDF's own
    // refusal). Zero extra work when the range carries no metaData action
    // — the overwhelmingly common tailing tick.
    val metaActions = metaActs.result()
    if (metaActions.nonEmpty) {
      metaActions.foreach { case (v, m) =>
        Option(m.get("schemaString")).filterNot(_.isNull).map(_.asText())
          .foreach { s =>
            requireCompatibleSchema(
              org.apache.spark.sql.types.DataType.fromJson(s)
                .asInstanceOf[StructType], snap, s"version $v", dir)
          }
      }
      if (fromVersion >= 0)
        requireCompatibleSchema(
          DeltaLoader.snapshot(spark, dir, Some(fromVersion)).schema,
          snap, s"the range-start snapshot (version $fromVersion)", dir)
    }

    val threshold = spark.conf.getOption("spark.graft.dvBroadcastRows")
      .map(_.toLong).getOrElse(DeltaLoader.dvBroadcastRows)
    // broadcast hints go on JOIN RIGHT SIDES ONLY, at the use site: a
    // hint baked into the tombstone frame lands on the LEFT of the swap
    // anti-join, where the only broadcast-capable anti-join is a
    // NESTED-LOOP — O(old x new) row comparisons, a 20x regression at
    // bench scale before it ever reaches 100 TB (review finding)
    def bc(frame: (DataFrame, Long)): DataFrame =
      if (frame._2 <= threshold) broadcast(frame._1) else frame._1

    // physical -> logical projection (no-op when unmapped); extras carry
    def toLogical(df: DataFrame, extras: Seq[String]): DataFrame =
      if (snap.columnMappingMode == "none") df
      else df.select(logicalData.fields.zip(dataSchema.fields).map {
        case (lf, pf) => col(s"`${pf.name}`").cast(lf.dataType).as(lf.name)
      }.toIndexedSeq ++ extras.map(e => col(s"`$e`")): _*)

    /** The (__fp, __v, __ts, __pv_*) relation of a leg's slices — the
      * broadcast bridge that lets ONE scan serve every commit and
      * partition tuple of the range. Size is O(touched files), the same
      * order as the driver's own action parse. */
    def metaRelation(slices: Seq[Slice]): DataFrame = {
      val pvSchema = StructType(
        StructField("__fp", StringType, nullable = false) +:
        StructField("__v", LongType, nullable = false) +:
        StructField("__ts", LongType, nullable = false) +:
        snap.partitionColumns.map(c =>
          StructField("__pv_" + c, StringType, nullable = true)))
      val rows = slices.map { s =>
        org.apache.spark.sql.Row.fromSeq(
          scanKey(s.path) +: s.v +: s.ts +: snap.partitionColumns.map { c =>
            val f = snap.schema(c)
            // partitionValues keys are PHYSICAL under column mapping
            s.pv.getOrElse(DeltaLoader.physName(f), s.pv.getOrElse(c, null))
          })
      }
      spark.createDataFrame(rows.asJava, pvSchema)
    }
    def projectMeta(joined: DataFrame, ct: Option[String]): DataFrame = {
      val withPv = snap.partitionColumns.foldLeft(joined) { (acc, c) =>
        acc.withColumn(c, col("__pv_" + c).cast(snap.schema(c).dataType))
      }
      ct.fold(withPv)(t => withPv.withColumn("_change_type", lit(t)))
        .withColumn("_commit_version", col("__v"))
        .withColumn("_commit_timestamp",
          (col("__ts") / lit(1000.0)).cast("timestamp"))
        .select(outputColumns(snap): _*)
    }
    def fpCol: Column = org.apache.spark.sql.functions.regexp_replace(
      col("_metadata.file_path"), "^file:/+", "/")

    // ---- leg 1: cdc files (ONE scan for the whole range) -------------------
    val cdcSlices = cdcS.result()
    val cdcFrame: Option[DataFrame] =
      if (cdcSlices.isEmpty) None
      else {
        val cdcSchema = dataSchema.add("_change_type", StringType)
        val scan = spark.read.schema(cdcSchema)
          .parquet(cdcSlices.map(s => abs(s.path)).distinct: _*)
          .withColumn("__fp", fpCol)
        Some(projectMeta(
          toLogical(scan, Seq("_change_type", "__fp"))
            .join(broadcast(metaRelation(cdcSlices)), Seq("__fp")), None))
      }

    // ---- legs 2-3: unpaired adds / removes (exclude-mode: live rows of
    // whole files, minus any DV the action carries) -------------------------
    def excludeFrame(slices: Seq[Slice], ct: String): Option[DataFrame] = {
      if (slices.isEmpty) return None
      val tombs = dvTombstones(spark, dir, slices.flatMap(s =>
        s.dv.map(d => (scanKey(s.path), s.v, d))), threshold)
      val scan = toLogical(
        spark.read.schema(dataSchema)
          .parquet(slices.map(s => abs(s.path)).distinct: _*)
          .withColumn("__fp", fpCol)
          .withColumn("__ri", col("_metadata.row_index")),
        Seq("__fp", "__ri"))
      // the meta join FANS OUT a path referenced by several commits (a
      // re-added file emits once per commit, each stamped with its own
      // version — the per-commit semantics, preserved); tombstones key on
      // (__fp, __v, __ri) so each emission subtracts its own commit's DV
      val joined = scan.join(broadcast(metaRelation(slices)), Seq("__fp"))
      val live = tombs.fold(joined)(t =>
        joined.join(bc(t), Seq("__fp", "__v", "__ri"), "left_anti"))
      Some(projectMeta(live, Some(ct)))
    }

    // ---- legs 4-5: DV swaps (include-mode: exactly the delta rows) ---------
    def swapFrame(slices: Seq[Swap], grown: Boolean, ct: String)
        : Option[DataFrame] = {
      swapDelta(spark, dir, slices, grown, threshold, scanKey).map { delta =>
        val scan = toLogical(
          spark.read.schema(dataSchema)
            .parquet(slices.map(s => abs(s.path)).distinct: _*)
            .withColumn("__fp", fpCol)
            .withColumn("__ri", col("_metadata.row_index")),
          Seq("__fp", "__ri"))
        // the delta carries __v: a file swapped in many commits of the
        // range is scanned ONCE, each changed row joining its own
        // commit's delta entry; pv/ts then resolve through (__fp, __v)
        val metaByFpV = metaRelation(slices.map(s => Slice(s.path, s.pv, s.v, s.ts)))
        Some(projectMeta(
          scan.join(bc(delta), Seq("__fp", "__ri"))
            .join(broadcast(metaByFpV), Seq("__fp", "__v")), Some(ct)))
      }.getOrElse(None)
    }

    val frames = cdcFrame.toSeq ++
      swapFrame(delSwaps.result(), grown = true, "delete") ++
      swapFrame(insSwaps.result(), grown = false, "insert") ++
      excludeFrame(freshAdds.result(), "insert") ++
      excludeFrame(fullRemoves.result(), "delete")
    if (frames.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(snap.schema.fields ++ Seq(
          StructField("_change_type", StringType),
          StructField("_commit_version", LongType),
          StructField("_commit_timestamp",
            org.apache.spark.sql.types.TimestampType))))
    }
    DistKit.unionTree(frames.toIndexedSeq)
  }

  /** Refuse a range during which schema `mid` was in force unless it is
    * read-COMPATIBLE with the range-end schema: every field of `mid`
    * must still exist at range end with the same name and type (added
    * columns are fine — older files null-fill, Spark CDF's accepted
    * evolution). Under column mapping the comparison runs on PHYSICAL
    * names — a mapped rename is metadata-only and reads correctly. */
  private def requireCompatibleSchema(mid: StructType,
                                      snap: DeltaLoader.Snapshot,
                                      where: String, dir: String): Unit = {
    val mapped = snap.columnMappingMode != "none"
    def keyOf(f: StructField): String =
      if (mapped) DeltaLoader.physName(f) else f.name
    val endByKey = snap.schema.fields.map(f =>
      keyOf(f) -> f.dataType.catalogString).toMap
    val broken = mid.fields.filterNot(f =>
      endByKey.get(keyOf(f)).contains(f.dataType.catalogString))
    require(broken.isEmpty,
      s"loadChanges: the schema at $where of `$dir` is incompatible with " +
        s"the range-end schema (field(s) ${broken.map(_.name).mkString(", ")}" +
        " renamed, retyped, or dropped) — rows written under the old shape " +
        "would misread; consume up to the schema change, re-snapshot, then " +
        "resume past it")
  }

  /** The (file, version, row) tombstones of a DV set as a
    * `(__fp, __v, __ri)` DataFrame — `__fp` in the scan's path domain —
    * plus the EXACT total cardinality so call sites can make their own
    * broadcast decisions. Decode site picked from the descriptors'
    * cardinality metadata (free, like the loader's): at or below
    * `threshold` total rows the bins decode on the driver (one small
    * local relation, zero jobs); past it the DESCRIPTORS (tiny) ship to
    * executors and each task decodes its own bins — the (file, row)
    * pairs never ride the driver (review finding). NO broadcast hint is
    * attached here: the frame lands on BOTH sides of the swap anti-join,
    * and a hint on the left would force the planner's only
    * broadcast-capable anti-join, a nested loop (review finding). */
  private def dvTombstones(spark: SparkSession, dir: String,
                           dvs: Seq[(String, Long, DeletionVectors.Descriptor)],
                           threshold: Long): Option[(DataFrame, Long)] = {
    if (dvs.isEmpty) return None
    import spark.implicits._
    val total = dvs.map(_._3.cardinality).sum
    Some((if (total <= threshold) {
      dvs.flatMap { case (fp, v, d) =>
        DeletionVectors.read(spark.sparkContext.hadoopConfiguration, dir, d)
          .map(ri => (fp, v, ri))
      }.toDF("__fp", "__v", "__ri")
    } else {
      val entries = DistKit.confEntries(spark.sparkContext.hadoopConfiguration)
      val uri = dir
      val slices = math.min(dvs.size,
        spark.sparkContext.defaultParallelism).max(1)
      spark.createDataset(dvs.map { case (fp, v, d) =>
          (fp, v, DeletionVectors.descriptorJson(d)) })
        .repartition(slices)
        .flatMap { case (fp, v, dj) =>
          val conf = DistKit.rebuildConf(entries)
          DeletionVectors.read(conf, uri,
            DeletionVectors.parseDescriptorJson(dj)).iterator
            .map(ri => (fp, v, ri))
        }.toDF("__fp", "__v", "__ri")
    }, total))
  }

  /** The swap legs' changed-row tombstones for the WHOLE range:
    * per (file, commit), (bigger DV) \ (smaller DV) as a
    * `(__fp, __v, __ri)` frame. Below the threshold every bitmap
    * merge-walks on the driver (decoded row indexes are ascending; the
    * plan embeds only the TRUE changed rows — anti-joining two
    * cumulative-bitmap local relations to extract a 100-row delta
    * dominated the whole read, review finding); past it both sides
    * decode executor-side and the diff is a shuffled anti-join keyed
    * (__fp, __v, __ri) — one plan for the range, not one per commit. */
  private def swapDelta(spark: SparkSession, dir: String, slices: Seq[Swap],
                        grown: Boolean, threshold: Long,
                        scanKey: String => String)
      : Option[(DataFrame, Long)] = {
    if (slices.isEmpty) return None
    def bigOf(s: Swap) = if (grown) s.fresh else s.old
    def smallOf(s: Swap) = if (grown) s.old else s.fresh
    val bigCard = slices.flatMap(bigOf).map(_.cardinality).sum
    val smallCard = slices.flatMap(smallOf).map(_.cardinality).sum
    if (bigCard == 0L) return None
    if (bigCard + smallCard <= threshold) {
      import spark.implicits._
      val conf = spark.sparkContext.hadoopConfiguration
      val pairs = slices.flatMap { s =>
        val big = bigOf(s).map(d => DeletionVectors.read(conf, dir, d))
          .getOrElse(Array.empty[Long])
        val small = smallOf(s).map(d => DeletionVectors.read(conf, dir, d))
          .getOrElse(Array.empty[Long])
        sortedMinus(big, small).map(ri => (scanKey(s.path), s.v, ri))
      }
      if (pairs.isEmpty) None
      else Some((pairs.toDF("__fp", "__v", "__ri"), pairs.size.toLong))
    } else {
      val bigger = slices.flatMap(s =>
        bigOf(s).map(d => (scanKey(s.path), s.v, d)))
      val smaller = slices.flatMap(s =>
        smallOf(s).map(d => (scanKey(s.path), s.v, d)))
      dvTombstones(spark, dir, bigger, threshold).map { case (big, _) =>
        val delta = dvTombstones(spark, dir, smaller, threshold)
          .fold(big) { case (small, sc) =>
            big.join(if (sc <= threshold) broadcast(small) else small,
              Seq("__fp", "__v", "__ri"), "left_anti")
          }
        // the delta is at most the bigger bitmap — its cardinality
        // bound rides along for the include-join's broadcast decision
        (delta, bigCard)
      }
    }
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
