package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental consumption of an Iceberg table: the rows APPENDED between
  * two snapshots, without rescanning the snapshot (iceberg spec §Snapshots
  * — each manifest-list entry records `added_snapshot_id`, and each
  * manifest entry its status, so the appended file set of any snapshot
  * range is pure metadata work; upstream's `appendsBetween` reads the same
  * channel).
  *
  * Why this matters at 100 TB: [[IcebergDml]]/[[IcebergWriter]] produce
  * row-level changes, but until now nothing could CONSUME them
  * incrementally — a pipeline reprocessed the full snapshot after every
  * upstream commit. With this, a downstream job processes exactly the
  * delta: O(appended files), zero snapshot rescan.
  *
  * Semantics (upstream's): only `append` snapshots contribute; `replace`
  * snapshots (compaction, z-order) are SKIPPED — they rewrite existing
  * rows, adding nothing logically; `delete`/`overwrite` snapshots REFUSE
  * by default (an append-only consumer reading across a row-level DML
  * would silently miss its deletes — the caller must opt in via
  * `skipNonAppend=true` after deciding deletes are handled elsewhere). */
object IcebergIncremental {

  /** The table's current snapshot id (-1 when it has none) — what an
    * incremental consumer records as its checkpoint after each read. */
  def currentSnapshotId(spark: SparkSession, dir: String): Long = {
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    Option(meta.get("current-snapshot-id")).filterNot(_.isNull)
      .map(_.asLong()).getOrElse(-1L)
  }

  /** The snapshot id at most `steps` snapshots (by sequence order) past
    * `fromId` on the way to `endId` — [[graft.streaming.ChangeTail]]'s
    * backlog chopper for snapshot-id cursors (ids are random longs, so
    * chopping walks the table's snapshot list rather than doing
    * arithmetic). `fromId = -1` means "before the first snapshot".
    * Metadata-only: one JSON read, no manifests touched. */
  def chopEnd(spark: SparkSession, dir: String, fromId: Long, endId: Long,
              steps: Int): Long = {
    require(steps > 0, s"chopEnd: steps must be positive, got $steps")
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val snaps: Seq[JsonNode] = Option(meta.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    def seqOf(s: JsonNode): Long =
      Option(s.get("sequence-number")).filterNot(_.isNull).map(_.asLong())
        .getOrElse(0L)
    def seqOfId(id: Long): Long =
      snaps.find(_.get("snapshot-id").asLong() == id).map(seqOf)
        .getOrElse(throw new IllegalArgumentException(
          s"chopEnd: snapshot $id not found in `$dir`"))
    val fromSeq = if (fromId == -1L) -1L else seqOfId(fromId)
    val endSeq = seqOfId(endId)
    val range = snaps.filter(s => seqOf(s) > fromSeq && seqOf(s) <= endSeq)
      .sortBy(seqOf)
    range.take(steps).lastOption
      .map(_.get("snapshot-id").asLong()).getOrElse(endId)
  }

  /** Rows appended strictly AFTER `fromSnapshotId` up to and including
    * `toSnapshotId` (defaults: current snapshot). `fromSnapshotId = -1`
    * means "from the beginning" (every append since table creation). */
  def appendsBetween(spark: SparkSession, dir: String,
                     fromSnapshotId: Long,
                     toSnapshotId: Option[Long] = None,
                     skipNonAppend: Boolean = false): DataFrame = {
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val snaps: Seq[JsonNode] = Option(meta.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    def seqOf(s: JsonNode): Long =
      Option(s.get("sequence-number")).filterNot(_.isNull).map(_.asLong())
        .getOrElse(0L)
    def byId(id: Long): JsonNode = snaps.find(_.get("snapshot-id").asLong() == id)
      .getOrElse(throw new IllegalArgumentException(
        s"IcebergIncremental: snapshot $id not found in `$dir`"))
    val to = toSnapshotId.map(byId).orElse(
      IcebergLoader.chooseSnapshot(meta, dir, None)).getOrElse(
        throw new IllegalArgumentException(
          s"IcebergIncremental: `$dir` has no current snapshot"))
    val fromSeq = if (fromSnapshotId == -1L) -1L else seqOf(byId(fromSnapshotId))
    val toSeq = seqOf(to)
    require(fromSeq <= toSeq,
      s"IcebergIncremental: from-snapshot (seq $fromSeq) is newer than " +
        s"to-snapshot (seq $toSeq)")

    // the range, oldest-first by sequence; ancestry runs through sequence
    // numbers (every commit advances last-sequence-number, so the range is
    // totally ordered even across branches this writer never creates)
    val range = snaps.filter(s => seqOf(s) > fromSeq && seqOf(s) <= toSeq)
      .sortBy(seqOf)
    val appends: Seq[JsonNode] = range.flatMap { s =>
      val op = Option(s.get("summary")).filterNot(_.isNull)
        .flatMap(x => Option(x.get("operation"))).map(_.asText())
        .getOrElse("append")
      op match {
        case "append" => Some(s)
        case "replace" => None // rewrites, nothing logically new
        case other =>
          if (skipNonAppend) None
          else throw new IllegalArgumentException(
            s"IcebergIncremental: snapshot ${s.get("snapshot-id").asLong()} " +
              s"is a `$other` — its row-level deletes would be silently " +
              "missed by an append-only scan; pass skipNonAppend=true to " +
              "read across it anyway")
      }
    }
    if (appends.isEmpty)
      return emptyLike(spark, meta, to)

    // EACH append snapshot's OWN manifest list names the manifests it
    // added (`added_snapshot_id` = it) — the to-snapshot's list alone
    // would miss appends whose manifests a later compaction rewrote out
    // of the current list. Metadata-only: no data file is opened here.
    // Files carry the SCHEMA-ID of the snapshot that added them, so a
    // rename between snapshots reads through field ids below.
    val remap = IcebergLoader.pathRemapper(meta, dir)
    val files = Seq.newBuilder[(Int, String)]
    appends.foreach { s =>
      val sid = s.get("snapshot-id").asLong()
      val schemaId = Option(s.get("schema-id")).filterNot(_.isNull)
        .map(_.asInt()).getOrElse(-1)
      val listPath = Option(s.get("manifest-list")).filterNot(_.isNull)
        .map(_.asText()).getOrElse(throw new IllegalArgumentException(
          s"IcebergIncremental: snapshot $sid has no manifest-list (expired? " +
            "incremental reads need the range's snapshots to be retained)"))
      IcebergLoader.readAvro(fs, new HPath(remap(listPath))).foreach { m =>
        val addedBy = Option(m.get("added_snapshot_id"))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(-1L)
        val content = Option(m.get("content"))
          .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
        if (content == 0 && addedBy == sid) {
          val mp = remap(String.valueOf(m.get("manifest_path")))
          IcebergLoader.readAvro(fs, new HPath(mp)).foreach { e =>
            val status = IcebergLoader.longOr(e, "status", 1L)
            if (status == 1L) { // ADDED by this manifest's snapshot
              val df = e.get("data_file").asInstanceOf[
                org.apache.avro.generic.GenericRecord]
              files += ((schemaId, remap(IcebergLoader.str(df, "file_path"))))
            }
          }
        }
      }
    }
    val paths = files.result().distinct
    if (paths.isEmpty) return emptyLike(spark, meta, to)
    val groups = paths.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (sid, ps) => (sid, ps.map(_._2)) }
    val frames = groups.map { case (schemaId, ps) =>
      projectedRead(spark, meta, to, schemaId, ps)
    }
    if (frames.size == 1) frames.head else DistKit.unionTree(frames)
  }

  /** Read data files added under schema `schemaId`, projected to the
    * range-END schema by FIELD ID: the files read under the names of the
    * schema that WROTE them, then each end field resolves through its id
    * (iceberg spec §Schemas: ids are the identity, names are labels — a
    * rename between snapshots is metadata-only, and name-based
    * projection null-filled the renamed column for older files; round-19
    * verdict #4). A field id absent from the writing schema null-fills
    * (column added later); type promotions ride a cast. Snapshots that
    * recorded no schema-id (minimal v1 writers) read with the end
    * schema — the previous behavior. Plan width: one scan per DISTINCT
    * in-range schema version, typically one. Top-level fields only, like
    * the reader's equality-delete resolution. */
  private def projectedRead(spark: SparkSession, meta: JsonNode, to: JsonNode,
                            schemaId: Int, paths: Seq[String],
                            /** keep a `__fp` column (scan-domain file
                              * path) for (file -> metadata) stamping
                              * joins. */
                            keepFp: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val endNode = IcebergLoader.schemaNodeFor(meta, Some(to))
    val endSchema = IcebergLoader.sparkSchemaOf(endNode)
    val endSchemaId = Option(endNode.get("schema-id")).filterNot(_.isNull)
      .map(_.asInt()).getOrElse(-1)
    val srcNode =
      if (schemaId == -1 || schemaId == endSchemaId) None
      else Option(meta.get("schemas")).filterNot(_.isNull)
        .flatMap(_.elements().asScala.find(_.get("schema-id").asInt() == schemaId))
    def withFp(df: DataFrame): DataFrame =
      if (keepFp) df.withColumn("__fp",
        IcebergLoader.normFp(col("_metadata.file_path")))
      else df
    srcNode match {
      case None => withFp(spark.read.schema(endSchema).parquet(paths: _*))
      case Some(sn) =>
        val srcSchema = IcebergLoader.sparkSchemaOf(sn)
        val srcIdToName = IcebergLoader.fieldIdToName(sn)
        val srcNames = srcIdToName.values.toSet
        val endIds = endNode.get("fields").elements().asScala
          .map(_.get("id").asInt()).toSeq
        val scan = withFp(spark.read.schema(srcSchema).parquet(paths: _*))
        scan.select(endIds.zip(endSchema.fields).map { case (fid, ef) =>
          // id match first (renames); a field id absent from the source
          // schema falls back to NAME — iceberg's name-mapping rule,
          // which keeps tables whose rewrite re-assigned every id (this
          // writer's overwrite does) reading correctly. Only a field
          // matching by NEITHER id nor name (genuinely added later)
          // null-fills.
          srcIdToName.get(fid)
              .orElse(Some(ef.name).filter(srcNames.contains)) match {
            case Some(n) => col(s"`$n`").cast(ef.dataType).as(ef.name)
            case None => lit(null).cast(ef.dataType).as(ef.name)
          }
        }.toSeq ++ (if (keepFp) Seq(col("__fp")) else Seq.empty): _*)
    }
  }

  /** Row-level CHANGELOG between snapshots — [[DeltaCdf]]'s sibling for
    * the other format: per in-range snapshot, `insert` rows from its ADDED
    * data files and `delete` rows (pre-images, read from the referenced
    * data files) from its ADDED position-delete files; `replace` snapshots
    * contribute nothing. Output: the table's columns plus `_change_type`,
    * `_snapshot_id`, `_commit_timestamp`.
    *
    * v2 position deletes are read DIRECTLY (each delete file added at a
    * snapshot is that snapshot's delta — [[IcebergDml]] writes exactly
    * per-commit deltas). v3 puffin DVs are CUMULATIVE per file, so their
    * per-snapshot delta is computed as (rows doomed at s) ANTI-JOIN (rows
    * doomed at s's parent) over the referenced files — which also makes
    * the v2→v3 migration commit read correctly (migrated old deletes
    * subtract out). A snapshot that DROPS whole data files (an
    * `overwrite` write replacing the table, an external engine's
    * metadata-only whole-file delete) emits the dropped files' parent-
    * state live rows as `delete` — detected by diffing the parent's live
    * data-file set, which catches both manifest representations
    * (status=2 entries AND manifests simply not carried forward; review
    * finding: deletes were previously derived solely from ADDED delete
    * files, so an overwrite synthesized inserts with no deletes — a
    * silently wrong change stream). Updates surface as delete+insert (no
    * pre/post correlation exists).
    *
    * Equality deletes refuse loudly by default: their pre-images are
    * keys, not rows — materializing them means scanning every older data
    * file for matches, a cost this changelog will not hide. Pass
    * `equalityNetChanges=true` to opt in: pre-images are then computed as
    * (parent live rows of data files with sequence strictly below the
    * delete's) SEMI-JOIN (the delete files' key tuples, null-safe, newest
    * sequence per tuple) — the same strictly-below rule the read path
    * enforces ([[IcebergLoader.applyEqualityDeletes]]), restricted to the
    * candidate files, distributed. That closes the loop
    * [[IcebergDml.upsertByEquality]] opens: tables maintained by the
    * zero-scan streaming upsert become changelog-consumable at the
    * documented extra cost of scanning the below-sequence files once per
    * eq-delete snapshot.
    *
    * Scale shape: planning is per-snapshot manifest metadata; inserts are
    * distributed scans of only the added files; each snapshot's delete
    * pre-images read only the files its deletes reference, with the
    * (file, row) tombstones riding the same broadcast-or-shuffle join the
    * reader uses. Plan WIDTH is bounded per range for the legs whose
    * semantics allow it — inserts (one scan per in-range schema version),
    * v2 position deletes (one delete-file scan + one pre-image scan), v3
    * DV diffs (scan-free per-snapshot tombstone frames + one pre-image
    * scan). The equality-delete and whole-file-drop legs are inherently
    * per-snapshot (each needs its OWN parent's live state, which a shared
    * scan cannot represent); a consumer catching up over an eq-heavy
    * history bounds its plans with [[graft.streaming.ChangeTail]]'s
    * `maxSnapshotsPerBatch` chopper instead. */
  def changesBetween(spark: SparkSession, dir: String,
                     fromSnapshotId: Long,
                     toSnapshotId: Option[Long] = None,
                     equalityNetChanges: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val snaps: Seq[JsonNode] = Option(meta.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    def seqOf(s: JsonNode): Long =
      Option(s.get("sequence-number")).filterNot(_.isNull).map(_.asLong())
        .getOrElse(0L)
    def byId(id: Long): JsonNode = snaps.find(_.get("snapshot-id").asLong() == id)
      .getOrElse(throw new IllegalArgumentException(
        s"IcebergIncremental: snapshot $id not found in `$dir`"))
    val to = toSnapshotId.map(byId).orElse(
      IcebergLoader.chooseSnapshot(meta, dir, None)).getOrElse(
        throw new IllegalArgumentException(
          s"IcebergIncremental: `$dir` has no current snapshot"))
    val fromSeq = if (fromSnapshotId == -1L) -1L else seqOf(byId(fromSnapshotId))
    val range = snaps.filter(s => seqOf(s) > fromSeq && seqOf(s) <= seqOf(to))
      .sortBy(seqOf)
      .filterNot(s => Option(s.get("summary")).filterNot(_.isNull)
        .flatMap(x => Option(x.get("operation"))).map(_.asText())
        .contains("replace"))

    val remap = IcebergLoader.pathRemapper(meta, dir)
    val schemaNode = IcebergLoader.schemaNodeFor(meta, Some(to))
    val schema = IcebergLoader.sparkSchemaOf(schemaNode)
    val outCols = schema.fieldNames.toSeq.map(n => col(s"`$n`")) ++
      Seq(col("_change_type"), col("_snapshot_id"), col("_commit_timestamp"))

    // snapshot plans memoized per id: the parent-state legs below (file
    // drops, DV diffs, eq-delete pre-images) re-plan the same snapshots —
    // consecutive snapshots share their parent, so caching keeps the
    // metadata walk O(range), not O(range^2)
    val planCache = scala.collection.mutable.Map.empty[
      Long, IcebergLoader.PlannedScan]
    def planOf(node: JsonNode): IcebergLoader.PlannedScan =
      planCache.getOrElseUpdate(node.get("snapshot-id").asLong(),
        IcebergLoader.planSnapshot(fs, dir, meta, Some(node)))
    // manifest LISTS are read once per snapshot (one small avro each) —
    // shared by the per-snapshot walk and the drop guard below
    val listCache = scala.collection.mutable.Map.empty[
      Long, Seq[org.apache.avro.generic.GenericRecord]]
    def listOf(node: JsonNode): Seq[org.apache.avro.generic.GenericRecord] =
      listCache.getOrElseUpdate(node.get("snapshot-id").asLong(), {
        val sid = node.get("snapshot-id").asLong()
        val lp = Option(node.get("manifest-list")).filterNot(_.isNull)
          .map(_.asText()).getOrElse(throw new IllegalArgumentException(
            s"IcebergIncremental: snapshot $sid has no manifest-list (expired?)"))
        IcebergLoader.readAvro(fs, new HPath(remap(lp)))
      })
    def dataManifestsOf(node: JsonNode): Set[String] = listOf(node).iterator
      .filter { m =>
        Option(m.getSchema.getField("content"))
          .flatMap(_ => Option(m.get("content")))
          .map(_.asInstanceOf[Number].intValue()).getOrElse(0) == 0
      }.map(m => String.valueOf(m.get("manifest_path"))).toSet

    val frames = Seq.newBuilder[DataFrame]
    // insert slices accumulate ACROSS snapshots: the insert leg — the
    // dominant leg of append-mostly histories — plans ONE scan per
    // distinct in-range schema version for the whole range, with each
    // file's snapshot id and timestamp riding a broadcast (file -> meta)
    // relation (the DeltaCdf range-collapse, applied to this reader: a
    // 1,000-append catch-up must not plan 1,000 scan branches). Delete
    // legs stay per-snapshot — they need parent-state context and are
    // rare per snapshot.
    val inserts = Seq.newBuilder[(Int, Long, Long, String)]
    // v2 position-delete legs collapse the same way: each delete FILE is
    // one snapshot's delta, so the whole range needs ONE delete-file
    // scan, ONE referenced-file discovery job, and ONE pre-image scan —
    // per-file snapshot stamps ride a broadcast (delete-file -> meta)
    // relation (previously one leg of all three per DML snapshot: a
    // 1,000-commit DML history planned 1,000 pre-image scans)
    val posLegs = Seq.newBuilder[(Long, Long, Seq[(String, Long)])]
    // v3 DV legs: per-snapshot stamped diff frames (scan-free) + the dvs
    // whose referenced files feed the ONE collapsed pre-image scan
    val dvLegs = Seq.newBuilder[(Long, Long, DataFrame,
      Seq[IcebergLoader.DvFile])]
    range.foreach { s =>
      val sid = s.get("snapshot-id").asLong()
      val ts = Option(s.get("timestamp-ms")).filterNot(_.isNull)
        .map(_.asLong()).getOrElse(0L)
      def stamp(df: DataFrame, ct: String): DataFrame = df
        .withColumn("_change_type", lit(ct))
        .withColumn("_snapshot_id", lit(sid))
        .withColumn("_commit_timestamp", (lit(ts) / lit(1000.0)).cast("timestamp"))
        .select(outCols: _*)
      val added = Seq.newBuilder[String] // data files
      val posDeletes = Seq.newBuilder[(String, Long)] // (path, recorded bytes)
      val dvAdded = Seq.newBuilder[IcebergLoader.DvFile] // v3 merged DVs
      val eqAdded = Seq.newBuilder[IcebergLoader.EqDeleteFile]
      listOf(s).foreach { m =>
        val addedBy = Option(m.get("added_snapshot_id"))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(-1L)
        if (addedBy == sid) {
          val mp = remap(String.valueOf(m.get("manifest_path")))
          val mseq = IcebergLoader.longOr(m, "sequence_number", 0L)
          IcebergLoader.readAvro(fs, new HPath(mp)).foreach { e =>
            if (IcebergLoader.longOr(e, "status", 1L) == 1L) {
              val df = e.get("data_file").asInstanceOf[
                org.apache.avro.generic.GenericRecord]
              val content = Option(df.getSchema.getField("content"))
                .flatMap(_ => Option(df.get("content")))
                .map(_.asInstanceOf[Number].intValue()).getOrElse(0)
              val fmt = String.valueOf(df.get("file_format")).toUpperCase
              val fp = remap(IcebergLoader.str(df, "file_path"))
              content match {
                case 0 => added += fp
                case 1 if fmt == "PARQUET" =>
                  posDeletes += ((fp,
                    IcebergLoader.longOr(df, "file_size_in_bytes", -1L)))
                case 1 =>
                  // v3 DV: the entry carries the file's MERGED bitmap;
                  // the per-snapshot delta is diffed below against the
                  // parent snapshot's doomed set
                  val ref = Option(df.getSchema.getField("referenced_data_file"))
                    .flatMap(_ => Option(df.get("referenced_data_file")))
                    .map(r => remap(String.valueOf(r)))
                    .getOrElse(throw new IllegalArgumentException(
                      s"changesBetween: puffin delete in snapshot $sid " +
                        "carries no referenced_data_file"))
                  dvAdded += IcebergLoader.DvFile(fp, ref,
                    IcebergLoader.longOr(df, "content_offset", -1L),
                    IcebergLoader.longOr(df, "content_size_in_bytes", -1L))
                case 2 =>
                  if (!equalityNetChanges) throw new IllegalArgumentException(
                    s"changesBetween: snapshot $sid adds an equality-delete " +
                      "file — its pre-images are keys, not rows (reading " +
                      "them means scanning every below-sequence file for " +
                      "matches); pass equalityNetChanges=true to pay that " +
                      "scan, or consume this table through full scans")
                  val ids = Option(df.getSchema.getField("equality_ids"))
                    .flatMap(_ => Option(df.get("equality_ids")))
                    .map(_.asInstanceOf[java.util.Collection[_]].asScala.toSeq
                      .map(_.asInstanceOf[Number].intValue()))
                    .getOrElse(Seq.empty)
                  require(ids.nonEmpty, "changesBetween: equality delete " +
                    s"file `$fp` carries no equality_ids")
                  eqAdded += IcebergLoader.EqDeleteFile(fp,
                    IcebergLoader.longOr(e, "sequence_number", mseq), ids,
                    IcebergLoader.longOr(df, "file_size_in_bytes", -1L))
                case _ => ()
              }
            }
          }
        }
      }
      // whole-file drops: an `overwrite` truncate-and-replace (or an
      // external engine's metadata-only file delete) removes data files
      // without adding any delete file — diff the PARENT's live data-file
      // set and emit the dropped files' parent-state live rows as
      // `delete` (review finding: deriving deletes solely from added
      // delete files synthesized an overwrite as inserts with NO deletes).
      // The diff catches both manifest representations — status=2 entries
      // and manifests simply not carried forward. Appends never drop
      // files, so the append-heavy common case pays no extra planning.
      val parentNode = snaps.filter(p => seqOf(p) < seqOf(s)).sortBy(seqOf)
        .lastOption
      // cheap no-drop proof FIRST: every parent DATA manifest carried
      // VERBATIM into s means no data file was removed (dropping a file
      // rewrites or omits the manifest that held it) — DML and append
      // snapshots carry data manifests forward untouched, so the common
      // case costs two cached manifest-LIST reads and never plans the
      // parent (review finding: unconditional planSnapshot of s AND
      // parent per snapshot tripled the changelog's metadata time). The
      // guard deliberately does NOT key on summary.operation: the summary
      // is optional (v1 tables, minimal writers), and a file-dropping
      // snapshot without one would read as "append" and bypass an
      // op-keyed check entirely (review finding).
      if (parentNode.isDefined &&
          !dataManifestsOf(parentNode.get).subsetOf(dataManifestsOf(s))) {
        val sLive = planOf(s).dataFiles
          .map(f => PartitionLayout.scanPathKey(f._1)).toSet
        val pPlan = planOf(parentNode.get)
        val removed = pPlan.dataFiles.filterNot(f =>
          sLive(PartitionLayout.scanPathKey(f._1)))
        if (removed.nonEmpty) {
          val rmKeys = removed.map(f => PartitionLayout.scanPathKey(f._1)).toSet
          // the parent's FULL delete state applies (pos-delete files may
          // reference surviving files too — the joins drop non-matches);
          // DVs restrict to the dropped files so no bin decodes for nothing
          val restricted = pPlan.copy(dataFiles = removed,
            deletionVectors = pPlan.deletionVectors.filter(d =>
              rmKeys(PartitionLayout.scanPathKey(d.referencedDataFile))))
          val tombs = IcebergLoader.positionTombstones(
            spark, fs, dir, meta, restricted)
          frames += stamp(IcebergLoader.scanLive(spark, schemaNode,
            restricted, removed.map(_._1), tombs), "delete")
        }
      }
      val addedFiles = added.result().distinct
      if (addedFiles.nonEmpty) {
        // files carry the ADDING snapshot's schema-id (renames between
        // snapshots are metadata-only; see [[projectedRead]]) — scanned
        // once per schema version for the WHOLE range, after the loop
        val schemaId = Option(s.get("schema-id")).filterNot(_.isNull)
          .map(_.asInt()).getOrElse(-1)
        addedFiles.foreach(p => inserts += ((schemaId, sid, ts, p)))
      }
      // distinct on the PAIRS keeps paths and recorded sizes aligned
      // (the broadcast-vs-shuffle choice reads them positionally);
      // pre-image scans plan ONCE for the whole range, after the loop
      val delPairs = posDeletes.result().distinctBy(_._1)
      if (delPairs.nonEmpty) posLegs += ((sid, ts, delPairs))
      // v3 deletion vectors: the added entry is the file's MERGED bitmap,
      // so this snapshot's delta = (doomed at s) ANTI-JOIN (doomed at
      // parent) over the referenced files — pos deletes and prior DVs in
      // the parent state both subtract, which also makes the v2→v3
      // migration commit emit only genuinely new deletes. The tombstone
      // diff frames are SCAN-FREE (puffin blobs decode in flatMap tasks,
      // parent walks are cached metadata), so they stay per-snapshot;
      // the pre-image DATA scan — the plan-width cost — collapses to one
      // per range, after the loop.
      val dvs = dvAdded.result().distinctBy(_.referencedDataFile)
      if (dvs.nonEmpty) {
        val refFiles = dvs.map(_.referencedDataFile).distinct
        val refKeys = refFiles.map(PartitionLayout.scanPathKey).toSet
        val sPlan = IcebergLoader.PlannedScan(
          refFiles.map(p => (p, 0L)), Seq.empty, Seq.empty, dvs)
        val tombsS = IcebergLoader.positionTombstones(
          spark, fs, dir, meta, sPlan).get
        val tombsP = parentNode.flatMap { p =>
          val pp = planOf(p)
          IcebergLoader.positionTombstones(spark, fs, dir, meta, pp.copy(
            dataFiles = refFiles.map(x => (x, 0L)),
            // DVs for other files would decode for nothing
            deletionVectors = pp.deletionVectors.filter(d =>
              refKeys(PartitionLayout.scanPathKey(d.referencedDataFile)))))
        }
        val delta = tombsP.fold(tombsS)(tp =>
          tombsS.join(tp, Seq("__graft_fp", "__graft_ri"), "left_anti"))
        dvLegs += ((sid, ts,
          delta.withColumn("__sid", lit(sid)).withColumn("__ts", lit(ts)),
          dvs))
      }
      // equality-delete pre-images (opt-in): parent live rows of data
      // files with sequence STRICTLY below the delete's, semi-joined to
      // the delete files' key tuples null-safely with the newest sequence
      // per tuple — the read path's D < S rule inverted ([[IcebergLoader
      // .applyEqualityDeletes]]), so what this emits as `delete` is
      // exactly what the next full scan stops returning
      val eqs = eqAdded.result().distinctBy(_.path)
      if (eqs.nonEmpty) {
        val pPlan = parentNode.map(planOf).getOrElse(
          IcebergLoader.PlannedScan(Seq.empty, Seq.empty, Seq.empty))
        val maxEseq = eqs.map(_.seq).max
        val cand = pPlan.dataFiles.filter(_._2 < maxEseq)
        if (cand.nonEmpty) {
          val candKeys = cand.map(f => PartitionLayout.scanPathKey(f._1)).toSet
          val restricted = pPlan.copy(dataFiles = cand,
            deletionVectors = pPlan.deletionVectors.filter(d =>
              candKeys(PartitionLayout.scanPathKey(d.referencedDataFile))))
          val tombs = IcebergLoader.positionTombstones(
            spark, fs, dir, meta, restricted)
          val base = IcebergLoader.scanLive(spark, schemaNode, restricted,
            cand.map(_._1), tombs, keepIds = true)
          // per-file data sequence rides a broadcast map, like the read path
          val fileSeq = spark.createDataFrame(cand.map(p =>
              org.apache.spark.sql.Row(
                PartitionLayout.scanPathKey(p._1), p._2)).asJava,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__graft_fp",
                org.apache.spark.sql.types.StringType, nullable = false),
              org.apache.spark.sql.types.StructField("__graft_dseq",
                org.apache.spark.sql.types.LongType, nullable = false))))
          val withSeq = base.join(broadcast(fileSeq), Seq("__graft_fp"), "left")
          // the reader's OWN D < S join, inverted to semi — one shared
          // home for the rule ([[IcebergLoader.eqDeleteJoin]]; review
          // finding: this leg shipped as a near-verbatim copy)
          val legs = eqs.groupBy(_.equalityIds).toSeq.map {
            case (ids2, files2) =>
              IcebergLoader.eqDeleteJoin(spark, withSeq, schemaNode, ids2,
                files2, "left_semi")
          }
          // a parent row matched by delete files of TWO different
          // equality_ids groups in the same snapshot must emit ONE
          // delete, not one per group — dedup on row identity before
          // stamping (review finding); single-key-set snapshots (every
          // upsertByEquality-maintained table) skip the extra shuffle
          val merged = legs.reduce(_ unionByName _)
          val pre = if (legs.size > 1)
            merged.dropDuplicates("__graft_fp", "__graft_ri") else merged
          frames += stamp(pre
            .drop("__graft_fp", "__graft_ri", "__graft_dseq"), "delete")
        }
      }
    }
    // ---- range-collapsed legs. Each delete family first builds its
    // STAMPED (file, row) -> (sid, ts) relation; the pre-image scans then
    // either POOL with the insert leg (single end-schema ranges: ONE data
    // scan serves inserts, pos-delete pre-images, and DV pre-images —
    // optimization round 21, guide §6/§2: the three legs of a DML-heavy
    // range read heavily-overlapping file sets, so a catch-up scanned the
    // same region twice) or plan one scan per family (multi-schema ranges,
    // the general case, exactly as before).

    // position deletes: one delete-file scan + one referenced-file
    // discovery for the whole range; each tombstone carries its source
    // delete file (`__graft_src`), so snapshot id + timestamp join in
    // from a broadcast relation. Returns (stamped tombstones, referenced
    // data files, broadcast-size proxy).
    val posLegsL = posLegs.result()
    val posPart: Option[(DataFrame, Seq[String], Long)] =
      if (posLegsL.isEmpty) None
      else {
        val delPairsAll = posLegsL.flatMap(_._3).distinctBy(_._1)
        val delFilesAll = delPairsAll.map(_._1)
        val referenced = spark.read.parquet(delFilesAll: _*)
          .select(col("file_path").cast("string")).distinct()
          .collect().map(r => remap(r.getString(0))).toSeq
        if (referenced.isEmpty) None
        else {
          val plan0 = IcebergLoader.PlannedScan(
            referenced.map(p => (p, 0L)), delFilesAll,
            Seq.empty, Seq.empty, delPairsAll.map(_._2))
          val tombs = IcebergLoader.positionTombstones(
            spark, fs, dir, meta, plan0, keepSource = true).get
          val srcMeta = spark.createDataFrame(posLegsL.flatMap {
              case (sid, ts, pairs) => pairs.map(p =>
                org.apache.spark.sql.Row(
                  PartitionLayout.scanPathKey(p._1), sid, ts)) }.asJava,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__graft_src",
                org.apache.spark.sql.types.StringType, nullable = false),
              org.apache.spark.sql.types.StructField("__sid",
                org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField("__ts",
                org.apache.spark.sql.types.LongType, nullable = false))))
          val stamped = tombs.join(broadcast(srcMeta), Seq("__graft_src"))
            .drop("__graft_src")
          // the same recorded-bytes broadcast decision positionTombstones
          // makes internally, re-applied because the stamp join sits
          // between its hint and the pre-image join
          val recBytes = delPairsAll.map { case (p, b) =>
            if (b >= 0L) b else scala.util.Try(
              fs.getFileStatus(new HPath(p)).getLen)
              .getOrElse(Long.MaxValue / 1024)
          }.sum
          Some((stamped, referenced, recBytes * 4))
        }
      }
    // v3 DV deltas: the per-snapshot diff frames union (pairwise); the
    // expansion proxy mirrors positionTombstones' DV sizing
    val dvLegsL = dvLegs.result()
    val dvPart: Option[(DataFrame, Seq[String], Long)] =
      if (dvLegsL.isEmpty) None
      else Some((DistKit.unionTree(dvLegsL.map(_._3)),
        dvLegsL.flatMap(_._4.map(_.referencedDataFile)).distinct,
        dvLegsL.flatMap(_._4).map(d => math.max(d.contentSize, 0L)).sum * 32))
    val budget = spark.conf.getOption("spark.graft.tombBroadcastBytes")
      .map(_.toLong).getOrElse(IcebergLoader.tombBroadcastBytes)
    // POOLED delete pre-image scan: the pos-delete and DV families read
    // with the same shape (end schema, keepIds, no tombstones applied) and
    // their stamp relations are disjoint on (file, row) — the DV delta
    // anti-joins the parent state, which already contains the pos
    // tombstones — so ONE scan over the union of their referenced files
    // inner-joined to the union of their stamps is row-for-row the union
    // of the two separate legs (optimization round 21: a v2→v3 migration
    // history scanned the overlapping referenced sets twice). A pooled
    // variant that ALSO folded the insert leg into this scan (left joins
    // + per-row event explode) was built and measured — REJECTED: the
    // fused chain serializes behind the tombstone aggregate and reads
    // 0.74 → 1.02 s on q_iceberg_changes at sf0.1 (quiet-box median-of-7
    // A/B) even though total task time halves; the parallel legs win at
    // bench scale and tie the fused form's scan count when the added and
    // referenced sets are disjoint.
    val delParts = posPart.toSeq ++ dvPart.toSeq
    if (delParts.nonEmpty) {
      val delStamps = delParts.map(_._1.select(col("__graft_fp"),
        col("__graft_ri"), col("__sid"), col("__ts")))
        .reduce(_ unionByName _)
      val refAll = delParts.flatMap(_._2).distinct
      val proxy = delParts.map(_._3).sum
      val rhs = if (proxy <= budget) broadcast(delStamps) else delStamps
      val base = IcebergLoader.scanLive(spark, schemaNode,
        IcebergLoader.PlannedScan(refAll.map(p => (p, 0L)), Seq.empty,
          Seq.empty, Seq.empty),
        refAll, posTombs = None, keepIds = true)
      frames += base
        .join(rhs, Seq("__graft_fp", "__graft_ri"))
        .withColumn("_change_type", lit("delete"))
        .withColumn("_snapshot_id", col("__sid"))
        .withColumn("_commit_timestamp",
          (col("__ts") / lit(1000.0)).cast("timestamp"))
        .select(outCols: _*)
    }
    // the range-collapsed insert leg: one scan per distinct schema
    // version, snapshot id + timestamp joined in from a broadcast
    // (file -> meta) relation instead of per-snapshot literal stamps
    val insertSlices = inserts.result()
    insertSlices.groupBy(_._1).toSeq.sortBy(_._1).foreach {
      case (schemaId, slices) =>
        val metaDf = spark.createDataFrame(slices.map(sl =>
            org.apache.spark.sql.Row(PartitionLayout.scanPathKey(sl._4),
              sl._2, sl._3)).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__fp",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("__sid",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("__ts",
              org.apache.spark.sql.types.LongType, nullable = false))))
        frames += projectedRead(spark, meta, to, schemaId,
            slices.map(_._4).distinct, keepFp = true)
          .join(broadcast(metaDf), Seq("__fp"))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_snapshot_id", col("__sid"))
          .withColumn("_commit_timestamp",
            (col("__ts") / lit(1000.0)).cast("timestamp"))
          .select(outCols: _*)
    }
    val out = frames.result()
    if (out.isEmpty) {
      val empty = org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_snapshot_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
    }
    // pairwise: a thousand-snapshot range must not plan a thousand-deep
    // union (review finding — same cure as DeltaWriter/DeltaCdf)
    DistKit.unionTree(out)
  }

  private def emptyLike(spark: SparkSession, meta: JsonNode,
                        to: JsonNode): DataFrame = {
    val schema = IcebergLoader.sparkSchemaOf(
      IcebergLoader.schemaNodeFor(meta, Some(to)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
