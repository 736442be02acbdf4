package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal Delta Lake reader built directly on the public Delta transaction
  * log protocol (delta.io/protocol): replay `_delta_log` checkpoint + JSON
  * commits into the live file list, then hand that list to Spark's parquet
  * source (reference behavior: columnq/src/table/delta.rs:104-297, which
  * delegates the same replay to delta-rs).
  *
  * Scale shape: log replay is driver-side metadata work (exactly like
  * delta-rs); the data read is a standard distributed parquet scan, so
  * predicate pushdown, column pruning and partition parallelism all apply.
  * Checkpoint parquet is read through Spark with the add set kept
  * DISTRIBUTED: post-checkpoint removes anti-join executor-side and only
  * (path, partitionValues) of live files ever reach the driver — a
  * multi-million-add checkpoint never materializes its actions (stats,
  * tags, tombstones) in driver memory.
  *
  * Column mapping (`delta.columnMapping.mode` = `name` or `id`) is
  * supported: the protocol stores a physical name (and id) in every
  * field's metadata, data files carry PHYSICAL column names, and
  * `add.partitionValues` keys are physical too — so the scan reads the
  * physicalized schema and projects back to logical names (nested fields
  * rename via a positional struct cast). `id` mode always carries
  * physical names as well (the protocol requires both), so one
  * name-based path serves both modes.
  *
  * Deletion vectors are supported via [[DeletionVectors]] (Z85 +
  * portable-roaring decode of the public DV format): files carrying a DV
  * scan with `_metadata.row_index` and anti-join their deleted row
  * indexes.
  *
  * Checkpoint bases resolve through [[DeltaCheckpoints]], which speaks
  * all three public layouts — classic single-file, classic multipart,
  * and uuid-named V2 checkpoints whose add/remove set lives in
  * `_delta_log/_sidecars/` parquet — so the `v2Checkpoint` reader
  * feature in the protocol gate below is genuinely honored.
  *
  * Unsupported (fails loudly): minReaderVersion > 3, reader features
  * beyond parquet + columnMapping + deletionVectors + v2Checkpoint.
  */
object DeltaLoader {

  private val mapper = new ObjectMapper()

  /** Deleted-row count above which DV decode moves off the driver and the
    * tombstone anti-join stops broadcasting. Exact, from descriptor
    * cardinalities, so the plan choice costs nothing. Was 4M (a ~64 MB
    * broadcast comfort bound); measured at bench scale the driver leg is
    * the SLOW one well before that — decoding ~40k rows on the driver and
    * embedding them as a local relation cost q_delta_cdf_synth 1.74 s vs
    * 0.72 s for the executor-decode leg (optimization round 20, guide
    * §1.2: the distributed algorithm beats the driver shortcut even at
    * fixture scale). 16k keeps the zero-job driver path for genuinely
    * tiny DVs (a tailing tick's few hundred deletes) where job-launch
    * overhead would dominate; both legs are oracle-gated
    * (q_delta_cdf_synth / q_delta_cdf_synth_dist). Overridable per
    * session via spark.graft.dvBroadcastRows. */
  private[sources] val dvBroadcastRows: Long = 16L * 1024

  final case class Snapshot(
      files: Seq[AddFile],
      schema: StructType,
      partitionColumns: Seq[String],
      version: Long,
      columnMappingMode: String = "none",
      /** The newest metaData/protocol actions VERBATIM (raw JSON) — DML
        * commits that must update one field (enable a table feature, set a
        * config key) surgically edit these instead of rebuilding from a
        * template, so unmodeled fields survive (the lesson the Iceberg
        * writer's property-dropping review finding taught). */
      metaDataJson: Option[String] = None,
      protocolJson: Option[String] = None)

  final case class AddFile(path: String, partitionValues: Map[String, String],
                           dv: Option[DeletionVectors.Descriptor] = None,
                           /** The protocol's per-file statistics JSON
                             * (numRecords/minValues/maxValues/nullCount) —
                             * [[ColumnIndex.buildFromDelta]]'s zone source. */
                           stats: Option[String] = None,
                           /** add.size — lets maintenance (compact) pick
                             * small files from metadata alone; -1 when the
                             * action omitted it. */
                           size: Long = -1L,
                           /** The add action VERBATIM (raw JSON of the
                             * `add` node) — DML re-adds the same path with
                             * a merged DV by SURGICAL edit of this, so
                             * unmodeled fields (tags, baseRowId,
                             * defaultRowCommitVersion, clusteringProvider,
                             * future spec fields) carry forward instead of
                             * silently dropping (review finding). From a
                             * checkpoint base this is the struct
                             * re-serialized (`to_json`), which carries every
                             * field the checkpoint schema modeled. */
                           raw: Option[String] = None)

  def load(spark: SparkSession, src: TableSource): DataFrame = {
    val versionAsOf = src.options.get("version").map(_.toLong)
      .orElse(src.options.get("timestampAsOf").map(ts =>
        versionAt(spark, src.uri, parseTsMillis(ts))))
    val snap = snapshot(spark, src.uri, versionAsOf)
    toDataFrame(spark, src.uri, snap)
  }

  /** `timestampAsOf` accepts epoch millis, ISO-8601 instants, or
    * `yyyy-MM-dd[ HH:mm:ss]` (read as UTC). */
  private[sources] def parseTsMillis(s: String): Long =
    scala.util.Try(s.trim.toLong).getOrElse {
      val t = s.trim.replace(' ', 'T')
      val withTime = if (t.contains("T")) t else t + "T00:00:00"
      scala.util.Try(java.time.Instant.parse(withTime).toEpochMilli).getOrElse(
        java.time.LocalDateTime.parse(withTime)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    }

  /** The table's newest committed version from ONE log listing (no
    * replay) — the serving layer's cheap has-anything-changed probe. */
  private[graft] def latestVersion(spark: SparkSession, tablePath: String): Long = {
    val logDir = new HPath(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commitRx = raw"(\d{20})\.json".r
    val vs = fs.listStatus(logDir).flatMap(_.getPath.getName match {
      case commitRx(v) => Some(v.toLong)
      case _ => None
    })
    require(vs.nonEmpty, s"`$tablePath` has no Delta commit JSON")
    vs.max
  }

  /** The newest version whose commit file is not newer than `tsMillis` —
    * upstream's own timestampAsOf resolution (commit-file modification
    * times). Bounded by log retention: versions whose JSON was retired by
    * cleanupLog cannot be timestamp-resolved, same as upstream. */
  private[sources] def versionAt(spark: SparkSession, tablePath: String,
                                 tsMillis: Long): Long = {
    val logDir = new HPath(tablePath, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commitRx = raw"(\d{20})\.json".r
    val commits = fs.listStatus(logDir).flatMap { st =>
      st.getPath.getName match {
        case commitRx(v) => Some(v.toLong -> st.getModificationTime)
        case _ => None
      }
    }
    require(commits.nonEmpty,
      s"timestampAsOf: `$tablePath` has no commit JSON to resolve against")
    val eligible = commits.filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"timestampAsOf: $tsMillis predates the earliest available commit " +
        s"(${commits.map(_._2).min}) of `$tablePath`")
    eligible.map(_._1).max
  }

  // ---- log replay -----------------------------------------------------------

  def snapshot(spark: SparkSession, tablePath: String,
               versionAsOf: Option[Long] = None): Snapshot = {
    // All log IO goes through the Hadoop FileSystem API, so the SAME code
    // reads file://, s3a://, gs://, abfss:// logs once the connector jars
    // are present (ObjectStores resolves the scheme + credentials upstream).
    val logDir = new HPath(tablePath, "_delta_log")
    val fs: FileSystem = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.isDirectory(logDir),
      s"`$tablePath` is not a Delta table (no _delta_log directory)")

    val entries = fs.listStatus(logDir).map(_.getPath.getName).toVector

    def readBytes(p: HPath): Array[Byte] = {
      val in = fs.open(p)
      try in.readAllBytes() finally in.close()
    }

    // checkpoint base, if usable under the requested version
    val lastCheckpoint: Option[(Long, Option[Int])] = {
      val lc = new HPath(logDir, "_last_checkpoint")
      if (fs.exists(lc)) {
        val node = mapper.readTree(readBytes(lc))
        val v = node.get("version").asLong()
        if (versionAsOf.forall(v <= _))
          Some(v -> Option(node.get("parts")).map(_.asInt()))
        else None // time travel below the checkpoint: replay JSON from zero
      } else None
    }

    var schemaJson: String = null
    var partCols: Seq[String] = Seq.empty
    var maxVersion = -1L
    var colMapping = "none"
    var rawMeta: Option[String] = None
    var rawProto: Option[String] = None

    def applyMeta(node: JsonNode): Unit = {
      val meta = node.get("metaData")
      val protocol = node.get("protocol")
      if (meta != null && !meta.isNull) {
        rawMeta = Some(mapper.writeValueAsString(meta))
        schemaJson = meta.get("schemaString").asText()
        partCols = Option(meta.get("partitionColumns"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
        val cfg = Option(meta.get("configuration"))
        colMapping = cfg.flatMap(c => Option(c.get("delta.columnMapping.mode")))
          .map(_.asText()).getOrElse("none")
        require(Set("none", "name", "id")(colMapping),
          s"Delta reader: columnMapping mode `$colMapping` is not supported")
      }
      if (protocol != null && !protocol.isNull) {
        rawProto = Some(mapper.writeValueAsString(protocol))
        val mrv = protocol.get("minReaderVersion").asInt()
        val features = Option(protocol.get("readerFeatures"))
          .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)
        // reader v2 = column mapping (supported); v3 = feature-gated
        val supported = Set("timestampNtz", "vacuumProtocolCheck", "v2Checkpoint",
          "columnMapping", "deletionVectors")
        require(mrv <= 2 || (mrv == 3 && features.subsetOf(supported)),
          s"Delta reader: protocol minReaderVersion=$mrv features=$features not supported")
      }
    }

    // post-checkpoint JSON mutations, replayed in order. Commit JSONs are
    // small by protocol (one commit's worth of actions); the checkpoint —
    // millions of adds on a 100 TB table — is what must NOT be collected.
    val addedAfter = mutable.LinkedHashMap[String, AddFile]()
    val removedAfter = mutable.LinkedHashSet[String]()
    def applyAction(node: JsonNode): Unit = {
      val add = node.get("add")
      val remove = node.get("remove")
      if (add != null && !add.isNull) {
        val path = add.get("path").asText()
        val pv = Option(add.get("partitionValues")).map { p =>
          p.properties().asScala.map(e => e.getKey -> // null JSON value = null partition
            (if (e.getValue.isNull) null else e.getValue.asText())).toMap
        }.getOrElse(Map.empty[String, String])
        addedAfter(path) = AddFile(path, pv, parseDv(add.get("deletionVector")),
          Option(add.get("stats")).filterNot(_.isNull).map(_.asText()),
          Option(add.get("size")).filterNot(_.isNull).map(_.asLong()).getOrElse(-1L),
          Some(mapper.writeValueAsString(add)))
        removedAfter -= path
      }
      if (remove != null && !remove.isNull) {
        val p = remove.get("path").asText()
        removedAfter += p
        addedAfter -= p
      }
      applyMeta(node)
    }

    // 1) checkpoint parquet (classic single/multi-part, or uuid-named V2
    //    with sidecar file actions — DeltaCheckpoints resolves the naming
    //    and unions sidecar rows in): metaData/protocol are at most one
    //    live row each (driver-tiny); the ADD SET STAYS DISTRIBUTED — the
    //    scan reads only add.path/add.partitionValues (column pruning
    //    keeps stats/tags inside the files) and nothing is collected here.
    var checkpointAdds: Option[DataFrame] = None
    lastCheckpoint.foreach { case (v, parts) =>
      val cp = DeltaCheckpoints.readActions(spark, fs, logDir, v, parts)
      val cols = cp.columns.toSet
      Seq("metaData", "protocol").filter(cols).foreach { c =>
        cp.select(c).where(col(c).isNotNull)
          .toJSON.collect().foreach(line => applyMeta(mapper.readTree(line)))
      }
      if (cols("add")) {
        val addFields = cp.schema("add").dataType.asInstanceOf[StructType].fieldNames.toSet
        val dvCol =
          if (addFields.contains("deletionVector"))
            org.apache.spark.sql.functions.to_json(col("add.deletionVector"))
          else lit(null).cast("string")
        val statsCol =
          if (addFields.contains("stats")) col("add.stats").cast("string")
          else lit(null).cast("string")
        val sizeCol =
          if (addFields.contains("size")) col("add.size").cast("long")
          else lit(-1L)
        checkpointAdds = Some(cp.where(col("add.path").isNotNull)
          .select(col("add.path").as("path"), col("add.partitionValues").as("pv"),
            dvCol.as("dv"), statsCol.as("stats"), sizeCol.as("size"),
            org.apache.spark.sql.functions.to_json(col("add")).as("raw")))
      }
      maxVersion = v
    }

    // 2) JSON commits after the checkpoint, in version order
    val commitRx = raw"(\d{20})\.json".r
    val commits = entries.collect {
      case n @ commitRx(v) if v.toLong > maxVersion && versionAsOf.forall(v.toLong <= _) =>
        v.toLong -> n
    }.sortBy(_._1)
    commits.foreach { case (v, name) =>
      new String(readBytes(new HPath(logDir, name)), "UTF-8").split('\n')
        .iterator.filter(_.nonEmpty).foreach(l => applyAction(mapper.readTree(l)))
      maxVersion = v
    }

    require(schemaJson != null, s"Delta log at `$tablePath` has no metaData action")
    require(maxVersion >= 0, s"Delta log at `$tablePath` has no commits")
    versionAsOf.foreach(v => require(v <= maxVersion || lastCheckpoint.nonEmpty,
      s"requested version $v but log only reaches $maxVersion"))

    // 3) live set = checkpoint adds ANTI-JOIN (post-checkpoint removes ∪
    //    re-adds), computed distributed, then post-checkpoint adds appended.
    //    Only (path, partitionValues) of LIVE files reach the driver — the
    //    same minimal list any Delta metadata handler must hold to plan the
    //    scan; checkpoint tombstones and dead adds are pruned executor-side.
    val fromCheckpoint: Seq[AddFile] = checkpointAdds.map { addDf =>
      val tombstones = (removedAfter ++ addedAfter.keys).toSeq
      val live = if (tombstones.isEmpty) addDf else {
        import spark.implicits._
        val t = tombstones.toDF("tpath")
        addDf.join(t, addDf("path") === t("tpath"), "left_anti")
      }
      live.collect().map { r =>
        val pv = Option(r.getMap[String, String](1))
          .map(_.toMap).getOrElse(Map.empty[String, String])
        val dv = Option(r.getString(2)).flatMap(j => parseDv(mapper.readTree(j)))
        AddFile(r.getString(0), pv, dv, Option(r.getString(3)),
          if (r.isNullAt(4)) -1L else r.getLong(4), Option(r.getString(5)))
      }.toSeq
    }.getOrElse(Seq.empty)

    Snapshot(fromCheckpoint ++ addedAfter.values,
      DataType.fromJson(schemaJson).asInstanceOf[StructType], partCols, maxVersion,
      colMapping, rawMeta, rawProto)
  }

  private def parseDv(node: JsonNode): Option[DeletionVectors.Descriptor] =
    Option(node).filterNot(_.isNull).map { d =>
      DeletionVectors.Descriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong())
    }

  // ---- column mapping -------------------------------------------------------

  private val PhysicalNameKey = "delta.columnMapping.physicalName"

  private[sources] def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** The schema as data files store it: every (nested) field renamed to its
    * `delta.columnMapping.physicalName` — shared with
    * [[DeltaWriter.compact]]'s physical-name rewrite of mapped tables. */
  private[sources] def physicalize(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(name = physName(f), dataType = physicalize(f.dataType))))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = physicalize(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = physicalize(m.keyType), valueType = physicalize(m.valueType))
    case other => other
  }

  /** [[physicalize]] plus `parquet.field.id` stamped from each field's
    * `delta.columnMapping.id` — the WRITE-side schema for rewriting
    * mapped tables (review finding: `id`-mode readers resolve columns by
    * parquet field id, so a rewrite that only renamed to physical names
    * produced files upstream id-readers cannot resolve; Spark's parquet
    * writer emits ids from this metadata key). */
  private[sources] def physicalizeForWrite(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        val md = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        if (f.metadata.contains("delta.columnMapping.id"))
          scala.util.Try(md.putLong("parquet.field.id",
            f.metadata.getLong("delta.columnMapping.id")))
        f.copy(name = physName(f), dataType = physicalizeForWrite(f.dataType),
          metadata = md.build())
      })
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = physicalizeForWrite(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = physicalizeForWrite(m.keyType),
        valueType = physicalizeForWrite(m.valueType))
    case other => other
  }

  // ---- scan -----------------------------------------------------------------

  private def toDataFrame(spark: SparkSession, tableUri: String, snap: Snapshot): DataFrame =
    buildScan(spark, tableUri, snap, keepIds = false)

  /** The table scan WITH the `__graft_fp` (normalized absolute file path)
    * and `__graft_ri` (row index) identity columns kept — the DML layer's
    * input: deletion vectors address rows by exactly this pair. */
  private[sources] def scanWithIds(spark: SparkSession, tableUri: String,
                                   snap: Snapshot): DataFrame =
    buildScan(spark, tableUri, snap, keepIds = true)

  private def buildScan(spark: SparkSession, tableUri: String, snap: Snapshot,
                        keepIds: Boolean): DataFrame = {
    require(snap.files.nonEmpty, s"Delta table `$tableUri` has no live files")
    def abs(p: String): String =
      if (p.contains("://") || p.startsWith("/")) p
      else new HPath(tableUri, java.net.URLDecoder.decode(p, "UTF-8")).toString

    val mapped = snap.columnMappingMode != "none"
    val logicalData = StructType(snap.schema.filterNot(f => snap.partitionColumns.contains(f.name)))
    // column mapping: data files store PHYSICAL names — read the
    // physicalized schema, then project back to logical names (a positional
    // struct cast renames nested fields; for flat fields it is a no-op)
    val readSchema =
      if (mapped) physicalize(logicalData).asInstanceOf[StructType] else logicalData

    // deletion vectors: per-file sets of deleted ROW INDEXES, matched
    // against the parquet reader's _metadata.row_index via an anti-join on
    // (file, row). Keyed in the SCAN's (percent-encoded) path domain — raw
    // on-disk spellings silently miss on space-bearing partition dirs.
    // Scale: the descriptors' cardinalities are exact metadata, so the
    // decode site is a FREE decision — a small deleted set decodes on the
    // driver and broadcasts (one task, zero jobs); past the threshold the
    // descriptors (tiny) ship to executors, each task decodes its DV
    // files, and the anti-join shuffles instead of broadcasting. Neither
    // the driver nor any single executor ever has to hold a 100 TB
    // table's full tombstone set.
    val dvFiles = snap.files.collect { case f if f.dv.isDefined =>
      (PartitionLayout.scanPathKey(abs(f.path)), f.dv.get) }
    val hasDv = dvFiles.nonEmpty
    val needIds = hasDv || keepIds

    def scan(paths: Seq[String]): DataFrame = {
      val df = spark.read.schema(readSchema).parquet(paths: _*)
      if (!needIds) df
      else df
        .withColumn("__graft_fp", org.apache.spark.sql.functions.regexp_replace(
          col("_metadata.file_path"), "^file:/+", "/"))
        .withColumn("__graft_ri", col("_metadata.row_index"))
    }
    val helperCols =
      if (needIds) Seq(col("__graft_fp"), col("__graft_ri")) else Seq.empty
    def toLogical(df: DataFrame): DataFrame =
      if (!mapped) df
      else df.select(logicalData.fields.zip(readSchema.fields).map { case (lf, pf) =>
        col(s"`${pf.name}`").cast(lf.dataType).as(lf.name)
      }.toIndexedSeq ++ helperCols: _*)

    val base =
      if (snap.partitionColumns.isEmpty) toLogical(scan(snap.files.map(f => abs(f.path))))
      else {
        // Partition values live in the log, not the files: scan each distinct
        // partition tuple's file group once and union (driver-side group count =
        // partition count, same as any Delta metadata handler). Under column
        // mapping, `add.partitionValues` keys are PHYSICAL names too.
        val byPartition = snap.files.groupBy(_.partitionValues)
        val parts = byPartition.toSeq.map { case (pv, files) =>
          val df = toLogical(scan(files.map(f => abs(f.path))))
          snap.partitionColumns.foldLeft(df) { (acc, c) =>
            val f = snap.schema(c)
            val v = pv.getOrElse(physName(f), pv.getOrElse(c, null))
            acc.withColumn(c, lit(v).cast(f.dataType))
          }
        }
        // pairwise, not left-deep: a 10k-partition table's union must not
        // plan (or stack-overflow) at depth 10k. The branch-PER-TUPLE
        // shape itself is deliberate and stays: Catalyst folds a filter on
        // a partition column to true/false per branch and prunes whole
        // scans — the union of literal branches IS this loader's static
        // partition pruning (collapsing to one scan + a broadcast
        // (file -> pv) join, the CDF legs' shape, would un-prune every
        // partitioned serving query; optimization round 20 note).
        DistKit.unionTree(parts)
      }
    val undeleted =
      if (!hasDv) base
      else {
        import spark.implicits._
        val totalDoomed = dvFiles.map(_._2.cardinality).sum
        val threshold = spark.conf.getOption("spark.graft.dvBroadcastRows")
          .map(_.toLong).getOrElse(dvBroadcastRows)
        val deleted =
          if (totalDoomed <= threshold) {
            org.apache.spark.sql.functions.broadcast(
              dvFiles.flatMap { case (p, d) =>
                DeletionVectors.read(spark, tableUri, d).map(ri => (p, ri))
              }.toDF("__graft_fp", "__graft_ri"))
          } else {
            // executor-side decode: one (path, descriptorJson) row per DV,
            // spread over tasks; rows never touch the driver
            val confEntries =
              DistKit.confEntries(spark.sparkContext.hadoopConfiguration)
            val uri = tableUri
            val slices = math.min(dvFiles.size,
              spark.sparkContext.defaultParallelism).max(1)
            spark.createDataset(dvFiles.map { case (p, d) =>
                (p, DeletionVectors.descriptorJson(d)) })
              .repartition(slices)
              .flatMap { case (p, dj) =>
                val conf = DistKit.rebuildConf(confEntries)
                DeletionVectors.read(conf, uri,
                  DeletionVectors.parseDescriptorJson(dj)).iterator.map(ri => (p, ri))
              }.toDF("__graft_fp", "__graft_ri")
          }
        base.join(deleted, Seq("__graft_fp", "__graft_ri"), "left_anti")
      }
    val keep = snap.schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq ++
      (if (keepIds) Seq(col("__graft_fp"), col("__graft_ri")) else Seq.empty)
    undeleted.select(keep: _*)
  }
}
