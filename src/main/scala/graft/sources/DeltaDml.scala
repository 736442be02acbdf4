package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, collect_list, expr, sort_array}

/** Row-level DML on Delta tables — DELETE / UPDATE / MERGE-by-key — built
  * on the protocol's deletion-vector channel (delta.io PROTOCOL.md
  * "Deletion Vectors"; reference precedent: the reference READS delta via
  * delta-rs, columnq/src/table/delta.rs — row-level writes are the
  * curation-pipeline extension, the operations a 100 TB training-data
  * table needs: retention/GDPR deletes, quality-score updates, dedup
  * merges).
  *
  * Why deletion vectors and not copy-on-write: deleting 0.1% of rows from
  * a 100 TB table by rewrite costs a 100 TB write; a DV commit costs one
  * small bitmap per TOUCHED file plus a metadata commit — the delete's
  * real cost is deferred to the next compaction ([[DeltaWriter.compact]]
  * already treats every DV-bearing file as a rewrite candidate and
  * materializes the deletes), which is exactly upstream's design.
  *
  * Scale shape: the matched-row scan is one distributed job (data-column
  * predicates push into the parquet scan; partition-column predicates
  * constant-fold per partition group, so non-matching partitions read
  * ZERO bytes — the scan unions per-partition-tuple branches with the
  * partition values injected as literals, and Catalyst prunes
  * `Filter(false)` branches to empty relations). Bitmaps are built and
  * written EXECUTOR-side, one DV bin file per task (many DVs pack into
  * one file at offsets, the format's own layout); only one descriptor row
  * per touched file reaches the driver — the same order as the add list
  * every commit already collects.
  *
  * Commit shape (the protocol's own DML pattern): per touched file a
  * `remove` of the previous (path, dv) plus an `add` of the same path
  * carrying the merged DV — new deletes UNION into any existing DV, and a
  * file whose DV reaches its record count drops to a plain `remove`. The
  * first DV-bearing commit upgrades the table protocol to
  * readerVersion 3 / writerVersion 7 with the `deletionVectors` feature
  * (legacy-implied features enumerated, per spec) and sets
  * `delta.enableDeletionVectors` — both by SURGICAL edit of the raw
  * protocol/metaData actions, never a rebuild, so adopted tables keep
  * every unmodeled field.
  */
object DeltaDml {

  private val mapper = new ObjectMapper()
  private def jstr(s: String): String = DeltaWriter.jstr(s)

  /** Delete live rows matching `predicate` (a SQL boolean expression over
    * the table's columns, partition columns included). Returns the
    * committed version, or -1 when nothing matched. */
  def deleteWhere(spark: SparkSession, dir: String, predicate: String): Long =
    dml(spark, dir, "DELETE", predicate, None, None)

  /** Update live rows matching `predicate`: each `set` entry is
    * column -> SQL expression (evaluated against the matched row; may
    * reference any column). Matched rows are DV-deleted in place and
    * re-written with the assignments applied — partition-column updates
    * land in their NEW partition through the same dynamic-partition write
    * appends use. Returns the committed version, or -1 when nothing
    * matched. */
  def updateWhere(spark: SparkSession, dir: String, predicate: String,
                  set: Map[String, String]): Long = {
    require(set.nonEmpty, "updateWhere needs at least one SET assignment")
    dml(spark, dir, "UPDATE", predicate, Some(set), None)
  }

  /** MERGE by key (upsert): target rows whose `keys` tuple appears in
    * `source` are DV-deleted, and ALL source rows append as new files —
    * one commit, so readers see the swap atomically. Source schema must
    * match the table schema. Returns the committed version. */
  def upsert(source: DataFrame, dir: String, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    dml(source.sparkSession, dir, "MERGE", null, None, Some((source, keys)))
  }

  // ---- the one engine behind all three --------------------------------------

  private def dml(spark: SparkSession, dir: String, op: String,
                  predicate: String, set: Option[Map[String, String]],
                  merge: Option[(DataFrame, Seq[String])]): Long = {
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = DeltaWriter.logDirOf(root)
    val snap = DeltaLoader.snapshot(spark, dir)
    require(snap.columnMappingMode == "none",
      "DeltaDml cannot modify a column-mapped table " +
        "(predicates would need physical-name resolution)")
    merge.foreach { case (source, keys) =>
      val want = source.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val have = snap.schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(want == have,
        s"upsert source schema ${want.mkString(",")} does not match table " +
          s"schema ${have.mkString(",")}")
      keys.foreach(k => require(snap.schema.fieldNames.contains(k),
        s"upsert key `$k` is not a table column"))
    }
    set.foreach(_.keys.foreach(c => require(snap.schema.fieldNames.contains(c),
      s"SET column `$c` is not a table column")))
    if (snap.files.isEmpty) {
      // empty table: deletes/updates are no-ops; a merge is a plain append
      return merge.fold(-1L) { case (source, _) =>
        DeltaWriter.write(source, dir, "append",
          partitionBy = snap.partitionColumns)
      }
    }

    val scan = DeltaLoader.scanWithIds(spark, dir, snap)
    val matched0 = merge match {
      case Some((source, keys)) =>
        scan.join(source.select(keys.map(k => col(s"`$k`")): _*).distinct(),
          keys, "left_semi")
      case None => scan.where(expr(predicate))
    }
    // UPDATE reads the matched set twice (row ids for the DVs, full rows
    // for the rewrite) — persist so the scan+filter runs once; the matched
    // set is the DML's working set, small relative to the table by the
    // operation's nature
    val matched = if (set.isDefined) matched0.persist() else matched0

    try {
      val now = System.currentTimeMillis()
      val touched = buildDvs(spark, dir, fs,
        matched.select(col("__graft_fp"), col("__graft_ri")), snap)
      if (touched.isEmpty && merge.isEmpty) return -1L

      // new data files: UPDATE rewrites the matched rows with assignments
      // applied; MERGE appends the whole source
      val newAdds: Seq[String] = (set, merge) match {
        case (Some(assignments), _) =>
          // ONE projection applies every assignment simultaneously — SQL
          // UPDATE semantics: each SET expression sees the OLD row, never
          // another assignment's result (review finding: the sequential
          // withColumn fold made `SET a = b, b = a` a no-op for b, with
          // hash-arbitrary order past 4 entries)
          val updated = matched.select(snap.schema.fieldNames.map { n =>
            assignments.get(n) match {
              case Some(e) => expr(e).cast(snap.schema(n).dataType).as(n)
              case None => col(s"`$n`")
            }
          }.toIndexedSeq: _*)
          PartitionLayout.refuseEmptyStringKeys(
            updated, snap.partitionColumns, "DeltaDml")
          DeltaWriter.writeDataFiles(updated, fs, root, snap.partitionColumns, now)
        case (_, Some((source, _))) =>
          PartitionLayout.refuseEmptyStringKeys(
            source, snap.partitionColumns, "DeltaDml")
          DeltaWriter.writeDataFiles(source, fs, root, snap.partitionColumns, now)
        case _ => Seq.empty
      }

      val dvLines = dvActionLines(fs, dir, snap, touched, now)
      // an empty MERGE source still produces one zero-row part file from
      // the distributed write — committing it would be junk metadata;
      // reclaim the parts and no-op instead (stats prove emptiness; a
      // stats-less add is conservatively treated as real)
      def addRows(line: String): Long = {
        val n = mapper.readTree(line).get("add")
        Option(n.get("stats")).filterNot(_.isNull)
          .map(s => mapper.readTree(s.asText()).get("numRecords").asLong())
          .getOrElse(-1L)
      }
      if (dvLines.isEmpty && newAdds.forall(l => addRows(l) == 0L)) {
        newAdds.foreach { line =>
          val p = mapper.readTree(line).get("add").get("path").asText()
          fs.delete(new HPath(root,
            java.net.URLDecoder.decode(p, "UTF-8")), false)
        }
        return -1L
      }
      val featureLines = if (touched.isEmpty) Seq.empty else dvFeatureLines(snap)
      val commitInfo =
        s"""{"commitInfo":{"timestamp":$now,"operation":"$op",""" +
          """"operationParameters":{},"engineInfo":"graft-delta-writer"}}"""
      val lines = (Seq(commitInfo) ++ featureLines ++ dvLines ++ newAdds)
        .mkString("", "\n", "\n")

      val version = snap.version + 1
      val target = new HPath(logDir, f"$version%020d.json")
      if (!DeltaWriter.commitJson(fs, target, lines))
        throw new IllegalStateException(
          s"DeltaDml $op lost a commit race at version $version; re-run " +
            "against the refreshed table")
      if ((version + 1) % DeltaWriter.checkpointInterval == 0) {
        try DeltaWriter.writeCheckpoint(spark, fs, root, logDir, version)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] delta checkpoint at version $version failed (table " +
                s"stays readable via JSON replay): $e")
        }
      }
      ColumnIndexRegistry.refreshFromCommit(spark, dir, "delta")
      version
    } finally if (set.isDefined) matched.unpersist()
  }

  // ---- deletion-vector build (executor-side) --------------------------------

  /** One touched file: its previous AddFile and the merged DV that
    * replaces it. */
  private final case class Touched(path: String, descriptor: String,
                                   cardinality: Long)

  /** Group the matched (file, row) pairs per file, merge each file's new
    * row indexes into its existing DV (read task-side), serialize, and
    * write one DV bin file PER TASK with every DV of that task's files
    * packed at offsets. Only (path, descriptorJson, cardinality) rows —
    * one per touched file — come back to the driver. */
  private def buildDvs(spark: SparkSession, dir: String, fs: FileSystem,
                       matchedIds: DataFrame,
                       snap: DeltaLoader.Snapshot): Seq[Touched] = {
    import spark.implicits._
    def abs(p: String): String =
      if (p.contains("://") || p.startsWith("/")) p
      else new HPath(dir, java.net.URLDecoder.decode(p, "UTF-8")).toString
    // keys live in the SCAN's percent-encoded path domain
    // ([[PartitionLayout.scanPathKey]]): raw spellings miss on
    // space-bearing partition dirs and the delete would refuse (or worse)
    val byScanPath: Map[String, (String, Option[String])] = snap.files.map { f =>
      PartitionLayout.scanPathKey(abs(f.path)) -> (f.path, f.dv.map(descriptorJson))
    }.toMap
    val dirStr = dir
    val confEntries = DistKit.confEntries(spark.sparkContext.hadoopConfiguration)
    val oldDvByPath: Map[String, String] =
      byScanPath.collect { case (k, (_, Some(d))) => k -> d }

    val perFile = matchedIds
      .groupBy(col("__graft_fp"))
      .agg(sort_array(collect_list(col("__graft_ri"))).as("ris"))
      .as[(String, Array[Long])]

    val written: Seq[(String, String, Long)] = perFile.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val conf = DistKit.rebuildConf(confEntries)
        val taskFs = new HPath(dirStr).getFileSystem(conf)
        val uuid = java.util.UUID.randomUUID()
        val binPath = new HPath(dirStr, s"deletion_vector_$uuid.bin")
        val out = taskFs.create(binPath, false)
        val results = Seq.newBuilder[(String, String, Long)]
        try {
          out.write(1) // DV file format version
          var offset = 1L
          it.foreach { case (fp, ris) =>
            val old = oldDvByPath.get(fp).map { dj =>
              DeletionVectors.read(conf, dirStr, DeletionVectors.parseDescriptorJson(dj))
            }.getOrElse(Array.empty[Long])
            val merged = (old ++ ris).distinct.sorted
            val data = DeletionVectors.serializeBitmapArray(merged)
            val framed = DeletionVectors.frameDvBlob(data)
            out.write(framed)
            val desc =
              s"""{"storageType":"u","pathOrInlineDv":${jstr(
                DeletionVectors.z85OfUuid(uuid))},"offset":$offset,""" +
                s""""sizeInBytes":${data.length},"cardinality":${merged.length}}"""
            results += ((fp, desc, merged.length.toLong))
            offset += framed.length
          }
        } finally out.close()
        results.result().iterator
      }
    }.collect().toSeq

    written.map { case (fp, desc, card) =>
      val (logPath, _) = byScanPath.getOrElse(fp, throw new IllegalStateException(
        s"DML matched rows in `$fp`, which is not a live file of $dirStr"))
      Touched(logPath, desc, card)
    }
  }

  /** The remove+add action pair per touched file (the protocol's DML
    * pattern: the previous (path, dv) is removed, the same path re-added
    * with the merged DV); a file whose DV covers its whole record count
    * drops to a plain remove. */
  private def dvActionLines(fs: FileSystem, dir: String,
                            snap: DeltaLoader.Snapshot, touched: Seq[Touched],
                            now: Long): Seq[String] = {
    val byPath = snap.files.map(f => f.path -> f).toMap
    touched.flatMap { t =>
      val f = byPath(t.path)
      val pvJson = f.partitionValues.map { case (k, v) =>
        s"${jstr(k)}:${if (v == null) "null" else jstr(v)}"
      }.mkString("{", ",", "}")
      val size =
        if (f.size >= 0L) f.size
        else {
          val p = if (t.path.contains("://") || t.path.startsWith("/")) t.path
            else new HPath(dir, java.net.URLDecoder.decode(t.path, "UTF-8")).toString
          fs.getFileStatus(new HPath(p)).getLen
        }
      val oldDvJson = f.dv.map(d => s""","deletionVector":${descriptorJson(d)}""")
        .getOrElse("")
      val remove =
        s"""{"remove":{"path":${jstr(t.path)},"deletionTimestamp":$now,""" +
          s""""dataChange":true,"extendedFileMetadata":true,""" +
          s""""partitionValues":$pvJson,"size":$size$oldDvJson}}"""
      // physical record count from the add's stats: when the merged DV
      // covers every row the file leaves the table entirely
      val numRecords: Option[Long] = f.stats.flatMap { s =>
        Option(mapper.readTree(s).get("numRecords")).filterNot(_.isNull)
          .map(_.asLong())
      }
      if (numRecords.contains(t.cardinality)) Seq(remove)
      else {
        // stats carry forward with tightBounds=false: the physical min/max
        // still BOUND the live rows (sound for skipping) but may no longer
        // be attained by one (the spec's wide-bounds marker)
        val statsJson = f.stats.map { s =>
          val node = s.parseJsonObject
          node.put("tightBounds", false)
          s""","stats":${jstr(mapper.writeValueAsString(node))}"""
        }.getOrElse("")
        val add =
          s"""{"add":{"path":${jstr(t.path)},"partitionValues":$pvJson,""" +
            s""""size":$size,"modificationTime":$now,"dataChange":true""" +
            s"""$statsJson,"deletionVector":${t.descriptor}}}"""
        Seq(remove, add)
      }
    }
  }

  private implicit class JsonObjOps(private val s: String) extends AnyVal {
    def parseJsonObject: com.fasterxml.jackson.databind.node.ObjectNode =
      mapper.readTree(s).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
  }

  private def descriptorJson(d: DeletionVectors.Descriptor): String =
    DeletionVectors.descriptorJson(d)

  // ---- protocol / metaData feature upgrade ----------------------------------

  /** Writer features each legacy minWriterVersion implies (PROTOCOL.md
    * §Table Features — enumerating them is mandatory when upgrading to
    * writer version 7). */
  private val legacyWriterFeatures: Seq[(Int, String)] = Seq(
    2 -> "appendOnly", 2 -> "invariants", 3 -> "checkConstraints",
    4 -> "changeDataFeed", 4 -> "generatedColumns", 5 -> "columnMapping",
    6 -> "identityColumns")

  /** A table-features protocol upgrade as ONE surgical line: reader
    * version 3 / writer version 7, `feature` added to both feature sets,
    * legacy-implied features enumerated (the spec's upgrade rule), every
    * unmodeled protocol field carried verbatim. None when the table
    * already declares the feature on both sides. Shared by the DV commits
    * here and [[DeltaWriter.checkpointV2]]'s `v2Checkpoint` upgrade. */
  private[sources] def protocolUpgradeLine(protocolJson: Option[String],
                                           feature: String): Option[String] = {
    val node = protocolJson.map(_.parseJsonObject).getOrElse(
      throw new IllegalStateException("delta log carries no protocol action"))
    val mrv = node.get("minReaderVersion").asInt()
    val mwv = node.get("minWriterVersion").asInt()
    val readerFeatures: Set[String] =
      Option(node.get("readerFeatures")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSet)
        .getOrElse(if (mrv >= 2) Set("columnMapping") else Set.empty)
    val writerFeatures: Set[String] =
      Option(node.get("writerFeatures")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSet)
        .getOrElse(legacyWriterFeatures.collect {
          case (v, f) if mwv >= v => f
        }.toSet)
    if (mrv == 3 && readerFeatures(feature) &&
        mwv == 7 && writerFeatures(feature)) None
    else {
      node.put("minReaderVersion", 3)
      node.put("minWriterVersion", 7)
      val rf = node.putArray("readerFeatures")
      (readerFeatures + feature).toSeq.sorted.foreach(rf.add)
      val wf = node.putArray("writerFeatures")
      (writerFeatures + feature).toSeq.sorted.foreach(wf.add)
      Some(s"""{"protocol":${mapper.writeValueAsString(node)}}""")
    }
  }

  /** The protocol-upgrade and `delta.enableDeletionVectors` metaData lines
    * a DV-bearing commit needs — EMPTY when the table already declares
    * both. Surgical edits of the raw actions: every unmodeled field
    * carries forward verbatim. */
  private[sources] def dvFeatureLines(snap: DeltaLoader.Snapshot): Seq[String] = {
    val protoLine: Option[String] =
      protocolUpgradeLine(snap.protocolJson, "deletionVectors")
    val metaLine: Option[String] = snap.metaDataJson.flatMap { raw =>
      val node = raw.parseJsonObject
      val cfg = Option(node.get("configuration")).filterNot(_.isNull)
        .map(_.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
        .getOrElse(node.putObject("configuration"))
      if (Option(cfg.get("delta.enableDeletionVectors"))
          .exists(v => !v.isNull && v.asText() == "true")) None
      else {
        cfg.put("delta.enableDeletionVectors", "true")
        Some(s"""{"metaData":${mapper.writeValueAsString(node)}}""")
      }
    }
    protoLine.toSeq ++ metaLine.toSeq
  }
}
