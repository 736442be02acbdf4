package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.StructType

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

  /** Signals a lost commit race whose concurrent commits CONFLICT with the
    * attempt (they removed/re-added files, or changed metadata/protocol) —
    * the attempt's files are already reclaimed; re-running the whole DML
    * against the refreshed table is the only sound continuation. */
  private final class ConflictRetry(val detail: String)
    extends RuntimeException(detail)

  /** Bounded optimistic-concurrency loop (upstream's own DML pattern):
    * each attempt computes against a fresh snapshot; a lost race whose
    * concurrent commits are pure blind appends REBASES the same actions to
    * the next free version inside the attempt (no rescan — appended files
    * were not read by our scan, so the DML serializes before them under
    * write-serializable isolation, upstream's default); a conflicting race
    * reclaims the attempt's files and recomputes here. */
  private def dml(spark: SparkSession, dir: String, op: String,
                  predicate: String, set: Option[Map[String, String]],
                  merge: Option[(DataFrame, Seq[String])]): Long = {
    val maxAttempts = 5
    var attempt = 0
    while (true) {
      attempt += 1
      try return dmlAttempt(spark, dir, op, predicate, set, merge)
      catch {
        case e: ConflictRetry =>
          require(attempt < maxAttempts,
            s"DeltaDml $op lost $maxAttempts consecutive conflicting commit " +
              s"races; giving up (last: ${e.detail})")
          System.err.println(s"[graft] DeltaDml $op retrying after a " +
            s"conflicting commit race (attempt $attempt): ${e.detail}")
      }
    }
    -1L // unreachable
  }

  /** Test seam: invoked once immediately before the first commit attempt
    * (self-clearing), so specs can interleave a concurrent writer
    * DETERMINISTICALLY between snapshot read and commit. */
  private[sources] var preCommitHook: () => Unit = () => ()

  private def dmlAttempt(spark: SparkSession, dir: String, op: String,
                         predicate: String, set: Option[Map[String, String]],
                         merge: Option[(DataFrame, Seq[String])]): Long = {
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = DeltaWriter.logDirOf(root)
    val snap = DeltaLoader.snapshot(spark, dir)
    requireWritable(snap, rewrites = set.isDefined || merge.isDefined)
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
    // operation's nature. CDF-enabled tables read it again for the change
    // files, so they persist too.
    val cdfEnabled =
      tableConfig(snap).get("delta.enableChangeDataFeed").contains("true")
    val matched =
      if (set.isDefined || cdfEnabled) matched0.persist() else matched0

    try {
      val now = System.currentTimeMillis()
      val touched = buildDvs(spark, dir, fs,
        matched.select(col("__graft_fp"), col("__graft_ri")), snap)
      if (touched.isEmpty && merge.isEmpty) return -1L

      // new data files: UPDATE rewrites the matched rows with assignments
      // applied; MERGE appends the whole source. Under column mapping the
      // predicates/assignments resolve LOGICALLY (the scan projects back
      // to logical names), and the rewrite projects to PHYSICAL names +
      // parquet field ids on the way out — data files, partitionValues
      // keys and stats keys are all physical per protocol (the same
      // read-logical/write-physical split compact uses).
      val mapped = snap.columnMappingMode != "none"
      val writeSchema =
        if (!mapped) snap.schema
        else DeltaLoader.physicalizeForWrite(snap.schema).asInstanceOf[StructType]
      val physPartCols =
        if (!mapped) snap.partitionColumns
        else snap.partitionColumns.map(c => DeltaLoader.physName(snap.schema(c)))
      def toPhysical(df: DataFrame): DataFrame =
        if (!mapped) df
        else df.select(snap.schema.fields.zip(writeSchema.fields).map {
          case (lf, pf) =>
            // the cast is a value no-op but re-types nested structs to the
            // id-stamped target, so NESTED field ids reach the writer too
            col(s"`${lf.name}`").cast(pf.dataType).as(pf.name, pf.metadata)
        }.toIndexedSeq: _*)
      // ONE projection applies every assignment simultaneously — SQL
      // UPDATE semantics: each SET expression sees the OLD row, never
      // another assignment's result (review finding: the sequential
      // withColumn fold made `SET a = b, b = a` a no-op for b, with
      // hash-arbitrary order past 4 entries)
      val updatedOpt: Option[DataFrame] = set.map { assignments =>
        matched.select(snap.schema.fieldNames.map { n =>
          assignments.get(n) match {
            case Some(e) => expr(e).cast(snap.schema(n).dataType).as(n)
            case None => col(s"`$n`")
          }
        }.toIndexedSeq: _*)
      }
      val newAdds: Seq[String] = (updatedOpt, merge) match {
        case (Some(updated), _) =>
          PartitionLayout.refuseEmptyStringKeys(
            updated, snap.partitionColumns, "DeltaDml")
          DeltaWriter.writeDataFiles(toPhysical(updated), fs, root, physPartCols, now)
        case (_, Some((source, _))) =>
          PartitionLayout.refuseEmptyStringKeys(
            source, snap.partitionColumns, "DeltaDml")
          DeltaWriter.writeDataFiles(toPhysical(source), fs, root, physPartCols, now)
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
      // CHANGE DATA FEED: when the table opts in
      // (delta.enableChangeDataFeed=true), this commit records its
      // row-level changes as cdc files — DELETE: preimages as `delete`;
      // UPDATE: `update_preimage` + `update_postimage`; MERGE: matched
      // preimages as `delete` + the whole source as `insert` — so readers
      // consume O(changed rows) with zero reconstruction ([[DeltaCdf]]).
      // Written AFTER the no-op reclaim above: no-op DMLs record nothing.
      val cdcLines: Seq[String] =
        if (!cdfEnabled) Seq.empty
        else {
          import org.apache.spark.sql.functions.lit
          val dataCols = snap.schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq
          val pre = toPhysical(matched.select(dataCols: _*))
          val changes: DataFrame = (updatedOpt, merge) match {
            case (Some(updated), _) =>
              pre.withColumn("_change_type", lit("update_preimage"))
                .unionByName(toPhysical(updated)
                  .withColumn("_change_type", lit("update_postimage")))
            case (_, Some((source, _))) =>
              pre.withColumn("_change_type", lit("delete"))
                .unionByName(toPhysical(source.select(dataCols: _*))
                  .withColumn("_change_type", lit("insert")))
            case _ => pre.withColumn("_change_type", lit("delete"))
          }
          DeltaWriter.writeCdcFiles(changes, fs, root, physPartCols)
        }
      val featureLines = if (touched.isEmpty) Seq.empty else dvFeatureLines(snap)
      val commitInfo =
        s"""{"commitInfo":{"timestamp":$now,"operation":"$op",""" +
          """"operationParameters":{},"engineInfo":"graft-delta-writer"}}"""
      val lines = (Seq(commitInfo) ++ featureLines ++ dvLines ++ newAdds ++ cdcLines)
        .mkString("", "\n", "\n")

      locally { val h = preCommitHook; preCommitHook = () => (); h() }
      var version = snap.version + 1
      var committed = false
      while (!committed) {
        if (DeltaWriter.commitJson(fs,
            new HPath(logDir, f"$version%020d.json"), lines)) committed = true
        else {
          // lost the race — classify what landed in the meantime: pure
          // blind appends (add/commitInfo/txn only) don't conflict with
          // row-level DML (our removes/re-adds stay valid; the appended
          // files were not read by our scan, so this DML serializes
          // BEFORE them — write-serializable isolation, upstream's
          // default); anything touching files or metadata conflicts
          val latest = latestJsonVersion(fs, logDir)
          require(latest >= version, s"lost the race at $version but no " +
            s"commit JSON at or above it exists in $logDir")
          val conflict: Option[String] = (version to latest).iterator
            .flatMap(cv => commitConflict(fs, logDir, cv)).nextOption()
          conflict match {
            case Some(reason) =>
              // reclaim this attempt's files (DV bins + new data files) —
              // they reference a stale snapshot — then recompute
              cleanupAttempt(fs, dir, root, touched, newAdds, cdcLines)
              throw new ConflictRetry(reason)
            case None => version = latest + 1 // rebase, same actions
          }
        }
      }
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
    } finally if (set.isDefined || cdfEnabled) matched.unpersist()
  }

  // ---- optimistic-concurrency helpers -----------------------------------------

  private def latestJsonVersion(fs: FileSystem, logDir: HPath): Long = {
    val rx = raw"(\d{20})\.json".r
    fs.listStatus(logDir).map(_.getPath.getName).collect {
      case rx(v) => v.toLong
    }.foldLeft(-1L)(math.max)
  }

  /** Some(reason) when the commit at `cv` conflicts with an in-flight DML:
    * any remove (a file we may have touched or read), any re-add of an
    * existing path is necessarily paired with one, and any metaData/
    * protocol/domainMetadata change invalidates the attempt's feature
    * lines and schema resolution. Pure blind appends (add + commitInfo +
    * txn + cdc) pass. */
  private def commitConflict(fs: FileSystem, logDir: HPath,
                             cv: Long): Option[String] = {
    // an unreadable/half-written concurrent commit (in-flight on a
    // progressively-visible filesystem) classifies as a CONFLICT — the
    // recompute path re-reads it once it is complete, instead of crashing
    // the DML on a parse error
    scala.util.Try {
      val p = new HPath(logDir, f"$cv%020d.json")
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      text.split('\n').iterator.filter(_.nonEmpty).flatMap { line =>
        val node = mapper.readTree(line)
        val kinds = node.properties().asScala.map(_.getKey).toSeq
        kinds.collectFirst {
          case k if !Set("add", "commitInfo", "txn", "cdc")(k) =>
            s"concurrent commit $cv carries a `$k` action"
        }
      }.nextOption()
    }.getOrElse(Some(s"concurrent commit $cv is unreadable (in-flight?)"))
  }

  /** Delete the files a failed attempt wrote: its DV bin files (resolved
    * from the touched descriptors — several descriptors share one bin per
    * task, hence the dedupe) and its new data files. */
  private def cleanupAttempt(fs: FileSystem, dir: String, root: HPath,
                             touched: Seq[Touched],
                             newAdds: Seq[String],
                             cdcLines: Seq[String]): Unit = {
    touched.map(t => DeletionVectors.parseDescriptorJson(t.descriptor))
      .map(d => DeletionVectors.dvPath(dir, d).toString).distinct
      .foreach(p => scala.util.Try(fs.delete(new HPath(p), false)))
    (newAdds.map(l => mapper.readTree(l).get("add")) ++
      cdcLines.map(l => mapper.readTree(l).get("cdc"))).foreach { n =>
      val p = n.get("path").asText()
      scala.util.Try(fs.delete(new HPath(root,
        java.net.URLDecoder.decode(p, "UTF-8")), false))
    }
  }

  // ---- writer-feature gate ----------------------------------------------------

  /** Writer features whose write-side obligations this DML engine meets —
    * the writer analogue of [[DeltaLoader]]'s reader gate (review finding:
    * without it, DML would commit into tables declaring features it
    * ignores — violating `appendOnly` outright, skipping
    * `checkConstraints`/`invariants`, dropping `rowTracking`'s fresh
    * base-row-id obligation). Features with CONDITIONAL semantics
    * (appendOnly, constraints, generated/identity columns) are listed
    * here and enforced below by inspecting whether the table actually
    * USES them — a legacy minWriterVersion implies the feature names
    * whether or not any column does. */
  private val supportedWriterFeatures: Set[String] = Set(
    "appendOnly", "invariants", "checkConstraints", "changeDataFeed",
    "generatedColumns", "columnMapping", "identityColumns",
    "deletionVectors", "v2Checkpoint", "timestampNtz", "vacuumProtocolCheck")

  /** Every field (nested included) whose metadata carries `key`. */
  private def fieldsWithMetaKey(dt: org.apache.spark.sql.types.DataType,
                                key: String, prefix: String = ""): Seq[String] = dt match {
    case s: StructType => s.fields.toSeq.flatMap { f =>
      val here = if (f.metadata.contains(key)) Seq(prefix + f.name) else Seq.empty
      here ++ fieldsWithMetaKey(f.dataType, key, prefix + f.name + ".")
    }
    case a: org.apache.spark.sql.types.ArrayType =>
      fieldsWithMetaKey(a.elementType, key, prefix)
    case m: org.apache.spark.sql.types.MapType =>
      fieldsWithMetaKey(m.keyType, key, prefix) ++
        fieldsWithMetaKey(m.valueType, key, prefix)
    case _ => Seq.empty
  }

  private def tableConfig(snap: DeltaLoader.Snapshot): Map[String, String] =
    snap.metaDataJson.map { raw =>
      Option(mapper.readTree(raw).get("configuration")).filterNot(_.isNull)
        .map(_.properties().asScala.map(e =>
          e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty[String, String])
    }.getOrElse(Map.empty)

  private def requireWritable(snap: DeltaLoader.Snapshot, rewrites: Boolean): Unit = {
    // column-mapped tables ARE writable: predicates/assignments resolve on
    // the logical projection the scan already serves, and rewrites go out
    // through physicalizeForWrite (see dml's toPhysical)
    snap.protocolJson.foreach { pj =>
      val node = mapper.readTree(pj)
      val mwv = Option(node.get("minWriterVersion")).map(_.asInt()).getOrElse(1)
      val declared: Set[String] =
        Option(node.get("writerFeatures")).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asText()).toSet)
          .getOrElse(legacyWriterFeatures.collect {
            case (v, f) if mwv >= v => f
          }.toSet)
      val unsupported = declared -- supportedWriterFeatures
      require(unsupported.isEmpty,
        s"DeltaDml: table declares writer features ${unsupported.toSeq.sorted
          .mkString(", ")} whose write obligations this writer does not " +
          "implement — refusing to commit")
    }
    val cfg = tableConfig(snap)
    require(!cfg.get("delta.appendOnly").contains("true"),
      "DeltaDml: table is append-only (delta.appendOnly=true) — row-level " +
        "DML would violate it")
    if (rewrites) {
      // DELETE only removes rows — no constraint, invariant, or generated
      // value can be violated by removal; UPDATE/MERGE write new rows this
      // engine does not validate against these features
      val constraints = cfg.keys.filter(_.startsWith("delta.constraints."))
      require(constraints.isEmpty,
        s"DeltaDml: table declares CHECK constraints (${constraints.mkString(", ")}) " +
          "this writer does not evaluate — UPDATE/MERGE refused (DELETE is allowed)")
      val invariants = fieldsWithMetaKey(snap.schema, "delta.invariants")
      require(invariants.isEmpty,
        s"DeltaDml: columns ${invariants.mkString(", ")} declare invariants " +
          "this writer does not evaluate — UPDATE/MERGE refused")
      val generated = fieldsWithMetaKey(snap.schema, "delta.generationExpression")
      require(generated.isEmpty,
        s"DeltaDml: columns ${generated.mkString(", ")} are generated — this " +
          "writer does not re-evaluate generation expressions on rewrite")
      val identity = fieldsWithMetaKey(snap.schema, "delta.identity.start")
      require(identity.isEmpty,
        s"DeltaDml: columns ${identity.mkString(", ")} are identity columns — " +
          "this writer does not maintain their high watermark on insert")
    }
  }

  // ---- deletion-vector build (executor-side) --------------------------------

  /** One touched file: its previous AddFile and the merged DV that
    * replaces it. */
  private final case class Touched(path: String, descriptor: String,
                                   cardinality: Long)

  /** Shuffle the matched (file, row) pairs so each file's rows land in one
    * task SORTED (repartition-by-file + in-partition sort — the same one
    * shuffle the old groupBy paid), then STREAM each file's run: the new
    * row indexes merge-stream into its existing DV (decoded task-side) and
    * serialize container-by-container, so a near-full-file delete never
    * materializes an uncompressed row-index array — peak task memory is
    * one 64 Ki container plus the COMPRESSED bitmap (review finding; the
    * `collect_list` form held ~80 MB for a 10M-row file). One DV bin file
    * per task packs every DV of that task's files at offsets. Only
    * (path, descriptorJson, cardinality) rows — one per touched file —
    * come back to the driver. */
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
      .repartition(col("__graft_fp"))
      .sortWithinPartitions(col("__graft_fp"), col("__graft_ri"))
      .as[(String, Long)]

    val written: Seq[(String, String, Long)] = perFile.mapPartitions { it0 =>
      val it = it0.buffered
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
          while (it.hasNext) {
            val fp = it.head._1
            // this file's rows as a sorted streaming run
            val ris: Iterator[Long] = new scala.collection.AbstractIterator[Long] {
              def hasNext: Boolean = it.hasNext && it.head._1 == fp
              def next(): Long = it.next()._2
            }
            val old = oldDvByPath.get(fp).map { dj =>
              DeletionVectors.read(conf, dirStr, DeletionVectors.parseDescriptorJson(dj))
            }.getOrElse(Array.empty[Long])
            val (data, card) = DeletionVectors.serializeBitmapArrayStream(
              DeletionVectors.mergeSortedDistinct(old.iterator, ris))
            val framed = DeletionVectors.frameDvBlob(data)
            out.write(framed)
            val desc =
              s"""{"storageType":"u","pathOrInlineDv":${jstr(
                DeletionVectors.z85OfUuid(uuid))},"offset":$offset,""" +
                s""""sizeInBytes":${data.length},"cardinality":$card}"""
            results += ((fp, desc, card))
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
    * drops to a plain remove. BOTH actions derive from the ORIGINAL add
    * JSON by surgical edit — unmodeled fields (tags, baseRowId,
    * defaultRowCommitVersion, future spec fields) carry forward verbatim
    * instead of silently dropping (review finding; the same discipline as
    * the protocol/metaData edits in this commit). */
  private def dvActionLines(fs: FileSystem, dir: String,
                            snap: DeltaLoader.Snapshot, touched: Seq[Touched],
                            now: Long): Seq[String] = {
    val byPath = snap.files.map(f => f.path -> f).toMap
    touched.flatMap { t =>
      val f = byPath(t.path)
      val orig: com.fasterxml.jackson.databind.node.ObjectNode =
        f.raw.map(_.parseJsonObject).getOrElse {
          // no raw action (shouldn't happen — both replay paths carry it);
          // rebuild the modeled fields as the pre-surgical code did
          val n = mapper.createObjectNode()
          n.put("path", f.path)
          val pv = n.putObject("partitionValues")
          f.partitionValues.foreach { case (k, v) =>
            if (v == null) pv.putNull(k) else pv.put(k, v)
          }
          f.stats.foreach(s => n.put("stats", s))
          if (f.size >= 0L) n.put("size", f.size)
          n
        }
      // checkpoint-only derived columns are not protocol action fields —
      // they must not leak into a JSON commit
      orig.remove("stats_parsed"); orig.remove("partitionValues_parsed")
      if (!orig.has("size") || orig.get("size").isNull) {
        val p = if (t.path.contains("://") || t.path.startsWith("/")) t.path
          else new HPath(dir, java.net.URLDecoder.decode(t.path, "UTF-8")).toString
        orig.put("size", fs.getFileStatus(new HPath(p)).getLen)
      }
      // remove := the original add minus add-only fields, plus tombstone
      // fields; the OLD dv rides along (vacuum clocks its bin off this)
      val rm = orig.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      rm.remove("modificationTime"); rm.remove("stats")
      rm.remove("dataChange"); rm.remove("clusteringProvider")
      rm.put("deletionTimestamp", now)
      rm.put("dataChange", true)
      rm.put("extendedFileMetadata", true)
      val remove = s"""{"remove":${mapper.writeValueAsString(rm)}}"""
      // physical record count from the add's stats: when the merged DV
      // covers every row the file leaves the table entirely
      val numRecords: Option[Long] = f.stats.flatMap { s =>
        Option(mapper.readTree(s).get("numRecords")).filterNot(_.isNull)
          .map(_.asLong())
      }
      if (numRecords.contains(t.cardinality)) Seq(remove)
      else {
        // re-add := the original add with the merged DV swapped in; stats
        // carry forward with tightBounds=false: the physical min/max still
        // BOUND the live rows (sound for skipping) but may no longer be
        // attained by one (the spec's wide-bounds marker)
        val add = orig.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        f.stats.foreach { s =>
          val node = s.parseJsonObject
          node.put("tightBounds", false)
          add.put("stats", mapper.writeValueAsString(node))
        }
        add.put("modificationTime", now)
        add.put("dataChange", true)
        add.set("deletionVector", mapper.readTree(t.descriptor))
        Seq(remove, s"""{"add":${mapper.writeValueAsString(add)}}""")
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

  /** A table-features protocol upgrade as ONE surgical line: writer
    * version 7 with `feature` in writerFeatures — and, for reader-side
    * features (`readerToo`), reader version 3 with `feature` in
    * readerFeatures as well — legacy-implied features enumerated (the
    * spec's upgrade rule), every unmodeled protocol field carried
    * verbatim. None when the table already declares the feature. Shared by
    * the DV commits here, [[DeltaWriter.checkpointV2]]'s `v2Checkpoint`
    * upgrade, and [[DeltaCdf.enableCdf]]'s WRITER-ONLY `changeDataFeed`
    * (putting a writer feature in readerFeatures would lock every reader
    * out — review finding). */
  private[sources] def protocolUpgradeLine(protocolJson: Option[String],
                                           feature: String,
                                           readerToo: Boolean = true): Option[String] = {
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
    val readerDone = !readerToo || (mrv == 3 && readerFeatures(feature))
    if (readerDone && mwv == 7 && writerFeatures(feature)) None
    else {
      node.put("minWriterVersion", 7)
      val wf = node.putArray("writerFeatures")
      (writerFeatures + feature).toSeq.sorted.foreach(wf.add)
      if (readerToo) {
        node.put("minReaderVersion", 3)
        val rf = node.putArray("readerFeatures")
        (readerFeatures + feature).toSeq.sorted.foreach(rf.add)
      } else if (mrv == 3) {
        // already feature-versioned on the reader side: keep its set
        // EXPLICIT (mandatory at mrv 3), unchanged
        val rf = node.putArray("readerFeatures")
        readerFeatures.toSeq.sorted.foreach(rf.add)
      }
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
