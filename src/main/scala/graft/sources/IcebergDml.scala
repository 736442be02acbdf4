package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.avro.generic.GenericRecord

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StringType,
  StructField, StructType}

/** Row-level DML on Iceberg v2 tables — DELETE / UPDATE / MERGE-by-key —
  * built on the spec's POSITION-DELETE files (iceberg spec §Delete
  * Formats; [[DeltaDml]]'s sibling, same pipeline motivation: retention
  * deletes, score updates and dedup merges on tables too big to rewrite).
  *
  * Mechanics: matched live rows become `(file_path, pos)` rows written as
  * position-delete parquet files (sorted by file_path then pos, columns
  * carrying the spec's reserved field ids 2147483546/2147483545), listed
  * by a content=1 manifest under an UNPARTITIONED spec (the spec's
  * "global deletes" form — one delete file may doom rows across
  * partitions), at the commit's new sequence number so they apply to
  * every current data file (`data_seq <= delete_seq`) and never to files
  * added later. UPDATE and MERGE add their replacement rows as ordinary
  * data files (content=0 manifest under the table's default spec) in the
  * SAME snapshot, so readers see the swap atomically. The metadata commit
  * is a SURGICAL edit of the current metadata JSON (snapshots appended,
  * sequence/current-snapshot advanced, an unpartitioned spec entry added
  * only if none exists) — adopted tables keep every unmodeled field.
  *
  * Deferred cost, by design: delete-bearing files pay an anti-join per
  * scan until [[IcebergWriter.compactDataFiles]] materializes the deletes
  * (it already treats delete-affected files as rewrite candidates) and
  * [[IcebergWriter.expireSnapshots]] reclaims the spent delete files.
  *
  * Scale shape: the matched scan is one distributed job (predicates push
  * into parquet; identity partition columns live IN iceberg data files,
  * so partition predicates prune row groups natively); the delete rows
  * shuffle once for the spec-mandated (file_path, pos) sort and never
  * touch the driver; only per-file manifest rows do. */
object IcebergDml {

  private val mapper = new ObjectMapper()

  /** Delete live rows matching `predicate`. Returns the committed
    * metadata version, or -1 when nothing matched. */
  def deleteWhere(spark: SparkSession, dir: String, predicate: String): Long =
    dml(spark, dir, "delete", predicate, None, None)

  /** Update live rows matching `predicate` with `set` (column -> SQL
    * expression over the matched row): position-deletes the old rows and
    * appends the rewritten ones in one snapshot. Returns the committed
    * metadata version, or -1 when nothing matched. */
  def updateWhere(spark: SparkSession, dir: String, predicate: String,
                  set: Map[String, String]): Long = {
    require(set.nonEmpty, "updateWhere needs at least one SET assignment")
    dml(spark, dir, "overwrite", predicate, Some(set), None)
  }

  /** MERGE by key (upsert): target rows whose `keys` tuple appears in
    * `source` are position-deleted and ALL source rows append — one
    * snapshot. Returns the committed metadata version. Costs one target
    * scan (positions must be located); [[upsertByEquality]] is the
    * zero-target-scan alternative. */
  def upsert(source: DataFrame, dir: String, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    dml(source.sparkSession, dir, "overwrite", null, None, Some((source, keys)))
  }

  /** O(source) upsert: replace-by-key with ZERO target scan — the
    * scalable streaming-upsert shape (what Flink's Iceberg sink writes).
    * One snapshot commits (a) the source rows as ordinary data files at
    * sequence S and (b) an EQUALITY-DELETE file of the distinct source
    * keys (data_file.content=2, `equality_ids` = the key columns' field
    * ids — iceberg spec §Equality Delete Files) at the same S. The spec's
    * sequence rule — equality deletes apply only to data files with
    * data_seq STRICTLY BELOW the delete's — makes the commit
    * self-consistent: the delete dooms every OLDER row with a matching
    * key and leaves this commit's own rows alone, so no target scan is
    * ever needed. [[IcebergLoader.applyEqualityDeletes]] (and any real
    * iceberg engine) serves the result; compaction materializes it.
    * Returns the committed metadata version, or -1 for an empty source. */
  def upsertByEquality(source: DataFrame, dir: String, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "upsertByEquality needs at least one key column")
    upsertEq(source, dir, keys)
  }

  // ---- the engine ------------------------------------------------------------

  /** A lost commit race whose concurrent commits cannot be rebased onto
    * (non-append operations, metadata drift, or v3 DV writes) — the
    * attempt's files are already reclaimed; recompute from fresh state. */
  private final class ConflictRetry(val detail: String)
    extends RuntimeException(detail)

  /** Bounded optimistic-concurrency loop ([[DeltaDml]]'s shape): a lost
    * race against append-only concurrent commits REBASES inside the
    * attempt (driver-side manifest re-assembly only — data and delete
    * files are sequence-free); a conflicting race reclaims the attempt's
    * files and recomputes here against the refreshed table. */
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
            s"IcebergDml $op lost $maxAttempts consecutive conflicting " +
              s"commit races; giving up (last: ${e.detail})")
          System.err.println(s"[graft] IcebergDml $op retrying after a " +
            s"conflicting commit race (attempt $attempt): ${e.detail}")
      }
    }
    -1L // unreachable
  }

  /** Every snapshot in `now` that `base` lacks is a plain append (no
    * deletes, no replaces, no DML) — the rebasable concurrent set. */
  private def appendOnlySince(base: com.fasterxml.jackson.databind.JsonNode,
                              now: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    def snaps(m: com.fasterxml.jackson.databind.JsonNode) =
      Option(m.get("snapshots")).filterNot(_.isNull)
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val known = snaps(base).map(_.get("snapshot-id").asLong()).toSet
    snaps(now).filterNot(s => known(s.get("snapshot-id").asLong())).forall { s =>
      Option(s.get("summary")).filterNot(_.isNull)
        .flatMap(x => Option(x.get("operation"))).exists(_.asText() == "append")
    }
  }

  /** The metadata fields a rebase depends on must be UNCHANGED — schema,
    * partition specs, location, format version, properties. Deep JSON
    * equality per field; appends never touch these, anything else refuses
    * the rebase. */
  private def stableFieldsEqual(a: com.fasterxml.jackson.databind.JsonNode,
                                b: com.fasterxml.jackson.databind.JsonNode): Boolean =
    Seq("format-version", "location", "current-schema-id", "schemas",
      "schema", "partition-specs", "partition-spec", "default-spec-id",
      "properties", "sort-orders", "default-sort-order-id").forall(f =>
        Option(a.get(f)) == Option(b.get(f)))

  /** Test seam: invoked once immediately before the first commit attempt
    * (self-clearing) — [[DeltaDml.preCommitHook]]'s sibling. */
  private[sources] var preCommitHook: () => Unit = () => ()

  private def dmlAttempt(spark: SparkSession, dir: String, op: String,
                         predicate: String, set: Option[Map[String, String]],
                         merge: Option[(DataFrame, Seq[String])]): Long = {
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new HPath(root, "metadata")
    val (meta, currentVersion0) = IcebergLoader.currentMetadataVersioned(fs, dir)
    val currentVersion = currentVersion0 match {
      case -1L => IcebergWriter.metadataVersion(fs, metaDir)
      case v => v
    }
    require(Option(meta.get("format-version")).exists(_.asInt() >= 2),
      "IcebergDml needs a format v2 table (position deletes are a v2 " +
        "feature); overwrite through IcebergWriter.write to upgrade")
    val schema = IcebergLoader.tableSchema(meta)
    merge.foreach { case (source, keys) =>
      val want = source.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val have = schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(want == have,
        s"upsert source schema ${want.mkString(",")} does not match table " +
          s"schema ${have.mkString(",")}")
      keys.foreach(k => require(schema.fieldNames.contains(k),
        s"upsert key `$k` is not a table column"))
    }
    set.foreach(_.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"SET column `$c` is not a table column")))

    val snap = IcebergLoader.chooseSnapshot(meta, dir, None)
    val plan = IcebergLoader.planSnapshot(fs, dir, meta, snap)
    if (plan.dataFiles.isEmpty) {
      return merge.fold(-1L) { case (source, _) =>
        IcebergWriter.write(source, dir, "append")
      }
    }
    val schemaNode = IcebergLoader.schemaNodeFor(meta, snap)
    val posTombs = IcebergLoader.positionTombstones(spark, fs, dir, meta, plan)
    val scan = IcebergLoader.scanLive(spark, schemaNode, plan,
      plan.dataFiles.map(_._1), posTombs, keepIds = true)
    val matched0 = merge match {
      case Some((source, keys)) =>
        scan.join(source.select(keys.map(k => col(s"`$k`")): _*).distinct(),
          keys, "left_semi")
      case None => scan.where(expr(predicate))
    }
    val matched = if (set.isDefined) matched0.persist() else matched0

    try {
      val now = System.currentTimeMillis()
      val seq = Option(meta.get("last-sequence-number")).filterNot(_.isNull)
        .map(_.asLong()).getOrElse(0L) + 1
      val snapshots = Option(meta.get("snapshots")).filterNot(_.isNull)
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      val snapId = snapshots.map(_.get("snapshot-id").asLong())
        .foldLeft(0L)(math.max) + 1

      // v2 lands position-delete parquet; v3 DEPRECATES those — deletes
      // must land as puffin deletion vectors, one merged DV per touched
      // file (writing new position deletes into a v3 table would violate
      // the spec external engines enforce)
      val formatV3 = Option(meta.get("format-version")).exists(_.asInt() >= 3)
      val matchedIds = matched.select(col("__graft_fp"), col("__graft_ri"))
      // a v3 DML over a table still carrying v2 position deletes MIGRATES
      // them: every position-delete row unions into the merged DVs and the
      // spent parquet entries retire — the spec's one-DV-per-file rule
      // forbids both forms coexisting for a file (review finding). The
      // migration only piggybacks on a REAL change (no-op DMLs stay no-ops).
      val migratePos = formatV3 && plan.positionDeleteFiles.nonEmpty
      // the no-op early return must also cover a MERGE with an empty
      // source (matched is then empty by the semi-join's nature): without
      // it, dvInput = posTombs alone would produce DV writes and a
      // migration-only snapshot — contradicting the documented contract
      // that the migration only piggybacks on a real change (review
      // finding; DeltaDml returns -1 for the same input)
      if (migratePos && matchedIds.isEmpty &&
          merge.forall { case (source, _) => source.isEmpty }) return -1L
      val dvInput =
        if (!migratePos) matchedIds
        else matchedIds.unionByName(
          posTombs.get.select(col("__graft_fp"), col("__graft_ri")))
      val deleteFiles: Seq[(String, Long, Long)] =
        if (formatV3) Seq.empty
        else writeDeleteFiles(spark, fs, root, matchedIds, plan)
      val dvWrites: Seq[(String, String, Long, Long, Long, Long)] =
        if (!formatV3) Seq.empty
        else writeDvPuffins(spark, fs, root, dvInput, plan, snapId, seq)
      if (deleteFiles.isEmpty && dvWrites.isEmpty && merge.isEmpty) return -1L

      // replacement/new data files (UPDATE's rewritten rows, MERGE's
      // source) through the shared data-part writer, under the table's
      // default spec
      val partFields = IcebergWriter.specPartFields(meta)
      val partTypes = partFields.map(pf => pf.name ->
        IcebergWriter.transformResultType(pf, schema(pf.source).dataType)).toMap
      // replacement files stamp parquet field ids from the current schema
      // (spec conformance, like every other data write)
      val dmlFieldIds: Map[String, Int] = IcebergLoader.fieldIdToName(
        IcebergLoader.schemaNodeFor(meta, None)).map(_.swap)
      val newData0: Seq[(String, Long, ColumnIndex.FileZones, Seq[(String, Any)])] =
        (set, merge) match {
          case (Some(assignments), _) =>
            // simultaneous assignment — SQL UPDATE semantics (see
            // [[DeltaDml]]: a sequential fold lets assignments observe
            // each other)
            val updated = matched.select(schema.fieldNames.map { n =>
              assignments.get(n) match {
                case Some(e) => expr(e).cast(schema(n).dataType).as(n)
                case None => col(s"`$n`")
              }
            }.toIndexedSeq: _*)
            IcebergWriter.writeDataParts(updated, fs, root, partFields,
              partTypes, dmlFieldIds)
          case (_, Some((source, _))) =>
            IcebergWriter.writeDataParts(source, fs, root, partFields,
              partTypes, dmlFieldIds)
          case _ => Seq.empty
        }

      // the distributed write can leave one zero-row part for an empty
      // MERGE source — reclaim rather than manifest it (record_count 0
      // entries are junk)
      val (emptyParts, newData) = newData0.partition(_._3.rows == 0L)
      emptyParts.foreach(e => fs.delete(new HPath(e._1), false))
      // nothing doomed AND nothing added (e.g. an empty MERGE source):
      // no commit — the DeltaDml contract; a carried-only snapshot would
      // be junk metadata (review finding)
      if (deleteFiles.isEmpty && dvWrites.isEmpty && newData.isEmpty) return -1L

      // Everything from here assembles DRIVER-SIDE metadata (manifests,
      // list, table metadata) for a given base — packaged as a function so
      // a lost commit race against APPEND-ONLY concurrent commits can
      // REBASE: the data/delete files on disk are sequence-free (manifests
      // reference them), so re-running only this assembly with the
      // refreshed base's sequence/snapshot numbers re-commits without a
      // rescan. v3 is excluded (puffin blob metadata embeds the
      // snapshot/sequence it was written at); conflicting races reclaim
      // every written file and recompute the whole DML (ConflictRetry).
      def commitSnapshot(metaNow: JsonNode, baseVersion: Long,
                         attempt: Int): Long = {
      val seq = Option(metaNow.get("last-sequence-number")).filterNot(_.isNull)
        .map(_.asLong()).getOrElse(0L) + 1
      val snapId = Option(metaNow.get("snapshots")).filterNot(_.isNull)
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(_.get("snapshot-id").asLong()).foldLeft(0L)(math.max) + 1
      val metaFiles = Seq.newBuilder[HPath] // this attempt's metadata writes
      val metaObj = metaNow.deepCopy[ObjectNode]()
      def listEntry(mp: HPath, content: Int): GenericRecord = {
        val e = new org.apache.avro.generic.GenericData.Record(
          IcebergWriter.manifestListSchema)
        e.put("manifest_path", mp.toString)
        e.put("manifest_length", fs.getFileStatus(mp).getLen)
        e.put("partition_spec_id", unpartitionedSpecId(metaObj))
        e.put("content", content)
        e.put("sequence_number", Long.box(seq))
        e.put("added_snapshot_id", snapId)
        e
      }
      val delManifest: Option[GenericRecord] =
        if (deleteFiles.nonEmpty) {
          val mSchema = IcebergWriter.manifestSchemaFor(Seq.empty)
          val entries = deleteFiles.map { case (p, size, rows) =>
            IcebergWriter.manifestEntryRaw(mSchema, 1, seq, p, size, rows,
              Seq.empty, Map.empty, Map.empty, Map.empty, content = 1)
          }
          val mp = new HPath(metaDir,
            s"graft-d$snapId-${java.util.UUID.randomUUID()}.avro")
          IcebergWriter.writeAvro(fs, mSchema, entries, mp)
          metaFiles += mp
          Some(listEntry(mp, 1))
        } else if (dvWrites.nonEmpty) {
          val entries = dvWrites.map { case (raw, pp, off, blobLen, card, pSize) =>
            val e = new org.apache.avro.generic.GenericData.Record(dvManifestSchema)
            val d = new org.apache.avro.generic.GenericData.Record(
              dvManifestSchema.getField("data_file").schema())
            d.put("content", 1)
            d.put("file_path", pp)
            d.put("file_format", "PUFFIN")
            d.put("record_count", card)
            d.put("file_size_in_bytes", pSize)
            d.put("referenced_data_file", raw)
            d.put("content_offset", Long.box(off))
            d.put("content_size_in_bytes", Long.box(blobLen))
            e.put("status", 1)
            e.put("sequence_number", Long.box(seq))
            e.put("data_file", d)
            e
          }
          val mp = new HPath(metaDir,
            s"graft-dv$snapId-${java.util.UUID.randomUUID()}.avro")
          IcebergWriter.writeAvro(fs, dvManifestSchema, entries, mp)
          metaFiles += mp
          Some(listEntry(mp, 1))
        } else None

      // data manifest for the new files, bounds and all (the same
      // data-skipping channel write() publishes)
      val dataManifest: Option[GenericRecord] =
        if (newData.isEmpty) None
        else {
          val fieldIds: Map[String, Int] = schemaNode.get("fields")
            .elements().asScala
            .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
          val mSchema = IcebergWriter.manifestSchemaFor(
            partFields.map(pf => pf.name -> partTypes(pf.name)))
          val entries = newData.map { case (path, size, fz, tuple) =>
            IcebergWriter.manifestEntry(mSchema, seq, path, size, fz, tuple,
              fieldIds, c => schema.fields.find(_.name == c).map(_.dataType))
          }
          val mp = new HPath(metaDir,
            s"graft-m$snapId-${java.util.UUID.randomUUID()}.avro")
          IcebergWriter.writeAvro(fs, mSchema, entries, mp)
          metaFiles += mp
          val e = new org.apache.avro.generic.GenericData.Record(
            IcebergWriter.manifestListSchema)
          e.put("manifest_path", mp.toString)
          e.put("manifest_length", fs.getFileStatus(mp).getLen)
          e.put("partition_spec_id",
            Option(metaNow.get("default-spec-id")).map(_.asInt()).getOrElse(0))
          e.put("content", 0)
          e.put("sequence_number", Long.box(seq))
          e.put("added_snapshot_id", snapId)
          Some(e)
        }

      // manifest list: every current entry carries verbatim — EXCEPT v3
      // delete manifests holding a DV this commit superseded (the spec's
      // one-live-DV-per-file rule: the merged replacement must be the only
      // DV an external reader sees for that file; ours would harmlessly
      // union, theirs may refuse). Such manifests rewrite without the
      // superseded entries, inherited sequence numbers materialized and
      // statuses folded to EXISTING; a fully-superseded manifest drops.
      // carried manifests/refs live in the metadata's RECORDED location —
      // remap to the actual table root before reading or comparing
      // (relocated tables; review finding)
      val remap = IcebergLoader.pathRemapper(metaNow, dir)
      // dvWrites carry the RECORDED spelling; compare in the remapped
      // (actual) domain on both sides
      val supersededRefs: Set[String] =
        dvWrites.map(w => PartitionLayout.stripFileScheme(remap(w._1))).toSet
      def carryRecord(prev: (String, Long, Int, Option[Long], Long, Int)) = {
        val m = new org.apache.avro.generic.GenericData.Record(
          IcebergWriter.manifestListSchema)
        m.put("manifest_path", prev._1)
        m.put("manifest_length", prev._2)
        m.put("partition_spec_id", prev._6)
        m.put("content", prev._3)
        prev._4.foreach(s => m.put("sequence_number", Long.box(s)))
        m.put("added_snapshot_id", prev._5)
        m
      }
      def normRef(p: String): String = PartitionLayout.stripFileScheme(p)
      val carried: Seq[GenericRecord] =
        IcebergWriter.currentManifestList(fs, metaNow, dir).flatMap { prev =>
          if (supersededRefs.isEmpty || prev._3 != 1) Some(carryRecord(prev))
          else {
            val entries = IcebergLoader.readAvro(fs, new HPath(remap(prev._1)))
            def superseded(e: GenericRecord): Boolean = {
              val d = e.get("data_file").asInstanceOf[GenericRecord]
              val content = Option(d.getSchema.getField("content"))
                .flatMap(_ => Option(d.get("content")))
                .map(_.asInstanceOf[Number].intValue()).getOrElse(1)
              val fmt = String.valueOf(d.get("file_format"))
              if (content != 1) false // equality deletes are untouched
              else if (fmt.equalsIgnoreCase("PUFFIN"))
                Option(d.getSchema.getField("referenced_data_file"))
                  .flatMap(_ => Option(d.get("referenced_data_file")))
                  .exists(r => supersededRefs(
                    normRef(remap(String.valueOf(r)))))
              else
                // v2 position-delete parquet: EVERY live-file row was
                // absorbed into the merged DVs (the v3 write unioned
                // posTombs; dead-file rows are inert), so the whole entry
                // retires — leaving it live would double-state the deletes
                // and violate the v3 one-DV-per-file rule
                migratePos && dvWrites.nonEmpty
            }
            val kept = entries.filterNot(superseded)
            if (kept.size == entries.size) Some(carryRecord(prev))
            else if (kept.forall(e =>
                IcebergLoader.longOr(e, "status", 1L) == 2L)) None
            else {
              val schema = kept.headOption.map(_.getSchema)
                .getOrElse(entries.head.getSchema)
              val rewritten = kept.map { e =>
                val n = new org.apache.avro.generic.GenericData.Record(schema)
                schema.getFields.asScala.foreach(f =>
                  n.put(f.name(), e.get(f.name())))
                // materialize the inherited sequence (a null entry seq
                // inherits the LIST entry's — which this rewrite replaces)
                if (n.get("sequence_number") == null)
                  n.put("sequence_number",
                    Long.box(prev._4.getOrElse(0L)))
                n.put("status", 0) // EXISTING: not added by THIS snapshot
                n
              }
              val mp = new HPath(metaDir,
                s"graft-dc$snapId-${java.util.UUID.randomUUID()}.avro")
              IcebergWriter.writeAvro(fs, schema, rewritten, mp)
              metaFiles += mp
              val m = new org.apache.avro.generic.GenericData.Record(
                IcebergWriter.manifestListSchema)
              m.put("manifest_path", mp.toString)
              m.put("manifest_length", fs.getFileStatus(mp).getLen)
              m.put("partition_spec_id", prev._6)
              m.put("content", 1)
              prev._4.foreach(s => m.put("sequence_number", Long.box(s)))
              m.put("added_snapshot_id", prev._5)
              Some(m)
            }
          }
        }
      val listPath = new HPath(metaDir,
        s"snap-$snapId-${java.util.UUID.randomUUID()}.avro")
      IcebergWriter.writeAvro(fs, IcebergWriter.manifestListSchema,
        carried ++ delManifest.toSeq ++ dataManifest.toSeq, listPath)
      metaFiles += listPath

      // surgical metadata advance
      val snapNode = mapper.createObjectNode()
      snapNode.put("snapshot-id", snapId)
      snapNode.put("sequence-number", seq)
      snapNode.put("timestamp-ms", now)
      Option(metaNow.get("current-schema-id")).filterNot(_.isNull)
        .foreach(id => snapNode.put("schema-id", id.asInt()))
      snapNode.put("manifest-list", listPath.toString)
      snapNode.putObject("summary").put("operation", op)
      metaObj.put("last-sequence-number", seq)
      metaObj.put("last-updated-ms", now)
      metaObj.put("current-snapshot-id", snapId)
      metaObj.withArray("snapshots").add(snapNode)

      val version =
        try IcebergWriter.commitMetadata(fs, metaDir, baseVersion,
          mapper.writeValueAsString(metaObj), op)
        catch {
          case e: IllegalStateException
              if String.valueOf(e.getMessage).contains("commit race") =>
            // this attempt's metadata files reference a stale base either
            // way — reclaim them before deciding how to continue
            metaFiles.result().foreach(p => scala.util.Try(fs.delete(p, false)))
            val (meta2, v2raw) = IcebergLoader.currentMetadataVersioned(fs, dir)
            val base2 =
              if (v2raw == -1L) IcebergWriter.metadataVersion(fs, metaDir)
              else v2raw
            if (attempt < 5 && !formatV3 &&
                appendOnlySince(metaNow, meta2) &&
                stableFieldsEqual(metaNow, meta2))
              return commitSnapshot(meta2, base2, attempt + 1)
            // conflicting (or v3, or unstable metadata): reclaim the
            // data-level files too and recompute the whole DML
            (deleteFiles.map(_._1) ++ dvWrites.map(_._2).distinct ++
              newData.map(_._1)).foreach(p =>
                scala.util.Try(fs.delete(new HPath(p), false)))
            throw new ConflictRetry(
              s"lost the v${baseVersion + 1} commit race to a concurrent " +
                "writer whose commits are not append-only rebasable")
        }
      val hint = fs.create(new HPath(metaDir, "version-hint.text"), true)
      try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
      version
      } // commitSnapshot

      locally { val h = preCommitHook; preCommitHook = () => (); h() }
      val version = commitSnapshot(meta, currentVersion, 1)
      ColumnIndexRegistry.refreshFromCommit(spark, dir, "iceberg")
      version
    } finally if (set.isDefined) matched.unpersist()
  }

  // ---- equality-delete upsert (zero target scan) ------------------------------

  /** [[manifestSchemaFor]] plus the `equality_ids` list equality-delete
    * entries must carry (spec: the field ids the delete rows match on). */
  private val eqManifestSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],
        |   "default":null}]}}]}""".stripMargin)

  private def upsertEq(source: DataFrame, dir: String,
                       keys: Seq[String]): Long = {
    val spark = source.sparkSession
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new HPath(root, "metadata")
    val (meta, currentVersion0) = IcebergLoader.currentMetadataVersioned(fs, dir)
    val currentVersion = currentVersion0 match {
      case -1L => IcebergWriter.metadataVersion(fs, metaDir)
      case v => v
    }
    require(Option(meta.get("format-version")).exists(_.asInt() >= 2),
      "upsertByEquality needs a format v2+ table (equality deletes are a " +
        "v2 feature)")
    val schema = IcebergLoader.tableSchema(meta)
    val want = source.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val have = schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(want == have,
      s"upsertByEquality source schema ${want.mkString(",")} does not match " +
        s"table schema ${have.mkString(",")}")
    val snap = IcebergLoader.chooseSnapshot(meta, dir, None)
    val schemaNode = IcebergLoader.schemaNodeFor(meta, snap)
    val fieldIds: Map[String, Int] = schemaNode.get("fields")
      .elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    val eqIds: Seq[Int] = keys.map(k => fieldIds.getOrElse(k,
      throw new IllegalArgumentException(
        s"upsertByEquality key `$k` is not a top-level table column")))

    // (a) the source rows as ordinary data files (zero-row parts reclaimed)
    val partFields = IcebergWriter.specPartFields(meta)
    val partTypes = partFields.map(pf => pf.name ->
      IcebergWriter.transformResultType(pf, schema(pf.source).dataType)).toMap
    val newData0 = IcebergWriter.writeDataParts(source, fs, root,
      partFields, partTypes, fieldIds)
    val (emptyParts, newData) = newData0.partition(_._3.rows == 0L)
    emptyParts.foreach(e => fs.delete(new HPath(e._1), false))
    // (b) the distinct source keys as ONE equality-delete parquet, field
    // ids stamped so external readers resolve the columns by id
    val eqSchema = StructType(keys.map { k =>
      val f = schema(k)
      StructField(f.name, f.dataType, f.nullable,
        new MetadataBuilder().putLong("parquet.field.id",
          fieldIds(k).toLong).build())
    })
    val scratch = new HPath(root, s".graft_tmp_${java.util.UUID.randomUUID()}")
    // distinct shuffles once; parts write in parallel (each surviving part
    // becomes one equality-delete entry — no single-task funnel for a
    // billion-key source)
    source.select(keys.map(k => col(s"`$k`").as(k,
        eqSchema(k).metadata)): _*)
      .distinct()
      .write.mode("overwrite").parquet(scratch.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = new HPath(root, "data")
    fs.mkdirs(dataDir)
    val eqFiles: Seq[(String, Long, Long)] =
      PartitionLayout.collectParts(fs, scratch).flatMap { case (p, _) =>
        val fz = ColumnIndex.readFileZones(conf, p.toString, Seq.empty)
        require(fz.rows >= 0L,
          s"upsertByEquality could not read back the footer of $p")
        if (fz.rows == 0L) None
        else {
          val target = new HPath(dataDir, s"eqdelete-${p.getName}")
          require(fs.rename(p, target),
            s"upsertByEquality could not move $p into $dataDir")
          Some((target.toString, fs.getFileStatus(target).getLen, fz.rows))
        }
      }
    fs.delete(scratch, true)
    if (eqFiles.isEmpty && newData.isEmpty) return -1L // empty source

    // (c) driver-side assembly + commit, rebasable over ANY concurrent
    // commit with unchanged schema/spec (the upsert then serializes AFTER
    // it — replace-by-key semantics hold regardless of what landed, the
    // later sequence widening the delete's scope to cover it)
    def commitEq(metaNow: JsonNode, baseVersion: Long, attempt: Int): Long = {
      val seq = Option(metaNow.get("last-sequence-number")).filterNot(_.isNull)
        .map(_.asLong()).getOrElse(0L) + 1
      val snapId = Option(metaNow.get("snapshots")).filterNot(_.isNull)
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(_.get("snapshot-id").asLong()).foldLeft(0L)(math.max) + 1
      val now = System.currentTimeMillis()
      val metaFiles = Seq.newBuilder[HPath]
      val metaObj = metaNow.deepCopy[ObjectNode]()

      val eqManifest: Option[GenericRecord] =
        if (eqFiles.isEmpty) None
        else {
          val entries = eqFiles.map { case (p, size, rows) =>
            val e = new org.apache.avro.generic.GenericData.Record(eqManifestSchema)
            val d = new org.apache.avro.generic.GenericData.Record(
              eqManifestSchema.getField("data_file").schema())
            d.put("content", 2)
            d.put("file_path", p)
            d.put("file_format", "PARQUET")
            d.put("record_count", rows)
            d.put("file_size_in_bytes", size)
            val ids = new java.util.ArrayList[Integer]()
            eqIds.foreach(i => ids.add(Int.box(i)))
            d.put("equality_ids", ids)
            e.put("status", 1)
            e.put("sequence_number", Long.box(seq))
            e.put("data_file", d)
            e
          }
          val mp = new HPath(metaDir,
            s"graft-eq$snapId-${java.util.UUID.randomUUID()}.avro")
          IcebergWriter.writeAvro(fs, eqManifestSchema, entries, mp)
          metaFiles += mp
          val m = new org.apache.avro.generic.GenericData.Record(
            IcebergWriter.manifestListSchema)
          m.put("manifest_path", mp.toString)
          m.put("manifest_length", fs.getFileStatus(mp).getLen)
          m.put("partition_spec_id", unpartitionedSpecId(metaObj))
          m.put("content", 1)
          m.put("sequence_number", Long.box(seq))
          m.put("added_snapshot_id", snapId)
          Some(m)
        }
      val dataManifest: Option[GenericRecord] =
        if (newData.isEmpty) None
        else {
          val mSchema = IcebergWriter.manifestSchemaFor(
            partFields.map(pf => pf.name -> partTypes(pf.name)))
          val entries = newData.map { case (path, size, fz, tuple) =>
            IcebergWriter.manifestEntry(mSchema, seq, path, size, fz, tuple,
              fieldIds, c => schema.fields.find(_.name == c).map(_.dataType))
          }
          val mp = new HPath(metaDir,
            s"graft-m$snapId-${java.util.UUID.randomUUID()}.avro")
          IcebergWriter.writeAvro(fs, mSchema, entries, mp)
          metaFiles += mp
          val m = new org.apache.avro.generic.GenericData.Record(
            IcebergWriter.manifestListSchema)
          m.put("manifest_path", mp.toString)
          m.put("manifest_length", fs.getFileStatus(mp).getLen)
          m.put("partition_spec_id",
            Option(metaNow.get("default-spec-id")).map(_.asInt()).getOrElse(0))
          m.put("content", 0)
          m.put("sequence_number", Long.box(seq))
          m.put("added_snapshot_id", snapId)
          Some(m)
        }
      // every current manifest carries verbatim — equality deletes touch
      // no existing entry
      val carried = IcebergWriter.currentManifestList(fs, metaNow, dir).map { prev =>
        val m = new org.apache.avro.generic.GenericData.Record(
          IcebergWriter.manifestListSchema)
        m.put("manifest_path", prev._1)
        m.put("manifest_length", prev._2)
        m.put("partition_spec_id", prev._6)
        m.put("content", prev._3)
        prev._4.foreach(s => m.put("sequence_number", Long.box(s)))
        m.put("added_snapshot_id", prev._5)
        m
      }
      val listPath = new HPath(metaDir,
        s"snap-$snapId-${java.util.UUID.randomUUID()}.avro")
      IcebergWriter.writeAvro(fs, IcebergWriter.manifestListSchema,
        carried ++ eqManifest.toSeq ++ dataManifest.toSeq, listPath)
      metaFiles += listPath

      val snapNode = mapper.createObjectNode()
      snapNode.put("snapshot-id", snapId)
      snapNode.put("sequence-number", seq)
      snapNode.put("timestamp-ms", now)
      Option(metaNow.get("current-schema-id")).filterNot(_.isNull)
        .foreach(id => snapNode.put("schema-id", id.asInt()))
      snapNode.put("manifest-list", listPath.toString)
      snapNode.putObject("summary").put("operation", "overwrite")
      metaObj.put("last-sequence-number", seq)
      metaObj.put("last-updated-ms", now)
      metaObj.put("current-snapshot-id", snapId)
      metaObj.withArray("snapshots").add(snapNode)

      try {
        val version = IcebergWriter.commitMetadata(fs, metaDir, baseVersion,
          mapper.writeValueAsString(metaObj), "upsertByEquality")
        val hint = fs.create(new HPath(metaDir, "version-hint.text"), true)
        try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
        version
      } catch {
        case e: IllegalStateException
            if String.valueOf(e.getMessage).contains("commit race") =>
          metaFiles.result().foreach(p => scala.util.Try(fs.delete(p, false)))
          val (meta2, v2raw) = IcebergLoader.currentMetadataVersioned(fs, dir)
          val base2 =
            if (v2raw == -1L) IcebergWriter.metadataVersion(fs, metaDir)
            else v2raw
          if (attempt < 5 && stableFieldsEqual(metaNow, meta2))
            commitEq(meta2, base2, attempt + 1)
          else {
            (eqFiles.map(_._1) ++ newData.map(_._1)).foreach(p =>
              scala.util.Try(fs.delete(new HPath(p), false)))
            throw new IllegalStateException(
              "upsertByEquality lost the commit race to a concurrent writer " +
                "that changed the table's schema/spec — re-run against the " +
                "refreshed table", e)
          }
      }
    }
    val version = commitEq(meta, currentVersion, 1)
    ColumnIndexRegistry.refreshFromCommit(spark, dir, "iceberg")
    version
  }

  // ---- position-delete file write --------------------------------------------

  /** The spec's position-delete schema with its RESERVED field ids,
    * stamped into the parquet so real iceberg readers resolve the columns
    * by id (spec §Reserved Field IDs: file_path 2147483546, pos
    * 2147483545). */
  private val deleteSchema = StructType(Seq(
    StructField("file_path", StringType, nullable = false,
      new MetadataBuilder().putLong("parquet.field.id", 2147483546L).build()),
    StructField("pos", LongType, nullable = false,
      new MetadataBuilder().putLong("parquet.field.id", 2147483545L).build())))

  /** Write the matched (file, row) pairs as sorted position-delete parquet
    * files under `data/` and return (path, size, rows) per file. The sort
    * is the spec's required ordering (file_path, then pos) — a range
    * shuffle, fully distributed; files land via scratch + move like every
    * other writer path. `file_path` values are written in the MANIFEST's
    * RECORDED spelling (external engines match them verbatim against
    * their data-file entries — on a relocated table the recorded location
    * differs from the directory in use; review finding), mapped back from
    * the scan's percent-encoded `__graft_fp` domain through a broadcast
    * (canonical -> recorded) relation over the planned files. */
  private def writeDeleteFiles(spark: SparkSession, fs: FileSystem,
                               root: HPath, matchedIds: DataFrame,
                               plan: IcebergLoader.PlannedScan): Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val dataFiles = plan.dataFiles.map(_._1)
    val toRaw = spark.createDataFrame(dataFiles.map(p =>
        org.apache.spark.sql.Row(PartitionLayout.scanPathKey(p),
          plan.recordedDataPaths.getOrElse(p, PartitionLayout.stripFileScheme(p)))).asJava,
      StructType(Seq(
        StructField("__graft_fp", StringType, nullable = false),
        StructField("__graft_raw", StringType, nullable = false))))
    val scratch = new HPath(root, s".graft_tmp_${java.util.UUID.randomUUID()}")
    matchedIds
      .join(org.apache.spark.sql.functions.broadcast(toRaw), Seq("__graft_fp"))
      .select(
        col("__graft_raw").cast(StringType).as("file_path", deleteSchema("file_path").metadata),
        col("__graft_ri").cast(LongType).as("pos", deleteSchema("pos").metadata))
      .sort("file_path", "pos")
      .write.mode("overwrite").parquet(scratch.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = new HPath(root, "data")
    fs.mkdirs(dataDir)
    val out = PartitionLayout.collectParts(fs, scratch).flatMap { case (p, _) =>
      // footer FIRST: a zero-row part (empty matched set) never leaves the
      // scratch — moving then filtering left orphans in data/ (review
      // finding)
      val fz = ColumnIndex.readFileZones(conf, p.toString, Seq.empty)
      require(fz.rows >= 0L,
        s"IcebergDml could not read back the footer of $p")
      if (fz.rows == 0L) None
      else {
        val target = new HPath(dataDir, s"delete-${p.getName}")
        require(fs.rename(p, target),
          s"IcebergDml could not move delete file ${p.getName} into $dataDir")
        Some((target.toString, fs.getFileStatus(target).getLen, fz.rows))
      }
    }
    fs.delete(scratch, true)
    out
  }

  // ---- v3 deletion-vector write (puffin) -------------------------------------

  /** The v3 delete-manifest entry schema: [[IcebergWriter.manifestSchemaFor]]
    * plus the DV reference fields the reader resolves
    * (`referenced_data_file` / `content_offset` / `content_size_in_bytes`). */
  private val dvManifestSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"referenced_data_file","type":["null","string"],"default":null},
        |  {"name":"content_offset","type":["null","long"],"default":null},
        |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}
        |]}}]}""".stripMargin)

  /** Write the matched (file, row) pairs as ICEBERG V3 DELETION VECTORS:
    * one merged DV per touched data file (any existing DV for that file is
    * read task-side and unioned in — the spec's one-live-DV-per-file
    * rule), packed into one PUFFIN file per task (header magic, blobs,
    * spec-complete JSON footer), built entirely executor-side. Returns one
    * row per touched file: (referenced raw path, puffin path, blob offset,
    * blob length, merged cardinality, puffin file size). */
  private def writeDvPuffins(spark: SparkSession, fs: FileSystem,
                             root: HPath, matchedIds: DataFrame,
                             plan: IcebergLoader.PlannedScan,
                             snapId: Long,
                             seq: Long): Seq[(String, String, Long, Long, Long, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{collect_list, sort_array}
    val dataFiles = plan.dataFiles.map(_._1)
    // encoded scan key -> RECORDED manifest spelling (referenced_data_file
    // must match the manifests verbatim for external engines — relocated
    // tables record a different location than the directory in use)
    val toRaw: Map[String, String] = dataFiles.map(p =>
      PartitionLayout.scanPathKey(p) ->
        plan.recordedDataPaths.getOrElse(p, PartitionLayout.stripFileScheme(p))).toMap
    // encoded scan key -> existing DV pointer (merged task-side)
    val oldDv: Map[String, (String, Long, Long)] = plan.deletionVectors.map(d =>
      PartitionLayout.scanPathKey(d.referencedDataFile) ->
        (d.puffinPath, d.contentOffset, d.contentSize)).toMap
    val dataDir = new HPath(root, "data")
    fs.mkdirs(dataDir)
    val dirStr = dataDir.toString
    val confEntries = DistKit.confEntries(spark.sparkContext.hadoopConfiguration)
    val snapIdL = snapId; val seqL = seq

    // migration rows may reference files no longer live (inert deletes) —
    // drop them rather than refuse
    import spark.implicits._
    val liveKeys = toRaw.keys.toSeq.toDF("__graft_fp")
    matchedIds
      .join(org.apache.spark.sql.functions.broadcast(liveKeys),
        Seq("__graft_fp"), "left_semi")
      .groupBy(col("__graft_fp"))
      .agg(sort_array(collect_list(col("__graft_ri"))).as("ris"))
      .as[(String, Array[Long])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val conf = DistKit.rebuildConf(confEntries)
          val taskFs = new HPath(dirStr).getFileSystem(conf)
          val puffinPath = new HPath(dirStr,
            s"dv-${java.util.UUID.randomUUID()}.puffin")
          val out = new java.io.ByteArrayOutputStream()
          val magic = "PFA1".getBytes("UTF-8")
          out.write(magic)
          val results = Seq.newBuilder[(String, String, Long, Long, Long, Long)]
          val blobMeta = Seq.newBuilder[String]
          it.foreach { case (fp, ris) =>
            val raw = toRaw.getOrElse(fp, throw new IllegalStateException(
              s"DML matched rows in `$fp`, which is not a live data file"))
            val old = oldDv.get(fp).map { case (pp, off, sz) =>
              DeletionVectors.readIcebergDv(
                new HPath(pp).getFileSystem(conf), new HPath(pp), off, sz)
            }.getOrElse(Array.empty[Long])
            val merged = (old ++ ris).distinct.sorted
            val blob = DeletionVectors.frameIcebergDvBlob(
              DeletionVectors.serializePortable64(merged))
            val off = out.size().toLong
            out.write(blob)
            def js(s: String) = "\"" + s.replace("\\", "\\\\")
              .replace("\"", "\\\"") + "\""
            blobMeta += s"""{"type":"deletion-vector-v1","fields":[],""" +
              s""""snapshot-id":$snapIdL,"sequence-number":$seqL,""" +
              s""""offset":$off,"length":${blob.length},""" +
              s""""properties":{"referenced-data-file":${js(raw)},""" +
              s""""cardinality":"${merged.length}"}}"""
            results += ((raw, puffinPath.toString, off, blob.length.toLong,
              merged.length.toLong, -1L))
          }
          // spec footer: magic + JSON payload + payload size (i32 LE) +
          // flags (uncompressed) + magic
          val payload = ("{\"blobs\":[" + blobMeta.result().mkString(",") +
            "]}").getBytes("UTF-8")
          out.write(magic)
          out.write(payload)
          out.write(Array[Byte](
            (payload.length & 0xFF).toByte, ((payload.length >> 8) & 0xFF).toByte,
            ((payload.length >> 16) & 0xFF).toByte,
            ((payload.length >> 24) & 0xFF).toByte))
          out.write(Array[Byte](0, 0, 0, 0))
          out.write(magic)
          val os = taskFs.create(puffinPath, false)
          try os.write(out.toByteArray) finally os.close()
          val size = out.size().toLong
          results.result().iterator.map(r => r.copy(_6 = size))
        }
      }.collect().toSeq
  }

  /** The spec-id of an unpartitioned spec, ADDING one to `metaObj`'s
    * partition-specs when the table has none (delete manifests reference
    * it — the spec's global-delete form). */
  private def unpartitionedSpecId(metaObj: ObjectNode): Int = {
    val specs = Option(metaObj.get("partition-specs")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    specs.find(s => Option(s.get("fields")).forall(_.size() == 0))
      .map(s => Option(s.get("spec-id")).map(_.asInt()).getOrElse(0))
      .getOrElse {
        val nextId = specs.map(s =>
          Option(s.get("spec-id")).map(_.asInt()).getOrElse(0))
          .foldLeft(-1)(math.max) + 1
        val spec = mapper.createObjectNode()
        spec.put("spec-id", nextId)
        spec.putArray("fields")
        metaObj.withArray("partition-specs").add(spec)
        nextId
      }
  }
}
