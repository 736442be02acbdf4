package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal Apache Iceberg WRITER for filesystem-catalog tables — the sink
  * side of [[IcebergLoader]], mirroring [[DeltaWriter]] for the other
  * mainstream open table format. Built directly on the public spec
  * (iceberg.apache.org/spec): each commit writes parquet data files, one
  * Avro manifest, a new manifest-list, and a new `vN.metadata.json`
  * committed via `create(overwrite = false)` — the filesystem catalog's
  * put-if-absent point — then advances `version-hint.text`.
  *
  * Append carries the previous snapshot's manifest-list entries forward
  * (their sequence numbers intact) and adds one new manifest at the new
  * sequence number; overwrite starts a snapshot from only the new
  * manifest (old snapshots stay time-travelable, exactly Iceberg's
  * semantics — data files are never deleted by a commit). Schema is
  * declared on the first commit with spec field-ids assigned depth-first;
  * append enforces name/type compatibility, overwrite may replace the
  * schema (a new entry in `schemas` + `current-schema-id`, and the
  * snapshot records its own `schema-id` for time travel).
  *
  * Idempotent appends: an optional (appId, version) ledger lives in the
  * snapshot SUMMARY (`graft-app-id`/`graft-app-version`) — the same
  * exactly-once contract as [[DeltaWriter]]'s txn action, so
  * [[streamSink]] turns at-least-once micro-batch redelivery into an
  * exactly-once table.
  *
  * Supported: unpartitioned v2 tables, append + overwrite (appending onto
  * a legacy-v1 metadata layout normalizes its top-level `schema` into the
  * v2 `schemas` array). Unsupported (fails loudly): writing into
  * partitioned tables (v2 specs AND the legacy v1 `partition-spec` are
  * both checked).
  *
  * Interop scope — stated honestly: manifests carry the subset of fields
  * this repo's own planner consumes (status/content/file_path/file_format/
  * record_count — TRUE counts read from the parquet footers — and sizes),
  * NOT the full spec-required manifest schema (no partition struct, no
  * min/max sequence summaries, no Avro field-id properties), so tables
  * written here are for graft-read pipelines; full-fidelity interop with
  * java-iceberg/pyiceberg would need the complete Avro schemas. The
  * put-if-absent metadata commit is atomic on filesystems with atomic
  * create (file://, HDFS); S3-class stores need an external commit
  * coordinator, exactly as upstream Iceberg/Delta document for their own
  * filesystem catalogs. `version-hint.text` is advisory and
  * last-writer-wins under contention, the known filesystem-catalog
  * limitation (newest-metadata resolution still works without it). */
object IcebergWriter {

  private val mapper = new ObjectMapper()

  private val manifestSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  /** Write `df` as one Iceberg commit; returns the new metadata version. */
  def write(df: DataFrame, dir: String, mode: String = "append",
            txn: Option[(String, Long)] = None): Long = {
    require(mode == "append" || mode == "overwrite",
      s"IcebergWriter mode must be append|overwrite, got `$mode`")
    val spark = df.sparkSession
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new HPath(root, "metadata")
    fs.mkdirs(metaDir)

    val existing: Option[JsonNode] =
      if (fs.listStatus(metaDir).exists(_.getPath.getName.endsWith(".metadata.json")))
        Some(IcebergLoader.currentMetadata(fs, dir))
      else None

    existing.foreach { meta =>
      val specs = Option(meta.get("partition-specs")).filterNot(_.isNull)
      // v2 spec list AND the legacy v1 top-level `partition-spec` array —
      // missing the latter would silently DROP a v1 table's partitioning
      // (review finding)
      val partitioned = specs.exists(_.elements().asScala.exists(s =>
        s.get("fields").size() > 0)) ||
        Option(meta.get("partition-spec")).filterNot(_.isNull)
          .exists(_.elements().asScala.nonEmpty)
      require(!partitioned, "IcebergWriter supports unpartitioned tables only")
      if (mode == "append") {
        val have = IcebergLoader.tableSchema(meta)
          .fields.map(f => (f.name, f.dataType)).toSeq
        val want = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
        require(want == have,
          s"append schema ${want.mkString(",")} does not match table schema " +
            s"${have.mkString(",")} (overwrite to replace the schema)")
      }
    }

    // idempotent replay via the snapshot-summary ledger, BEFORE data writes
    val currentVersion =
      if (existing.isDefined) metadataVersion(fs, metaDir) else 0L
    val alreadyCommitted = txn.exists { case (appId, v) =>
      existing.exists(m => lastAppVersion(m, appId).exists(_ >= v))
    }
    if (alreadyCommitted) return currentVersion

    // data files (distributed write, then moved under data/)
    val dataDir = new HPath(root, "data")
    fs.mkdirs(dataDir)
    val scratch = new HPath(root, s".graft_tmp_${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(scratch.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val moved = fs.listStatus(scratch).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .map { p =>
        val target = new HPath(dataDir, p.getName)
        require(fs.rename(p, target),
          s"IcebergWriter could not move data file ${p.getName} into $dataDir")
        val st = fs.getFileStatus(target)
        // TRUE record counts off the parquet footer (a stats hint real
        // planners read; never a lie)
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(target, conf))
        val rc = try rd.getRecordCount finally rd.close()
        (target.toString, st.getLen, rc)
      }.toSeq
    fs.delete(scratch, true)

    val now = System.currentTimeMillis()
    val lastSeq = existing.flatMap(m =>
      Option(m.get("last-sequence-number")).filterNot(_.isNull).map(_.asLong()))
      .getOrElse(0L)
    val seq = lastSeq + 1
    val snapshots = existing.map(m => Option(m.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)).getOrElse(Seq.empty)
    val snapId = snapshots.map(_.get("snapshot-id").asLong()).foldLeft(0L)(math.max) + 1

    // one manifest for this commit's data files
    val manifestPath = new HPath(metaDir, s"graft-m$snapId-${java.util.UUID.randomUUID()}.avro")
    writeAvro(fs, manifestSchema, moved.map { case (path, size, rc) =>
      val e = new GenericData.Record(manifestSchema)
      val d = new GenericData.Record(manifestSchema.getField("data_file").schema())
      d.put("content", 0)
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("record_count", rc)
      d.put("file_size_in_bytes", size)
      e.put("status", 1)
      e.put("sequence_number", Long.box(seq))
      e.put("data_file", d)
      e
    }, manifestPath)

    // manifest list: previous entries carried forward on append
    val carried: Seq[GenericRecord] =
      if (mode == "overwrite") Seq.empty
      else existing.toSeq.flatMap { meta =>
        currentManifestList(fs, meta, dir).map { prev =>
          val m = new GenericData.Record(manifestListSchema)
          m.put("manifest_path", prev._1)
          m.put("manifest_length", prev._2)
          m.put("partition_spec_id", 0)
          m.put("content", prev._3)
          prev._4.foreach(s => m.put("sequence_number", Long.box(s)))
          m.put("added_snapshot_id", prev._5)
          m
        }
      }
    val newEntry = {
      val m = new GenericData.Record(manifestListSchema)
      m.put("manifest_path", manifestPath.toString)
      m.put("manifest_length", fs.getFileStatus(manifestPath).getLen)
      m.put("partition_spec_id", 0)
      m.put("content", 0)
      m.put("sequence_number", Long.box(seq))
      m.put("added_snapshot_id", snapId)
      m
    }
    val listPath = new HPath(metaDir, s"snap-$snapId-${java.util.UUID.randomUUID()}.avro")
    writeAvro(fs, manifestListSchema, carried :+ newEntry, listPath)

    // schema bookkeeping. `priorSchemas` normalizes the two metadata
    // generations: the v2 `schemas` array, or the legacy v1 top-level
    // `schema` wrapped with schema-id 0 — without the fallback an
    // append/overwrite on a v1-style table wrote `"schemas":null` /
    // invalid `[,{...}]` JSON and bricked the table (review finding).
    val priorSchemas: Seq[String] = existing.toSeq.flatMap { meta =>
      Option(meta.get("schemas")).filterNot(_.isNull)
        .map(_.elements().asScala.toSeq.map(mapper.writeValueAsString))
        .getOrElse {
          Option(meta.get("schema")).filterNot(_.isNull).toSeq.map { legacy =>
            val node = legacy.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
            if (!node.has("schema-id")) node.put("schema-id", 0)
            mapper.writeValueAsString(node)
          }
        }
    }
    val (schemasJson, schemaId, lastColumnId) = existing match {
      case Some(meta) if mode == "append" =>
        require(priorSchemas.nonEmpty,
          s"Iceberg table at `$dir` has no schema to append against")
        val cur = Option(meta.get("current-schema-id")).map(_.asInt()).getOrElse(0)
        val lci = Option(meta.get("last-column-id")).map(_.asInt()).getOrElse(0)
        (priorSchemas.mkString("[", ",", "]"), cur, lci)
      case Some(meta) => // overwrite: append a NEW schema entry
        val priorIds = existing.toSeq.flatMap(m =>
          Option(m.get("schemas")).filterNot(_.isNull)
            .map(_.elements().asScala.toSeq.map(_.get("schema-id").asInt()))
            .getOrElse(if (priorSchemas.isEmpty) Seq.empty else Seq(0)))
        val nextId = priorIds.foldLeft(-1)(math.max) + 1
        val startId = Option(meta.get("last-column-id")).map(_.asInt()).getOrElse(0)
        val (json, lci) = icebergSchemaJson(df.schema, nextId, startId)
        ((priorSchemas :+ json).mkString("[", ",", "]"), nextId, lci)
      case None =>
        val (json, lci) = icebergSchemaJson(df.schema, 0, 0)
        (s"[$json]", 0, lci)
    }

    val summaryExtra = txn.map { case (appId, v) =>
      s""","graft-app-id":${jstr(appId)},"graft-app-version":"$v"""" }.getOrElse("")
    val snapJson =
      s"""{"snapshot-id":$snapId,"sequence-number":$seq,"timestamp-ms":$now,
         |"schema-id":$schemaId,
         |"manifest-list":${jstr(listPath.toString)},
         |"summary":{"operation":"${if (mode == "overwrite") "overwrite" else "append"}"$summaryExtra}}""".stripMargin
    val allSnaps = (snapshots.map(mapper.writeValueAsString) :+ snapJson)
      .mkString("[", ",", "]")
    val tableUuid = existing.flatMap(m => Option(m.get("table-uuid")).map(_.asText()))
      .getOrElse(java.util.UUID.randomUUID().toString)

    val metaJson =
      s"""{"format-version":2,"table-uuid":"$tableUuid",
         |"location":${jstr(dir)},"last-sequence-number":$seq,
         |"last-updated-ms":$now,"last-column-id":$lastColumnId,
         |"current-schema-id":$schemaId,
         |"schemas":$schemasJson,
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"last-partition-id":999,"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":$snapId,
         |"snapshots":$allSnaps}""".stripMargin

    // put-if-absent metadata commit. UNLIKE DeltaWriter's append retry,
    // a lost race here cannot be retried in place: the metadata JSON
    // embeds the full snapshot lineage computed against the PRE-race
    // state, so publishing it at the next version would orphan the
    // winner's snapshot — fail loudly and let the caller re-run (the
    // moved data files are unreferenced orphans, the protocol's standard
    // uncommitted-write story).
    val version = currentVersion + 1
    val target = new HPath(metaDir, s"v$version.metadata.json")
    try {
      val out = fs.create(target, false)
      try out.write(metaJson.getBytes("UTF-8")) finally out.close()
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.io.IOException if fs.exists(target) =>
        throw new IllegalStateException(
          s"IcebergWriter lost a commit race at v$version to a concurrent " +
            s"writer; re-run the $mode against the refreshed table")
    }
    // advisory hint — last writer wins; newest-metadata resolution is the
    // fallback (IcebergLoader handles both)
    val hint = fs.create(new HPath(metaDir, "version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
    version
  }

  /** Exactly-once streaming sink — [[DeltaWriter.streamSink]]'s contract
    * for Iceberg tables. */
  def streamSink(data: DataFrame, dir: String, appId: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    data.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        write(batch, dir, mode = "append", txn = Some((appId, batchId)))
        ()
    }

  // ---- helpers --------------------------------------------------------------

  private def metadataVersion(fs: FileSystem, metaDir: HPath): Long = {
    val rx = """v(\d+)\.metadata\.json""".r
    fs.listStatus(metaDir).map(_.getPath.getName).collect {
      case rx(v) => v.toLong
    }.foldLeft(0L)(math.max)
  }

  /** The ledger: newest `graft-app-version` for `appId` across snapshot
    * summaries. */
  private[sources] def lastAppVersion(meta: JsonNode, appId: String): Option[Long] = {
    val vs = Option(meta.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .flatMap { s =>
        val sum = Option(s.get("summary")).filterNot(_.isNull)
        val app = sum.flatMap(x => Option(x.get("graft-app-id"))).map(_.asText())
        if (app.contains(appId))
          sum.flatMap(x => Option(x.get("graft-app-version"))).map(_.asText().toLong)
        else None
      }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The current snapshot's manifest-list entries as
    * (path, length, content, seq, addedSnapshotId). */
  private def currentManifestList(fs: FileSystem, meta: JsonNode, dir: String)
      : Seq[(String, Long, Int, Option[Long], Long)] = {
    val curId = Option(meta.get("current-snapshot-id")).filterNot(_.isNull)
      .map(_.asLong()).filter(_ != -1L)
    val snap = curId.flatMap { id =>
      Option(meta.get("snapshots")).filterNot(_.isNull)
        .flatMap(_.elements().asScala.find(_.get("snapshot-id").asLong() == id))
    }
    snap.toSeq.flatMap { s =>
      val ml = Option(s.get("manifest-list")).filterNot(_.isNull).map(_.asText())
      ml.toSeq.flatMap { path =>
        val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
          new org.apache.avro.file.SeekableByteArrayInput(readBytes(fs, new HPath(path))),
          new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try {
          val out = Seq.newBuilder[(String, Long, Int, Option[Long], Long)]
          while (reader.hasNext) {
            val r = reader.next()
            out += ((String.valueOf(r.get("manifest_path")),
              Option(r.get("manifest_length")).map(_.asInstanceOf[Number].longValue()).getOrElse(0L),
              Option(r.get("content")).map(_.asInstanceOf[Number].intValue()).getOrElse(0),
              Option(r.get("sequence_number")).map(_.asInstanceOf[Number].longValue()),
              Option(r.get("added_snapshot_id")).map(_.asInstanceOf[Number].longValue()).getOrElse(0L)))
          }
          out.result()
        } finally reader.close()
      }
    }
  }

  private def readBytes(fs: FileSystem, p: HPath): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def writeAvro(fs: FileSystem, schema: Schema, recs: Seq[GenericRecord],
                        target: HPath): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    recs.foreach(w.append)
    w.close()
    val os = fs.create(target, false)
    try os.write(out.toByteArray) finally os.close()
  }

  /** Spark schema -> Iceberg struct JSON with field-ids assigned
    * depth-first from `startId + 1`; returns (json, lastAssignedId). */
  private[sources] def icebergSchemaJson(schema: StructType, schemaId: Int,
                                         startId: Int): (String, Int) = {
    var next = startId
    def id(): Int = { next += 1; next }
    def typeJson(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case DateType => "\"date\""
      case TimestampType => "\"timestamptz\""
      case TimestampNTZType => "\"timestamp\""
      case StringType => "\"string\""
      case BinaryType => "\"binary\""
      case d: DecimalType => s""""decimal(${d.precision}, ${d.scale})""""
      case s: StructType =>
        val fields = s.fields.map { f =>
          val fid = id()
          val t = typeJson(f.dataType) // evaluate AFTER the field's own id
          s"""{"id":$fid,"name":${jstr(f.name)},"required":${!f.nullable},"type":$t}"""
        }
        fields.mkString("""{"type":"struct","fields":[""", ",", "]}")
      case a: ArrayType =>
        val eid = id()
        val t = typeJson(a.elementType)
        s"""{"type":"list","element-id":$eid,"element":$t,"element-required":${!a.containsNull}}"""
      case m: MapType =>
        val kid = id(); val kt = typeJson(m.keyType)
        val vid = id(); val vt = typeJson(m.valueType)
        s"""{"type":"map","key-id":$kid,"key":$kt,"value-id":$vid,"value":$vt,"value-required":${!m.valueContainsNull}}"""
      case other => throw new IllegalArgumentException(
        s"IcebergWriter: no iceberg type for $other")
    }
    val fields = schema.fields.map { f =>
      val fid = id()
      val t = typeJson(f.dataType)
      s"""{"id":$fid,"name":${jstr(f.name)},"required":${!f.nullable},"type":$t}"""
    }
    (fields.mkString(
      s"""{"type":"struct","schema-id":$schemaId,"fields":[""", ",", "]}"),
      next)
  }

  private def jstr(s: String): String = mapper.writeValueAsString(s)
}
