package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, regexp_replace}
import org.apache.spark.sql.types._

/** Minimal Apache Iceberg reader built directly on the PUBLIC Iceberg table
  * spec (iceberg.apache.org/spec — metadata JSON, Avro manifest lists and
  * manifests): resolve the current table metadata, follow the chosen
  * snapshot's manifest list to its manifests, collect the snapshot's live
  * parquet data files, and hand that list to Spark's parquet source — the
  * same shape as [[DeltaLoader]] (reference precedent:
  * columnq/src/table/delta.rs:104-297 delegates identical log-replay work
  * to delta-rs; Iceberg is the other mainstream lake format a roapi-class
  * user points at).
  *
  * Scale shape: snapshot planning is driver-side metadata work — exactly
  * where Iceberg's own core library plans scans — bounded by manifest
  * size, while the data read is a standard distributed parquet scan
  * (pushdown, pruning, partition parallelism all apply). Identity
  * partition values live IN Iceberg data files (unlike Delta), so no
  * partition reconstruction is needed.
  *
  * Supported: format-version 1 and 2; `version-hint.text` or newest
  * `*.metadata.json` resolution; v1 snapshots with inline `manifests`
  * lists; v2 POSITION deletes (matched on `_metadata.file_path` +
  * `row_index`, the [[DeltaLoader]] deletion-vector mechanism); relocated
  * tables (metadata `location` remapped to the actual table root); a
  * `snapshot-id` option for time travel.
  *
  * Unsupported (fails loudly): format-version > 2, equality deletes,
  * non-parquet data files. Column-rename evolution relies on field IDs
  * the name-based parquet read does not consult — renamed columns read
  * as null from pre-rename files (documented minimal-reader trade). */
object IcebergLoader {

  private val mapper = new ObjectMapper()

  def load(spark: SparkSession, src: TableSource): DataFrame = {
    val fs = new HPath(src.uri).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = currentMetadata(fs, src.uri)
    val snapshotId = src.options.get("snapshot-id").map(_.toLong)
    toDataFrame(spark, fs, src.uri, meta, snapshotId)
  }

  // ---- metadata resolution --------------------------------------------------

  private def readBytes(fs: FileSystem, p: HPath): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private val VersionedName = """v(\d+)\.metadata\.json""".r

  /** `metadata/version-hint.text` names the live metadata version
    * (filesystem-catalog protocol); without a hint the newest
    * `*.metadata.json` wins — by NUMERIC version for the `vN` scheme
    * (lexicographic order would put v2 after v10) and by name for the
    * zero-padded `00003-<uuid>` scheme. */
  private[sources] def currentMetadata(fs: FileSystem, tableUri: String): JsonNode = {
    val metaDir = new HPath(tableUri, "metadata")
    require(fs.isDirectory(metaDir),
      s"`$tableUri` is not an Iceberg table (no metadata directory)")
    val hint = new HPath(metaDir, "version-hint.text")
    val metaPath =
      if (fs.exists(hint)) {
        val v = new String(readBytes(fs, hint), "UTF-8").trim
        new HPath(metaDir, s"v$v.metadata.json")
      } else {
        val candidates = fs.listStatus(metaDir).map(_.getPath.getName)
          .filter(_.endsWith(".metadata.json"))
        require(candidates.nonEmpty, s"`$tableUri`: no *.metadata.json found")
        val newest = candidates.maxBy {
          case VersionedName(n) => (1, n.toLong, "")
          case other => (0, 0L, other)
        }
        new HPath(metaDir, newest)
      }
    val node = mapper.readTree(readBytes(fs, metaPath))
    val fv = node.get("format-version").asInt()
    require(fv == 1 || fv == 2,
      s"Iceberg reader: format-version $fv not supported (spec v1/v2 only)")
    node
  }

  // ---- schema ---------------------------------------------------------------

  /** The current table schema: `schemas[current-schema-id]` (v2) or the
    * legacy top-level `schema` (v1). */
  private[sources] def tableSchema(meta: JsonNode): StructType = {
    val schemaNode = Option(meta.get("schemas")).filterNot(_.isNull).map { arr =>
      val id = meta.get("current-schema-id").asInt()
      arr.elements().asScala.find(_.get("schema-id").asInt() == id)
        .getOrElse(throw new IllegalArgumentException(
          s"Iceberg reader: current-schema-id $id not in schemas"))
    }.getOrElse(meta.get("schema"))
    toSparkType(schemaNode).asInstanceOf[StructType]
  }

  private def toSparkType(node: JsonNode): DataType =
    if (node.isTextual) primitiveType(node.asText())
    else node.get("type").asText() match {
      case "struct" =>
        StructType(node.get("fields").elements().asScala.map { f =>
          StructField(f.get("name").asText(), toSparkType(f.get("type")),
            nullable = !f.get("required").asBoolean())
        }.toArray)
      case "list" =>
        ArrayType(toSparkType(node.get("element")),
          containsNull = !node.get("element-required").asBoolean())
      case "map" =>
        MapType(toSparkType(node.get("key")), toSparkType(node.get("value")),
          valueContainsNull = !node.get("value-required").asBoolean())
      case other =>
        throw new IllegalArgumentException(s"Iceberg reader: unknown type `$other`")
    }

  private val DecimalRx = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRx = """fixed\[\s*(\d+)\s*\]""".r

  private def primitiveType(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    // spec: `timestamp` is zone-naive, `timestamptz` is UTC-adjusted
    case "timestamp" => TimestampNTZType
    case "timestamptz" => TimestampType
    case "string" => StringType
    case "uuid" => StringType
    case "binary" => BinaryType
    case FixedRx(_) => BinaryType
    case DecimalRx(p, s) => DecimalType(p.toInt, s.toInt)
    case other =>
      throw new IllegalArgumentException(s"Iceberg reader: unknown primitive `$other`")
  }

  // ---- snapshot planning ----------------------------------------------------

  private final case class PlannedScan(dataFiles: Seq[String],
                                       positionDeleteFiles: Seq[String])

  private def readAvro(fs: FileSystem, p: HPath): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(readBytes(fs, p)),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.result()
    } finally reader.close()
  }

  private def str(r: GenericRecord, field: String): String =
    String.valueOf(r.get(field))
  /** v1 files simply LACK the v2 fields (content etc.) — absent-from-schema
    * and present-but-null both take the default. */
  private def intOr(r: GenericRecord, field: String, dflt: Int): Int =
    if (r.getSchema.getField(field) == null) dflt
    else Option(r.get(field)).map(_.asInstanceOf[Number].intValue()).getOrElse(dflt)

  /** Walk manifest list -> manifests -> live file paths for one snapshot.
    * Manifest-entry statuses: 0 EXISTING / 1 ADDED are part of the
    * snapshot, 2 DELETED records a removal; data_file.content: 0 data,
    * 1 position deletes, 2 equality deletes. */
  private def planSnapshot(fs: FileSystem, tableUri: String, meta: JsonNode,
                           snapshotId: Option[Long]): PlannedScan = {
    val snapshots = Option(meta.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val chosenId = snapshotId.orElse(
      Option(meta.get("current-snapshot-id")).filterNot(_.isNull)
        .map(_.asLong()).filter(_ != -1L))
    val snap = chosenId.flatMap(id =>
      snapshots.find(_.get("snapshot-id").asLong() == id))
    (snap, chosenId) match {
      case (None, Some(id)) => throw new IllegalArgumentException(
        s"Iceberg reader: snapshot $id not found in `$tableUri`")
      case (None, None) => return PlannedScan(Seq.empty, Seq.empty) // empty table
      case _ => ()
    }
    val s = snap.get
    val remap = pathRemapper(meta, tableUri)
    // v1 early form: the snapshot lists its manifests inline; later v1 and
    // all v2 point at a manifest-list Avro file
    val manifests: Seq[(String, Int)] =
      Option(s.get("manifest-list")).filterNot(_.isNull) match {
        case Some(ml) =>
          readAvro(fs, new HPath(remap(ml.asText()))).map(m =>
            (remap(str(m, "manifest_path")), intOr(m, "content", 0)))
        case None =>
          Option(s.get("manifests")).filterNot(_.isNull)
            .map(_.elements().asScala.map(p => (remap(p.asText()), 0)).toSeq)
            .getOrElse(throw new IllegalArgumentException(
              "Iceberg reader: snapshot has neither manifest-list nor manifests"))
      }
    val data = Seq.newBuilder[String]
    val posDeletes = Seq.newBuilder[String]
    manifests.foreach { case (path, manifestContent) =>
      readAvro(fs, new HPath(path)).foreach { entry =>
        val status = intOr(entry, "status", 1)
        if (status != 2) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val fileContent = intOr(df, "content", manifestContent)
          val filePath = remap(str(df, "file_path"))
          fileContent match {
            case 0 =>
              val fmt = str(df, "file_format").toUpperCase
              require(fmt == "PARQUET",
                s"Iceberg reader: data file format `$fmt` not supported (parquet only)")
              data += filePath
            case 1 => posDeletes += filePath
            case 2 => throw new IllegalArgumentException(
              "Iceberg reader: equality deletes are not supported")
            case other => throw new IllegalArgumentException(
              s"Iceberg reader: unknown data_file content $other")
          }
        }
      }
    }
    PlannedScan(data.result(), posDeletes.result())
  }

  /** Iceberg stores ABSOLUTE paths from write time; a relocated table's
    * paths are remapped by swapping the metadata `location` prefix for the
    * actual table root. Both sides normalize their `file:///` vs `file:/`
    * URI spelling FIRST — different writers emit different (equally valid)
    * forms, and a form mismatch must not silently skip the remap. */
  private def pathRemapper(meta: JsonNode, tableUri: String): String => String = {
    def norm(p: String): String = p.replaceFirst("^file:/+", "/")
    val location = Option(meta.get("location")).filterNot(_.isNull)
      .map(l => norm(l.asText().stripSuffix("/")))
    val root = norm(tableUri.stripSuffix("/"))
    p0 => {
      val p = norm(p0)
      location match {
        case Some(loc) if p.startsWith(loc + "/") => root + p.stripPrefix(loc)
        case _ => p
      }
    }
  }

  // ---- scan -----------------------------------------------------------------

  private def normFp(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^file:/+", "/")

  private def toDataFrame(spark: SparkSession, fs: FileSystem, tableUri: String,
                          meta: JsonNode, snapshotId: Option[Long]): DataFrame = {
    val schema = tableSchema(meta)
    val plan = planSnapshot(fs, tableUri, meta, snapshotId)
    if (plan.dataFiles.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val base = spark.read.schema(schema).parquet(plan.dataFiles: _*)
    if (plan.positionDeleteFiles.isEmpty) base
    else {
      // position deletes: parquet files of (file_path, pos) — the spec's
      // delete-file schema — anti-joined against the reader's file/row
      // identity, the same mechanism as Delta deletion vectors. Delete
      // files are small relative to data (they hold tombstones only) and
      // broadcast; file_path values are write-time absolute, so they get
      // the same location remap as the scan paths — applied AFTER both
      // sides normalize their file:/// vs file:/ URI spelling, so a
      // writer's different (equally valid) URI form cannot silently skip
      // the remap and resurrect deleted rows.
      def normStr(p: String): String = p.replaceFirst("^file:/+", "/")
      val loc = Option(meta.get("location")).filterNot(_.isNull)
        .map(p => normStr(p.asText().stripSuffix("/")))
      val root = normStr(tableUri.stripSuffix("/"))
      val rawDeletes = spark.read.parquet(plan.positionDeleteFiles: _*)
        .select(normFp(col("file_path").cast("string")).as("__graft_fp"),
          col("pos").cast("long").as("__graft_ri"))
      val deletes = loc.filter(_ != root).fold(rawDeletes)(l =>
        rawDeletes.withColumn("__graft_fp", regexp_replace(col("__graft_fp"),
          "^" + java.util.regex.Pattern.quote(l + "/"),
          java.util.regex.Matcher.quoteReplacement(root + "/"))))
      base
        .withColumn("__graft_fp", normFp(col("_metadata.file_path")))
        .withColumn("__graft_ri", col("_metadata.row_index"))
        .join(broadcast(deletes), Seq("__graft_fp", "__graft_ri"), "left_anti")
        .select(schema.fieldNames.map(n => col(s"`$n`")).toIndexedSeq: _*)
    }
  }
}
