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
  *    immutable, only the bitmap moved);
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
  * parquet scans of ONLY the changed files, with per-file row-index sets
  * riding as broadcast joins. DV deltas decode on the driver bounded by
  * the range's changed-row cardinality — the set a CDF consumer is about
  * to materialize anyway.
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
    frames.reduce(_ unionByName _)
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
    def dvRows(node: JsonNode): Array[Long] =
      Option(node).filterNot(_.isNull).map { d =>
        DeltaCdcShim.parseDv(d) match {
          case Some(desc) => DeletionVectors.read(
            spark.sparkContext.hadoopConfiguration, dir, desc)
          case None => Array.empty[Long]
        }
      }.getOrElse(Array.empty[Long])

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
    // with the (file, row) sets riding a broadcast join, not 10k unioned
    // single-file scans (review finding)
    val adds = lines.flatMap(n => Option(n.get("add")).filterNot(_.isNull))
      .filter(a => Option(a.get("dataChange")).exists(_.asBoolean(false)))
    val removes = lines.flatMap(n => Option(n.get("remove")).filterNot(_.isNull))
      .filter(r => Option(r.get("dataChange")).exists(_.asBoolean(false)))
    val addByPath = adds.map(a => a.get("path").asText() -> a).toMap
    val removeByPath = removes.map(r => r.get("path").asText() -> r).toMap
    def scanKey(path: String): String = PartitionLayout.scanPathKey(abs(path))

    // (path, pv, row-index set) per mode
    val swaps = Seq.newBuilder[(String, Map[String, String], Array[Long])]
    val freshAdds = Seq.newBuilder[(String, Map[String, String], Array[Long])]
    val fullRemoves = Seq.newBuilder[(String, Map[String, String], Array[Long])]
    addByPath.foreach { case (path, add) =>
      removeByPath.get(path) match {
        case Some(rm) =>
          // DV swap: the delta between the bitmaps is this commit's deletes
          val fresh = dvRows(add.get("deletionVector"))
          val old = dvRows(rm.get("deletionVector")).toSet
          val delta = fresh.filterNot(old)
          if (delta.nonEmpty) swaps += ((path, pvOf(add), delta))
        case None =>
          freshAdds += ((path, pvOf(add), dvRows(add.get("deletionVector"))))
      }
    }
    removeByPath.foreach { case (path, rm) =>
      if (!addByPath.contains(path))
        fullRemoves += ((path, pvOf(rm), dvRows(rm.get("deletionVector"))))
    }

    /** One grouped scan per partition tuple: `include` joins the (file,
      * row) pairs semi (row-level deltas), exclude mode anti-joins them
      * (live rows of whole files). */
    def grouped(slices: Seq[(String, Map[String, String], Array[Long])],
                include: Boolean, ct: String): Seq[DataFrame] =
      slices.groupBy(_._2).map { case (pv, group) =>
        val files = group.map(_._1)
        val scan = toLogical(
          spark.read.schema(dataSchema).parquet(files.map(abs): _*)
            .withColumn("__fp", org.apache.spark.sql.functions.regexp_replace(
              col("_metadata.file_path"), "^file:/+", "/"))
            .withColumn("__ri", col("_metadata.row_index")),
          Seq("__fp", "__ri"))
        val pairs = group.flatMap { case (p, _, ris) =>
          val k = scanKey(p); ris.map(ri => (k, ri))
        }
        val joined =
          if (pairs.isEmpty) { if (include) scan.limit(0) else scan }
          else {
            import spark.implicits._
            val idx = broadcast(pairs.toDF("__fp", "__ri"))
            scan.join(idx, Seq("__fp", "__ri"),
              if (include) "left_semi" else "left_anti")
          }
        stamp(withPartitions(joined.drop("__fp", "__ri"), pv), Some(ct))
          .select(outputColumns(snap): _*)
      }.toSeq

    grouped(swaps.result(), include = true, "delete") ++
      grouped(freshAdds.result(), include = false, "insert") ++
      grouped(fullRemoves.result(), include = false, "delete")
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
