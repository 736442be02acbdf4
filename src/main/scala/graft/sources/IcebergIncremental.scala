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
    val remap = IcebergLoader.pathRemapper(meta, dir)
    val files = Seq.newBuilder[String]
    appends.foreach { s =>
      val sid = s.get("snapshot-id").asLong()
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
              files += remap(IcebergLoader.str(df, "file_path"))
            }
          }
        }
      }
    }
    val paths = files.result().distinct
    if (paths.isEmpty) return emptyLike(spark, meta, to)
    val schemaNode = IcebergLoader.schemaNodeFor(meta, Some(to))
    val schema = IcebergLoader.sparkSchemaOf(schemaNode)
    spark.read.schema(schema).parquet(paths: _*)
  }

  private def emptyLike(spark: SparkSession, meta: JsonNode,
                        to: JsonNode): DataFrame = {
    val schema = IcebergLoader.sparkSchemaOf(
      IcebergLoader.schemaNodeFor(meta, Some(to)))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
