package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.DataFrame

/** Minimal Delta Lake WRITER built on the public transaction-log protocol
  * (delta.io/protocol) — the sink side of [[DeltaLoader]], so a curation
  * pipeline can land its output as a transactional table instead of bare
  * parquet (reference precedent: the reference READS delta via delta-rs,
  * columnq/src/table/delta.rs; writing is the natural pipeline extension).
  *
  * Commit mechanics: data part files are written distributed (a normal
  * Spark parquet write into a scratch dir, then moved under the table
  * root), and the version's actions land in `_delta_log/<v>.json` through
  * `FileSystem.create(path, overwrite = false)` — the protocol's
  * put-if-absent primitive. On stores with ATOMIC create (file://, HDFS,
  * abfss) two writers racing to the same version cannot both win; the
  * loser re-reads the log, RE-VALIDATES against the fresh snapshot
  * (schema compatibility, txn ledger, metaData-on-first-commit), and
  * retries at the next version. S3-class stores have no atomic
  * create-if-absent — there the Delta protocol itself requires an
  * external commit coordinator (delta-rs uses a DynamoDB lock), and this
  * writer inherits that documented limitation. A crash before the commit
  * leaves only uncommitted data files — invisible to every reader,
  * reclaimable by vacuum, exactly the protocol's orphan story.
  *
  * Idempotent appends: an optional `txn` (appId, version) action makes a
  * commit a no-op when the log already carries that appId at >= version —
  * the streaming foreachBatch sink passes its micro-batch id, turning
  * at-least-once batch redelivery into exactly-once table contents
  * (the same discipline as the persisted MinHash index's batch stamps).
  *
  * Supported: unpartitioned tables, append + overwrite, schema declared on
  * first commit, schema-compatibility enforcement on append, version
  * continuation after any reader-compatible log (checkpoint-based tables
  * append fine — new JSON commits replay after the checkpoint).
  * Unsupported (fails loudly): appending to column-mapped tables (data
  * files would need physical names), partitioned writes. Checkpoints are
  * never written — readers (ours, delta-rs) replay JSON commits.
  */
object DeltaWriter {

  private val mapper = new ObjectMapper()

  /** Write `df` as one Delta commit; returns the committed version (or the
    * already-committed version for an idempotent-skip). */
  def write(df: DataFrame, dir: String, mode: String = "append",
            txn: Option[(String, Long)] = None): Long = {
    require(mode == "append" || mode == "overwrite",
      s"DeltaWriter mode must be append|overwrite, got `$mode`")
    val spark = df.sparkSession
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new HPath(root, "_delta_log")
    fs.mkdirs(logDir)

    // the data files are written ONCE (their add actions are valid against
    // any snapshot); everything snapshot-DEPENDENT — validation, the txn
    // ledger check, removes, metaData-on-first-commit — is recomputed from
    // a FRESH log read on every commit attempt, so losing a race to a
    // concurrent CREATE or schema-changing commit re-validates instead of
    // republishing stale metaData/removes (review finding).
    var adds: Seq[String] = null
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 20,
        s"DeltaWriter gave up after $attempts contended commit attempts on $dir")

      val existing: Option[DeltaLoader.Snapshot] =
        if (fs.listStatus(logDir).exists(_.getPath.getName.matches("\\d{20}\\.json")) ||
            fs.exists(new HPath(logDir, "_last_checkpoint")))
          Some(DeltaLoader.snapshot(spark, dir))
        else None

      existing.foreach { s =>
        require(s.columnMappingMode == "none",
          "DeltaWriter cannot write into a column-mapped table " +
            "(data files would need physical column names)")
        require(s.partitionColumns.isEmpty,
          "DeltaWriter supports unpartitioned tables only")
        if (mode == "append") {
          val want = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
          val have = s.schema.fields.map(f => (f.name, f.dataType)).toSeq
          require(want == have,
            s"append schema ${want.mkString(",")} does not match table schema " +
              s"${have.mkString(",")} (overwrite to replace the schema)")
        }
      }

      // idempotent replay: the txn ledger is consulted BEFORE any data
      // write, so a redelivered micro-batch costs two metadata reads, not
      // a parquet pass
      val alreadyCommitted = txn.exists { case (appId, v) =>
        lastTxnVersion(fs, logDir, appId).exists(_ >= v)
      }
      if (alreadyCommitted) return existing.map(_.version).getOrElse(0L)

      val now = System.currentTimeMillis()
      if (adds == null) {
        // distributed data write into a scratch dir, then move each part
        // under the table root (part names carry Spark's task UUIDs —
        // unique across concurrent writers by construction)
        val scratch = new HPath(root, s".graft_tmp_${java.util.UUID.randomUUID()}")
        df.write.mode("overwrite").parquet(scratch.toString)
        val parts = fs.listStatus(scratch).map(_.getPath)
          .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        adds = parts.map { p =>
          val name = p.getName
          require(fs.rename(p, new HPath(root, name)),
            s"DeltaWriter could not move data file $name into $dir")
          val size = fs.getFileStatus(new HPath(root, name)).getLen
          s"""{"add":{"path":"$name","partitionValues":{},"size":$size,""" +
            s""""modificationTime":$now,"dataChange":true}}"""
        }.toSeq
        fs.delete(scratch, true)
      }

      val removes =
        if (mode == "overwrite")
          existing.toSeq.flatMap(_.files).map(f =>
            s"""{"remove":{"path":${jstr(f.path)},"deletionTimestamp":$now,""" +
              """"dataChange":true}}""")
        else Seq.empty
      val metaLines =
        if (existing.isEmpty || mode == "overwrite")
          Seq(
            """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
            s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}",""" +
              """"format":{"provider":"parquet","options":{}},""" +
              s""""schemaString":${jstr(df.schema.json)},""" +
              s""""partitionColumns":[],"configuration":{},"createdTime":$now}}""")
        else Seq.empty
      val txnLines = txn.toSeq.map { case (appId, v) =>
        s"""{"txn":{"appId":${jstr(appId)},"version":$v,"lastUpdated":$now}}"""
      }
      val commitInfo =
        s"""{"commitInfo":{"timestamp":$now,"operation":"${
          if (mode == "overwrite") "WRITE" else "APPEND"}","operationParameters":{},""" +
          """"engineInfo":"graft-delta-writer"}}"""
      val lines = (Seq(commitInfo) ++ metaLines ++ txnLines ++ removes ++ adds)
        .mkString("", "\n", "\n")

      val version = existing.map(_.version + 1).getOrElse(0L)
      val target = new HPath(logDir, f"$version%020d.json")
      try {
        val out = fs.create(target, false) // put-if-absent: the commit point
        try out.write(lines.getBytes("UTF-8")) finally out.close()
        return version
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.io.IOException if fs.exists(target) =>
          // lost the race — loop back to a FRESH snapshot read. Appends
          // recompute and retry; an overwrite's remove set went stale, so
          // it refuses rather than resurrect or double-tombstone files.
          require(mode == "append",
            s"DeltaWriter overwrite lost a commit race at version $version; retry the operation")
      }
    }
    -1L // unreachable
  }

  /** Highest txn version committed for `appId`, from the JSON commits (this
    * writer never writes checkpoints; a checkpoint-bearing table still
    * keeps its post-checkpoint JSON, which is where OUR txns live). */
  private[sources] def lastTxnVersion(fs: FileSystem, logDir: HPath,
                                      appId: String): Option[Long] = {
    val commitRx = raw"\d{20}\.json".r
    val versions = fs.listStatus(logDir).map(_.getPath)
      .filter(p => commitRx.matches(p.getName)).sortBy(_.getName)
      .flatMap { p =>
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        text.split('\n').filter(_.nonEmpty).flatMap { line =>
          val t = mapper.readTree(line).get("txn")
          if (t == null || t.isNull || t.get("appId").asText() != appId) None
          else Some(t.get("version").asLong())
        }
      }
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Exactly-once streaming sink: foreachBatch append with the micro-batch
    * id as the txn version — a redelivered batch is skipped by the ledger,
    * so the TABLE is exactly-once while the stream stays at-least-once
    * (the [[graft.streaming.EventStream]] index discipline, applied to a
    * Delta sink). `appId` must be stable for the query's lifetime — use
    * the checkpoint's query id or a caller-chosen pipeline name. */
  def streamSink(data: DataFrame, dir: String, appId: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    data.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        write(batch, dir, mode = "append", txn = Some((appId, batchId)))
        ()
    }

  private def jstr(s: String): String = mapper.writeValueAsString(s)
}
