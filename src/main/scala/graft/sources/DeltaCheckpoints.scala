package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Checkpoint-file RESOLUTION and reading for all three public layouts of
  * the Delta protocol (delta.io/protocol §Checkpoints), shared by
  * [[DeltaLoader]] (replay base) and [[DeltaWriter]] (vacuum tombstones,
  * base-checkpoint folding, the txn-ledger fallback, cleanupLog's
  * completeness gate):
  *
  *  - classic single-file: `<v>.checkpoint.parquet`
  *  - classic multi-part:  `<v>.checkpoint.<i>.<n>.parquet`, `parts` = n
  *    recorded in `_last_checkpoint`
  *  - V2: `<v>.checkpoint.<uniqueStr>.parquet` — a uuid-named file whose
  *    name is NOT derivable from the version (resolution must list),
  *    carrying a `checkpointMetadata` action and EITHER the file actions
  *    inline OR `sidecar` actions pointing at parquet files under
  *    `_delta_log/_sidecars/` that hold the add/remove set.
  *
  * Only the non-file actions (protocol/metaData/txn/checkpointMetadata)
  * may live in the V2 main file when sidecars are present, so consumers
  * that need the FILE actions must read through [[readActions]], which
  * unions the sidecar rows in (null-filling columns either side lacks).
  * Consumers that must see the main file's RAW column set (the writer's
  * representability gate) use [[resolvePaths]] + a plain parquet read. */
private[sources] object DeltaCheckpoints {

  /** The main checkpoint file(s) for version `v`: multipart names when
    * `parts` says so, else the classic single file, else the uuid-named V2
    * file found by listing. Fails loudly (with the version and directory)
    * when nothing matches — a dangling `_last_checkpoint` hint must name
    * its problem, not surface as a raw path-not-found from the scan. */
  def resolvePaths(fs: FileSystem, logDir: HPath, v: Long,
                   parts: Option[Int]): Seq[HPath] = parts match {
    case Some(n) =>
      (1 to n).map(i => new HPath(logDir, f"$v%020d.checkpoint.$i%010d.$n%010d.parquet"))
    case None =>
      val classic = new HPath(logDir, f"$v%020d.checkpoint.parquet")
      if (fs.exists(classic)) Seq(classic)
      else {
        // V2 uuid naming: exactly ONE extra segment (multipart's two
        // numeric segments cannot match). Several uuid-named checkpoints
        // for one version are each complete per spec — take the
        // lexicographically last for determinism.
        val rx = (f"$v%020d" + raw"\.checkpoint\.[^.]+\.parquet").r
        val candidates = fs.listStatus(logDir).map(_.getPath)
          .filter(p => rx.matches(p.getName)).sortBy(_.getName)
        require(candidates.nonEmpty,
          s"_last_checkpoint points at version $v but $logDir has no " +
            "checkpoint file for it (classic, multipart, or uuid-named v2)")
        Seq(candidates.last)
      }
  }

  /** One sidecar action's path resolved against the spec's
    * `_delta_log/_sidecars/` directory (absolute URIs pass through). */
  private def sidecarPath(logDir: HPath, raw: String): HPath = {
    val dec = java.net.URLDecoder.decode(raw, "UTF-8")
    if (dec.contains("://") || dec.startsWith("/")) new HPath(dec)
    else new HPath(new HPath(logDir, "_sidecars"), dec)
  }

  /** All actions of the checkpoint at `v`, with V2 sidecar file actions
    * unioned in. The sidecar path list is collect()ed — it is bounded by
    * sidecar COUNT (a handful of parquet files), never by add count; the
    * add set itself stays a distributed DataFrame end to end. */
  def readActions(spark: SparkSession, fs: FileSystem, logDir: HPath,
                  v: Long, parts: Option[Int]): DataFrame = {
    val main = spark.read.parquet(
      resolvePaths(fs, logDir, v, parts).map(_.toString): _*)
    if (!main.columns.contains("sidecar")) main
    else {
      val paths = main.select(col("sidecar.path"))
        .where(col("sidecar.path").isNotNull)
        .collect().map(r => sidecarPath(logDir, r.getString(0)))
      val noSidecarCol = main.drop("sidecar")
      if (paths.isEmpty) noSidecarCol
      else {
        paths.foreach(p => require(fs.exists(p),
          s"v2 checkpoint $v references missing sidecar $p"))
        val sides = spark.read.parquet(paths.map(_.toString): _*)
        // the main file's sidecar rows become all-null rows after the
        // drop — harmless, every consumer filters on action.isNotNull
        noSidecarCol.unionByName(sides, allowMissingColumns = true)
      }
    }
  }

  /** The sidecar files the checkpoint at `v` references (empty for
    * classic layouts and inline V2). [[DeltaWriter.cleanupLog]]'s keep-set
    * when sweeping `_delta_log/_sidecars/` — sidecars may be SHARED
    * across checkpoints per spec, so only the surviving checkpoint's
    * references decide liveness. */
  def referencedSidecars(spark: SparkSession, fs: FileSystem, logDir: HPath,
                         v: Long, parts: Option[Int]): Seq[HPath] = {
    val main = spark.read.parquet(
      resolvePaths(fs, logDir, v, parts).map(_.toString): _*)
    if (!main.columns.contains("sidecar")) Seq.empty
    else main.select(col("sidecar.path")).where(col("sidecar.path").isNotNull)
      .collect().map(r => sidecarPath(logDir, r.getString(0))).toSeq
  }

  /** Every file the checkpoint at `v` depends on that is MISSING — main
    * part(s) plus, for a readable V2 main file, its sidecars. Empty means
    * the checkpoint can actually replay; [[DeltaWriter.cleanupLog]] gates
    * on this before destroying the JSON commits (the only other replay
    * state). */
  def missingFiles(spark: SparkSession, fs: FileSystem, logDir: HPath,
                   v: Long, parts: Option[Int]): Seq[String] = parts match {
    case Some(n) =>
      resolvePaths(fs, logDir, v, Some(n))
        .filterNot(fs.exists).map(_.toString)
    case None =>
      scala.util.Try(resolvePaths(fs, logDir, v, None)) match {
        case scala.util.Failure(_) =>
          Seq(new HPath(logDir, f"$v%020d.checkpoint.parquet").toString)
        case scala.util.Success(mains) =>
          val missingMains = mains.filterNot(fs.exists).map(_.toString)
          if (missingMains.nonEmpty) missingMains
          else {
            val main = spark.read.parquet(mains.map(_.toString): _*)
            if (!main.columns.contains("sidecar")) Seq.empty
            else main.select(col("sidecar.path"))
              .where(col("sidecar.path").isNotNull)
              .collect().map(r => sidecarPath(logDir, r.getString(0)))
              .filterNot(fs.exists).map(_.toString).toSeq
          }
      }
  }
}
