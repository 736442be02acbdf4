package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Shared kit for the distributed-maintenance paths — ONE home for the
  * ship-the-Hadoop-conf pattern and the bounded-concurrency window that
  * [[ColumnIndex]], [[DeltaWriter]] and [[IcebergWriter]] each carried a
  * private copy of (review finding: a fix to one copy silently missed the
  * others). */
private[graft] object DistKit {

  /** Hadoop Configuration is not serializable: ship its entries and
    * rebuild per task (object-store creds/endpoints must reach tasks). */
  def confEntries(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator(); val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  def rebuildConf(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** The two-phase file-reclaim scaffold shared by [[DeltaWriter.vacuum]]
    * and [[IcebergWriter.removeOrphanFiles]] (review finding: two
    * near-verbatim copies had already started diverging).
    *
    * Phase 1 (driver) walks DIRECTORIES only — bounded by partition-dir
    * count, not file count. Scratch dirs (`isScratchDir` on the bare
    * name) reclaim wholesale once BOTH the dir mtime and the newest
    * mtime INSIDE are past the cutoff (object stores report meaningless
    * mtimes for synthetic dir entries, so the internal max is the real
    * gate — review finding: dir-mtime-only would delete a LIVE writer's
    * scratch on s3a). `skipName` names are never entered or listed,
    * EXCEPT "name=value" partition dirs/files, which always walk (a
    * column named `_year` or `.tag` still partitions; review finding).
    *
    * Phase 2 (executors) lists each dir's files as a (path, mtime)
    * DataFrame of QUALIFIED paths, the caller's `doom` turns candidates
    * into doomed paths (joins against its live/tombstone sets), deletes
    * run executor-side, and OLD empty dirs sweep last (a dir mtime of 0
    * reads as unknown, never ancient). Returns the deleted file count.
    *
    * Filters: `skipName` governs FILE names only and must be a
    * capture-free function — it ships to executors; `skipDirName`
    * governs which directories are entered AND swept, driver-side only.
    * Both see bare names, and "name=value" partition names always pass
    * regardless of prefix. */
  def reclaim(spark: SparkSession, dir: String, cutoff: Long,
              isScratchDir: String => Boolean,
              skipName: String => Boolean,
              skipDirName: String => Boolean,
              doom: DataFrame => Dataset[String]): Long = {
    import spark.implicits._
    val root = new HPath(dir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    var deleted = 0L
    // (file count, newest mtime) below p — one walk serves both the
    // reclaim count and the liveness gate
    def walkStats(p: HPath): (Long, Long) =
      fs.listStatus(p).foldLeft((0L, 0L)) { case ((c, m), st) =>
        if (st.isDirectory) {
          val (c2, m2) = walkStats(st.getPath)
          (c + c2, math.max(math.max(m, m2), st.getModificationTime))
        } else (c + 1, math.max(m, st.getModificationTime))
      }
    val dirsB = Seq.newBuilder[String]
    def walkDirs(p: HPath): Unit = {
      dirsB += p.toString
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (!st.isDirectory) ()
        else if (isScratchDir(n)) {
          // dir-mtime gate FIRST: a fresh scratch skips the recursive
          // walk entirely (an in-flight writer streaming thousands of
          // files must not pay a full listing per reclaim run; review
          // finding) — the internal-newest gate then confirms
          if (st.getModificationTime < cutoff) {
            val (inside, newest) = walkStats(st.getPath)
            if (newest < cutoff && fs.delete(st.getPath, true))
              deleted += inside
          }
        } else if (skipDirName(n) && !n.contains("=")) ()
        else walkDirs(st.getPath)
      }
    }
    walkDirs(root)
    val dirs = dirsB.result()

    val ship = confEntries(hconf)
    val dirStr = dir
    val candidates = spark.sparkContext
      .parallelize(dirs, math.max(1,
        math.min(dirs.size, spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val fsx = new HPath(dirStr).getFileSystem(rebuildConf(ship))
        it.flatMap { d =>
          fsx.listStatus(new HPath(d)).iterator
            .filter(st => !st.isDirectory)
            .filter { st =>
              val n = st.getPath.getName
              !(skipName(n) && !n.contains("="))
            }
            .map(st => (fsx.makeQualified(st.getPath).toString,
              st.getModificationTime))
        }
      }.toDF("path", "mtime")
    deleted += doom(candidates).mapPartitions { it =>
      val fsx = new HPath(dirStr).getFileSystem(rebuildConf(ship))
      var n = 0L
      it.foreach(p => if (fsx.delete(new HPath(p), false)) n += 1)
      Iterator.single(n)
    }.collect().sum

    // drop now-empty partition dirs — but only provably OLD ones: a
    // concurrent writer mkdirs its target dir moments before renaming
    // into it, and a store that reports NO dir mtime (0 = synthetic
    // entry) gives no age evidence at all, so keep (review finding —
    // mtime 0 must read as unknown, not ancient)
    def sweepEmpty(p: HPath): Unit = fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && !isScratchDir(n) &&
          !(skipDirName(n) && !n.contains("="))) {
        sweepEmpty(st.getPath)
        if (st.getModificationTime > 0 && st.getModificationTime < cutoff &&
            fs.listStatus(st.getPath).isEmpty) fs.delete(st.getPath, false)
      }
    }
    sweepEmpty(root)
    deleted
  }

  /** BALANCED union: pairwise grouping keeps Catalyst plan depth O(log n).
    * A left-deep `reduce(_ unionByName _)` over hundreds of frames makes
    * analysis quadratic-ish in plan depth — the blow-up [[DeltaWriter]]'s
    * compaction hit first; the incremental readers fold per-commit frames
    * through the same tree so a thousand-commit change range plans flat
    * (review finding: three call sites, two of which were linear). */
  @annotation.tailrec
  def unionTree(dfs: Seq[DataFrame]): DataFrame = {
    // grouped(2) of an empty Seq is empty -> infinite recursion (advisor
    // finding on the original nested copy)
    require(dfs.nonEmpty, "unionTree needs at least one input")
    if (dfs.size == 1) dfs.head
    else unionTree(dfs.grouped(2).map(_.reduce(_ unionByName _)).toSeq)
  }

  /** Run `f` over `items` through a bounded thread pool — independent
    * Spark jobs overlap instead of serializing. The first failure stops
    * the QUEUED items (no point paying for work whose commit will never
    * happen) and rethrows. */
  def runBounded[A, B](items: Seq[A], width: Int = 4)(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    if (items.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(width, math.max(1, items.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    catch {
      case e: Throwable =>
        pool.shutdownNow()
        throw e
    } finally pool.shutdown()
  }
}
