package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the unglamorous operator every long-lived
  * 100 TB lake needs: streaming sinks, incremental loads, and per-task
  * writers leave directories of KB-size parquet files whose per-file
  * footer/open costs eventually dominate scans.
  *
  * `compact` measures the directory through the Hadoop FileSystem API,
  * sizes the rewrite at ceil(bytes / targetBytes) output files, and
  * rewrites via `repartition(n)` — a round-robin shuffle that balances
  * rows evenly regardless of input skew (`coalesce` would avoid the
  * shuffle but inherits whatever imbalance the small files had, recreating
  * the problem one level up). Row content is preserved exactly; row ORDER
  * is not (parquet directories carry no order contract).
  */
object Compaction {

  final case class Stats(filesBefore: Int, bytesBefore: Long, filesAfter: Int)

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20): Stats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    // recursive: streaming sinks and hive-partitioned layouts nest their
    // files (date=.../part-*.parquet); the read below handles those too.
    // NOTE a partitioned input is rewritten FLAT — partition-column values
    // survive as ordinary columns, the directory layout does not.
    def parquetFiles(dir: String): Seq[(String, Long, String)] = {
      val root = new Path(dir)
      val fs = root.getFileSystem(conf) // per-dir: in and out may be different filesystems
      val rootUri = fs.makeQualified(root).toUri
      def rel(p: Path): String =
        rootUri.relativize(fs.makeQualified(p).toUri).getPath
      // skip hidden segments (_temporary/, .staging/, _SUCCESS-adjacent
      // dirs): spark.read ignores them, so measuring them would size the
      // rewrite against bytes the rewrite never reads
      def hidden(p: Path): Boolean =
        rel(p).split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
      val it = fs.listFiles(root, true)
      val acc = Seq.newBuilder[(String, Long, String)]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet") && !hidden(s.getPath))
          acc += ((s.getPath.toString, s.getLen, rel(s.getPath)))
      }
      acc.result()
    }
    val files = parquetFiles(inDir)
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.map(_._2).sum
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    require(parts <= (1L << 20),
      s"compaction would produce $parts files; raise targetBytes")
    // spark.read.parquet only discovers files at the top level and under
    // hive-style key=value subdirs; files in other nested dirs are counted
    // by the measurement above but silently absent from the scan — rows
    // would vanish while Stats reports success. Cross-check the file set
    // Spark actually plans against the measured list; on mismatch fall
    // back to recursiveFileLookup — but only when no measured file sits
    // under a hive-style dir, since that fallback skips partition
    // inference and would drop directory-encoded column values.
    def normUri(s: String): (String, String, String) = {
      val u = new Path(s).toUri
      (Option(u.getScheme).getOrElse("file"),
        Option(u.getAuthority).getOrElse(""), u.getPath)
    }
    val measured = files.map(f => normUri(f._1)).toSet
    val plain = scala.util.Try(spark.read.parquet(inDir)).toOption
      .filter(_.inputFiles.iterator.map(normUri).toSet == measured)
    val df = plain.getOrElse {
      // recursiveFileLookup disables partition inference: if any measured
      // file sits under a key=value directory, its partition values live
      // only in the directory name and would silently vanish from every
      // output row (the plain read above fails LOUDLY on such mixed
      // layouts — "Conflicting directory structures" — so reaching here
      // with hive segments means data loss, not a plannable layout).
      val hiveDirs =
        files.flatMap(_._3.split('/').dropRight(1)).filter(_.contains('=')).distinct
      require(hiveDirs.isEmpty,
        s"compaction input $inDir mixes hive-style partition dirs " +
          s"(${hiveDirs.take(3).mkString(", ")}) with files spark.read.parquet " +
          "cannot plan alongside them; compact each partition separately")
      val rec = spark.read.option("recursiveFileLookup", "true").parquet(inDir)
      val recSet = rec.inputFiles.iterator.map(normUri).toSet
      require(recSet == measured,
        s"compaction scan plans ${recSet.size} files but ${measured.size} were " +
          s"measured under $inDir — mixed hive/non-hive nesting; clean the layout")
      rec
    }
    df.repartition(parts.toInt)
      .write.mode("overwrite").parquet(outDir)
    Stats(files.length, totalBytes, parquetFiles(outDir).length)
  }
}
