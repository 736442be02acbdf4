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
    val in = new Path(inDir)
    val fs = in.getFileSystem(conf)
    val files = fs.listStatus(in).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.map(_.getLen).sum
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    val out = new Path(outDir)
    val after = out.getFileSystem(conf).listStatus(out)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    Stats(files.length, totalBytes, after)
  }
}
