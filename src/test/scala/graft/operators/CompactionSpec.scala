package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class CompactionSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()

  test("compact collapses a sliver directory to the sized file count, rows intact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // 64 slivers of ~tens of rows each
    (1L to 2048L).map(i => (i, s"row-$i")).toDF("id", "payload")
      .repartition(64).write.parquet(in)
    val slivers = new java.io.File(in).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(slivers == 64)

    val stats = Compaction.compact(spark, in, out, targetBytes = stats0(in) / 4 + 1)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter <= 4 && stats.filesAfter >= 1)
    // content preserved exactly (order-insensitive)
    val a = spark.read.parquet(in).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val b = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("hive-partitioned input compacts (recursive listing), values survive flat") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_part").toString
    val in = s"$base/in"
    val out = s"$base/out"
    (1L to 512L).map(i => (i, i % 4)).toDF("id", "bucket")
      .repartition(8).write.partitionBy("bucket").parquet(in)
    val stats = Compaction.compact(spark, in, out, targetBytes = Long.MaxValue)
    assert(stats.filesBefore > 4 && stats.filesAfter == 1)
    val back = spark.read.parquet(out)
    assert(back.count() == 512)
    // partition-column values survive as ordinary columns
    val byBucket = back.groupBy("bucket").count().collect()
      .map(r => r.getAs[Number]("bucket").longValue() -> r.getLong(1)).toMap
    assert(byBucket == Map(0L -> 128L, 1L -> 128L, 2L -> 128L, 3L -> 128L))
  }

  test("non-hive nested dirs compact via recursive fallback, no rows vanish") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_nest").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // plain spark.read.parquet(in) would silently read only sub-a and
    // sub-b's files if they were top-level; nested non-hive dirs are
    // invisible to it — compact must still rewrite every row
    (1L to 100L).map(i => (i, "a")).toDF("id", "src").coalesce(1)
      .write.parquet(s"$in/sub-a")
    (101L to 200L).map(i => (i, "b")).toDF("id", "src").coalesce(1)
      .write.parquet(s"$in/sub-b")
    val stats = Compaction.compact(spark, in, out, targetBytes = Long.MaxValue)
    assert(stats.filesBefore == 2 && stats.filesAfter == 1)
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 20100L)
  }

  test("mixed hive/non-hive layout refuses loudly instead of dropping partition values") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_mixed").toString
    val in = s"$base/in"
    // date= lives only in the directory name; a stray non-hive file beside
    // it makes the plain read unplannable, and the recursive fallback
    // would silently erase the date column from every partitioned row
    (1L to 64L).map(i => (i, "2024-01-01")).toDF("id", "date")
      .write.partitionBy("date").parquet(in)
    (65L to 128L).map(i => (i, "stray")).toDF("id", "src").coalesce(1)
      .write.parquet(s"$in/stray")
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, s"$base/out", targetBytes = Long.MaxValue)
    }
    assert(e.getMessage.contains("hive-style partition dirs"))
  }

  test("empty / non-parquet input is a loud error") {
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark,
        java.nio.file.Files.createTempDirectory("empty").toString, "/tmp/na")
    }
    assert(e.getMessage.contains("no parquet files"))
  }

  private def stats0(dir: String): Long =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
}
