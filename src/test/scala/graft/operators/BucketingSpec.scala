package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Bucketed layout ⇒ co-located join with zero exchanges. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  test("join of two bucketed tables plans with zero shuffle exchanges") {
    val base = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
    val stats = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    try {
      Bucketing.writeBucketed(docs, "b_docs", s"$base/b_docs", "doc_id", 8)
      Bucketing.writeBucketed(stats, "b_stats", s"$base/b_stats", "doc_id", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_docs", "b_stats", "doc_id")
      assert(joined.count() === 500)
      assert(Bucketing.shuffleCount(joined) === 0,
        "bucketed join must not shuffle either side")
      // contrast: the same sort-merge join on plain parquet must shuffle
      // (hint forces SMJ so the tiny test input doesn't broadcast instead)
      val plain = docs.hint("merge").join(stats, "doc_id")
      plain.count()
      assert(Bucketing.shuffleCount(plain) > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_stats")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val base = java.nio.file.Files.createTempDirectory("graft_buckets2").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    try {
      Bucketing.writeBucketed(docs, "b_docs_agg", s"$base/t", "doc_id", 8)
      val agg = spark.table("b_docs_agg").groupBy("doc_id").agg(count(lit(1)).as("n"))
      agg.count()
      assert(Bucketing.shuffleCount(agg) === 0,
        "group-by on the bucket key must be exchange-free")
    } finally spark.sql("DROP TABLE IF EXISTS b_docs_agg")
  }
}
