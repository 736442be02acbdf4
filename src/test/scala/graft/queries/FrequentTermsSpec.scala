package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Two-pass Misra-Gries frequent terms: the candidate-superset guarantee
  * must make the result EXACTLY the brute-force heavy-hitter set at any
  * partition layout — including adversarial ones where a globally-heavy
  * term is diluted below the sketch threshold inside every partition it
  * touches except one.
  */
class FrequentTermsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  /** Brute-force heavy hitters: exact counts, same integer threshold. */
  private def brute(d: org.apache.spark.sql.DataFrame, k: Int) = {
    val toks = d.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
    val total = toks.count()
    toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k + 1L) > lit(total))
      .withColumn("share", col("cnt").cast("double") / lit(total).cast("double"))
      .orderBy(col("cnt").desc, col("term"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("matches brute force on the real corpus at several k") {
    val d = graft.Tables.t(spark, sfDir, "documents")
    for (k <- Seq(1, 5, 15, 50)) {
      assert(rows(PipelineOps.frequentTerms(d, k)) == rows(brute(d, k)), s"k=$k")
    }
  }

  test("exact under an adversarial partition layout (heavy term diluted per partition)") {
    import spark.implicits._
    // 40 partitions; "hot" is 12% of tokens globally but each partition
    // sees it mixed with 30+ distinct fillers, so a k=8 sketch is under
    // constant decrement pressure — the union-of-survivors superset (not
    // any single partition's sketch) is what must carry it through.
    val docs = (0 until 400).map { i =>
      val fillers = (0 until 30).map(j => s"f${i % 37}_$j").mkString(" ")
      val hot = if (i % 5 == 0) " hot hot hot hot hot hot hot hot hot hot hot hot hot hot hot hot hot hot hot hot" else ""
      (i.toLong, fillers + hot)
    }.toDF("doc_id", "text").repartition(40, col("doc_id"))
    val k = 8
    val got = rows(PipelineOps.frequentTerms(docs, k))
    val want = rows(brute(docs, k))
    assert(got == want)
    assert(got.exists(_._1 == "hot"), "the diluted heavy term must be found")
    // and layout-invariance: one partition vs 40 gives the same answer
    assert(rows(PipelineOps.frequentTerms(docs.coalesce(1), k)) == want)
  }

  test("empty corpus and k=1 degenerate cases") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(PipelineOps.frequentTerms(empty, 5).collect().isEmpty)
    // k=1: only a strict-majority token qualifies
    val maj = Seq((1L, "a a a b"), (2L, "a a c d")).toDF("doc_id", "text")
    assert(rows(PipelineOps.frequentTerms(maj, 1)) == Seq(("a", 5L)))
    intercept[IllegalArgumentException] { PipelineOps.frequentTerms(maj, 0) }
  }
}
