package graft.queries

import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Two-pass threshold stratified sampling (round-3 verdict #1): identical
  * rows to the naive per-stratum window plan, exact per-stratum ceilings,
  * deterministic tie-breaks — and a plan shape where only the boundary
  * bucket slice ever reaches a rank window (no whole-stratum sort). */
class StratifiedSampleSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  private def hashedDocs = {
    val h = graft.functions.TextFunctions.fnvMix64(
      concat(lit("strat-42-"), col("doc_id").cast("string")))
    graft.Tables.t(spark, sfDir, "documents").withColumn("h", h)
  }

  /** The scale-unsafe round-3 formulation — the semantic reference. */
  private def naive(rate: Double) = {
    val byLang = Window.partitionBy(col("lang"))
    hashedDocs
      .withColumn("rn", row_number().over(byLang.orderBy(col("h"), col("doc_id"))))
      .withColumn("cap", ceil(count(lit(1)).over(byLang) * lit(rate)))
      .filter(col("rn") <= col("cap"))
      .select(col("doc_id"), col("lang"))
  }

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("threshold plan == naive window plan across rates") {
    for (rate <- Seq(0.05, 0.2, 0.5, 1.0)) {
      val got = ids(PipelineOps.stratifiedSample(hashedDocs, "lang", "doc_id", "h", rate))
      assert(got === ids(naive(rate)), s"rate=$rate")
    }
  }

  test("exact per-stratum ceiling") {
    val totals = hashedDocs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = PipelineOps.stratifiedSample(hashedDocs, "lang", "doc_id", "h", 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals.nonEmpty)
    totals.foreach { case (lang, n) =>
      assert(sampled.getOrElse(lang, 0L) === math.ceil(n * 0.2).toLong, s"lang=$lang")
    }
  }

  test("identical hashes at the cap boundary tie-break on id deterministically") {
    import spark.implicits._
    val d = (1L to 10L).map(i => (i, "x", 42L)).toDF("doc_id", "lang", "h")
    val got = PipelineOps.stratifiedSample(d, "lang", "doc_id", "h", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("negative-hash rows (signed bucket order) are sampled correctly") {
    import spark.implicits._
    // hashes straddling 0: the smallest (most negative) must win at rate 0.25
    val d = Seq((1L, "x", -9e18.toLong), (2L, "x", -5L), (3L, "x", 7L),
      (4L, "x", 9e18.toLong), (5L, "y", Long.MinValue), (6L, "y", Long.MaxValue))
      .toDF("doc_id", "lang", "h")
    val got = PipelineOps.stratifiedSample(d, "lang", "doc_id", "h", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 5L))
  }

  test("plan shape: the rank window sees only the boundary-bucket slice") {
    val df = PipelineOps.stratifiedSample(hashedDocs, "lang", "doc_id", "h", 0.2)
    val plan = df.queryExecution.optimizedPlan
    val wins = plan.collect { case w: logical.Window => w }
    assert(wins.nonEmpty)
    // every window sits above the boundary-bucket selection (the b* cut from
    // the broadcast threshold relation), never above the raw stratum
    wins.foreach(w => assert(w.child.toString.contains("graft_bstar"),
      "window input must be the boundary-bucket slice"))
    // and the sample mass flows through a window-free union branch
    val unions = plan.collect { case u: logical.Union => u }
    assert(unions.nonEmpty)
    assert(unions.head.children.exists(c =>
      c.collect { case w: logical.Window => w }.isEmpty),
      "the below-threshold mass must be a pure filter (no window)")
  }
}
