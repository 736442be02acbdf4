package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.functions.TextFunctions._

/** The exact-Jaccard cost guard and the generalized SimHash chunk geometry
  * (VERDICT round-1 finding: 65k-bucket ceiling / unguarded all-pairs path). */
class JaccardGuardSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  private def docShingles = {
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), shingles(col("text"), 2).as("sh"))
  }

  test("postingStats counts candidate pairs exactly") {
    import spark.implicits._
    // shingle x in docs 1,2,3 (3 pairs); y in docs 1,2 (1 pair) => 4
    val inv = Seq((1L, "x"), (2L, "x"), (3L, "x"), (1L, "y"), (2L, "y"))
      .toDF("doc_id", "shingle")
    val s = PipelineOps.postingStats(inv)
    assert(s.nPostings === 5 && s.nShingles === 2 && s.nDocs === 3)
    assert(s.candidatePairs === 4.0)
  }

  test("guard refuses the dense corpus and points to MinHash-LSH") {
    val e = intercept[IllegalStateException] {
      PipelineOps.ngramJaccardJoin(docShingles, 0.25, maxCandidatePairs = Some(1000.0))
    }
    assert(e.getMessage.contains("dedup_minhash_lsh"))
    assert(e.getMessage.contains("candidate pairs"))
  }

  test("guard passes a sparse corpus and the join runs") {
    import spark.implicits._
    val sparse = Seq(
      (1L, Seq("a b", "b c", "c d")),
      (2L, Seq("a b", "b c", "x y")),
      (3L, Seq("p q", "q r", "r s"))).toDF("doc_id", "sh")
    val out = PipelineOps.ngramJaccardJoin(sparse, 0.4, maxCandidatePairs = Some(1000.0))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("opting out (None) runs the dense corpus without the pair-budget refusal") {
    val out = PipelineOps.ngramJaccardJoin(docShingles, 0.25, maxCandidatePairs = None)
    assert(out.limit(1).count() >= 0) // plan executes
  }

  test("guarded join and adaptive planner run at most one stats aggregate") {
    // round-3 verdict #3: plan selection must not re-count what postingStats
    // already measured (the measuring was most of dedup_adaptive's cost).
    // Optimization round 20 tightens the contract: stats are memoized per
    // (session, postings plan), so a re-selection over the SAME corpus runs
    // ZERO new aggregates — the bound is <= 1 per selection, and the second
    // selection here must be a memo hit (exactly 0).
    val before = PipelineOps.statsActions.get()
    PipelineOps.ngramJaccardJoin(docShingles, 0.25, maxCandidatePairs = Some(1e9))
    assert(PipelineOps.statsActions.get() - before <= 1)
    val before2 = PipelineOps.statsActions.get()
    val (plan, _) = PipelineOps.similarityJoinPlan(docShingles, threshold = 0.25)
    assert(plan === "exact") // dense corpus -> no prefix-stats second measure
    assert(PipelineOps.statsActions.get() - before2 === 0,
      "re-selecting over the same postings must serve the memoized stats")
  }

  test("5-chunk/2-combo simhash candidates reproduce the 4x16 pigeonhole result") {
    val d = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), simhash64(col("text")).as("sh"))
    val wide = PipelineOps.simhashNearDup(d, maxHamming = 3, chunks = 5, comboSize = 2)
    val classic = PipelineOps.simhashNearDup(d, maxHamming = 3, chunks = 4, comboSize = 1)
    val w = wide.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val c = classic.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(w === c)
  }

  test("simhash candidate completeness on an adversarial near pair") {
    import spark.implicits._
    // two signatures differing in exactly 3 bits spread across 3 chunks
    val a = 0x0123456789abcdefL
    val b = a ^ (1L << 2) ^ (1L << 20) ^ (1L << 50)
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "sh")
    val out = PipelineOps.simhashNearDup(d, maxHamming = 3, chunks = 5, comboSize = 2)
    assert(out.count() === 1)
    // and a 4-bit-apart pair is excluded by the exact filter
    val far = b ^ (1L << 63)
    val d2 = Seq((1L, a), (2L, far)).toDF("doc_id", "sh")
    assert(PipelineOps.simhashNearDup(d2, 3, 5, 2).count() === 0)
  }

  test("adaptive simhash: classic scheme below the occupancy bound, same pairs") {
    val d = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), simhash64(col("text")).as("sh"))
    val adaptive = PipelineOps.simhashNearDupAdaptive(d, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val classic = PipelineOps.simhashNearDup(d, 3, chunks = 4, comboSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(adaptive === classic)
    // forcing a tiny occupancy bound flips to the wide scheme — still the
    // same pair set (the exact filter makes geometry invisible)
    val wide = PipelineOps.simhashNearDupAdaptive(d, maxHamming = 3, targetOcc = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wide === classic)
  }

  test("invalid combo geometry is rejected") {
    import spark.implicits._
    val d = Seq((1L, 1L)).toDF("doc_id", "sh")
    intercept[IllegalArgumentException] {
      PipelineOps.simhashNearDup(d, maxHamming = 3, chunks = 4, comboSize = 2)
    }
  }
}
