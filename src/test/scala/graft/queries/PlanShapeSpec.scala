package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.{GraftSession, SparkEntry}

/** Plan-shape pins for the scale story: the asserts here are the claims
  * SCALE.md makes about what the physical plans look like — dims broadcast,
  * no accidental cartesian products, bounded exchange counts. A regression
  * that keeps answers right but turns a broadcast into a 2-sided shuffle
  * (or worse, a cartesian product) fails HERE, not in production at 100 TB. */
class PlanShapeSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // resolve AQE to final plan
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    strip(df.queryExecution.executedPlan)
  }

  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
    val self = if (f.isDefinedAt(p)) Seq(f(p)) else Seq.empty
    // AQE nests plan fragments behind non-children references; walk subqueries too
    val kids = p.children ++ p.subqueries.map {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case s => s
    } ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    })
    self ++ kids.flatMap(collectAll(_)(f))
  }

  private def q(name: String): SparkPlan =
    executed(SparkEntry.queries(name)(spark, sfDir))

  test("q5: every dimension joins as a broadcast hash join; no cartesian product") {
    val plan = q("q5_local_supplier_volume")
    val bhj = collectAll(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 3, s"expected region/nation/supplier broadcasts, got ${bhj.size}:\n$plan")
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q3: orders/customer joins broadcast the filtered dimension side") {
    val plan = q("q3_shipping_priority")
    assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"no broadcast join in q3 plan:\n$plan")
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("doc_top_terms: ONE exchange feeds both the aggregate and the rank window") {
    val plan = q("doc_top_terms")
    // the deliberate repartition(doc_id) + the final orderBy range exchange;
    // a regression that re-shuffles tf for the window or the df join shows
    // up as a third shuffle
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"expected <= 2 exchanges (repartition + final sort), got ${shuffles.size}:\n$plan")
  }

  test("ann_cosine_topk: the corpus side never shuffles (probes broadcast)") {
    val plan = q("ann_cosine_topk")
    // probes enter via broadcast; the only exchanges allowed are for the
    // final per-probe top-k window + output ordering, never a corpus join
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty ||
      collectAll(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"probe join is not broadcast:\n$plan")
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("doc_quality / doc_repetition: pure projections — zero exchanges before the sort") {
    for (name <- Seq("doc_quality", "doc_repetition")) {
      val shuffles = collectAll(q(name)) { case s: ShuffleExchangeExec => s }
      // only the final orderBy's range partitioning may shuffle
      assert(shuffles.size <= 1, s"$name should be projection+sort, got ${shuffles.size} exchanges")
    }
  }

  test("doc_pack: every unpartitioned window sees only superblock totals") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = q("doc_pack")
    val windows = collectAll(plan) { case w: WindowExec => w }
    assert(windows.nonEmpty, "doc_pack must use window cumsums")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    // three-level prefix sum: exactly ONE single-reducer window, and its
    // input is the superblock-totals aggregate — nBlocks/fan rows, i.e.
    // nDocs/65536 at fan=256 — never the per-block (nDocs/256) table the
    // two-level form funneled through one reducer
    assert(unpartitioned.size == 1,
      s"expected one superblock-offset window, got ${unpartitioned.size}")
    val nDocs = graft.Tables.t(spark, sfDir, "documents").count()
    val fan = 256L
    val maxSuperblocks = nDocs / (fan * fan) + 1
    val aggRows = unpartitioned.head.child.executeCollect().length
    assert(aggRows <= maxSuperblocks,
      s"single-reducer window sees $aggRows rows > $maxSuperblocks superblocks")
  }

  test("dedup_minhash_incr: candidate join is band-hash-equi, never a product") {
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val plan = q("dedup_minhash_incr")
    // the probe side must meet the persisted index on (band, band_hash)
    // equality — the bucket prune that keeps incremental dedup sub-
    // quadratic; any plan that streams the whole index per probe row
    // (nested loop / cartesian) is the 100 TB failure mode
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"candidate join degenerated to a nested loop:\n$plan")
    val equiKeys = collectAll(plan) {
      case j: BroadcastHashJoinExec => j.leftKeys.map(_.sql).mkString(",")
      case j: ShuffledHashJoinExec  => j.leftKeys.map(_.sql).mkString(",")
      case j: SortMergeJoinExec     => j.leftKeys.map(_.sql).mkString(",")
    }
    assert(equiKeys.exists(_.contains("band")),
      s"no band-keyed equi join in plan; keys were $equiKeys:\n$plan")
  }

  test("doc_bm25: corpus scalars ride a broadcast; no cartesian product") {
    val plan = q("doc_bm25")
    // the 1-row scalars crossJoin must plan as a broadcast nested loop,
    // never a CartesianProductExec (which would shuffle the corpus side)
    assert(collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
      s"bm25 scalars not broadcast:\n$plan")
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("doc_rrf: every rank window runs over a TakeOrdered-truncated list") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = q("doc_rrf")
    // three TakeOrdereds: one per ranking's top-100 + the fused top-20.
    // InferWindowGroupLimit does NOT fire on unpartitioned rank windows
    // (measured), so TakeOrdered-then-rank is the scale-safe shape — every
    // global window here must see a pre-truncated input, never the corpus
    assert(collectAll(plan) { case t: TakeOrderedAndProjectExec => t }.size >= 3,
      s"expected TakeOrdered truncation per ranking + fusion:\n$plan")
    collectAll(plan) { case w: WindowExec => w }.foreach { w =>
      val rows = w.child.executeCollect().length
      assert(rows <= 100, s"global rank window sees $rows rows (> top-100)")
    }
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("doc_dsir: the slot-weight table joins as a broadcast") {
    val plan = q("doc_dsir")
    assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"dsir weight join is not broadcast:\n$plan")
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("ann_ivf_stats: assignment is join-free; agg + bounded-window + sort only") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = q("ann_ivf_stats")
    // centroid argmin is a literal projection — a join means the plan
    // regressed to shuffling the corpus against a centroid table
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty &&
      collectAll(plan) { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"ann_ivf_stats should be join-free:\n$plan")
    // cell agg + the <=k-row single-partition window + final sort
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 3,
      s"expected <= 3 exchanges (agg, k-row window, sort), got ${shuffles.size}")
  }

  test("q_gap_fill: grid join is broadcast; counts aggregate before the join") {
    val plan = q("q_gap_fill")
    // the hours x types grid and the per-(hr,type) counts are both
    // aggregate-bounded; everything joins broadcast — a cartesian against
    // RAW events would be the 100 TB regression
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"gap fill must not build a cartesian product over events:\n$plan")
    assert(collectAll(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty ||
      collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
      s"expected broadcast joins for the grid:\n$plan")
  }

  test("q_event_funnel / q_retention: user-keyed aggregates, no raw-event join") {
    for (name <- Seq("q_event_funnel", "q_retention")) {
      val plan = q(name)
      assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"$name has a cartesian product:\n$plan")
      // all joins in these plans are over per-user / per-cohort aggregates;
      // raw events only ever feed hash aggregates
      val smj = collectAll(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smj.size <= 2, s"$name: unexpected join count ${smj.size}:\n$plan")
    }
  }

  test("emb_kmeans: assignment is join-free; only the stat agg + sort shuffle") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = q("emb_kmeans")
    // centroids are literals in the projection — any join means the plan
    // regressed to shuffling the corpus against a centroid table
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty &&
      collectAll(plan) { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"emb_kmeans should be join-free:\n$plan")
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"expected <= 2 exchanges ((cell,d) agg + final sort), got ${shuffles.size}")
  }
}
