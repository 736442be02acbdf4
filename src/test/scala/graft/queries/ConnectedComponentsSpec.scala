package graft.queries

import graft.SparkSpec

/** Connected components = the pairs->clusters step of dedup: every node must
  * end with the minimum doc_id reachable from it, singletons label
  * themselves, and the fixpoint loop must actually converge (not just hit
  * maxIter). */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    PipelineOps.connectedComponents(
      edges.toDF("doc_a", "doc_b"), nodes.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and singleton all label with the component minimum") {
    // 1-2-3-4 chain (diameter 3), 10-11-12 triangle, 99 singleton
    val labels = cc(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L)),
      Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("propagation crosses edge direction (min on the b side)") {
    // min id sits on the doc_b side: (5,1),(6,5) — 1 must reach 6
    val labels = cc(Seq((5L, 1L), (6L, 5L)), Seq(1L, 5L, 6L))
    assert(labels === Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("long path converges within the iteration bound") {
    // a 12-node path needs ~11 propagation rounds < default maxIter
    val n = 12L
    val labels = cc((1L until n).map(i => (i, i + 1)), (1L to n).toSeq)
    assert(labels.values.toSet === Set(1L))
  }

  test("empty edge set labels every node with itself") {
    val labels = cc(Seq.empty, Seq(3L, 7L))
    assert(labels === Map(3L -> 3L, 7L -> 7L))
  }
}
