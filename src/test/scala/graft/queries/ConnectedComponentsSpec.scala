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

  // ---- large-star/small-star variant ---------------------------------------

  private def ccStar(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    PipelineOps.connectedComponentsStar(
      edges.toDF("doc_a", "doc_b"), nodes.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction == min propagation on chain/triangle/singleton/reversed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (5L, 1L)) // incl. min on the b side, bridging 5 into comp 1
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 99L)
    assert(ccStar(edges, nodes) === cc(edges, nodes))
  }

  test("star contraction converges in O(log n) rounds on a long chain") {
    // a 64-node path: min propagation needs ~63 rounds (over its default
    // bound of 25); star contraction must finish well inside 30. The
    // local-edge bound is zeroed so this exercises the DISTRIBUTED loop
    // (the small-graph fast path would otherwise absorb it).
    spark.conf.set("spark.graft.ccLocalEdges", "0")
    try {
      val n = 64L
      val labels = ccStar((1L until n).map(i => (i, i + 1)), (1L to n).toSeq)
      assert(labels.values.toSet === Set(1L))
    } finally spark.conf.unset("spark.graft.ccLocalEdges")
  }

  test("small-graph local fast path == the distributed star loop") {
    // the same pseudo-random graph through both code paths: the driver
    // union-find (default bound) and the distributed large/small-star
    // loop (bound zeroed) must label identically
    val nodes = (0L until 60L).toSeq
    val edges = (0 until 90).map { i =>
      val a = (i * 7919L + 13L) % 60L
      val b = (i * 104729L + 31L) % 60L
      (a, b)
    }.filter { case (a, b) => a != b }
    val local = ccStar(edges, nodes)
    spark.conf.set("spark.graft.ccLocalEdges", "0")
    try assert(ccStar(edges, nodes) === local)
    finally spark.conf.unset("spark.graft.ccLocalEdges")
  }

  test("star contraction matches min propagation on a pseudo-random graph") {
    // deterministic pseudo-random multigraph with dup + reversed edges
    val nodes = (0L until 60L).toSeq
    val edges = (0 until 90).map { i =>
      val a = (i * 7919L + 13L) % 60L
      val b = (i * 104729L + 31L) % 60L
      (a, b)
    }.filter { case (a, b) => a != b }
    assert(ccStar(edges, nodes) === cc(edges, nodes))
  }

  test("star contraction on empty edges and self-loops") {
    assert(ccStar(Seq((4L, 4L)), Seq(3L, 4L)) === Map(3L -> 3L, 4L -> 4L))
  }
}
