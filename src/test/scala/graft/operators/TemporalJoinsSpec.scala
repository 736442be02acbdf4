package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  import spark.implicits._

  test("asofJoin picks the most recent right row at or before the left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 7L, "r7"))
      .toDF("k", "rt", "rv")
    val out = TemporalJoins.asofJoin(left, right, key = "k",
      leftTime = "t", rightTime = "rt", rightCols = Seq("rv"))
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[String]("rv"))).toMap
    assert(out("e1") === "r10") // exact tie: right row AT left time wins
    assert(out("e2") === "r20") // backward pick skips nothing newer
    assert(out("e3") === null) // rt=7 > t=5 and no earlier row -> null
  }

  test("asofJoin keeps every left row and all left columns") {
    val left = Seq((1L, 100L, 3.5), (9L, 1L, 9.9)).toDF("k", "t", "x")
    val right = Seq((1L, 50L, "a")).toDF("k", "rt", "rv")
    val out = TemporalJoins.asofJoin(left, right, "k", "t", "rt", Seq("rv"))
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("k", "t", "x", "rv"))
    // key 9 has no right rows at all
    assert(out.filter("k = 9").head().getAs[String]("rv") === null)
  }

  test("rangeJoin is boundary-inclusive and handles bin-spanning intervals") {
    val points = Seq((1L, 0L, "p0"), (1L, 10L, "p10"), (1L, 25L, "p25"),
      (1L, 26L, "pOut"), (2L, 10L, "pWrongKey"))
      .toDF("k", "pt", "ptag")
    // interval [0, 25] spans bins 0..2 at binWidth 10
    val intervals = Seq((1L, 0L, 25L, "i1")).toDF("k", "start", "end", "itag")
    val out = TemporalJoins.rangeJoin(points, intervals, "k", "pt", "start", "end",
      binWidth = 10L)
      .select("ptag").collect().map(_.getString(0)).sorted.toSeq
    assert(out === Seq("p0", "p10", "p25")) // inclusive ends, no dup, key-scoped
  }

  test("rangeJoin emits one row per matching (point, interval) pair") {
    val points = Seq((1L, 5L, 100L)).toDF("k", "pt", "pid")
    val intervals = Seq((1L, 0L, 9L, 1L), (1L, 3L, 7L, 2L), (1L, 6L, 9L, 3L))
      .toDF("k", "start", "end", "iid")
    val out = TemporalJoins.rangeJoin(points, intervals, "k", "pt", "start", "end", 4L)
    assert(out.select("iid").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
