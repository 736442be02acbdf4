package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

class TwoSumMergeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()

  test("recovers low-order bits a plain double sum drops") {
    import spark.implicits._
    // 1e16 first, then 4096 ones: each naive `+ 1.0` rounds away entirely
    // (ulp(1e16) = 2), so a plain running sum returns 1e16 — off by 4096.
    // Two-sum captures every dropped residue into the compensation.
    val rows = ((1e16, 0.0) +: Seq.fill(4096)((1.0, 0.0))).toDF("s", "c").coalesce(1)
    val naive = rows.agg(sum(col("s"))).head.getDouble(0)
    val comp = rows.agg(TwoSumMerge(col("s"), col("c"))).head.getDouble(0)
    assert(naive == 1e16) // demonstrates the failure mode being fixed
    assert(comp == 1.0000000000004096e16)
  }

  test("error independent of partition count on pre-compensated partials") {
    import spark.implicits._
    // partials of wildly different magnitudes spread over many partitions;
    // the exact total is 32 * (1e15 + 0.5) = 3.2e16 + 16
    val parts = Seq.fill(32)((1e15, 0.5)).toDF("s", "c").repartition(32)
    val got = parts.agg(TwoSumMerge(col("s"), col("c"))).head.getDouble(0)
    val expect = 32 * 1e15 + 16.0
    assert(math.abs(got - expect) <= 2 * math.ulp(expect), s"$got vs $expect")
  }

  test("empty and single-row groups") {
    import spark.implicits._
    val df = Seq((1, 2.5, -0.25)).toDF("g", "s", "c")
    val one = df.groupBy("g").agg(TwoSumMerge(col("s"), col("c"))).head.getDouble(1)
    assert(one == 2.25)
    val none = df.filter(col("g") === 99)
      .agg(TwoSumMerge(col("s"), col("c"))).head.getDouble(0)
    assert(none == 0.0)
  }
}
