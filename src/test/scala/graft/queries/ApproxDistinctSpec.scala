package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Machine check for the one un-oracle-able catalog query: HLL sketches are
  * engine-specific, so the driver records `q_approx_distinct` as no_oracle —
  * this spec pins the approximation to its advertised accuracy instead
  * (approx_count_distinct's default rsd is 0.05; the sketch is deterministic
  * for fixed input, so the bound is stable, not flaky). Round-3 verdict #6. */
class ApproxDistinctSpec extends SparkSpec {

  test("q_approx_distinct stays within 5% relative error of the exact count") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf0001)
      .collect()
    assert(rows.length === 3) // one per l_returnflag
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      assert(exact > 0)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05,
        s"returnflag ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }
}
