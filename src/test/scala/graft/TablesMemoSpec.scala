package graft

import org.scalatest.funsuite.AnyFunSuite

/** The plan memo is bounded: churning sessions cannot pin unbounded state in
  * a long-lived server (round-2 verdict finding). */
class TablesMemoSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  test("memo never exceeds its bound across churning sessions") {
    // 40 child sessions x 10 tables = 400 potential entries > 256 bound
    (0 until 40).foreach { _ =>
      val s = spark.newSession()
      Tables.all.foreach(n => Tables.t(s, sfDir, n))
      assert(Tables.memoSize <= Tables.maxMemoEntries)
    }
    assert(Tables.memoSize <= Tables.maxMemoEntries)
  }

  test("memoization still deduplicates within a session") {
    val s = spark.newSession()
    val a = Tables.t(s, sfDir, "region")
    val b = Tables.t(s, sfDir, "region")
    assert(a eq b)
  }
}
