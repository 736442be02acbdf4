package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.functions.TextFunctions.{fnv64, mix64}

/** doc_span_dedup: the DuckDB oracle pins it bit-exactly at sf0.01; these
  * tests pin the SEMANTICS — a driver-side brute-force replica of the
  * Lee-et-al span-removal rule on real data, and a constructed corpus
  * where the removed spans are known by hand. */
class SpanDedupSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"
  private val K = 8

  private def replica(docsRaw: Array[(Long, String)]): Array[(Long, Long, Long, String)] = {
    val toks = docsRaw.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+", -1).filter(_.nonEmpty)
    }
    // windows over the SAME token stream ngramsAll sees (short docs emit
    // one whole-doc window)
    val occs = toks.flatMap { case (id, ts) =>
      (0 until math.max(ts.length - K, 0) + 1).map { i =>
        val w = ts.slice(i, math.min(i + K, ts.length)).mkString(" ")
        (mix64(fnv64(w)), id, i.toLong)
      }
    }.filter(_._1 != mix64(fnv64(""))) // empty docs emit no real window
    val byHash = occs.groupBy(_._1)
    val covered = scala.collection.mutable.Set[(Long, Long)]()
    byHash.values.foreach { os =>
      if (os.length >= 2) {
        val first = os.map { case (_, id, i) => id * 1048576L + i }.min
        os.foreach { case (_, id, i) =>
          if (id * 1048576L + i > first) {
            val n = toks.find(_._1 == id).get._2.length.toLong
            (i to math.min(i + K - 1, n - 1)).foreach(p => covered += ((id, p)))
          }
        }
      }
    }
    toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.filterNot { case (_, p) => covered((id, p.toLong)) }
      (id, ts.length.toLong, kept.length.toLong, kept.map(_._1).mkString(" "))
    }.sortBy(_._1)
  }

  test("doc_span_dedup == brute-force span removal at sf0.001") {
    val docsRaw = PipelineOps.docs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = replica(docsRaw)
    val got = PipelineOps.dfQueries("doc_span_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g == e, s"mismatch for doc ${e._1}")
    }
  }

  test("constructed corpus: second occurrence's span removed, first kept") {
    import spark.implicits._
    val shared = (1 to K).map(i => s"dup$i").mkString(" ")
    val df = Seq(
      (0L, s"alpha beta $shared gamma"),          // first occurrence: kept whole
      (1L, s"delta $shared epsilon zeta"),        // span removed
      (2L, "unique words only here nothing repeats at all")
    ).toDF("doc_id", "text")
    val out = PipelineOps.spanDedup(df, K).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    assert(out(0L) == s"alpha beta $shared gamma")
    assert(out(1L) == "delta epsilon zeta")
    assert(out(2L) == "unique words only here nothing repeats at all")
  }
}
