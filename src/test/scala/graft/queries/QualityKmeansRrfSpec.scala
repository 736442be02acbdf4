package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.functions.TextFunctions.{fnv64, mix64}

/** Round-6 additions: k-means Lloyd update, hashed linear quality
  * classifier, and RRF fusion. The DuckDB oracle pins all three bit-exactly
  * at sf0.01; these specs pin the SEMANTICS against independent driver-side
  * brute-force replicas (assignment argmin + integer-grid sums for
  * k-means; feature extraction, slot hashing, and integer scoring for the
  * classifier; rank fusion arithmetic for RRF). */
class QualityKmeansRrfSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  test("emb_kmeans == brute-force assignment + integer-grid sums") {
    val rows = PipelineOps.embs(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val n = rows.length
    val k = math.max(16L, (n + 63L) / 64L).toInt
    val seeds = rows
      .map { case (id, _) => (mix64(fnv64(s"ivf-seed-$id")), id) }
      .sorted.take(k)
      .map { case (_, id) => rows.find(_._1 == id).get._2.map(_.toDouble) }
    def cellOf(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (c <- seeds.indices) {
        var s = 0.0; var d = 0
        while (d < v.length) { // same left-to-right fold as centroidSqDists
          val diff = v(d).toDouble - seeds(c)(d); s += diff * diff; d += 1
        }
        if (s < bestD) { bestD = s; best = c } // strict < : ties keep lowest
      }
      best
    }
    val expected = rows.groupBy { case (_, v) => cellOf(v) }.flatMap {
      case (cell, members) =>
        (0 until 64).map { d =>
          val s = members.map { case (_, v) =>
            math.floor(v(d).toDouble * 1e12 + 0.5).toLong
          }.sum
          ((cell.toLong, d.toLong), (members.length.toLong, s))
        }
    }
    val got = PipelineOps.dfQueries("emb_kmeans")(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(got.length == expected.size)
    got.foreach { case (key, (nGot, sGot)) =>
      val (nExp, sExp) = expected(key)
      assert(nGot == nExp, s"count mismatch at $key")
      assert(sGot == sExp, s"sum mismatch at $key: $sGot vs $sExp")
    }
  }

  test("doc_quality_classifier == brute-force feature hash + integer score") {
    val docsRaw = PipelineOps.docs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docsRaw.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+", -1)
      val bigrams = (0 until math.max(toks.length - 2, 0) + 1)
        .map(i => toks.slice(i, math.min(i + 2, toks.length)).mkString(" "))
      val feats = (toks.toSeq ++ bigrams).filter(_.nonEmpty)
      val ws = feats.map { f =>
        val slot = java.lang.Math.floorMod(mix64(fnv64(f)), 4096L)
        java.lang.Math.floorMod(mix64(fnv64(s"qw-$slot")), 2048L) - 1024L
      }
      (id, feats.length.toLong, ws.sum)
    }.sortBy(_._1)
    val got = PipelineOps.dfQueries("doc_quality_classifier")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((id, nf, sm, keep), (eid, enf, esm)) =>
      assert(id == eid)
      assert(nf == enf, s"n_feats mismatch for doc $id")
      assert(sm == esm, s"score mismatch for doc $id")
      assert(keep == (esm > 0))
    }
    // both classes must be present or the fixture isn't exercising the gate
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("doc_dsir == brute-force slot histograms + integer ratio weights") {
    val docsRaw = PipelineOps.docs(spark, sfDir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def slots(text: String): Seq[Long] = {
      val toks = text.trim.toLowerCase.split("\\s+", -1)
      val bigrams = (0 until math.max(toks.length - 2, 0) + 1)
        .map(i => toks.slice(i, math.min(i + 2, toks.length)).mkString(" "))
      (toks.toSeq ++ bigrams).filter(_.nonEmpty)
        .map(f => java.lang.Math.floorMod(mix64(fnv64(f)), 4096L))
    }
    val tgtHist = docsRaw.filter(_._3 == "src0").flatMap(d => slots(d._2))
      .groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    val srcFeats = docsRaw.filter(_._3 != "src0").map(d => (d._1, slots(d._2)))
    val srcHist = srcFeats.flatMap(_._2)
      .groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    def w(slot: Long): Long =
      ((tgtHist.getOrElse(slot, 0L) + 1L) * 1000L) / (srcHist(slot) + 1L)
    val expected = srcFeats.map { case (id, ss) =>
      (id, ss.length.toLong, ss.map(w).sum)
    }.sortBy(_._1)
    val got = PipelineOps.dfQueries("doc_dsir")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    // weights must actually vary (the histograms are doing something)
    assert(got.map(x => x._3.toDouble / math.max(x._2, 1)).distinct.length > 1)
  }

  test("doc_rrf == fusion of the two driver-recomputed BM25 rankings") {
    val docsRaw = PipelineOps.docs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val nd = docsRaw.length.toDouble
    val avgdl = docsRaw.map(_._2.length.toLong).sum.toDouble / nd
    def ranks(terms: Seq[String]): Map[Long, Long] = {
      val df = terms.map(t => t -> docsRaw.count(_._2.contains(t)).toDouble).toMap
      docsRaw.map { case (id, ts) =>
        val dl = ts.length.toDouble
        val score = terms.map { t =>
          val tf = ts.count(_ == t).toDouble
          val idf = (nd - df(t) + 0.5) / (df(t) + 0.5)
          idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)))
        }.sum
        (id, score)
      }.sortBy(p => (-p._2, p._1)).take(100)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    }
    val ra = ranks(Seq("vector", "hash", "stream", "filter"))
    val rb = ranks(Seq("join", "scan", "merge", "sort"))
    val expected = (ra.keySet ++ rb.keySet).toSeq.map { id =>
      val s = ra.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        rb.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, s)
    }.sortBy(p => (-p._2, p._1)).take(20)
    val got = PipelineOps.dfQueries("doc_rrf")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._3).toSeq == (1L to 20L).toSeq)
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq)
    // identical integer ranks => identical IEEE doubles, no tolerance needed
    got.map(_._2).zip(expected.map(_._2)).foreach { case (g, e) =>
      assert(g == e, s"rrf drift: $g vs $e")
    }
    // the fused list must actually mix both rankings
    assert(got.exists(r => ra.contains(r._1) && !rb.contains(r._1)) ||
      got.exists(r => rb.contains(r._1) && !ra.contains(r._1)) ||
      got.exists(r => ra.contains(r._1) && rb.contains(r._1)))
  }
}
