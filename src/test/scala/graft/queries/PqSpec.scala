package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Product quantization: encode structure, bit-exact agreement with a
  * driver-side replica, ADC search semantics, and the shuffle-free plan
  * shape that makes encode viable as a 100 TB batch job. */
class PqSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"
  private val m = 8
  private val nCodes = 16

  private def embs = graft.Tables.t(spark, sfDir, "embeddings")
  private lazy val donors = PipelineOps.pqSeedCodebook(embs, nCodes).toIndexedSeq

  private lazy val encoded = PipelineOps.pqEncode(embs, donors, m)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))

  private lazy val raw: Map[Long, Array[Float]] = embs
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Bit-exact replica of the encode kernel: same slice bounds, same
    * float→double conversion per element, same i-ascending fold
    * ([[graft.functions.VectorFunctions.sqDistsOf]]), same min-code ties. */
  private def replicaCode(v: Array[Float], s: Int): (Int, Double) = {
    val sub = donors.head.length / m
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < nCodes) {
      var d = 0.0
      var i = 0
      while (i < sub) {
        val t = v(s * sub + i).toDouble - donors(c)(s * sub + i)
        d += t * t
        i += 1
      }
      if (d < bd) { bd = d; best = c } // strict < keeps the lowest tied code
      c += 1
    }
    (best, bd)
  }

  test("every vector gets m codes, each in [0, nCodes)") {
    assert(encoded.length == raw.size * m)
    assert(encoded.map(t => (t._1, t._2)).distinct.length == encoded.length)
    encoded.foreach { case (_, s, c, d) =>
      assert(s >= 0 && s < m && c >= 0 && c < nCodes && d >= 0.0)
    }
  }

  test("codes and quantization errors match the driver replica bit-exactly") {
    encoded.foreach { case (id, s, code, sqdist) =>
      val (ec, ed) = replicaCode(raw(id), s.toInt)
      assert(code == ec, s"vec $id subspace $s")
      assert(sqdist == ed, s"vec $id subspace $s: $sqdist vs $ed")
    }
  }

  test("ADC: five probes, dense ranks, distances non-decreasing per probe") {
    val adc = PipelineOps.pqAdcSearch(embs, donors, m, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(adc.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    adc.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
      assert(!rows.exists(_._2 == q), "self must be excluded")
    }
    // ADC distance replica: m table lookups = m per-subspace slice dists
    val byVec = encoded.groupBy(_._1)
    adc.foreach { case (q, v, d, _) =>
      val qv = raw(q)
      val codes = byVec(v).sortBy(_._2).map(_._3)
      var expect = 0.0
      codes.zipWithIndex.foreach { case (c, s) =>
        val sub = donors.head.length / m
        var t = 0.0
        var i = 0
        while (i < sub) {
          val x = qv(s * sub + i).toDouble - donors(c)(s * sub + i)
          t += x * x
          i += 1
        }
        expect += t
      }
      assert(d == expect, s"probe $q vec $v: $d vs $expect")
    }
  }

  test("ADC recall against exact L2 top-10 is non-degenerate") {
    val adc = PipelineOps.pqAdcSearch(embs, donors, m, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = (0L until 5L).flatMap { q =>
      val qv = raw(q).map(_.toDouble)
      raw.toSeq.filter(_._1 != q).map { case (id, v) =>
        var d = 0.0
        var i = 0
        while (i < v.length) { val t = v(i) - qv(i); d += t * t; i += 1 }
        (id, d)
      }.sortBy(t => (t._2, t._1)).take(10).map(t => (q, t._1))
    }.toSet
    val recall = (adc & exact).size.toDouble / exact.size
    assert(recall >= 0.1, s"recall $recall degenerate (random ~0.02)")
  }

  test("encode plan is a shuffle-free whole-stage-codegen projection") {
    val plan = PipelineOps.pqEncode(embs, donors, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    // the "*(N)" stage marker is how executedPlan.toString spells codegen
    assert(plan.contains("*(1)"), s"encode must codegen:\n$plan")
  }

  test("ADC plan broadcasts probes and shuffles only for the final top-k") {
    val plan = PipelineOps.pqAdcSearch(embs, donors, m, topK = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"probe side must broadcast:\n$plan")
    // the documented contract: ONE data exchange (the window top-k) — the
    // presentation orderBy may add a range exchange after it, nothing else
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"corpus side must not shuffle before top-k:\n$plan")
  }

  test("search from a persisted codes index equals the inline form") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString + "/codes"
    PipelineOps.pqCodes(embs, donors, m).write.parquet(dir)
    val served = PipelineOps.pqAdcSearchCodes(
        spark.read.parquet(dir),
        PipelineOps.pqProbeTables(embs.filter(col("vec_id") < 5), donors, m),
        nCodes, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val inline = PipelineOps.pqAdcSearch(embs, donors, m, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(served.sortBy(t => (t._1, t._4)).toSeq ==
      inline.sortBy(t => (t._1, t._4)).toSeq)
    // the serving scan must read codes only — no embedding column anywhere
    val plan = PipelineOps.pqAdcSearchCodes(spark.read.parquet(dir),
        PipelineOps.pqProbeTables(embs.filter(col("vec_id") < 5), donors, m),
        nCodes, topK = 10)
      .queryExecution.executedPlan.toString
    val corpusScan = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains(dir.split('/').last))
      .mkString
    assert(corpusScan.contains("codes") && !corpusScan.contains("embedding"),
      s"corpus scan must be codes-only:\n$plan")
  }

  test("IVF-PQ: candidates come only from probed cells; ADC values match the full scan") {
    val ipq = PipelineOps.annIvfPq(embs, kCells = 16, nprobe = 4, m, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(ipq.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    ipq.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
      assert(!rows.exists(_._2 == q))
    }
    // cell pruning: every returned candidate sits in one of its probe's
    // nprobe nearest cells
    val cents = PipelineOps.ivfSeedCentroids(embs, 16).toIndexedSeq
    val assigned = PipelineOps.ivfAssign(embs, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probeCells: Map[Long, Set[Int]] = (0L until 5L).map { q =>
      val qv = raw(q)
      val byDist = cents.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var k = 0
        while (k < c.length) { val t = qv(k).toDouble - c(k); d += t * t; k += 1 }
        (d, i)
      }.sortBy(identity).take(4).map(_._2).toSet
      q -> byDist
    }.toMap
    ipq.foreach { case (q, v, _, _) =>
      assert(probeCells(q).contains(assigned(v)), s"probe $q vec $v outside probed cells")
    }
    // same donors + tables as the unpruned scan → identical adc per pair
    val full = PipelineOps.pqAdcSearch(embs, donors, m, topK = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ipq.foreach { case (q, v, adc, _) => assert(full((q, v)) == adc) }
  }

  test("IVF-PQ plan: both joins broadcast — the corpus never shuffles for a join") {
    val plan = PipelineOps.annIvfPq(embs, kCells = 16, nprobe = 4, m, topK = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"cell and table joins must broadcast:\n$plan")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj == 2, s"expected cell + table broadcast joins, got $bhj:\n$plan")
  }

  test("a non-divisible subspace count fails fast instead of dropping dims") {
    intercept[IllegalArgumentException] {
      PipelineOps.pqAdcSearch(embs, donors, m = 7, topK = 10)
    }
    intercept[IllegalArgumentException] {
      PipelineOps.pqEncode(embs, donors, m = 7)
    }
  }
}
