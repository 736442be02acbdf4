package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Provenance + serve-path checks for the checked-in [[PcaRefBasis]]
  * artifact: it must BE the basis [[graft.tools.PcaTrain]] derives from the
  * sf0.001 reference corpus (exact equality — Jacobi is deterministic), be
  * orthonormal, and the emb_pca catalog query must equal a driver-side
  * reimplementation of the projection. */
class PcaArtifactSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private val sfDir = "/root/testdata/sf0.001"

  test("checked-in basis == re-derived basis from the reference corpus") {
    val gram = PipelineOps.gramMatrix(
      graft.Tables.t(spark, sfDir, "embeddings"), dim = 64)
    val derived = PipelineOps.pcaBasis(gram, dim = 64, k = PcaRefBasis.k)
    assert(derived.length == PcaRefBasis.basis.length)
    derived.zip(PcaRefBasis.basis).zipWithIndex.foreach { case ((d, r), i) =>
      assert(d.toSeq == r.toSeq, s"component $i drifted from its provenance")
    }
  }

  test("checked-in eigenvalues == re-derived; descending; whiten query applies them") {
    val gram = PipelineOps.gramMatrix(
      graft.Tables.t(spark, sfDir, "embeddings"), dim = 64)
    val (_, eig) = PipelineOps.pcaEigen(gram, dim = 64, k = PcaRefBasis.k)
    assert(eig == PcaRefBasis.eigenvalues, "eigenvalues drifted from provenance")
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b }, "not descending")
    assert(eig.forall(_ > 0), "gram eigenvalues must be positive")
    // whiten = pca scaled by 1/sqrt(eig), row for row
    val pca = PipelineOps.dfQueries("emb_pca")(spark, sfDir).collect()
    val wht = PipelineOps.dfQueries("emb_pca_whiten")(spark, sfDir).collect()
    pca.zip(wht).foreach { case (p, w) =>
      assert(p.getLong(0) == w.getLong(0))
      (0 until PcaRefBasis.k).foreach { i =>
        assert(w.getDouble(i + 1) ==
          p.getDouble(i + 1) / math.sqrt(PcaRefBasis.eigenvalues(i)))
      }
    }
  }

  test("basis is orthonormal") {
    for (a <- 0 until PcaRefBasis.k; b <- a until PcaRefBasis.k) {
      val dot = PcaRefBasis.basis(a).zip(PcaRefBasis.basis(b))
        .map { case (x, y) => x * y }.sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<v$a, v$b> = $dot")
    }
  }

  test("emb_pca catalog query == driver-side projection") {
    val rows = PipelineOps.dfQueries("emb_pca")(spark, sfDir).collect()
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.length == vecs.size && rows.nonEmpty)
    rows.foreach { r =>
      val v = vecs(r.getLong(0))
      PcaRefBasis.basis.zipWithIndex.foreach { case (w, c) =>
        var s = 0.0
        var i = 0
        while (i < 64) { s += v(i).toDouble * w(i); i += 1 }
        assert(r.getDouble(1 + c) == s,
          s"vec ${r.getLong(0)} component $c: ${r.getDouble(1 + c)} != $s")
      }
    }
  }
}
