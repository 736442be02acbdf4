package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** The codegen'd vector expressions must be BIT-IDENTICAL to the
  * higher-order-function folds they replaced — that equality is what keeps
  * the DuckDB oracles valid. */
class VectorFunctionsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private lazy val emb = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")

  private def hofDot = aggregate(
    zip_with(col("embedding"), col("e2"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, x) => acc + x)
  private def hofNorm = sqrt(aggregate(
    transform(col("embedding"), x => x.cast("double") * x.cast("double")),
    lit(0.0), (acc, x) => acc + x))

  test("dotF and l2normF match the HOF folds bit-for-bit on real embeddings") {
    val paired = emb.limit(50).select(col("vec_id"), col("embedding"))
      .withColumn("e2", reverse(col("embedding")))
    val diff = paired.select(
        VectorFunctions.dotF(col("embedding"), col("e2")).as("a"), hofDot.as("b"),
        VectorFunctions.l2normF(col("embedding")).as("c"), hofNorm.as("d"))
      .collect()
    diff.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("centroidSqDists matches the zip_with fold bit-for-bit") {
    val cents = Seq(Array.tabulate(64)(i => i * 0.25 - 8.0),
      Array.tabulate(64)(i => math.sin(i.toDouble)))
    val centLits = cents.map(c => array(c.toIndexedSeq.map(lit): _*))
    def sqdistHof(cl: org.apache.spark.sql.Column) = aggregate(
      zip_with(col("embedding"), cl, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val rows = emb.limit(50).select(
        VectorFunctions.centroidSqDists(col("embedding"), cents).as("fast"),
        array(centLits.map(sqdistHof): _*).as("slow"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Double](0)
      val b = r.getSeq[Double](1)
      assert(a.map(java.lang.Double.doubleToLongBits) ===
        b.map(java.lang.Double.doubleToLongBits))
    }
  }

  test("signLshBucket matches PipelineOps buckets used by the oracles") {
    // the oracle CTE reproduces lshBucket(4)/lshBucket(8); determinism check
    val b1 = emb.limit(20).select(
      graft.queries.PipelineOps.lshBucket(col("embedding"), 8, 64).as("b")).collect()
    val b2 = emb.limit(20).select(
      graft.queries.PipelineOps.lshBucket(col("embedding"), 8, 64).as("b")).collect()
    assert(b1.map(_.getLong(0)).toSeq === b2.map(_.getLong(0)).toSeq)
    assert(b1.map(_.getLong(0)).forall(b => b >= 0 && b < 256))
  }

  test("adaptiveLshBits: integer width derivation, engine-agnostic boundaries") {
    import graft.queries.PipelineOps.adaptiveLshBits
    // the fixture-scale widths the round-5 queries hardcoded
    assert(adaptiveLshBits(500, targetOcc = 2) == 8)
    assert(adaptiveLshBits(500, targetOcc = 32) == 4)
    // exact powers of two land deterministically (the float-log2 trap)
    assert(adaptiveLshBits(512, targetOcc = 2) == 8)
    assert(adaptiveLshBits(513, targetOcc = 2) == 9)
    // scales with the corpus; capped at 30 planes
    assert(adaptiveLshBits(1L << 40, targetOcc = 2) == 30)
    assert(adaptiveLshBits(1, targetOcc = 2) == 1)
  }

  test("adaptive width bounds bucket occupancy across corpus sizes") {
    import spark.implicits._
    import graft.queries.PipelineOps.{adaptiveLshBits, lshBucket}
    // synthetic deterministic corpora at two sizes: occupancy must stay a
    // CONSTANT as n grows 16x (the round-5 fixed width grew 16x denser)
    val stats = for (n <- Seq(2000, 32000)) yield {
      val dim = 16
      val vecs = (0 until n).map { id =>
        (id.toLong, Array.tabulate(dim) { i =>
          val h = graft.functions.TextFunctions.mix64(
            graft.functions.TextFunctions.fnv64(s"occ-$id-$i"))
          (h.toFloat / Long.MaxValue.toFloat)
        }.toSeq)
      }.toDF("vec_id", "embedding")
      val bits = adaptiveLshBits(n.toLong, targetOcc = 2)
      val occ = vecs.select(lshBucket(col("embedding"), bits, dim).as("b"))
        .groupBy("b").count()
      val mean = occ.agg(avg("count")).head.getDouble(0)
      val max = occ.agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
      // mean over OCCUPIED buckets: target·λ/(1-e^-λ) plus LSH clumping —
      // a small constant, nowhere near the n/2^fixedBits a pinned width gives
      assert(mean <= 6.0, s"n=$n bits=$bits mean occupancy $mean")
      assert(max <= 64, s"n=$n bits=$bits max occupancy $max")
      (n, mean)
    }
    // the scale claim itself: 16x the corpus, occupancy within 2x
    val Seq((_, mSmall), (_, mBig)) = stats
    assert(mBig <= mSmall * 2.0,
      s"occupancy grew with the corpus: $mSmall -> $mBig")
  }
}
