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
}
