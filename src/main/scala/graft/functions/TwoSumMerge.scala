package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}

/** Compensated cross-partition merge for pre-compensated double partials.
  *
  * Input rows are (sum, compensation) pairs whose true value is sum + comp
  * (e.g. one Kahan-accumulated partial per partition from a mapPartitions
  * kernel). A plain `sum(partial)` merge re-introduces one rounding per
  * partition — O(nPartitions) ulps at cluster scale. This aggregator
  * instead merges with Knuth two-sum: the roundoff of every `s1 + s2` is
  * captured EXACTLY into the carried compensation, so the only uncaptured
  * errors are second-order (roundings of the tiny compensation channel
  * itself), leaving the finished value within O(1) ulp of the true total
  * at any partition count. Not bit-deterministic across merge orders —
  * pair it with an exact-decimal path when reproducibility matters.
  */
object TwoSumMerge {

  final case class Acc(s: Double, c: Double)

  private val agg: Aggregator[(Double, Double), Acc, Double] =
    new Aggregator[(Double, Double), Acc, Double] {
      def zero: Acc = Acc(0.0, 0.0)
      private def twoSum(a: Acc, s2: Double, c2: Double): Acc = {
        val t = a.s + s2
        // Knuth two-sum residue: exact for any magnitudes, no branch on |a|>=|b|
        val ap = t - s2
        val bp = t - ap
        val e = (a.s - ap) + (s2 - bp)
        Acc(t, a.c + c2 + e)
      }
      def reduce(b: Acc, in: (Double, Double)): Acc = twoSum(b, in._1, in._2)
      def merge(b1: Acc, b2: Acc): Acc = twoSum(b1, b2.s, b2.c)
      def finish(r: Acc): Double = r.s + r.c
      def bufferEncoder: Encoder[Acc] = Encoders.product[Acc]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  private lazy val fn = F.udaf(agg)

  /** `twoSumMerge(sum, comp)` aggregate column: compensated total of the
    * (sum, comp) pairs in the group. */
  def apply(sum: Column, comp: Column): Column = fn(sum, comp)
}
