package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — Z (Morton) ordering, the
  * standard layout optimization for multi-column file skipping at scale
  * (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`; public
  * literature: Morton 1966, and the min/max-skipping analyses in the
  * Small Materialized Aggregates and Delta papers).
  *
  * A single-column sort gives perfect min/max pruning on that column and
  * none on any other; interleaving the bits of k columns gives every
  * written file a tight hyper-rectangle in all k dimensions, so range
  * predicates on ANY clustered column skip ~(1 - selectivity^(1/k)) of
  * files. At 100 TB this is the difference between scanning a full
  * partition and reading a handful of files for a two-column point query.
  *
  * Everything here is pure integer builtins (codegen'd, no UDFs), so the
  * z-values are engine-reproducible and the catalog query `q_zorder` is
  * DuckDB-oracle-checked bit-for-bit.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE integral
    * columns: bit b of `x` lands at position 2b, bit b of `y` at 2b+1.
    * bits <= 31 keeps the result in a positive long. Inputs must be
    * pre-quantized to non-negative ints (ranks, epoch days, bucketed
    * doubles) — standard practice, and what keeps the arithmetic exact. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31, got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc +
        shiftright(xl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(yl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }
  }

  /** Rewrite `df` into `nFiles` parquet files clustered by the z-value of
    * (`x`, `y`): range-partition on z (so files tile the z-curve — each
    * covers a contiguous z range == a tight rectangle in (x, y)), sort
    * within partitions, one file per partition. The shuffle is the
    * unavoidable one — a global re-clustering IS a repartition — and
    * range partitioning keeps it balanced via sampled bounds. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, bits: Int,
                    nFiles: Int, dir: String): Unit =
    df.withColumn("graft_z", zValue2(x, y, bits))
      .repartitionByRange(nFiles, col("graft_z"))
      .sortWithinPartitions(col("graft_z"))
      .drop("graft_z")
      .write.mode("overwrite").parquet(dir)

  /** Per-file (min, max) of a column over a written dataset — the stats a
    * min/max-skipping scan consults. One distributed pass, grouped by
    * file. */
  def fileRanges(df: DataFrame, c: String): Map[String, (Long, Long)] =
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("long").as("mn"), max(col(c)).cast("long").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Fraction of files a [lo, hi] range predicate on `c` must read given
    * the per-file ranges — the skipping effectiveness measure. */
  def scanFraction(ranges: Map[String, (Long, Long)], lo: Long, hi: Long): Double =
    if (ranges.isEmpty) 0.0
    else ranges.values.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / ranges.size
}
