package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Z-order clustering: key construction pinned by hand vectors, row
  * preservation over messy data, and the actual point — a conjunctive
  * 2-D predicate prunes most files through the zone maps after a
  * clustering compaction, on BOTH table formats. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("interleave: hand vectors") {
    // col0=0b11 col1=0b01, 2 bits: pos0=c0.b0=1, pos1=c1.b0=1, pos2=c0.b1=1
    assert(ZOrderKit.interleave(Array(3, 1), 2) == 7L)
    assert(ZOrderKit.interleave(Array(0, 0), 16) == 0L)
    // one column degenerates to the identity (bits shifted into place)
    assert(ZOrderKit.interleave(Array(0xABCD), 16) == 0xABCDL)
    // locality: near points get near keys, far points get far keys
    val near = ZOrderKit.interleave(Array(1, 1), 8)
    val far = ZOrderKit.interleave(Array(200, 200), 8)
    assert(near < far)
  }

  test("boundariesOf: equi-depth, deduplicated, bounded") {
    val b = ZOrderKit.boundariesOf[java.lang.Double](
      (1 to 1000).map(i => Double.box(i.toDouble)).toArray, 16)
    assert(b.length == 15)
    assert(b.toSeq == b.toSeq.sorted)
    // skew: one value repeated — no duplicate boundaries minted
    val skew = ZOrderKit.boundariesOf[java.lang.Double](
      Array.fill(100)(Double.box(5.0)), 16)
    assert(skew.length == 1)
    assert(ZOrderKit.boundariesOf[java.lang.Double](Array.empty, 16).isEmpty)
  }

  test("cluster preserves the row multiset over mixed types with nulls") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "alpha", java.sql.Date.valueOf("2020-01-01")),
        org.apache.spark.sql.Row(2L, null, java.sql.Date.valueOf("2021-06-15")),
        org.apache.spark.sql.Row(null, "beta", null),
        org.apache.spark.sql.Row(4L, "gamma", java.sql.Date.valueOf("2019-12-31")),
        org.apache.spark.sql.Row(4L, "gamma", java.sql.Date.valueOf("2019-12-31"))), 3),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.DateType))))
    val out = ZOrderKit.cluster(df, Seq("n", "s", "d"), 2)
    assert(out.columns.toSeq == Seq("n", "s", "d"))
    assert(out.collect().map(_.toString).sorted.toSeq ==
      df.collect().map(_.toString).sorted.toSeq)
  }

  test("delta: zorder compaction makes 2-D zone pruning effective") {
    val dir = newDir("graft_zorder_d")
    // 4 commits of random-ish (x, y) — every file spans the full range, so
    // the index can prune NOTHING before clustering
    val pts = for (i <- 0 until 8000) yield (i.toLong, (i * 37 % 100).toLong, (i * 53 % 100).toLong)
    pts.grouped(2000).foreach { g =>
      DeltaWriter.write(g.toDF("id", "x", "y").repartition(2), dir)
    }
    val idx0 = ColumnIndex.buildFromDelta(spark, dir, Seq("x", "y"))
    val preds = Seq[ColumnIndex.Pred](
      ("x", "lte", "12"), ("y", "lte", "12"))
    val before = idx0.prune(preds).get
    assert(before.size == idx0.fileCount, "random layout must not prune")

    val v = DeltaWriter.compact(spark, dir, targetFileBytes = 8L << 10,
      zorderBy = Seq("x", "y"))
    assert(v > 0)
    val commit = Files.readString(java.nio.file.Path.of(
      dir + f"/_delta_log/$v%020d.json"))
    assert(commit.contains("zOrderBy"))
    val idx = ColumnIndex.buildFromDelta(spark, dir, Seq("x", "y"))
    assert(idx.fileCount >= 4, s"want several output files, got ${idx.fileCount}")
    val after = idx.prune(preds).get
    assert(after.size * 2 <= idx.fileCount,
      s"z-order should prune >= half: kept ${after.size} of ${idx.fileCount}")
    // an unpartitioned DV-free delta table is raw-scan safe, so prunedDf
    // must actually SERVE the pruned scan (review finding: the hardcoded
    // rawScanSafe=false silently degraded it to the full-table fallback)
    val schema = DeltaLoader.load(spark, TableSource("z", dir, Some("delta"))).schema
    val pruned = idx.prunedDf(spark, preds, schema)
    assert(pruned.isDefined, "prunedDf must serve the z-ordered layout")
    assert(pruned.get.where("x <= 12 AND y <= 12").count() ==
      pts.count(p => p._2 <= 12 && p._3 <= 12))
    // and the data is untouched
    val got = DeltaLoader.load(spark,
        TableSource("z", dir, Some("delta")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == pts.toSet)
  }

  test("iceberg: zorder compaction makes 2-D zone pruning effective") {
    val dir = newDir("graft_zorder_i")
    val pts = for (i <- 0 until 8000) yield (i.toLong, (i * 37 % 100).toLong, (i * 53 % 100).toLong)
    pts.grouped(2000).foreach { g =>
      IcebergWriter.write(g.toDF("id", "x", "y").repartition(2), dir)
    }
    val preds = Seq[ColumnIndex.Pred](
      ("x", "lte", "12"), ("y", "lte", "12"))
    val idx0 = ColumnIndex.buildFromIceberg(spark, dir, Seq("x", "y"))
    assert(idx0.prune(preds).get.size == idx0.fileCount)

    val v = IcebergWriter.compactDataFiles(spark, dir,
      targetFileBytes = 8L << 10, zorderBy = Seq("x", "y"))
    assert(v > 0)
    val idx = ColumnIndex.buildFromIceberg(spark, dir, Seq("x", "y"))
    assert(idx.fileCount >= 4)
    val after = idx.prune(preds).get
    assert(after.size * 2 <= idx.fileCount,
      s"z-order should prune >= half: kept ${after.size} of ${idx.fileCount}")
    val got = IcebergLoader.load(spark,
        TableSource("z", dir, Some("iceberg")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == pts.toSet)
  }

  test("zorder refuses partition columns and unknown columns") {
    val dir = newDir("graft_zorder_ref")
    DeltaWriter.write(Seq((1L, "a", 2L)).toDF("id", "p", "x"), dir,
      partitionBy = Seq("p"))
    val e1 = intercept[IllegalArgumentException] {
      DeltaWriter.compact(spark, dir, zorderBy = Seq("p"))
    }
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaWriter.compact(spark, dir, zorderBy = Seq("nope"))
    }
    assert(e2.getMessage.contains("not a data column"))
  }
}
