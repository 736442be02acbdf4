package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Column-index zones sourced from table-format metadata (round-13 verdict
  * item): Delta `add.stats` / partitionValues and Iceberg manifest bounds
  * feed `zoneMayMatch` with ZERO parquet footer reads — proven by
  * corrupting the data files before the build. */
class TableFormatIndexSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  import spark.implicits._

  private def newDir(pfx: String): String =
    Files.createTempDirectory(pfx).toString + "/t"

  /** Overwrite every parquet data file with garbage (and drop the hadoop
    * .crc sidecars) so any footer read would throw — metadata-only builds
    * must not notice. */
  private def corruptParquet(root: java.io.File): Unit = {
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (f.getName.endsWith(".parquet") && !f.getPath.contains("metadata"))
        java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
      else if (f.getName.endsWith(".crc")) f.delete()
    walk(root)
  }

  test("delta: zones come from add.stats alone (files corrupted first)") {
    val dir = newDir("tfidx_delta")
    // three commits with disjoint id ranges -> three tight-zone files
    Seq.tabulate(3) { b =>
      DeltaWriter.write(
        (b * 100L until b * 100L + 100L).map(i => (i, s"n$i")).toDF("id", "name")
          .coalesce(1), dir)
    }
    corruptParquet(new java.io.File(dir))
    val idx = ColumnIndex.buildFromDelta(spark, dir, Seq("id", "name"))
    // unpartitioned, DV-free: the log adds no meaning to the bytes, so the
    // index MAY serve raw scans (the zones-from-metadata property is
    // proven by the corrupted files below, not by this flag)
    assert(idx.rawScanSafe)
    assert(idx.fileCount == 3)
    assert(idx.files.map(_.rows).sum == 300) // numRecords from stats
    val zs = idx.files.flatMap(_.zones.get("id")).sortBy(_.minL)
    assert(zs.map(z => (z.minL, z.maxL)) ==
      Vector((0L, 99L), (100L, 199L), (200L, 299L)))
    // string zones ride along
    assert(idx.files.forall(_.zones.contains("name")))
    val kept = idx.prune(Seq(("id", "eq", "150"))).get
    assert(kept.size == 1)
    assert(idx.lastPrune.contains((1, 3)))
    // rawScanSafe = true here (unpartitioned, DV-free): prunedDf serves
    // the pruned file list directly
    assert(idx.prunedDf(spark, Seq(("id", "eq", "150")),
      new org.apache.spark.sql.types.StructType()).isDefined)
  }

  test("delta: overwrite drops dead files from the index") {
    val dir = newDir("tfidx_delta_ow")
    DeltaWriter.write((0L until 50L).map(i => (i, "x")).toDF("id", "name"), dir)
    DeltaWriter.write((1000L until 1010L).map(i => (i, "y")).toDF("id", "name")
      .coalesce(1), dir, mode = "overwrite")
    val idx = ColumnIndex.buildFromDelta(spark, dir, Seq("id"))
    assert(idx.fileCount == 1)
    val z = idx.files.head.zones("id")
    assert(z.minL == 1000L && z.maxL == 1009L)
  }

  test("delta: identity partition values become exact [v,v] zones") {
    // hand-built log (our writer is unpartitioned): two files in different
    // region partitions, no stats at all — partitionValues alone must prune
    val dir = newDir("tfidx_delta_part")
    val logDir = new java.io.File(dir + "/_delta_log"); logDir.mkdirs()
    val schema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"region\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.writeString(java.nio.file.Path.of(dir + "/_delta_log/00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":["region"],"configuration":{},"createdTime":0}}
         |{"add":{"path":"region=us/f1.parquet","partitionValues":{"region":"us"},"size":1,"modificationTime":0,"dataChange":true}}
         |{"add":{"path":"region=eu/f2.parquet","partitionValues":{"region":"eu"},"size":1,"modificationTime":0,"dataChange":true}}
         |{"add":{"path":"region=__n/f3.parquet","partitionValues":{"region":null},"size":1,"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val idx = ColumnIndex.buildFromDelta(spark, dir, Seq("region"))
    assert(idx.fileCount == 3)
    val kept = idx.prune(Seq(("region", "eq", "'us'"))).get
    // the null-partition file is all-null (never matches eq) and drops too
    assert(kept.size == 1 && kept.head.contains("region=us"))
  }

  test("delta: stats survive the checkpoint (JSON commits deleted)") {
    val dir = newDir("tfidx_delta_cp")
    (0 until 12).foreach(b =>
      DeltaWriter.write(
        (b * 10L until b * 10L + 10L).map(i => (i, "v")).toDF("id", "name")
          .coalesce(1), dir))
    // wipe every JSON commit at or below the v9 checkpoint
    new java.io.File(dir + "/_delta_log").listFiles().foreach { f =>
      val name = f.getName.stripPrefix(".").stripSuffix(".crc")
      if (name.endsWith(".json") && name.stripSuffix(".json").toLong <= 9)
        assert(f.delete())
    }
    val idx = ColumnIndex.buildFromDelta(spark, dir, Seq("id"))
    assert(idx.fileCount == 12)
    // all twelve files kept their stats zones — ten via the checkpoint
    assert(idx.files.forall(_.zones.contains("id")))
    assert(idx.prune(Seq(("id", "eq", "55"))).get.size == 1)
  }

  test("iceberg: zones come from manifest bounds alone (files corrupted first)") {
    val dir = newDir("tfidx_ice")
    val df = (0L until 90L).map(i =>
      (i, if (i < 30) "us" else if (i < 60) "eu" else "ap", s"d$i"))
      .toDF("id", "region", "name")
    IcebergWriter.write(df, dir, partitionBy = Seq("region"))
    corruptParquet(new java.io.File(dir + "/data"))
    val idx = ColumnIndex.buildFromIceberg(spark, dir, Seq("id", "region"))
    // partitioned: the hive-style layout dirs would be partition-INFERRED
    // by a raw basePath scan, so the index must refuse raw serving
    assert(!idx.rawScanSafe)
    assert(idx.fileCount >= 3)
    assert(idx.files.map(_.rows).sum == 90)
    // partition pruning via the identity column's own bounds: per-tuple
    // files give [v, v] string zones
    val kept = idx.prune(Seq(("region", "eq", "'us'"))).get
    assert(kept.nonEmpty && kept.size < idx.fileCount)
    // and the correlated long column prunes too (ids 0..29 are all us)
    val keptId = idx.prune(Seq(("id", "lt", "30"))).get
    assert(keptId.toSet == kept.toSet)
  }

  test("engine + SQL rule prune a registered delta table end to end") {
    val dir = newDir("tfidx_eng")
    Seq.tabulate(4) { b =>
      DeltaWriter.write(
        (b * 100L until b * 100L + 100L).map(i => (i, s"n$i")).toDF("id", "name")
          .coalesce(1), dir)
    }
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("dt", dir, format = Some("delta"),
        options = Map("index_columns" -> "id", "use_memory_table" -> "false")))
      val idx = eng.columnIndex("dt")
      assert(idx.isDefined && idx.get.fileCount == 4)
      // SQL rides IndexPruneRule: the delta loader's multi-root file scan
      // is pruned among its own listing via the ancestor registry lookup
      val q = eng.querySql("SELECT id, name FROM dt WHERE id >= 150 AND id < 250 ORDER BY id")
      assert(q.collect().map(_.getLong(0)).toSeq == (150L until 250L))
      val roots = q.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths
      }.get
      assert(roots.size == 2 && roots.forall(_.getName.endsWith(".parquet")),
        roots.mkString(","))
      // REST stays correct: rawScanSafe = false refuses the raw re-scan,
      // the normal (unpruned) path serves — but the SQL fallback plan a
      // REST filter builds still prunes through the rule
      val viaRest = eng.queryRest("dt",
        Map("filter[id]gte" -> "150", "filter[id]lt" -> "160", "sort" -> "id"))
      assert(viaRest.collect().map(_.getAs[Long]("id")).toSeq == (150L until 160L))
    } finally eng.dropTable("dt")
  }

  test("writer commits refresh a registered index: next query prunes new zones") {
    val dir = newDir("tfidx_fresh")
    Seq.tabulate(3) { b =>
      DeltaWriter.write(
        (b * 100L until b * 100L + 100L).map(i => (i, s"n$i")).toDF("id", "name")
          .coalesce(1), dir)
    }
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("dtf", dir, format = Some("delta"),
        options = Map("index_columns" -> "id", "use_memory_table" -> "false")))
      assert(eng.columnIndex("dtf").get.fileCount == 3)
      // a writer append lands a NEW file with ids far outside the old zones
      DeltaWriter.write((1000L until 1100L).map(i => (i, s"x$i"))
        .toDF("id", "name").coalesce(1), dir)
      // the commit hook re-derives the zones async (coalesced per dir) —
      // drain the refresh queue, then assert; no refresh tick configured
      ColumnIndexRegistry.quiesce()
      val fresh = eng.columnIndex("dtf").get
      assert(fresh.fileCount == 4,
        s"index still has ${fresh.fileCount} files — commit hook did not fire")
      val kept = fresh.prune(Seq(("id", "gte", "1000"))).get
      assert(kept.size == 1, s"expected only the new file to survive: $kept")
      // the registered VIEW refreshes on its own tick (reference
      // semantics); once it does, the already-fresh zones prune the query
      // to the single new file through the SQL rule
      eng.registerTable(TableSource("dtf", dir, format = Some("delta"),
        options = Map("index_columns" -> "id", "use_memory_table" -> "false")))
      val q = eng.querySql("SELECT id FROM dtf WHERE id >= 1000 ORDER BY id")
      assert(q.collect().map(_.getLong(0)).toSeq == (1000L until 1100L))
      val afterTick = eng.columnIndex("dtf").get
      assert(afterTick.lastPrune.exists { case (k, t) => k < t },
        s"rule-side prune did not engage: ${afterTick.lastPrune}")
      // iceberg: same contract through its writer
      val iDir = newDir("tfidx_fresh_ice")
      IcebergWriter.write((0L until 50L).map(i => (i, s"a$i")).toDF("id", "name")
        .coalesce(1), iDir)
      eng.registerTable(TableSource("itf", iDir, format = Some("iceberg"),
        options = Map("index_columns" -> "id", "use_memory_table" -> "false")))
      assert(eng.columnIndex("itf").get.fileCount == 1)
      IcebergWriter.write((5000L until 5050L).map(i => (i, s"b$i"))
        .toDF("id", "name").coalesce(1), iDir)
      ColumnIndexRegistry.quiesce()
      val ifresh = eng.columnIndex("itf").get
      assert(ifresh.fileCount == 2)
      assert(ifresh.prune(Seq(("id", "gte", "5000"))).get.size == 1)
      eng.dropTable("itf")
    } finally eng.dropTable("dtf")
  }
}
