package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Round-18 advisory fixes, pinned: vacuum's retention clock on superseded
  * DV bins, DeltaDml's writer-feature gate + surgical action carry-forward,
  * IcebergDml's empty-merge no-op under v3 migration, relocated-table
  * delete-file spellings, and the column index's any-spec partitioned
  * derivation. */
class DmlGuardrailsSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def deltaIds(dir: String): Set[Long] =
    DeltaLoader.load(spark, TableSource("g", dir, Some("delta")))
      .select("id").collect().map(_.getLong(0)).toSet

  // ---- vacuum: superseded DV bins keep the remove's retention clock ---------

  test("vacuum keeps a superseded DV bin inside the retention window (JSON clock)") {
    val dir = newDir("graft_vac_dvbin")
    DeltaWriter.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    DeltaDml.deleteWhere(spark, dir, "id = 3")
    val bins = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(bins.length == 1)
    // second delete on the same file supersedes the first bin moments later
    DeltaDml.deleteWhere(spark, dir, "id = 4")
    // age the OLD bin's mtime far past any window: without the remove's
    // deletionVector clock it is unreferenced-by-live + old-mtime = doomed
    val old = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
    assert(bins.head.setLastModified(old))
    DeltaWriter.vacuum(spark, dir, retentionMs = 3600_000L)
    assert(bins.head.exists(),
      "a DV bin superseded within the retention window must survive vacuum " +
        "(time travel to the prior snapshot still reads it)")
    // prior snapshot stays readable through the bin
    val snapVersions = new java.io.File(dir + "/_delta_log").listFiles()
      .map(_.getName).filter(_.endsWith(".json")).sorted
    assert(snapVersions.length >= 3)
    val prior = DeltaLoader.load(spark,
      TableSource("g", dir, Some("delta"), options = Map("version" -> "1")))
    assert(prior.select("id").collect().map(_.getLong(0)).toSet ==
      (1L to 20L).toSet - 3L)
    // past the window the bin goes
    Thread.sleep(5)
    DeltaWriter.vacuum(spark, dir, retentionMs = 0L)
    assert(!bins.head.exists(), "expired superseded bins must reclaim")
    assert(deltaIds(dir) == (1L to 20L).toSet -- Set(3L, 4L))
  }

  test("vacuum keeps a superseded DV bin via the CHECKPOINT tombstone clock") {
    val dir = newDir("graft_vac_dvbin_cp")
    DeltaWriter.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    DeltaDml.deleteWhere(spark, dir, "id = 3")
    val bins = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(bins.length == 1)
    DeltaDml.deleteWhere(spark, dir, "id = 4")
    // fold the log into a checkpoint and retire the JSON commits — the
    // remove (with its deletionVector) now lives only in checkpoint parquet
    DeltaWriter.checkpoint(spark, dir)
    Thread.sleep(5)
    DeltaWriter.cleanupLog(spark, dir, retentionMs = 0L)
    assert(!new java.io.File(dir + "/_delta_log/00000000000000000000.json").exists(),
      "cleanupLog should have retired the early JSON commits")
    val old = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
    assert(bins.head.setLastModified(old))
    DeltaWriter.vacuum(spark, dir, retentionMs = 3600_000L)
    assert(bins.head.exists(),
      "checkpoint tombstones must clock superseded DV bins too")
    assert(deltaIds(dir) == (1L to 20L).toSet -- Set(3L, 4L))
  }

  // ---- DeltaDml writer-feature gate ------------------------------------------

  private def handLog(dir: String, protocol: String, config: String = "{}"): Unit = {
    val logDir = new java.io.File(dir + "/_delta_log"); logDir.mkdirs()
    val schema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    Files.writeString(java.nio.file.Path.of(logDir + "/00000000000000000000.json"),
      s"""$protocol
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":$config,"createdTime":1}}
         |""".stripMargin)
  }

  test("DML refuses writer features it does not implement") {
    val dir = newDir("graft_gate_feat")
    handLog(dir,
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","deletionVectors"]}}""")
    val e = intercept[IllegalArgumentException] {
      DeltaDml.deleteWhere(spark, dir, "id = 1")
    }
    assert(e.getMessage.contains("rowTracking"), e.getMessage)
  }

  test("DML refuses append-only tables; constraints gate rewrites only") {
    val d1 = newDir("graft_gate_ao")
    handLog(d1, """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"delta.appendOnly":"true"}""")
    val e1 = intercept[IllegalArgumentException] {
      DeltaDml.deleteWhere(spark, d1, "id = 1")
    }
    assert(e1.getMessage.contains("append-only"), e1.getMessage)

    val d2 = newDir("graft_gate_ck")
    handLog(d2, """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
      """{"delta.constraints.idpos":"id > 0"}""")
    // empty table: DELETE no-ops cleanly (removal can't violate a check)
    assert(DeltaDml.deleteWhere(spark, d2, "id = 1") == -1L)
    val e2 = intercept[IllegalArgumentException] {
      DeltaDml.updateWhere(spark, d2, "id = 1", Map("id" -> "2"))
    }
    assert(e2.getMessage.contains("constraints"), e2.getMessage)
  }

  test("DML re-add carries unmodeled add fields verbatim (tags, baseRowId)") {
    val dir = newDir("graft_gate_carry")
    DeltaWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    // graft extra fields onto the add action, as an upstream writer with
    // features we don't model would (tags is spec'd; __future is not)
    val c0 = java.nio.file.Path.of(dir + "/_delta_log/00000000000000000000.json")
    val doctored = Files.readString(c0).split('\n').map { line =>
      if (!line.contains("\"add\"")) line
      else line.replaceFirst("\\{\"add\":\\{",
        """{"add":{"tags":{"k":"v"},"baseRowId":77,""")
    }.mkString("\n")
    Files.writeString(c0, doctored)
    new java.io.File(dir + "/_delta_log/.00000000000000000000.json.crc").delete()

    assert(DeltaDml.deleteWhere(spark, dir, "id = 3") == 1L)
    val commit = Files.readString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000001.json"))
    val addLine = commit.split('\n').find(_.contains("\"add\"")).get
    val rmLine = commit.split('\n').find(_.contains("\"remove\"")).get
    assert(addLine.contains("\"tags\":{\"k\":\"v\"}") &&
      addLine.contains("\"baseRowId\":77"), addLine)
    assert(rmLine.contains("\"tags\":{\"k\":\"v\"}") &&
      rmLine.contains("\"baseRowId\":77"), rmLine)
    // the merged-DV re-add still reads correctly
    assert(deltaIds(dir) == (1L to 10L).toSet - 3L)
  }

  // ---- IcebergDml: empty-source upsert no-op under v3 migration -------------

  test("empty-source upsert stays a no-op on v3 with v2 position deletes pending") {
    val dir = newDir("graft_idml_mig_ups")
    IcebergWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergDml.deleteWhere(spark, dir, "id = 2") // v2 position delete
    val mf = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    Files.writeString(mf.toPath, Files.readString(mf.toPath)
      .replace("\"format-version\":2", "\"format-version\":3"))
    new java.io.File(mf.getParent, "." + mf.getName + ".crc").delete()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = IcebergLoader.currentMetadataVersioned(fs, dir)._2
    assert(IcebergDml.upsert(
      Seq.empty[(Long, String)].toDF("id", "name"), dir, Seq("id")) == -1L,
      "a no-op merge must not commit a migration-only snapshot")
    assert(IcebergLoader.currentMetadataVersioned(fs, dir)._2 == before)
  }

  // ---- relocated tables: delete files carry the RECORDED spelling ------------

  test("relocated iceberg table: delete file_path uses the metadata's recorded location") {
    val src = newDir("graft_reloc_src")
    IcebergWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), src)
    // relocate the directory; metadata still records `location` = src
    val dst = Files.createTempDirectory("graft_reloc_dst").toString + "/t"
    assert(new java.io.File(src).renameTo(new java.io.File(dst)))
    assert(IcebergDml.deleteWhere(spark, dst, "id = 3") > 0)
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dst)
    val plan = IcebergLoader.planSnapshot(fs, dst, meta,
      IcebergLoader.chooseSnapshot(meta, dst, None))
    assert(plan.positionDeleteFiles.nonEmpty)
    val delPaths = spark.read.parquet(plan.positionDeleteFiles.map(p =>
        new org.apache.hadoop.fs.Path(p).toString): _*)
      .select("file_path").collect().map(_.getString(0))
    assert(delPaths.nonEmpty && delPaths.forall(_.startsWith(
        graft.sources.PartitionLayout.stripFileScheme(src))),
      s"file_path must carry the RECORDED location ($src): ${delPaths.mkString(",")}")
    // and this repo's own reader still applies them through the remap
    val got = IcebergLoader.load(spark, TableSource("r", dst, Some("iceberg")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 10L).toSet - 3L)
  }

  // ---- column index: partitioned if ANY spec has fields ----------------------

  test("iceberg index: spec evolved to unpartitioned still counts as partitioned") {
    val dir = newDir("graft_idx_spec")
    IcebergWriter.write(
      Seq((1L, "us", 10L), (2L, "eu", 20L)).toDF("id", "region", "score"),
      dir, partitionBy = Seq("region"))
    // evolve: append an unpartitioned spec and make it the default — the
    // live files still sit under region= hive dirs
    val mf = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val json = Files.readString(mf.toPath)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val specs = node.withArray("partition-specs")
    val unp = mapper.createObjectNode()
    unp.put("spec-id", 9); unp.putArray("fields")
    specs.add(unp)
    node.put("default-spec-id", 9)
    Files.writeString(mf.toPath, mapper.writeValueAsString(node))
    new java.io.File(mf.getParent, "." + mf.getName + ".crc").delete()

    val idx = ColumnIndex.buildFromIceberg(spark, dir, Seq("id"))
    assert(!idx.rawScanSafe,
      "hive-style dirs from the OLD spec would partition-infer in a raw scan")
  }
}
