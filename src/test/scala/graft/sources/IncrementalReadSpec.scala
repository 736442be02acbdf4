package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Incremental consumption: Delta CDF ([[DeltaCdf]] — cdc files when the
  * table opts in, add/remove/DV-diff synthesis otherwise) and the Iceberg
  * incremental append scan ([[IcebergIncremental]]). */
class IncrementalReadSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def changeSet(df: DataFrame): Set[(Long, String, String, Long)] =
    df.select("id", "name", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  // ---- Delta CDF: synthesis (no cdc files) ------------------------------------

  test("CDF synthesis: appends are inserts, DV deletes are row-level deletes") {
    val dir = newDir("graft_cdf_syn")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), dir) // v0
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "name"), dir) // v1
    DeltaDml.deleteWhere(spark, dir, "id = 1") // v2: DV swap
    val all = DeltaCdf.loadChanges(spark, dir, fromVersion = -1L)
    assert(changeSet(all) == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (3L, "c", "insert", 1L),
      (1L, "a", "delete", 2L)))
    // a second delete on the same file yields ONLY the newly-doomed row
    DeltaDml.deleteWhere(spark, dir, "id = 2") // v3
    val d3 = DeltaCdf.loadChanges(spark, dir, fromVersion = 2L)
    assert(changeSet(d3) == Set((2L, "b", "delete", 3L)))
    // compaction (dataChange=false) contributes NO changes
    DeltaWriter.compact(spark, dir) // v4
    val d4 = DeltaCdf.loadChanges(spark, dir, fromVersion = 3L)
    assert(d4.count() == 0L)
  }

  test("CDF synthesis: a fully-removed file emits deletes for its live rows") {
    val dir = newDir("graft_cdf_full")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), dir) // v0
    DeltaDml.deleteWhere(spark, dir, "id = 1") // v1: DV
    DeltaDml.deleteWhere(spark, dir, "id = 2") // v2: full-file remove
    val d2 = DeltaCdf.loadChanges(spark, dir, fromVersion = 1L)
    // only the row still live at v1 is deleted by v2 — id=1 was already
    // dead and must NOT reappear
    assert(changeSet(d2) == Set((2L, "b", "delete", 2L)))
  }

  test("CDF synthesis handles partitioned tables and UPDATE as delete+insert") {
    val dir = newDir("graft_cdf_part")
    DeltaWriter.write(
      Seq((1L, "us", "a"), (2L, "eu", "b")).toDF("id", "region", "name"),
      dir, partitionBy = Seq("region")) // v0
    DeltaDml.updateWhere(spark, dir, "id = 1", Map("region" -> "'eu'")) // v1
    val d1 = DeltaCdf.loadChanges(spark, dir, fromVersion = 0L)
    val got = d1.select("id", "region", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "us", "delete"), (1L, "eu", "insert")))
  }

  // ---- Delta CDF: cdc files ----------------------------------------------------

  test("CDF enabled: DML writes cdc files; reader serves them verbatim") {
    val dir = newDir("graft_cdf_cdc")
    DeltaWriter.write((1L to 6L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir) // v0
    assert(DeltaCdf.enableCdf(spark, dir) == 1L) // v1
    assert(DeltaCdf.enableCdf(spark, dir) == -1L) // idempotent

    DeltaDml.deleteWhere(spark, dir, "id = 2") // v2
    DeltaDml.updateWhere(spark, dir, "id = 3", Map("name" -> "'N3'")) // v3
    DeltaDml.upsert(Seq((4L, "N4"), (9L, "n9")).toDF("id", "name"),
      dir, Seq("id")) // v4

    // the commits carry cdc actions pointing under _change_data/
    val commits = (2 to 4).map(v => Files.readString(java.nio.file.Path.of(
      f"$dir/_delta_log/$v%020d.json")))
    assert(commits.forall(_.contains("\"cdc\"")), "DML must record cdc actions")
    assert(commits.forall(_.contains("_change_data")))

    val changes = DeltaCdf.loadChanges(spark, dir, fromVersion = 1L)
    assert(changeSet(changes) == Set(
      (2L, "n2", "delete", 2L),
      (3L, "n3", "update_preimage", 3L), (3L, "N3", "update_postimage", 3L),
      (4L, "n4", "delete", 4L),
      (4L, "N4", "insert", 4L), (9L, "n9", "insert", 4L)))

    // the table itself still reads correctly (cdc files must NOT be
    // picked up as data) — including after checkpoint (cdc actions drop
    // from checkpoints, carrying no state)
    DeltaWriter.checkpoint(spark, dir)
    val live = DeltaLoader.load(spark, TableSource("t", dir, Some("delta")))
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(live == Set((1L, "n1"), (3L, "N3"), (4L, "N4"), (5L, "n5"),
      (6L, "n6"), (9L, "n9")))
  }

  test("CDF on a column-mapped table: physical files, logical change rows") {
    // the TableDmlSpec column-mapping fixture shape: physical names in
    // files and partitionValues, logical names at the API
    val dir = Files.createTempDirectory("graft_cdf_cm").toString
    import org.apache.spark.sql.functions.col
    Seq((1L, "a"), (2L, "b")).toDF("col-id", "col-v")
      .coalesce(1).write.parquet(s"$dir/part-d1")
    def firstParquet(sub: String): String = {
      val d = java.nio.file.Paths.get(dir, sub)
      val f = Files.list(d).filter(_.toString.endsWith(".parquet")).findFirst().get()
      s"$sub/${f.getFileName}"
    }
    def fld(name: String, id: Int, tpe: String, phys: String): String =
      s"""{"name":"$name","type":"$tpe","nullable":true,"metadata":{""" +
        s""""delta.columnMapping.id":$id,"delta.columnMapping.physicalName":"$phys"}}"""
    val cmSchema = s"""{"type":"struct","fields":[${fld("id", 1, "long", "col-id")},""" +
      s"""${fld("v", 2, "string", "col-v")},${fld("ds", 3, "string", "col-ds")}]}"""
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder()
          .build().writeValueAsString(cmSchema)},"partitionColumns":["ds"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"}}}"""
    val logDir = new java.io.File(dir + "/_delta_log"); logDir.mkdirs()
    Files.writeString(java.nio.file.Path.of(logDir + "/00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        meta,
        s"""{"add":{"path":"${firstParquet("part-d1")}","partitionValues":{"col-ds":"d1"},"size":1,"modificationTime":1,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))

    // synthesis path: a DV delete on the mapped table
    DeltaDml.deleteWhere(spark, dir, "id = 2 AND ds = 'd1'")
    val syn = DeltaCdf.loadChanges(spark, dir, fromVersion = 0L)
      .select("id", "v", "ds", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(syn.toSet == Set((2L, "b", "d1", "delete")), syn.mkString(","))

    // cdc path: enable CDF, update — pre/post images come back logical
    DeltaCdf.enableCdf(spark, dir)
    DeltaDml.updateWhere(spark, dir, "id = 1", Map("v" -> "'A'"))
    val cdc = DeltaCdf.loadChanges(spark, dir, fromVersion = 2L)
      .select("id", "v", "ds", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(cdc.toSet == Set(
      (1L, "a", "d1", "update_preimage"), (1L, "A", "d1", "update_postimage")),
      cdc.mkString(","))
  }

  test("CDF range gates: retired logs refuse and take their cdc files along") {
    val dir = newDir("graft_cdf_gate")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    assert(DeltaCdf.loadChanges(spark, dir, 0L).count() == 0L)
    DeltaCdf.enableCdf(spark, dir)
    DeltaDml.deleteWhere(spark, dir, "id = 2") // writes a cdc file
    assert(new java.io.File(dir + "/_change_data").listFiles().nonEmpty)
    DeltaWriter.checkpoint(spark, dir)
    Thread.sleep(5)
    DeltaWriter.cleanupLog(spark, dir, retentionMs = 0L)
    val e = intercept[IllegalArgumentException] {
      DeltaCdf.loadChanges(spark, dir, fromVersion = -1L)
    }
    assert(e.getMessage.contains("retired"), e.getMessage)
    // the retired commits' cdc files went with them — _change_data must
    // not grow without bound once the range is unreadable
    val leftover = Option(new java.io.File(dir + "/_change_data").listFiles())
      .map(_.filterNot(_.getName.startsWith(".")).toSeq).getOrElse(Seq.empty)
    assert(leftover.isEmpty, leftover.mkString(","))
  }

  // ---- timestamp time travel ----------------------------------------------------

  test("timestampAsOf / asOfTimestamp resolve versions on both formats") {
    val dDir = newDir("graft_ts_d")
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "name"), dDir) // v0
    Thread.sleep(20)
    val betweenD = System.currentTimeMillis()
    Thread.sleep(20)
    DeltaWriter.write(Seq((2L, "b")).toDF("id", "name"), dDir) // v1
    val atV0 = DeltaLoader.load(spark, TableSource("t", dDir, Some("delta"),
      options = Map("timestampAsOf" -> betweenD.toString)))
    assert(atV0.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    val now = DeltaLoader.load(spark, TableSource("t", dDir, Some("delta"),
      options = Map("timestampAsOf" -> System.currentTimeMillis().toString)))
    assert(now.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      DeltaLoader.load(spark, TableSource("t", dDir, Some("delta"),
        options = Map("timestampAsOf" -> "100")))
    }
    assert(e.getMessage.contains("predates"), e.getMessage)

    val iDir = newDir("graft_ts_i")
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), iDir)
    Thread.sleep(20)
    val betweenI = System.currentTimeMillis()
    Thread.sleep(20)
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), iDir)
    val iAt = IcebergLoader.load(spark, TableSource("t", iDir, Some("iceberg"),
      options = Map("asOfTimestamp" -> betweenI.toString)))
    assert(iAt.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    // ISO form parses too
    val iso = java.time.Instant.ofEpochMilli(System.currentTimeMillis()).toString
    val iNow = IcebergLoader.load(spark, TableSource("t", iDir, Some("iceberg"),
      options = Map("asOfTimestamp" -> iso)))
    assert(iNow.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  // ---- Iceberg incremental append scan -----------------------------------------

  private def snapshotIds(dir: String): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    import scala.jdk.CollectionConverters._
    Option(meta.get("snapshots")).filterNot(_.isNull)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map(_.get("snapshot-id").asLong())
  }

  test("iceberg appendsBetween reads exactly the appended rows, skipping replaces") {
    val dir = newDir("graft_incr_i")
    IcebergWriter.write((1L to 3L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val s1 = snapshotIds(dir).max
    IcebergWriter.write((4L to 6L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergWriter.write((7L to 9L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    def ids(df: DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(IcebergIncremental.appendsBetween(spark, dir, s1)) ==
      (4L to 9L).toSet)
    assert(ids(IcebergIncremental.appendsBetween(spark, dir, -1L)) ==
      (1L to 9L).toSet)
    val s3 = snapshotIds(dir).max
    // compaction = a replace snapshot: adds nothing logically
    IcebergWriter.compactDataFiles(spark, dir, targetFileBytes = 64L << 20)
    assert(ids(IcebergIncremental.appendsBetween(spark, dir, s3)).isEmpty)
    // incremental across the compaction still sees the appends (their own
    // manifest lists are walked, not the current one)
    assert(ids(IcebergIncremental.appendsBetween(spark, dir, s1)) ==
      (4L to 9L).toSet)
  }

  test("iceberg changesBetween: inserts from appends, delete pre-images from DML") {
    val dir = newDir("graft_chg_i")
    IcebergWriter.write((1L to 6L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    val s0 = IcebergIncremental.currentSnapshotId(spark, dir)
    IcebergDml.deleteWhere(spark, dir, "id IN (2, 5)")
    IcebergWriter.write(Seq((7L, "n7")).toDF("id", "name"), dir)
    IcebergDml.updateWhere(spark, dir, "id = 3", Map("name" -> "'N3'"))
    val got = IcebergIncremental.changesBetween(spark, dir, s0)
      .select("id", "name", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (2L, "n2", "delete"), (5L, "n5", "delete"),
      (7L, "n7", "insert"),
      (3L, "n3", "delete"), (3L, "N3", "insert")))
    // a compaction in between contributes nothing and breaks nothing
    IcebergWriter.compactDataFiles(spark, dir, targetFileBytes = 64L << 20)
    val got2 = IcebergIncremental.changesBetween(spark, dir, s0)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 == Set((2L, "delete"), (5L, "delete"), (7L, "insert"),
      (3L, "delete"), (3L, "insert")))
    // equality deletes refuse loudly (keys, not row pre-images)
    IcebergDml.upsertByEquality(Seq((7L, "SEVEN")).toDF("id", "name"),
      dir, Seq("id"))
    val e = intercept[IllegalArgumentException] {
      IcebergIncremental.changesBetween(spark, dir, s0).count()
    }
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
  }

  test("iceberg incremental reads resolve a renamed column by FIELD ID") {
    val dir = newDir("graft_incr_ren")
    // snapshot 1 under (id, name); rename name -> label (metadata-only,
    // field id 2 unchanged); snapshot 2 under (id, label). Files written
    // BEFORE the rename must surface their values under the NEW name —
    // name-based projection null-filled them (round-19 verdict #4).
    IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), dir)
    IcebergWriter.renameColumn(spark, dir, "name", "label")
    IcebergWriter.write(Seq((3L, "c")).toDF("id", "label").coalesce(1), dir)
    val apps = IcebergIncremental.appendsBetween(spark, dir, -1L)
    assert(apps.columns.toSeq == Seq("id", "label"))
    assert(apps.select("id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")),
      "pre-rename files must project their old column into the new name")
    val chg = IcebergIncremental.changesBetween(spark, dir, -1L)
    assert(chg.select("id", "label", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert")))
    // a SECOND rename and append: files now span three schema versions,
    // every one projecting through the same field id (the range-end
    // schema is the END SNAPSHOT's, the loader's own time-travel rule —
    // a rename becomes visible with the next snapshot)
    IcebergWriter.renameColumn(spark, dir, "label", "tag")
    IcebergWriter.write(Seq((4L, "d")).toDF("id", "tag").coalesce(1), dir)
    val apps2 = IcebergIncremental.appendsBetween(spark, dir, -1L)
    assert(apps2.columns.toSeq == Seq("id", "tag"))
    assert(apps2.select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("iceberg changesBetween diffs v3 cumulative DVs per snapshot") {
    val dir = newDir("graft_chg_v3")
    IcebergWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    val s0 = IcebergIncremental.currentSnapshotId(spark, dir)
    // v2-era position delete first (also exercises the migration diff)...
    IcebergDml.deleteWhere(spark, dir, "id = 2")
    // ...then promote to v3
    val mf = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    Files.writeString(mf.toPath, Files.readString(mf.toPath)
      .replace("\"format-version\":2", "\"format-version\":3"))
    new java.io.File(mf.getParent, "." + mf.getName + ".crc").delete()
    // two v3 DV deletes on the SAME file: each snapshot's DV is cumulative
    // ({2,5} then {2,5,7} after migration) — the changelog must emit only
    // each snapshot's own delta
    IcebergDml.deleteWhere(spark, dir, "id = 5")
    IcebergDml.deleteWhere(spark, dir, "id = 7")
    val got = IcebergIncremental.changesBetween(spark, dir, s0)
      .select("id", "_change_type", "_snapshot_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(x => (x._1, x._2)).toSet ==
      Set((2L, "delete"), (5L, "delete"), (7L, "delete")), got.mkString(","))
    // three DISTINCT snapshots, one delete each
    assert(got.map(_._3).distinct.length == 3, got.mkString(","))
  }

  test("iceberg changesBetween: an overwrite's dropped files emit delete pre-images") {
    val dir = newDir("graft_chg_ovw")
    IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), dir) // s1
    // pre-doom a row: it must NOT resurrect in the overwrite's deletes
    IcebergDml.deleteWhere(spark, dir, "id = 1") // s2
    IcebergWriter.write(Seq((9L, "z")).toDF("id", "name"), dir,
      mode = "overwrite") // s3: truncate-and-replace, drops files wholesale
    val expected = Set(
      (1L, "a", "insert"), (2L, "b", "insert"),
      (1L, "a", "delete"), // s2's position delete
      (2L, "b", "delete"), // s3: the ONLY row still live when dropped
      (9L, "z", "insert"))
    def changes(): Set[(Long, String, String)] =
      IcebergIncremental.changesBetween(spark, dir, -1L)
        .select("id", "name", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(changes() == expected)
    // the snapshot SUMMARY is optional (v1 tables, minimal writers) — a
    // file-dropping snapshot without one must still emit its deletes:
    // the drop guard keys on the manifest-list diff, never on
    // summary.operation (review finding)
    val mf = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(mf.toPath))
    meta.get("snapshots").forEach { s =>
      s.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("summary"); ()
    }
    Files.writeString(mf.toPath, mapper.writeValueAsString(meta))
    new java.io.File(mf.getParent, "." + mf.getName + ".crc").delete()
    assert(changes() == expected, "summary-less snapshots must keep their deletes")
  }

  test("iceberg changesBetween: equality deletes opt into net-change pre-images") {
    val dir = newDir("graft_chg_eq")
    IcebergWriter.write(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "name").coalesce(1), dir)
    val s0 = IcebergIncremental.currentSnapshotId(spark, dir)
    IcebergDml.upsertByEquality(Seq((2L, "B"), (4L, "d")).toDF("id", "name"),
      dir, Seq("id"))
    // default still refuses, naming the opt-in
    val e = intercept[IllegalArgumentException] {
      IcebergIncremental.changesBetween(spark, dir, s0).count()
    }
    assert(e.getMessage.contains("equalityNetChanges"), e.getMessage)
    val got = IcebergIncremental.changesBetween(spark, dir, s0,
      equalityNetChanges = true)
      .select("id", "name", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // the delete's pre-image is the ROW, not the key; the unmatched key 4
    // contributes no delete
    assert(got == Set(
      (2L, "b", "delete"), (2L, "B", "insert"), (4L, "d", "insert")),
      got.mkString(","))
    // a SECOND upsert of the same key dooms the first upsert's row — the
    // strictly-below sequence rule picks the parent-state image
    val s1 = IcebergIncremental.currentSnapshotId(spark, dir)
    IcebergDml.upsertByEquality(Seq((2L, "BB")).toDF("id", "name"),
      dir, Seq("id"))
    val got2 = IcebergIncremental.changesBetween(spark, dir, s1,
      equalityNetChanges = true)
      .select("id", "name", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got2 == Set((2L, "B", "delete"), (2L, "BB", "insert")),
      got2.mkString(","))
  }

  test("iceberg appendsBetween refuses DML snapshots unless told to skip") {
    val dir = newDir("graft_incr_dml")
    IcebergWriter.write((1L to 4L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val s1 = snapshotIds(dir).max
    IcebergDml.deleteWhere(spark, dir, "id = 2")
    IcebergWriter.write(Seq((5L, "n5")).toDF("id", "name"), dir)
    val e = intercept[IllegalArgumentException] {
      IcebergIncremental.appendsBetween(spark, dir, s1).count()
    }
    assert(e.getMessage.contains("skipNonAppend"), e.getMessage)
    val got = IcebergIncremental.appendsBetween(spark, dir, s1,
      skipNonAppend = true).select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(5L))
  }
}
