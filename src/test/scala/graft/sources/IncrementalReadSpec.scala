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
