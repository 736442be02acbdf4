package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** V2 checkpoint WRITING: migration (protocol upgrade + uuid main +
  * sidecars), replay-base correctness after log retirement, and the point
  * of the layout — INCREMENTAL re-checkpoints that reuse clean sidecars
  * verbatim and rewrite only the ones a changed path lands in. */
class DeltaCheckpointV2Spec extends SparkSpec {

  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("graft_cpv2").toString + "/t"

  private def readBack(dir: String): DataFrame =
    DeltaLoader.load(spark, TableSource("cp2", dir, Some("delta")))

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def logFiles(dir: String): Seq[String] =
    new java.io.File(dir + "/_delta_log").listFiles().map(_.getName).toSeq

  private def mainSidecarRefs(dir: String, v: Long): Set[String] = {
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    DeltaCheckpoints.referencedSidecars(spark, fs,
      new HPath(dir, "_delta_log"), v, None).map(_.getName).toSet
  }

  test("checkpointV2 migrates: protocol feature, uuid main, sidecars, replay") {
    val dir = newDir()
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "name"), dir)
    val v = DeltaWriter.checkpointV2(spark, dir)
    assert(v == 2L) // the protocol-upgrade commit became the head
    // upgraded protocol, spec naming, sidecars on disk
    val upgrade = Files.readString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000002.json"))
    assert(upgrade.contains("\"v2Checkpoint\"") &&
      upgrade.contains("\"minReaderVersion\":3"))
    val names = logFiles(dir)
    assert(names.exists(_.matches(raw"0*2\.checkpoint\.[^.]+\.parquet")),
      names.mkString(","))
    assert(mainSidecarRefs(dir, v).nonEmpty)
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // the checkpoint is a real replay base: retire every pre-checkpoint
    // JSON commit and the table must still read whole
    DeltaWriter.cleanupLog(spark, dir, retentionMs = 0L)
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("incremental v2: clean sidecars carry verbatim, appends land fresh") {
    val dir = newDir()
    DeltaWriter.write((1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val v1 = DeltaWriter.checkpointV2(spark, dir)
    val firstRefs = mainSidecarRefs(dir, v1)
    assert(firstRefs.nonEmpty)
    // append only: nothing tombstones, so EVERY old sidecar must reuse
    DeltaWriter.write((101L to 120L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val snap = DeltaLoader.snapshot(spark, dir)
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    DeltaWriter.writeCheckpointV2(spark, fs, new HPath(dir),
      new HPath(dir, "_delta_log"), snap.version)
    val secondRefs = mainSidecarRefs(dir, snap.version)
    assert(firstRefs.subsetOf(secondRefs),
      s"append-only re-checkpoint must reuse every clean sidecar: " +
        s"$firstRefs vs $secondRefs")
    assert(secondRefs.size > firstRefs.size, "the appends need a fresh sidecar")
    assert(rows(readBack(dir)) ==
      (1L to 120L).map(i => (i, s"n$i")).toSet)
  }

  test("incremental v2: a tombstoned path rewrites ONLY its sidecar") {
    val dir = newDir()
    // two far-apart path populations in separate commits so the first v2
    // checkpoint shards them into at least two sidecars
    DeltaWriter.write((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    DeltaWriter.write((51L to 100L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // force multiple sidecars: one action per sidecar would be silly, use a
    // small cap so the add set splits
    val v1 = DeltaWriter.checkpointV2(spark, dir, actionsPerSidecar = 2L)
    val firstRefs = mainSidecarRefs(dir, v1)
    assert(firstRefs.size >= 2, s"want >= 2 sidecars, got $firstRefs")
    // DV-delete one row: its file's path is removed AND re-added, dirtying
    // exactly the sidecar(s) holding that path
    DeltaDml.deleteWhere(spark, dir, "id = 1")
    val snap = DeltaLoader.snapshot(spark, dir)
    DeltaWriter.writeCheckpointV2(spark, fs, new HPath(dir),
      new HPath(dir, "_delta_log"), snap.version, actionsPerSidecar = 2L)
    val secondRefs = mainSidecarRefs(dir, snap.version)
    val carried = firstRefs & secondRefs
    assert(carried.nonEmpty, "untouched sidecars must carry verbatim")
    assert((firstRefs -- secondRefs).nonEmpty,
      "the dirtied sidecar must have been replaced")
    val expect = (2L to 100L).map(i => (i, s"n$i")).toSet
    assert(rows(readBack(dir)) == expect)
    // and the v2 checkpoint remains the replay base after log retirement
    DeltaWriter.cleanupLog(spark, dir, retentionMs = 0L)
    assert(rows(readBack(dir)) == expect)
  }

  test("interval checkpoints stay v2 once migrated (dispatch)") {
    val dir = newDir()
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    DeltaWriter.checkpointV2(spark, dir) // head becomes v1 (upgrade commit)
    // drive the version counter to the interval boundary: v9 commit
    // triggers the automatic checkpoint, which must come out V2
    (2L to 9L).foreach { i =>
      DeltaWriter.write(Seq((i, s"n$i")).toDF("id", "name"), dir)
    }
    val names = logFiles(dir)
    assert(names.exists(_.matches(raw"0*9\.checkpoint\.[^.]+\.parquet")),
      s"the interval checkpoint at v9 must be uuid-named: " +
        names.filter(_.contains("checkpoint")).mkString(","))
    assert(!names.contains("00000000000000000009.checkpoint.parquet"))
    assert(rows(readBack(dir)) ==
      (Set(1L -> "a") ++ (2L to 9L).map(i => (i, s"n$i"))))
  }
}
