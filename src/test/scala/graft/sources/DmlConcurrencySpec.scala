package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Optimistic DML concurrency on both formats: a lost commit race against
  * a BLIND APPEND rebases the same actions to the next version (no rescan
  * — write-serializable isolation, upstream's default); a race against a
  * CONFLICTING commit (another DML) reclaims the attempt's files and
  * recomputes, so both writers' effects land as if serialized. The
  * `preCommitHook` seam interleaves the concurrent writer exactly between
  * snapshot read and commit — deterministic, no thread timing. */
class DmlConcurrencySpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def deltaRows(dir: String): Set[(Long, String)] =
    DeltaLoader.load(spark, TableSource("c", dir, Some("delta")))
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def icebergRows(dir: String): Set[(Long, String)] =
    IcebergLoader.load(spark, TableSource("c", dir, Some("iceberg")))
      .select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("delta: DML rebases over a concurrent blind append without rescanning") {
    val dir = newDir("graft_occ_d_app")
    DeltaWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    // the append lands AFTER our snapshot read, BEFORE our commit — it
    // takes version 1, our delete must rebase to version 2
    DeltaDml.preCommitHook = () =>
      DeltaWriter.write((11L to 12L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val v = DeltaDml.deleteWhere(spark, dir, "id = 3")
    assert(v == 2L, s"expected a rebase to version 2, got $v")
    // the delete applied to the files it scanned; the appended rows are
    // intact (they serialize AFTER the delete under write-serializable)
    assert(deltaRows(dir) ==
      ((1L to 12L).toSet - 3L).map(i => (i, s"n$i")))
  }

  test("delta: DML recomputes after a conflicting concurrent DML") {
    val dir = newDir("graft_occ_d_dml")
    DeltaWriter.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    // concurrent DELETE takes version 1 with remove actions -> conflict
    DeltaDml.preCommitHook = () =>
      assert(DeltaDml.deleteWhere(spark, dir, "id = 7") == 1L)
    val v = DeltaDml.deleteWhere(spark, dir, "id = 3")
    assert(v == 2L, s"expected the recomputed commit at version 2, got $v")
    // BOTH deletes hold — the serialized outcome
    assert(deltaRows(dir) ==
      ((1L to 20L).toSet -- Set(3L, 7L)).map(i => (i, s"n$i")))
    // the failed attempt's DV bin was reclaimed: the only bins on disk are
    // the concurrent delete's (superseded, tombstone-clocked) and the
    // retry's merged one
    val bins = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(bins.length == 2, bins.map(_.getName).mkString(","))
  }

  test("delta: repeated conflicts exhaust the retry budget loudly") {
    val dir = newDir("graft_occ_d_exh")
    DeltaWriter.write((1L to 9L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    // a hook that re-arms itself: every attempt loses to a fresh conflict
    var n = 0
    def arm(): Unit = DeltaDml.preCommitHook = () => {
      n += 1
      val id = 100L + n
      DeltaWriter.write(Seq((id, s"x$n")).toDF("id", "name"), dir)
      assert(DeltaDml.deleteWhere(spark, dir, s"id = $id") > 0)
      arm()
    }
    arm()
    try {
      val e = intercept[IllegalArgumentException] {
        DeltaDml.deleteWhere(spark, dir, "id = 1")
      }
      assert(e.getMessage.contains("giving up"), e.getMessage)
    } finally DeltaDml.preCommitHook = () => ()
  }

  test("iceberg: DML rebases over a concurrent blind append (manifests only)") {
    val dir = newDir("graft_occ_i_app")
    IcebergWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergDml.preCommitHook = () =>
      IcebergWriter.write((11L to 12L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val v = IcebergDml.deleteWhere(spark, dir, "id = 3")
    assert(v > 0)
    assert(icebergRows(dir) ==
      ((1L to 12L).toSet - 3L).map(i => (i, s"n$i")))
    // the rebased snapshot's manifest list must carry the APPEND's
    // manifest too (rebase = new current list + our delete manifest)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val plan = IcebergLoader.planSnapshot(fs, dir, meta,
      IcebergLoader.chooseSnapshot(meta, dir, None))
    assert(plan.dataFiles.nonEmpty && plan.positionDeleteFiles.nonEmpty)
  }

  test("iceberg: DML recomputes after a conflicting concurrent DML") {
    val dir = newDir("graft_occ_i_dml")
    IcebergWriter.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    IcebergDml.preCommitHook = () =>
      assert(IcebergDml.deleteWhere(spark, dir, "id = 7") > 0)
    val v = IcebergDml.deleteWhere(spark, dir, "id = 3")
    assert(v > 0)
    assert(icebergRows(dir) ==
      ((1L to 20L).toSet -- Set(3L, 7L)).map(i => (i, s"n$i")))
  }

  test("iceberg: upsert rebases over a concurrent append; inserts survive both") {
    val dir = newDir("graft_occ_i_ups")
    IcebergWriter.write((1L to 5L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergDml.preCommitHook = () =>
      IcebergWriter.write(Seq((6L, "n6")).toDF("id", "name"), dir)
    val v = IcebergDml.upsert(
      Seq((5L, "FIVE"), (9L, "nine")).toDF("id", "name"), dir, Seq("id"))
    assert(v > 0)
    assert(icebergRows(dir) ==
      Set((1L, "n1"), (2L, "n2"), (3L, "n3"), (4L, "n4"),
        (5L, "FIVE"), (6L, "n6"), (9L, "nine")))
  }
}
