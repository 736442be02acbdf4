package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Scale hardening of the incremental readers (round-19 verdict):
  *  - DV-delta synthesis must produce IDENTICAL changes whether the
  *    tombstones broadcast (driver decode) or shuffle (executor decode) —
  *    pinned by zeroing `spark.graft.dvBroadcastRows` so the shuffle leg
  *    actually executes;
  *  - an action missing `dataChange` is a DATA CHANGE, not housekeeping —
  *    a lenient external writer's commits must surface, not silently
  *    synthesize as empty (review finding);
  *  - wide version/snapshot ranges fold through a pairwise union tree, so
  *    the plan depth is O(log n) in commits, not O(n). */
class CdfScaleSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def changeSet(df: DataFrame): Set[(Long, String, String, Long)] =
    df.select("id", "name", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  test("CDF synthesis: broadcast and shuffle tombstone legs agree exactly") {
    val dir = newDir("graft_cdf_par")
    // one commit per synthesis mode: fresh adds (v0), DV swap (v1), a
    // second swap on the same file (v2, cumulative-bitmap delta), a
    // full-file remove (v3)
    DeltaWriter.write((1L to 8L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir) // v0
    DeltaDml.deleteWhere(spark, dir, "id IN (2, 5)") // v1: DV swap
    DeltaDml.deleteWhere(spark, dir, "id = 7") // v2: swap, delta {7} only
    DeltaDml.deleteWhere(spark, dir, "id <= 100") // v3: whole file drops
    val viaBroadcast = changeSet(DeltaCdf.loadChanges(spark, dir, -1L))
    val viaShuffle =
      try {
        // zero thresholds: EVERY tombstone frame takes the executor-decode
        // + shuffle-join path — the 100 TB shape, executed at spec scale
        spark.conf.set("spark.graft.dvBroadcastRows", "0")
        changeSet(DeltaCdf.loadChanges(spark, dir, -1L))
      } finally spark.conf.unset("spark.graft.dvBroadcastRows")
    assert(viaBroadcast == viaShuffle)
    assert(viaBroadcast.exists(_._3 == "insert"), viaBroadcast.mkString(","))
    assert(viaBroadcast.count(_._3 == "delete") == 8, viaBroadcast.mkString(","))
    // per-version deltas, not cumulative re-emits
    assert(viaBroadcast.filter(_._4 == 2L).map(x => (x._1, x._3)) ==
      Set((7L, "delete")), viaBroadcast.mkString(","))
    assert(viaBroadcast.filter(_._4 == 3L).map(_._1) ==
      Set(1L, 3L, 4L, 6L, 8L), viaBroadcast.mkString(","))
  }

  test("CDF synthesis: an action missing dataChange is a data change") {
    val dir = newDir("graft_cdf_dc")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .coalesce(1), dir) // v0
    // doctor v1: remove the file WITHOUT a dataChange field — the
    // protocol marks the field required, but a lenient external writer
    // omitting it means "data changed", never "housekeeping"
    val log0 = Files.readString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000000.json"))
    val addRx = """"add":\{"path":"([^"]+)"""".r
    val path = addRx.findFirstMatchIn(log0).get.group(1)
    Files.writeString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000001.json"),
      s"""{"commitInfo":{"timestamp":1,"operation":"DELETE","operationParameters":{}}}
         |{"remove":{"path":"$path","deletionTimestamp":1}}
         |""".stripMargin)
    val d1 = DeltaCdf.loadChanges(spark, dir, fromVersion = 0L)
    assert(changeSet(d1) == Set((1L, "a", "delete", 1L), (2L, "b", "delete", 1L)))
    // explicit dataChange=false STILL reads as housekeeping
    Files.writeString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000002.json"),
      s"""{"commitInfo":{"timestamp":2,"operation":"OPTIMIZE","operationParameters":{}}}
         |{"add":{"path":"$path","partitionValues":{},"size":1,"modificationTime":2,"dataChange":false}}
         |""".stripMargin)
    assert(DeltaCdf.loadChanges(spark, dir, fromVersion = 1L).count() == 0L)
  }

  test("CDF synthesis: a RESTORE-shaped swap (shrunk DV) re-inserts the un-doomed rows") {
    val dir = newDir("graft_cdf_rst")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .coalesce(1), dir) // v0
    DeltaDml.deleteWhere(spark, dir, "id = 2") // v1: DV {row of id=2}
    // doctor v2 as a RESTORE to v0: swap the DV'd add back to the bare
    // v0 add (bitmap drops entirely) — the un-doomed row must re-enter
    // the feed as an insert, not synthesize as nothing
    val logDir = java.nio.file.Path.of(dir + "/_delta_log")
    val v0add = Files.readString(logDir.resolve("00000000000000000000.json"))
      .split('\n').find(_.contains("\"add\"")).get
    val v1add = Files.readString(logDir.resolve("00000000000000000001.json"))
      .split('\n').find(_.contains("\"add\"")).get
    // the remove carries v1's DV (the state being reverted)
    val v1remove = v1add.replaceFirst("\\{\"add\":", "{\"remove\":")
    Files.writeString(logDir.resolve("00000000000000000002.json"),
      s"""{"commitInfo":{"timestamp":3,"operation":"RESTORE","operationParameters":{}}}
         |$v1remove
         |$v0add
         |""".stripMargin)
    val d2 = DeltaCdf.loadChanges(spark, dir, fromVersion = 1L)
    assert(changeSet(d2) == Set((2L, "b", "insert", 2L)))
    // the full range reads coherently: inserted, deleted, re-inserted
    assert(changeSet(DeltaCdf.loadChanges(spark, dir, -1L)) == Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L), (3L, "c", "insert", 0L),
      (2L, "b", "delete", 1L),
      (2L, "b", "insert", 2L)))
  }

  test("CDF synthesis: an equal-cardinality different-vector swap diffs both ways") {
    val dir = newDir("graft_cdf_eqc")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .coalesce(1), dir) // v0: row indexes 0,1,2 in insertion order
    DeltaDml.deleteWhere(spark, dir, "id = 1") // v1: DV {0}
    // doctor v2: swap to a same-cardinality DIFFERENT bitmap {2} — a
    // nonconforming writer's combined restore+delete in one commit; the
    // containment invariant does not hold, so BOTH asymmetric diffs must
    // surface instead of the swap being skipped on equal cardinality
    val logDir = java.nio.file.Path.of(dir + "/_delta_log")
    val v1add = Files.readString(logDir.resolve("00000000000000000001.json"))
      .split('\n').find(_.contains("\"add\"")).get
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val bytes = DeletionVectors.serializeBitmapArray(Array(2L))
    // Z85 works in 4-byte groups: pad for encoding, sizeInBytes trims
    val padded = java.util.Arrays.copyOf(bytes, (bytes.length + 3) / 4 * 4)
    val dvNode = mapper.createObjectNode()
    dvNode.put("storageType", "i")
    dvNode.put("pathOrInlineDv", DeletionVectors.z85Encode(padded))
    dvNode.put("sizeInBytes", bytes.length)
    dvNode.put("cardinality", 1L)
    val rmLine = mapper.readTree(v1add)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    rmLine.set("remove", rmLine.remove("add"))
    val addLine = mapper.readTree(v1add)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    addLine.get("add")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .set("deletionVector", dvNode)
    Files.writeString(logDir.resolve("00000000000000000002.json"),
      s"""{"commitInfo":{"timestamp":5,"operation":"REPAIR","operationParameters":{}}}
         |${mapper.writeValueAsString(rmLine)}
         |${mapper.writeValueAsString(addLine)}
         |""".stripMargin)
    val d2 = DeltaCdf.loadChanges(spark, dir, fromVersion = 1L)
    assert(changeSet(d2) == Set(
      (3L, "c", "delete", 2L), // newly doomed by the different bitmap
      (1L, "a", "insert", 2L)), // un-doomed by it
      changeSet(d2).mkString(","))
  }

  test("wide ranges plan flat: 64-commit Delta CDF + Iceberg changelog") {
    // 64 single-row commits per format — a left-deep union here would
    // already strain analysis; the pairwise tree keeps it O(log n) and the
    // range must EXECUTE, not just plan (round-19 verdict #5)
    val dDir = newDir("graft_cdf_wide")
    (1L to 64L).foreach { i =>
      DeltaWriter.write(Seq((i, s"n$i")).toDF("id", "name").coalesce(1), dDir)
    }
    val d = DeltaCdf.loadChanges(spark, dDir, fromVersion = -1L)
    assert(d.count() == 64L)
    assert(d.select("_commit_version").distinct().count() == 64L)

    val iDir = newDir("graft_chg_wide")
    (1L to 64L).foreach { i =>
      IcebergWriter.write(Seq((i, s"n$i")).toDF("id", "name").coalesce(1), iDir)
    }
    val c = IcebergIncremental.changesBetween(spark, iDir, -1L)
    assert(c.count() == 64L)
    assert(c.select("_snapshot_id").distinct().count() == 64L)
  }
}
