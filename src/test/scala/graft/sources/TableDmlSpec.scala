package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Row-level DML ([[DeltaDml]] / [[IcebergDml]]) round-tripped through the
  * repo's own protocol-level readers, plus the deletion-vector WRITE side
  * cross-checked byte-for-byte against the spec fixtures' INDEPENDENT
  * serializer ([[DvFixtures]] predates the production writer and was
  * derived from the RoaringFormatSpec separately — agreement pins both). */
class TableDmlSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def deltaRead(dir: String): DataFrame =
    DeltaLoader.load(spark, TableSource("dml_t", dir, Some("delta")))

  private def icebergRead(dir: String): DataFrame =
    IcebergLoader.load(spark, TableSource("dml_t", dir, Some("iceberg")))

  private def idName(df: DataFrame): Set[(Long, String)] =
    df.select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  // ---- deletion-vector serialization ----------------------------------------

  test("DV serializer round-trips through the reader (array + bitmap + multi-high)") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(1L, 5L, 17L, 65535L, 65536L, 131071L),
      (0L until 5000L).map(_ * 2).toArray, // > 4096 per container -> bitset
      Array(3L, (1L << 32) + 7L, (3L << 32) + 1L)) // empty intermediate highs
    cases.foreach { rows =>
      val data = DeletionVectors.serializeBitmapArray(rows)
      assert(DeletionVectors.deserializeBitmapArray(data).sameElements(rows),
        s"round-trip failed for ${rows.take(5).mkString(",")}...")
    }
  }

  test("streaming DV serializer is byte-identical to the array form") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(1L, 5L, 17L, 65535L, 65536L, 131071L),
      (0L until 5000L).map(_ * 2).toArray, // bitset containers
      (0L until 200000L).filterNot(_ % 7 == 0).toArray, // multi-container
      Array(3L, (1L << 32) + 7L, (3L << 32) + 1L)) // empty intermediate highs
    cases.foreach { rows =>
      val (streamed, card) =
        DeletionVectors.serializeBitmapArrayStream(rows.iterator)
      assert(card == rows.length)
      assert(streamed.sameElements(DeletionVectors.serializeBitmapArray(rows)),
        s"stream/array mismatch for n=${rows.length}")
    }
    // merge-stream: old DV ∪ new deletes, dedup on ties
    val old = Array(1L, 4L, 9L, 100L)
    val fresh = Array(2L, 4L, 50L, 100L, 101L)
    val merged = DeletionVectors.mergeSortedDistinct(
      old.iterator, fresh.iterator).toArray
    assert(merged.sameElements(Array(1L, 2L, 4L, 9L, 50L, 100L, 101L)))
  }

  test("DV serializer agrees byte-for-byte with the independent fixture writer") {
    val cases = Seq(
      Array(1L, 2L, 3L, 70000L),
      (0L until 9000L).toArray,
      Array(5L, (2L << 32) + 9L))
    cases.foreach { rows =>
      assert(DeletionVectors.serializeBitmapArray(rows)
        .sameElements(DvFixtures.serializeRoaring(rows)))
    }
  }

  test("z85 encode/decode round-trip and UUID naming") {
    val b = Array.tabulate[Byte](16)(i => (i * 37 + 5).toByte)
    assert(DeletionVectors.z85Decode(DeletionVectors.z85Encode(b)).sameElements(b))
    val uuid = java.util.UUID.randomUUID()
    val enc = DeletionVectors.z85OfUuid(uuid)
    assert(enc.length == 20)
    // dvPath resolves the same uuid back out of the descriptor
    val d = DeletionVectors.Descriptor("u", enc, Some(1), 0, 0L)
    assert(DeletionVectors.dvPath("/tmp/tbl", d).getName ==
      s"deletion_vector_$uuid.bin")
  }

  // ---- Delta DML --------------------------------------------------------------

  test("delta deleteWhere: DV commit, protocol upgrade, merged re-delete") {
    val dir = newDir("graft_dml_del")
    DeltaWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    DeltaWriter.write((11L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), dir)

    val v = DeltaDml.deleteWhere(spark, dir, "id IN (3, 12)")
    assert(v == 2L)
    assert(idName(deltaRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 12L)).map(i => (i, s"n$i")))

    // the commit is protocol-shaped: remove+add per touched file, DV
    // descriptors, the feature upgrade, and the config flip
    val commit = Files.readString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000002.json"))
    assert(commit.contains("\"deletionVector\""))
    assert(commit.contains("\"storageType\":\"u\""))
    assert(commit.contains("\"minReaderVersion\":3"))
    assert(commit.contains("\"deletionVectors\""))
    assert(commit.contains("\"delta.enableDeletionVectors\":\"true\""))
    // stats ride as a JSON-escaped string, wide-bounds marker included
    assert(commit.contains("\\\"tightBounds\\\":false"))

    // a second delete on the SAME files merges into the existing DVs
    val v2 = DeltaDml.deleteWhere(spark, dir, "id IN (4, 5)")
    assert(v2 == 3L)
    assert(idName(deltaRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 4L, 5L, 12L)).map(i => (i, s"n$i")))
    // physical rows minus DV cardinality = live rows (files the deletes
    // covered ENTIRELY drop to plain removes, so they are absent here)
    val snap = DeltaLoader.snapshot(spark, dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val physical = snap.files.flatMap(_.stats)
      .map(s => mapper.readTree(s).get("numRecords").asLong()).sum
    val doomed = snap.files.flatMap(_.dv).map(_.cardinality).sum
    assert(physical - doomed == 16L, s"physical=$physical doomed=$doomed")
    // no second protocol action: the table already declares the feature
    val commit3 = Files.readString(java.nio.file.Path.of(
      dir + "/_delta_log/00000000000000000003.json"))
    assert(!commit3.contains("\"protocol\""))

    // nothing matched -> no commit
    assert(DeltaDml.deleteWhere(spark, dir, "id = 999") == -1L)

    // the DV-bearing adds survive a checkpoint fold (the loader then
    // replays from parquet, not JSON)
    DeltaWriter.checkpoint(spark, dir)
    assert(idName(deltaRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 4L, 5L, 12L)).map(i => (i, s"n$i")))
  }

  test("delta deleteWhere: a fully-deleted file drops to a plain remove") {
    val dir = newDir("graft_dml_full")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    DeltaWriter.write(Seq((3L, "c")).toDF("id", "name"), dir)
    DeltaDml.deleteWhere(spark, dir, "id <= 2")
    assert(idName(deltaRead(dir)) == Set(3L -> "c"))
    val snap = DeltaLoader.snapshot(spark, dir)
    assert(snap.files.size == 1 && snap.files.forall(_.dv.isEmpty),
      snap.files.mkString(","))
  }

  test("delta deleteWhere on a partitioned table prunes by partition literal") {
    val dir = newDir("graft_dml_part")
    val df = Seq((1L, "us", "a"), (2L, "us", "b"), (3L, "eu", "c"), (4L, "eu", "d"))
      .toDF("id", "region", "name")
    DeltaWriter.write(df, dir, partitionBy = Seq("region"))
    val v = DeltaDml.deleteWhere(spark, dir, "region = 'eu' AND id = 3")
    assert(v == 1L)
    val got = deltaRead(dir).select("id", "region", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "us", "a"), (2L, "us", "b"), (4L, "eu", "d")))
  }

  test("delta updateWhere rewrites matched rows, including partition moves") {
    val dir = newDir("graft_dml_upd")
    val df = Seq((1L, "us", 10L), (2L, "us", 20L), (3L, "eu", 30L))
      .toDF("id", "region", "score")
    DeltaWriter.write(df, dir, partitionBy = Seq("region"))
    // plain column update
    val v = DeltaDml.updateWhere(spark, dir, "id = 2",
      Map("score" -> "score + 5"))
    assert(v == 1L)
    val got = deltaRead(dir).select("id", "region", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "us", 10L), (2L, "us", 25L), (3L, "eu", 30L)))
    // partition-column update moves the row to its new partition dir
    val v2 = DeltaDml.updateWhere(spark, dir, "id = 1",
      Map("region" -> "'eu'"))
    assert(v2 == 2L)
    val got2 = deltaRead(dir).select("id", "region").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 == Set((1L, "eu"), (2L, "us"), (3L, "eu")))
    assert(DeltaDml.updateWhere(spark, dir, "id = 999",
      Map("score" -> "0")) == -1L)
  }

  test("SET assignments are simultaneous (SQL UPDATE semantics), both formats") {
    // swap two columns: every expression must see the OLD row (review
    // finding: a sequential withColumn fold made `a = b, b = a` a no-op
    // for b, with hash-arbitrary order past 4 entries)
    val dDir = newDir("graft_dml_swap_d")
    DeltaWriter.write(Seq((1L, 10L, 20L)).toDF("id", "a", "b"), dDir)
    DeltaDml.updateWhere(spark, dDir, "id = 1", Map("a" -> "b", "b" -> "a"))
    val d = DeltaLoader.load(spark, TableSource("s", dDir, Some("delta")))
      .select("a", "b").head()
    assert((d.getLong(0), d.getLong(1)) == ((20L, 10L)))

    val iDir = newDir("graft_dml_swap_i")
    IcebergWriter.write(Seq((1L, 10L, 20L)).toDF("id", "a", "b"), iDir)
    IcebergDml.updateWhere(spark, iDir, "id = 1", Map("a" -> "b", "b" -> "a"))
    val i = IcebergLoader.load(spark, TableSource("s", iDir, Some("iceberg")))
      .select("a", "b").head()
    assert((i.getLong(0), i.getLong(1)) == ((20L, 10L)))
  }

  test("empty MERGE source is a no-op on both formats") {
    val dDir = newDir("graft_dml_empty_d")
    DeltaWriter.write(Seq((1L, "a")).toDF("id", "name"), dDir)
    assert(DeltaDml.upsert(
      Seq.empty[(Long, String)].toDF("id", "name"), dDir, Seq("id")) == -1L)
    val iDir = newDir("graft_dml_empty_i")
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), iDir)
    val before = IcebergLoader.currentMetadataVersioned(
      new org.apache.hadoop.fs.Path(iDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), iDir)._2
    assert(IcebergDml.upsert(
      Seq.empty[(Long, String)].toDF("id", "name"), iDir, Seq("id")) == -1L)
    val after = IcebergLoader.currentMetadataVersioned(
      new org.apache.hadoop.fs.Path(iDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration), iDir)._2
    assert(after == before, "no junk metadata version for an empty merge")
  }

  test("delta upsert: keyed replace + insert in one commit") {
    val dir = newDir("graft_dml_ups")
    DeltaWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    val v = DeltaDml.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "name"),
      dir, Seq("id"))
    assert(v == 1L)
    assert(idName(deltaRead(dir)) == Set(1L -> "a", 2L -> "B", 3L -> "c"))
    // one commit: time travel to v0 shows the original
    assert(idName(DeltaLoader.load(spark,
      TableSource("t", dir, Some("delta"), options = Map("version" -> "0")))) ==
      Set(1L -> "a", 2L -> "b"))
  }

  test("delta compact materializes DML deletion vectors") {
    val dir = newDir("graft_dml_comp")
    DeltaWriter.write((1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    DeltaWriter.write((101L to 200L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    DeltaDml.deleteWhere(spark, dir, "id % 10 = 0")
    val expect = (1L to 200L).filterNot(_ % 10 == 0).map(i => (i, s"n$i")).toSet
    assert(idName(deltaRead(dir)) == expect)
    val cv = DeltaWriter.compact(spark, dir)
    assert(cv > 0)
    assert(idName(deltaRead(dir)) == expect)
    val snap = DeltaLoader.snapshot(spark, dir)
    assert(snap.files.forall(_.dv.isEmpty), "compaction must shed the DVs")
  }

  test("delta DML on a column-mapped table: logical predicates, physical writes") {
    // an adopted upstream name-mapped table (the DeltaLoaderSpec fixture
    // shape): data files store PHYSICAL names, partitionValues keys are
    // physical, predicates and SET expressions resolve LOGICAL names
    val dir = Files.createTempDirectory("graft_dml_cmrw").toString
    import org.apache.spark.sql.functions.col
    Seq((1L, "a"), (2L, "b")).toDF("col-id", "col-v")
      .coalesce(1).write.parquet(s"$dir/part-d1")
    Seq((3L, "c"), (4L, "d")).toDF("col-id", "col-v")
      .coalesce(1).write.parquet(s"$dir/part-d2")
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
        s""""configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}}}"""
    val logDir = new java.io.File(dir + "/_delta_log"); logDir.mkdirs()
    Files.writeString(java.nio.file.Path.of(logDir + "/00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        meta,
        s"""{"add":{"path":"${firstParquet("part-d1")}","partitionValues":{"col-ds":"d1"},"size":1,"modificationTime":1,"dataChange":true}}""",
        s"""{"add":{"path":"${firstParquet("part-d2")}","partitionValues":{"col-ds":"d2"},"size":1,"modificationTime":2,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))

    def rows(): Set[(Long, String, String)] =
      deltaRead(dir).select("id", "v", "ds").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    // DELETE: logical predicate over data + partition columns
    assert(DeltaDml.deleteWhere(spark, dir, "id = 2 AND ds = 'd1'") == 1L)
    assert(rows() == Set((1L, "a", "d1"), (3L, "c", "d2"), (4L, "d", "d2")))

    // UPDATE with a partition MOVE: the rewritten file must land physical
    assert(DeltaDml.updateWhere(spark, dir, "id = 3",
      Map("v" -> "upper(v)", "ds" -> "'d9'")) > 0)
    assert(rows() == Set((1L, "a", "d1"), (3L, "C", "d9"), (4L, "d", "d2")))
    val lastCommit = new java.io.File(dir + "/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.getName).max
    val commitText = Files.readString(
      java.nio.file.Path.of(dir + "/_delta_log/" + lastCommit))
    // match the new file by its PARTITION DIR, not a bare "d9" — a
    // parquet filename's random uuid can contain "d9" and grab the old
    // file's DV-swap add instead (seen once in CI: part-...11a816d9-...)
    val newAdd = commitText.split('\n')
      .filter(l => l.contains("\"add\"") && l.contains("col-ds=d9")).head
    assert(newAdd.contains("\"col-ds\":\"d9\""),
      s"partitionValues keys must be PHYSICAL under column mapping: $newAdd")
    assert(newAdd.contains("col-v") && !newAdd.contains("\"v\":"),
      s"stats keys must be PHYSICAL: $newAdd")

    // MERGE: replace id=4, insert id=5
    assert(DeltaDml.upsert(
      Seq((4L, "D", "d2"), (5L, "e", "d1")).toDF("id", "v", "ds"),
      dir, Seq("id")) > 0)
    assert(rows() == Set((1L, "a", "d1"), (3L, "C", "d9"), (4L, "D", "d2"),
      (5L, "e", "d1")))
    // the rewritten physical files resolve by parquet field id too
    val d9file = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("col-ds=d9")).head
    val pq = spark.read.parquet(d9file.toString)
    assert(pq.columns.toSet == Set("col-id", "col-v"), pq.columns.mkString(","))
  }

  test("DML + DV read-back survive SPACE-bearing partition values (path domains)") {
    // `_metadata.file_path` is percent-ENCODED (space -> %20) while log and
    // manifest paths are raw — every (file -> metadata) string bridge must
    // go through PartitionLayout.scanPathKey or deleted rows resurrect
    val dDir = newDir("graft_dml_sp_d")
    val df = Seq((1L, "4-NOT SPECIFIED"), (2L, "4-NOT SPECIFIED"), (3L, "1-URGENT"))
      .toDF("id", "prio")
    DeltaWriter.write(df, dDir, partitionBy = Seq("prio"))
    assert(DeltaDml.deleteWhere(spark, dDir, "id = 1") == 1L)
    val gotD = deltaRead(dDir).select("id", "prio").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotD == Set((2L, "4-NOT SPECIFIED"), (3L, "1-URGENT")))

    val iDir = newDir("graft_dml_sp_i")
    IcebergWriter.write(df, iDir, partitionBy = Seq("prio"))
    assert(IcebergDml.deleteWhere(spark, iDir, "id = 1") > 0)
    val gotI = icebergRead(iDir).select("id", "prio").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotI == Set((2L, "4-NOT SPECIFIED"), (3L, "1-URGENT")))
    // the delete file stores the MANIFEST's raw spelling, so external
    // engines match it verbatim
    val root = new org.apache.hadoop.fs.Path(iDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, iDir)
    val plan = IcebergLoader.planSnapshot(fs, iDir,
      meta, IcebergLoader.chooseSnapshot(meta, iDir, None))
    val delPaths = spark.read.parquet(plan.positionDeleteFiles: _*)
      .select("file_path").collect().map(_.getString(0))
    assert(delPaths.nonEmpty && delPaths.forall(_.contains("4-NOT SPECIFIED")),
      delPaths.mkString(","))
    // compaction still sees those files as delete-affected and rewrites
    assert(IcebergWriter.compactDataFiles(spark, iDir) > 0)
    assert(icebergRead(iDir).select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
  }

  test("big tombstone sets: executor-side decode + shuffle anti-join read identically") {
    // force the scale legs by zeroing the thresholds: Delta DV descriptors
    // decode in tasks and the anti-join stops broadcasting; the result
    // must be bit-identical to the driver/broadcast path
    val dir = newDir("graft_dml_exec")
    DeltaWriter.write((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    DeltaDml.deleteWhere(spark, dir, "id % 5 = 0")
    val expect = (1L to 50L).filterNot(_ % 5 == 0).map(i => (i, s"n$i")).toSet
    assert(idName(deltaRead(dir)) == expect) // small path
    spark.conf.set("spark.graft.dvBroadcastRows", "0")
    try assert(idName(deltaRead(dir)) == expect) // executor-decode path
    finally spark.conf.unset("spark.graft.dvBroadcastRows")

    val iDir = newDir("graft_idml_exec")
    IcebergWriter.write((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"), iDir)
    IcebergDml.deleteWhere(spark, iDir, "id % 5 = 0")
    assert(idName(icebergRead(iDir)) == expect)
    spark.conf.set("spark.graft.tombBroadcastBytes", "0")
    try assert(idName(icebergRead(iDir)) == expect) // shuffle anti-join path
    finally spark.conf.unset("spark.graft.tombBroadcastBytes")
  }

  // ---- Iceberg DML ------------------------------------------------------------

  test("iceberg deleteWhere: position-delete snapshot round-trips") {
    val dir = newDir("graft_idml_del")
    IcebergWriter.write((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergWriter.write((11L to 20L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val v = IcebergDml.deleteWhere(spark, dir, "id IN (3, 12)")
    assert(v > 0)
    assert(idName(icebergRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 12L)).map(i => (i, s"n$i")))
    // the delete landed as a content=1 manifest of parquet position deletes
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val snap = IcebergLoader.chooseSnapshot(meta, dir, None)
    val plan = IcebergLoader.planSnapshot(fs, dir, meta, snap)
    assert(plan.positionDeleteFiles.nonEmpty)
    assert(snap.get.get("summary").get("operation").asText() == "delete")
    // delete files carry the spec's reserved field ids
    val fz = spark.read.parquet(plan.positionDeleteFiles.head)
    assert(fz.columns.toSet == Set("file_path", "pos"))
    // repeated delete merges at read time (two delete manifests)
    IcebergDml.deleteWhere(spark, dir, "id = 4")
    assert(idName(icebergRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 4L, 12L)).map(i => (i, s"n$i")))
    assert(IcebergDml.deleteWhere(spark, dir, "id = 999") == -1L)
  }

  test("iceberg updateWhere + upsert on a partitioned table") {
    val dir = newDir("graft_idml_upd")
    val df = Seq((1L, "us", 10L), (2L, "us", 20L), (3L, "eu", 30L))
      .toDF("id", "region", "score")
    IcebergWriter.write(df, dir, partitionBy = Seq("region"))
    val v = IcebergDml.updateWhere(spark, dir, "id = 2",
      Map("score" -> "score + 5"))
    assert(v > 0)
    val got = icebergRead(dir).select("id", "region", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "us", 10L), (2L, "us", 25L), (3L, "eu", 30L)))
    // partition move through update
    IcebergDml.updateWhere(spark, dir, "id = 1", Map("region" -> "'eu'"))
    val got2 = icebergRead(dir).select("id", "region").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 == Set((1L, "eu"), (2L, "us"), (3L, "eu")))
    // upsert: replace id=3, insert id=4
    val v3 = IcebergDml.upsert(
      Seq((3L, "eu", 99L), (4L, "ap", 40L)).toDF("id", "region", "score"),
      dir, Seq("id"))
    assert(v3 > 0)
    val got3 = icebergRead(dir).select("id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == Set((1L, 10L), (2L, 25L), (3L, 99L), (4L, 40L)))
    assert(IcebergDml.updateWhere(spark, dir, "id = 999",
      Map("score" -> "0")) == -1L)
  }

  test("upsertByEquality: replace-by-key with zero target scan") {
    val dir = newDir("graft_idml_eq")
    IcebergWriter.write((1L to 6L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    val src = Seq((2L, "TWO"), (3L, "THREE"), (9L, "nine")).toDF("id", "name")
    val v = IcebergDml.upsertByEquality(src, dir, Seq("id"))
    assert(v > 0)
    val expect = Set((1L, "n1"), (2L, "TWO"), (3L, "THREE"), (4L, "n4"),
      (5L, "n5"), (6L, "n6"), (9L, "nine"))
    assert(idName(icebergRead(dir)) == expect)
    // the commit is an equality-delete file with the key's field id
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plan() = {
      val meta = IcebergLoader.currentMetadata(fs, dir)
      IcebergLoader.planSnapshot(fs, dir, meta,
        IcebergLoader.chooseSnapshot(meta, dir, None))
    }
    val p1 = plan()
    assert(p1.positionDeleteFiles.isEmpty, "no position deletes — no target scan")
    assert(p1.equalityDeleteFiles.nonEmpty)
    assert(p1.equalityDeleteFiles.forall(_.equalityIds == Seq(1)),
      p1.equalityDeleteFiles.map(_.equalityIds).mkString(","))

    // the SEQUENCE RULE: a later append with a matching key SURVIVES (the
    // delete applies only to strictly-older data)
    IcebergWriter.write(Seq((2L, "again")).toDF("id", "name"), dir)
    assert(idName(icebergRead(dir)) == expect + ((2L, "again")))

    // position-path upsert on a twin table produces the same rows
    val dir2 = newDir("graft_idml_eq2")
    IcebergWriter.write((1L to 6L).map(i => (i, s"n$i")).toDF("id", "name"), dir2)
    IcebergDml.upsert(src, dir2, Seq("id"))
    assert(idName(icebergRead(dir2)) == expect,
      "equality-path and position-path upserts must agree")

    // compaction materializes the equality deletes
    assert(IcebergWriter.compactDataFiles(spark, dir) > 0)
    assert(!plan().hasDeletes, "compaction must shed the equality deletes")
    assert(idName(icebergRead(dir)) == expect + ((2L, "again")))

    // empty source is a no-op
    assert(IcebergDml.upsertByEquality(
      Seq.empty[(Long, String)].toDF("id", "name"), dir, Seq("id")) == -1L)
  }

  test("portable-64 serializer round-trips (the iceberg v3 DV form)") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L, 1L, 5L),
      (0L until 5000L).map(_ * 2).toArray,
      Array(3L, (7L << 32) + 9L)) // SPARSE high keys (explicit, not implicit)
    cases.foreach { rows =>
      val data = DeletionVectors.serializePortable64(rows)
      assert(DeletionVectors.deserializePortable64(data).sameElements(rows))
    }
  }

  test("iceberg v3: deletes land as puffin DVs, merged to one per file") {
    val dir = newDir("graft_idml_v3")
    IcebergWriter.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    // promote the table to format v3 (the writer creates v2; v3 DELETES
    // must then come out as deletion vectors, not position-delete parquet)
    val metaFile = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    Files.writeString(metaFile.toPath, Files.readString(metaFile.toPath)
      .replace("\"format-version\":2", "\"format-version\":3"))
    // the hadoop checksum sidecar now disagrees with the edited bytes
    new java.io.File(metaFile.getParent, "." + metaFile.getName + ".crc").delete()

    val v = IcebergDml.deleteWhere(spark, dir, "id IN (3, 7)")
    assert(v > 0)
    assert(idName(icebergRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 7L)).map(i => (i, s"n$i")))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plan() = {
      val meta = IcebergLoader.currentMetadata(fs, dir)
      IcebergLoader.planSnapshot(fs, dir, meta,
        IcebergLoader.chooseSnapshot(meta, dir, None))
    }
    val p1 = plan()
    assert(p1.positionDeleteFiles.isEmpty, "v3 must not add position deletes")
    assert(p1.deletionVectors.size == 1, p1.deletionVectors.mkString(","))
    // the blob is readable straight off the manifest pointer
    val dv1 = p1.deletionVectors.head
    assert(DeletionVectors.readIcebergDv(fs,
      new org.apache.hadoop.fs.Path(dv1.puffinPath),
      dv1.contentOffset, dv1.contentSize).length == 2)

    // a second delete on the SAME file must MERGE: still exactly one live
    // DV for the file (the old one superseded out of the carried manifest)
    assert(IcebergDml.deleteWhere(spark, dir, "id = 4") > 0)
    assert(idName(icebergRead(dir)) ==
      ((1L to 20L).toSet -- Set(3L, 4L, 7L)).map(i => (i, s"n$i")))
    val p2 = plan()
    assert(p2.deletionVectors.size == 1,
      s"one live DV per file, got ${p2.deletionVectors.size}")
    val dv2 = p2.deletionVectors.head
    assert(DeletionVectors.readIcebergDv(fs,
      new org.apache.hadoop.fs.Path(dv2.puffinPath),
      dv2.contentOffset, dv2.contentSize).length == 3)

    // v3 UPDATE: DV-delete + rewrite in one snapshot
    assert(IcebergDml.updateWhere(spark, dir, "id = 5",
      Map("name" -> "'updated'")) > 0)
    val got = icebergRead(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((5L, "updated")) && !got.contains((5L, "n5")))
  }

  test("iceberg v3 DML migrates v2 position deletes into the merged DVs") {
    val dir = newDir("graft_idml_mig")
    IcebergWriter.write((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1), dir)
    // v2-era position deletes first...
    IcebergDml.deleteWhere(spark, dir, "id = 2")
    // ...then the table upgrades to v3
    val metaFile = new java.io.File(dir + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    Files.writeString(metaFile.toPath, Files.readString(metaFile.toPath)
      .replace("\"format-version\":2", "\"format-version\":3"))
    new java.io.File(metaFile.getParent, "." + metaFile.getName + ".crc").delete()

    // a v3 delete must ABSORB the v2 position deletes: afterwards the
    // snapshot carries DVs only (both forms live for one file would
    // violate the spec external readers enforce)
    assert(IcebergDml.deleteWhere(spark, dir, "id = 9") > 0)
    assert(idName(icebergRead(dir)) ==
      ((1L to 20L).toSet -- Set(2L, 9L)).map(i => (i, s"n$i")))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val plan = IcebergLoader.planSnapshot(fs, dir,
      meta, IcebergLoader.chooseSnapshot(meta, dir, None))
    assert(plan.positionDeleteFiles.isEmpty,
      "v2 position deletes must retire after the migration")
    assert(plan.deletionVectors.size == 1)
    val dv = plan.deletionVectors.head
    assert(DeletionVectors.readIcebergDv(fs,
      new org.apache.hadoop.fs.Path(dv.puffinPath),
      dv.contentOffset, dv.contentSize).length == 2) // ids 2 and 9
    // and a no-match v3 delete stays a NO-OP even with migration pending
    val dir2 = newDir("graft_idml_mig2")
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir2)
    IcebergDml.deleteWhere(spark, dir2, "id = 1") // v2 pos delete
    val mf2 = new java.io.File(dir2 + "/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    Files.writeString(mf2.toPath, Files.readString(mf2.toPath)
      .replace("\"format-version\":2", "\"format-version\":3"))
    new java.io.File(mf2.getParent, "." + mf2.getName + ".crc").delete()
    assert(IcebergDml.deleteWhere(spark, dir2, "id = 999") == -1L)
  }

  test("no-match v2 delete leaves no orphan delete files in data/") {
    val dir = newDir("graft_idml_noorph")
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    assert(IcebergDml.deleteWhere(spark, dir, "id = 999") == -1L)
    val leftovers = new java.io.File(dir + "/data").listFiles()
      .map(_.getName).filter(_.startsWith("delete-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("iceberg compaction materializes DML position deletes") {
    val dir = newDir("graft_idml_comp")
    IcebergWriter.write((1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergWriter.write((101L to 200L).map(i => (i, s"n$i")).toDF("id", "name"), dir)
    IcebergDml.deleteWhere(spark, dir, "id % 10 = 0")
    val expect = (1L to 200L).filterNot(_ % 10 == 0).map(i => (i, s"n$i")).toSet
    assert(idName(icebergRead(dir)) == expect)
    val cv = IcebergWriter.compactDataFiles(spark, dir)
    assert(cv > 0)
    assert(idName(icebergRead(dir)) == expect)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = IcebergLoader.currentMetadata(fs, dir)
    val plan = IcebergLoader.planSnapshot(fs, dir,
      meta, IcebergLoader.chooseSnapshot(meta, dir, None))
    assert(!plan.hasDeletes, "compaction must shed the delete files")
  }
}
