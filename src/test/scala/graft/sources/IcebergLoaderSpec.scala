package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Iceberg reader over byte-built fixtures: metadata JSON + Avro manifest
  * lists/manifests written directly from the public spec (the
  * DeltaLoaderSpec discipline — no iceberg library exists offline, which
  * is also what keeps the reader honest against the WIRE format rather
  * than a client API). */
/** Byte-built Iceberg fixture helpers, shared with the served-table e2e
  * (graft.server.ServedLoadersSpec). */
trait IcebergFixtures { this: SparkSpec =>

  // ---- fixture building -----------------------------------------------------

  def newTableDir(): String =
    Files.createTempDirectory("graft_iceberg").toString

  /** Writes df as ONE parquet file at exactly `target`. */
  def writeDataFile(df: DataFrame, target: File): Unit = {
    val tmp = Files.createTempDirectory("ice_pq").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("no part file written"))
    target.getParentFile.mkdirs()
    Files.move(part.toPath, target.toPath, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def writeAvro(schema: Schema, recs: Seq[GenericRecord], target: File): Unit = {
    target.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, target)
    recs.foreach(w.append)
    w.close()
  }

  /** v2 manifest entry schema — the spec fields the reader consumes plus
    * the always-present bookkeeping ones. */
  val manifestSchemaV2: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)

  /** v1 manifest entry schema — no content fields anywhere. */
  val manifestSchemaV1: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  val manifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  def entryV2(status: Int, content: Int, path: String,
              format: String = "PARQUET", seq: Option[Long] = None,
              equalityIds: Seq[Int] = Seq.empty): GenericRecord = {
    val e = new GenericData.Record(manifestSchemaV2)
    val d = new GenericData.Record(manifestSchemaV2.getField("data_file").schema())
    d.put("content", content)
    d.put("file_path", path)
    d.put("file_format", format)
    d.put("record_count", 0L)
    d.put("file_size_in_bytes", 0L)
    if (equalityIds.nonEmpty)
      d.put("equality_ids",
        java.util.Arrays.asList(equalityIds.map(Int.box): _*))
    e.put("status", status)
    seq.foreach(s => e.put("sequence_number", Long.box(s)))
    e.put("data_file", d)
    e
  }

  def entryV1(status: Int, path: String): GenericRecord = {
    val e = new GenericData.Record(manifestSchemaV1)
    val d = new GenericData.Record(manifestSchemaV1.getField("data_file").schema())
    d.put("file_path", path)
    d.put("file_format", "PARQUET")
    d.put("record_count", 0L)
    d.put("file_size_in_bytes", 0L)
    e.put("status", status)
    e.put("data_file", d)
    e
  }

  def listEntry(path: String, content: Int, snap: Long = 1L): GenericRecord = {
    val m = new GenericData.Record(manifestListSchema)
    m.put("manifest_path", path)
    m.put("manifest_length", 0L)
    m.put("partition_spec_id", 0)
    m.put("content", content)
    m.put("added_snapshot_id", snap)
    m
  }

  /** v3 manifest entry schema: v2 plus the deletion-vector locator
    * fields. */
  val manifestSchemaV3: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
      |  {"name":"referenced_data_file","type":["null","string"],"default":null},
      |  {"name":"content_offset","type":["null","long"],"default":null},
      |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}]}}]}""".stripMargin)

  def entryDv(puffinPath: String, referenced: String, offset: Long,
              size: Long): GenericRecord = {
    val e = new GenericData.Record(manifestSchemaV3)
    val d = new GenericData.Record(manifestSchemaV3.getField("data_file").schema())
    d.put("content", 1)
    d.put("file_path", puffinPath)
    d.put("file_format", "PUFFIN")
    d.put("record_count", 0L)
    d.put("file_size_in_bytes", 0L)
    d.put("referenced_data_file", referenced)
    d.put("content_offset", Long.box(offset))
    d.put("content_size_in_bytes", Long.box(size))
    e.put("status", 1)
    e.put("data_file", d)
    e
  }

  def entryV3Data(path: String): GenericRecord = {
    val e = new GenericData.Record(manifestSchemaV3)
    val d = new GenericData.Record(manifestSchemaV3.getField("data_file").schema())
    d.put("content", 0)
    d.put("file_path", path)
    d.put("file_format", "PARQUET")
    d.put("record_count", 0L)
    d.put("file_size_in_bytes", 0L)
    e.put("status", 1)
    e.put("data_file", d)
    e
  }

  // ---- byte-built Puffin deletion vectors (iceberg spec §Deletion
  // vectors + the Puffin file spec; RoaringFormatSpec portable-64) --------

  private def i16le(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def i32le(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def i32be(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4).putInt(v).array()
  private def i64le(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** Serialize values as the portable 64-bit roaring form: u64 LE bucket
    * count, per bucket u32 LE high key + a 32-bit portable bitmap (cookie
    * 12346, array containers). */
  def roaringPortable64(values: Seq[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buckets = values.distinct.sorted.groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    out.write(i64le(buckets.length.toLong))
    buckets.foreach { case (hi, vs) =>
      out.write(i32le(hi))
      val containers = vs.map(v => (v & 0xFFFFFFFFL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      out.write(i32le(12346)) // SERIAL_COOKIE_NO_RUNCONTAINER
      out.write(i32le(containers.length))
      containers.foreach { case (key, cvs) =>
        out.write(i16le(key)); out.write(i16le(cvs.length - 1))
      }
      // offsets from the start of this 32-bit bitmap's serialization
      var off = 4 + 4 + 4 * containers.length + 4 * containers.length
      containers.foreach { case (_, cvs) =>
        out.write(i32le(off))
        off += (if (cvs.length > 4096) 8192 else 2 * cvs.length)
      }
      containers.foreach { case (_, cvs) =>
        if (cvs.length > 4096) {
          // bitmap container: 1024 x u64 little-endian bitset words
          val words = new Array[Long](1024)
          cvs.foreach { v =>
            val low = v & 0xFFFF
            words(low >>> 6) |= (1L << (low & 63))
          }
          words.foreach(w => out.write(i64le(w)))
        } else cvs.sorted.foreach(v => out.write(i16le(v & 0xFFFF)))
      }
    }
    out.toByteArray
  }

  /** One DV blob: [len BE][magic D1D33964][vector][crc32 BE of magic+vector]. */
  def dvBlob(rowIndexes: Seq[Long]): Array[Byte] = {
    val vector = roaringPortable64(rowIndexes)
    val magic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)
    val body = magic ++ vector
    val crc = new java.util.zip.CRC32(); crc.update(body)
    i32be(body.length) ++ body ++ i32be(crc.getValue.toInt)
  }

  /** A Puffin file holding the given blobs; returns (bytes,
    * per-blob (offset, size)). Footer: magic + JSON payload + size LE +
    * flags(0) + magic, per the Puffin spec. */
  def puffinFile(blobs: Seq[Array[Byte]]): (Array[Byte], Seq[(Long, Long)]) = {
    val out = new java.io.ByteArrayOutputStream()
    val magic = "PFA1".getBytes("UTF-8")
    out.write(magic)
    val locs = blobs.map { b =>
      val off = out.size().toLong
      out.write(b)
      (off, b.length.toLong)
    }
    val payload = ("{\"blobs\":[" + locs.map { case (o, l) =>
      s"""{"type":"deletion-vector-v1","fields":[],"offset":$o,"length":$l}"""
    }.mkString(",") + "]}").getBytes("UTF-8")
    out.write(magic)
    out.write(payload)
    out.write(i32le(payload.length))
    out.write(Array[Byte](0, 0, 0, 0)) // flags: footer payload uncompressed
    out.write(magic)
    (out.toByteArray, locs)
  }

  def metadataV3(dir: String, snapshots: String, currentId: Long): String =
    metadataV2(dir, snapshots, currentId)
      .replaceFirst("\"format-version\":2", "\"format-version\":3")

  /** v3 fixture: two data files plus one Puffin with a DV per data file
    * (drop a.parquet row 1 = id 2, b.parquet row 0 = id 4 — mirroring the
    * v2 position-delete fixture so the two mechanisms are comparable). */
  def buildV3Table(): String = {
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    val f2 = s"$dir/data/b.parquet"
    writeDataFile(docs((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)),
      new File(f1))
    writeDataFile(docs((4L, "delta", 4.5), (5L, "epsilon", 5.5)), new File(f2))
    val (puffin, locs) = puffinFile(Seq(dvBlob(Seq(1L)), dvBlob(Seq(0L))))
    val puffinPath = s"$dir/data/deletes.puffin"
    new File(puffinPath).getParentFile.mkdirs()
    Files.write(new File(puffinPath).toPath, puffin)
    writeAvro(manifestSchemaV3,
      Seq(entryV3Data(f1), entryV3Data(f2)),
      new File(s"$dir/metadata/m0.avro"))
    writeAvro(manifestSchemaV3,
      Seq(entryDv(puffinPath, f1, locs(0)._1, locs(0)._2),
        entryDv(puffinPath, f2, locs(1)._1, locs(1)._2)),
      new File(s"$dir/metadata/m1.avro"))
    writeAvro(manifestListSchema,
      Seq(listEntry(s"$dir/metadata/m0.avro", content = 0),
        listEntry(s"$dir/metadata/m1.avro", content = 1)),
      new File(s"$dir/metadata/snap-1.avro"))
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataV3(dir,
        s"""{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
           |"manifest-list":"$dir/metadata/snap-1.avro",
           |"summary":{"operation":"append"}}""".stripMargin, currentId = 1L))
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    dir
  }

  val schemaFieldsJson =
    """[{"id":1,"name":"id","required":true,"type":"long"},
      |{"id":2,"name":"name","required":false,"type":"string"},
      |{"id":3,"name":"score","required":false,"type":"double"}]""".stripMargin

  def metadataV2(dir: String, snapshots: String, currentId: Long): String =
    s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-000000000001",
       |"location":"$dir","last-sequence-number":1,"last-updated-ms":0,
       |"last-column-id":3,
       |"current-schema-id":0,
       |"schemas":[{"type":"struct","schema-id":0,"fields":$schemaFieldsJson}],
       |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
       |"last-partition-id":999,"default-sort-order-id":0,
       |"sort-orders":[{"order-id":0,"fields":[]}],
       |"current-snapshot-id":$currentId,
       |"snapshots":[$snapshots]}""".stripMargin

  def rows(df: DataFrame): Set[(Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  def docs(xs: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    xs.toDF("id", "name", "score")
      .select(col("id"), col("name"), col("score"))
  }

  def load(dir: String, opts: Map[String, String] = Map.empty): DataFrame =
    Loaders.load(spark, TableSource("ice_t", dir, Some("iceberg"), options = opts))

  /** The standard two-file v2 fixture; returns (dir, data paths). */
  def buildV2Table(withDeletes: Boolean = false): String = {
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    val f2 = s"$dir/data/b.parquet"
    writeDataFile(docs((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5)),
      new File(f1))
    writeDataFile(docs((4L, "delta", 4.5), (5L, "epsilon", 5.5)), new File(f2))
    writeAvro(manifestSchemaV2,
      Seq(entryV2(1, 0, f1), entryV2(1, 0, f2)),
      new File(s"$dir/metadata/m0.avro"))
    val manifests = Seq.newBuilder[GenericRecord]
    manifests += listEntry(s"$dir/metadata/m0.avro", content = 0)
    if (withDeletes) {
      // position delete file: drop (a.parquet, pos 1) = id 2 and
      // (b.parquet, pos 0) = id 4
      import spark.implicits._
      writeDataFile(
        Seq((f1, 1L), (f2, 0L)).toDF("file_path", "pos"),
        new File(s"$dir/data/del0.parquet"))
      writeAvro(manifestSchemaV2,
        Seq(entryV2(1, 1, s"$dir/data/del0.parquet")),
        new File(s"$dir/metadata/m1.avro"))
      manifests += listEntry(s"$dir/metadata/m1.avro", content = 1)
    }
    writeAvro(manifestListSchema, manifests.result(),
      new File(s"$dir/metadata/snap-1.avro"))
    val meta = metadataV2(dir,
      s"""{"snapshot-id":1,"sequence-number":1,"timestamp-ms":0,
         |"manifest-list":"$dir/metadata/snap-1.avro",
         |"summary":{"operation":"append"}}""".stripMargin, currentId = 1L)
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath, meta)
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    dir
  }

}

/** Iceberg reader over byte-built fixtures (see [[IcebergFixtures]]). */
class IcebergLoaderSpec extends SparkSpec with IcebergFixtures {

  test("v2 table: schema from metadata JSON, rows from manifest-listed parquet") {
    // required/optional fidelity lives in the converted table schema; the
    // scan itself reads nullable like every Spark file source
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = buildV2Table()
    assert(IcebergLoader.tableSchema(IcebergLoader.currentMetadata(fs, dir)) ===
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("score", DoubleType, nullable = true))))
    val df = load(dir)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("id", LongType), ("name", StringType), ("score", DoubleType)))
    assert(rows(df) === Set((1L, "alpha", 1.5), (2L, "beta", 2.5),
      (3L, "gamma", 3.5), (4L, "delta", 4.5), (5L, "epsilon", 5.5)))
  }

  test("manifest entries with status DELETED are not part of the snapshot") {
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    val f2 = s"$dir/data/b.parquet"
    writeDataFile(docs((1L, "keep", 1.0)), new File(f1))
    writeDataFile(docs((2L, "gone", 2.0)), new File(f2))
    writeAvro(manifestSchemaV2,
      Seq(entryV2(0, 0, f1), entryV2(2, 0, f2)), // status 2 = DELETED
      new File(s"$dir/metadata/m0.avro"))
    writeAvro(manifestListSchema, Seq(listEntry(s"$dir/metadata/m0.avro", 0)),
      new File(s"$dir/metadata/snap-1.avro"))
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataV2(dir,
        s"""{"snapshot-id":1,"manifest-list":"$dir/metadata/snap-1.avro"}""",
        currentId = 1L))
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    assert(rows(load(dir)) === Set((1L, "keep", 1.0)))
  }

  test("v2 position deletes remove exactly the tombstoned (file, row) pairs") {
    val df = load(buildV2Table(withDeletes = true))
    // a.parquet pos 1 (id 2) and b.parquet pos 0 (id 4) are deleted
    assert(rows(df) === Set((1L, "alpha", 1.5), (3L, "gamma", 3.5),
      (5L, "epsilon", 5.5)))
  }

  test("v3 deletion vectors: puffin blobs remove the referenced (file, row) pairs") {
    val df = load(buildV3Table())
    // same tombstones as the v2 fixture: a.parquet row 1 (id 2) and
    // b.parquet row 0 (id 4)
    assert(rows(df) === Set((1L, "alpha", 1.5), (3L, "gamma", 3.5),
      (5L, "epsilon", 5.5)))
  }

  test("v3 deletion vectors: executor-side blob decode reads identically") {
    // zero the driver-decode budget: the blob pointers ship to tasks and
    // the tombstones never materialize on the driver — same rows
    val dir = buildV3Table()
    spark.conf.set("spark.graft.dvDriverDecodeBytes", "0")
    spark.conf.set("spark.graft.tombBroadcastBytes", "0")
    try assert(rows(load(dir)) === Set((1L, "alpha", 1.5), (3L, "gamma", 3.5),
      (5L, "epsilon", 5.5)))
    finally {
      spark.conf.unset("spark.graft.dvDriverDecodeBytes")
      spark.conf.unset("spark.graft.tombBroadcastBytes")
    }
  }

  test("v3 deletion vector blobs validate magic, checksum and length") {
    // corrupting one payload byte must fail the CRC check loudly
    val dir = buildV3Table()
    val p = new File(s"$dir/data/deletes.puffin").toPath
    val bytes = Files.readAllBytes(p)
    bytes(12) = (bytes(12) ^ 0x1).toByte // inside the first blob's vector
    Files.write(p, bytes)
    val e = intercept[Exception](rows(load(dir)))
    assert(String.valueOf(e.getMessage).contains("checksum") ||
      String.valueOf(e.getMessage).contains("magic"), e.getMessage)
  }

  test("portable-64 roaring round-trips across container shapes") {
    // array container, bitmap container (>4096 values), multiple high
    // buckets — the decoder must reproduce every index exactly
    val big = (0L until 5000L).map(_ * 2) // forces a bitmap container
    val cases = Seq(
      Seq(0L), Seq(1L, 2L, 65535L, 65536L), // two 16-bit containers
      Seq(5L, (1L << 32) | 7L, (3L << 32)), // multiple high buckets
      big)
    cases.foreach { vs =>
      val got = DeletionVectors.deserializePortable64(roaringPortable64(vs))
      assert(got.toSeq == vs.distinct.sorted, s"case size ${vs.size}")
    }
  }

  test("v1 table: legacy schema field and inline snapshot manifests") {
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    writeDataFile(docs((7L, "v1row", 7.0)), new File(f1))
    writeAvro(manifestSchemaV1, Seq(entryV1(1, f1)),
      new File(s"$dir/metadata/m0.avro"))
    val meta =
      s"""{"format-version":1,"table-uuid":"00000000-0000-0000-0000-000000000002",
         |"location":"$dir","last-updated-ms":0,"last-column-id":3,
         |"schema":{"type":"struct","fields":$schemaFieldsJson},
         |"partition-spec":[],
         |"current-snapshot-id":9,
         |"snapshots":[{"snapshot-id":9,"timestamp-ms":0,
         |  "manifests":["$dir/metadata/m0.avro"]}]}""".stripMargin
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath, meta)
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    assert(rows(load(dir)) === Set((7L, "v1row", 7.0)))
  }

  /** Table with one data file (seq `dataSeq`) and one equality-delete file
    * (seq `delSeq`) tombstoning on the given columns/values. */
  private def eqDeleteTable(dataSeq: Long, delSeq: Long, ids: Seq[Int],
                            delRows: DataFrame): String = {
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    writeDataFile(docs((1L, "alpha", 1.0), (2L, "beta", 2.0), (3L, null, 3.0)),
      new File(f1))
    writeDataFile(delRows, new File(s"$dir/data/eq0.parquet"))
    writeAvro(manifestSchemaV2, Seq(entryV2(1, 0, f1, seq = Some(dataSeq))),
      new File(s"$dir/metadata/m0.avro"))
    writeAvro(manifestSchemaV2,
      Seq(entryV2(1, 2, s"$dir/data/eq0.parquet", seq = Some(delSeq),
        equalityIds = ids)),
      new File(s"$dir/metadata/m1.avro"))
    writeAvro(manifestListSchema,
      Seq(listEntry(s"$dir/metadata/m0.avro", 0),
        listEntry(s"$dir/metadata/m1.avro", 1)),
      new File(s"$dir/metadata/snap-1.avro"))
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataV2(dir,
        s"""{"snapshot-id":1,"manifest-list":"$dir/metadata/snap-1.avro"}""",
        currentId = 1L))
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    dir
  }

  test("equality deletes remove value-matched rows (anti-join on equality_ids)") {
    import spark.implicits._
    // equality_ids [1] = the `id` column; tombstone id 2
    val dir = eqDeleteTable(dataSeq = 1L, delSeq = 2L, ids = Seq(1),
      delRows = Seq(Tuple1(2L)).toDF("id"))
    assert(rows(load(dir)).map(r => (r._1, r._3)) === Set((1L, 1.0), (3L, 3.0)))
  }

  test("equality deletes are null-safe: a null tombstone matches null values") {
    // equality_ids [2] = `name`; delete the row whose name is NULL
    val dir = eqDeleteTable(dataSeq = 1L, delSeq = 2L, ids = Seq(2),
      delRows = docs((0L, null, 0.0)).select(org.apache.spark.sql.functions.col("name")))
    assert(rows(load(dir)).map(_._1) === Set(1L, 2L))
  }

  test("equality deletes respect sequence numbers: an older delete cannot touch newer data") {
    import spark.implicits._
    // delete seq == data seq: strictly-greater rule says NOT applied (the
    // rule that lets a deleted value be re-inserted by a later append)
    val dir = eqDeleteTable(dataSeq = 2L, delSeq = 2L, ids = Seq(1),
      delRows = Seq(Tuple1(2L)).toDF("id"))
    assert(rows(load(dir)).map(_._1) === Set(1L, 2L, 3L))
  }

  test("equality deletes still apply when the metadata location is file://-spelled") {
    import spark.implicits._
    // pins the review question: the sequence-number map joins on the SAME
    // remap-normalized paths the scan plans, so a writer's file:// spelling
    // cannot desynchronize the join and resurrect deleted rows
    val dir = eqDeleteTable(dataSeq = 1L, delSeq = 2L, ids = Seq(1),
      delRows = Seq(Tuple1(2L)).toDF("id"))
    val metaFile = new File(s"$dir/metadata/v1.metadata.json")
    Files.writeString(metaFile.toPath,
      Files.readString(metaFile.toPath)
        .replace("\"location\":\"" + dir + "\"", "\"location\":\"file://" + dir + "\""))
    assert(rows(load(dir)).map(_._1) === Set(1L, 3L))
  }

  test("equality delete on an unknown field id fails loudly") {
    import spark.implicits._
    val dir = eqDeleteTable(dataSeq = 1L, delSeq = 2L, ids = Seq(99),
      delRows = Seq(Tuple1(2L)).toDF("id"))
    val e = intercept[IllegalArgumentException](load(dir).collect())
    assert(e.getMessage.contains("field id 99"))
  }

  test("equality deletes: broadcast and shuffle key-relation legs agree exactly") {
    import spark.implicits._
    // the q_delta_cdf_synth_dist pattern: force the broadcast bound to
    // refuse so the shuffled join leg EXECUTES (the 100M-key CDC
    // checkpoint shape) and must match the broadcast leg byte-for-byte
    val dir = eqDeleteTable(dataSeq = 1L, delSeq = 2L, ids = Seq(1),
      delRows = Seq(Tuple1(2L)).toDF("id"))
    val viaBroadcast = rows(load(dir))
    val viaShuffle =
      try {
        spark.conf.set("spark.graft.eqDeleteBroadcastBytes", "-1")
        rows(load(dir))
      } finally spark.conf.unset("spark.graft.eqDeleteBroadcastBytes")
    assert(viaBroadcast == viaShuffle)
    assert(viaBroadcast.map(_._1) === Set(1L, 3L))
  }

  test("changelog: one snapshot with TWO equality_ids groups emits each pre-image once") {
    import spark.implicits._
    // snapshot 1 appends three rows; snapshot 2 adds two eq-delete files
    // with DIFFERENT equality_ids sets — ids=[1] (id=2) and ids=[2]
    // (name='beta') — both matching the SAME parent row. The changelog
    // must emit that row's delete ONCE, not once per group (review
    // finding: no cross-group dedup).
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    writeDataFile(docs((1L, "alpha", 1.0), (2L, "beta", 2.0), (3L, "gamma", 3.0)),
      new File(f1))
    writeDataFile(Seq(Tuple1(2L)).toDF("id"), new File(s"$dir/data/eq1.parquet"))
    writeDataFile(Seq(Tuple1("beta")).toDF("name"),
      new File(s"$dir/data/eq2.parquet"))
    writeAvro(manifestSchemaV2, Seq(entryV2(1, 0, f1, seq = Some(1L))),
      new File(s"$dir/metadata/m0.avro"))
    writeAvro(manifestSchemaV2,
      Seq(entryV2(1, 2, s"$dir/data/eq1.parquet", seq = Some(2L),
          equalityIds = Seq(1)),
        entryV2(1, 2, s"$dir/data/eq2.parquet", seq = Some(2L),
          equalityIds = Seq(2))),
      new File(s"$dir/metadata/m1.avro"))
    writeAvro(manifestListSchema,
      Seq(listEntry(s"$dir/metadata/m0.avro", 0, snap = 1L)),
      new File(s"$dir/metadata/snap-1.avro"))
    writeAvro(manifestListSchema,
      Seq(listEntry(s"$dir/metadata/m0.avro", 0, snap = 1L),
        listEntry(s"$dir/metadata/m1.avro", 1, snap = 2L)),
      new File(s"$dir/metadata/snap-2.avro"))
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataV2(dir,
        s"""{"snapshot-id":1,"sequence-number":1,"timestamp-ms":1000,
           |"manifest-list":"$dir/metadata/snap-1.avro",
           |"summary":{"operation":"append"}},
           |{"snapshot-id":2,"sequence-number":2,"timestamp-ms":2000,
           |"manifest-list":"$dir/metadata/snap-2.avro",
           |"summary":{"operation":"delete"}}""".stripMargin,
        currentId = 2L))
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    val changes = IcebergIncremental.changesBetween(spark, dir, -1L,
      equalityNetChanges = true)
    val got = changes.select("id", "name", "_change_type", "_snapshot_id")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got.count(x => x._1 == 2L && x._3 == "delete") == 1,
      s"row 2 matched by two equality_ids groups must delete ONCE: $got")
    assert(got.toSet == Set(
      (1L, "alpha", "insert", 1L), (2L, "beta", "insert", 1L),
      (3L, "gamma", "insert", 1L), (2L, "beta", "delete", 2L)), got.toString)
    // the live read agrees: only rows 1 and 3 remain
    assert(rows(load(dir)).map(_._1) === Set(1L, 3L))
  }

  test("time travel reads with the snapshot's own schema-id, not the current one") {
    // snapshot 1 wrote under schema 0 (3 columns); the table then evolved to
    // schema 1 (adds `extra`) and snapshot 2 is current. Reading snapshot 1
    // must yield the OLD shape (round-10 advice).
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    val f2 = s"$dir/data/b.parquet"
    writeDataFile(docs((1L, "first", 1.0)), new File(f1))
    import spark.implicits._
    writeDataFile(Seq((2L, "second", 2.0, "x")).toDF("id", "name", "score", "extra"),
      new File(f2))
    writeAvro(manifestSchemaV2, Seq(entryV2(1, 0, f1)),
      new File(s"$dir/metadata/m0.avro"))
    writeAvro(manifestSchemaV2, Seq(entryV2(0, 0, f1), entryV2(1, 0, f2)),
      new File(s"$dir/metadata/m1.avro"))
    writeAvro(manifestListSchema, Seq(listEntry(s"$dir/metadata/m0.avro", 0)),
      new File(s"$dir/metadata/snap-1.avro"))
    writeAvro(manifestListSchema, Seq(listEntry(s"$dir/metadata/m1.avro", 0, 2L)),
      new File(s"$dir/metadata/snap-2.avro"))
    val schema1 = schemaFieldsJson.stripSuffix("]") +
      """,{"id":4,"name":"extra","required":false,"type":"string"}]"""
    val meta =
      s"""{"format-version":2,"table-uuid":"00000000-0000-0000-0000-000000000003",
         |"location":"$dir","last-sequence-number":2,"last-updated-ms":0,
         |"last-column-id":4,
         |"current-schema-id":1,
         |"schemas":[{"type":"struct","schema-id":0,"fields":$schemaFieldsJson},
         |  {"type":"struct","schema-id":1,"fields":$schema1}],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
         |"last-partition-id":999,"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"current-snapshot-id":2,
         |"snapshots":[
         |  {"snapshot-id":1,"schema-id":0,"manifest-list":"$dir/metadata/snap-1.avro"},
         |  {"snapshot-id":2,"schema-id":1,"manifest-list":"$dir/metadata/snap-2.avro"}]}""".stripMargin
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath, meta)
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    // current read: evolved 4-column shape
    val cur = load(dir)
    assert(cur.schema.fieldNames.toSeq === Seq("id", "name", "score", "extra"))
    // time travel: the snapshot's schema (3 columns), not the current one
    val old = load(dir, Map("snapshot-id" -> "1"))
    assert(old.schema.fieldNames.toSeq === Seq("id", "name", "score"))
    assert(rows(old) === Set((1L, "first", 1.0)))
  }

  test("snapshot-id option time-travels to an older snapshot") {
    val dir = newTableDir()
    val f1 = s"$dir/data/a.parquet"
    val f2 = s"$dir/data/b.parquet"
    writeDataFile(docs((1L, "first", 1.0)), new File(f1))
    writeDataFile(docs((2L, "second", 2.0)), new File(f2))
    writeAvro(manifestSchemaV2, Seq(entryV2(1, 0, f1)),
      new File(s"$dir/metadata/m0.avro"))
    writeAvro(manifestSchemaV2, Seq(entryV2(0, 0, f1), entryV2(1, 0, f2)),
      new File(s"$dir/metadata/m1.avro"))
    writeAvro(manifestListSchema, Seq(listEntry(s"$dir/metadata/m0.avro", 0)),
      new File(s"$dir/metadata/snap-1.avro"))
    writeAvro(manifestListSchema, Seq(listEntry(s"$dir/metadata/m1.avro", 0, 2L)),
      new File(s"$dir/metadata/snap-2.avro"))
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath,
      metadataV2(dir,
        s"""{"snapshot-id":1,"manifest-list":"$dir/metadata/snap-1.avro"},
           |{"snapshot-id":2,"manifest-list":"$dir/metadata/snap-2.avro"}""".stripMargin,
        currentId = 2L))
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    assert(rows(load(dir)) === Set((1L, "first", 1.0), (2L, "second", 2.0)))
    assert(rows(load(dir, Map("snapshot-id" -> "1"))) === Set((1L, "first", 1.0)))
    val e = intercept[IllegalArgumentException](
      load(dir, Map("snapshot-id" -> "77")).collect())
    assert(e.getMessage.contains("snapshot 77 not found"))
  }

  test("relocated table: metadata location prefix remaps to the actual root") {
    val dir = buildV2Table(withDeletes = true)
    // move the whole table to a new directory; all recorded paths still
    // name the OLD location
    val moved = newTableDir() + "/relocated"
    Files.move(new File(dir).toPath, new File(moved).toPath,
      StandardCopyOption.REPLACE_EXISTING)
    assert(rows(load(moved)) === Set((1L, "alpha", 1.5), (3L, "gamma", 3.5),
      (5L, "epsilon", 5.5)))
  }

  test("URI-form mismatch (file:// location vs plain paths) still remaps after relocation") {
    // different writers spell the same location file:///x, file:/x, or /x
    // — a form mismatch must not silently skip the remap (deleted rows
    // would resurrect; review finding)
    val dir = buildV2Table(withDeletes = true)
    val metaFile = new File(s"$dir/metadata/v1.metadata.json")
    Files.writeString(metaFile.toPath,
      Files.readString(metaFile.toPath)
        .replace("\"location\":\"" + dir + "\"", "\"location\":\"file://" + dir + "\""))
    val moved = newTableDir() + "/relocated2"
    Files.move(new File(dir).toPath, new File(moved).toPath,
      StandardCopyOption.REPLACE_EXISTING)
    assert(rows(load(moved)) === Set((1L, "alpha", 1.5), (3L, "gamma", 3.5),
      (5L, "epsilon", 5.5)))
  }

  test("without a version-hint the NUMERICALLY newest vN metadata wins") {
    val dir = buildV2Table()
    val meta = new File(s"$dir/metadata")
    val v1 = Files.readString(new File(meta, "v1.metadata.json").toPath)
    // a STALE v9 (no current snapshot -> empty table) and the LIVE v10:
    // lexicographic order picks v9 ("v9" > "v10"), numeric picks v10
    Files.writeString(new File(meta, "v9.metadata.json").toPath,
      v1.replace("\"current-snapshot-id\":1", "\"current-snapshot-id\":-1"))
    Files.writeString(new File(meta, "v10.metadata.json").toPath, v1)
    Files.delete(new File(meta, "version-hint.text").toPath)
    assert(rows(load(dir)).size === 5)
  }

  test("without a hint the newest ZERO-PADDED foreign name wins, junk skipped") {
    val dir = buildV2Table()
    val meta = new File(s"$dir/metadata")
    val v1 = Files.readString(new File(meta, "v1.metadata.json").toPath)
    Files.delete(new File(meta, "v1.metadata.json").toPath)
    Files.delete(new File(meta, "version-hint.text").toPath)
    // java-iceberg's 00002-<uuid> scheme: name order IS recency order —
    // the stale 00002 has no current snapshot, the live 00005 does, and
    // a parked junk file above both must be walked past, not crash
    Files.writeString(new File(meta, "00002-aaaa.metadata.json").toPath,
      v1.replace("\"current-snapshot-id\":1", "\"current-snapshot-id\":-1"))
    Files.writeString(new File(meta, "00005-bbbb.metadata.json").toPath, v1)
    Files.writeString(new File(meta, "00007-cccc.metadata.json").toPath, "{}")
    assert(rows(load(dir)).size === 5)
  }

  test("a hint naming a missing or junk metadata file falls back to real metadata") {
    val dir = buildV2Table()
    val meta = new File(s"$dir/metadata")
    // the hint points at a version that does not exist (lost file, or an
    // adopted table with foreign naming) — resolution must walk to the
    // newest real candidate instead of crashing
    Files.writeString(new File(meta, "version-hint.text").toPath, "99")
    assert(rows(load(dir)).size === 5)
    // the hinted file exists but is junk: same fallback
    Files.writeString(new File(meta, "v99.metadata.json").toPath, "{}")
    assert(rows(load(dir)).size === 5)
    // a garbled (non-numeric) hint behaves like no hint at all
    Files.writeString(new File(meta, "version-hint.text").toPath, "")
    assert(rows(load(dir)).size === 5)
  }

  test("non-Iceberg directory and bad format-version fail loudly") {
    val dir = newTableDir()
    val e = intercept[IllegalArgumentException](load(dir))
    assert(e.getMessage.contains("not an Iceberg table"))
    new File(s"$dir/metadata").mkdirs()
    Files.writeString(new File(s"$dir/metadata/v1.metadata.json").toPath,
      s"""{"format-version":4,"location":"$dir"}""")
    Files.writeString(new File(s"$dir/metadata/version-hint.text").toPath, "1")
    val e2 = intercept[IllegalArgumentException](load(dir))
    assert(e2.getMessage.contains("format-version 4"))
  }
}
