package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Iceberg writer round-tripped through the repo's protocol-level reader
  * (the [[DeltaWriterSpec]] discipline for the other table format). */
class IcebergWriterSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(): String =
    Files.createTempDirectory("graft_iceberg_w").toString + "/t"

  private def readBack(dir: String, opts: Map[String, String] = Map.empty): DataFrame =
    Loaders.load(spark, TableSource("iw_t", dir, Some("iceberg"), options = opts))

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("create + append + snapshot time travel round-trip through the reader") {
    val dir = newDir()
    val v1 = IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
    assert(v1 == 1L)
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b"))
    val v2 = IcebergWriter.write(Seq((3L, "c")).toDF("id", "name"), dir)
    assert(v2 == 2L)
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // snapshot 1 is still readable (time travel by snapshot id)
    assert(rows(readBack(dir, Map("snapshot-id" -> "1"))) ==
      Set(1L -> "a", 2L -> "b"))
    // filesystem-catalog layout: versioned metadata + hint
    val meta = new java.io.File(dir + "/metadata").listFiles().map(_.getName)
    assert(meta.contains("v1.metadata.json") && meta.contains("v2.metadata.json"))
    assert(Files.readString(java.nio.file.Path.of(
      dir + "/metadata/version-hint.text")).trim == "2")
  }

  test("overwrite starts a fresh snapshot; the old one stays time-travelable") {
    val dir = newDir()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), dir)
    val v3 = IcebergWriter.write(Seq((9L, "z")).toDF("id", "name"), dir,
      mode = "overwrite")
    assert(v3 == 3L)
    assert(rows(readBack(dir)) == Set(9L -> "z"))
    assert(rows(readBack(dir, Map("snapshot-id" -> "2"))) ==
      Set(1L -> "a", 2L -> "b"))
  }

  test("append schema mismatch fails; overwrite replaces the schema with new field ids") {
    val dir = newDir()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    val bad = intercept[IllegalArgumentException] {
      IcebergWriter.write(Seq((1.5, "a")).toDF("id", "name"), dir)
    }
    assert(bad.getMessage.contains("schema"))
    IcebergWriter.write(Seq(("x", 1L)).toDF("label", "n"), dir, mode = "overwrite")
    val df = readBack(dir)
    assert(df.schema.fieldNames.toSeq == Seq("label", "n"))
    // time travel to the pre-overwrite snapshot reads the OLD schema
    // (snapshot-scoped schema-id)
    val old = readBack(dir, Map("snapshot-id" -> "1"))
    assert(old.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(rows(old) == Set(1L -> "a"))
  }

  test("snapshot-summary ledger makes appends idempotent") {
    val dir = newDir()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    assert(IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), dir,
      txn = Some(("appX", 7L))) == 2L)
    // same and older batch ids: skipped
    assert(IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), dir,
      txn = Some(("appX", 7L))) == 2L)
    assert(IcebergWriter.write(Seq((3L, "c")).toDF("id", "name"), dir,
      txn = Some(("appX", 5L))) == 2L)
    // newer id and a different app both commit
    assert(IcebergWriter.write(Seq((4L, "d")).toDF("id", "name"), dir,
      txn = Some(("appX", 8L))) == 3L)
    assert(IcebergWriter.write(Seq((5L, "e")).toDF("id", "name"), dir,
      txn = Some(("appY", 0L))) == 4L)
    assert(rows(readBack(dir)) ==
      Set(1L -> "a", 2L -> "b", 4L -> "d", 5L -> "e"))
  }

  test("a foreign metadata version in the directory is skipped, not clobbered") {
    val dir = newDir()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    // some other process parked a v2 file (the put-if-absent commit point
    // means the writer can never overwrite it — it advances past)
    Files.writeString(java.nio.file.Path.of(dir + "/metadata/v2.metadata.json"),
      "{}")
    val v = IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), dir)
    assert(v == 3L)
    assert(Files.readString(java.nio.file.Path.of(
      dir + "/metadata/v2.metadata.json")) == "{}") // untouched
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b"))
  }

  test("manifest record counts are true footer counts") {
    val dir = newDir()
    IcebergWriter.write((1L to 10L).map(i => (i, s"d$i")).toDF("id", "name")
      .coalesce(1), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "metadata"))
      .map(_.getPath).find(_.getName.startsWith("graft-m")).get
    val in = fs.open(manifest)
    val bytes = try in.readAllBytes() finally in.close()
    val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val entry = reader.next()
    reader.close()
    val dataFile = entry.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(dataFile.get("record_count").asInstanceOf[Long] == 10L)
  }

  test("appending onto a legacy-v1 metadata layout normalizes, not bricks, the table") {
    val dir = newDir()
    IcebergWriter.write(Seq((1L, "a")).toDF("id", "name"), dir)
    // surgically rewrite the metadata into the v1 shape: top-level `schema`,
    // no `schemas` array, format-version 1
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val p = java.nio.file.Path.of(dir + "/metadata/v1.metadata.json")
    val node = mapper.readTree(java.nio.file.Files.readString(p))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val schema0 = node.get("schemas").get(0)
    node.remove("schemas"); node.remove("current-schema-id")
    node.set[com.fasterxml.jackson.databind.node.ObjectNode]("schema", schema0)
    node.put("format-version", 1)
    java.nio.file.Files.writeString(p, mapper.writeValueAsString(node))
    // drop the hadoop checksum sidecar the out-of-band rewrite invalidated
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Path.of(dir + "/metadata/.v1.metadata.json.crc"))
    assert(rows(readBack(dir)) == Set(1L -> "a")) // legacy form reads fine
    // append must produce WELL-FORMED v2 metadata (a schemas array built
    // from the legacy schema), and the table stays fully readable
    IcebergWriter.write(Seq((2L, "b")).toDF("id", "name"), dir)
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b"))
    val v2 = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Path.of(dir + "/metadata/v2.metadata.json")))
    assert(v2.get("schemas").isArray && v2.get("schemas").size() == 1)
    // and overwrite on the same legacy-derived lineage assigns the next id
    IcebergWriter.write(Seq(("x", 9L)).toDF("label", "n"), dir, mode = "overwrite")
    assert(readBack(dir).schema.fieldNames.toSeq == Seq("label", "n"))
  }

  test("streaming sink appends exactly-once through the summary ledger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = newDir()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = IcebergWriter.streamSink(mem.toDF().toDF("id", "name"), dir, "streamA")
      .option("checkpointLocation", Files.createTempDirectory("iw_ck").toString)
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(readBack(dir)) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    val before = readBack(dir).count()
    IcebergWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir,
      txn = Some(("streamA", 0L)))
    assert(readBack(dir).count() == before)
  }

  test("iceberg schema json assigns depth-first field ids and round-trips types") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("kv", MapType(StringType, DoubleType, valueContainsNull = false)),
      StructField("nested", StructType(Seq(
        StructField("x", IntegerType), StructField("y", DecimalType(10, 2)))))))
    val (json, lastId) = IcebergWriter.icebergSchemaJson(schema, 0, 0)
    // ids: id=1, tags=2(elem 3), kv=4(key 5, value 6), nested=7(x 8, y 9)
    assert(lastId == 9, json)
    val spark2 = IcebergLoader.tableSchema(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        s"""{"schemas":[$json],"current-schema-id":0}"""))
    assert(spark2("id").dataType == LongType)
    assert(spark2("tags").dataType == ArrayType(StringType, containsNull = true))
    assert(spark2("kv").dataType == MapType(StringType, DoubleType, valueContainsNull = false))
    assert(spark2("nested").dataType.asInstanceOf[StructType]("y").dataType ==
      DecimalType(10, 2))
  }
}
