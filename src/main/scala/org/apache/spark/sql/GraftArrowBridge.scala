package org.apache.spark.sql

import java.io.ByteArrayOutputStream

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamReader}

import org.apache.spark.sql.execution.arrow.ArrowBatchStreamWriter

/** Bridge into Spark's `private[sql]` Arrow conversion machinery: serialize a
  * DataFrame result to Arrow IPC stream / file bytes without re-implementing
  * row->vector conversion (reference behavior: columnq/src/encoding/arrow.rs). */
object GraftArrowBridge {

  /** Stream Arrow IPC *stream* format (schema header + batches + EOS) into
    * `out`, pulling record batches one partition at a time — the stream
    * format has no footer, so it can flush incrementally and driver memory
    * stays bounded by one partition's batches. */
  def writeIpcStream(df: DataFrame, out: java.io.OutputStream): Unit = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val tz = ds.sparkSession.sessionState.conf.sessionLocalTimeZone
    val writer = new ArrowBatchStreamWriter(df.schema, out, tz, true, false)
    writer.writeBatches(ds.toArrowBatchRdd.toLocalIterator)
    writer.end()
  }

  /** Arrow IPC *stream* bytes (schema header + batches + EOS). */
  def toIpcStreamBytes(df: DataFrame): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeIpcStream(df, out)
    out.toByteArray
  }

  /** Parse Arrow IPC *stream* bytes into a DataFrame.
    *
    * The DOCUMENT bytes are driver-held once — the reference's MemTable
    * materializes the same whole document (columnq/src/table/
    * arrow_ipc_stream.rs), so the driver-memory bound is `len(bytes)`, i.e.
    * single-document table size, NOT table-scan size. Row deserialization is
    * distributed: the stream splits into its IPC record-batch messages on the
    * driver (a byte-slicing pass, no vector decode), and each batch decodes to
    * rows in its own task. */
  def fromIpcStreamBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    // schema from the stream header only — no batch is decoded driver-side
    val alloc = new RootAllocator(Long.MaxValue)
    val schema = try {
      val r = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
      try util.ArrowUtils.fromArrowSchema(r.getVectorSchemaRoot.getSchema)
      finally r.close()
    } finally alloc.close()
    val batches = execution.arrow.ArrowConverters.getBatchesFromStream(
      new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes)).toArray
    val tz = session.sessionState.conf.sessionLocalTimeZone
    val rdd = session.sparkContext
      .parallelize(batches.toIndexedSeq, math.max(1, batches.length))
      .mapPartitions { it =>
        execution.arrow.ArrowConverters.fromBatchIterator(
          it, schema, tz, true, false, org.apache.spark.TaskContext.get())
      }
    session.internalCreateDataFrame(rdd, schema)
  }

  /** Parse Arrow IPC *file* bytes (transcoded to a stream first). */
  def fromIpcFileBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(
      new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val out = new ByteArrayOutputStream()
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
        root, reader, java.nio.channels.Channels.newChannel(out))
      w.start()
      while (reader.loadNextBatch()) w.writeBatch()
      w.end(); w.close()
      fromIpcStreamBytes(spark, out.toByteArray)
    } finally { reader.close(); alloc.close() }
  }

  /** The Arrow schema a DataFrame's IPC serialization will carry, computed
    * WITHOUT executing the plan — for FlightSQL prepared-statement metadata
    * (dataset_schema must be known at prepare time). */
  def arrowSchemaOf(df: DataFrame): org.apache.arrow.vector.types.pojo.Schema = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val tz = ds.sparkSession.sessionState.conf.sessionLocalTimeZone
    util.ArrowUtils.toArrowSchema(df.schema, tz, true, false)
  }

  /** Arrow IPC *file* bytes (magic + footer), transcoded from the stream. */
  def toIpcFileBytes(df: DataFrame): Array[Byte] = {
    val streamBytes = toIpcStreamBytes(df)
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(streamBytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val out = new ByteArrayOutputStream()
      val fw = new ArrowFileWriter(root, reader, java.nio.channels.Channels.newChannel(out))
      fw.start()
      while (reader.loadNextBatch()) fw.writeBatch()
      fw.end(); fw.close()
      out.toByteArray
    } finally { reader.close(); alloc.close() }
  }
}
