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

  /** Parse Arrow IPC *stream* bytes into a DataFrame (materialized driver-side
    * then parallelized — mirrors the reference's MemTable ingestion of IPC,
    * columnq/src/table/arrow_ipc_stream.rs). */
  def fromIpcStreamBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val (iter, schema) = execution.arrow.ArrowConverters.fromIPCStream(bytes)
    try {
      val rows = iter.map(_.copy()).toArray.toIndexedSeq
      val rdd = session.sparkContext.parallelize(rows, math.max(1, math.min(rows.length, 8)))
      session.internalCreateDataFrame(rdd, schema)
    } finally iter.close()
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
