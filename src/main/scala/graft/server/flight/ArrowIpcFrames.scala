package graft.server.flight

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.arrow.vector.ipc.WriteChannel
import org.apache.arrow.vector.ipc.message.MessageSerializer

import FlightProto.FlightData

/** Splice between Arrow IPC *stream* framing and Flight's per-message
  * transport: an IPC stream is a sequence of encapsulated messages
  * `[0xFFFFFFFF][int32 LE len][len bytes flatbuffer][body]` (the public
  * Arrow IPC spec); Flight ships each message as one FlightData with the
  * bare flatbuffer in `data_header` and the body in `data_body`. */
object ArrowIpcFrames {

  private val Continuation = 0xFFFFFFFF

  private def readIntLE(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  /** Split IPC stream bytes into FlightData messages (schema first, then
    * one per record batch; the end-of-stream marker is dropped — gRPC
    * stream completion plays that role in Flight). */
  def split(stream: Array[Byte]): Seq[FlightData] = {
    val out = Seq.newBuilder[FlightData]
    var off = 0
    var done = false
    while (!done && off + 8 <= stream.length) {
      val first = readIntLE(stream, off)
      // modern framing always leads with the continuation marker; a bare
      // zero length is the end-of-stream marker
      val (len, headerOff) =
        if (first == Continuation) (readIntLE(stream, off + 4), off + 8)
        else (first, off + 4)
      if (len == 0) done = true
      else {
        val header = java.util.Arrays.copyOfRange(stream, headerOff, headerOff + len)
        val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(
          ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN))
        val bodyLen = msg.bodyLength().toInt
        val body =
          if (bodyLen == 0) Array.emptyByteArray
          else java.util.Arrays.copyOfRange(stream, headerOff + len, headerOff + len + bodyLen)
        out += FlightData(header, body)
        off = headerOff + len + bodyLen
      }
    }
    out.result()
  }

  /** Rebuild IPC stream bytes from FlightData messages (the client half:
    * feed the result to ArrowStreamReader). */
  def reassemble(frames: Seq[FlightData]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def intLE(v: Int): Unit = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      out.write(b.array())
    }
    frames.foreach { f =>
      val pad = (8 - (f.dataHeader.length % 8)) % 8
      intLE(Continuation); intLE(f.dataHeader.length + pad)
      out.write(f.dataHeader)
      (0 until pad).foreach(_ => out.write(0))
      out.write(f.dataBody)
    }
    intLE(Continuation); intLE(0) // end of stream
    out.toByteArray
  }

  /** Encapsulated IPC schema message (`[continuation][len][Schema
    * flatbuffer]`) — the form FlightInfo.schema, dataset_schema, and
    * CommandGetTables' table_schema column carry (what arrow-rs'
    * `try_schema_from_ipc_buffer` parses). */
  def encapsulatedSchema(schema: org.apache.arrow.vector.types.pojo.Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    MessageSerializer.serialize(
      new WriteChannel(java.nio.channels.Channels.newChannel(out)), schema)
    out.toByteArray
  }
}
