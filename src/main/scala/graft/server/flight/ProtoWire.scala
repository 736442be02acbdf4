package graft.server.flight

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal protobuf wire-format codec (the public encoding spec:
  * varint/length-delimited framing), hand-rolled because no protobuf-java
  * runtime ships unshaded on the Spark classpath. Only the wire types the
  * Flight / FlightSQL messages use are implemented: VARINT (0), LEN (2),
  * I64 (1) and I32 (5) are skippable for forward compatibility. */
object ProtoWire {

  final class Writer {
    private val out = new ByteArrayOutputStream()
    def varintRaw(v: Long): Writer = {
      var x = v
      while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      this
    }
    private def tag(field: Int, wire: Int): Writer = varintRaw((field.toLong << 3) | wire)
    def int64(field: Int, v: Long): Writer =
      if (v == 0) this else { tag(field, 0); varintRaw(v) }
    /** Explicit-presence variant for proto3 `optional` scalars: writes the
      * field even when the value is 0 (absence, not zero-ness, carries the
      * meaning there). */
    def int64Always(field: Int, v: Long): Writer = { tag(field, 0); varintRaw(v) }
    def bool(field: Int, v: Boolean): Writer = if (v) int64(field, 1) else this
    def bytes(field: Int, b: Array[Byte]): Writer =
      if (b == null || b.isEmpty) this else bytesAlways(field, b)
    /** Emits even when empty — for proto3 `optional` fields whose PRESENCE
      * carries meaning. */
    def bytesAlways(field: Int, b: Array[Byte]): Writer = {
      tag(field, 2); varintRaw(b.length.toLong); out.write(b); this
    }
    def string(field: Int, s: String): Writer =
      if (s == null || s.isEmpty) this else bytes(field, s.getBytes(UTF_8))
    def stringAlways(field: Int, s: String): Writer = bytesAlways(field, s.getBytes(UTF_8))
    def message(field: Int, m: Writer): Writer = bytesAlways(field, m.result())
    def result(): Array[Byte] = out.toByteArray
  }

  final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = buf(pos) & 0xFF; pos += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      b
    }
    def readString(): String = new String(readBytes(), UTF_8)
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 => pos += readVarint().toInt
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }
}
