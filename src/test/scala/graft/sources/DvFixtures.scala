package graft.sources

/** Test-side builders for Delta deletion-vector fixtures — the Z85 and
  * portable-roaring WRITERS the production code deliberately lacks (the
  * writers only consume DVs), shared by [[DeltaLoaderSpec]] and
  * [[DeltaWriterSpec]] so the byte-format knowledge lives once. */
private[sources] object DvFixtures {

  def z85Encode(bytes: Array[Byte]): String = {
    val chars = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    require(bytes.length % 4 == 0)
    val sb = new StringBuilder
    bytes.grouped(4).foreach { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xFFL))
      val digits = new Array[Char](5)
      (4 to 0 by -1).foreach { i => digits(i) = chars((v % 85).toInt); v /= 85 }
      sb.appendAll(digits)
    }
    sb.toString
  }

  /** Z85 works on 4-byte groups; the roaring payload is self-delimiting,
    * so trailing zero padding is inert. */
  def padTo4(b: Array[Byte]): Array[Byte] =
    if (b.length % 4 == 0) b else b ++ Array.fill[Byte]((4 - b.length % 4) % 4)(0)

  /** Portable 64-bit RoaringBitmapArray writer (array + bitmap containers). */
  def serializeRoaring(values: Array[Long]): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val byHigh = values.groupBy(_ >>> 32)
    val nBitmaps = if (byHigh.isEmpty) 0L else byHigh.keys.max + 1
    val out = new java.io.ByteArrayOutputStream()
    def putInt(v: Int): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def putLong(v: Long): Unit =
      out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())
    def putShort(v: Int): Unit =
      out.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array())
    putInt(1681511377)
    putLong(nBitmaps)
    (0L until nBitmaps).foreach { high =>
      val lows = byHigh.getOrElse(high, Array.empty[Long]).map(v => (v & 0xFFFFFFFFL).toInt)
      val byKey = lows.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      putInt(byKey.size)
      byKey.foreach { case (k, vs) => putShort(k); putShort(vs.length - 1) }
      // offset header: byte offsets from the bitmap's cookie
      var off = 8 + 8 * byKey.size
      byKey.foreach { case (_, vs) =>
        putInt(off)
        off += (if (vs.length > 4096) 8192 else 2 * vs.length)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length > 4096) {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low16 = v & 0xFFFF
            words(low16 >>> 6) |= 1L << (low16 & 63)
          }
          words.foreach(putLong)
        } else vs.map(_ & 0xFFFF).sorted.foreach(putShort)
      }
    }
    out.toByteArray
  }

  /** The on-disk DV file envelope: version byte, big-endian length, data,
    * big-endian crc32. Returns the blob's offset. */
  def writeDvFile(path: java.nio.file.Path, data: Array[Byte]): Int = {
    import java.nio.{ByteBuffer, ByteOrder}
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // DV file format version
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length).array())
    out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(data)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      .putInt(crc.getValue.toInt).array())
    java.nio.file.Files.write(path, out.toByteArray)
    1 // the blob's offset (right after the version byte)
  }
}
