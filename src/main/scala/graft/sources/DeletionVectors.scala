package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession

/** Delta Lake deletion-vector reader AND writer, built from the PUBLIC
  * formats the protocol mandates (delta.io PROTOCOL.md "Deletion Vectors" + the
  * RoaringBitmap interoperable serialization spec,
  * github.com/RoaringBitmap/RoaringFormatSpec):
  *
  *   - descriptor `{storageType, pathOrInlineDv, offset?, sizeInBytes,
  *     cardinality}` on the `add` action
  *   - storageType `u`: DV file `<table>/<prefix>/deletion_vector_<uuid>.bin`
  *     where pathOrInlineDv = `<prefix><Z85-encoded 16-byte UUID>`;
  *     `p`: absolute path; `i`: the blob itself, Z85-encoded inline
  *   - DV file layout: 1-byte format version, then per DV at `offset`:
  *     `[dataSize int32 BE][data][crc32 int32 BE]`
  *   - `data` = 64-bit RoaringBitmapArray, PORTABLE form: magic 1681511377
  *     (int32 LE), number of 32-bit bitmaps (int64 LE), then each 32-bit
  *     bitmap in the standard portable serialization, key i holding the
  *     low 32 bits of values whose high 32 bits equal i.
  *
  * Deleted ROW INDEXES are positions within the data file — the scan side
  * matches them against the parquet reader's `_metadata.row_index`. */
object DeletionVectors {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  // ---- Z85 (ZeroMQ base85, the variant the Delta spec names) ---------------

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }

  /** Z85-encode `b` (length must be a multiple of 4 — UUIDs and DV blobs
    * both are; the WRITE side of [[z85Decode]], needed by the DV writer's
    * `u`-storage descriptors). */
  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, s"Z85 input length ${b.length} not a multiple of 4")
    val sb = new java.lang.StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Z85Chars((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(chunk)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0; var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Index(c) else -1
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5; o += 4
    }
    out
  }

  // ---- roaring bitmap (portable) -------------------------------------------

  private val PortableMagic = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Deserialize ONE standard 32-bit roaring bitmap from `buf` (positioned
    * at its cookie; position advances past the bitmap), emitting each value
    * OR'd with `high` into `out`. */
  private def readBitmap32(buf: ByteBuffer, high: Long,
                           out: java.util.function.LongConsumer): Unit = {
    val cookie = buf.getInt
    val (nContainers, runFlags) =
      if ((cookie & 0xFFFF) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, flags)
      } else {
        require(cookie == SerialCookieNoRun, s"bad roaring cookie $cookie")
        (buf.getInt, null)
      }
    def isRun(i: Int): Boolean =
      runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
      i += 1
    }
    // offset header present for the no-run cookie or >= threshold containers
    if (runFlags == null || nContainers >= NoOffsetThreshold)
      buf.position(buf.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = high | (keys(i).toLong << 16)
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort & 0xFFFF
          val len = (buf.getShort & 0xFFFF) + 1
          var v = 0
          while (v < len) { out.accept(base | (start + v).toLong); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitmap container: 1024 x 64-bit words
        var w = 0
        while (w < 1024) {
          var word = buf.getLong
          val wordBase = base | (w.toLong << 6)
          while (word != 0) {
            out.accept(wordBase | java.lang.Long.numberOfTrailingZeros(word).toLong)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { out.accept(base | (buf.getShort & 0xFFFF).toLong); v += 1 }
      }
      i += 1
    }
  }

  /** Deserialize the STANDARD 64-bit roaring "portable" serialization
    * (RoaringFormatSpec 64-bit extension, what Iceberg v3 deletion
    * vectors store): u64 LE bucket count, then per bucket a u32 LE high
    * key followed by a 32-bit portable bitmap. Differs from Delta's
    * RoaringBitmapArray below (magic header, IMPLICIT 0..n-1 keys). */
  def deserializePortable64(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong
    require(nBuckets >= 0 && nBuckets <= Int.MaxValue,
      s"deletion vector: implausible bucket count $nBuckets")
    val out = new java.util.ArrayList[java.lang.Long]()
    var k = 0L
    while (k < nBuckets) {
      val key = buf.getInt.toLong & 0xFFFFFFFFL
      readBitmap32(buf, key << 32, v => { out.add(v); () })
      k += 1
    }
    val arr = new Array[Long](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  /** Iceberg v3 deletion-vector blob magic, the on-disk byte sequence
    * D1 D3 39 64 (iceberg spec §Deletion vectors). */
  private val IcebergDvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)

  /** Read one Iceberg v3 deletion vector straight out of a Puffin file at
    * the manifest's `content_offset` (the spec's fast path — no footer
    * parse needed): `[len i32 BE][magic D1D33964][portable-64 vector]
    * [crc32 i32 BE over magic+vector]`. The file header magic is checked
    * too so a mis-pointed offset into a non-Puffin file fails loudly. */
  def readIcebergDv(fs: org.apache.hadoop.fs.FileSystem, p: HPath,
                    offset: Long, sizeInBytes: Long): Array[Long] = {
    val in = fs.open(p)
    try {
      val head = new Array[Byte](4)
      in.readFully(head)
      require(head.sameElements("PFA1".getBytes("UTF-8")),
        s"deletion vector: `$p` is not a Puffin file (bad header magic)")
      in.seek(offset)
      val lenBytes = new Array[Byte](4)
      in.readFully(lenBytes)
      val len = ByteBuffer.wrap(lenBytes).getInt // big-endian
      require(len >= 4 && (sizeInBytes <= 0 || len + 8 == sizeInBytes),
        s"deletion vector: blob length $len inconsistent with " +
          s"content_size_in_bytes $sizeInBytes in $p")
      val body = new Array[Byte](len) // magic + vector
      in.readFully(body)
      require((0 until 4).forall(i => body(i) == IcebergDvMagic(i)),
        s"deletion vector: bad blob magic in $p at offset $offset")
      val crcBytes = new Array[Byte](4)
      in.readFully(crcBytes)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      require(ByteBuffer.wrap(crcBytes).getInt == crc.getValue.toInt,
        s"deletion vector checksum mismatch in $p at offset $offset")
      deserializePortable64(java.util.Arrays.copyOfRange(body, 4, body.length))
    } finally in.close()
  }

  /** Deserialize a portable 64-bit RoaringBitmapArray into sorted row
    * indexes. */
  def deserializeBitmapArray(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == PortableMagic,
      s"deletion vector: expected portable magic $PortableMagic, got $magic")
    val nBitmaps = buf.getLong
    val out = new java.util.ArrayList[java.lang.Long]()
    var k = 0L
    while (k < nBitmaps) {
      readBitmap32(buf, k << 32, v => { out.add(v); () })
      k += 1
    }
    val arr = new Array[Long](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  // ---- roaring bitmap (portable) WRITE side ---------------------------------

  /** Serialize sorted, distinct row indexes into Delta's portable 64-bit
    * RoaringBitmapArray (the exact inverse of [[deserializeBitmapArray]]):
    * magic int32 LE, bitmap count int64 LE, then each 32-bit bitmap in the
    * standard portable serialization. Keys are IMPLICIT 0..n-1, so empty
    * intermediate high-words still serialize (as zero-container bitmaps).
    * Containers: sorted-array for cardinality <= 4096, 1024-word bitset
    * above — the no-run cookie form, which every roaring reader speaks. */
  def serializeBitmapArray(sortedRows: Array[Long]): Array[Byte] = {
    require(sortedRows.forall(_ >= 0), "deletion vector row indexes must be >= 0")
    val nBitmaps = if (sortedRows.isEmpty) 0L else (sortedRows.last >>> 32) + 1
    val out = new java.io.ByteArrayOutputStream()
    leInt(out, PortableMagic)
    leInt(out, nBitmaps.toInt); leInt(out, (nBitmaps >>> 32).toInt) // int64 LE
    var i = 0
    var high = 0L
    while (high < nBitmaps) {
      val from = i
      while (i < sortedRows.length && (sortedRows(i) >>> 32) == high) i += 1
      writeBitmap32(out, sortedRows, from, i)
      high += 1
    }
    out.toByteArray
  }

  /** Streaming form of [[serializeBitmapArray]]: consumes a SORTED,
    * STRICTLY-INCREASING iterator of row indexes and returns
    * (bytes, cardinality). Byte-identical output to the array form, but
    * peak memory is ONE container's value buffer (64 Ki ints) plus the
    * compressed output — a near-full-file DELETE on a 10M-row file never
    * materializes its row indexes as an uncompressed long array (review
    * finding: `collect_list` + `Array.distinct.sorted` held ~80 MB in one
    * task row; every row index of a single file shares high word 0, so
    * only container-level streaming actually bounds it). */
  def serializeBitmapArrayStream(sorted: Iterator[Long]): (Array[Byte], Long) = {
    // per-bitmap accumulation (headers need every container's cardinality
    // before any payload byte, so payloads buffer compressed)
    val bitmaps = new java.io.ByteArrayOutputStream() // finished 32-bit bitmaps
    var keys = Array.newBuilder[Int]
    var cards = Array.newBuilder[Int]
    var payload = new java.io.ByteArrayOutputStream()
    // current container
    val vals = new Array[Int](65536)
    var nVals = 0
    var curKey = -1 // bits 16..31 of the low word
    var curHigh = 0L
    var emittedHighs = 0L // bitmaps already written (implicit keys 0..n-1)
    var card = 0L
    var prev = -1L

    def flushContainer(): Unit = {
      if (curKey < 0) return
      keys += curKey; cards += nVals
      if (nVals > 4096) {
        val words = new Array[Long](1024)
        var v = 0
        while (v < nVals) {
          val low = vals(v); words(low >>> 6) |= 1L << (low & 63); v += 1
        }
        var w = 0
        while (w < 1024) {
          val word = words(w)
          leInt(payload, word.toInt); leInt(payload, (word >>> 32).toInt)
          w += 1
        }
      } else {
        var v = 0
        while (v < nVals) { leShort(payload, vals(v)); v += 1 }
      }
      nVals = 0; curKey = -1
    }

    def emptyBitmap(): Unit = {
      leInt(bitmaps, SerialCookieNoRun); leInt(bitmaps, 0)
    }

    def flushBitmap(): Unit = {
      flushContainer()
      val ks = keys.result(); val cs = cards.result()
      val n = ks.length
      leInt(bitmaps, SerialCookieNoRun)
      leInt(bitmaps, n)
      var c = 0
      while (c < n) { leShort(bitmaps, ks(c)); leShort(bitmaps, cs(c) - 1); c += 1 }
      var off = 4 + 4 + 4 * n + 4 * n
      c = 0
      while (c < n) {
        leInt(bitmaps, off)
        off += (if (cs(c) > 4096) 8192 else 2 * cs(c))
        c += 1
      }
      payload.writeTo(bitmaps)
      keys = Array.newBuilder[Int]; cards = Array.newBuilder[Int]
      payload = new java.io.ByteArrayOutputStream()
      emittedHighs += 1
    }

    sorted.foreach { row =>
      require(row > prev && row >= 0,
        s"serializeBitmapArrayStream needs sorted, distinct, >=0 input " +
          s"(got $row after $prev)")
      prev = row
      val high = row >>> 32
      if (card > 0 && high != curHigh) {
        flushBitmap()
        while (emittedHighs < high) { emptyBitmap(); emittedHighs += 1 }
      } else if (card == 0) {
        while (emittedHighs < high) { emptyBitmap(); emittedHighs += 1 }
      }
      curHigh = high
      val key = ((row >>> 16) & 0xFFFF).toInt
      if (key != curKey) { flushContainer(); curKey = key }
      vals(nVals) = (row & 0xFFFF).toInt; nVals += 1
      card += 1
    }
    if (card > 0) flushBitmap()
    val out = new java.io.ByteArrayOutputStream()
    leInt(out, PortableMagic)
    leInt(out, emittedHighs.toInt); leInt(out, (emittedHighs >>> 32).toInt)
    bitmaps.writeTo(out)
    (out.toByteArray, card)
  }

  /** Merge two sorted, distinct long iterators into one (dedup on ties) —
    * the DML writer's old-DV ∪ new-deletes stream. */
  def mergeSortedDistinct(a: Iterator[Long], b: Iterator[Long]): Iterator[Long] =
    new scala.collection.AbstractIterator[Long] {
      private val pa = a.buffered; private val pb = b.buffered
      def hasNext: Boolean = pa.hasNext || pb.hasNext
      def next(): Long =
        if (!pb.hasNext) pa.next()
        else if (!pa.hasNext) pb.next()
        else {
          val x = pa.head; val y = pb.head
          if (x < y) pa.next()
          else if (y < x) pb.next()
          else { pa.next(); pb.next() } // tie: emit once
        }
    }

  /** Serialize sorted, distinct row indexes into the STANDARD 64-bit
    * roaring "portable" serialization (the inverse of
    * [[deserializePortable64]] — what ICEBERG v3 deletion vectors store):
    * u64 LE bucket count, then per NON-EMPTY bucket a u32 LE high key
    * followed by the 32-bit portable bitmap. Differs from Delta's
    * RoaringBitmapArray above (no magic, EXPLICIT sparse keys). */
  def serializePortable64(sortedRows: Array[Long]): Array[Byte] = {
    require(sortedRows.forall(_ >= 0), "deletion vector row indexes must be >= 0")
    val out = new java.io.ByteArrayOutputStream()
    // count non-empty buckets in one pass
    var nBuckets = 0L
    var i = 0
    while (i < sortedRows.length) {
      val high = sortedRows(i) >>> 32
      while (i < sortedRows.length && (sortedRows(i) >>> 32) == high) i += 1
      nBuckets += 1
    }
    leInt(out, nBuckets.toInt); leInt(out, (nBuckets >>> 32).toInt) // u64 LE
    i = 0
    while (i < sortedRows.length) {
      val high = sortedRows(i) >>> 32
      val from = i
      while (i < sortedRows.length && (sortedRows(i) >>> 32) == high) i += 1
      leInt(out, high.toInt) // u32 LE key
      writeBitmap32(out, sortedRows, from, i)
    }
    out.toByteArray
  }

  private def leInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }
  private def leShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }

  /** ONE 32-bit portable roaring bitmap from `sortedRows[from, end)`'s low
    * words (no-run cookie form, array containers to 4096, bitsets above —
    * the writer both 64-bit serializations share). */
  private def writeBitmap32(out: java.io.ByteArrayOutputStream,
                            sortedRows: Array[Long], from: Int, end: Int): Unit = {
    // group by the upper 16 bits of the low word (container keys)
    val keys = Array.newBuilder[Int]
    val cards = Array.newBuilder[Int]
    val bounds = Array.newBuilder[(Int, Int)] // [start, end) into sortedRows
    var j = from
    while (j < end) {
      val key = ((sortedRows(j) >>> 16) & 0xFFFF).toInt
      val s = j
      while (j < end && ((sortedRows(j) >>> 16) & 0xFFFF).toInt == key) j += 1
      keys += key; cards += (j - s); bounds += ((s, j))
    }
    val ks = keys.result(); val cs = cards.result(); val bs = bounds.result()
    val n = ks.length
    leInt(out, SerialCookieNoRun)
    leInt(out, n)
    var c = 0
    while (c < n) { leShort(out, ks(c)); leShort(out, cs(c) - 1); c += 1 }
    // offset header (mandatory for the no-run cookie): byte position of
    // each container from the START of this bitmap's serialization
    var off = 4 + 4 + 4 * n + 4 * n
    c = 0
    while (c < n) {
      leInt(out, off)
      off += (if (cs(c) > 4096) 8192 else 2 * cs(c))
      c += 1
    }
    c = 0
    while (c < n) {
      val (s, e) = bs(c)
      if (cs(c) > 4096) {
        val words = new Array[Long](1024)
        var v = s
        while (v < e) {
          val low = (sortedRows(v) & 0xFFFF).toInt
          words(low >>> 6) |= 1L << (low & 63)
          v += 1
        }
        var w = 0
        while (w < 1024) {
          val word = words(w)
          leInt(out, word.toInt); leInt(out, (word >>> 32).toInt)
          w += 1
        }
      } else {
        var v = s
        while (v < e) { leShort(out, (sortedRows(v) & 0xFFFF).toInt); v += 1 }
      }
      c += 1
    }
  }

  /** Frame one portable-64 vector as the iceberg v3 DV blob the manifest's
    * `content_offset` points at (inverse of [[readIcebergDv]]'s read):
    * `[len i32 BE][magic D1D33964 + vector][crc32 i32 BE over magic+vector]`.
    * content_size_in_bytes = the returned length (len + 8). */
  def frameIcebergDvBlob(vector: Array[Byte]): Array[Byte] = {
    val body = IcebergDvMagic ++ vector
    val buf = ByteBuffer.allocate(4 + body.length + 4) // big-endian default
    buf.putInt(body.length)
    buf.put(body)
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** Frame one serialized DV blob into the on-disk DV FILE layout and
    * return the bytes to append at `offset` in the bin file:
    * `[dataSize int32 BE][data][crc32 int32 BE]` (the layout [[read]]
    * consumes; the leading format-version byte is the caller's, written
    * once per file). */
  def frameDvBlob(data: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + data.length + 4) // big-endian default
    buf.putInt(data.length)
    buf.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** The `u`-storage descriptor naming: `pathOrInlineDv` for a DV file
    * named `deletion_vector_<uuid>.bin` directly under the table root
    * (empty prefix — the spec allows any, and [[dvPath]] resolves it). */
  def z85OfUuid(uuid: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(uuid.getMostSignificantBits)
    b.putLong(uuid.getLeastSignificantBits)
    z85Encode(b.array())
  }

  // ---- descriptor JSON (the add/remove action field) -------------------------

  private lazy val descMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Serialize a descriptor as the action-field JSON — also the wire form
    * for shipping descriptors into executor tasks (a descriptor is
    * metadata-tiny; the DECODED row set is what must not ride the driver). */
  def descriptorJson(d: Descriptor): String = {
    def js(s: String) = descMapper.writeValueAsString(s)
    val off = d.offset.map(o => s""","offset":$o""").getOrElse("")
    s"""{"storageType":${js(d.storageType)},"pathOrInlineDv":${js(
      d.pathOrInlineDv)}$off,"sizeInBytes":${d.sizeInBytes},""" +
      s""""cardinality":${d.cardinality}}"""
  }

  def parseDescriptorJson(json: String): Descriptor = {
    val n = descMapper.readTree(json)
    Descriptor(
      n.get("storageType").asText(), n.get("pathOrInlineDv").asText(),
      Option(n.get("offset")).filterNot(_.isNull).map(_.asInt()),
      n.get("sizeInBytes").asInt(), n.get("cardinality").asLong())
  }

  // ---- descriptor resolution -----------------------------------------------

  private def uuidFromZ85(s: String): java.util.UUID = {
    val b = ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(b.getLong, b.getLong)
  }

  /** Absolute path of an on-disk DV ("u" resolves prefix + UUID under the
    * table root, "p" is already absolute). */
  def dvPath(tableUri: String, d: Descriptor): HPath = d.storageType match {
    case "p" => new HPath(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"deletion vector path too short: $enc")
      val prefix = enc.substring(0, enc.length - 20)
      val uuid = uuidFromZ85(enc.substring(enc.length - 20))
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new HPath(tableUri, name)
      else new HPath(new HPath(tableUri, prefix), name)
    case t => throw new IllegalArgumentException(s"deletion vector storageType `$t`")
  }

  /** Read + decode a descriptor into its deleted row indexes; the
    * cardinality cross-check catches both corrupt files and format drift. */
  def read(spark: SparkSession, tableUri: String, d: Descriptor): Array[Long] =
    read(spark.sparkContext.hadoopConfiguration, tableUri, d)

  /** Driver-free variant for EXECUTOR-side DV merges (the DML writer reads
    * a file's previous DV inside the task that writes its replacement). */
  def read(conf: org.apache.hadoop.conf.Configuration, tableUri: String,
           d: Descriptor): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        // Z85 works in 4-byte groups, so the encoded form may carry
        // trailing padding — sizeInBytes trims to the real payload
        val decoded = z85Decode(d.pathOrInlineDv)
        if (d.sizeInBytes > 0 && d.sizeInBytes <= decoded.length)
          java.util.Arrays.copyOf(decoded, d.sizeInBytes)
        else decoded
      case _ =>
        val p = dvPath(tableUri, d)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          val off = d.offset.getOrElse(1) // offset 0 would sit on the version byte
          in.seek(off.toLong)
          val sizeBytes = new Array[Byte](4)
          in.readFully(sizeBytes)
          val dataSize = ByteBuffer.wrap(sizeBytes).getInt // big-endian
          val blob = new Array[Byte](dataSize)
          in.readFully(blob)
          val crcBytes = new Array[Byte](4)
          in.readFully(crcBytes)
          val crc = new java.util.zip.CRC32()
          crc.update(blob)
          require(ByteBuffer.wrap(crcBytes).getInt == crc.getValue.toInt,
            s"deletion vector checksum mismatch in $p")
          blob
        } finally in.close()
    }
    val rows = deserializeBitmapArray(data)
    require(rows.length.toLong == d.cardinality,
      s"deletion vector cardinality ${d.cardinality} but decoded ${rows.length} rows")
    rows
  }
}
