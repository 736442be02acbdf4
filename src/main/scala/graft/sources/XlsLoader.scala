package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import ExcelLoader.{CBool, CEmpty, CFloat, CStr, CTs, Cell, Grid}

/** Pure-JDK legacy Excel (.xls) reader: a CFB compound container (MS-CFB)
  * holding a `Workbook` stream of BIFF8 records (MS-XLS). The reference
  * reads .xls through calamine (columnq/src/table/excel.rs:96-180); this
  * implements the same cell-record subset from the public format docs —
  * SST (with CONTINUE reassembly) / LABELSST, NUMBER, RK / MULRK, LABEL,
  * BOOLERR, FORMULA cached results (+ trailing STRING), BLANK skipped —
  * plus XF/FORMAT-driven date detection and DATEMODE (1904) handling,
  * mirroring the xlsx style path. BIFF5 and older are rejected loudly.
  *
  * Scale note: like every spreadsheet source, a workbook is one
  * driver-parsed in-memory document (the reference MemTable shape).
  */
object XlsLoader {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"xls: $msg")

  // ---- CFB container (MS-CFB) ----------------------------------------------

  private val FREESECT = 0xFFFFFFFF
  private val ENDOFCHAIN = 0xFFFFFFFE

  /** Sector chains of the compound file, resolved eagerly. */
  private final class Cfb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 &&
      buf.getLong(0) == 0xE11AB1A1E011CFD0L, // D0 CF 11 E0 A1 B1 1A E1 LE
      "xls: not a compound (CFB) file — bad signature")
    private val sectorShift = buf.getShort(30).toInt
    private val sectorSize = 1 << sectorShift
    private val miniSize = 1 << buf.getShort(32).toInt
    private val numFat = buf.getInt(44)
    private val firstDir = buf.getInt(48)
    private val miniCutoff = buf.getInt(56)
    private val firstMiniFat = buf.getInt(60)
    private val numMiniFat = buf.getInt(64)
    private val firstDifat = buf.getInt(68)

    /** Sector payload offset: header occupies one full sector slot. */
    private def sectorAt(i: Int): Int = (i + 1) << sectorShift

    private def u32s(off: Int, n: Int): Seq[Int] =
      (0 until n).map(k => buf.getInt(off + 4 * k))

    // DIFAT: 109 header entries + chained DIFAT sectors (last u32 = next)
    private val fatSectors: Seq[Int] = {
      val head = u32s(76, 109)
      val rest = mutable.ArrayBuffer[Int]()
      var s = firstDifat
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && guard < (1 << 20)) {
        val entries = u32s(sectorAt(s), sectorSize / 4)
        rest ++= entries.dropRight(1)
        s = entries.last
        guard += 1
      }
      (head ++ rest).filter(_ != FREESECT).take(numFat)
    }

    private val fat: Array[Int] = {
      val out = Array.newBuilder[Int]
      fatSectors.foreach(s => out ++= u32s(sectorAt(s), sectorSize / 4))
      out.result()
    }

    private def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = mutable.ArrayBuffer[Int]()
      var s = start
      while (s != ENDOFCHAIN && s != FREESECT) {
        require(s >= 0 && s < table.length, s"xls: sector chain out of range: $s")
        out += s
        require(out.length <= table.length, "xls: cyclic sector chain")
        s = table(s)
      }
      out.toSeq
    }

    private def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start, fat).foreach { s =>
        out.write(bytes, sectorAt(s), math.min(sectorSize, bytes.length - sectorAt(s)))
      }
      val all = out.toByteArray
      if (size >= all.length) all else all.take(size.toInt)
    }

    /** 128-byte directory entries: (name, type, startSector, size). */
    private val dirEntries: Seq[(String, Int, Int, Long)] = {
      val dir = readChain(firstDir, Long.MaxValue)
      (0 until dir.length / 128).map { i =>
        val e = ByteBuffer.wrap(dir, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = e.getShort(i * 128 + 64).toInt
        val name = if (nameLen >= 2)
          new String(dir, i * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
        (name, dir(i * 128 + 66).toInt, e.getInt(i * 128 + 116),
          e.getLong(i * 128 + 120))
      }
    }

    private val root = dirEntries.find(_._2 == 5).getOrElse(fail("no root directory entry"))

    private lazy val miniFat: Array[Int] = {
      val out = Array.newBuilder[Int]
      if (numMiniFat > 0)
        chain(firstMiniFat, fat).foreach(s => out ++= u32s(sectorAt(s), sectorSize / 4))
      out.result()
    }
    private lazy val miniStream: Array[Byte] = readChain(root._3, root._4)

    /** Stream payload by directory name; small streams live in the mini
      * stream addressed through the miniFAT. */
    def stream(name: String): Option[Array[Byte]] =
      dirEntries.find(e => e._2 == 2 && e._1 == name).map { case (_, _, start, size) =>
        if (size >= miniCutoff) readChain(start, size)
        else {
          val out = new java.io.ByteArrayOutputStream()
          chain(start, miniFat).foreach { s =>
            out.write(miniStream, s * miniSize,
              math.min(miniSize, miniStream.length - s * miniSize))
          }
          out.toByteArray.take(size.toInt)
        }
      }
  }

  // ---- BIFF8 record stream ---------------------------------------------------

  private final case class Rec(id: Int, data: Array[Byte], pos: Int)

  private def records(wb: Array[Byte]): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    var p = 0
    while (p + 4 <= wb.length) {
      val id = buf.getShort(p) & 0xFFFF
      val len = buf.getShort(p + 2) & 0xFFFF
      if (id == 0) p = wb.length // trailing padding
      else {
        require(p + 4 + len <= wb.length, s"xls: record 0x${id.toHexString} overruns stream")
        out += Rec(id, java.util.Arrays.copyOfRange(wb, p + 4, p + 4 + len), p)
        p += 4 + len
      }
    }
    out.result()
  }

  /** Cursor over a list of data segments (a record plus its CONTINUE
    * payloads). BIFF8 splits strings only at character boundaries, with a
    * fresh flags byte at each continuation (MS-XLS 2.5.268); fixed-width
    * fields never straddle a boundary. */
  private final class SegCursor(segs: Vector[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def seg = segs(si)
    private def ensure(): Unit =
      while (off >= seg.length && si < segs.length - 1) { si += 1; off = 0 }
    def atSegmentStart: Boolean = { ensure(); off == 0 && si > 0 }
    def u8(): Int = { ensure(); val v = seg(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = u16() | (u16() << 16)
    def bytes(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var k = 0
      while (k < n) { ensure(); val take = math.min(n - k, seg.length - off)
        System.arraycopy(seg, off, out, k, take); off += take; k += take }
      out
    }
    def skip(n: Int): Unit = { val _ = bytes(n) }
    /** Characters of an XLUnicodeRichExtendedString body, resuming the
      * per-segment width flag at each continuation boundary. */
    def chars(cch: Int, wideAtStart: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var wide = wideAtStart
      var left = cch
      while (left > 0) {
        ensure()
        if (atSegmentStart) wide = (u8() & 1) != 0 // fresh grbit on continuation
        val avail = (seg.length - off) / (if (wide) 2 else 1)
        val take = math.min(left, math.max(avail, 1))
        if (wide) {
          val b = bytes(take * 2)
          sb.append(new String(b, java.nio.charset.StandardCharsets.UTF_16LE))
        } else {
          val b = bytes(take)
          var k = 0
          while (k < take) { sb.append((b(k) & 0xFF).toChar); k += 1 }
        }
        left -= take
      }
      sb.toString
    }
  }

  /** Shared string table: [total u32][unique u32] then unique strings,
    * spliced across CONTINUE records. */
  private def parseSst(sst: Rec, continues: Vector[Rec]): Vector[String] = {
    val cur = new SegCursor(sst.data +: continues.map(_.data))
    cur.skip(4)
    val unique = cur.u32()
    (0 until unique).map { _ =>
      val cch = cur.u16()
      val flags = cur.u8()
      val wide = (flags & 1) != 0
      val rich = (flags & 8) != 0
      val ext = (flags & 4) != 0
      val cRun = if (rich) cur.u16() else 0
      val cbExt = if (ext) cur.u32() else 0
      val s = cur.chars(cch, wide)
      cur.skip(4 * cRun + cbExt)
      s
    }.toVector
  }

  /** XLUnicodeString inside a single record (LABEL, FORMAT, STRING). */
  /** XLUnicodeString: cch u16, flags u8 (bit0 wide, bit3 rich runs, bit2
    * ext), then optional cRun u16 / cbExtRst u32 headers BEFORE the
    * characters — same layout [[parseSst]] walks; ignoring the rich/ext
    * headers would read run counts as character bytes. */
  private[sources] def unicodeString(b: ByteBuffer, at: Int): String = {
    val cch = b.getShort(at) & 0xFFFF
    val flags = b.get(at + 2) & 0xFF
    val wide = (flags & 1) != 0
    var p = at + 3
    if ((flags & 0x08) != 0) p += 2 // cRun (rich formatting run count)
    if ((flags & 0x04) != 0) p += 4 // cbExtRst (phonetic/ext block size)
    if (wide) new String(b.array(), p, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else {
      val sb = new java.lang.StringBuilder(cch)
      (0 until cch).foreach(i => sb.append((b.get(p + i) & 0xFF).toChar))
      sb.toString
    }
  }

  private def rkValue(rk: Int): Double = {
    val v = if ((rk & 2) != 0) (rk >> 2).toDouble
    else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  // ---- workbook assembly -----------------------------------------------------

  def readXls(bytes: Array[Byte]): Seq[(String, Grid)] = {
    val cfb = new Cfb(bytes)
    val wb = cfb.stream("Workbook").orElse(cfb.stream("Book"))
      .getOrElse(fail("no Workbook stream in compound file"))
    val recs = records(wb)
    require(recs.nonEmpty && recs.head.id == 0x0809, "xls: stream does not start with BOF")
    val vers = ByteBuffer.wrap(recs.head.data).order(ByteOrder.LITTLE_ENDIAN).getShort(0) & 0xFFFF
    require(vers == 0x0600, f"xls: BIFF version 0x$vers%04x unsupported (need BIFF8/0x0600)")

    // globals substream: sheet directory, SST, XF -> ifmt, FORMAT codes, 1904
    var sheets = Vector.empty[(String, Int)] // (name, stream offset of sheet BOF)
    var shared = Vector.empty[String]
    val xfFmt = mutable.ArrayBuffer[Int]()
    val fmtCodes = mutable.Map[Int, String]()
    var date1904 = false
    var i = 0
    while (i < recs.length && recs(i).id != 0x000A) {
      val r = recs(i)
      val b = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
      r.id match {
        case 0x0085 => // BOUNDSHEET: lbPlyPos, visibility/type, ShortXLUnicodeString
          val pos = b.getInt(0)
          val cch = r.data(6) & 0xFF
          val wide = (r.data(7) & 1) != 0
          val name = if (wide)
            new String(r.data, 8, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else new String(r.data.map(x => (x & 0xFF).toChar), 8, cch)
          if ((r.data(5) & 0xFF) == 0) sheets :+= (name, pos) // worksheets only
        case 0x00FC =>
          val cont = mutable.ArrayBuffer[Rec]()
          var j = i + 1
          while (j < recs.length && recs(j).id == 0x003C) { cont += recs(j); j += 1 }
          shared = parseSst(r, cont.toVector)
        case 0x00E0 => xfFmt += (b.getShort(2) & 0xFFFF) // XF: ifmt
        case 0x041E => fmtCodes(b.getShort(0) & 0xFFFF) = unicodeString(b, 2)
        case 0x0022 => date1904 = (b.getShort(0) & 1) != 0
        case _ => ()
      }
      i += 1
    }

    val dateXf: Set[Int] = xfFmt.zipWithIndex.collect {
      case (ifmt, xf) if ExcelLoader.builtinDate(ifmt) ||
        fmtCodes.get(ifmt).exists(ExcelLoader.codeIsDate) => xf
    }.toSet
    val epochShift = if (date1904) 1462.0 else 0.0
    def numCell(v: Double, ixfe: Int): Cell =
      if (dateXf(ixfe)) CTs(ExcelLoader.serialToTs(v + epochShift)) else CFloat(v)

    sheets.map { case (name, pos) =>
      val start = recs.indexWhere(_.pos == pos)
      require(start >= 0, s"xls: sheet `$name` BOF offset $pos not on a record boundary")
      val cells = mutable.Map[(Int, Int), Cell]()
      var maxRow = -1; var maxCol = -1
      def put(row: Int, colIdx: Int, c: Cell): Unit = if (c != CEmpty) {
        cells((row, colIdx)) = c
        if (row > maxRow) maxRow = row
        if (colIdx > maxCol) maxCol = colIdx
      }
      var j = start + 1
      while (j < recs.length && recs(j).id != 0x000A) {
        val r = recs(j)
        val b = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
        def row = b.getShort(0) & 0xFFFF
        def colIdx = b.getShort(2) & 0xFFFF
        def ixfe = b.getShort(4) & 0xFFFF
        r.id match {
          case 0x00FD => // LABELSST
            val isst = b.getInt(6)
            require(isst >= 0 && isst < shared.length, s"xls: SST index $isst out of range")
            put(row, colIdx, CStr(shared(isst)))
          case 0x0203 => put(row, colIdx, numCell(b.getDouble(6), ixfe)) // NUMBER
          case 0x027E => put(row, colIdx, numCell(rkValue(b.getInt(6)), ixfe)) // RK
          case 0x00BD => // MULRK: row, colFirst, [ixfe u16 + rk u32]*, colLast
            val n = (r.data.length - 6) / 6
            (0 until n).foreach { k =>
              put(row, colIdx + k, numCell(rkValue(b.getInt(4 + 6 * k + 2)),
                b.getShort(4 + 6 * k) & 0xFFFF))
            }
          case 0x0204 => put(row, colIdx, CStr(unicodeString(b, 6))) // LABEL
          case 0x0205 => // BOOLERR
            if ((r.data(7) & 0xFF) != 0)
              fail(f"error cell at row $row col $colIdx (0x${r.data(6) & 0xFF}%02x)")
            put(row, colIdx, CBool(r.data(6) != 0))
          case 0x0006 => // FORMULA: cached result
            if ((b.getShort(12) & 0xFFFF) == 0xFFFF) (r.data(6) & 0xFF) match {
              case 0 => // string result in the trailing STRING record
                var k = j + 1
                while (k < recs.length && recs(k).id != 0x0207 && recs(k).id != 0x000A) k += 1
                require(k < recs.length && recs(k).id == 0x0207,
                  s"xls: formula at row $row col $colIdx has no cached STRING")
                put(row, colIdx, CStr(unicodeString(
                  ByteBuffer.wrap(recs(k).data).order(ByteOrder.LITTLE_ENDIAN), 0)))
              case 1 => put(row, colIdx, CBool(r.data(8) != 0))
              case 2 => fail(s"formula error cell at row $row col $colIdx")
              case _ => () // 3 = empty string result
            } else put(row, colIdx, numCell(b.getDouble(6), ixfe))
          case _ => () // BLANK/MULBLANK/ROW/dimensions/etc: no cell value
        }
        j += 1
      }
      val grid: Grid = (0 to maxRow).toVector.map { rr =>
        (0 to maxCol).toVector.map(cc => cells.getOrElse((rr, cc), CEmpty))
      }
      (name, grid)
    }
  }
}
