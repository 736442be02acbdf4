package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.XMLStreamConstants

import scala.collection.mutable

/** Pure-JDK Excel Binary Workbook (.xlsb) reader — no POI/calamine.
  *
  * The reference reads xlsb through calamine's `Xlsb` backend
  * (reference: columnq/src/table/excel.rs:96-180 routes all four Excel
  * formats through `calamine::open_workbook_auto`). This implements the
  * public MS-XLSB format directly: an OPC zip container (like xlsx) whose
  * parts are streams of BIFF12 binary records instead of XML.
  *
  * Record framing (MS-XLSB §2.1.4): record type is 1-2 bytes (7 data bits
  * per byte, high bit of the first byte marks a second byte); record length
  * is 1-4 bytes (7 data bits per byte, high bit marks continuation).
  *
  * Parts read:
  *   - `xl/workbook.bin` — BrtBundleSh records: sheet order, names, rIds;
  *   - `xl/_rels/workbook.bin.rels` — XML (rels stay XML in xlsb) rId→part;
  *   - `xl/sharedStrings.bin` — BrtSSTItem records;
  *   - `xl/styles.bin` — BrtFmt custom format codes + cellXFs iFmt list,
  *     feeding the same date-format detection as the xlsx path
  *     ([[ExcelLoader.builtinDate]] / [[ExcelLoader.codeIsDate]]);
  *   - `xl/worksheets/sheetN.bin` — BrtRowHdr + cell records.
  *
  * Cached formula results are surfaced as plain values (like calamine);
  * error cells raise, matching the xlsx branch. Scale note: one workbook is
  * a driver-parsed document (MemTable parity) — spreadsheets are a
  * config/small-dim source, not a fact format.
  */
object XlsbLoader {
  import ExcelLoader.{CBool, CEmpty, CFloat, CStr, CTs, Cell, Grid}

  // BIFF12 record ids (MS-XLSB §2.3)
  private val BrtRowHdr = 0
  private val BrtCellRk = 2
  private val BrtCellError = 3
  private val BrtCellBool = 4
  private val BrtCellReal = 5
  private val BrtCellSt = 6
  private val BrtCellIsst = 7
  private val BrtFmlaString = 8
  private val BrtFmlaNum = 9
  private val BrtFmlaBool = 10
  private val BrtFmlaError = 11
  private val BrtSSTItem = 19
  private val BrtFmt = 44
  private val BrtXF = 47
  private val BrtCellRString = 62
  private val BrtWbProp = 153
  private val BrtBundleSh = 156
  private val BrtBeginCellXFs = 617
  private val BrtEndCellXFs = 618

  /** Sequential BIFF12 record reader over one part. Truncated or corrupt
    * parts fail with contextual IllegalArgumentExceptions, never raw
    * index errors (the loader's read-or-fail-loudly contract). */
  private final class Biff12(data: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < data.length

    private def byte(): Int = {
      require(pos < data.length, s"xlsb: part truncated mid-record header at byte $pos")
      val b = data(pos) & 0xFF; pos += 1; b
    }

    /** (recordId, payload). */
    def next(): (Int, Array[Byte]) = {
      val b0 = byte()
      val id =
        if ((b0 & 0x80) == 0) b0
        else (b0 & 0x7F) | ((byte() & 0x7F) << 7)
      var len = 0; var shift = 0; var more = true
      while (more) {
        val b = byte()
        len |= (b & 0x7F) << shift
        shift += 7
        more = (b & 0x80) != 0 && shift < 28
      }
      require(pos + len <= data.length, s"xlsb: record $id overruns part (len=$len)")
      val payload = java.util.Arrays.copyOfRange(data, pos, pos + len)
      pos += len
      id -> payload
    }
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def f64(b: Array[Byte], off: Int): Double =
    java.lang.Double.longBitsToDouble(
      (i32(b, off).toLong & 0xFFFFFFFFL) | (i32(b, off + 4).toLong << 32))

  /** XLWideString at `off`: (value, bytesConsumed). cch == 0xFFFFFFFF is the
    * nullable form's "no string". */
  private def wideString(b: Array[Byte], off: Int): (String, Int) = {
    require(off + 4 <= b.length, s"xlsb: string length field overruns record")
    val cch = i32(b, off)
    if (cch == -1) ("", 4)
    else {
      require(cch >= 0 && off + 4 + cch.toLong * 2 <= b.length,
        s"xlsb: string of $cch chars overruns record (${b.length} bytes)")
      val s = new String(b, off + 4, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
      (s, 4 + cch * 2)
    }
  }

  /** BIFF12 RkNumber: bit0 = ÷100, bit1 = 30-bit int vs double-high-bits —
    * same packing as BIFF8 ([[XlsLoader]]). */
  private def rkValue(rk: Int): Double = {
    val v = if ((rk & 2) != 0) (rk >> 2).toDouble
    else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  def readXlsb(bytes: Array[Byte]): Seq[(String, Grid)] = {
    val parts = ExcelLoader.zipEntries(bytes)
    def part(n: String): Option[Array[Byte]] = parts.get(n)

    // sheet list: BrtBundleSh = hsState u32, iTabID u32, strRelID
    // (XLNullableWideString), strName (XLWideString). BrtWbProp carries the
    // date-system flag (bit 0 = 1904 epoch), which shifts EVERY date cell
    // by 1462 days — same handling as the BIFF8 DATEMODE record.
    val sheetDefs = mutable.ArrayBuffer[(String, String)]() // (name, rId)
    var date1904 = false
    part("xl/workbook.bin").foreach { wb =>
      val r = new Biff12(wb)
      while (r.hasNext) r.next() match {
        case (BrtBundleSh, p) =>
          val (rid, n1) = wideString(p, 8)
          val (name, _) = wideString(p, 8 + n1)
          sheetDefs += name -> rid
        case (BrtWbProp, p) if p.length >= 4 =>
          date1904 = (i32(p, 0) & 0x1) != 0
        case _ => ()
      }
    }
    require(sheetDefs.nonEmpty, "xlsb: workbook.bin has no sheets")
    val epochShift = if (date1904) 1462.0 else 0.0

    // rels are XML even in xlsb
    val relTargets = mutable.Map[String, String]()
    part("xl/_rels/workbook.bin.rels").foreach { rels =>
      val r = ExcelLoader.xmlFactory.createXMLStreamReader(new ByteArrayInputStream(rels))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
          var id = ""; var target = ""
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "Id" => id = r.getAttributeValue(i)
              case "Target" => target = r.getAttributeValue(i)
              case _ => ()
            }
          }
          relTargets(id) = target
        }
      }
      r.close()
    }

    // shared strings: BrtSSTItem = flags u8 (rich/ext runs follow the base
    // string; the base string is all calamine surfaces too), XLWideString
    val shared: Vector[String] = part("xl/sharedStrings.bin").map { ss =>
      val r = new Biff12(ss)
      val acc = Vector.newBuilder[String]
      while (r.hasNext) r.next() match {
        case (BrtSSTItem, p) => acc += wideString(p, 1)._1
        case _ => ()
      }
      acc.result()
    }.getOrElse(Vector.empty)

    // styles: custom numFmt codes + cellXFs (ixfeParent u16, iFmt u16, ...)
    val dateStyles: Set[Int] = part("xl/styles.bin").map { st =>
      val customFmt = mutable.Map[Int, String]()
      val xfFmts = mutable.ArrayBuffer[Int]()
      var inCellXfs = false
      val r = new Biff12(st)
      while (r.hasNext) r.next() match {
        case (BrtFmt, p) =>
          customFmt(u16(p, 0)) = wideString(p, 2)._1
        case (BrtBeginCellXFs, _) => inCellXfs = true
        case (BrtEndCellXFs, _) => inCellXfs = false
        case (BrtXF, p) if inCellXfs => xfFmts += u16(p, 2)
        case _ => ()
      }
      xfFmts.zipWithIndex.collect {
        case (fmtId, styleIdx) if ExcelLoader.builtinDate(fmtId) ||
          customFmt.get(fmtId).exists(ExcelLoader.codeIsDate) => styleIdx
      }.toSet
    }.getOrElse(Set.empty)

    sheetDefs.toSeq.map { case (name, rid) =>
      val target = relTargets.getOrElse(rid,
        throw new IllegalArgumentException(s"xlsb: no relationship for sheet `$name` ($rid)"))
      val path = if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
      val sheetBin = part(path).getOrElse(throw new IllegalArgumentException(
        s"xlsb: missing worksheet part `$path` for sheet `$name`"))
      name -> parseSheet(sheetBin, shared, dateStyles, epochShift)
    }
  }

  /** Cell records share an 8-byte header: col u32, iStyleRef u24 + flags u8;
    * the payload follows at offset 8. Row position comes from the preceding
    * BrtRowHdr (rw u32). */
  private def parseSheet(bin: Array[Byte], shared: Vector[String],
                         dateStyles: Set[Int], epochShift: Double): Grid = {
    val cells = mutable.Map[(Int, Int), Cell]()
    var maxRow = -1; var maxCol = -1
    var row = -1
    val r = new Biff12(bin)

    def numCell(p: Array[Byte], v: Double): Cell = {
      val style = i32(p, 4) & 0xFFFFFF
      if (dateStyles(style)) CTs(ExcelLoader.serialToTs(v + epochShift)) else CFloat(v)
    }

    def put(col: Int, c: Cell): Unit = if (c != CEmpty) {
      require(row >= 0, s"xlsb: cell record at col $col before any BrtRowHdr")
      cells((row, col)) = c
      if (row > maxRow) maxRow = row
      if (col > maxCol) maxCol = col
    }

    while (r.hasNext) {
      val (id, p) = r.next()
      id match {
        case BrtRowHdr => row = i32(p, 0)
        case BrtCellRk => put(i32(p, 0), numCell(p, rkValue(i32(p, 8))))
        case BrtCellReal | BrtFmlaNum => put(i32(p, 0), numCell(p, f64(p, 8)))
        case BrtCellBool | BrtFmlaBool => put(i32(p, 0), CBool(p(8) != 0))
        case BrtCellIsst =>
          val idx = i32(p, 8)
          require(idx >= 0 && idx < shared.length, s"xlsb: SST index $idx out of range")
          put(i32(p, 0), CStr(shared(idx)))
        case BrtCellSt | BrtFmlaString => put(i32(p, 0), CStr(wideString(p, 8)._1))
        // inline RICH string cell: one flags byte precedes the base string
        // (formatting runs after it are presentation-only, like the SST items)
        case BrtCellRString => put(i32(p, 0), CStr(wideString(p, 9)._1))
        case BrtCellError | BrtFmlaError => throw new IllegalArgumentException(
          s"xlsb: error cell at row $row col ${i32(p, 0)} (0x${(p(8) & 0xFF).toHexString})")
        case _ => () // dimension, col-info, begin/end wrappers: positional no-ops
      }
    }

    (0 to maxRow).toVector.map { rr =>
      (0 to maxCol).toVector.map(cc => cells.getOrElse((rr, cc), CEmpty))
    }
  }
}
