package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Builds .xlsb fixtures byte-by-byte from the public MS-XLSB spec — no
  * binary-Excel writer exists offline (the reference repo ships only
  * .xlsx/.ods), mirroring the approach of [[XlsFixture]] for BIFF8. */
object XlsbFixture {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >>> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xFFFF) ++ le16(v >>> 16)
  private def f64(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    le32((bits & 0xFFFFFFFFL).toInt) ++ le32((bits >>> 32).toInt)
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  /** BIFF12 varint record id: 7 bits per byte, high bit of byte 0 marks a
    * second byte (ids >= 0x80 REQUIRE the two-byte form). */
  private def varId(id: Int): Array[Byte] =
    if (id < 0x80) Array(id.toByte)
    else Array((0x80 | (id & 0x7F)).toByte, ((id >> 7) & 0x7F).toByte)

  /** BIFF12 varint length: 7 bits per byte, high bit = continuation. */
  private def varLen(len: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var v = len
    do {
      val b = v & 0x7F
      v >>>= 7
      out += (if (v != 0) (b | 0x80) else b).toByte
    } while (v != 0)
    out.toArray
  }

  def rec(id: Int, body: Array[Byte]*): Array[Byte] = {
    val payload = cat(body: _*)
    cat(varId(id), varLen(payload.length), payload)
  }

  /** XLWideString: cch u32 + UTF-16LE code units. */
  def ws(s: String): Array[Byte] =
    cat(le32(s.length), s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))

  /** Shared 8-byte cell header: col u32, iStyleRef u24 | flags u8. */
  private def cellHead(col: Int, style: Int): Array[Byte] =
    cat(le32(col), le32(style & 0xFFFFFF))

  def rkInt(v: Int, div100: Boolean = false): Int =
    (v << 2) | 2 | (if (div100) 1 else 0)
  def rkF64(v: Double, div100: Boolean = false): Int = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (((bits >>> 32) & 0xFFFFFFFCL).toInt) | (if (div100) 1 else 0)
  }

  // cell records
  def cRk(col: Int, rk: Int, style: Int = 0): Array[Byte] =
    rec(2, cellHead(col, style), le32(rk))
  def cErr(col: Int, code: Int): Array[Byte] =
    rec(3, cellHead(col, 0), Array(code.toByte))
  def cBool(col: Int, v: Boolean): Array[Byte] =
    rec(4, cellHead(col, 0), Array((if (v) 1 else 0).toByte))
  def cReal(col: Int, v: Double, style: Int = 0): Array[Byte] =
    rec(5, cellHead(col, style), f64(v))
  def cSt(col: Int, s: String): Array[Byte] = rec(6, cellHead(col, 0), ws(s))
  def cIsst(col: Int, idx: Int): Array[Byte] = rec(7, cellHead(col, 0), le32(idx))
  def cFmlaStr(col: Int, s: String): Array[Byte] =
    rec(8, cellHead(col, 0), ws(s), le16(0)) // trailing grbit+rgce ignored
  def cFmlaNum(col: Int, v: Double, style: Int = 0): Array[Byte] =
    rec(9, cellHead(col, style), f64(v), le16(0))
  def cFmlaBool(col: Int, v: Boolean): Array[Byte] =
    rec(10, cellHead(col, 0), Array((if (v) 1 else 0).toByte), le16(0))
  def rowHdr(rw: Int): Array[Byte] =
    rec(0, le32(rw), le32(0), le16(0x0130), Array(0.toByte, 0.toByte))

  private def sstBin(strings: Seq[String]): Array[Byte] =
    cat((rec(159, le32(strings.length), le32(strings.length)) +:
      strings.map(s => rec(19, Array(0.toByte), ws(s)))): _*)

  /** styles.bin: one custom date format (164) + cellXFs [general, builtin
    * date 14, custom 164] → date style indices 1 and 2. */
  private def stylesBin: Array[Byte] = cat(
    rec(44, le16(164), ws("yyyy\\-mm\\-dd")),
    rec(617, le32(3)),
    rec(47, le16(0xFFFF), le16(0), cat(le16(0), le16(0), le32(0))),
    rec(47, le16(0xFFFF), le16(14), cat(le16(0), le16(0), le32(0))),
    rec(47, le16(0xFFFF), le16(164), cat(le16(0), le16(0), le32(0))),
    rec(618))

  private def bundleSh(name: String, rid: String, tabId: Int): Array[Byte] =
    rec(156, le32(0), le32(tabId), ws(rid), ws(name))

  private def relsXml(n: Int): Array[Byte] =
    ("""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      (1 to n).map(i =>
        s"""<Relationship Id="rId$i" Type="http://schemas.microsoft.com/office/2006/relationships/xlBinary" Target="worksheets/sheet$i.bin"/>""")
        .mkString + "</Relationships>").getBytes("UTF-8")

  private def zip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (n, b) =>
      z.putNextEntry(new ZipEntry(n)); z.write(b); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  val longK: String = "k" * 200 // payload > 127 bytes → two-byte varint length

  /** Two sheets covering every cell record type + both date-style paths. */
  def workbook: Array[Byte] = {
    val shared = Seq("name", "qty", "alpha", "beta")
    val sheet1 = cat(
      rowHdr(0),
      cIsst(0, 0), cIsst(1, 1), cSt(2, "price"), cSt(3, "flag"),
      cSt(4, "when"), cSt(5, "disc"), cSt(6, "note"),
      rowHdr(1),
      cIsst(0, 2), cRk(1, rkInt(42)), cReal(2, 1.5), cBool(3, v = true),
      cReal(4, 45000.5, style = 1), cRk(5, rkF64(1.25, div100 = true)),
      cFmlaStr(6, "calc"),
      rowHdr(2),
      cIsst(0, 3), cRk(1, rkInt(700, div100 = true)), cFmlaNum(2, 2.5),
      cFmlaBool(3, v = false), cReal(4, 44000.0, style = 2), cReal(5, 3.25),
      cSt(6, "gamma"))
    val sheet2 = cat(
      rowHdr(0), cSt(0, "k"), cSt(1, "v"), cSt(2, "w"),
      rowHdr(1), cSt(0, longK), /* col 1 blank */ cReal(2, 9.0))
    zip(
      "xl/workbook.bin" -> cat(bundleSh("main", "rId1", 1), bundleSh("data", "rId2", 2)),
      "xl/_rels/workbook.bin.rels" -> relsXml(2),
      "xl/sharedStrings.bin" -> sstBin(shared),
      "xl/styles.bin" -> stylesBin,
      "xl/worksheets/sheet1.bin" -> sheet1,
      "xl/worksheets/sheet2.bin" -> sheet2)
  }

  def errorWorkbook: Array[Byte] = zip(
    "xl/workbook.bin" -> bundleSh("main", "rId1", 1),
    "xl/_rels/workbook.bin.rels" -> relsXml(1),
    "xl/worksheets/sheet1.bin" -> cat(
      rowHdr(0), cSt(0, "a"),
      rowHdr(1), cErr(0, 0x2A)))

  /** Inline RICH string cell (BrtCellRString 62): flags byte + base string. */
  def cRStr(col: Int, s: String): Array[Byte] =
    rec(62, cat(le32(col), le32(0)), Array(0.toByte), ws(s))

  /** 1904 date system (BrtWbProp bit 0) + a rich-string cell. */
  def extrasWorkbook: Array[Byte] = zip(
    "xl/workbook.bin" -> cat(rec(153, le32(1)), bundleSh("main", "rId1", 1)),
    "xl/_rels/workbook.bin.rels" -> relsXml(1),
    "xl/styles.bin" -> stylesBin,
    "xl/worksheets/sheet1.bin" -> cat(
      rowHdr(0), cSt(0, "when"), cSt(1, "note"),
      rowHdr(1), cReal(0, 100.5, style = 1), cRStr(1, "rich text")))

  /** A workbook whose sheet part is cut mid-record. */
  def truncatedWorkbook: Array[Byte] = {
    val sheet = cat(rowHdr(0), cSt(0, "k"), cSt(1, XlsbFixture.longK))
    zip(
      "xl/workbook.bin" -> bundleSh("main", "rId1", 1),
      "xl/_rels/workbook.bin.rels" -> relsXml(1),
      "xl/worksheets/sheet1.bin" -> sheet.take(sheet.length / 2))
  }

  def write(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, bytes)
    p.toString
  }
}

class XlsbLoaderSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private lazy val tmp = Files.createTempDirectory("xlsb_fixture").toString

  test(".xlsb end-to-end: every cell record type, RK packing, date styles") {
    val path = XlsbFixture.write(tmp, "small.xlsb", XlsbFixture.workbook)
    val df = Loaders.load(spark, TableSource("small", path))
    assert(df.schema === StructType(Seq(
      StructField("name", StringType, nullable = true),
      StructField("qty", DoubleType, nullable = true),
      StructField("price", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("when", TimestampType, nullable = true),
      StructField("disc", DoubleType, nullable = true),
      StructField("note", StringType, nullable = true))))
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getString(0) === "alpha" && r1.getDouble(1) === 42.0 &&
      r1.getDouble(2) === 1.5 && r1.getBoolean(3))
    assert(r1.getTimestamp(4) === ExcelLoader.serialToTs(45000.5)) // builtin fmt 14
    assert(r1.getDouble(5) === 0.0125) // RK f64 ÷100
    assert(r1.getString(6) === "calc") // cached formula string
    val r2 = rows(1)
    assert(r2.getString(0) === "beta" && r2.getDouble(1) === 7.0 && // RK int ÷100
      r2.getDouble(2) === 2.5 && !r2.getBoolean(3)) // cached formula num + bool
    assert(r2.getTimestamp(4) === ExcelLoader.serialToTs(44000.0)) // custom yyyy-mm-dd
    assert(r2.getDouble(5) === 3.25 && r2.getString(6) === "gamma")
  }

  test("sheet_name selection, blank-gap null, multi-byte record length") {
    val path = XlsbFixture.write(tmp, "two.xlsb", XlsbFixture.workbook)
    val df = Loaders.load(spark, TableSource("d", path,
      options = Map("sheet_name" -> "data")))
    assert(df.columns.toSeq === Seq("k", "v", "w"))
    val r = df.collect()(0)
    assert(r.getString(0) === XlsbFixture.longK) // 200-char cell: len varint = 2 bytes
    assert(r.isNullAt(1)) // skipped column arrives as null
    assert(r.getDouble(2) === 9.0)
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("d", path, options = Map("sheet_name" -> "nope")))
    }
    assert(e.getMessage.contains("main"))
  }

  test("1904 date system shifts serials 1462 days; rich-string cells load") {
    val path = XlsbFixture.write(tmp, "extras.xlsb", XlsbFixture.extrasWorkbook)
    val df = Loaders.load(spark, TableSource("x", path))
    val r = df.collect()(0)
    assert(r.getTimestamp(0) === ExcelLoader.serialToTs(100.5 + 1462.0))
    assert(r.getString(1) === "rich text")
  }

  test("truncated parts fail loudly with a contextual message") {
    val path = XlsbFixture.write(tmp, "trunc.xlsb", XlsbFixture.truncatedWorkbook)
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("t", path))
    }
    assert(e.getMessage.contains("xlsb:"))
  }

  test("error cells are rejected loudly, like the xlsx branch") {
    val path = XlsbFixture.write(tmp, "err.xlsb", XlsbFixture.errorWorkbook)
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("e", path))
    }
    assert(e.getMessage.contains("error cell"))
  }
}
