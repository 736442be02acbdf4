package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.{UTF_16LE, US_ASCII}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** BIFF8 .xls reading through a hand-assembled CFB container. No .xls
  * fixture exists anywhere offline (the reference repo ships only
  * .xlsx/.ods), so the fixtures are constructed byte-by-byte from the
  * public MS-CFB / MS-XLS layouts: the small workbook exercises the
  * mini-stream path (streams < 4096 live in the root entry's mini
  * sectors), the large one the regular FAT path plus SST CONTINUE
  * reassembly with mid-string width changes. */
object XlsFixture {

  private def le16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xFFFF) ++ le16(v >>> 16)
  private def f64(v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(v); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
  private def rec(id: Int, body: Array[Byte]*): Array[Byte] = {
    val data = cat(body: _*)
    cat(le16(id), le16(data.length), data)
  }

  /** XLUnicodeString: cch u16, grbit u8, chars. */
  private def uni(s: String, wide: Boolean = false): Array[Byte] =
    cat(le16(s.length), Array[Byte](if (wide) 1 else 0),
      if (wide) s.getBytes(UTF_16LE) else s.getBytes(US_ASCII))

  /** SST entry for a whole (unsplit) string. */
  private def sstEntry(s: String, wide: Boolean = false): Array[Byte] = uni(s, wide)

  /** 20-byte BIFF8 XF payload with the given number format id. */
  private def xf(ifmt: Int): Array[Byte] = cat(le16(0), le16(ifmt), new Array[Byte](16))

  private def cellHead(row: Int, colIdx: Int, ixfe: Int): Array[Byte] =
    cat(le16(row), le16(colIdx), le16(ixfe))

  def rkInt(v: Int, div100: Boolean = false): Int = (v << 2) | 2 | (if (div100) 1 else 0)
  def rkF64(v: Double, div100: Boolean = false): Int = {
    val hi = (java.lang.Double.doubleToLongBits(v) >>> 32).toInt
    (hi & 0xFFFFFFFC) | (if (div100) 1 else 0)
  }

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, le16(0x0600), le16(dt), new Array[Byte](12))

  /** The small workbook: globals (FORMAT/XF/SST/BOUNDSHEET) + one sheet
    * covering LABELSST, NUMBER, RK, MULRK, BOOLERR, FORMULA (string and
    * numeric results), LABEL, and date cells via builtin + custom formats. */
  def smallWorkbook: Array[Byte] = {
    val sst = Vector("name", "qty", "price", "flag", "note", "when", "disc",
      "alpha", "gamma")
    val sstBody = cat(le32(sst.length), le32(sst.length))
    // "price" deliberately wide (UTF-16) to cover the uncompressed branch
    val entries = cat(sst.map(s => sstEntry(s, wide = s == "price")): _*)

    val sheetName = "data"
    // globals with a BOUNDSHEET whose lbPlyPos needs patching post-layout
    def globals(pos: Int): Array[Byte] = cat(
      bof(0x0005),
      rec(0x0022, le16(0)),                       // DATEMODE 1900
      rec(0x041E, le16(164), uni("yyyy-mm-dd")),  // custom date format
      rec(0x00E0, xf(0)),   // XF 0: general
      rec(0x00E0, xf(14)),  // XF 1: builtin date
      rec(0x00E0, xf(164)), // XF 2: custom date
      rec(0x00E0, xf(4)),   // XF 3: plain number
      rec(0x00FC, sstBody, entries),
      rec(0x0085, le32(pos), Array[Byte](0, 0),
        Array[Byte](sheetName.length.toByte, 0), sheetName.getBytes(US_ASCII)),
      rec(0x000A))

    val sheet = cat(
      bof(0x0010),
      // header row: LABELSST 0..6
      cat((0 to 6).map(c => rec(0x00FD, cellHead(0, c, 0), le32(c))): _*),
      // row 1
      rec(0x00FD, cellHead(1, 0, 0), le32(7)),              // "alpha"
      rec(0x027E, cellHead(1, 1, 3), le32(rkInt(42))),      // qty: RK int
      rec(0x0203, cellHead(1, 2, 3), f64(1.5)),             // price: NUMBER
      rec(0x0205, cellHead(1, 3, 0), Array[Byte](1, 0)),    // flag: true
      // note: formula with cached STRING result
      rec(0x0006, cellHead(1, 4, 0),
        Array[Byte](0, 0, 0, 0, 0, 0, -1, -1), le16(0), le32(0), le16(0)),
      rec(0x0207, uni("calc")),
      rec(0x0203, cellHead(1, 5, 1), f64(45000.5)),         // when: builtin date
      rec(0x027E, cellHead(1, 6, 0), le32(rkF64(1.25, div100 = true))), // disc
      // row 2
      rec(0x0204, cellHead(2, 0, 0), uni("beta")),          // LABEL inline
      rec(0x00BD, le16(2), le16(1),                         // MULRK cols 1-2
        le16(3), le32(rkInt(7)), le16(3), le32(rkF64(2.5)), le16(2)),
      rec(0x0205, cellHead(2, 3, 0), Array[Byte](0, 0)),    // flag: false
      rec(0x00FD, cellHead(2, 4, 0), le32(8)),              // "gamma"
      rec(0x027E, cellHead(2, 5, 2), le32(rkInt(44000))),   // when: custom date
      // disc: formula with cached numeric result
      rec(0x0006, cellHead(2, 6, 0), f64(3.25), le16(0), le32(0), le16(0)),
      rec(0x000A))

    val base = globals(0).length
    cat(globals(base), sheet)
  }

  /** The large workbook: an SST split over two CONTINUE records with one
    * string resuming compressed and one switching to wide mid-string, plus
    * enough padding strings to push the stream past the 4096-byte mini
    * cutoff (forcing the regular-FAT read path). */
  def largeWorkbook: Array[Byte] = {
    val pads = (0 until 450).map(i => f"pad_$i%03d")
    val nStrings = 2 + 2 + pads.length // header + 2 split strings + padding
    val sstHead = cat(le32(nStrings), le32(nStrings))
    val headerEntries = cat(sstEntry("k"), sstEntry("v"))
    // string 2: "hello_world" split after "hello", continuation compressed
    val s2head = cat(le16(11), Array[Byte](0), "hello".getBytes(US_ASCII))
    val s2cont = cat(Array[Byte](0), "_world".getBytes(US_ASCII))
    // string 3: "wide-str" split after "wide", continuation wide
    val s3head = cat(le16(8), Array[Byte](0), "wide".getBytes(US_ASCII))
    val s3cont = cat(Array[Byte](1), "-str".getBytes(UTF_16LE))
    val padEntries = cat(pads.map(sstEntry(_)): _*)
    // SST record: counts + header strings + first half of string 2;
    // CONTINUE 1: rest of string 2 + first half of string 3;
    // CONTINUE 2: rest of string 3 + all padding strings
    val sstRec = rec(0x00FC, sstHead, headerEntries, s2head)
    val cont1 = rec(0x003C, s2cont, s3head)
    val cont2 = rec(0x003C, s3cont, padEntries)

    val sheetName = "big"
    def globals(pos: Int): Array[Byte] = cat(
      bof(0x0005),
      rec(0x00E0, xf(0)),
      sstRec, cont1, cont2,
      rec(0x0085, le32(pos), Array[Byte](0, 0),
        Array[Byte](sheetName.length.toByte, 0), sheetName.getBytes(US_ASCII)),
      rec(0x000A))

    val sheet = cat(
      bof(0x0010),
      rec(0x00FD, cellHead(0, 0, 0), le32(0)),
      rec(0x00FD, cellHead(0, 1, 0), le32(1)),
      rec(0x00FD, cellHead(1, 0, 0), le32(2)), // hello_world
      rec(0x00FD, cellHead(1, 1, 0), le32(3)), // wide-str
      rec(0x00FD, cellHead(2, 0, 0), le32(4)), // pad_000
      rec(0x00FD, cellHead(2, 1, 0), le32(4 + pads.length - 1)), // last pad
      rec(0x000A))

    val base = globals(0).length
    cat(globals(base), sheet)
  }

  // ---- CFB container writer -------------------------------------------------

  private val FREE = 0xFFFFFFFF
  private val END = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  private def pad(b: Array[Byte], to: Int): Array[Byte] =
    if (b.length >= to) b else cat(b, new Array[Byte](to - b.length))

  private def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
    val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val n = name.getBytes(UTF_16LE)
    e.put(n)
    e.putShort(64, ((name.length + 1) * 2).toShort)
    e.put(66, typ.toByte)
    e.put(67, 1.toByte) // black
    e.putInt(68, FREE); e.putInt(72, FREE); e.putInt(76, FREE) // no siblings
    e.putInt(116, start)
    e.putInt(120, size)
    e.array()
  }

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Int,
                     numMiniFat: Int, fatSectors: Seq[Int]): Array[Byte] = {
    val h = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    h.putLong(0, 0xE11AB1A1E011CFD0L)
    h.putShort(24, 0x3E.toShort); h.putShort(26, 3.toShort)  // minor/major
    h.putShort(28, 0xFFFE.toShort)                           // little-endian
    h.putShort(30, 9.toShort); h.putShort(32, 6.toShort)     // 512 / 64
    h.putInt(44, numFat)
    h.putInt(48, firstDir)
    h.putInt(56, 4096)
    h.putInt(60, firstMiniFat); h.putInt(64, numMiniFat)
    h.putInt(68, END); h.putInt(72, 0)                       // no DIFAT chain
    (0 until 109).foreach(k => h.putInt(76 + 4 * k,
      if (k < fatSectors.length) fatSectors(k) else FREE))
    h.array()
  }

  private def fatSector(entries: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 128).foreach(k => b.putInt(4 * k, if (k < entries.length) entries(k) else FREE))
    b.array()
  }

  /** Wrap a Workbook stream in a minimal v3 CFB file. Streams under the
    * 4096 cutoff go through the mini stream + miniFAT; larger ones chain
    * regular sectors straight from the FAT. */
  def cfb(workbook: Array[Byte]): Array[Byte] = {
    if (workbook.length < 4096) {
      // sectors: 0=FAT, 1=directory, 2=miniFAT, 3..=mini-stream container
      val miniSectors = (workbook.length + 63) / 64
      val container = pad(workbook, miniSectors * 64)
      val contSectors = (container.length + 511) / 512
      val fat = Seq(FATSECT, END, END) ++
        (0 until contSectors).map(k => if (k == contSectors - 1) END else 4 + k)
      val miniFat = (0 until miniSectors).map(k => if (k == miniSectors - 1) END else k + 1)
      val dir = pad(cat(
        dirEntry("Root Entry", 5, 3, container.length),
        dirEntry("Workbook", 2, 0, workbook.length)), 512)
      cat(header(1, 1, 2, 1, Seq(0)), fatSector(fat), dir,
        fatSector(miniFat), pad(container, contSectors * 512))
    } else {
      // sectors: 0=FAT, 1=directory, 2..=workbook
      val wbSectors = (workbook.length + 511) / 512
      require(wbSectors + 2 <= 128, "fixture exceeds one FAT sector")
      val fat = Seq(FATSECT, END) ++
        (0 until wbSectors).map(k => if (k == wbSectors - 1) END else 3 + k)
      val dir = pad(cat(
        dirEntry("Root Entry", 5, END, 0),
        dirEntry("Workbook", 2, 2, workbook.length)), 512)
      cat(header(1, 1, END, 0, Seq(0)), fatSector(fat), dir,
        pad(workbook, wbSectors * 512))
    }
  }

  def write(dir: String, name: String, wb: Array[Byte]): String = {
    val p = Paths.get(dir, name)
    Files.write(p, cfb(wb))
    p.toString
  }
}

class XlsLoaderSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get()
  private lazy val tmp = Files.createTempDirectory("xls_fixture").toString

  test("small .xls via the mini-stream path: all cell record types") {
    val path = XlsFixture.write(tmp, "small.xls", XlsFixture.smallWorkbook)
    val df = Loaders.load(spark, TableSource("small", path))
    assert(df.schema === StructType(Seq(
      StructField("name", StringType, nullable = true),
      StructField("qty", DoubleType, nullable = true),
      StructField("price", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("note", StringType, nullable = true),
      StructField("when", TimestampType, nullable = true),
      StructField("disc", DoubleType, nullable = true))))
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getString(0) === "alpha" && r1.getDouble(1) === 42.0 &&
      r1.getDouble(2) === 1.5 && r1.getBoolean(3) && r1.getString(4) === "calc")
    assert(r1.getTimestamp(5) === ExcelLoader.serialToTs(45000.5))
    assert(r1.getDouble(6) === 0.0125) // RK f64 with div100
    val r2 = rows(1)
    assert(r2.getString(0) === "beta" && r2.getDouble(1) === 7.0 &&
      r2.getDouble(2) === 2.5 && !r2.getBoolean(3) && r2.getString(4) === "gamma")
    assert(r2.getTimestamp(5) === ExcelLoader.serialToTs(44000.0))
    assert(r2.getDouble(6) === 3.25) // formula cached numeric
  }

  test("sheet_name selection and unknown-sheet error") {
    val path = XlsFixture.write(tmp, "small2.xls", XlsFixture.smallWorkbook)
    val df = Loaders.load(spark, TableSource("s", path,
      options = Map("sheet_name" -> "data")))
    assert(df.count() === 2)
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("s", path, options = Map("sheet_name" -> "nope")))
    }
    assert(e.getMessage.contains("data"))
  }

  test("large .xls via the FAT path: SST CONTINUE reassembly incl. width switch") {
    val wb = XlsFixture.largeWorkbook
    assert(wb.length >= 4096, "fixture must exceed the mini cutoff")
    val path = XlsFixture.write(tmp, "large.xls", wb)
    val df = Loaders.load(spark, TableSource("big", path))
    assert(df.columns.toSeq === Seq("k", "v"))
    val rows = df.orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows === Array(
      ("hello_world", "wide-str"),
      ("pad_000", "pad_449")))
  }

  test("unicodeString skips rich-run and ext headers before the characters") {
    import java.nio.{ByteBuffer, ByteOrder}
    def buf(bytes: Array[Byte]) = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // plain narrow: cch=2, flags=0, "hi"
    assert(XlsLoader.unicodeString(buf(Array[Byte](2, 0, 0, 'h', 'i')), 0) === "hi")
    // rich narrow: flags bit3 -> cRun u16 BEFORE chars; runs after are ignored
    val rich = Array[Byte](2, 0, 0x08, 1, 0, 'h', 'i', /*run*/ 0, 0, 0, 0)
    assert(XlsLoader.unicodeString(buf(rich), 0) === "hi")
    // rich + ext wide: flags bits 0|3|2 -> cRun u16 + cbExtRst u32 then UTF-16LE
    val richExtWide = Array[Byte](2, 0, 0x0D, 1, 0, 4, 0, 0, 0,
      'h', 0, 'i', 0, /*run*/ 0, 0, 0, 0, /*ext*/ 1, 2, 3, 4)
    assert(XlsLoader.unicodeString(buf(richExtWide), 0) === "hi")
  }

  test("non-CFB bytes and pre-BIFF8 streams are rejected loudly") {
    val junk = Paths.get(tmp, "junk.xls")
    Files.write(junk, "not a workbook at all, just text".getBytes(US_ASCII))
    val e = intercept[IllegalArgumentException] {
      Loaders.load(spark, TableSource("junk", junk.toString))
    }
    assert(e.getMessage.contains("CFB"))
  }
}
