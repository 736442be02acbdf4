package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JDK Excel (.xlsx) and OpenDocument (.ods) loader — no POI/calamine.
  *
  * Behavior mirrors the reference's calamine-based loader
  * (reference: columnq/src/table/excel.rs:96-410):
  *   - options `sheet_name`, `rows_range_start/end` (inclusive),
  *     `columns_range_start/end` (inclusive), `schema_inference_lines`;
  *   - header = first row of the selected subrange, every header cell must be
  *     a string; spaces in names become underscores (excel.rs:172-178);
  *   - type inference votes per column over the inference rows with the
  *     lattice Null < concrete, and ANY two distinct non-null types upcast to
  *     Utf8 (excel.rs:147-170) — including Int64 vs Float64;
  *   - a data row with more cells than header columns is an error.
  *
  * Scale note: a workbook is a single driver-parsed in-memory document, the
  * same shape as the reference's MemTable path — spreadsheets are a config/
  * small-dim format, not a 100 TB fact format. The resulting DataFrame is
  * distributed, so downstream joins against big tables still broadcast.
  */
object ExcelLoader {

  // ---- typed cell model (analog of calamine::Data) --------------------------
  sealed trait Cell
  case object CEmpty extends Cell
  final case class CFloat(v: Double) extends Cell
  final case class CStr(v: String) extends Cell
  final case class CBool(v: Boolean) extends Cell
  final case class CTs(v: java.sql.Timestamp) extends Cell
  final case class CDur(v: java.time.Duration) extends Cell

  type Grid = Vector[Vector[Cell]]

  def load(spark: SparkSession, src: TableSource): DataFrame = {
    val bytes = Loaders.fetchBytes(src.uri, Loaders.httpHeaders(src),
      spark.sparkContext.hadoopConfiguration)
    val fmt = src.resolvedFormat
    val sheets: Seq[(String, Grid)] = fmt match {
      case "xlsx" => readXlsx(bytes)
      case "ods" => readOds(bytes)
      case "xls" => XlsLoader.readXls(bytes)
      case "xlsb" => XlsbLoader.readXlsb(bytes)
      case other => throw new IllegalArgumentException(
        s"table `${src.name}`: `$other` is not a spreadsheet format")
    }
    val grid = src.options.get("sheet_name") match {
      case Some(n) => sheets.collectFirst { case (`n`, g) => g }.getOrElse(
        throw new IllegalArgumentException(
          s"table `${src.name}`: sheet `$n` not found " +
            s"(have: ${sheets.map(_._1).mkString(", ")})"))
      case None => sheets.headOption.map(_._2).getOrElse(
        throw new IllegalArgumentException(s"table `${src.name}`: workbook has no sheets"))
    }
    toDataFrame(spark, src, grid)
  }

  // ---- subrange + inference (analog of ExcelSubrange / infer_schema) --------

  private def intOpt(src: TableSource, key: String): Option[Int] =
    src.options.get(key).map(_.trim.toInt)

  /** Inclusive row/col window over the grid; per-row column slice is clamped
    * to the row's own width, like excel.rs:85. */
  private[sources] def subrange(grid: Grid, rowStart: Option[Int], rowEnd: Option[Int],
                                colStart: Option[Int], colEnd: Option[Int]): Grid = {
    val rs = rowStart.getOrElse(0)
    val re = math.min(rowEnd.getOrElse(grid.length - 1), grid.length - 1)
    val cs = colStart.getOrElse(0)
    (rs to re).toVector.flatMap(grid.lift).map { row =>
      val ce = math.min(colEnd.getOrElse(Int.MaxValue), row.length - 1)
      if (cs > ce) Vector.empty[Cell] else row.slice(cs, ce + 1)
    }
  }

  private def cellType(c: Cell): DataType = c match {
    case CEmpty => NullType
    case _: CFloat => DoubleType
    case _: CStr => StringType
    case _: CBool => BooleanType
    case _: CTs => TimestampType
    case _: CDur => DayTimeIntervalType()
  }

  /** Header names + per-column vote (excel.rs:131-180). */
  private[sources] def inferSchema(header: Vector[Cell], rows: Seq[Vector[Cell]]): StructType = {
    require(header.nonEmpty, "Failed to infer schema for empty excel table")
    val names = header.zipWithIndex.map {
      case (CStr(s), _) => s
      case (_, i) => throw new IllegalArgumentException(s"The ${i}th column name is empty")
    }
    val votes = mutable.LinkedHashMap[String, DataType]()
    rows.foreach { row =>
      require(row.length <= names.length,
        "Failed to infer schema. Number of values in row is more than column names.")
      row.zipWithIndex.foreach { case (cell, i) =>
        val t = cellType(cell)
        votes.get(names(i)) match {
          case None => votes(names(i)) = t
          case Some(prev) if prev == t => ()
          case Some(NullType) => votes(names(i)) = t
          case Some(_) if t == NullType => ()
          case Some(_) => votes(names(i)) = StringType
        }
      }
    }
    StructType(names.map { n =>
      val dt = votes.getOrElse(n, StringType) match {
        case NullType => StringType // all-empty columns default to Utf8
        case other => other
      }
      StructField(n.replace(' ', '_'), dt, nullable = true)
    })
  }

  /** Rust-style float rendering so Utf8-coerced numeric cells match the
    * reference ("1", not "1.0"). */
  private def floatStr(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString else v.toString

  private def convert(c: Cell, dt: DataType, field: String): Any = (c, dt) match {
    case (CEmpty, _) => null
    case (CFloat(v), DoubleType) => v
    case (CFloat(v), FloatType) => v.toFloat
    case (CFloat(v), LongType) if v.isWhole => v.toLong
    case (CFloat(v), IntegerType) if v.isWhole => v.toInt
    case (CStr(s), StringType) => s
    case (CFloat(v), StringType) => floatStr(v)
    case (CBool(b), StringType) => b.toString
    case (CBool(b), BooleanType) => b
    case (CTs(t), TimestampType) => t
    case (CTs(t), StringType) => t.toString
    case (CTs(t), DateType) => new java.sql.Date(t.getTime)
    case (CStr(s), TimestampType) => // DateTimeIso cells arrive as strings
      java.sql.Timestamp.valueOf(java.time.LocalDateTime.parse(s.replace(' ', 'T')))
    case (CDur(d), _: DayTimeIntervalType) => d
    case (CDur(d), StringType) => d.toString
    case (other, t) => throw new IllegalArgumentException(
      s"Incorrect value $other in column $field (expected $t)")
  }

  private def toDataFrame(spark: SparkSession, src: TableSource, grid: Grid): DataFrame = {
    val rs = intOpt(src, "rows_range_start")
    val re = intOpt(src, "rows_range_end")
    val cs = intOpt(src, "columns_range_start")
    val ce = intOpt(src, "columns_range_end")
    val inferLines = intOpt(src, "schema_inference_lines")

    val schema = src.schema.getOrElse {
      // inference window ends at rows_range_start + schema_inference_lines
      // (header + N data rows), else at rows_range_end (excel.rs:236-248)
      val inferEnd = inferLines.map(_ + rs.getOrElse(0)).orElse(re)
      val window = subrange(grid, rs, inferEnd, cs, ce)
      require(window.nonEmpty, s"table `${src.name}`: selected range is empty")
      inferSchema(window.head, window.tail)
    }

    // data rows: full row range minus the header row (excel.rs:270-276)
    val data = subrange(grid, rs.map(_ + 1).orElse(Some(1)), re, cs, ce)
    val rows = data.map { r =>
      require(r.length <= schema.length,
        s"table `${src.name}`: row has ${r.length} values but schema has ${schema.length} columns")
      Row.fromSeq(schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        convert(if (i < r.length) r(i) else CEmpty, f.dataType, f.name)
      })
    }
    spark.createDataFrame(new java.util.ArrayList[Row](scala.jdk.CollectionConverters
      .SeqHasAsJava(rows).asJava), schema)
  }

  // ---- xlsx parsing (OOXML: zip of XML parts) -------------------------------

  private[sources] def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private[sources] val xmlFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** "B7" -> 0-based column 1. */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  /** Excel serial date (1900 system) -> timestamp at second precision,
    * matching the reference's Timestamp(Second) unit. */
  private[sources] def serialToTs(serial: Double): java.sql.Timestamp =
    new java.sql.Timestamp(math.round((serial - 25569.0) * 86400.0) * 1000L)

  private def readXlsx(bytes: Array[Byte]): Seq[(String, Grid)] = {
    val parts = zipEntries(bytes)
    def part(n: String): Option[Array[Byte]] = parts.get(n)

    // workbook sheet list (ordered) + relationship targets
    val sheetDefs = mutable.ArrayBuffer[(String, String)]() // (name, rId)
    part("xl/workbook.xml").foreach { wb =>
      val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(wb))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          var name = ""; var rid = ""
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "name" => name = r.getAttributeValue(i)
              case "id" => rid = r.getAttributeValue(i)
              case _ => ()
            }
          }
          sheetDefs += name -> rid
        }
      }
      r.close()
    }
    val relTargets = mutable.Map[String, String]()
    part("xl/_rels/workbook.xml.rels").foreach { rels =>
      val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(rels))
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

    val shared: Vector[String] = part("xl/sharedStrings.xml").map { ss =>
      val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(ss))
      val acc = Vector.newBuilder[String]
      val cur = new StringBuilder
      var inT = false
      var depth = 0 // si nesting guard
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur.clear(); depth += 1
            case "t" => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => acc += cur.toString; depth -= 1
            case "t" => inT = false
            case _ => ()
          }
        case _ => ()
      }
      r.close()
      acc.result()
    }.getOrElse(Vector.empty)

    val dateStyles: Set[Int] = part("xl/styles.xml").map(parseDateStyles).getOrElse(Set.empty)

    sheetDefs.toSeq.map { case (name, rid) =>
      val target = relTargets.getOrElse(rid, "")
      val path = if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"
      val sheetXml = part(path).getOrElse(throw new IllegalArgumentException(
        s"xlsx: missing worksheet part `$path` for sheet `$name`"))
      name -> parseSheet(sheetXml, shared, dateStyles)
    }
  }

  /** Builtin + custom date number formats (public OOXML spec §18.8.30). */
  /** Builtin number-format ids Excel renders as dates/times (shared with the
    * BIFF8 path, where the same id space applies). */
  private[sources] val builtinDate: Set[Int] =
    (14 to 22).toSet ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)

  /** Is a custom number-format code date-like? Strip [..] prefixes, "quoted"
    * literals and \-escapes, then look for date/time tokens. */
  private[sources] def codeIsDate(code: String): Boolean = {
    val clean = code.replaceAll("\\[[^\\]]*\\]", "").replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\\\.", "")
    clean.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  private def parseDateStyles(styles: Array[Byte]): Set[Int] = {
    val customFmt = mutable.Map[Int, String]()
    val xfFmts = mutable.ArrayBuffer[Int]()
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(styles))
    var inCellXfs = false
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "numFmt" =>
          var id = -1; var code = ""
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "numFmtId" => id = r.getAttributeValue(i).toInt
              case "formatCode" => code = r.getAttributeValue(i)
              case _ => ()
            }
          }
          if (id >= 0) customFmt(id) = code
        case "cellXfs" => inCellXfs = true
        case "xf" if inCellXfs =>
          var id = 0
          (0 until r.getAttributeCount).foreach { i =>
            if (r.getAttributeLocalName(i) == "numFmtId") id = r.getAttributeValue(i).toInt
          }
          xfFmts += id
        case _ => ()
      }
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" => inCellXfs = false
      case _ => ()
    }
    r.close()
    xfFmts.zipWithIndex.collect {
      case (fmtId, styleIdx)
        if builtinDate(fmtId) || customFmt.get(fmtId).exists(codeIsDate) => styleIdx
    }.toSet
  }

  private def parseSheet(xml: Array[Byte], shared: Vector[String],
                         dateStyles: Set[Int]): Grid = {
    val cells = mutable.Map[(Int, Int), Cell]()
    var maxRow = -1; var maxCol = -1
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(xml))
    var row = -1; var colInRow = -1
    var cellRef = ""; var cellT = ""; var cellS = -1
    var inV = false; var inIsT = false
    val text = new StringBuilder
    var inCell = false

    def emit(): Unit = if (inCell) {
      val rr = row
      val cc = if (cellRef.nonEmpty) colIndex(cellRef) else { colInRow += 1; colInRow }
      if (cellRef.nonEmpty) colInRow = cc
      val raw = text.toString
      val cell: Cell = cellT match {
        case "s" => CStr(shared(raw.trim.toInt))
        case "str" => CStr(raw)
        case "inlineStr" => CStr(raw)
        case "b" => CBool(raw.trim == "1" || raw.trim.equalsIgnoreCase("true"))
        case "d" => CTs(java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.parse(raw.trim.replace(' ', 'T'))))
        case "e" => throw new IllegalArgumentException(s"xlsx: error cell at $cellRef: $raw")
        case _ =>
          val t = raw.trim
          if (t.isEmpty) CEmpty
          else if (dateStyles(cellS)) CTs(serialToTs(t.toDouble))
          else CFloat(t.toDouble)
      }
      if (cell != CEmpty) {
        cells((rr, cc)) = cell
        if (rr > maxRow) maxRow = rr
        if (cc > maxCol) maxCol = cc
      }
    }

    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          row = (0 until r.getAttributeCount).collectFirst {
            case i if r.getAttributeLocalName(i) == "r" => r.getAttributeValue(i).toInt - 1
          }.getOrElse(row + 1)
          colInRow = -1
        case "c" =>
          inCell = true; cellRef = ""; cellT = ""; cellS = -1; text.clear()
          (0 until r.getAttributeCount).foreach { i =>
            r.getAttributeLocalName(i) match {
              case "r" => cellRef = r.getAttributeValue(i)
              case "t" => cellT = r.getAttributeValue(i)
              case "s" => cellS = r.getAttributeValue(i).toInt
              case _ => ()
            }
          }
        case "v" => inV = true
        case "t" if cellT == "inlineStr" => inIsT = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "c" => emit(); inCell = false
        case "v" => inV = false
        case "t" => inIsT = false
        case _ => ()
      }
      case _ => ()
    }
    r.close()

    (0 to maxRow).toVector.map { rr =>
      (0 to maxCol).toVector.map(cc => cells.getOrElse((rr, cc), CEmpty))
    }
  }

  // ---- ods parsing (OpenDocument content.xml) -------------------------------

  private def readOds(bytes: Array[Byte]): Seq[(String, Grid)] = {
    val content = zipEntries(bytes).getOrElse("content.xml",
      throw new IllegalArgumentException("ods: no content.xml in archive"))
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(content))

    val sheets = mutable.ArrayBuffer[(String, Grid)]()
    var sheetName = ""
    var rows: mutable.ArrayBuffer[Vector[Cell]] = null
    var curRow: mutable.ArrayBuffer[Cell] = null
    var rowRepeat = 1
    var cellRepeat = 1
    var cellVal: Cell = CEmpty
    var inCell = false
    val text = new StringBuilder
    var valueType = ""; var valueAttr = ""

    def attr(local: String): Option[String] =
      (0 until r.getAttributeCount).collectFirst {
        case i if r.getAttributeLocalName(i) == local => r.getAttributeValue(i)
      }

    def finishCell(): Unit = if (inCell) {
      val c: Cell = valueType match {
        case "float" | "percentage" | "currency" => CFloat(valueAttr.toDouble)
        case "boolean" => CBool(valueAttr.toBoolean)
        case "date" =>
          val s = valueAttr
          val ldt = if (s.contains('T')) java.time.LocalDateTime.parse(s)
          else java.time.LocalDate.parse(s).atStartOfDay()
          CTs(java.sql.Timestamp.valueOf(ldt))
        case "time" => CDur(java.time.Duration.parse(valueAttr))
        case "string" =>
          val s = if (valueAttr.nonEmpty) valueAttr else text.toString
          CStr(s)
        case _ => if (text.nonEmpty) CStr(text.toString) else CEmpty
      }
      // interior empty runs are positional and must be kept; the huge
      // trailing filler runs (sheets pad to 1024+ columns) survive here but
      // are trimmed at row end. Cap defends against pathological repeats.
      (0 until math.min(cellRepeat, 100000)).foreach(_ => curRow += c)
    }

    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "table" if r.getNamespaceURI.contains("table") =>
          sheetName = attr("name").getOrElse(s"Sheet${sheets.length + 1}")
          rows = mutable.ArrayBuffer[Vector[Cell]]()
        case "table-row" =>
          rowRepeat = attr("number-rows-repeated").map(_.toInt).getOrElse(1)
          curRow = mutable.ArrayBuffer[Cell]()
        case "table-cell" =>
          inCell = true
          cellRepeat = attr("number-columns-repeated").map(_.toInt).getOrElse(1)
          valueType = attr("value-type").getOrElse("")
          valueAttr = attr("value").orElse(attr("boolean-value"))
            .orElse(attr("date-value")).orElse(attr("time-value"))
            .orElse(attr("string-value")).getOrElse("")
          text.clear()
        case "covered-table-cell" =>
          val rep = attr("number-columns-repeated").map(_.toInt).getOrElse(1)
          if (curRow != null) (0 until rep).foreach(_ => curRow += CEmpty)
        case "p" => text.append(if (text.isEmpty) "" else "\n")
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS if inCell => text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "table-cell" => finishCell(); inCell = false
        case "table-row" if rows != null =>
          // trim trailing empties; cap empty-row run-length at 1
          val trimmed = curRow.toVector.reverse.dropWhile(_ == CEmpty).reverse
          val n = if (trimmed.isEmpty) 1 else rowRepeat
          (0 until n).foreach(_ => rows += trimmed)
          curRow = null
        case "table" if rows != null =>
          val grid = rows.toVector.reverse.dropWhile(_.isEmpty).reverse
          // pad rows to rectangular width for positional slicing
          val w = if (grid.isEmpty) 0 else grid.map(_.length).max
          sheets += sheetName -> grid.map(row => row ++ Vector.fill(w - row.length)(CEmpty))
          rows = null
        case _ => ()
      }
      case _ => ()
    }
    r.close()
    sheets.toSeq
  }
}
