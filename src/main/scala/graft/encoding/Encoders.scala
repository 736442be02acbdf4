package graft.encoding

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import com.fasterxml.jackson.core.JsonFactory

import org.apache.spark.sql.{DataFrame, GraftArrowBridge, Row}
import org.apache.spark.sql.types._

/** Response encoders: query result -> client bytes.
  *
  * Mirrors the reference encoder set (columnq/src/encoding): JSON
  * array-of-objects, CSV, Arrow IPC stream/file, Parquet, dispatched by
  * ACCEPT header. The JSON temporal formats follow the reference goldens
  * (columnq/src/encoding/json.rs:31-139): dates `YYYY-MM-DD`, timestamps ISO
  * without zone with the fraction omitted when zero.
  */
object Encoders {

  sealed abstract class ContentType(val mime: String)
  case object Json extends ContentType("application/json")
  case object Csv extends ContentType("application/csv")
  case object ArrowFile extends ContentType("application/vnd.apache.arrow.file")
  case object ArrowStream extends ContentType("application/vnd.apache.arrow.stream")
  case object Parquet extends ContentType("application/parquet")
  case object MsgPack extends ContentType("application/msgpack")

  /** ACCEPT negotiation (reference: columnq/src/encoding/mod.rs:25-42 +
    * roapi/src/api/mod.rs:25-35): unknown values fall back to the default. */
  def fromAccept(hdr: Option[String], default: ContentType = Json): ContentType =
    hdr.map(_.trim).map {
      case "*/*" | "application/json" => Json
      case "application/csv" => Csv
      case "application/arrow.file" | "application/vnd.apache.arrow.file" => ArrowFile
      case "application/arrow.stream" | "application/vnd.apache.arrow.stream" => ArrowStream
      case "application/parquet" | "application/vnd.apache.parquet" => Parquet
      case "application/msgpack" | "application/x-msgpack" => MsgPack
      case _ => default
    }.getOrElse(default)

  def encode(df: DataFrame, ct: ContentType): Array[Byte] = ct match {
    case Json        => toJsonBytes(df)
    case Csv         => toCsvBytes(df)
    case ArrowStream => GraftArrowBridge.toIpcStreamBytes(df)
    case ArrowFile   => GraftArrowBridge.toIpcFileBytes(df)
    case Parquet     => toParquetBytes(df)
    case MsgPack     => toMsgPackBytes(df)
  }

  // ---- temporal formatting (golden-pinned) ---------------------------------

  def formatTimestamp(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val base = LocalDateTime.ofEpochSecond(secs, 0, ZoneOffset.UTC).toString
    val withSec = if (base.length == 16) base + ":00" else base // LocalDateTime drops :00 seconds
    if (frac == 0) withSec else f"$withSec.$frac%06d"
  }

  private def fmtValue(v: Any): Any = v match {
    case t: java.sql.Timestamp =>
      formatTimestamp(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
    case i: Instant => formatTimestamp(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case d: java.sql.Date => d.toLocalDate.toString
    case d: LocalDate => d.toString
    case other => other
  }

  // ---- JSON array-of-objects ----------------------------------------------

  /** Row iterator for encoding: driver-LOCAL plans (a folded
    * LocalTableScan — the small-table serving path) iterate their
    * already-driver-held rows via `collect()`, because `toLocalIterator`
    * launches one sequential Spark job PER PARTITION — and a
    * LocalTableScan parallelizes to `leafNodeDefaultParallelism` slices,
    * so a 37-row table paid ~32 scheduled jobs (~130 ms) per cold encode.
    * Every distributed plan keeps the partition-at-a-time stream: driver
    * memory bounded by one partition regardless of result size — the
    * 100 TB-safe path for full-table exports. */
  private def localRows(df: DataFrame, rows: IndexedSeq[org.apache.spark.sql.catalyst.InternalRow])
      : java.util.Iterator[org.apache.spark.sql.Row] = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(df.schema)
    new java.util.Iterator[org.apache.spark.sql.Row] {
      private var i = 0
      override def hasNext: Boolean = i < rows.length
      override def next(): org.apache.spark.sql.Row = {
        val r = conv(rows(i)).asInstanceOf[org.apache.spark.sql.Row]; i += 1; r
      }
    }
  }

  private def rowIterator(df: DataFrame): java.util.Iterator[org.apache.spark.sql.Row] =
    df.queryExecution.logical match {
      // a mini-folded serving result IS its rows — encoding straight off
      // the logical LocalRelation skips the whole QueryExecution battery
      // (~2 ms of cold p50 spent optimizing a 1-node plan, measured)
      case rel: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        localRows(df, rel.data.toIndexedSeq)
      case _ => df.queryExecution.executedPlan match {
        case l: org.apache.spark.sql.execution.LocalTableScanExec =>
          // executeCollect + the interpreted Catalyst->Scala converter
          // instead of Dataset.collect(): collect() builds a fresh row
          // DESERIALIZER per Dataset instance (~4-5 ms of the cold-serving
          // p50, measured), all to convert a handful of driver-held rows
          // the interpreted converter handles in microseconds. Distributed
          // plans never take these branches, so the codegen'd deserializer
          // still serves bulk exports.
          localRows(df, l.executeCollect().toIndexedSeq)
        case _ => df.toLocalIterator()
      }
    }

  /** Stream rows into `out` one partition at a time (see [[rowIterator]]),
    * so driver memory is bounded by one partition regardless of result
    * size — the 100 TB-safe path for full-table exports. Serving queries
    * are LIMIT/agg-bounded anyway; this removes the collect() cliff for
    * the rest. */
  def writeJson(df: DataFrame, out: java.io.OutputStream): Unit = {
    val schema = df.schema
    val gen = new JsonFactory().createGenerator(out)
    gen.writeStartArray()
    val it = rowIterator(df)
    while (it.hasNext) writeStruct(gen, it.next(), schema)
    gen.writeEndArray()
    gen.flush()
  }

  def toJsonBytes(df: DataFrame): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeJson(df, out)
    out.toByteArray
  }

  private def writeStruct(gen: com.fasterxml.jackson.core.JsonGenerator,
                          row: Row, schema: StructType): Unit = {
    gen.writeStartObject()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      gen.writeFieldName(f.name)
      if (row.isNullAt(i)) gen.writeNull()
      else writeValue(gen, row.get(i), f.dataType)
    }
    gen.writeEndObject()
  }

  private def writeValue(gen: com.fasterxml.jackson.core.JsonGenerator,
                         v: Any, dt: DataType): Unit = dt match {
    case BooleanType => gen.writeBoolean(v.asInstanceOf[Boolean])
    case ByteType => gen.writeNumber(v.asInstanceOf[Byte].toInt)
    case ShortType => gen.writeNumber(v.asInstanceOf[Short].toInt)
    case IntegerType => gen.writeNumber(v.asInstanceOf[Int])
    case LongType => gen.writeNumber(v.asInstanceOf[Long])
    case FloatType => gen.writeNumber(v.asInstanceOf[Float])
    case DoubleType => gen.writeNumber(v.asInstanceOf[Double])
    case _: DecimalType => gen.writeNumber(v.asInstanceOf[java.math.BigDecimal])
    case StringType => gen.writeString(v.toString)
    case BinaryType => gen.writeBinary(v.asInstanceOf[Array[Byte]])
    case DateType | TimestampType | TimestampNTZType =>
      gen.writeString(fmtValue(v).toString)
    case ArrayType(et, _) =>
      gen.writeStartArray()
      v.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
        if (e == null) gen.writeNull() else writeValue(gen, e, et)
      }
      gen.writeEndArray()
    case st: StructType => writeStruct(gen, v.asInstanceOf[Row], st)
    case MapType(_, vt, _) =>
      gen.writeStartObject()
      v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, mv) =>
        gen.writeFieldName(String.valueOf(k))
        if (mv == null) gen.writeNull() else writeValue(gen, mv, vt)
      }
      gen.writeEndObject()
    case _ => gen.writeString(String.valueOf(v))
  }

  // ---- msgpack (hand-rolled from the public msgpack.org spec) ---------------
  // The reference's own roadmap response format (README.md:307, unshipped
  // there). Same array-of-objects shape as the JSON face — rows as maps with
  // string keys — with the SAME golden temporal/decimal text forms, so the
  // two faces agree value-for-value. Buffered (the array header carries the
  // row count up front), like the Parquet/ArrowFile faces.

  def toMsgPackBytes(df: DataFrame): Array[Byte] = {
    val schema = df.schema
    val out = new java.io.ByteArrayOutputStream(8192)
    val rows = {
      val b = Seq.newBuilder[Row]
      val it = rowIterator(df)
      while (it.hasNext) b += it.next()
      b.result()
    }
    mpArrayHeader(out, rows.length)
    rows.foreach { row =>
      mpMapHeader(out, schema.length)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        mpString(out, f.name)
        if (row.isNullAt(i)) out.write(0xC0)
        else mpValue(out, row.get(i), f.dataType)
      }
    }
    out.toByteArray
  }

  private def mpValue(out: java.io.ByteArrayOutputStream, v: Any, dt: DataType): Unit =
    dt match {
      case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 0xC3 else 0xC2)
      case ByteType => mpLong(out, v.asInstanceOf[Byte].toLong)
      case ShortType => mpLong(out, v.asInstanceOf[Short].toLong)
      case IntegerType => mpLong(out, v.asInstanceOf[Int].toLong)
      case LongType => mpLong(out, v.asInstanceOf[Long])
      case FloatType =>
        out.write(0xCA)
        mpBe(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]), 4)
      case DoubleType =>
        out.write(0xCB)
        mpBe(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
      // msgpack has no exact-decimal family: the DECIMAL TEXT travels (the
      // value the JSON face emits), never a lossy float64
      case _: DecimalType => mpString(out, v.toString)
      case StringType => mpString(out, v.toString)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        if (b.length < 256) { out.write(0xC4); out.write(b.length) }
        else if (b.length < 65536) { out.write(0xC5); mpBe(out, b.length.toLong, 2) }
        else { out.write(0xC6); mpBe(out, b.length.toLong, 4) }
        out.write(b, 0, b.length)
      case DateType | TimestampType | TimestampNTZType =>
        mpString(out, fmtValue(v).toString)
      case ArrayType(et, _) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        mpArrayHeader(out, xs.length)
        xs.foreach(e => if (e == null) out.write(0xC0) else mpValue(out, e, et))
      case st: StructType =>
        val r = v.asInstanceOf[Row]
        mpMapHeader(out, st.length)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          mpString(out, f.name)
          if (r.isNullAt(i)) out.write(0xC0) else mpValue(out, r.get(i), f.dataType)
        }
      case MapType(_, vt, _) =>
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        mpMapHeader(out, m.size)
        m.foreach { case (k, mv) =>
          mpString(out, String.valueOf(k))
          if (mv == null) out.write(0xC0) else mpValue(out, mv, vt)
        }
      case _ => mpString(out, String.valueOf(v))
    }

  /** Smallest-form signed integer family (the spec's recommendation). */
  private def mpLong(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0 && v <= 127) out.write(v.toInt)               // positive fixint
    else if (v < 0 && v >= -32) out.write((v & 0xFF).toInt)  // negative fixint
    else if (v >= Byte.MinValue && v <= Byte.MaxValue) { out.write(0xD0); out.write((v & 0xFF).toInt) }
    else if (v >= Short.MinValue && v <= Short.MaxValue) { out.write(0xD1); mpBe(out, v, 2) }
    else if (v >= Int.MinValue && v <= Int.MaxValue) { out.write(0xD2); mpBe(out, v, 4) }
    else { out.write(0xD3); mpBe(out, v, 8) }

  private def mpString(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    if (b.length < 32) out.write(0xA0 | b.length)
    else if (b.length < 256) { out.write(0xD9); out.write(b.length) }
    else if (b.length < 65536) { out.write(0xDA); mpBe(out, b.length.toLong, 2) }
    else { out.write(0xDB); mpBe(out, b.length.toLong, 4) }
    out.write(b, 0, b.length)
  }

  private def mpArrayHeader(out: java.io.ByteArrayOutputStream, n: Int): Unit =
    if (n < 16) out.write(0x90 | n)
    else if (n < 65536) { out.write(0xDC); mpBe(out, n.toLong, 2) }
    else { out.write(0xDD); mpBe(out, n.toLong, 4) }

  private def mpMapHeader(out: java.io.ByteArrayOutputStream, n: Int): Unit =
    if (n < 16) out.write(0x80 | n)
    else if (n < 65536) { out.write(0xDE); mpBe(out, n.toLong, 2) }
    else { out.write(0xDF); mpBe(out, n.toLong, 4) }

  private def mpBe(out: java.io.ByteArrayOutputStream, v: Long, nBytes: Int): Unit = {
    var i = nBytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i -= 1 }
  }

  // ---- CSV -----------------------------------------------------------------

  /** Partition-at-a-time CSV streaming; same bounded-memory contract as
    * [[writeJson]]. */
  def writeCsv(df: DataFrame, out: java.io.OutputStream): Unit = {
    val schema = df.schema
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(out, "UTF-8"))
    w.write(schema.fieldNames.map(csvEscape).mkString(","))
    w.write("\n")
    val it = rowIterator(df)
    while (it.hasNext) {
      val row = it.next()
      val cells = schema.fields.zipWithIndex.map { case (f, i) =>
        if (row.isNullAt(i)) ""
        else csvEscape(String.valueOf(fmtValue(row.get(i))))
      }
      w.write(cells.mkString(","))
      w.write("\n")
    }
    w.flush()
  }

  def toCsvBytes(df: DataFrame): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeCsv(df, out)
    out.toByteArray
  }

  private def csvEscape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  // ---- Parquet (via a temp single file) ------------------------------------

  def toParquetBytes(df: DataFrame): Array[Byte] = {
    val dir = Files.createTempDirectory("graft_pq")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("out").toString)
      val part = Files.list(dir.resolve("out")).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("no parquet part written"))
      Files.readAllBytes(part)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
    }
  }
}
