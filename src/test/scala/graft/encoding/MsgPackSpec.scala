package graft.encoding

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** msgpack face: byte-level goldens against the public msgpack.org spec
  * plus an INDEPENDENT mini-decoder round-trip (the encoder cannot verify
  * itself), and HTTP ACCEPT negotiation end-to-end. */
class MsgPackSpec extends SparkSpec {

  import spark.implicits._

  // ---- independent decoder (spec §formats, the subset the encoder emits) --
  private def decode(buf: ByteBuffer): Any = {
    val t = buf.get() & 0xFF
    t match {
      case 0xC0 => null
      case 0xC2 => false
      case 0xC3 => true
      case x if x <= 0x7F => x.toLong                    // positive fixint
      case x if x >= 0xE0 => (x - 256).toLong            // negative fixint
      case 0xD0 => buf.get().toLong
      case 0xD1 => buf.getShort.toLong
      case 0xD2 => buf.getInt.toLong
      case 0xD3 => buf.getLong
      case 0xCA => buf.getFloat
      case 0xCB => buf.getDouble
      case x if x >= 0xA0 && x <= 0xBF => str(buf, x & 0x1F)
      case 0xD9 => str(buf, buf.get() & 0xFF)
      case 0xDA => str(buf, buf.getShort & 0xFFFF)
      case 0xDB => str(buf, buf.getInt)
      case 0xC4 => bin(buf, buf.get() & 0xFF)
      case 0xC5 => bin(buf, buf.getShort & 0xFFFF)
      case 0xC6 => bin(buf, buf.getInt)
      case x if x >= 0x90 && x <= 0x9F => arr(buf, x & 0x0F)
      case 0xDC => arr(buf, buf.getShort & 0xFFFF)
      case 0xDD => arr(buf, buf.getInt)
      case x if x >= 0x80 && x <= 0x8F => map(buf, x & 0x0F)
      case 0xDE => map(buf, buf.getShort & 0xFFFF)
      case 0xDF => map(buf, buf.getInt)
      case other => throw new IllegalArgumentException(f"tag 0x$other%02x")
    }
  }
  private def str(buf: ByteBuffer, n: Int): String = {
    val b = new Array[Byte](n); buf.get(b); new String(b, "UTF-8")
  }
  private def bin(buf: ByteBuffer, n: Int): Seq[Byte] = {
    val b = new Array[Byte](n); buf.get(b); b.toSeq
  }
  private def arr(buf: ByteBuffer, n: Int): Seq[Any] = (1 to n).map(_ => decode(buf))
  private def map(buf: ByteBuffer, n: Int): Map[Any, Any] =
    (1 to n).map(_ => { val k = decode(buf); k -> decode(buf) }).toMap

  test("rows decode back as array-of-maps with JSON-face value semantics") {
    val df = Seq(
      (1L, "alpha", Some(2.5), true),
      (-200L, "ß-umlaut", None: Option[Double], false)
    ).toDF("id", "name", "score", "flag")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2021-04-12 04:04:28")))
      .withColumn("arr", array(lit(1), lit(2), lit(3)))
    val bytes = Encoders.encode(df.orderBy("id"), Encoders.MsgPack)
    val rows = decode(ByteBuffer.wrap(bytes)).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[Any, Any]])
    assert(rows.length == 2)
    val byId = rows.map(r => r("id").asInstanceOf[Long] -> r).toMap
    assert(byId(1L)("name") == "alpha")
    assert(byId(1L)("score") == 2.5)
    assert(byId(1L)("flag") == true)
    assert(byId(1L)("ts") == "2021-04-12T04:04:28") // the JSON golden form
    assert(byId(1L)("arr") == Seq(1L, 2L, 3L))
    assert(byId(-200L)("score") == null)
    assert(byId(-200L)("name") == "ß-umlaut")
  }

  test("byte-level goldens: headers and smallest-form ints per the spec") {
    val df = Seq((5L, 1000L)).toDF("a", "b")
    val bytes = Encoders.encode(df, Encoders.MsgPack)
    // fixarray(1), fixmap(2), fixstr "a", fixint 5, fixstr "b", int16 1000
    assert((bytes(0) & 0xFF) == 0x91)
    assert((bytes(1) & 0xFF) == 0x82)
    assert((bytes(2) & 0xFF) == 0xA1 && bytes(3) == 'a'.toByte)
    assert((bytes(4) & 0xFF) == 0x05)
    assert((bytes(5) & 0xFF) == 0xA1 && bytes(6) == 'b'.toByte)
    assert((bytes(7) & 0xFF) == 0xD1)
    assert(ByteBuffer.wrap(bytes, 8, 2).getShort == 1000)
    assert(bytes.length == 10)
    // 17+ rows take an array16 header
    val many = Encoders.encode((1 to 17).map(i => Tuple1(i.toLong)).toDF("x"),
      Encoders.MsgPack)
    assert((many(0) & 0xFF) == 0xDC)
    assert(ByteBuffer.wrap(many, 1, 2).getShort == 17)
  }

  test("decimals travel as exact text, not lossy float64") {
    val df = spark.sql("SELECT CAST('12345678901234567.89' AS DECIMAL(20,2)) AS d")
    val rows = decode(ByteBuffer.wrap(Encoders.encode(df, Encoders.MsgPack)))
      .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[Any, Any]])
    assert(rows.head("d") == "12345678901234567.89")
  }

  test("ACCEPT negotiation serves msgpack end-to-end over HTTP") {
    import graft.server.{Engine, HttpApp}
    import graft.sources.TableSource
    val engine = new Engine(spark, readOnly = true)
    engine.registerTable(TableSource("mp_region", s"$sf0001/region.parquet",
      Some("parquet")))
    val app = new HttpApp(engine, 0).start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${app.boundPort}/api/sql"))
        .header("Accept", "application/msgpack")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          "SELECT r_regionkey, r_name FROM mp_region ORDER BY r_regionkey"))
        .build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .startsWith("application/msgpack"))
      val rows = decode(ByteBuffer.wrap(resp.body())).asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[Any, Any]])
      assert(rows.length == 5)
      assert(rows.head("r_regionkey") == 0L)
      // config accepts the format name for response_format defaulting
      assert(graft.server.Config.parseResponseFormat("msgpack") == Encoders.MsgPack)
      assert(graft.server.Config.parseResponseFormat("MsgPack") == Encoders.MsgPack)
    } finally app.stop()
  }
}
