package graft.server

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec
import graft.sources.TableSource

/** Drives the pg wire server with a minimal hand-rolled v3 client. */
class PostgresServerSpec extends SparkSpec {

  private lazy val engine = {
    val e = new Engine(spark, readOnly = true)
    e.registerTable(TableSource("region", s"$sf0001/region.parquet", Some("parquet")))
    e
  }
  private lazy val pg = new PostgresServer(engine, 0).start()

  /** tiny client: startup, then send simple queries and collect messages */
  private final class Client {
    private val sock = new Socket("127.0.0.1", pg.boundPort)
    private val in = new DataInputStream(sock.getInputStream)
    private val out = new DataOutputStream(sock.getOutputStream)

    def startup(): Unit = {
      val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000".getBytes(UTF_8)
      out.writeInt(8 + params.length)
      out.writeInt(196608)
      out.write(params)
      out.flush()
      drainUntilReady()
    }

    def query(sql: String): Seq[(Char, Array[Byte])] = {
      val b = (sql + "\u0000").getBytes(UTF_8)
      out.write('Q'); out.writeInt(4 + b.length); out.write(b); out.flush()
      collectUntilReady()
    }

    private def readMsg(): (Char, Array[Byte]) = {
      val tag = in.read().toChar
      val len = in.readInt()
      val body = new Array[Byte](len - 4)
      in.readFully(body)
      (tag, body)
    }
    private def drainUntilReady(): Unit = { while (readMsg()._1 != 'Z') () }
    private def collectUntilReady(): Seq[(Char, Array[Byte])] = {
      val msgs = Seq.newBuilder[(Char, Array[Byte])]
      var m = readMsg()
      while (m._1 != 'Z') { msgs += m; m = readMsg() }
      msgs.result()
    }
    def close(): Unit = sock.close()

    // ---- extended protocol helpers ----------------------------------------

    private def frame(tag: Char, body: Array[Byte]): Unit = {
      out.write(tag); out.writeInt(4 + body.length); out.write(body)
    }
    /** raw frame escape hatch for malformed-message tests */
    def sendFrame(tag: Char, body: Array[Byte]): Unit = frame(tag, body)
    private def cstr(s: String): Array[Byte] = (s + "\u0000").getBytes(UTF_8)

    def parse(name: String, sql: String, paramOids: Seq[Int] = Seq.empty): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(name)); d.write(cstr(sql))
      d.writeShort(paramOids.length); paramOids.foreach(d.writeInt)
      frame('P', b.toByteArray)
    }

    def bind(portal: String, stmt: String, params: Seq[String],
             resultFmts: Seq[Short] = Seq.empty): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(portal)); d.write(cstr(stmt))
      d.writeShort(0) // all-text PARAM format codes
      d.writeShort(params.length)
      params.foreach { p =>
        val bytes = p.getBytes(UTF_8); d.writeInt(bytes.length); d.write(bytes)
      }
      d.writeShort(resultFmts.length)
      resultFmts.foreach(f => d.writeShort(f))
      frame('B', b.toByteArray)
    }

    def describePortal(portal: String): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeByte('P'); d.write(cstr(portal))
      frame('D', b.toByteArray)
    }

    def execute(portal: String, maxRows: Int = 0): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(cstr(portal)); d.writeInt(maxRows)
      frame('E', b.toByteArray)
    }

    def sync(): Seq[(Char, Array[Byte])] = {
      frame('S', Array.emptyByteArray); out.flush()
      collectUntilReady()
    }
  }

  test("startup handshake, simple query returns RowDescription + text DataRows") {
    val c = new Client
    c.startup()
    val msgs = c.query("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    val tags = msgs.map(_._1)
    assert(tags.head == 'T')
    assert(tags.count(_ == 'D') == 5)
    assert(tags.last == 'C')
    // first data row: 2 cols, text "0" and "REGION_0"-ish name
    val firstRow = msgs.find(_._1 == 'D').get._2
    val s = new String(firstRow, UTF_8)
    assert(s.contains("0"))
    c.close()
  }

  test("SET/SHOW are no-ops; bad SQL yields ErrorResponse; multi-statement works") {
    val c = new Client
    c.startup()
    assert(c.query("SET search_path TO public").map(_._1) == Seq('C'))
    assert(c.query("SELECT bogus FROM nowhere").map(_._1) == Seq('E'))
    val multi = c.query("SELECT 1 AS a; SELECT 2 AS b")
    assert(multi.map(_._1).count(_ == 'T') == 2)
    assert(multi.map(_._1).count(_ == 'D') == 2)
    c.close()
  }

  test("extended protocol: Parse/Bind/Describe/Execute/Sync with a text param") {
    val c = new Client
    c.startup()
    c.parse("s1", "SELECT r_name FROM region WHERE r_regionkey = $1 ORDER BY r_name",
      paramOids = Seq(20)) // int8
    c.bind("p1", "s1", Seq("0"))
    c.describePortal("p1")
    c.execute("p1")
    val msgs = c.sync()
    val tags = msgs.map(_._1)
    assert(tags.containsSlice(Seq('1', '2', 'T', 'D', 'C')),
      s"unexpected message sequence: $tags")
    assert(new String(msgs.find(_._1 == 'D').get._2, UTF_8).length > 4)
    // rebind the same statement with a different param — portal is replaced
    c.bind("p1", "s1", Seq("999999"))
    c.execute("p1")
    val empty = c.sync()
    assert(empty.map(_._1).count(_ == 'D') == 0) // no such region
    assert(empty.exists { case (t, b) =>
      t == 'C' && new String(b, UTF_8).startsWith("SELECT 0") })
    c.close()
  }

  test("extended protocol: string params are escaped, unknown portal errors") {
    val c = new Client
    c.startup()
    c.parse("s2", "SELECT count(*) AS n FROM region WHERE r_name <> $1")
    c.bind("p2", "s2", Seq("o'brien")) // embedded quote must not break SQL
    c.execute("p2")
    val ok = c.sync()
    assert(ok.map(_._1).count(_ == 'D') == 1)
    c.execute("missing_portal")
    val err = c.sync()
    assert(err.map(_._1).contains('E'))
    c.close()
  }

  test("extended protocol: substitution is single-pass; format-code arity enforced") {
    val c = new Client
    c.startup()
    // a parameter VALUE containing a literal "$1" must NOT be re-substituted
    // (sequential replace did), and $10 must not lose its prefix to $1
    c.parse("sp", "SELECT count(*) AS n FROM region WHERE r_name <> $1 AND r_name <> $2")
    c.bind("pp", "sp", Seq("x", "$1"))
    c.execute("pp")
    val ok = c.sync()
    assert(ok.map(_._1).count(_ == 'D') == 1, ok.map(_._1))
    val n = new String(ok.find(_._1 == 'D').get._2, UTF_8)
    assert(n.contains("5"), n) // no region named "x" or "$1": all 5 rows counted
    // 11 params: $1 vs $10/$11 prefix discipline — r_regionkey = $11 = 4
    val preds = (1 to 11).map(i => s"r_regionkey = $$$i").mkString(" OR ")
    c.parse("s11", s"SELECT r_name FROM region WHERE $preds ORDER BY r_name",
      paramOids = (1 to 11).map(_ => 20))
    c.bind("p11", "s11", (1 to 11).map(i => if (i == 11) "4" else "99").toSeq)
    c.execute("p11")
    val one = c.sync()
    assert(one.map(_._1).count(_ == 'D') == 1, one.map(_._1))
    // a 10+-digit $-run inside a LITERAL must pass through untouched —
    // not crash the substitution with a NumberFormatException
    c.parse("sbig", "SELECT '$99999999999' AS v, count(*) AS n FROM region WHERE r_regionkey = $1",
      paramOids = Seq(20))
    c.bind("pbig", "sbig", Seq("0"))
    c.execute("pbig")
    val big = c.sync()
    assert(big.map(_._1).count(_ == 'D') == 1, big.map(_._1))
    assert(new String(big.find(_._1 == 'D').get._2, UTF_8).contains("$99999999999"))
    // a Bind with 2 parameter-format codes for 3 params is a protocol
    // error, answered with ErrorResponse — not a torn connection
    val b = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(b)
    d.write("pbad\u0000".getBytes(UTF_8)); d.write("sp\u0000".getBytes(UTF_8))
    d.writeShort(2); d.writeShort(0); d.writeShort(0) // 2 codes...
    d.writeShort(3) // ...for 3 params
    (1 to 3).foreach { _ => d.writeInt(1); d.write('x') }
    d.writeShort(0)
    c.sendFrame('B', b.toByteArray)
    val err = c.sync()
    assert(err.map(_._1).contains('E'), err.map(_._1))
    // the connection survives: a normal query still answers
    assert(c.query("SELECT 1 AS ok").map(_._1).count(_ == 'D') == 1)
    c.close()
  }

  test("extended protocol: binary result formats decode as pg int8/float8/timestamp") {
    val c = new Client
    c.startup()
    c.parse("sb", "SELECT CAST(r_regionkey AS BIGINT) AS k, CAST(2.5 AS DOUBLE) AS x, " +
      "timestamp'2021-04-12 04:04:28' AS ts FROM region WHERE r_regionkey = 1")
    c.bind("pb", "sb", Seq.empty, resultFmts = Seq(1)) // one code = ALL binary
    c.describePortal("pb")
    c.execute("pb")
    val msgs = c.sync()
    // RowDescription advertises binary format codes for every column
    val rd = new DataInputStream(new java.io.ByteArrayInputStream(
      msgs.find(_._1 == 'T').get._2))
    val nCols = rd.readShort()
    assert(nCols == 3)
    val fmts = (0 until nCols.toInt).map { _ =>
      while (rd.readByte() != 0) () // field name cstr
      rd.readInt(); rd.readShort(); rd.readInt(); rd.readShort(); rd.readInt()
      rd.readShort() // the format code
    }
    assert(fmts == Seq(1, 1, 1), s"expected binary format codes, got $fmts")
    // DataRow payloads are the pg binary send formats (network byte order)
    val dr = new DataInputStream(new java.io.ByteArrayInputStream(
      msgs.find(_._1 == 'D').get._2))
    assert(dr.readShort() == 3)
    def field(): Array[Byte] = {
      val len = dr.readInt(); val b = new Array[Byte](len); dr.readFully(b); b
    }
    val k = java.nio.ByteBuffer.wrap(field())
    assert(k.capacity == 8 && k.getLong == 1L)
    val x = java.nio.ByteBuffer.wrap(field())
    assert(x.capacity == 8 && x.getDouble == 2.5)
    val ts = java.nio.ByteBuffer.wrap(field())
    val expectMicros = java.time.Instant.parse("2021-04-12T04:04:28Z")
      .getEpochSecond * 1000000L -
      java.time.Instant.parse("2000-01-01T00:00:00Z").getEpochSecond * 1000000L
    assert(ts.capacity == 8 && ts.getLong == expectMicros)
    // a type with no binary send (array) fails loudly instead of corrupting
    c.parse("sa", "SELECT array(1, 2) AS a")
    c.bind("pa", "sa", Seq.empty, resultFmts = Seq(1))
    c.execute("pa")
    assert(c.sync().map(_._1).contains('E'))
    c.close()
  }

  test("boolean and timestamp text encodings match pg conventions") {
    val c = new Client
    c.startup()
    val msgs = c.query("SELECT true AS b, timestamp'2021-04-12 04:04:28' AS ts")
    val row = new String(msgs.find(_._1 == 'D').get._2, UTF_8)
    assert(row.contains("t"))
    assert(row.contains("2021-04-12 04:04:28"))
    c.close()
  }
}
