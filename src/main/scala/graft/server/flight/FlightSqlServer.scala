package graft.server.flight

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.jdk.CollectionConverters._

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer, MultiThreadIoEventLoopGroup, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler}

import org.apache.spark.sql.{DataFrame, GraftArrowBridge, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

import graft.server.Engine
import FlightProto._

object FlightSqlServer {
  /** PEM paths, the reference's `flight_sql_config.tls` fields verbatim
    * (roapi/src/config.rs FlightSqlTlsConfig: cert, key, client_ca). */
  final case class Tls(cert: String, key: String, clientCa: String)

  /** SQL LIKE pattern (`%`, `_`) -> regex, the filter semantics the
    * FlightSQL metadata builders apply client-visibly. Pure, so it lives
    * on the companion (property-tested in PropertySpec). */
  private[server] def likeMatches(pattern: String, value: String): Boolean = {
    val rx = new StringBuilder("^")
    pattern.foreach {
      case '%' => rx.append(".*")
      case '_' => rx.append('.')
      case c   => rx.append(java.util.regex.Pattern.quote(c.toString))
    }
    rx.append('$')
    value.matches(rx.result())
  }
}

/** Arrow Flight SQL frontend (reference: roapi/src/server/flight_sql.rs).
  *
  * No tonic/grpc or arrow-flight jars exist on the offline classpath, so the
  * gRPC layer is hand-rolled from its PUBLIC wire contract: HTTP/2 POST per
  * call, `content-type: application/grpc`, each message framed as
  * `[1-byte compressed flag][4-byte big-endian length][protobuf]`, status in
  * the `grpc-status` trailer — over the same Netty h2c codec the HTTP/2
  * frontend uses ([[graft.server.Http2App]]). Protobuf messages are
  * hand-coded against the public Flight/FlightSql protocol definitions
  * ([[FlightProto]]); Arrow data rides the existing IPC serialization
  * ([[ArrowIpcFrames]] splits a stream into FlightData frames).
  *
  * Surface parity with the reference server:
  *   - Handshake: basic-auth -> bearer token, token returned both in the
  *     `authorization` response header and the payload (flight_sql.rs:164-277)
  *   - GetFlightInfo(CommandStatementQuery): executes EAGERLY, stores the
  *     result under a UUID handle, ticket = FetchResults{handle}
  *     (flight_sql.rs:318-433) — result bytes here are the Arrow IPC stream,
  *     built partition-at-a-time by the bridge
  *   - prepared statements via DoAction Create/ClosePreparedStatement with
  *     the plan cached per handle (flight_sql.rs:820-857)
  *   - DoGet(FetchResults): pops and streams the stored result
  *   - catalog ops GetCatalogs/GetDbSchemas/GetTables with LIKE filter
  *     patterns and the reference's first-requested-type labeling quirk
  *     (flight_sql.rs:614-702); catalog = "graft", schema = "public"
  *   - GetSqlInfo's (info_name, dense_union) server metadata and
  *     GetXdbcTypeInfo's 19-column type table serving the reference's
  *     single INTEGER entry (flight_sql.rs:75-99, 765-779)
  *   - GetSchema for ad-hoc descriptors; TableTypes and the transaction
  *     surface answer UNIMPLEMENTED like the reference's unimplemented
  *     arms. */
final class FlightSqlServer(engine: Engine, port: Int = 0,
                            authBasic: Option[(String, String)] = None,
                            authTokenCfg: Option[String] = None,
                            tls: Option[FlightSqlServer.Tls] = None,
                            host: String = "127.0.0.1") {

  private val CatalogName = "graft"
  private val SchemaName = "public"

  // reference token resolution (flight_sql.rs:980-1005): explicit token wins;
  // basic-only derives a constant token from the no-pad base64 of user:pass
  private val basicEncoded: Option[String] = authBasic.map { case (u, p) =>
    java.util.Base64.getEncoder.withoutPadding.encodeToString(s"$u:$p".getBytes(UTF_8))
  }
  private val effectiveToken: Option[String] = authTokenCfg.orElse(basicEncoded)

  private val results = new ConcurrentHashMap[String, Array[Byte]]()
  private val statements = new ConcurrentHashMap[String, DataFrame]()

  private val group = new MultiThreadIoEventLoopGroup(2, NioIoHandler.newFactory())
  private val workers = Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "graft-flight-worker"); t.setDaemon(true); t
  })
  @volatile private var channel: Channel = _

  def boundPort: Int = channel.localAddress.asInstanceOf[InetSocketAddress].getPort

  /** Mutual-TLS context mirroring tonic's `ServerTlsConfig` as the reference
    * configures it (flight_sql.rs:949-1021: PEM cert + key, and client_ca
    * makes client-certificate verification REQUIRED). JDK SSL provider +
    * ALPN h2 — no native or extra jars involved, so this works on the
    * stock Spark classpath. */
  private val sslCtx = tls.map { t =>
    import io.netty.handler.ssl.{ApplicationProtocolConfig, ApplicationProtocolNames, ClientAuth, SslContextBuilder, SslProvider}
    SslContextBuilder
      .forServer(new java.io.File(t.cert), new java.io.File(t.key))
      .trustManager(new java.io.File(t.clientCa))
      .clientAuth(ClientAuth.REQUIRE)
      .sslProvider(SslProvider.JDK)
      .applicationProtocolConfig(new ApplicationProtocolConfig(
        ApplicationProtocolConfig.Protocol.ALPN,
        ApplicationProtocolConfig.SelectorFailureBehavior.NO_ADVERTISE,
        ApplicationProtocolConfig.SelectedListenerFailureBehavior.ACCEPT,
        ApplicationProtocolNames.HTTP_2))
      .build()
  }

  def start(): FlightSqlServer = {
    val b = new ServerBootstrap()
    b.group(group).channel(classOf[NioServerSocketChannel])
      // TCP_NODELAY: small frames must not sit in Nagle's buffer behind the
      // peer's delayed ACK (HttpApp measured a flat ~40 ms floor without it)
      .childOption(io.netty.channel.ChannelOption.TCP_NODELAY, java.lang.Boolean.TRUE)
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          sslCtx.foreach(c => ch.pipeline().addLast(c.newHandler(ch.alloc())))
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              override def initChannel(stream: Channel): Unit =
                stream.pipeline().addLast(new GrpcStreamHandler)
            }))
          ()
        }
      })
    channel = b.bind(host, port).sync().channel()
    this
  }

  def stop(): Unit = {
    if (channel != null) channel.close().sync()
    group.shutdownGracefully(0, 100, java.util.concurrent.TimeUnit.MILLISECONDS)
    workers.shutdown()
  }

  // ---- gRPC status codes ----------------------------------------------------
  private val OK = 0
  private val NOT_FOUND = 5
  private val UNIMPLEMENTED = 12
  private val INTERNAL = 13
  private val UNAUTHENTICATED = 16
  private val INVALID_ARGUMENT = 3

  final case class GrpcError(code: Int, message: String)
    extends RuntimeException(message)

  // ---- per-stream handler ---------------------------------------------------

  private final class GrpcStreamHandler extends SimpleChannelInboundHandler[AnyRef] {
    private var headers: io.netty.handler.codec.http2.Http2Headers = _
    private val body = new java.io.ByteArrayOutputStream()

    override def channelRead0(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
      case h: Http2HeadersFrame =>
        headers = h.headers()
        if (h.isEndStream) dispatch(ctx)
      case d: Http2DataFrame =>
        val buf = d.content()
        val chunk = new Array[Byte](buf.readableBytes())
        buf.readBytes(chunk)
        body.write(chunk)
        if (d.isEndStream) dispatch(ctx)
      case _ => ()
    }

    private def dispatch(ctx: ChannelHandlerContext): Unit = {
      val path = String.valueOf(headers.path())
      val auth = Option(headers.get("authorization")).map(String.valueOf(_))
      val bytes = body.toByteArray
      val ch = ctx.channel()
      workers.execute(() =>
        try {
          val messages = parseGrpcFrames(bytes)
          val (meta, out) = route(path, auth, messages)
          respond(ch, meta, out, OK, "")
        } catch {
          case e: GrpcError => respond(ch, Nil, Iterator.empty, e.code, e.message)
          case e: Throwable =>
            respond(ch, Nil, Iterator.empty, INTERNAL, String.valueOf(e.getMessage))
        })
    }
  }

  /** `[flag][len BE][payload]`* — flag 1 (compressed) is unsupported. */
  private def parseGrpcFrames(body: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off + 5 <= body.length) {
      if (body(off) != 0)
        throw GrpcError(UNIMPLEMENTED, "compressed grpc messages not supported")
      val len = java.nio.ByteBuffer.wrap(body, off + 1, 4).getInt
      out += java.util.Arrays.copyOfRange(body, off + 5, off + 5 + len)
      off += 5 + len
    }
    out.result()
  }

  private def respond(ch: Channel, meta: Seq[(String, String)],
                      messages: Iterator[Array[Byte]], status: Int, msg: String): Unit = {
    val h = new DefaultHttp2Headers().status("200")
    h.set("content-type", "application/grpc+proto")
    meta.foreach { case (k, v) => h.set(k, v) }
    if (status != OK && !messages.hasNext) {
      // trailers-only error response
      h.set("grpc-status", String.valueOf(status))
      if (msg.nonEmpty) h.set("grpc-message", percentEncode(msg))
      ch.writeAndFlush(new DefaultHttp2HeadersFrame(h, true))
      return
    }
    ch.write(new DefaultHttp2HeadersFrame(h, false))
    messages.foreach { m =>
      val framed = java.nio.ByteBuffer.allocate(5 + m.length)
      framed.put(0.toByte).putInt(m.length).put(m)
      ch.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(framed.array()), false))
      ch.flush()
    }
    val trailers = new DefaultHttp2Headers()
    trailers.set("grpc-status", String.valueOf(status))
    if (msg.nonEmpty) trailers.set("grpc-message", percentEncode(msg))
    ch.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
    ()
  }

  private def percentEncode(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  // ---- auth -----------------------------------------------------------------

  private def checkToken(auth: Option[String]): Unit = effectiveToken.foreach { token =>
    val header = auth.getOrElse(throw GrpcError(UNAUTHENTICATED, "token not found"))
    if (!header.startsWith("Bearer "))
      throw GrpcError(INVALID_ARGUMENT, "invalid auth type")
    val user = header.substring("Bearer ".length)
    if (!java.security.MessageDigest.isEqual(token.getBytes(UTF_8), user.getBytes(UTF_8)))
      throw GrpcError(UNAUTHENTICATED, "invalid token")
  }

  private def handshake(auth: Option[String]): (Seq[(String, String)], Iterator[Array[Byte]]) = {
    val expected = basicEncoded.getOrElse(
      throw GrpcError(UNAUTHENTICATED, "no basic auth cred configured"))
    val header = auth.getOrElse(
      throw GrpcError(UNAUTHENTICATED, "missing authorization header"))
    val sp = header.indexOf(' ')
    if (sp < 0) throw GrpcError(INVALID_ARGUMENT, "invalid authorization header")
    val (authType, authValue) = (header.substring(0, sp), header.substring(sp + 1))
    if (authType.toLowerCase != "basic")
      throw GrpcError(INVALID_ARGUMENT,
        "invalid authorization type, basic auth is the only supported type")
    // client value may carry base64 `=` padding the stored form doesn't
    if (expected.length > authValue.length ||
        !java.security.MessageDigest.isEqual(
          expected.getBytes(UTF_8),
          authValue.substring(0, expected.length).getBytes(UTF_8)))
      throw GrpcError(UNAUTHENTICATED, "unauthorized")
    val token = effectiveToken.getOrElse(throw GrpcError(INTERNAL, "token not found"))
    (Seq("authorization" -> s"Bearer $token"),
      Iterator(HandshakeResponse.encode(0, token.getBytes(UTF_8))))
  }

  // ---- routing --------------------------------------------------------------

  private val ServicePrefix = "/arrow.flight.protocol.FlightService/"

  private def route(path: String, auth: Option[String], messages: Seq[Array[Byte]])
      : (Seq[(String, String)], Iterator[Array[Byte]]) = {
    def first: Array[Byte] =
      messages.headOption.getOrElse(throw GrpcError(INVALID_ARGUMENT, "empty request"))
    if (!path.startsWith(ServicePrefix))
      throw GrpcError(UNIMPLEMENTED, s"unknown service path: $path")
    path.substring(ServicePrefix.length) match {
      case "Handshake" => handshake(auth)
      case "GetFlightInfo" =>
        checkToken(auth)
        (Nil, Iterator(getFlightInfo(FlightDescriptor.parse(first)).encode))
      case "GetSchema" =>
        checkToken(auth)
        (Nil, Iterator(getSchema(FlightDescriptor.parse(first))))
      case "DoGet" =>
        checkToken(auth)
        (Nil, doGet(Ticket.parse(first)))
      case "DoAction" =>
        checkToken(auth)
        (Nil, doAction(Action.parse(first)))
      case "DoPut" =>
        checkToken(auth)
        (Nil, doPut(first))
      case "ListActions" =>
        (Nil, Iterator(
          new ProtoWire.Writer().string(1, "CreatePreparedStatement").result(),
          new ProtoWire.Writer().string(1, "ClosePreparedStatement").result()))
      case other => throw GrpcError(UNIMPLEMENTED, s"$other not implemented")
    }
  }

  // ---- statement + catalog flows -------------------------------------------

  private def fetchTicket(handle: String): Ticket =
    Ticket(AnyMsg(FetchResults.Url, FetchResults(handle).encode).encode)

  private def schemaBytesOf(df: DataFrame): Array[Byte] =
    ArrowIpcFrames.encapsulatedSchema(GraftArrowBridge.arrowSchemaOf(df))

  private def executeToHandle(df: DataFrame, handle: String): Unit =
    results.put(handle, GraftArrowBridge.toIpcStreamBytes(df))

  private def getFlightInfo(desc: FlightDescriptor): FlightInfo = {
    val any = AnyMsg.parse(desc.cmd)
    any.typeUrl match {
      case CommandStatementQuery.Url =>
        val q = CommandStatementQuery.parse(any.value).query
        val df = engine.querySql(q)
        val handle = java.util.UUID.randomUUID().toString
        executeToHandle(df, handle)
        FlightInfo(schemaBytesOf(df), FlightDescriptor.cmd(Array.emptyByteArray),
          fetchTicket(handle))
      case CommandPreparedStatementQuery.Url =>
        val handle = new String(
          CommandPreparedStatementQuery.parse(any.value).handle, UTF_8)
        val df = Option(statements.get(handle)).getOrElse(
          throw GrpcError(INTERNAL, s"Plan handle not found: $handle"))
        executeToHandle(df, handle)
        FlightInfo(schemaBytesOf(df), FlightDescriptor.cmd(Array.emptyByteArray),
          fetchTicket(handle))
      case CommandGetCatalogs.Url | CommandGetDbSchemas.Url | CommandGetTables.Url =>
        // catalog ops: ticket echoes the command; DoGet rebuilds the batch
        FlightInfo(schemaBytesOf(catalogCommandDf(any)), desc, Ticket(desc.cmd))
      case CommandGetSqlInfo.Url =>
        val (schema, _) = sqlInfoPayload(CommandGetSqlInfo.parse(any.value).info)
        FlightInfo(schema, desc, Ticket(desc.cmd))
      case CommandGetXdbcTypeInfo.Url =>
        val (schema, _) = xdbcTypeInfoPayload(
          CommandGetXdbcTypeInfo.parse(any.value).dataType)
        FlightInfo(schema, desc, Ticket(desc.cmd))
      case CommandGetTableTypes.Url =>
        // parity: the reference's get_flight_info_table_types is an
        // unimplemented arm too (flight_sql.rs:504-512)
        throw GrpcError(UNIMPLEMENTED, "get_flight_info_table_types not implemented")
      case url =>
        throw GrpcError(UNIMPLEMENTED, s"unsupported command: $url")
    }
  }

  private def getSchema(desc: FlightDescriptor): Array[Byte] = {
    val any = AnyMsg.parse(desc.cmd)
    val df = any.typeUrl match {
      case CommandStatementQuery.Url =>
        engine.querySql(CommandStatementQuery.parse(any.value).query)
      case CommandGetCatalogs.Url | CommandGetDbSchemas.Url | CommandGetTables.Url =>
        catalogCommandDf(any)
      case url => throw GrpcError(UNIMPLEMENTED, s"unsupported command: $url")
    }
    // SchemaResult { bytes schema = 1 }
    new ProtoWire.Writer().bytes(1, schemaBytesOf(df)).result()
  }

  private def doGet(ticket: Ticket): Iterator[Array[Byte]] = {
    val any = AnyMsg.parse(ticket.ticket)
    any.typeUrl match {
      case FetchResults.Url =>
        val handle = FetchResults.parse(any.value).handle
        val bytes = Option(results.remove(handle)).getOrElse(
          throw GrpcError(INTERNAL, s"Request handle not found: $handle"))
        ArrowIpcFrames.split(bytes).iterator.map(_.encode)
      case CommandGetCatalogs.Url | CommandGetDbSchemas.Url | CommandGetTables.Url =>
        ArrowIpcFrames.split(
          GraftArrowBridge.toIpcStreamBytes(catalogCommandDf(any))).iterator.map(_.encode)
      case CommandGetSqlInfo.Url =>
        sqlInfoPayload(CommandGetSqlInfo.parse(any.value).info)._2.iterator.map(_.encode)
      case CommandGetXdbcTypeInfo.Url =>
        xdbcTypeInfoPayload(CommandGetXdbcTypeInfo.parse(any.value).dataType)
          ._2.iterator.map(_.encode)
      case url => throw GrpcError(UNIMPLEMENTED, s"do_get: unsupported ticket: $url")
    }
  }

  /** DoPut: the first FlightData's flight_descriptor (Flight.proto field 1)
    * names the command. The server is read-only, so like the reference only
    * CommandStatementUpdate answers — with the FIXED fake update result of
    * 1 row (flight_sql.rs:61 FAKE_UPDATE_RESULT, :782-789): a PutResult
    * whose app_metadata is DoPutUpdateResult{record_count: 1}. Every other
    * DoPut command is UNIMPLEMENTED, matching the reference arms. */
  private def doPut(firstMsg: Array[Byte]): Iterator[Array[Byte]] = {
    val r = new ProtoWire.Reader(firstMsg)
    var desc: Option[FlightDescriptor] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) => desc = Some(FlightDescriptor.parse(r.readBytes()))
      case (_, w) => r.skip(w)
    }
    val d = desc.getOrElse(
      throw GrpcError(INVALID_ARGUMENT, "do_put: missing flight descriptor"))
    val any = AnyMsg.parse(d.cmd)
    any.typeUrl match {
      case CommandStatementUpdate.Url =>
        val updateResult = new ProtoWire.Writer().int64(1, 1L).result()
        Iterator(new ProtoWire.Writer().bytes(1, updateResult).result())
      case url => throw GrpcError(UNIMPLEMENTED, s"do_put: $url not implemented")
    }
  }

  private def doAction(action: Action): Iterator[Array[Byte]] = action.actionType match {
    case "CreatePreparedStatement" =>
      val any = AnyMsg.parse(action.body)
      val q = ActionCreatePreparedStatementRequest.parse(any.value).query
      val df = engine.querySql(q) // analysis only — execution happens per fetch
      val handle = java.util.UUID.randomUUID().toString
      statements.put(handle, df)
      val res = ActionCreatePreparedStatementResult(
        handle.getBytes(UTF_8), schemaBytesOf(df))
      Iterator(ActionResult.encode(
        AnyMsg(ActionCreatePreparedStatementResult.Url, res.encode).encode))
    case "ClosePreparedStatement" =>
      val any = AnyMsg.parse(action.body)
      val handle = new String(
        ActionClosePreparedStatementRequest.parse(any.value).handle, UTF_8)
      statements.remove(handle)
      results.remove(handle)
      Iterator.empty
    case other => throw GrpcError(UNIMPLEMENTED, s"action $other not implemented")
  }

  /** Server metadata for CommandGetSqlInfo (reference: flight_sql.rs:68-77
    * builds the same three server-info strings). The result schema is the
    * FlightSQL spec's `(info_name: uint32, value: dense_union)` — Spark has
    * no union type, so this one batch is hand-built with arrow-java
    * vectors. Returns (encapsulated schema bytes, FlightData frames). */
  private def sqlInfoPayload(requested: Seq[Long]): (Array[Byte], Seq[FlightData]) = {
    import org.apache.arrow.vector.{BigIntVector, BitVector, FieldVector, IntVector, UInt4Vector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.complex.DenseUnionVector
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
    val infos: Seq[(Long, String)] = Seq(
      0L -> "Graft Flight SQL Server", // FLIGHT_SQL_SERVER_NAME
      1L -> "1",                       // FLIGHT_SQL_SERVER_VERSION
      2L -> "1.3")                     // FLIGHT_SQL_SERVER_ARROW_VERSION
    val selected =
      if (requested.isEmpty) infos else infos.filter(kv => requested.contains(kv._1))
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    val names = new UInt4Vector("info_name", alloc)
    val union = DenseUnionVector.empty("value", alloc)
    try {
      val strId = union.registerNewTypeId(Field.nullable("string_value", ArrowType.Utf8.INSTANCE))
      val boolId = union.registerNewTypeId(Field.nullable("bool_value", ArrowType.Bool.INSTANCE))
      val bigintId = union.registerNewTypeId(Field.nullable("bigint_value", new ArrowType.Int(64, true)))
      val bitmaskId = union.registerNewTypeId(Field.nullable("int32_bitmask", new ArrowType.Int(32, true)))
      val strVec = union.addVector(strId,
        new VarCharVector("string_value", alloc)).asInstanceOf[VarCharVector]
      union.addVector(boolId, new BitVector("bool_value", alloc))
      union.addVector(bigintId, new BigIntVector("bigint_value", alloc))
      union.addVector(bitmaskId, new IntVector("int32_bitmask", alloc))
      names.allocateNew(selected.size)
      union.allocateNew()
      selected.zipWithIndex.foreach { case ((id, v), i) =>
        names.setSafe(i, id.toInt)
        strVec.setSafe(i, v.getBytes(UTF_8))
        union.setTypeId(i, strId)
        union.setOffset(i, i)
      }
      names.setValueCount(selected.size)
      strVec.setValueCount(selected.size)
      union.setValueCount(selected.size)
      val root = new VectorSchemaRoot(
        java.util.Arrays.asList[FieldVector](names, union))
      root.setRowCount(selected.size)
      val out = new java.io.ByteArrayOutputStream()
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
        root, null, java.nio.channels.Channels.newChannel(out))
      w.start(); w.writeBatch(); w.end(); w.close()
      (ArrowIpcFrames.encapsulatedSchema(root.getSchema),
        ArrowIpcFrames.split(out.toByteArray))
    } finally { names.close(); union.close(); alloc.close() }
  }

  /** Xdbc type metadata for CommandGetXdbcTypeInfo (reference:
    * flight_sql.rs:75-99 declares exactly ONE type row — INTEGER — and
    * :765-779 serves it; JDBC/ODBC-style Arrow clients ask for this table
    * during connection setup). The 19-column result schema is the PUBLIC
    * FlightSql.proto contract for the command; the command's optional
    * data_type field filters rows by SQL type code, exactly like the
    * arrow XdbcTypeInfoData builder the reference delegates to. Returns
    * (encapsulated schema bytes, FlightData frames). */
  private def xdbcTypeInfoPayload(dataTypeFilter: Option[Long])
      : (Array[Byte], Seq[FlightData]) = {
    import org.apache.arrow.vector.{BitVector, FieldVector, IntVector, VarCharVector, VectorSchemaRoot}
    import org.apache.arrow.vector.complex.ListVector
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    val XdbcInteger = 4L      // XdbcDataType::XDBC_INTEGER
    val NullabilityNullable = 1 // Nullable::NULLABILITY_NULLABLE
    val SearchableFull = 3      // Searchable::SEARCHABLE_FULL
    val utf8 = ArrowType.Utf8.INSTANCE
    val i32 = new ArrowType.Int(32, true)
    val bool = ArrowType.Bool.INSTANCE
    def field(name: String, t: ArrowType, nullable: Boolean): Field =
      new Field(name, if (nullable) FieldType.nullable(t) else FieldType.notNullable(t), null)
    val fields: Seq[Field] = Seq(
      field("type_name", utf8, nullable = false),
      field("data_type", i32, nullable = false),
      field("column_size", i32, nullable = true),
      field("literal_prefix", utf8, nullable = true),
      field("literal_suffix", utf8, nullable = true),
      new Field("create_params", FieldType.nullable(ArrowType.List.INSTANCE),
        java.util.Arrays.asList(field("item", utf8, nullable = false))),
      field("nullable", i32, nullable = false),
      field("case_sensitive", bool, nullable = false),
      field("searchable", i32, nullable = false),
      field("unsigned_attribute", bool, nullable = true),
      field("fixed_prec_scale", bool, nullable = false),
      field("auto_increment", bool, nullable = true),
      field("local_type_name", utf8, nullable = true),
      field("minimum_scale", i32, nullable = true),
      field("maximum_scale", i32, nullable = true),
      field("sql_data_type", i32, nullable = false),
      field("datetime_subcode", i32, nullable = true),
      field("num_prec_radix", i32, nullable = true),
      field("interval_precision", i32, nullable = true))
    // the single INTEGER row, dropped when a data_type filter excludes it
    val nRows = if (dataTypeFilter.forall(_ == XdbcInteger)) 1 else 0
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
    val vectors: Seq[FieldVector] = fields.map(_.createVector(alloc))
    try {
      vectors.foreach(_.allocateNew())
      if (nRows == 1) {
        def str(name: String, v: String): Unit =
          vectors(fields.indexWhere(_.getName == name)).asInstanceOf[VarCharVector]
            .setSafe(0, v.getBytes(UTF_8))
        def int(name: String, v: Int): Unit =
          vectors(fields.indexWhere(_.getName == name)).asInstanceOf[IntVector]
            .setSafe(0, v)
        def bit(name: String, v: Boolean): Unit =
          vectors(fields.indexWhere(_.getName == name)).asInstanceOf[BitVector]
            .setSafe(0, if (v) 1 else 0)
        // values mirror the reference's XdbcTypeInfo INTEGER entry
        // (flight_sql.rs:77-97); unset columns stay NULL
        str("type_name", "INTEGER")
        int("data_type", XdbcInteger.toInt)
        int("column_size", 32)
        int("nullable", NullabilityNullable)
        bit("case_sensitive", v = false)
        int("searchable", SearchableFull)
        bit("unsigned_attribute", v = false)
        bit("fixed_prec_scale", v = false)
        bit("auto_increment", v = false)
        str("local_type_name", "INTEGER")
        int("sql_data_type", XdbcInteger.toInt)
        int("num_prec_radix", 2)
      }
      vectors.foreach(_.setValueCount(nRows))
      // an unset ListVector child needs its own count stamped
      vectors.collect { case l: ListVector => l.getDataVector.setValueCount(0) }
      val root = new VectorSchemaRoot(vectors.asJava)
      root.setRowCount(nRows)
      val out = new java.io.ByteArrayOutputStream()
      val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
        root, null, java.nio.channels.Channels.newChannel(out))
      w.start(); w.writeBatch(); w.end(); w.close()
      (ArrowIpcFrames.encapsulatedSchema(root.getSchema),
        ArrowIpcFrames.split(out.toByteArray))
    } finally { vectors.foreach(_.close()); alloc.close() }
  }

  // ---- catalog metadata batches --------------------------------------------

  private def catalogCommandDf(any: AnyMsg): DataFrame = any.typeUrl match {
    case CommandGetCatalogs.Url  => catalogsDf()
    case CommandGetDbSchemas.Url => dbSchemasDf(CommandGetDbSchemas.parse(any.value))
    case CommandGetTables.Url    => tablesDf(CommandGetTables.parse(any.value))
    case url => throw GrpcError(UNIMPLEMENTED, s"unsupported catalog command: $url")
  }

  /** SQL LIKE pattern (`%`, `_`) -> regex, the filter semantics the
    * FlightSQL metadata builders apply client-visibly. */
  private def likeMatches(pattern: String, value: String): Boolean =
    FlightSqlServer.likeMatches(pattern, value)

  private def catalogsDf(): DataFrame =
    engine.spark.createDataFrame(
      List(Row(CatalogName)).asJava,
      StructType(Seq(StructField("catalog_name", StringType, nullable = false))))

  private def dbSchemasDf(cmd: CommandGetDbSchemas): DataFrame = {
    val keep = cmd.catalog.forall(_ == CatalogName) &&
      cmd.dbSchemaFilterPattern.forall(likeMatches(_, SchemaName))
    engine.spark.createDataFrame(
      (if (keep) List(Row(CatalogName, SchemaName)) else List.empty[Row]).asJava,
      StructType(Seq(
        StructField("catalog_name", StringType, nullable = false),
        StructField("db_schema_name", StringType, nullable = false))))
  }

  private def tablesDf(cmd: CommandGetTables): DataFrame = {
    // reference quirk (flight_sql.rs:648-655): rows are labeled with the
    // FIRST requested table type, defaulting to "table"
    val tableType = cmd.tableTypes.headOption.getOrElse("table")
    val names =
      if (!cmd.catalog.forall(_ == CatalogName) ||
          !cmd.dbSchemaFilterPattern.forall(likeMatches(_, SchemaName))) Seq.empty
      else engine.tableNames
        .filter(n => cmd.tableNameFilterPattern.forall(likeMatches(_, n)))
    if (cmd.includeSchema) {
      val rows = names.map { n =>
        val schemaBytes = schemaBytesOf(engine.spark.table(n))
        Row(CatalogName, SchemaName, n, tableType, schemaBytes)
      }
      engine.spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("catalog_name", StringType, nullable = false),
        StructField("db_schema_name", StringType, nullable = false),
        StructField("table_name", StringType, nullable = false),
        StructField("table_type", StringType, nullable = false),
        StructField("table_schema", BinaryType, nullable = false))))
    } else {
      val rows = names.map(n => Row(CatalogName, SchemaName, n, tableType))
      engine.spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("catalog_name", StringType, nullable = false),
        StructField("db_schema_name", StringType, nullable = false),
        StructField("table_name", StringType, nullable = false),
        StructField("table_type", StringType, nullable = false))))
    }
  }
}
