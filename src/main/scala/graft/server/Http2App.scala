package graft.server

import java.net.InetSocketAddress
import java.util.concurrent.Executors

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandler, ChannelHandlerContext, ChannelInitializer, MultiThreadIoEventLoopGroup, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http.{DefaultFullHttpResponse, FullHttpRequest, HttpMessage, HttpObjectAggregator, HttpResponseStatus, HttpServerCodec, HttpServerUpgradeHandler, HttpVersion}
import io.netty.handler.codec.http2.{CleartextHttp2ServerUpgradeHandler, DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2ResetFrame, Http2CodecUtil, Http2DataFrame, Http2Error, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2ServerUpgradeCodec}
import io.netty.util.{AsciiString, ReferenceCountUtil}

/** HTTP/2 (h2c) frontend over the same [[Routes]] table as [[HttpApp]].
  *
  * The reference's axum server speaks HTTP/2 (pinned by its HTTP/2 API test,
  * roapi/tests/api_test.rs); the JDK HttpServer is 1.1-only, so this frontend
  * rides Netty's h2 codec (already on the Spark classpath). One port serves
  * all three cleartext modes:
  *
  *   - h2c prior knowledge (client preface straight away)
  *   - HTTP/1.1 `Upgrade: h2c` (what `HttpClient.Version.HTTP_2` over http://
  *     does on its first request)
  *   - plain HTTP/1.1 fallback for clients that never upgrade
  *
  * Spark execution is blocking, so requests dispatch to a worker pool and
  * responses are written back through the channel (Netty marshals cross-thread
  * writes onto the event loop; h2 flow control is the codec's job). Streamed
  * results flush one DATA frame per 64 KiB chunk, preserving the
  * partition-at-a-time bound of the 1.1 chunked path. */
final class Http2App(engine: Engine, port: Int = 0,
                     host: String = "127.0.0.1") {

  private val group = new MultiThreadIoEventLoopGroup(2, NioIoHandler.newFactory())
  private val workers = Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "graft-h2-worker"); t.setDaemon(true); t
  })
  @volatile private var channel: Channel = _

  def boundPort: Int =
    channel.localAddress.asInstanceOf[InetSocketAddress].getPort

  def start(): Http2App = {
    val b = new ServerBootstrap()
    b.group(group).channel(classOf[NioServerSocketChannel])
      // TCP_NODELAY: small frames must not sit in Nagle's buffer behind the
      // peer's delayed ACK (HttpApp measured a flat ~40 ms floor without it)
      .childOption(io.netty.channel.ChannelOption.TCP_NODELAY, java.lang.Boolean.TRUE)
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          val sourceCodec = new HttpServerCodec()
          // non-zero aggregation bound: an h2c Upgrade whose FIRST request
          // carries a body (POST /api/sql) must aggregate, not 413
          val upgrade = new HttpServerUpgradeHandler(sourceCodec, upgradeCodecFactory, 1 << 20)
          ch.pipeline().addLast(
            new CleartextHttp2ServerUpgradeHandler(sourceCodec, upgrade, h2Pipeline()))
          // reached only when neither preface nor Upgrade happened: plain 1.1
          ch.pipeline().addLast(new SimpleChannelInboundHandler[HttpMessage]() {
            override def channelRead0(ctx: ChannelHandlerContext, msg: HttpMessage): Unit = {
              val p = ctx.pipeline()
              p.addAfter(ctx.name(), "h1-handler", new Http1Handler)
              p.replace(this, "h1-aggregator", new HttpObjectAggregator(1 << 20))
              ctx.fireChannelRead(ReferenceCountUtil.retain(msg))
            }
          })
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

  /** h2 frame codec + one child channel per stream. */
  private def h2Pipeline(): ChannelHandler = new ChannelInitializer[Channel] {
    override def initChannel(ch: Channel): Unit =
      ch.pipeline().addLast(
        Http2FrameCodecBuilder.forServer().build(),
        new Http2MultiplexHandler(new ChannelInitializer[Channel] {
          override def initChannel(stream: Channel): Unit =
            stream.pipeline().addLast(new H2StreamHandler)
        }))
  }

  private def upgradeCodecFactory: HttpServerUpgradeHandler.UpgradeCodecFactory =
    (protocol: CharSequence) =>
      if (AsciiString.contentEquals(Http2CodecUtil.HTTP_UPGRADE_PROTOCOL_NAME, protocol))
        new Http2ServerUpgradeCodec(
          Http2FrameCodecBuilder.forServer().build(),
          new Http2MultiplexHandler(new ChannelInitializer[Channel] {
            override def initChannel(stream: Channel): Unit =
              stream.pipeline().addLast(new H2StreamHandler)
          }))
      else null

  // ---- per-stream h2 handler ----------------------------------------------

  private final class H2StreamHandler extends SimpleChannelInboundHandler[AnyRef] {
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
      val rawPath = String.valueOf(headers.path())
      val q = rawPath.indexOf('?')
      val (path, rawQuery) =
        if (q < 0) (rawPath, None) else (rawPath.substring(0, q), Some(rawPath.substring(q + 1)))
      val bytes = body.toByteArray
      val req = Routes.Request(
        String.valueOf(headers.method()), path, rawQuery,
        Option(headers.get("accept")).map(String.valueOf(_)), () => bytes,
        authorization = Option(headers.get("authorization")).map(String.valueOf(_)))
      val ch = ctx.channel()
      // permissive CORS on every response (roapi/src/server/http/mod.rs:61-66)
      def cors(h: io.netty.handler.codec.http2.Http2Headers)
          : io.netty.handler.codec.http2.Http2Headers = {
        Routes.corsHeadersFor(req.method).foreach { case (k, v) =>
          h.set(k.toLowerCase, v)
        }
        h
      }
      workers.execute(() =>
        try {
          Routes.handle(engine, req) match {
            case Routes.Full(status, mime, b) =>
              val h = cors(new DefaultHttp2Headers().status(String.valueOf(status)))
              h.set("content-type", mime)
              if (status == 401) // RFC 7235 challenge, as on the 1.1 transport
                h.set("www-authenticate", "Basic realm=\"graft\"")
              ch.write(new DefaultHttp2HeadersFrame(h, b.isEmpty))
              if (b.nonEmpty)
                ch.write(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(b), true))
              ch.flush()
            case Routes.Streamed(mime, write) =>
              val h = cors(new DefaultHttp2Headers().status("200"))
              h.set("content-type", mime)
              ch.writeAndFlush(new DefaultHttp2HeadersFrame(h, false))
              val out = new java.io.BufferedOutputStream(new java.io.OutputStream {
                override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
                override def write(b: Array[Byte], off: Int, len: Int): Unit =
                  if (len > 0) {
                    val f = ch.writeAndFlush(new DefaultHttp2DataFrame(
                      Unpooled.wrappedBuffer(java.util.Arrays.copyOfRange(b, off, off + len)), false))
                    // backpressure: once the h2 flow-control window (or the
                    // socket) is saturated, block THIS worker on the pending
                    // write — and ABORT the stream if the client stays
                    // stalled past the deadline, so a dead reader neither
                    // queues the export on heap nor pins the worker forever
                    if (!ch.isWritable) {
                      val done = f.awaitUninterruptibly(30000)
                      if (!done || !f.isSuccess)
                        throw new java.io.IOException(
                          if (done) s"h2 write failed: ${f.cause}" else "h2 client stalled >30s")
                    }
                  }
              }, 64 * 1024)
              try {
                write(out); out.flush()
                ch.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.EMPTY_BUFFER, true))
              } catch {
                case e: Throwable =>
                  // mid-stream failure AFTER a 200 + partial DATA: reset the
                  // stream so the client sees truncation — an endStream here
                  // would bless the partial body as a complete response
                  ch.writeAndFlush(new DefaultHttp2ResetFrame(Http2Error.INTERNAL_ERROR))
                  System.err.println(s"[h2] stream aborted: ${e.getMessage}")
              }
          }
        } catch {
          case e: Throwable =>
            val err = Routes.errorResponse(
              Routes.ApiError(500, "internal", String.valueOf(e.getMessage)))
            val h = cors(new DefaultHttp2Headers().status("500"))
            h.set("content-type", err.mime)
            ch.write(new DefaultHttp2HeadersFrame(h, false))
            ch.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(err.body), true))
        })
    }
  }

  // ---- HTTP/1.1 fallback on the same port ----------------------------------

  private final class Http1Handler extends SimpleChannelInboundHandler[FullHttpRequest] {
    override def channelRead0(ctx: ChannelHandlerContext, msg: FullHttpRequest): Unit = {
      val uri = msg.uri()
      val q = uri.indexOf('?')
      val (path, rawQuery) =
        if (q < 0) (uri, None) else (uri.substring(0, q), Some(uri.substring(q + 1)))
      val bytes = new Array[Byte](msg.content().readableBytes())
      msg.content().readBytes(bytes)
      val req = Routes.Request(
        msg.method().name(), path, rawQuery,
        Option(msg.headers().get("Accept")), () => bytes,
        authorization = Option(msg.headers().get("Authorization")))
      val ch = ctx.channel()
      workers.execute(() => {
        // a runtime failure must still produce a response — an escaped
        // exception here would leave the 1.1 client hanging forever
        val (status, mime, body) =
          try Routes.handle(engine, req) match {
            case Routes.Full(s, m, b) => (s, m, b)
            case Routes.Streamed(m, write) => // 1.1 fallback buffers streamed results
              val buf = new java.io.ByteArrayOutputStream()
              write(buf)
              (200, m, buf.toByteArray)
          } catch {
            case e: Throwable =>
              val err = Routes.errorResponse(
                Routes.ApiError(500, "internal", String.valueOf(e.getMessage)))
              (err.status, err.mime, err.body)
          }
        val resp = new DefaultFullHttpResponse(
          HttpVersion.HTTP_1_1, HttpResponseStatus.valueOf(status),
          Unpooled.wrappedBuffer(body))
        resp.headers().set("Content-Type", mime)
        resp.headers().set("Content-Length", body.length)
        if (status == 401)
          resp.headers().set("WWW-Authenticate", "Basic realm=\"graft\"")
        // permissive CORS (roapi/src/server/http/mod.rs:61-66)
        Routes.corsHeadersFor(req.method).foreach { case (k, v) =>
          resp.headers().set(k, v)
        }
        ch.writeAndFlush(resp)
      })
    }
  }
}
