package graft.server.flight

import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer, MultiThreadIoEventLoopGroup, SimpleChannelInboundHandler}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannelBootstrap}

object GrpcTestClient {
  /** Client TLS: trust the server CA; optionally present a client
    * certificate (PEM cert+key) for mutual TLS. */
  final case class Tls(serverCa: String, clientCert: Option[(String, String)])
}

/** Minimal gRPC test client over h2c (prior knowledge) or TLS+ALPN, one
  * POST stream per call — the spec's stand-in for an Arrow Flight SQL
  * client library, which does not exist on the offline classpath. Speaks
  * the same public wire contract the server implements, over a REAL TCP
  * connection. */
final class GrpcTestClient(host: String, port: Int,
                           tls: Option[GrpcTestClient.Tls] = None) {

  final case class GrpcResponse(headers: Map[String, String],
                                messages: Seq[Array[Byte]],
                                status: Int, statusMessage: String)

  private val sslCtx = tls.map { t =>
    import io.netty.handler.ssl.{ApplicationProtocolConfig, ApplicationProtocolNames, SslContextBuilder, SslProvider}
    val b = SslContextBuilder.forClient()
      .trustManager(new java.io.File(t.serverCa))
      .sslProvider(SslProvider.JDK)
      .applicationProtocolConfig(new ApplicationProtocolConfig(
        ApplicationProtocolConfig.Protocol.ALPN,
        ApplicationProtocolConfig.SelectorFailureBehavior.NO_ADVERTISE,
        ApplicationProtocolConfig.SelectedListenerFailureBehavior.ACCEPT,
        ApplicationProtocolNames.HTTP_2))
    t.clientCert.foreach { case (cert, key) =>
      b.keyManager(new java.io.File(cert), new java.io.File(key)) }
    b.build()
  }

  private val group = new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
  private val channel: Channel = {
    val b = new Bootstrap()
    b.group(group).channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          sslCtx.foreach(c =>
            ch.pipeline().addLast(c.newHandler(ch.alloc(), host, port)))
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forClient().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              override def initChannel(ch: Channel): Unit = () // no server push
            }))
          ()
        }
      })
    b.connect(host, port).sync().channel()
  }

  def close(): Unit = {
    channel.close().sync()
    group.shutdownGracefully(0, 100, TimeUnit.MILLISECONDS)
    ()
  }

  /** One gRPC call: send every request message, half-close, collect the
    * response messages and trailers. */
  def call(path: String, messages: Seq[Array[Byte]],
           metadata: Map[String, String] = Map.empty): GrpcResponse = {
    val done = new CompletableFuture[GrpcResponse]()
    val collector = new SimpleChannelInboundHandler[AnyRef] {
      private val headers = scala.collection.mutable.Map[String, String]()
      private val body = new java.io.ByteArrayOutputStream()
      private def finish(): Unit = {
        val msgs = Seq.newBuilder[Array[Byte]]
        val bytes = body.toByteArray
        var off = 0
        while (off + 5 <= bytes.length) {
          val len = java.nio.ByteBuffer.wrap(bytes, off + 1, 4).getInt
          msgs += java.util.Arrays.copyOfRange(bytes, off + 5, off + 5 + len)
          off += 5 + len
        }
        val status = headers.get("grpc-status").map(_.toInt).getOrElse(-1)
        val sm = java.net.URLDecoder.decode(headers.getOrElse("grpc-message", ""), "UTF-8")
        done.complete(GrpcResponse(headers.toMap, msgs.result(), status, sm))
        ()
      }
      override def channelRead0(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
        case h: Http2HeadersFrame =>
          h.headers().forEach(e =>
            headers.put(String.valueOf(e.getKey), String.valueOf(e.getValue)))
          if (h.isEndStream) finish()
        case d: Http2DataFrame =>
          val chunk = new Array[Byte](d.content().readableBytes())
          d.content().readBytes(chunk)
          body.write(chunk)
          if (d.isEndStream) finish()
        case _ => ()
      }
      override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
        done.completeExceptionally(cause); ()
      }
    }
    val stream = new Http2StreamChannelBootstrap(channel)
      .handler(collector).open().sync().getNow
    val h = new DefaultHttp2Headers()
      .method("POST").scheme("http").authority(s"$host:$port").path(path)
    h.set("content-type", "application/grpc+proto")
    h.set("te", "trailers")
    metadata.foreach { case (k, v) => h.set(k, v) }
    stream.write(new DefaultHttp2HeadersFrame(h, false))
    val out = new java.io.ByteArrayOutputStream()
    messages.foreach { m =>
      val framed = java.nio.ByteBuffer.allocate(5 + m.length)
      framed.put(0.toByte).putInt(m.length).put(m)
      out.write(framed.array())
    }
    stream.writeAndFlush(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(out.toByteArray), true))
    done.get(60, TimeUnit.SECONDS)
  }
}
