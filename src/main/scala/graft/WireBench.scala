package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.channel.{ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, DefaultHttp2WindowUpdateFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannelBootstrap}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.wire.{BtrdbWire, GrpcServer, PbReader, PbWriter}

/** Wire-path scale probe: stream a multi-million-point RawValues
  * response through the REAL HTTP/2 gRPC endpoint and measure
  * throughput and peak driver heap. The claim under test: the server
  * streams under flow control (`toLocalIterator` + MaxInFlight=4), so
  * driver memory stays flat no matter the result size — the client
  * parses messages incrementally and keeps at most one in memory.
  * Prints ONE JSON line. */
object WireBench {
  def main(args: Array[String]): Unit = {
    val nPts = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("wirebench").toString
    val db = new graft.engine.Btrdb(spark, dir)
    val uuid = "12345678-0000-0000-0000-00000000beef"
    db.createStream(uuid, "wb/s", Map("k" -> "v"))
    db.insert(uuid, spark.range(nPts)
      .select(col("id").as("time"), (col("id") % 1000 / 100.0).as("value")))
    db.flush(uuid)
    val server = new GrpcServer(db, 0)
    val port = server.start()

    // heap sampler: peak used heap during the streaming call
    @volatile var peak = 0L
    @volatile var sampling = true
    val rt = Runtime.getRuntime
    val sampler = new Thread(() => while (sampling) {
      peak = math.max(peak, rt.totalMemory() - rt.freeMemory())
      Thread.sleep(20)
    })

    val group = new MultiThreadIoEventLoopGroup(1, NioIoHandler.newFactory())
    val conn = new Bootstrap().group(group)
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
          ch.pipeline().addLast(
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter))
        }
      })
      .connect("127.0.0.1", port).sync().channel()

    val done = new CountDownLatch(1)
    @volatile var nPoints = 0L
    @volatile var nMsgs = 0L
    @volatile var nBytes = 0L
    // incremental 5-byte-framed message parser: keeps ONE partial
    // message, never the whole response
    val buf = new java.io.ByteArrayOutputStream()
    def drain(): Unit = {
      var arr = buf.toByteArray
      var pos = 0
      while (arr.length - pos >= 5) {
        val len = ((arr(pos + 1) & 0xff) << 24) | ((arr(pos + 2) & 0xff) << 16) |
          ((arr(pos + 3) & 0xff) << 8) | (arr(pos + 4) & 0xff)
        if (arr.length - pos - 5 < len) {
          val rest = java.util.Arrays.copyOfRange(arr, pos, arr.length)
          buf.reset(); buf.write(rest); return
        }
        val msg = new PbReader(
          java.util.Arrays.copyOfRange(arr, pos + 5, pos + 5 + len))
        while (msg.hasNext) msg.readTag() match {
          case (4, _) => msg.lenReader(); nPoints += 1
          case (_, w) => msg.skip(w)
        }
        nMsgs += 1
        pos += 5 + len
      }
      val rest = java.util.Arrays.copyOfRange(arr, pos, arr.length)
      buf.reset(); buf.write(rest)
    }
    val sch = new Http2StreamChannelBootstrap(conn)
      .handler(new ChannelInboundHandlerAdapter {
        override def channelRead(ctx: ChannelHandlerContext,
                                 msg: AnyRef): Unit = msg match {
          case h: Http2HeadersFrame =>
            if (h.isEndStream) done.countDown()
          case d: Http2DataFrame =>
            val arr = new Array[Byte](d.content().readableBytes())
            d.content().readBytes(arr)
            nBytes += arr.length
            buf.write(arr, 0, arr.length)
            drain()
            val end = d.isEndStream
            val credit = d.initialFlowControlledBytes()
            d.release()
            if (credit > 0)
              ctx.writeAndFlush(new DefaultHttp2WindowUpdateFrame(credit))
            if (end) done.countDown()
          case other => io.netty.util.ReferenceCountUtil.release(other)
        }
      })
      .open().sync().getNow
    val headers = new DefaultHttp2Headers()
    headers.method("POST").scheme("http")
      .authority(s"127.0.0.1:$port")
      .path("/grpcinterface.BTrDB/RawValues")
    headers.set("content-type", "application/grpc")
    headers.set("te", "trailers")
    val req = new PbWriter
    req.bytes(1, BtrdbWire.uuidBytes(uuid))
    req.sfixed64(2, 0L); req.sfixed64(3, nPts + 1)

    System.gc(); Thread.sleep(300)
    val baseline = rt.totalMemory() - rt.freeMemory()
    sampler.start()
    val t0 = System.nanoTime()
    sch.write(new DefaultHttp2HeadersFrame(headers))
    val payload = req.toBytes
    val b = io.netty.buffer.Unpooled.buffer(5 + payload.length)
    b.writeByte(0).writeInt(payload.length).writeBytes(payload)
    sch.writeAndFlush(new DefaultHttp2DataFrame(b, true))
    val ok = done.await(1200, TimeUnit.SECONDS)
    val sec = (System.nanoTime() - t0) / 1e9
    sampling = false; sampler.join()
    conn.close().sync(); group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
    server.stop(); db.close()

    println(s"""{"metric":"wire_raw","ok":$ok,"points":$nPoints,""" +
      s""""expected":$nPts,"messages":$nMsgs,"bytes":$nBytes,""" +
      s""""sec":$sec,"points_per_sec":${(nPoints / sec).toLong},""" +
      s""""baseline_heap_mb":${baseline / 1048576},""" +
      s""""peak_heap_mb":${peak / 1048576}}""")
    spark.stop()
  }
}
