package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.channel.{ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, MultiThreadIoEventLoopGroup}
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannelBootstrap}
import org.apache.spark.sql.SparkSession

import graft.wire.{BtrdbWire, GrpcServer, PbWriter}

/** Wire INGEST scale probe — the wire read path's mirror
  * ([[WireBench]]): drive the reference's 25,000-point Insert batching
  * through the REAL HTTP/2 gRPC endpoint and measure end-to-end ingest
  * throughput (client encode → HTTP/2 flow control → server decode →
  * validate → stage → commit) and peak driver heap. The final batch
  * rides `sync = true`, so the measured window closes on a COMMITTED
  * root, and the engine count is verified afterwards — a dropped or
  * double-applied batch would show. Prints ONE JSON line. Usage:
  * {{{
  *   sbt "runMain graft.InsertWireBench [nBatches]"
  * }}}
  */
object InsertWireBench {
  private val BatchPts = 25000

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("insertwirebench").toString
    // staging threshold well above one batch: the commit cadence is the
    // engine's own (flush on the final sync batch), as in production
    val db = new graft.engine.Btrdb(spark, dir)
    val uuid = "12345678-0000-0000-0000-0000000feed5"
    db.createStream(uuid, "wb/ins", Map("k" -> "v"))
    val server = new GrpcServer(db, 0)
    val port = server.start()

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

    /** One unary Insert RPC: encode `n` points from `t0`, await the
      * version response's end-of-stream. Returns encoded bytes. */
    def insertBatch(t0: Long, n: Int, sync: Boolean): Long = {
      val req = new PbWriter
      req.bytes(1, BtrdbWire.uuidBytes(uuid))
      if (sync) req.bool(2, true)
      var i = 0
      while (i < n) {
        val p = new PbWriter
        p.sfixed64(1, t0 + i)
        p.double(2, (i % 1000) / 100.0)
        req.message(3, p)
        i += 1
      }
      val payload = req.toBytes
      val done = new CountDownLatch(1)
      val sch = new Http2StreamChannelBootstrap(conn)
        .handler(new ChannelInboundHandlerAdapter {
          override def channelRead(ctx: ChannelHandlerContext,
                                   msg: AnyRef): Unit = {
            msg match {
              case h: Http2HeadersFrame if h.isEndStream => done.countDown()
              case d: io.netty.handler.codec.http2.Http2DataFrame
                  if d.isEndStream =>
                d.release(); done.countDown()
              case other =>
                io.netty.util.ReferenceCountUtil.release(other)
            }
          }
        })
        .open().sync().getNow
      val headers = new DefaultHttp2Headers()
      headers.method("POST").scheme("http")
        .authority(s"127.0.0.1:$port")
        .path("/grpcinterface.BTrDB/Insert")
      headers.set("content-type", "application/grpc")
      headers.set("te", "trailers")
      sch.write(new DefaultHttp2HeadersFrame(headers))
      val b = io.netty.buffer.Unpooled.buffer(5 + payload.length)
      b.writeByte(0).writeInt(payload.length).writeBytes(payload)
      sch.writeAndFlush(new DefaultHttp2DataFrame(b, true))
      require(done.await(600, TimeUnit.SECONDS), "Insert RPC timed out")
      payload.length.toLong + 5L
    }

    // warmup batch (JIT + staging path), outside the timed window
    insertBatch(-BatchPts.toLong, BatchPts, sync = false)

    System.gc(); Thread.sleep(300)
    val baseline = rt.totalMemory() - rt.freeMemory()
    sampler.start()

    /** One timed phase: `n` sequential unary Inserts of `ptsPer`
      * points from time `from`, last one sync. Returns (sec, bytes). */
    def phase(from: Long, n: Int, ptsPer: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      var bytes = 0L
      var b = 0
      while (b < n) {
        bytes += insertBatch(from + b.toLong * ptsPer, ptsPer,
          sync = b == n - 1)
        b += 1
      }
      ((System.nanoTime() - t0) / 1e9, bytes)
    }

    // phase A: the reference client's 25k-point batching — per-RPC
    // fixed cost (two Spark jobs: partials agg + staging write)
    // dominates at this size
    val totalA = nBatches.toLong * BatchPts
    val (secA, bytesA) = phase(0L, nBatches, BatchPts)
    // phase B: the same point volume in 10x batches — the batching this
    // engine's documented no-25k-cap divergence exists for (large
    // batches amortize the per-commit fixed cost; see SURVEY "Known
    // divergences")
    val bigPts = BatchPts * 10
    val nBig = math.max(1, nBatches / 10)
    val totalB = nBig.toLong * bigPts
    val (secB, bytesB) = phase(totalA, nBig, bigPts)
    sampling = false; sampler.join()

    // correctness of the measured window: every point landed exactly once
    val total = totalA + totalB
    val got = db.rawValues(uuid, 0L, total).count()
    conn.close().sync(); group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
    server.stop(); db.close()

    println(s"""{"metric":"wire_insert","ok":${got == total},""" +
      s""""points":$total,"committed":$got,""" +
      s""""ref25k_batches":$nBatches,"ref25k_sec":$secA,""" +
      s""""ref25k_points_per_sec":${(totalA / secA).toLong},""" +
      s""""big250k_batches":$nBig,"big250k_sec":$secB,""" +
      s""""big250k_points_per_sec":${(totalB / secB).toLong},""" +
      s""""bytes":${bytesA + bytesB},""" +
      s""""baseline_heap_mb":${baseline / 1048576},""" +
      s""""peak_heap_mb":${peak / 1048576}}""")
    spark.stop()
  }
}
