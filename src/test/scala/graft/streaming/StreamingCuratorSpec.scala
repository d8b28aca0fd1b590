package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming admission gate: exactly-once content admission across
  * micro-batches, batch-identical quality verdicts, scrub-then-index
  * dedup identity. */
class StreamingCuratorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-curator-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  // 50 tokens, no stopwords — passes the quality rule
  private val good = (1 to 50).map(i => s"w$i").mkString(" ")
  private val good2 = (1 to 50).map(i => s"v$i").mkString(" ")

  test("duplicates are admitted once: within a batch, across batches, min-id canonical") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val ckpt = Files.createTempDirectory("curator-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val out = StreamingCurator.curate(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("curated")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // batch 1: same content twice (ids 9, 3) + distinct content
    mem.addData((9L, good), (3L, good), (5L, good2))
    q.processAllAvailable()
    // batch 2: the same content AGAIN from a later crawl
    mem.addData((20L, good))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("curated").collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    // min doc_id wins within the batch; the batch-2 re-arrival is absorbed
    assert(rows.toSeq == Seq((3L, 50L), (5L, 50L)))
  }

  test("media quarantine: a corrupt container in a micro-batch yields a " +
       "reject row and the stream survives") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    import graft.etl.Multimodal
    val ckpt = Files.createTempDirectory("curator-media-ckpt").toString
    val goodBmp = Multimodal.BmpCodec.encode(4, 4,
      Array.tabulate(16)(_.toByte))
    val goodGif = graft.etl.GifCodec.encode(3, 2,
      Array.tabulate(6)(i => (40 + i).toByte))
    val corrupt = java.util.Arrays.copyOf(goodBmp, 10) // truncated header
    val alien = "riff-less mystery bytes".getBytes("UTF-8")
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val out = StreamingCurator.curateMedia(
      mem.toDF().toDF("asset_id", "kind", "payload"))
    val q = out.writeStream.format("memory").queryName("media_gate")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // batch 1: good + corrupt together — the corrupt row must not fail
    // the batch (a thrown decode would loop the retry and kill the query)
    mem.addData((1L, "image/bmp", goodBmp), (2L, "image/bmp", corrupt))
    q.processAllAvailable()
    // batch 2 AFTER the corrupt row: the stream is still alive
    mem.addData((3L, "image/gif", goodGif), (4L, "model/unknown", alien))
    q.processAllAvailable()
    // batch 3: the round-19 container walks ride the same gate — a
    // valid ICO admits, a truncated TIFF tags a reject, stream survives
    val ico = graft.etl.ContainerWalks.IcoCodec.build(Seq((3, 2,
      graft.etl.Multimodal.PngCodec.encode(3, 2,
        Array.tabulate[Byte](6)(i => (i + 1).toByte)))))
    val tiffTrunc = java.util.Arrays.copyOf(
      graft.etl.ContainerWalks.TiffCodec.build(big = false, 3, 2,
        Seq(Array.tabulate[Byte](6)(i => (i + 1).toByte))), 20)
    mem.addData((5L, "image/x-icon", ico), (6L, "image/tiff", tiffTrunc))
    q.processAllAvailable()
    assert(q.isActive, "stream must survive the corrupt container")
    q.stop()
    val rows = spark.table("media_gate").collect()
      .map(r => (r.getLong(0), r.getBoolean(3),
        Option(r.getString(8)))).sortBy(_._1)
    // count conservation: 6 in, 6 out, each tagged
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(rows(0)._2 && rows(2)._2, "good containers admitted")
    assert(!rows(1)._2 && rows(1)._3.contains("decode-error"), rows(1))
    assert(!rows(3)._2 && rows(3)._3.contains("unknown-kind"), rows(3))
    assert(rows(4)._2, "valid ICO admitted through the stream gate")
    assert(!rows(5)._2 && rows(5)._3.contains("decode-error"), rows(5))
    // the admitted GIF decoded for real: its checksum is the pixel sum
    val gifRow = spark.table("media_gate").collect()
      .find(_.getLong(0) == 3L).get
    assert(gifRow.getLong(4) == (40 to 45).sum)
  }

  test("quality gate matches the batch rule; scrubbed PII forms one dedup identity") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val ckpt = Files.createTempDirectory("curator-ckpt2").toString
    // two crawls of the same page differing ONLY in the embedded email:
    // after scrubbing they are the same content and must dedup together
    val page1 = good + " mail alice@example.com now"
    val page2 = good + " mail bob@test.org now"
    val short = "too short" // fails the >= 40 token rule
    val stopheavy = Seq.fill(60)("the x").mkString(" ") // stops*5 > tokens
    val mem = MemoryStream[(Long, String)]
    val out = StreamingCurator.curate(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("curated2")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    mem.addData((1L, page1), (2L, short), (3L, stopheavy))
    q.processAllAvailable()
    mem.addData((4L, page2))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("curated2").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 1, s"only the first scrubbed page admits: ${rows.toSeq}")
    assert(rows.head._1 == 1L)
    assert(rows.head._2.contains("<EMAIL>") && !rows.head._2.contains("alice"))
    // the stream's quality verdicts agree with the batch rule
    assert(StreamingCurator.keepQuality(good))
    assert(!StreamingCurator.keepQuality(short))
    assert(!StreamingCurator.keepQuality(stopheavy))
  }

  test("event-time TTL bounds the seen-set: eviction, pinning, re-admission") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ckpt = Files.createTempDirectory("curator-ckpt3").toString
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingCurator.curate(
      mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds"),
      ttlMs = Some(10000L))
    val q = out.writeStream.format("memory").queryName("curated3")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // t=1: first crawl admits; t=2: duplicate absorbed AND extends
    // the digest's eviction deadline to t=12
    mem.addData((1L, good, ts(1))); q.processAllAvailable()
    mem.addData((2L, good, ts(2))); q.processAllAvailable()
    // t=60: unrelated content pushes the watermark far past t=12 …
    mem.addData((50L, good2, ts(60))); q.processAllAvailable()
    // … so this batch first processes `good`'s timeout (evicts it)
    mem.addData((60L, good2, ts(61))); q.processAllAvailable()
    // t=62: the SAME content re-arrives after eviction → re-admitted
    // (the TTL is the dedup horizon; the infinite horizon belongs to
    // the persisted batch DedupState index)
    mem.addData((70L, good, ts(62))); q.processAllAvailable()
    val state = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    val ids = spark.table("curated3").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 50L, 70L),
      s"expected re-admission after eviction, got ${ids.toSeq}")
    // the evicted digest is gone from the store: only good2's record
    // and good's re-admitted record remain
    assert(state == 2L, s"state rows: $state")
  }
}
