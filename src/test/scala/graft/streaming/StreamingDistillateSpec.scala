package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming rate/gap distillate: cross-batch pair bridging through
  * the one-point state, late-arrival drops, counter resets, duplicate
  * timestamps — and batch-equivalence: on append-ordered input the
  * streamed rows must equal [[graft.operators.Distillate.rate]] over
  * the same data, bit for bit. */
class StreamingDistillateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-distillate-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def run(name: String, gapNs: Long,
                  batches: Seq[(Long, Long, Double)]*): Array[org.apache.spark.sql.Row] = {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val out = StreamingDistillate.rateStream(
      mem.toDF().toDF("sid", "time", "value"), gapNs)
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).orderBy("sid", "time", "value").collect()
  }

  test("bridges pairs across micro-batches; flags gaps; resets null rate_ctr") {
    val rows = run("sd1", gapNs = 5000000000L,
      Seq((1L, 0L, 10.0), (1L, 1000000000L, 12.0)),
      // next batch: first pair bridges batch 1's last point
      Seq((1L, 2000000000L, 6.0),            // decrease -> ctr reset
          (1L, 9000000000L, 7.0)),           // 7 s baseline -> gap
      Seq((2L, 0L, 1.0)))                    // first point: no emission
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1000000000L), (1L, 2000000000L), (1L, 9000000000L)))
    assert(rows(0).getDouble(3) === 2.0 && !rows(0).getBoolean(5))
    assert(rows(1).getDouble(3) === -6.0 && rows(1).isNullAt(4))
    assert(rows(2).getDouble(3) === (1.0 * 1e9 / 7000000000L) &&
      rows(2).getBoolean(5), "7 s > 5 s threshold flags a gap")
  }

  test("late arrivals drop; duplicate ts in order emits a null-rate row") {
    val rows = run("sd2", gapNs = Long.MaxValue,
      Seq((1L, 5000000000L, 1.0)),
      Seq((1L, 2000000000L, 9.0),            // below state -> dropped
          (1L, 5000000000L, 0.5),            // same ts, smaller value -> dropped
          (1L, 5000000000L, 1.0),            // EXACT duplicate -> null-rate row
          (1L, 5000000000L, 2.0),            // same ts, larger value -> kept, null rate
          (1L, 6000000000L, 3.0)))
    assert(rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((5000000000L, 1.0), (5000000000L, 2.0), (6000000000L, 3.0)),
      "the exact duplicate emits (as in batch); the late rows do not")
    assert(rows(0).isNullAt(3) && rows(0).isNullAt(4))
    assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
    assert(rows(2).getDouble(3) === 1.0)
  }

  test("enrichStream: cross-batch reference carry, equal-instant visibility, late drops") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Long, Double, Int)]
    val out = StreamingDistillate.enrichStream(
      mem.toDF().toDF("sid", "time", "value", "tag"))
    val q = out.toDF().writeStream.format("memory").queryName("en1")
      .outputMode("append").start()
    // batch 1: event before any ref -> None; ref then event at the
    // same instant -> visible
    mem.addData((1L, 5L, 1.0, 1), (1L, 10L, 7.0, 0), (1L, 10L, 2.0, 1))
    q.processAllAvailable()
    // batch 2: event enriches against batch 1's carried ref; a LATE
    // ref (t=8 < state 10) is dropped; another stream is independent
    mem.addData((1L, 20L, 3.0, 1), (1L, 8L, 9.0, 0), (2L, 9L, 4.0, 1))
    q.processAllAvailable()
    // batch 3: newer ref replaces state; tie at equal time -> larger value
    mem.addData((1L, 30L, 5.0, 0), (1L, 30L, 6.0, 0), (1L, 31L, 4.0, 1))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("en1").orderBy("sid", "time", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4)))))
    assert(rows.toSeq === Seq(
      (1L, 5L, None),
      (1L, 10L, Some((10L, 7.0))),
      (1L, 20L, Some((10L, 7.0))),
      (1L, 31L, Some((30L, 6.0))),
      (2L, 9L, None)))
  }

  test("enrichStream on append-ordered input equals the batch as-of per stream") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val seed = 123L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    var t = 0L
    val data = Seq.fill(80) {
      t += 1 + rnd.nextInt(100)
      (rnd.nextInt(2).toLong, t, rnd.nextInt(50).toDouble, rnd.nextInt(2))
    }
    val mem = MemoryStream[(Long, Long, Double, Int)]
    val q = StreamingDistillate.enrichStream(
      mem.toDF().toDF("sid", "time", "value", "tag"))
      .toDF().writeStream.format("memory").queryName("en2")
      .outputMode("append").start()
    data.grouped(23).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("en2").orderBy("sid", "time", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4)))))
    val batch = (0L to 1L).flatMap { sid =>
      val left = data.filter(d => d._1 == sid && d._4 == 1)
        .map(d => (d._2, d._3)).toDF("time", "value")
      val right = data.filter(d => d._1 == sid && d._4 == 0)
        .map(d => (d._2, d._3)).toDF("time", "value")
      graft.operators.Distillate.asOf(left, right, tileNs = 64L)
        .collect().map(r => (sid, r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
    }.sortBy(r => (r._1, r._2, r._3))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("append-ordered stream equals the batch operator bit-for-bit") {
    val ss = spark
    import ss.implicits._
    val seed = 99L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    var t = 0L
    val data = Seq.fill(60) {
      // ~1 in 6 points repeats the previous timestamp so duplicate-ts
      // (and occasionally exact-duplicate) rows exercise the NULL-rate
      // path in BOTH engines of the equivalence; the global
      // (time, value) sort below makes every per-sid subsequence
      // append-ordered, which is the contract's precondition
      if (rnd.nextInt(6) > 0) t += 1 + rnd.nextInt(2000000000)
      (rnd.nextInt(3).toLong, t, (rnd.nextInt(8) - 4) / 10.0)
    }.sortBy(r => (r._2, r._3))
    val streamed = run("sd3", gapNs = Long.MaxValue,
      data.grouped(17).toSeq: _*)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val batch = graft.operators.Distillate.rate(
      data.toDF("sid", "time", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // multiset compare: rows tied on (sid, time, value) can differ in
    // rate (a dup pair's NULL row vs its neighbor), and orderBy leaves
    // tie order unspecified — a sort on the visible key alone could
    // interleave the two sides differently and flake
    def ms(xs: Iterable[Any]) = xs.groupBy(identity).map { case (k, v) => (k, v.size) }
    assert(ms(streamed.toSeq) === ms(batch.toSeq))
  }

  test("crossingsStream: cross-batch bridging, late drops, batch equivalence") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Long, Double)]
    val out = StreamingDistillate.crossingsStream(
      mem.toDF().toDF("sid", "time", "value"), threshold = 100.0)
    val q = out.toDF().writeStream.format("memory").queryName("sdc")
      .outputMode("append").start()
    // batch 1 ends below threshold; batch 2's first point crosses UP
    // against batch 1's carried state
    mem.addData((1L, 0L, 50.0), (1L, 10L, 80.0)); q.processAllAvailable()
    mem.addData((1L, 20L, 120.0), (1L, 30L, 90.0)); q.processAllAvailable()
    // late point (before the state's last instant): dropped, no event
    mem.addData((1L, 5L, 500.0)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sdc").orderBy("time").collect()
      .map(r => (r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq((20L, "up"), (30L, "down")))

    // randomized append-ordered stream equals the batch operator
    val rnd = new scala.util.Random(7L)
    val data = (0 until 300).map(i =>
      (1L + rnd.nextInt(3), i * 10L, rnd.nextInt(200).toDouble))
    val mem2 = MemoryStream[(Long, Long, Double)]
    val out2 = StreamingDistillate.crossingsStream(
      mem2.toDF().toDF("sid", "time", "value"), threshold = 100.0)
    val q2 = out2.toDF().writeStream.format("memory").queryName("sdc2")
      .outputMode("append").start()
    data.grouped(23).foreach { b => mem2.addData(b: _*); q2.processAllAvailable() }
    q2.stop()
    val streamed = spark.table("sdc2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    val batch = graft.operators.Distillate.crossings(
        data.toDF("sid", "time", "value"), 100.0)
      .collect()
      .map(r => (r.getAs[Long]("sid"), r.getAs[Long]("time"),
        r.getAs[Double]("value"), r.getAs[String]("dir")))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(streamed == batch)
  }
}
