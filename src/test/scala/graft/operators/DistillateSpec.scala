package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed examples + adversarial edges for the distillate
  * family: counter resets and duplicate timestamps in [[Distillate.rate]],
  * threshold strictness in [[Distillate.gaps]], and — the part with the
  * real failure modes — [[Distillate.asOf]] tile boundaries: a match in
  * an earlier tile (carry-in), a left tile with NO right rows at all
  * (the carry row must still exist), equal-timestamp at-or-before
  * inclusion, and the before-any-right NULL. A brute-force random
  * equivalence test pins the whole semantics against an O(n·m) model.
  */
class DistillateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("distillate")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def pts(rows: (Long, Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("sid", "time", "value")
  }

  test("rate: units/second, counter reset nulls rate_ctr, dup-ts nulls both") {
    val df = Distillate.rate(pts(
      (1L, 0L, 10.0),
      (1L, 2000000000L, 15.0),  // +5 over 2 s  -> 2.5/s
      (1L, 3000000000L, 3.0),   // -12 over 1 s -> rate -12, ctr NULL
      (1L, 3000000000L, 4.0),   // dup ts       -> 0-ns baseline, both NULL
      (2L, 1000000000L, 1.0),   // other stream: its first point emits nothing
      (2L, 2000000000L, 2.0)))
      .orderBy("sid", "time", "value")
      .collect()
    assert(df.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2000000000L), (1L, 3000000000L), (1L, 3000000000L),
        (2L, 2000000000L)))
    assert(df(0).getDouble(3) === 2.5 && df(0).getDouble(4) === 2.5)
    assert(df(1).getDouble(3) === -12.0 && df(1).isNullAt(4))
    assert(df(2).isNullAt(3) && df(2).isNullAt(4))
    assert(df(3).getDouble(3) === 1.0)
  }

  test("gaps: strictly-exceeds threshold, per-stream, reports the pair") {
    val out = Distillate.gaps(pts(
      (1L, 0L, 1.0),
      (1L, 100L, 1.0),   // gap 100 == threshold -> NOT reported
      (1L, 301L, 1.0),   // gap 201 -> reported
      (2L, 0L, 1.0),
      (2L, 500L, 1.0)),  // gap 500 -> reported
      thresholdNs = 100L)
      .orderBy("sid", "gap_start")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq((1L, 100L, 301L, 201L), (2L, 0L, 500L, 500L)))
  }

  test("asOf: same-tile match, carry across an EMPTY right tile, equal-ts" +
    " inclusion, before-any-right NULL") {
    val s = spark
    import s.implicits._
    // tile width 100: right rows only in tile 0; left rows probe tiles
    // 0 (same-tile), 2 (carry across empty tile 1), and a pre-right NULL.
    val left = Seq(5L, 40L, 250L, -10L).toDF("time")
    val right = Seq((10L, 1.0), (40L, 2.0), (40L, 3.0)).toDF("time", "value")
    val out = Distillate.asOf(left, right, tileNs = 100L)
      .orderBy("time").collect()
    // -10: before any right point -> NULLs
    assert(out(0).getLong(0) === -10L && out(0).isNullAt(1) && out(0).isNullAt(2))
    // 5: tile 0 but before t=10 -> still NULL (within-tile order, not carry)
    assert(out(1).getLong(0) === 5L && out(1).isNullAt(1))
    // 40: equal timestamp is INCLUDED; tie among right rows -> larger value
    assert(out(2).getLong(0) === 40L && out(2).getLong(1) === 40L &&
      out(2).getDouble(2) === 3.0)
    // 250: tile 2, right tiles 1 and 2 empty -> carry-in from tile 0
    assert(out(3).getLong(0) === 250L && out(3).getLong(1) === 40L &&
      out(3).getDouble(2) === 3.0)
  }

  test("asOf: randomized equivalence vs the O(n*m) model across tile widths") {
    val s = spark
    import s.implicits._
    val seed = 20260814L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val lt = Seq.fill(120)(rnd.nextLong(10000L) - 2000L)
    val rt = Seq.fill(90)((rnd.nextLong(10000L) - 2000L, rnd.nextInt(50).toDouble))
    val model: Map[Long, Option[(Long, Double)]] = lt.map { t =>
      val cands = rt.filter(_._1 <= t)
      t -> (if (cands.isEmpty) None else Some(cands.max))
    }.toMap
    for (tile <- Seq(7L, 100L, 1000L, 100000L)) {
      val out = Distillate.asOf(
        lt.toDF("time"), rt.toDF("time", "value"), tile)
        .collect()
      assert(out.length === lt.length, s"tile=$tile")
      out.foreach { r =>
        val got = if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))
        assert(got === model(r.getLong(0)), s"tile=$tile t=${r.getLong(0)}")
      }
    }
  }

  test("resampleHold: grid size from the range, held value, leading NULLs") {
    val out = Distillate.resampleHold(
      pts((1L, 25L, 7.0), (1L, 130L, 9.0)).select("time", "value"),
      start = 0L, end = 200L, step = 50L, tileNs = 100L)
      .orderBy("time").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 50L, 100L, 150L))
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) === 7.0)
    assert(out(2).getDouble(2) === 7.0)
    assert(out(3).getDouble(2) === 9.0)
  }

  test("corrMatrix: perfect +/- correlation, constant-series NULL, shared windows only") {
    // pw=4 → 16-ns windows. Stream 1: means 1,2,3 in windows 0,1,2.
    // Stream 2 = 2x (corr +1). Stream 3 = -x (corr -1). Stream 4
    // constant (NULL vs anyone). Stream 5 only in windows 0,1 (n=2).
    val out = Distillate.corrMatrix(pts(
      (1L, 0L, 1.0), (1L, 16L, 2.0), (1L, 32L, 3.0),
      (2L, 1L, 2.0), (2L, 17L, 4.0), (2L, 33L, 6.0),
      (3L, 2L, -1.0), (3L, 18L, -2.0), (3L, 34L, -3.0),
      (4L, 3L, 5.0), (4L, 19L, 5.0), (4L, 35L, 5.0),
      (5L, 4L, 7.0), (5L, 20L, 9.0)),
      pw = 4, start = 0L, end = 48L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // corr is DETERMINISTIC (integer accumulators; one double tree —
    // the oracle hash-matches it) but sqrt(da)·sqrt(db) rounds the
    // last ulp, so a perfect pair lands within 1e-12 of ±1, not at it
    def near(v: Option[Double], want: Double) =
      v.exists(x => math.abs(x - want) < 1e-12)
    assert(out((1L, 2L))._1 === 3L && near(out((1L, 2L))._2, 1.0))
    assert(out((1L, 3L))._1 === 3L && near(out((1L, 3L))._2, -1.0))
    assert(out((1L, 4L))._2 === None, "constant series has no correlation")
    assert(out((1L, 5L))._1 === 2L && near(out((1L, 5L))._2, 1.0),
      "pairs over SHARED windows only")
    assert(near(out((2L, 3L))._2, -1.0))
    assert(out.size === 10)
  }

  test("corrMatrix: window-mean quantization is floor(mean*100), window-scoped") {
    // one window, two points -> mean 1.005 -> floor(100.5) = 100 cents;
    // second window mean -0.015 -> floor(-1.5) = -2: floor, not trunc
    val out = Distillate.corrMatrix(pts(
      (1L, 0L, 1.00), (1L, 1L, 1.01), (1L, 16L, -0.01), (1L, 17L, -0.02),
      (2L, 2L, 1.0), (2L, 18L, 2.0)),
      pw = 4, start = 0L, end = 32L)
      .collect()
    // corr over 2 windows is ±1 whenever both series move; stream 1
    // moves DOWN (100 -> -2) while stream 2 moves UP -> corr -1
    assert(out.length === 1)
    assert(math.abs(out(0).getDouble(3) - (-1.0)) < 1e-12)
  }

  test("resampleLinear: midpoint, exact-hit, no extrapolation, dup-ts ties") {
    val out = Distillate.resampleLinear(pts(
      (1L, 100L, 10.0), (1L, 200L, 30.0),
      (1L, 200L, 20.0),              // dup ts: larger value wins both sides
      (1L, 1000L, 50.0)).select("time", "value"),
      start = 0L, end = 1100L, step = 100L, tileNs = 300L)
      .orderBy("time").collect()
    val byT = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(byT(0L) === None, "before first point: no extrapolation")
    assert(byT(100L) === Some(10.0), "exact hit returns the point value")
    // between (200, 30) [max value at dup ts] and (1000, 50):
    // g=600 -> 30 + 20 * 400/800 = 40
    assert(byT(600L) === Some(40.0))
    assert(byT(200L) === Some(30.0), "dup-ts: larger value is the anchor")
    assert(byT(1000L) === Some(50.0))
    assert(out.length === 11)
    // prev/next anchors cross tile boundaries (tile 300 vs points at
    // 100/200/1000): g=900 in tile 3 interpolates tile-0 -> tile-3
    assert(byT(900L) === Some(30.0 + 20.0 * 700L / 800L))
  }

  test("quantileWindows: odd/even medians, nearest-rank p95, per-window scope") {
    // pw=4 -> 16-ns windows. Window 0 of sid 1: values 1,2,3 (odd n:
    // median 2, p95 = rank ceil(.95*3)=3 -> 3). Window 1: 1,2,3,10
    // (even: median (2+3)/2 = 2.5, p95 rank 4 -> 10). Sid 2 independent.
    val out = Distillate.quantileWindows(pts(
      (1L, 0L, 1.0), (1L, 5L, 3.0), (1L, 9L, 2.0),
      (1L, 16L, 10.0), (1L, 17L, 1.0), (1L, 18L, 2.0), (1L, 19L, 3.0),
      (2L, 1L, 7.0)), pw = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out((1L, 0L)) === ((3L, 2.0, 3.0)))
    assert(out((1L, 16L)) === ((4L, 2.5, 10.0)))
    assert(out((2L, 0L)) === ((1L, 7.0, 7.0)), "n=1: both quantiles the point")
    // 20-point window: p95 = rank ceil(.95*20) = 19 (not 20)
    val big = Distillate.quantileWindows(
      pts((1 to 20).map(i => (3L, i.toLong, i.toDouble)): _*), pw = 6)
      .collect()
    assert(big.head.getDouble(4) === 19.0)
    assert(big.head.getDouble(3) === 10.5)
  }

  test("quantileWindows: randomized equivalence vs a direct quantile model") {
    val s = spark
    import s.implicits._
    val seed = 20260814L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val data = Seq.fill(400)((rnd.nextInt(3).toLong,
      rnd.nextLong(1 << 12), (rnd.nextInt(2000) - 1000) / 100.0 * 1.0))
    val pw = 10 // 1024-ns windows over a 4096-ns domain
    val out = Distillate.quantileWindows(data.toDF("sid", "time", "value"), pw)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val model = data.groupBy { case (sid, t, _) => (sid, (t >> pw) << pw) }
      .map { case (k, rows) =>
        val cs = rows.map(r => math.round(r._3 * 100)).sorted
        val n = cs.length
        val p50 =
          if (n % 2 == 1) cs((n + 1) / 2 - 1) / 100.0
          else (cs(n / 2 - 1) + cs(n / 2)) / 2.0 / 100.0
        k -> ((n.toLong, p50, cs((19 * n + 19) / 20 - 1) / 100.0))
      }
    assert(out.keySet === model.keySet)
    model.foreach { case (k, (n, p50, p95)) =>
      val (gn, g50, g95) = out(k)
      assert(gn === n, s"window $k count")
      assert(math.abs(g50 - p50) < 1e-9, s"window $k p50: $g50 vs $p50")
      assert(g95 === p95, s"window $k p95")
    }
  }

  test("corrMatrix: randomized equivalence vs a direct Pearson model") {
    val s = spark
    import s.implicits._
    val seed = 7L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val data = Seq.fill(300)((rnd.nextInt(4).toLong,
      rnd.nextLong(1 << 10), (rnd.nextInt(400) - 200) / 10.0 * 1.0))
    val pw = 6
    val out = Distillate.corrMatrix(data.toDF("sid", "time", "value"),
      pw, 0L, 1 << 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // model: floor(mean-cents) per (sid, window), Pearson over shared windows
    val mq = data.groupBy { case (sid, t, _) => (sid, (t >> pw) << pw) }
      .map { case ((sid, w), rows) =>
        val cents = rows.map(r => math.round(r._3 * 100))
        (sid, w) -> math.floorDiv(cents.sum, cents.size)
      }
    for (sa <- 0L to 3L; sb <- sa + 1 to 3L) {
      val shared = mq.keySet.collect { case (s1, w) if s1 == sa &&
        mq.contains((sb, w)) => w }.toSeq.sorted
      if (shared.nonEmpty) {
        val xs = shared.map(w => mq((sa, w)).toDouble)
        val ys = shared.map(w => mq((sb, w)).toDouble)
        val n = shared.size
        val num = n * xs.lazyZip(ys).map(_ * _).sum - xs.sum * ys.sum
        val da = n * xs.map(x => x * x).sum - xs.sum * xs.sum
        val db = n * ys.map(y => y * y).sum - ys.sum * ys.sum
        val want = if (da == 0 || db == 0) None
                   else Some(num / (math.sqrt(da) * math.sqrt(db)))
        (out((sa, sb)), want) match {
          case (None, None) =>
          case (Some(g), Some(w)) =>
            assert(math.abs(g - w) < 1e-9, s"pair ($sa,$sb): $g vs $w")
          case other => fail(s"pair ($sa,$sb): $other")
        }
      } else assert(!out.contains((sa, sb)))
    }
  }

  test("resampleHold: empty grid when end <= start") {
    val out = Distillate.resampleHold(
      pts((1L, 0L, 1.0)).select("time", "value"),
      start = 100L, end = 100L, step = 10L, tileNs = 100L)
    assert(out.count() === 0L)
  }

  test("crossings: boundary value counts as the high side; first point silent") {
    val df = Distillate.crossings(pts(
      (1L, 0L, 200.0),   // first point: no predecessor, never an event
      (1L, 10L, 50.0),   // 200 -> 50: down
      (1L, 20L, 100.0),  // 50 -> 100: exactly T counts as >= T: up
      (1L, 30L, 150.0),  // stays high: no event
      (1L, 40L, 99.0),   // 150 -> 99: down
      (2L, 50L, 500.0)), // other stream's first point: silent
      threshold = 100.0)
    val got = df.orderBy("time").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[String]("dir")))
    assert(got.toSeq == Seq((10L, "down"), (20L, "up"), (40L, "down")))
    // per-stream windows: stream 2's lone point must not inherit
    // stream 1's last value as its predecessor
    assert(!got.map(_._1).contains(50L))
  }
}
