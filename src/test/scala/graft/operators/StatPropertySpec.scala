package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TimeOps

/** Property tests in the spirit of the reference's randomized qtree tests
  * (logged-seed random data + golden invariants,
  * /root/reference/qtree/qtree2_test.go:15-20):
  *
  *  - stat-pyramid halving: querying N=2^k points at pw=j yields exactly
  *    N>>j windows whose (count,min,mean·count,max) roll up pairwise
  *    exactly (TestQT2_PW, qtree2_test.go:78-145)
  *  - clampTime is a floor to 2^pw for the whole int64 time domain,
  *    including negative times
  *  - windowIndex/floorDiv match BigInt floor division exactly
  */
class StatPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("stat-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("clampTime floors to 2^pw across the signed time domain (scalar model)") {
    val seed = 1L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val lo = graft.core.TimeConsts.MinimumTime
    val hi = graft.core.TimeConsts.MaximumTime - 1
    for (_ <- 0 until 5000) {
      val t = lo + (math.abs(rnd.nextLong()) % (hi - lo))
      val pw = rnd.nextInt(57)
      val model = {
        val w = BigInt(1) << pw
        (BigInt(t) - (((BigInt(t) % w) + w) % w)).toLong // floor to multiple
      }
      assert(TimeOps.alignDown(t, pw) == model, s"t=$t pw=$pw")
      assert(model <= t && BigInt(t) - BigInt(model) < (BigInt(1) << pw))
    }
  }

  test("floorDiv matches floor division for mixed-sign inputs") {
    val seed = 2L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val spark0 = spark
    import spark0.implicits._
    val widths = Seq(1L, 3L, 7L, 100L, 86400L)
    val xs = List.fill(500)((rnd.nextLong() % 1000000L, widths(rnd.nextInt(widths.size))))
    widths.foreach { b =>
      val as = xs.collect { case (a, w) if w == b => a }
      if (as.nonEmpty) {
        val got = as.toDF("a")
          .select($"a", TimeOps.floorDiv($"a", b).as("q")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        got.foreach { case (a, q) =>
          assert(q == Math.floorDiv(a, b), s"floorDiv($a, $b)")
        }
      }
    }
  }

  test("stat-pyramid halving invariant on random dense data (seed logged)") {
    val seed = 20260812L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val n = 1 << 12
    val spark0 = spark
    import spark0.implicits._
    val pts = (0L until n.toLong).map(t => (t, rnd.nextInt(20000) / 100.0)).toDF("time", "value")
    pts.cache()
    def level(pw: Int) = pts
      .groupBy(TimeOps.clampTime(col("time"), pw).as("w"))
      .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
        sum("value").as("vsum"), max("value").as("vmax"))
      .orderBy("w").collect()
    for (pw <- 1 to 12) {
      val lo = level(pw - 1)
      val hi = level(pw)
      assert(hi.length == n >> pw, s"pw=$pw count")
      assert(lo.length == n >> (pw - 1))
      hi.zipWithIndex.foreach { case (h, i) =>
        val (a, b) = (lo(2 * i), lo(2 * i + 1))
        assert(h.getLong(1) == a.getLong(1) + b.getLong(1))
        assert(h.getDouble(2) == math.min(a.getDouble(2), b.getDouble(2)))
        assert(h.getDouble(4) == math.max(a.getDouble(4), b.getDouble(4)))
        // sums (⇒ means via Σ(mean·count)/Σcount) combine exactly on
        // these 2-decimal values
        assert(math.abs(h.getDouble(3) - (a.getDouble(3) + b.getDouble(3))) < 1e-6)
      }
    }
    pts.unpersist()
  }

  test("statAgg mean model: cents-exact in-domain, double mean once any value is out (seed logged)") {
    val seed = 7L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    for (round <- 0 until 40) {
      val n = 1 + rnd.nextInt(50)
      // signed values across the whole documented domain: cents-grid,
      // fine-grained off-grid, exact half-cent midpoints (rounding-mode
      // sensitive), near-CentsDomain magnitudes whose cents SUM exceeds
      // Long.MaxValue (decimal sums must absorb it), and out-of-domain
      // magnitudes that must flip the window to the IEEE mean
      def signed(v: Double) = if (rnd.nextBoolean()) v else -v
      val vals = Seq.fill(n) {
        rnd.nextInt(12) match {
          case 0 => signed(1e17 + rnd.nextDouble() * 1e18) // out of domain
          case 1 => signed(rnd.nextDouble() * 1e-4)        // off-grid
          case 2 => signed(rnd.nextInt(1000) + 0.005)      // half-cent midpoint
          case 3 => signed(8.9e16 + rnd.nextInt(1000))     // near-domain edge
          case _ => signed(rnd.nextInt(200000) / 100.0)    // cents grid
        }
      }
      val aggs = StatOps.statAgg(col("value"))
      val got = spark.createDataFrame(vals.map(Tuple1(_))).toDF("value")
        .agg(aggs.head, aggs.tail: _*)
        .head().getAs[Double]("vmean")
      val allInDomain = vals.forall(v => math.abs(v) <= StatOps.CentsDomain)
      val model =
        if (allInDomain) {
          // Spark's round() is BigDecimal HALF_UP — ties away from zero
          // (math.round would round -x.5 toward +inf); sums in BigInt so
          // the MODEL cannot overflow where the engine's decimal doesn't
          val cents = vals.map(v =>
            BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP)
              .toBigInt)
          (BigDecimal(cents.sum) / 100 / n).toDouble
        } else vals.sum / n
      // the double-mean branch reassociates across partitions — allow
      // ulp-scale drift there; the cents branch is deterministic but
      // its decimal→double division may differ from the model's
      // BigDecimal division in the last ulp
      if (allInDomain)
        assert(math.abs(got - model) <= math.ulp(model) * 4,
          s"round=$round $vals")
      else assert(math.abs(got - model) <= math.ulp(model) * 16,
        s"round=$round $vals")
    }
  }

  test("interval coalescing: merged set covers exactly the union (random intervals)") {
    val seed = 777L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val spark0 = spark
    import spark0.implicits._
    val ivs = List.fill(200)((rnd.nextInt(1000).toLong, rnd.nextInt(50) + 1L))
      .map { case (s, w) => (1L, s, s + w) }
    val merged = StatOps.mergeIntervals(ivs.toDF("sid", "s", "e")).orderBy("s").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // model: point-wise membership must match
    val member = Array.fill(1100)(false)
    ivs.foreach { case (_, s, e) => (s until e).foreach(i => member(i.toInt) = true) }
    val gotMember = Array.fill(1100)(false)
    merged.foreach { case (s, e) =>
      assert(s < e)
      (s until e).foreach(i => gotMember(i.toInt) = true)
    }
    assert(member.toSeq == gotMember.toSeq)
    // merged intervals are disjoint and non-adjacent
    merged.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(s2 > e1)
      case _ =>
    }
  }
}
