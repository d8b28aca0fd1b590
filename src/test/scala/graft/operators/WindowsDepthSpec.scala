package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Validates [[StatOps.windowsDepth]]'s closed form against a LITERAL
  * simulation of the reference's depth-capped window walk
  * (/root/reference/qtree/qtree.go:1064-1176). The simulator mirrors the
  * walk's control flow over the sequence of attribution buckets — the
  * dyadic tiling of absent subtrees between data buckets reduces the
  * tree's hole handling to "emit windows while the boundary is at or
  * before the next data bucket's start", which the simulator replays
  * hole by hole. The closed form under test:
  *   window(bucket) = floor((bucketStart - start) / width),
  *   bucket containing `start` dropped, end truncated, zeros for holes.
  */
class WindowsDepthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("windows-depth-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private case class B(bs: Long, cnt: Long, vmin: Double, vmax: Double,
                       total: Double)
  private case class W(i: Long, cnt: Long, vmin: Double, vmean: Double,
                       vmax: Double)

  /** Literal replay of the walk's state machine over ordered non-empty
    * attribution buckets of width `u`: Active/Time/nxtstart as in
    * WindowContext, whole-bucket accumulation, immediate emit on
    * boundary crossing, multi-window hole emission, the inactive
    * capped-branch activation that drops the straddler, Done when the
    * post-emit boundary reaches `end`.
    *
    * `strict = true` replays the reference's ACTUAL Done ordering
    * verbatim: the exact-fit path checks Done BEFORE advancing
    * (qtree.go:1095-1098) while the hole and capped-straddle paths
    * check AFTER (qtree.go:1135-1137, 1167-1170), all against the raw
    * (untruncated) `end` — so an aligned range whose second-to-last
    * window closes via hole/straddle terminates before the final
    * window emits. `strict = false` is the engine's default uniform
    * emission (every path pre-advance against the truncated end). */
  private def simulate(buckets: Seq[B], start: Long, end: Long,
                       width: Long, u: Long,
                       strict: Boolean = false): Seq[W] = {
    val e = end - ((end - start) % width)
    val endChk = if (strict) end else e
    val out = scala.collection.mutable.ArrayBuffer.empty[W]
    var time = start
    var nxtstart = start
    var active = false
    var done = false
    var (cnt, vmin, vmax, total) = (0L, 0.0, 0.0, 0.0)
    def add(b: B): Unit = {
      if (b.cnt > 0) {
        if (cnt == 0 || b.vmin < vmin) vmin = b.vmin
        if (cnt == 0 || b.vmax > vmax) vmax = b.vmax
      }
      total += b.total; cnt += b.cnt
    }
    def emit(postAdvanceCheck: Boolean): Unit = {
      out += W((time - start) / width, cnt, if (cnt == 0) 0.0 else vmin,
        if (cnt == 0) 0.0 else total / cnt, if (cnt == 0) 0.0 else vmax)
      active = true; cnt = 0; vmin = 0.0; vmax = 0.0; total = 0.0
      time += width
      if (strict && postAdvanceCheck) {
        nxtstart += width
        if (nxtstart >= endChk) done = true
      } else if (nxtstart >= endChk) done = true
      else nxtstart += width
    }
    // holes: emit windows while the boundary is at or before `to`
    def hole(to: Long): Unit = {
      if (!active && to > nxtstart) { time = nxtstart; active = true
        nxtstart += width }
      while (!done && active && nxtstart <= to) emit(postAdvanceCheck = true)
    }
    for (b <- buckets if !done) {
      val be = b.bs + u
      if (be <= nxtstart) {
        // wholly inside the open window (or before the range if inactive)
        if (active) { add(b); if (be == nxtstart) emit(false) }
      } else {
        hole(b.bs) // absent tiles between previous bucket and this one
        if (!done) {
          if (be <= nxtstart) { // hole advance swallowed the straddle
            if (active) { add(b); if (be == nxtstart) emit(false) }
          } else if (!active) { // capped straddler reached inactive: DROP
            active = true; nxtstart += width
          } else { // straddles the open window's end: attribute + close
            add(b); emit(postAdvanceCheck = true)
          }
        }
      }
    }
    if (!done) hole(Long.MaxValue) // trailing absent subtrees
    out.toSeq
  }

  // depth=3 -> ladder pw 2 -> attribution buckets of 4 ns: small enough
  // that random cases hit every branch (drop, multi-window holes,
  // boundary-crossing emits, tail straddle, all-empty ranges)
  private val U = 4L
  private val Depth = 3

  test("closed form equals the literal reference walk (randomized)") {
    val ss = spark; import ss.implicits._
    val seed = 12L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    var checked = 0
    for (_ <- 0 until 120) {
      val width = 1L + rnd.nextInt(200)
      val start = (rnd.nextInt(601) - 300).toLong
      val span = width + rnd.nextInt((width * 11).toInt + 1)
      val end = start + span
      val pts = List.fill(rnd.nextInt(61)) {
        val t = start - 2 * U - width +
          rnd.nextLong(span + 4 * U + width)
        (t, (rnd.nextInt(199) - 99) / 4.0)
      }
      val e = end - ((end - start) % width)
      if (e > start) {
        checked += 1
        val n = (e - start) / width
        val buckets = pts.groupBy { case (t, _) => Math.floorDiv(t, U) * U }
          .toSeq.sortBy(_._1)
          .map { case (bs, ps) =>
            B(bs, ps.size, ps.map(_._2).min, ps.map(_._2).max,
              ps.map(_._2).sum) }
        val expByI = simulate(buckets, start, end, width, U)
          .filter(w => w.i >= 0 && w.i < n)
          .map(w => w.i -> w).toMap
        val expected = (0L until n).map(i =>
          expByI.getOrElse(i, W(i, 0, 0.0, 0.0, 0.0)))

        val df = pts.toDF("time", "value").withColumn("sid", lit(1L))
        val got = StatOps.windowsDepth(df, 1L, start, end, width, Depth)
          .orderBy("i").collect()
          .map(r => W(r.getLong(0), r.getLong(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5)))

        assert(got.length == expected.length)
        got.zip(expected).foreach { case (g, x) =>
          assert(g.i == x.i && g.cnt == x.cnt,
            s"window ${g.i}: got cnt ${g.cnt}, walk says ${x.cnt} " +
              s"(start=$start end=$end width=$width pts=$pts)")
          assert(g.vmin == x.vmin && g.vmax == x.vmax)
          assert(math.abs(g.vmean - x.vmean) < 1e-9)
        }
      }
    }
    assert(checked > 100)
  }

  test("closed form holds at a second ladder width (u=256, depth=9)") {
    val ss = spark; import ss.implicits._
    val u = 256L
    val seed = 9L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    for (_ <- 0 until 25) {
      val width = 100L + rnd.nextInt(2000)
      val start = (rnd.nextInt(2001) - 1000).toLong
      val end = start + width * (1 + rnd.nextInt(8))
      val pts = List.fill(rnd.nextInt(80)) {
        val t = start - 2 * u + rnd.nextLong(end - start + 4 * u)
        (t, (rnd.nextInt(199) - 99) / 4.0)
      }
      val e = end - ((end - start) % width)
      if (e > start) {
        val n = (e - start) / width
        val buckets = pts.groupBy { case (t, _) => Math.floorDiv(t, u) * u }
          .toSeq.sortBy(_._1)
          .map { case (bs, ps) =>
            B(bs, ps.size, ps.map(_._2).min, ps.map(_._2).max,
              ps.map(_._2).sum) }
        val expByI = simulate(buckets, start, end, width, u)
          .filter(w => w.i >= 0 && w.i < n).map(w => w.i -> w).toMap
        val expected = (0L until n).map(i =>
          expByI.getOrElse(i, W(i, 0, 0.0, 0.0, 0.0)))
        val df = pts.toDF("time", "value").withColumn("sid", lit(1L))
        val got = StatOps.windowsDepth(df, 1L, start, end, width, 9)
          .orderBy("i").collect()
          .map(r => W(r.getLong(0), r.getLong(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5)))
        assert(got.length == expected.length)
        got.zip(expected).foreach { case (g, x) =>
          assert(g.i == x.i && g.cnt == x.cnt && g.vmin == x.vmin &&
            g.vmax == x.vmax && math.abs(g.vmean - x.vmean) < 1e-9,
            s"window ${g.i} (start=$start end=$end width=$width)")
        }
      }
    }
  }

  test("worked example: drop, redistribution, tail — all three quirks") {
    val ss = spark; import ss.implicits._
    // buckets of 4 (depth=3 -> ladder pw 2), windows of 10 from t=2:
    //   bucket [0,4)   contains start=2  -> DROPPED (activation quirk)
    //   bucket [4,8)   -> window 0 ([2,12))
    //   bucket [8,12)  straddles 12      -> window 0 entirely
    //   bucket [20,24) -> window 1 ([12,22)) though 22,23 lie past it
    //   window 2 ([22,32)) empty: its only data went to window 1
    val pts = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 11L, 20L, 21L, 22L, 23L)
      .map(t => (t, t.toDouble))
    val df = pts.toDF("time", "value").withColumn("sid", lit(1L))
    val got = StatOps.windowsDepth(df, 1L, 2L, 34L, 10L, depth = 3)
      .orderBy("i").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(4L, 4L, 0L))
    assert(got(0).getDouble(3) == 4.0 && got(0).getDouble(5) == 11.0)
    assert(got(1).getDouble(3) == 20.0 && got(1).getDouble(5) == 23.0)
  }

  test("strictFinalWindow reproduces the post-advance suppression (randomized)") {
    val ss = spark; import ss.implicits._
    val seed = 13L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    var suppressedN = 0
    var keptN = 0
    for (_ <- 0 until 150) {
      val width = 1L + rnd.nextInt(40)
      val start = (rnd.nextInt(201) - 100).toLong
      // bias toward aligned ends — only they can suppress
      val nWin = 2 + rnd.nextInt(8)
      val end = start + nWin * width +
        (if (rnd.nextInt(4) == 0) rnd.nextInt(width.toInt) else 0)
      val pts = List.fill(rnd.nextInt(30)) {
        val t = start - 2 * U - width +
          rnd.nextLong(end - start + 4 * U + 2 * width)
        (t, (rnd.nextInt(199) - 99) / 4.0)
      }
      val e = end - ((end - start) % width)
      if (e > start) {
        val n = (e - start) / width
        val buckets = pts.groupBy { case (t, _) => Math.floorDiv(t, U) * U }
          .toSeq.sortBy(_._1)
          .map { case (bs, ps) =>
            B(bs, ps.size, ps.map(_._2).min, ps.map(_._2).max,
              ps.map(_._2).sum) }
        val byI = simulate(buckets, start, end, width, U, strict = true)
          .filter(w => w.i >= 0 && w.i < n).map(w => w.i -> w).toMap
        val hasFinal = byI.contains(n - 1)
        if (hasFinal) keptN += 1 else suppressedN += 1
        val m = if (hasFinal) n else n - 1
        val expected = (0L until m).map(i =>
          byI.getOrElse(i, W(i, 0, 0.0, 0.0, 0.0)))
        val df = pts.toDF("time", "value").withColumn("sid", lit(1L))
        val got = StatOps.windowsDepth(df, 1L, start, end, width, Depth,
            strictFinalWindow = true)
          .orderBy("i").collect()
          .map(r => W(r.getLong(0), r.getLong(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5)))
        assert(got.length == expected.length,
          s"row count: got ${got.length}, walk emitted $m " +
            s"(start=$start end=$end width=$width pts=$pts)")
        got.zip(expected).foreach { case (g, x) =>
          assert(g.i == x.i && g.cnt == x.cnt && g.vmin == x.vmin &&
            g.vmax == x.vmax && math.abs(g.vmean - x.vmean) < 1e-9,
            s"window ${g.i} (start=$start end=$end width=$width pts=$pts)")
        }
      }
    }
    // the comparison must exercise BOTH outcomes to verify anything
    assert(suppressedN >= 10 && keptN >= 10,
      s"coverage: $suppressedN suppressed, $keptN kept")
  }

  test("strict suppression holds at the second ladder width (u=256, depth=9)") {
    val ss = spark; import ss.implicits._
    val u = 256L
    val seed = 21L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    var suppressedN = 0
    var keptN = 0
    for (i <- 0 until 60) {
      // half the cases use u-aligned geometry (width a multiple of u,
      // start on the u grid) so the exact-fit protection path — a tile
      // ending exactly at the final boundary — actually occurs; free
      // geometry makes that boundary u-aligned with chance 1/u only.
      // Widths straddle u so both branches of the u<=width condition
      // in strictDropsFinal are exercised.
      val aligned = i % 2 == 0
      val width =
        if (aligned) u * (1 + rnd.nextInt(2))
        else 64L + rnd.nextInt(512)
      val start =
        if (aligned) u * (rnd.nextInt(9) - 4)
        else (rnd.nextInt(2001) - 1000).toLong
      val end = start + width * (2 + rnd.nextInt(6)) +
        (if (rnd.nextInt(4) == 0) rnd.nextInt(width.toInt) else 0)
      val pts = List.fill(rnd.nextInt(60)) {
        val t = start - 2 * u + rnd.nextLong(end - start + 4 * u)
        (t, (rnd.nextInt(199) - 99) / 4.0)
      }
      val e = end - ((end - start) % width)
      if (e > start) {
        val n = (e - start) / width
        val buckets = pts.groupBy { case (t, _) => Math.floorDiv(t, u) * u }
          .toSeq.sortBy(_._1)
          .map { case (bs, ps) =>
            B(bs, ps.size, ps.map(_._2).min, ps.map(_._2).max,
              ps.map(_._2).sum) }
        val byI = simulate(buckets, start, end, width, u, strict = true)
          .filter(w => w.i >= 0 && w.i < n).map(w => w.i -> w).toMap
        val hasFinal = byI.contains(n - 1)
        if (hasFinal) keptN += 1 else suppressedN += 1
        val m = if (hasFinal) n else n - 1
        val expected = (0L until m).map(i =>
          byI.getOrElse(i, W(i, 0, 0.0, 0.0, 0.0)))
        val df = pts.toDF("time", "value").withColumn("sid", lit(1L))
        val got = StatOps.windowsDepth(df, 1L, start, end, width, 9,
            strictFinalWindow = true)
          .orderBy("i").collect()
          .map(r => W(r.getLong(0), r.getLong(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5)))
        assert(got.length == expected.length,
          s"row count (start=$start end=$end width=$width pts=$pts)")
        got.zip(expected).foreach { case (g, x) =>
          assert(g.i == x.i && g.cnt == x.cnt && g.vmin == x.vmin &&
            g.vmax == x.vmax && math.abs(g.vmean - x.vmean) < 1e-9,
            s"window ${g.i} (start=$start end=$end width=$width pts=$pts)")
        }
      }
    }
    assert(suppressedN >= 5 && keptN >= 5,
      s"coverage: $suppressedN suppressed, $keptN kept")
  }

  test("strict final window at depth 0: hole suppresses, boundary datum protects") {
    val ss = spark; import ss.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("time", "value")
      .withColumn("sid", lit(1L))
    // aligned [0,30) w=10: window 1 closes via the trailing hole, whose
    // post-advance Done check kills window 2 (qtree.go:1167-1170)
    assert(StatOps.windows(df, 1L, 0L, 30L, 10L).count() == 3)
    val strictRows = StatOps
      .windows(df, 1L, 0L, 30L, 10L, strictFinalWindow = true)
      .orderBy("i").collect()
    assert(strictRows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // a point at/past the final boundary rides the leaf path, whose
    // pre-advance check emits the final window first
    val df2 = Seq((1L, 1.0), (20L, 5.0)).toDF("time", "value")
      .withColumn("sid", lit(1L))
    assert(StatOps.windows(df2, 1L, 0L, 30L, 10L,
      strictFinalWindow = true).count() == 3)
    // a point PAST the query end also protects: the reference's walk
    // spans the whole tree, so its leaf path still crosses the final
    // boundary pre-advance (the emitted final window stays empty)
    val df3 = Seq((1L, 1.0), (35L, 5.0)).toDF("time", "value")
      .withColumn("sid", lit(1L))
    val r3 = StatOps.windows(df3, 1L, 0L, 30L, 10L,
      strictFinalWindow = true).orderBy("i").collect()
    assert(r3.length == 3 && r3(2).getAs[Long]("cnt") == 0L)
    // non-aligned end: Done first fires at the final window itself
    assert(StatOps.windows(df, 1L, 0L, 31L, 10L,
      strictFinalWindow = true).count() == 3)
  }

  test("depthBucketPw follows the reference 56/-6 node ladder") {
    assert(StatOps.depthBucketPw(46) == 44)
    assert(StatOps.depthBucketPw(44) == 38)
    assert(StatOps.depthBucketPw(51) == 50)
    assert(StatOps.depthBucketPw(63) == 50)
    assert(StatOps.depthBucketPw(8) == 2)
    assert(StatOps.depthBucketPw(3) == 2)
    assert(StatOps.depthBucketPw(2) == 0)
    assert(StatOps.depthBucketPw(1) == 0)
  }
}
