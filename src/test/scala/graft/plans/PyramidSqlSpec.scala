package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TimeOps
import graft.engine.Btrdb
import graft.functions.GraftExtensions

/** The Catalyst pyramid substitution: a plain-SQL stat aggregate over
  * the registered `graft_points` view must be SERVED FROM THE ROLLUP
  * PYRAMID (plan-level assert: the scan reads `pyramid/pw=…`, not the
  * point log) and return exactly what the point-log plan returns — and
  * it must BAIL to the merge-on-read plan in every case where the
  * rewrite would not be equivalent (unaligned bounds, staged points,
  * delete debt, sub-level pointwidth).
  */
class PyramidSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pyramid-sql-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  /** Tiny geometry (as PyramidSpec): levels 2^4/2^8, immediate commits. */
  private def mkDb(threshold: Long = 1L): Btrdb = {
    val dir = Files.createTempDirectory("pyrsql").toString
    new Btrdb(spark, dir, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = threshold,
      pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12, commitRangePw = 8)
  }

  private def insertPts(db: Btrdb, uuid: String, pts: Seq[(Long, Double)]): Unit =
    db.insert(uuid, spark.createDataFrame(pts).toDF("time", "value"))

  /** Two streams, 512 points each over [0, 4096) at every 8th ns. */
  private def seeded(threshold: Long = 1L): Btrdb = {
    val db = mkDb(threshold)
    db.createStream("u0", "c", Map("k" -> "v0"))
    db.createStream("u1", "c", Map("k" -> "v1"))
    insertPts(db, "u0", (0 until 512).map(i => (i * 8L, i.toDouble)))
    insertPts(db, "u1", (0 until 512).map(i => (i * 8L + 1, i * 2.0)))
    db
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString() +
      s"\nscans=${PlanChecks.scanRootPaths(df)}"

  private def readsPyramid(df: DataFrame): Boolean =
    PlanChecks.readsPyramidOnly(df)

  /** Reference result via the DataFrame API (no SubqueryAlias marker,
    * so the rule cannot fire) straight off the merged point view. */
  private def rawAgg(db: Btrdb, pw: Int, sidPin: Option[Long],
                     bySid: Boolean): Seq[(Option[Long], Long, Long, Double,
                       Double, Double)] = {
    val base = sidPin.fold(db.pointsView())(s =>
      db.pointsView().filter(col("sid") === s))
    val keys = (if (bySid) Seq(col("sid")) else Nil) :+
      TimeOps.clampTime(col("time"), pw).as("w")
    base.groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
        avg("value").as("vmean"), max("value").as("vmax"))
      .collect().map(r => (
        if (bySid) Some(r.getLong(r.fieldIndex("sid"))) else None,
        r.getLong(r.fieldIndex("w")), r.getLong(r.fieldIndex("cnt")),
        r.getDouble(r.fieldIndex("vmin")), r.getDouble(r.fieldIndex("vmean")),
        r.getDouble(r.fieldIndex("vmax"))))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def collectSql(df: DataFrame): Seq[(Option[Long], Long, Long,
      Double, Double, Double)] =
    df.collect().map { r =>
      val sid = if (r.schema.fieldNames.contains("sid"))
        Some(r.getLong(r.fieldIndex("sid"))) else None
      (sid, r.getLong(r.fieldIndex("w")), r.getLong(r.fieldIndex("cnt")),
        r.getDouble(r.fieldIndex("vmin")), r.getDouble(r.fieldIndex("vmean")),
        r.getDouble(r.fieldIndex("vmax")))
    }.sortBy(t => (t._1, t._2)).toSeq

  private def assertSame(a: Seq[(Option[Long], Long, Long, Double, Double,
      Double)], b: Seq[(Option[Long], Long, Long, Double, Double, Double)]): Unit = {
    assert(a.size == b.size, s"row counts: ${a.size} vs ${b.size}")
    a.zip(b).foreach { case (x, y) =>
      assert(x._1 == y._1 && x._2 == y._2 && x._3 == y._3, s"$x vs $y")
      assert(x._4 == y._4 && x._6 == y._6, s"min/max: $x vs $y")
      // mean combines partial sums — ulp tolerance for reassociation
      assert(math.abs(x._5 - y._5) <= math.ulp(x._5) * 8, s"mean: $x vs $y")
    }
  }

  test("sid-pinned aligned aggregate is served from the pyramid") {
    val db = seeded()
    db.registerViews("gp1")
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w,
        |  count(*) AS cnt, min(value) AS vmin, avg(value) AS vmean,
        |  max(value) AS vmax
        |FROM gp1_points
        |WHERE sid = 0 AND time >= 0 AND time < 4096
        |GROUP BY 1 ORDER BY w""".stripMargin)
    assert(readsPyramid(df), s"expected a pyramid scan:\n${planOf(df)}")
    assertSame(collectSql(df), rawAgg(db, 8, Some(0L), bySid = false))
    db.close()
  }

  test("whole-corpus sid-grouped aggregate substitutes across streams") {
    val db = seeded()
    db.registerViews("gp2")
    val df = spark.sql(
      """SELECT sid, shiftleft(shiftright(time, 8), 8) AS w,
        |  count(*) AS cnt, min(value) AS vmin, avg(value) AS vmean,
        |  max(value) AS vmax
        |FROM gp2_points GROUP BY 1, 2 ORDER BY sid, w""".stripMargin)
    assert(readsPyramid(df), s"expected a pyramid scan:\n${planOf(df)}")
    assertSame(collectSql(df), rawAgg(db, 8, None, bySid = true))
    db.close()
  }

  test("DataFrame API over the view substitutes too") {
    val db = seeded()
    db.registerViews("gp3")
    val df = spark.table("gp3_points")
      .groupBy(TimeOps.clampTime(col("time"), 8).as("w"))
      .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
        avg("value").as("vmean"), max("value").as("vmax"))
    assert(readsPyramid(df), s"expected a pyramid scan:\n${planOf(df)}")
    assertSame(collectSql(df), rawAgg(db, 8, None, bySid = false))
    db.close()
  }

  test("unaligned time bound bails to the point log") {
    val db = seeded()
    db.registerViews("gp4")
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
        |FROM gp4_points WHERE time >= 3 GROUP BY 1""".stripMargin)
    assert(!readsPyramid(df), "a 3-ns lower bound is not 2^8-aligned")
    assert(PlanChecks.scanRootPaths(df).exists(_.contains("/points")),
      "must scan the point log")
    db.close()
  }

  test("pointwidth below the finest level bails") {
    val db = seeded()
    db.registerViews("gp5")
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 2), 2) AS w, count(*) AS cnt
        |FROM gp5_points GROUP BY 1""".stripMargin)
    assert(!readsPyramid(df), "no pyramid level <= 2 exists")
    db.close()
  }

  test("staged (minor-version) points suppress substitution until flush") {
    val db = seeded(threshold = 1000000L) // below threshold: all points stage
    db.registerViews("gp6")
    val sql =
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt,
        |  min(value) AS vmin, avg(value) AS vmean, max(value) AS vmax
        |FROM gp6_points GROUP BY 1""".stripMargin
    val before = spark.sql(sql)
    assert(!readsPyramid(before),
      "staged points are invisible to the pyramid — must bail")
    val expected = rawAgg(db, 8, None, bySid = false)
    assertSame(collectSql(before), expected)
    db.flush("u0"); db.flush("u1")
    // same SQL, re-planned: live guard now passes — pyramid serves it,
    // and the answer is unchanged by the flush
    val after = spark.sql(sql)
    assert(readsPyramid(after), s"expected a pyramid scan:\n${planOf(after)}")
    assertSame(collectSql(after), expected)
    db.close()
  }

  test("equivalent bound spellings substitute; unaligned ones still bail") {
    val db = seeded()
    db.registerViews("gp8")
    val expected = rawAgg(db, 8, Some(0L), bySid = false)
    Seq(
      "sid = 0 AND time >= 0 AND time <= 4095",  // inclusive high bound
      "sid = 0 AND time BETWEEN 0 AND 4095",     // parser-lowered BETWEEN
      "sid = 0 AND 0 <= time AND 4096 > time",   // literal on the left
      "sid = 0 AND time > -1 AND time < 4096"    // exclusive low bound
    ).foreach { where =>
      val df = spark.sql(
        s"""SELECT shiftleft(shiftright(time, 8), 8) AS w,
           |  count(*) AS cnt, min(value) AS vmin, avg(value) AS vmean,
           |  max(value) AS vmax
           |FROM gp8_points WHERE $where GROUP BY 1 ORDER BY w""".stripMargin)
      assert(readsPyramid(df), s"'$where' should substitute:\n${planOf(df)}")
      assertSame(collectSql(df), expected)
    }
    // normalized-but-unaligned inclusive bound: time <= 4094 → hi = 4095
    val unaligned = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
        |FROM gp8_points WHERE time <= 4094 GROUP BY 1""".stripMargin)
    assert(!readsPyramid(unaligned), "a 4095 high bound is not 2^8-aligned")
    db.close()
  }

  test("repeated bounds tighten instead of dropping a conjunct") {
    val db = seeded()
    db.registerViews("gp9")
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
        |FROM gp9_points
        |WHERE time >= 0 AND time >= 256 AND time < 4096 AND time < 1024
        |GROUP BY 1 ORDER BY w""".stripMargin)
    assert(readsPyramid(df), s"expected a pyramid scan:\n${planOf(df)}")
    // served result must honor the TIGHT bounds [256, 1024)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = db.pointsView()
      .filter(col("time") >= 256 && col("time") < 1024)
      .groupBy(TimeOps.clampTime(col("time"), 8).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want, s"$got vs $want")
    db.close()
  }

  test("avg/sum served from the pyramid are the exact cents aggregates") {
    val db = seeded() // integer values — on the cents grid, so exact
    db.registerViews("gp10")
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w,
        |  avg(value) AS a, sum(value) AS s
        |FROM gp10_points GROUP BY 1 ORDER BY w""".stripMargin)
    assert(readsPyramid(df), s"expected a pyramid scan:\n${planOf(df)}")
    import graft.operators.StatOps.{cents, meanFromCents}
    val exact = db.pointsView()
      .groupBy(TimeOps.clampTime(col("time"), 8).as("w"))
      .agg(meanFromCents(sum(cents(col("value"))), count(lit(1))).as("a"),
        (sum(cents(col("value"))) / lit(100.0)).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val got = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // BIT-identical, no tolerance: long cents sums are associative
    assert(got == exact, s"$got vs $exact")
    db.close()
  }

  test("off-grid values bail avg/sum to the IEEE plan; count/min/max still serve") {
    val db = mkDb()
    db.createStream("og0", "c", Map("k" -> "og"))
    // π-scaled values are nowhere near the cents grid: rounding them to
    // integer cents would shift each by up to 0.005 — the substitution
    // must refuse to serve avg/sum for this stream
    insertPts(db, "og0", (0 until 512).map(i => (i * 8L, i * math.Pi * 1e-4)))
    db.registerViews("gp12")
    val withAvg = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w,
        |  avg(value) AS a, sum(value) AS s
        |FROM gp12_points GROUP BY 1 ORDER BY w""".stripMargin)
    assert(!readsPyramid(withAvg),
      s"avg/sum over an off-grid stream must bail:\n${planOf(withAvg)}")
    // the raw plan serves the true IEEE aggregates
    val raw = db.pointsView()
      .groupBy(TimeOps.clampTime(col("time"), 8).as("w"))
      .agg(avg("value").as("a"), sum("value").as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val got = withAvg.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    got.zip(raw).foreach { case (g, r) =>
      assert(g._1 == r._1 && math.abs(g._2 - r._2) <= math.ulp(r._2) * 8 &&
        math.abs(g._3 - r._3) <= math.ulp(r._3) * 8, s"$g vs $r")
    }
    // count/min/max need no grid guarantee — same stream, still served
    val noSum = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w,
        |  count(*) AS cnt, min(value) AS vmin, max(value) AS vmax
        |FROM gp12_points GROUP BY 1 ORDER BY w""".stripMargin)
    assert(readsPyramid(noSum),
      s"count/min/max should still substitute:\n${planOf(noSum)}")
    assert(noSum.count() == withAvg.count())
    // a legal finite double beyond the cents LONG domain: ingest and
    // pyramid maintenance must not hit an ANSI cast overflow, the value
    // must read back exactly, and the stream is simply off-grid
    insertPts(db, "og0", Seq((100000L, 1.0e17)))
    val big = db.rawValues("og0", 100000L, 100001L).collect()
    assert(big.length == 1 && big(0).getDouble(big(0).fieldIndex("value")) == 1.0e17)
    db.close()
  }

  test("grid flag survives reopen and an off-grid commit clears it for good") {
    val dir = Files.createTempDirectory("pyrsqlgrid").toString
    def open() = new Btrdb(spark, dir, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L,
      pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12, commitRangePw = 8)
    val db = open()
    db.createStream("g0", "c", Map.empty)
    insertPts(db, "g0", (0 until 256).map(i => (i * 8L, i * 0.25)))
    db.close()
    // i*0.25 is 25i cents — exactly on the grid — so a REOPENED engine
    // must still serve avg, proving the flag is read back from the
    // commit log's persisted records, not only from in-memory state
    val db2 = open()
    db2.registerViews("gp13")
    val sql =
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, avg(value) AS a
        |FROM gp13_points GROUP BY 1""".stripMargin
    assert(readsPyramid(spark.sql(sql)),
      "grid flag must persist across engine restarts")
    // one off-grid commit poisons the stream permanently
    db2.insert("g0", spark.createDataFrame(
      Seq((10000L, 0.001))).toDF("time", "value"))
    assert(!readsPyramid(spark.sql(sql)),
      "an off-grid commit must clear the stream's grid flag")
    db2.close()
    val db3 = open()
    db3.registerViews("gp14")
    assert(!readsPyramid(spark.sql(sql.replace("gp13", "gp14"))),
      "the cleared grid flag must persist across restarts too")
    db3.close()
  }

  test("Long.MaxValue inclusive bounds bail instead of wrapping to empty") {
    val db = seeded()
    db.registerViews("gp11")
    // `time <= MaxValue` normalizes via hi+1, which would WRAP to
    // MinValue and serve an empty result for an unbounded query — the
    // guard must bail to the point log and keep the full answer
    Seq(s"time <= ${Long.MaxValue}", s"${Long.MaxValue} >= time",
        s"time BETWEEN 0 AND ${Long.MaxValue}",
        s"time > ${Long.MaxValue}").foreach { where =>
      val df = spark.sql(
        s"""SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
           |FROM gp11_points WHERE $where GROUP BY 1""".stripMargin)
      assert(!readsPyramid(df), s"'$where' must bail:\n${planOf(df)}")
      val want = db.pointsView().filter(expr(where))
        .groupBy(TimeOps.clampTime(col("time"), 8).as("w"))
        .agg(count(lit(1))).count()
      assert(df.count() == want, s"'$where': ${df.count()} vs $want")
    }
    db.close()
  }

  test("delete debt suppresses substitution; compaction restores it") {
    val db = seeded()
    db.deleteRange("u0", 0L, 1024L)
    db.registerViews("gp7")
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
        |FROM gp7_points GROUP BY 1""".stripMargin)
    assert(!readsPyramid(df), "un-compacted delete debt must bail")
    // the raw plan still returns the anti-filtered truth
    val raw = rawAgg(db, 8, None, bySid = false)
    assertSame(collectSql(spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt,
        |  min(value) AS vmin, avg(value) AS vmean, max(value) AS vmax
        |FROM gp7_points GROUP BY 1""".stripMargin)), raw)
    db.close()
  }

  // ---- federation: the union view substitutes across members --------

  /** Raw truth for a federated view: the same aggregate off the plain
    * union of member point views (no SubqueryAlias → rule can't fire). */
  private def rawFedAgg(dbs: Seq[Btrdb], pw: Int, bySid: Boolean) = {
    val base = dbs.map(_.pointsView()).reduce(_ unionByName _)
    val keys = (if (bySid) Seq(col("sid")) else Nil) :+
      TimeOps.clampTime(col("time"), pw).as("w")
    base.groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
        avg("value").as("vmean"), max("value").as("vmax"))
      .collect().map(r => (
        if (bySid) Some(r.getLong(r.fieldIndex("sid"))) else None,
        r.getLong(r.fieldIndex("w")), r.getLong(r.fieldIndex("cnt")),
        r.getDouble(r.fieldIndex("vmin")), r.getDouble(r.fieldIndex("vmean")),
        r.getDouble(r.fieldIndex("vmax"))))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("federated union view is served from BOTH members' pyramids") {
    val a = seeded()
    val b = mkDb()
    b.createStream("u2", "c", Map("k" -> "v2"))
    insertPts(b, "u2", (0 until 256).map(i => (i * 16L, i * 3.0)))
    graft.engine.Federation.registerViews(spark, "gpf1",
      Seq(("e0", a), ("e1", b)))
    val df = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt,
        |  min(value) AS vmin, avg(value) AS vmean, max(value) AS vmax
        |FROM gpf1_points GROUP BY 1 ORDER BY w""".stripMargin)
    assert(readsPyramid(df), s"expected pyramid scans:\n${planOf(df)}")
    // the plan reads the rollup of EVERY member, not just one
    val scans = PlanChecks.scanRootPaths(df).filter(_.contains("pyramid/pw="))
    assert(Seq(a, b).forall(db => scans.exists(_.contains(db.root))),
      s"one member's pyramid missing from the scans: $scans")
    assertSame(collectSql(df), rawFedAgg(Seq(a, b), 8, bySid = false))
    a.close(); b.close()
  }

  test("one unclean federation member bails the whole federated rewrite") {
    val a = seeded()
    val b = mkDb(threshold = 1000000L) // b's points all stage
    b.createStream("u2", "c", Map("k" -> "v2"))
    insertPts(b, "u2", (0 until 256).map(i => (i * 16L, i * 3.0)))
    graft.engine.Federation.registerViews(spark, "gpf2",
      Seq(("e0", a), ("e1", b)))
    val sql =
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt,
        |  min(value) AS vmin, avg(value) AS vmean, max(value) AS vmax
        |FROM gpf2_points GROUP BY 1""".stripMargin
    val before = spark.sql(sql)
    assert(!readsPyramid(before),
      "a member with staged points must bail the federated rewrite")
    val expected = rawFedAgg(Seq(a, b), 8, bySid = false)
    assertSame(collectSql(before), expected)
    b.flush("u2")
    val after = spark.sql(sql)
    assert(readsPyramid(after), s"expected pyramid scans:\n${planOf(after)}")
    assertSame(collectSql(after), expected)
    a.close(); b.close()
  }

  test("engine-column grouping or filter bails the federated rewrite") {
    val a = seeded()
    val b = mkDb()
    b.createStream("u2", "c", Map("k" -> "v2"))
    insertPts(b, "u2", (0 until 256).map(i => (i * 16L, i * 3.0)))
    graft.engine.Federation.registerViews(spark, "gpf3",
      Seq(("e0", a), ("e1", b)))
    val grouped = spark.sql(
      """SELECT engine, shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
        |FROM gpf3_points GROUP BY 1, 2""".stripMargin)
    assert(!readsPyramid(grouped),
      "grouping on engine has no pyramid analog — must bail")
    val filtered = spark.sql(
      """SELECT shiftleft(shiftright(time, 8), 8) AS w, count(*) AS cnt
        |FROM gpf3_points WHERE engine = 'e0' GROUP BY 1""".stripMargin)
    assert(!readsPyramid(filtered),
      "an engine filter is not a recognized conjunct — must bail")
    // both still answer correctly from the merge-on-read union
    // (e0 = seeded() = two streams × 512 points)
    assert(filtered.collect().map(_.getLong(1)).sum == 1024L)
    a.close(); b.close()
  }
}
