package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.Store

/** The persisted layout geometry (`GEOMETRY` stamp) and the lock file's
  * declared staleness window — the two root-level contracts that keep a
  * FOREIGN tool (console, daemon, a second deployment binary) from
  * corrupting a root it did not create: geometry decides WHERE data
  * lives (sbucket/tbucket dirs, rollup levels), so a mismatched open
  * must refuse before it can read the wrong dirs or compact history
  * away; the lock's declared window keeps a short-windowed claimant
  * from stealing a live writer's lock. */
class GeometrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("geometry-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("first locking writer stamps; mismatched opens refuse; attach reads the stamp") {
    val ss = spark; import ss.implicits._
    val root = Files.createTempDirectory("geom-").toString
    val writer = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 44,
      pyramidLevels = Seq(20, 30), quantileLevel = Some(20))
    val st = new Store(root, spark.sessionState.newHadoopConf())
    assert(st.readString(Btrdb.GeometryFile).map(_.trim)
      .contains("sb=4 tb=44 pl=20,30 wb=54 ql=20"))

    writer.createStream("geom-uuid", "geo/a", Map.empty)
    val base = 1L << 50 // tbucket(44) ≠ tbucket(48): pw matters
    writer.insert("geom-uuid",
      (0L until 512L).map(i => (base + i * 1000L, i.toDouble))
        .toDF("time", "value"))
    writer.flush("geom-uuid")

    // a DEFAULT-geometry open — what a console guessing constructor
    // defaults would do — refuses loudly, read-only included
    val e = intercept[IllegalArgumentException] {
      new Btrdb(spark, root, lockRoot = false)
    }
    assert(e.getMessage.contains("geometry"), e.getMessage)

    // attach opens at the persisted geometry and reads the real data
    val reader = Btrdb.attach(spark, root, lockRoot = false)
    assert(reader.rawValues("geom-uuid", 0, Long.MaxValue / 2).count()
      === 512L)

    // a legacy root (stamp removed) REFUSES attach — guessing defaults
    // is the corruption this API prevents, and a locking attach would
    // stamp the guess, poisoning the root for its rightful writer…
    writer.close()
    st.delete(Btrdb.GeometryFile)
    val legacyErr = intercept[IllegalArgumentException] {
      Btrdb.attach(spark, root, lockRoot = false)
    }
    assert(legacyErr.getMessage.contains("predates geometry stamps"),
      legacyErr.getMessage)
    // …but still opens at explicit args, and the next locking writer
    // re-stamps it (after which attach works again)
    val legacy = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 44,
      pyramidLevels = Seq(20, 30), quantileLevel = Some(20))
    assert(st.readString(Btrdb.GeometryFile).map(_.trim)
      .contains("sb=4 tb=44 pl=20,30 wb=54 ql=20"))
    legacy.close()
  }

  test("wbucket-geometry degeneracy is detected at fold time and surfaced") {
    val ss = spark; import ss.implicits._
    val root = Files.createTempDirectory("geomwb-").toString
    // pw=54 over a dense 1-µs stream: the whole rollup packs into ONE
    // wbucket dir — the degenerate shape the 1 B soak measured. A tiny
    // alarm threshold reproduces the detection without soak-scale data.
    sys.props("graft.wbucket.alarm.bytes") = "512"
    try {
      val db = new Btrdb(spark, root, sBuckets = 4,
        pyramidLevels = Seq(20, 30), pyramidWBucketPw = 54,
        quantileLevel = Some(20))
      db.createStream("wb-uuid", "wb/a", Map.empty)
      db.insert("wb-uuid",
        (0L until 200000L).map(i => (i * 1000L, i.toDouble))
          .toDF("time", "value"))
      db.flush("wb-uuid")
      val warns = db.engineInfo().warnings
      assert(warns.nonEmpty, "degenerate wbucket must raise the alarm")
      assert(warns.exists(w => w.contains("wbucket-degenerate") &&
        w.contains("pyramid/pw=20")), warns)
      // the alarm is ACTIONABLE: it carries a computed pyramidWBucketPw
      // whose halvings would put the dir back under the bound at this
      // stream's density (the IngestBench `2000000 54 4096` degenerate
      // shape in miniature: dense stream, pw=54, one packed dir)
      val Sug = """.*pyramid/pw=20/\S+ (\d+)B > (\d+)B \(suggest """ +
        """pyramidWBucketPw=(\d+)\).*"""
      val m = warns.collectFirst {
        case w if w.matches(Sug) =>
          val g = Sug.r.findFirstMatchIn(w).get
          (g.group(1).toLong, g.group(2).toLong, g.group(3).toInt)
      }
      assert(m.nonEmpty, s"no suggestion in $warns")
      val (dirBytes, bound, sug) = m.get
      assert(sug >= 30 && sug < 54, s"suggested pw $sug out of range")
      // each pw decrement halves the wbucket span (and at uniform
      // density its bytes): the suggested pw must clear the bound
      assert(dirBytes.toDouble / (1L << (54 - sug)) <= bound,
        s"suggestion $sug would leave ${dirBytes / (1L << (54 - sug))}B " +
          s"in the dir (> $bound)")
      // the quantile-histogram table shares the geometry and alarms too
      assert(warns.exists(_.contains("qhist/sbucket=")), warns)
      // the console surfaces it on the info line
      val info = graft.AdminCli.run(Array("info", root), () => spark)
      assert(info.contains("wbucket-degenerate"), info)
      db.close()
    } finally sys.props -= "graft.wbucket.alarm.bytes"

    // at the DEFAULT threshold the same root raises nothing — the
    // alarm marks genuine degeneracy, not every healthy fold
    val db2 = Btrdb.attach(spark, root)
    db2.insert("wb-uuid",
      (200000L until 210000L).map(i => (i * 1000L, i.toDouble))
        .toDF("time", "value"))
    db2.flush("wb-uuid")
    assert(db2.engineInfo().warnings.isEmpty)
    db2.close()
  }

  test("an evicted writer's handle is poisoned for mutations") {
    val root = Files.createTempDirectory("geomevict-").toString
    val db = new Btrdb(spark, root, lockStaleMillis = 1000L) // 250ms beat
    db.createStream("evict-uuid", "ev/a", Map.empty)
    val st = new Store(root, spark.sessionState.newHadoopConf())
    // simulate eviction: this writer paused past its window and another
    // claimant took the lock over (replaced body = foreign owner)
    st.rewrite(Btrdb.LockFile, "usurper-token 1000")
    // the heartbeat notices within a beat and must POISON the handle:
    // an evicted-but-running writer silently mutating alongside the new
    // owner is the two-writer state the lock exists to prevent. Poll
    // (the beat is a scheduled task; a loaded host may delay it).
    val deadline = System.currentTimeMillis() + 10000
    var poisoned: Option[IllegalStateException] = None
    while (poisoned.isEmpty && System.currentTimeMillis() < deadline) {
      try { db.obliterate("evict-uuid"); Thread.sleep(100) }
      catch { case e: IllegalStateException => poisoned = Some(e) }
    }
    assert(poisoned.exists(_.getMessage.contains("evicted")),
      s"handle kept mutating for 10s after eviction: $poisoned")
    // close() must not delete the new owner's lock
    db.close()
    assert(st.readString(Btrdb.LockFile).map(_.trim)
      .contains("usurper-token 1000"))
  }

  test("lock staleness is judged by the HOLDER's declared window, not the claimant's") {
    val root = Files.createTempDirectory("geomlock-").toString
    val st = new Store(root, spark.sessionState.newHadoopConf())
    // a (simulated crashed) holder that declared a LONG window: a
    // claimant with a short default must honor the declaration and
    // refuse — its 100ms opinion cannot steal a 1h-heartbeat writer's
    // lock mtime'd 200ms ago
    st.writeAtomic(Btrdb.LockFile, "holder-token 3600000")
    Thread.sleep(200)
    val e = intercept[IllegalStateException] {
      new Btrdb(spark, root, lockStaleMillis = 100L)
    }
    assert(e.getMessage.contains("locked by another live writer"),
      e.getMessage)

    // a legacy bare-token lock (no declared window) falls back to the
    // claimant's window — the pre-declaration behavior
    st.delete(Btrdb.LockFile)
    st.writeAtomic(Btrdb.LockFile, "crashed-owner")
    Thread.sleep(200)
    val taken = new Btrdb(spark, root, lockStaleMillis = 100L)
    val body = st.readString(Btrdb.LockFile).get.trim
    // the new holder's body declares its EFFECTIVE window — at least
    // 4 heartbeats (4 × the 250 ms beat floor here), never the raw
    // sub-second configuration its own cadence could not keep
    assert(body != "crashed-owner" && body.endsWith(" 1000"), body)
    taken.close()
  }
}
