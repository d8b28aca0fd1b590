package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Btrdb

/** Ingest/scan throughput microbench for the engine facade: synthesizes
  * N points, pushes them through insert→flush (validation, staging,
  * commit, pyramid maintenance) and then times a full raw scan and an
  * aligned stat query. Prints one JSON line.
  * `sbt "runMain graft.IngestBench [nPoints] [wBucketPw]"`.
  *
  * `wBucketPw` is the pyramid wbucket geometry (default: the engine's
  * 2^54 ns). The incremental fold rewrites whole (pw, sbucket, wbucket)
  * rollup partition dirs, so per-commit cost is bounded by the rollup
  * rows per wbucket — for this synthetic 1 MHz stream the default
  * width puts the WHOLE stream's rollup in one wbucket and the bound
  * degenerates to O(total). An operator sizes the knob to cadence
  * (here 2^36 ns ≈ 69 s → ≤ 2^16 level-20 rows per dir); the soak
  * measures both geometries.
  *
  * `alarmBytes` (arg 3) overrides the engine's wbucket-degeneracy
  * alarm threshold (Btrdb.wbucketAlarmBytes) for the run; the JSON's
  * `wbucket_alarms` line records what the detection saw — at the
  * degenerate geometry the alarm must fire before cadence visibly
  * bends.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val wPw = args.lift(1).map(_.toInt).getOrElse(54)
    args.lift(2).foreach(b => sys.props("graft.wbucket.alarm.bytes") = b)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("ingest-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("ingest-bench").toString
    val db = new Btrdb(spark, root, sBuckets = 8, tBucketPw = 44,
      pyramidLevels = Seq(20, 30), pyramidWBucketPw = wPw)
    db.createStream("bench-uuid", "bench/ingest", Map("kind" -> "synthetic"))

    // synthetic stream: 1 point/µs with a noisy sine value
    val pts = spark.range(n).select(
      (col("id") * 1000L).as("time"),
      (sin(col("id") / 1e5) * 100 + pmod(col("id"), lit(97)) / 97.0).as("value"))

    val t0 = System.nanoTime()
    db.insert("bench-uuid", pts)
    db.flush("bench-uuid")
    val tIngest = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val scanned = db.rawValues("bench-uuid", 0, n * 1000L).count()
    val tScan = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val wins = db.alignedWindows("bench-uuid", 0, n * 1000L, 30).count()
    val tStat = (System.nanoTime() - t2) / 1e9

    // steady-state commit cadence: K further commits of `step` points
    // each, appended after the bulk load — the reference's 32k-point PQM
    // commit pattern. Per-commit cost must stay flat as the stream (and
    // its rollup) grows; this is the number the incremental pyramid
    // maintenance is accountable to.
    val commits = 8
    val step = 131072L
    val t3 = System.nanoTime()
    val steadyEach = (0 until commits).map { i =>
      val tc = System.nanoTime()
      val lo = n + i * step
      val pts = spark.range(lo, lo + step).select(
        (col("id") * 1000L).as("time"),
        (sin(col("id") / 1e5) * 100).as("value"))
      db.insert("bench-uuid", pts)
      db.flush("bench-uuid")
      (System.nanoTime() - tc) / 1e9
    }
    val tSteady = (System.nanoTime() - t3) / 1e9

    // backfill cadence: commits landing INSIDE the already-rolled-up
    // range, folding into existing rollup rows — must cost the same as
    // appends (the incremental-pyramid guarantee), not O(rollup).
    val t4 = System.nanoTime()
    val backfillEach = (0 until commits).map { i =>
      val tc = System.nanoTime()
      val lo = (n / commits) * i
      val pts = spark.range(lo, lo + step).select(
        (col("id") * 1000L + 500L).as("time"), // interleaves existing µs grid
        (sin(col("id") / 1e5) * 50).as("value"))
      db.insert("bench-uuid", pts)
      db.flush("bench-uuid")
      (System.nanoTime() - tc) / 1e9
    }
    val tBackfill = (System.nanoTime() - t4) / 1e9

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val warns = db.engineInfo().warnings
    val warnsJson = warns.map(graft.core.Jsons.str).mkString("[", ",", "]")
    println(f"""{"points":$n,"wbucket_pw":$wPw,"ingest_s":$tIngest%.3f,"ingest_pts_per_s":${(n / tIngest).toLong},"scan_s":$tScan%.3f,"scan_pts_per_s":${(scanned / tScan).toLong},"stat_s":$tStat%.3f,"stat_windows":$wins,"steady_commits":$commits,"steady_commit_s":${tSteady / commits}%.3f,"steady_pts_per_s":${(commits * step / tSteady).toLong},"steady_each_s":${arr(steadyEach)},"backfill_commit_s":${tBackfill / commits}%.3f,"backfill_each_s":${arr(backfillEach)},"wbucket_alarms":${warns.size},"wbucket_alarm_list":$warnsJson}""")
    spark.stop()
  }
}
