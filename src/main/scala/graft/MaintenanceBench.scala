package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Btrdb

/** Maintenance-operation soak at bulk scale: the 1 B-point ingest soak
  * (IngestBench, SCALE.md) proved ingest cadence, but `compact`,
  * `purgeObliterated`, `archiveCommitLog` and `repairPyramid` had only
  * ever been timed at ~50 M points. This main builds a root holding one
  * BULK stream (`nPoints`) plus one SMALL stream (1 M points on a
  * DIFFERENT sbucket), then times each maintenance op and prints one
  * JSON line. What each number is accountable to:
  *
  *   - `purge_small_s`: obliterate + purge of the small stream while
  *     the bulk stream coexists — must cost ∝ the SMALL stream's
  *     touched (sbucket, tbucket) partitions, never the root's total
  *     data (the tbucket-incremental path; the small stream sits on
  *     its own sbucket so its partitions contain only its points —
  *     sharing an sbucket with a bulk stream makes the rewrite pay
  *     for the shared partitions, the documented caveat).
  *   - `repair_noop_s`: repairPyramid on a healthy stream — the
  *     watermark check must answer from metadata, not a rollup scan.
  *   - `archive_s`: roll loose per-commit files into an archive
  *     segment — ∝ loose-file count (bounded by maxFiles), not data.
  *   - `compact_bulk_s`: squash the bulk stream's history — this one
  *     IS ∝ the stream's committed data by design (it rewrites the
  *     survivors into one superseding commit); the honest record is
  *     the throughput, which must track bulk-ingest throughput.
  *
  * `sbt "runMain graft.MaintenanceBench [nPoints] [wBucketPw]"`.
  */
object MaintenanceBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val wPw = args.lift(1).map(_.toInt).getOrElse(36)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("maintenance-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("maint-bench").toString
    val db = new Btrdb(spark, root, sBuckets = 8, tBucketPw = 44,
      pyramidLevels = Seq(20, 30), pyramidWBucketPw = wPw)
    // sid 0 → sbucket 0 (bulk), sid 1 → sbucket 1 (small): disjoint
    // point-log partitions, so the purge path's bounded-working-set
    // claim is measured in its designed shape
    db.createStream("maint-bulk", "maint/a", Map("kind" -> "bulk"))
    db.createStream("maint-small", "maint/a", Map("kind" -> "small"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // bulk load + a tail of incremental commits so compact and the
    // archive have real history to squash
    val (_, tIngest) = timed {
      db.insert("maint-bulk", spark.range(n).select(
        (col("id") * 1000L).as("time"),
        (sin(col("id") / 1e5) * 100).as("value")))
      db.flush("maint-bulk")
    }
    val commits = 8
    val step = 131072L
    (0 until commits).foreach { i =>
      val lo = n + i * step
      db.insert("maint-bulk", spark.range(lo, lo + step).select(
        (col("id") * 1000L).as("time"),
        (sin(col("id") / 1e5) * 100).as("value")))
      db.flush("maint-bulk")
    }
    val small = 1000000L
    db.insert("maint-small", spark.range(small).select(
      (col("id") * 1000L).as("time"), (col("id") % 97).cast("double").as("value")))
    db.flush("maint-small")

    // healthy-root repair: must answer from the watermark, not a scan
    val (healed, tRepairNoop) = timed(db.repairPyramid("maint-bulk"))

    // commit-log archive roll: ∝ loose files (maxFiles=4 forces a roll
    // of this root's ~12 loose commits)
    val (rolled, tArchive) = timed(db.archiveCommitLog(maxFiles = 4))

    // small-stream reclamation beside the bulk stream: the number that
    // must NOT scale with n
    db.obliterate("maint-small")
    val (purged, tPurge) = timed(db.purgeObliterated())

    // bulk compact: ∝ the stream's data by design — record throughput
    val (_, tCompact) = timed(db.compact("maint-bulk"))
    val (scanned, tScan) = timed(
      db.rawValues("maint-bulk", 0, Long.MaxValue / 2).count())

    println(f"""{"points":$n,"wbucket_pw":$wPw,"ingest_s":$tIngest%.3f,"repair_noop_s":$tRepairNoop%.3f,"repair_healed":$healed,"archive_s":$tArchive%.3f,"archive_rolled":$rolled,"purge_small_s":$tPurge%.3f,"purged_sids":${purged.mkString("[", ",", "]")},"compact_bulk_s":$tCompact%.3f,"compact_pts_per_s":${(n / tCompact).toLong},"post_scan_points":$scanned,"post_scan_s":$tScan%.3f}""")
    db.close()
    spark.stop()
  }
}
