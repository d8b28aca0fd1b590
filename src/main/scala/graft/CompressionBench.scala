package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-density probe: commit a realistic telemetry stream (120 Hz
  * cadence with ns jitter, sinusoid + noise values — the reference
  * paper's phasor-data shape) through the REAL engine write path and
  * measure the point log's bytes/point against the reference's
  * published figures (16 B/point raw, ~2.9× delta-delta+varint ⇒
  * ~5.5 B/point; FAST'16 + blocktypes.go). The claim under test is
  * SCALE.md's "zstd parquet ≈ the reference's ratio" — measured, not
  * asserted. Prints ONE JSON line. */
object CompressionBench {
  def main(args: Array[String]): Unit = {
    val nPts = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** One measured stream: commit `value` at 120 Hz cadence with ns
      * jitter, return (log bytes, pyramid bytes). */
    def measure(tag: String, value: org.apache.spark.sql.Column)
        : (Long, Long) = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"compbench-$tag-").toString
      val db = new graft.engine.Btrdb(spark, dir)
      val uuid = "12345678-0000-0000-0000-00000000c0de"
      db.createStream(uuid, "cb/s", Map("k" -> "v"))
      val pts = spark.range(nPts).select(
        (col("id") * 8333333L + pmod(xxhash64(col("id")), lit(20000L)))
          .as("time"),
        value.as("value"))
      db.insert(uuid, pts)
      db.flush(uuid)
      val out = (walkBytes(new java.io.File(s"$dir/points")),
        walkBytes(new java.io.File(s"$dir/pyramid")))
      db.close()
      out
    }

    // noisy: sinusoid + hash noise — full-entropy float64 mantissas,
    // the worst case for ANY value encoder (the reference's published
    // 2.9x is corpus-dependent for the same reason)
    val (noisyLog, noisyPyr) = measure("noisy",
      sin(col("id").cast("double") / 7.13) * 120.0 +
        pmod(xxhash64(col("id") + 1), lit(1000L)).cast("double") / 250.0)
    // grid: values on a cents grid (sensor/metric streams routinely
    // quantize) — parquet's dictionary encoding collapses the column
    val (gridLog, _) = measure("grid",
      pmod(xxhash64(col("id") + 1), lit(1000L)).cast("double") / 100.0)

    val bppN = noisyLog.toDouble / nPts
    val bppG = gridLog.toDouble / nPts
    println(s"""{"metric":"compression","points":$nPts,""" +
      s""""noisy_bytes_per_point":$bppN,""" +
      s""""noisy_ratio_vs_16B":${16.0 / bppN},""" +
      s""""grid_bytes_per_point":$bppG,""" +
      s""""grid_ratio_vs_16B":${16.0 / bppG},""" +
      s""""pyramid_overhead_pct":${100.0 * noisyPyr / noisyLog}}""")
    spark.stop()
  }

  private def walkBytes(f: java.io.File): Long =
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else f.listFiles().map(walkBytes).sum
}
