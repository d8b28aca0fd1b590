package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the pyramid-served quantile path: ingest N then 8N
  * points (values on a fixed cents grid) into the same window span and
  * time `quantileWindowsBulk` at pw=quantileLevel+2 from the histogram
  * versus the raw fallback. The claim: histogram-served latency tracks
  * windows × distinct cents — flat in raw volume — while the raw path
  * scans every point. Prints ONE JSON line. */
object QuantileBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(nPts: Long): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("qbench").toString
      val db = new graft.engine.Btrdb(spark, dir,
        quantileLevel = Some(42))
      val uuid = "qb"
      db.createStream(uuid, "qb/s", Map("k" -> "v"))
      val span = 1L << 46 // 16 pw=42 buckets, 4 pw=44 windows
      db.insert(uuid, spark.range(nPts)
        .select((col("id") * (span / nPts)).as("time"),
          ((col("id") % 1000) / 100.0).as("value")))
      db.flush(uuid)
      // warm + time the histogram-served path
      db.quantileWindows(uuid, 0L, span, 44).count()
      val served = timed(db.quantileWindows(uuid, 0L, span, 44).count())
      // the same computation forced down the raw path (version pin
      // disables nothing here; recompute via the distillate transform)
      val raw = timed {
        graft.operators.Distillate.quantileWindows(
          db.rawValues(uuid, 0L, span)
            .withColumn("sid", lit(0L)).select("sid", "time", "value"),
          44).count()
      }
      db.close()
      (served, raw)
    }
    val (s1, r1) = run(1000000L)
    val (s8, r8) = run(8000000L)
    println(s"""{"metric":"quantile_pyr","served_1m_sec":$s1,""" +
      s""""raw_1m_sec":$r1,"served_8m_sec":$s8,"raw_8m_sec":$r8}""")
    spark.stop()
  }
}
