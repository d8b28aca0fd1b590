package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** State-bound probe for the streaming curator's TTL eviction: replay
  * the corpus at SPARK_GRAFT_SF_DIR through the admission gate in
  * timestamped chunks, once without a TTL (state grows with distinct
  * content forever) and once with a TTL shorter than the replay span
  * (state bounded by the distinct content of one TTL window). Prints
  * ONE JSON line with the final state-store row counts. */
object CuratorStateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length
    val distinct = docs.map(_._2).distinct.length
    // 10 chunks, one per "day" of event time
    val chunks = docs.grouped(math.max(1, nDocs / 10)).toSeq

    def replay(ttlMs: Option[Long], name: String): Long = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("curator-bench-").toString
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val src = mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds")
      val q = graft.streaming.StreamingCurator.curate(src, ttlMs)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      chunks.zipWithIndex.foreach { case (chunk, day) =>
        val t = new java.sql.Timestamp(day * 86400000L)
        // day-salted text models a ROLLING crawl (fresh content daily)
        // on top of the replica's repeats; without the salt every
        // distinct text re-arrives every day and eviction never fires
        // (hot content stays pinned — also worth measuring, but it
        // bounds nothing)
        mem.addData(chunk.map { case (id, tx) => (id, s"[day $day] $tx", t) })
        q.processAllAvailable()
      }
      val rows = q.lastProgress.stateOperators(0).numRowsTotal
      q.stop()
      rows
    }

    val unbounded = replay(None, "cur_unbounded")
    // TTL of 2 days against a 10-day replay
    val bounded = replay(Some(2L * 86400000L), "cur_ttl")
    println(s"""{"metric":"curator_state","docs":$nDocs,""" +
      s""""distinct":$distinct,"state_unbounded":$unbounded,""" +
      s""""state_ttl2d":$bounded,"sf":"$sfDir"}""")
    spark.stop()
  }
}
