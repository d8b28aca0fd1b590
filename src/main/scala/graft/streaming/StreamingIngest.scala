package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.TimeOps

/** Structured-Streaming ingest: the engine's analog of the reference's
  * journaled write buffer (/root/reference/pqm.go:29-35 + the jprovider
  * WAL). A streaming source of (sid, time, value) rows lands in the
  * engine's staging area via foreachBatch with an idempotent batch-id
  * check — exactly-once in the same way the reference replays a journal
  * entry only if `jrn.MajorVersion == current` (/root/reference/pqm.go:172-179);
  * here Spark's checkpoint + the recorded batchId carry the idempotence.
  */
object StreamingIngest {

  /** Attach a streaming point source to an engine root's staging area.
    * `source` must have columns (sid LONG, time LONG, value DOUBLE).
    * Invalid points (NaN/Inf, out-of-domain time) are routed to
    * `root/rejects` instead of failing the stream.
    */
  def attach(source: DataFrame, root: String,
             checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committedIds =
          try spark.read.parquet(s"$root/journal").select("batchId")
            .collect().map(_.getLong(0)).toSet
          catch { case _: Throwable => Set.empty[Long] }
        if (!committedIds.contains(batchId)) { // idempotent replay guard
          val typed = batch.select(
            col("sid").cast("long").as("sid"),
            col("time").cast("long").as("time"),
            col("value").cast("double").as("value"))
          val valid = typed.filter(TimeOps.validPoint(col("time"), col("value")))
          val invalid = typed.filter(!TimeOps.validPoint(col("time"), col("value")))
          valid.sortWithinPartitions("sid", "time")
            .write.mode(SaveMode.Append).parquet(s"$root/staging")
          if (!invalid.isEmpty)
            invalid.write.mode(SaveMode.Append).parquet(s"$root/rejects")
          spark.createDataFrame(Seq(Tuple1(batchId))).toDF("batchId")
            .write.mode(SaveMode.Append).parquet(s"$root/journal")
        }
        ()
      }
      .start()

  /** Continuous windowed stat stream: per-stream tumbling 2^pw-ns stat
    * tuples with late-data tolerance.
    *
    * Watermark eviction needs an event-time `window()` column, which is
    * ms-based — and 2^pw ns is never a whole number of ms, so a ms
    * window alone would drift off the exact ns buckets. The group key is
    * therefore (sid, ms-window, exact-ns clamp): the watermark window
    * drives state eviction, the clamp keeps bucket boundaries exact. A
    * ns bucket straddling a ms-window boundary emits ≤2 PARTIAL rows;
    * downstream combines partials exactly ((cnt,vmin,vsum,vmax) — the
    * same merge contract as the engine's buffer merge, J3).
    */
  def statStream(source: DataFrame, pw: Int, lateness: String): DataFrame =
    source
      .withColumn("wstart_ns", TimeOps.clampTime(col("time"), pw))
      .withColumn("ts", eventTimeMicros)
      .withWatermark("ts", lateness)
      .groupBy(col("sid"),
        window(col("ts"), s"${math.max(1L, (1L << pw) / 1000000L)} milliseconds"),
        col("wstart_ns").as("wstart"))
      .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
        sum("value").as("vsum"), max("value").as("vmax"))
      .select("sid", "wstart", "cnt", "vmin", "vsum", "vmax")

  /** Exact ns→µs event time for watermarking: integer `div`, as
    * generateCsv does — `col("time") / 1000` would be a float Divide,
    * violating TimeOps' "never route ns through DoubleType" invariant
    * (~1 µs jitter at epoch scale). */
  private[streaming] def eventTimeMicros =
    timestamp_micros(expr("time div 1000"))

  /** Combine partial stat rows from [[statStream]] into final per-bucket
    * stats (batch post-pass or downstream consumer). */
  def combinePartials(partials: DataFrame): DataFrame =
    partials.groupBy("sid", "wstart")
      .agg(sum("cnt").as("cnt"), min("vmin").as("vmin"),
        (sum("vsum") / sum("cnt")).as("vmean"), max("vmax").as("vmax"))
}
