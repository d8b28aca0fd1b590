package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery}

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
        ingestBatch(batch, batchId, root)
      }
      .start()

  /** One micro-batch, exactly-once end to end:
    *
    *  1. the journal marker for `batchId` (an O(1) existence probe, not a
    *     scan of the whole journal) short-circuits an already-committed
    *     replay;
    *  2. staging/rejects land under partition `batch=batchId` with
    *     dynamic partition overwrite, so a replay of a half-written batch
    *     REPLACES its own partitions instead of appending duplicates;
    *  3. the journal marker is written last — the commit point.
    *
    * A crash anywhere before (3) leaves a batch that replays
    * idempotently; after (3) the marker short-circuits it. This is the
    * same idempotence contract as the reference's journal recovery
    * (replay only if `jrn.MajorVersion == current`,
    * /root/reference/pqm.go:172-179), carried by Spark's checkpointed
    * batchId instead of a stream version. */
  private[streaming] def ingestBatch(batch: DataFrame, batchId: Long,
                                     root: String): Unit = {
    val spark = batch.sparkSession
    // same FileSystem resolution as the engine root (Store instances are
    // cheap — Hadoop caches the FileSystem per scheme+authority)
    val store = new graft.storage.Store(root,
      spark.sessionState.newHadoopConf())
    val marker = s"journal/batch-$batchId"
    if (!store.exists(marker)) {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val typed = batch.select(
        col("sid").cast("long").as("sid"),
        col("time").cast("long").as("time"),
        col("value").cast("double").as("value"))
      val valid = typed.filter(TimeOps.validPoint(col("time"), col("value")))
      val invalid = typed.filter(!TimeOps.validPoint(col("time"), col("value")))
      valid.withColumn("batch", lit(batchId))
        .sortWithinPartitions("sid", "time")
        .write.mode(SaveMode.Overwrite).partitionBy("sid", "batch")
        .parquet(s"$root/staging")
      if (!invalid.isEmpty)
        invalid.withColumn("batch", lit(batchId))
          .write.mode(SaveMode.Overwrite).partitionBy("batch")
          .parquet(s"$root/rejects")
      store.writeAtomic(marker, "")
      // retention: markers far behind the checkpoint's committed offset
      // are dead (Spark never replays batches that old) — prune so the
      // journal directory stays O(retention window), not O(stream age)
      val horizon = batchId - 128
      if (horizon > 0)
        store.listNames("journal").foreach { name =>
          if (name.startsWith("batch-") &&
              name.stripPrefix("batch-").toLongOption.exists(_ < horizon))
            store.delete(s"journal/$name")
        }
    }
  }

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

  /** Running whole-stream stat state, one row per stream per update. */
  final case class StreamStat(sid: Long, cnt: Long, tmin: Long, tmax: Long,
                              vmin: Double, vmax: Double, vsum: Double) {
    def vmean: Double = vsum / cnt
  }

  /** Per-stream running statistics over the whole stream's life — a
    * stateful `mapGroupsWithState` fold (the custom-state shape the
    * engine's live monitoring uses: last-seen time, lifetime count,
    * running min/mean/max per stream). State is one tiny record per
    * stream; each micro-batch emits every updated stream's new state.
    * The fold is the same exact combine contract as the engine's stat
    * merge ((cnt, min, Σ, max) — mean derived), so the streaming state
    * agrees bit-for-bit with a batch recompute. */
  def runningStats(source: DataFrame): Dataset[StreamStat] = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .select(col("sid").cast("long").as("sid"),
        col("time").cast("long").as("time"),
        col("value").cast("double").as("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[StreamStat, StreamStat](
        GroupStateTimeout.NoTimeout) { case (sid, rows, state) =>
        val prev = state.getOption.getOrElse(
          StreamStat(sid, 0L, Long.MaxValue, Long.MinValue,
            Double.PositiveInfinity, Double.NegativeInfinity, 0.0))
        val next = rows.foldLeft(prev) { case (s, (_, t, v)) =>
          StreamStat(sid, s.cnt + 1,
            math.min(s.tmin, t), math.max(s.tmax, t),
            math.min(s.vmin, v), math.max(s.vmax, v), s.vsum + v)
        }
        state.update(next)
        next
      }
  }
}
