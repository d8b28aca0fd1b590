package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming form of the distillate family
  * ([[graft.operators.Distillate]]): rate-of-change and gap detection
  * over a live point stream, state = ONE (time, value) pair per
  * stream, carried across micro-batches with
  * `flatMapGroupsWithState` — the live-monitoring shape of the
  * reference ecosystem's DISTIL derived streams (there a distillate
  * process re-derives changed ranges; here arrivals distill as they
  * land).
  *
  * Contract (matches the batch operator exactly on in-order input):
  * points are consumed in (time, value) order per stream — each
  * micro-batch is sorted per stream in memory (bounded by the batch,
  * not the stream), and a point ordering at or below the state's
  * last-seen (time, value) is DROPPED as late, because its distillate
  * row was already emitted against a different predecessor (the batch
  * operator would have re-derived it; a stream cannot retract). On
  * append-ordered input the emitted rows are bit-identical to
  * [[graft.operators.Distillate.rate]] over the same prefix:
  * rate = Δv·1e9/Δt, NULL on a 0-ns baseline (duplicate timestamp,
  * larger value — kept, but no defined slope), rate_ctr additionally
  * NULL on a value decrease (counter reset), and is_gap flags a
  * baseline wider than `gapNs`.
  */
object StreamingDistillate {

  /** Distilled row: one per accepted point that has a predecessor. */
  final case class RatePoint(sid: Long, time: Long, value: Double,
                             rate: Option[Double], rate_ctr: Option[Double],
                             is_gap: Boolean)

  /** Last accepted point per stream. */
  final case class LastPoint(time: Long, value: Double)

  /** An event enriched with the latest reference value known when it
    * was processed (NULL-free Option fields before any reference). */
  final case class Enriched(sid: Long, time: Long, value: Double,
                            ref_time: Option[Long], ref_value: Option[Double])

  /** `source` must stream (sid, time, value). Use with OutputMode
    * Append (the helper [[attach]] wires a memory/console-style sink
    * in specs). */
  def rateStream(source: DataFrame, gapNs: Long): Dataset[RatePoint] = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .select(col("sid").cast("long"), col("time").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastPoint, RatePoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (sid, rows, state) =>
          val batch = rows.toSeq.map { case (_, t, v) => (t, v) }
            .sorted // (time, value) lexicographic — the batch operator's order
          var last = state.getOption
          val out = Seq.newBuilder[RatePoint]
          batch.foreach { case (t, v) =>
            last match {
              case Some(LastPoint(pt, pv))
                  if t < pt || (t == pt && v < pv) =>
              // late arrival: already distilled past it. An EXACT
              // duplicate (t == pt && v == pv) falls through to the
              // emit branch — the batch operator emits a NULL-rate row
              // for it, and bit-equality demands the stream does too
              case Some(LastPoint(pt, pv)) =>
                val r = if (t == pt) None
                        else Some((v - pv) * 1.0e9 / (t - pt))
                out += RatePoint(sid, t, v, r,
                  if (v - pv < 0) None else r, t - pt > gapNs)
                last = Some(LastPoint(t, v))
              case None =>
                // first point of the stream: nothing to distill yet
                last = Some(LastPoint(t, v))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** A detected threshold crossing. */
  final case class Crossing(sid: Long, time: Long, value: Double,
                            dir: String)

  /** Streaming threshold-crossing detection — the live form of
    * [[graft.operators.Distillate.crossings]] (the DISTIL
    * sag/excursion detector, which in production runs AT INGEST so
    * alarms fire in stream time, not at the next batch pass). Same
    * one-(time, value)-record state and late-drop contract as
    * [[rateStream]]; on append-ordered input the emitted events are
    * exactly the batch operator's (pure comparisons — nothing to
    * drift). */
  def crossingsStream(source: DataFrame,
                      threshold: Double): Dataset[Crossing] = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .select(col("sid").cast("long"), col("time").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastPoint, Crossing](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (sid, rows, state) =>
          val batch = rows.toSeq.map { case (_, t, v) => (t, v) }.sorted
          var last = state.getOption
          val out = Seq.newBuilder[Crossing]
          batch.foreach { case (t, v) =>
            last match {
              case Some(LastPoint(pt, pv))
                  if t < pt || (t == pt && v < pv) =>
              // late: the detector already moved past this instant
              case Some(LastPoint(_, pv)) =>
                if (v >= threshold && pv < threshold)
                  out += Crossing(sid, t, v, "up")
                else if (v < threshold && pv >= threshold)
                  out += Crossing(sid, t, v, "down")
                last = Some(LastPoint(t, v))
              case None =>
                last = Some(LastPoint(t, v))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming as-of enrichment: every EVENT row (tag 1) is emitted
    * with the most recent REFERENCE row (tag 0) at or before it, per
    * stream — the live form of [[graft.operators.Distillate.asOf]],
    * with state = one (time, value) reference per stream.
    *
    * `source` must stream (sid, time, value, tag). Within a batch,
    * rows order by (time, tag, value) — references at an event's exact
    * instant are visible to it, matching the batch operator. Across
    * batches the state carries the newest reference seen so far, and a
    * reference arriving OUT OF ORDER (older than the state) is
    * dropped — the single-record state keeps no history, so an event
    * enriches against the newest IN-ORDER reference at-or-before it,
    * not against every reference that ever arrived. On append-ordered
    * input this equals the batch as-of; under reordering it is the
    * standard latest-known-value enrichment (a stream cannot
    * retroactively re-enrich emitted rows, nor resurrect a reference
    * it superseded). */
  def enrichStream(source: DataFrame): Dataset[Enriched] = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .select(col("sid").cast("long"), col("time").cast("long"),
        col("value").cast("double"), col("tag").cast("int"))
      .as[(Long, Long, Double, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastPoint, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (sid, rows, state) =>
          val batch = rows.toSeq.map { case (_, t, v, tag) => (t, tag, v) }
            .sorted // (time, tag, value): refs before events at equal time
          var ref = state.getOption
          val out = Seq.newBuilder[Enriched]
          batch.foreach {
            case (t, 0, v) =>
              // newer reference (ties: larger value, the batch rule)
              if (!ref.exists(r => r.time > t || (r.time == t && r.value >= v)))
                ref = Some(LastPoint(t, v))
            case (t, _, v) =>
              out += Enriched(sid, t, v,
                ref.filter(_.time <= t).map(_.time),
                ref.filter(_.time <= t).map(_.value))
          }
          ref.foreach(state.update)
          out.result().iterator
      }
  }
}
