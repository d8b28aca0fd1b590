package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.etl.DerivedState

/** Streaming handoff for the generic derived-content store — the
  * [[StreamingDedupIndex]] contract applied to [[graft.etl.DerivedState]]:
  * a crawl stream folds its micro-batches into a persisted word /
  * trigram / language-prediction / code index one batch at a time,
  * deriving ONLY for keys the index has never seen.
  *
  * Exactly-once: `foreachBatch` is at-least-once, so every fold passes
  * the batchId as the store's (scope, seq) idempotency key — a
  * replayed batch is skipped at the store's atomic CURRENT pointer.
  * Content-wise the fold is idempotent anyway (a replayed key is not
  * new), but the key skip also spares the replay its anti-join and
  * version-dir churn, and keeps the version history identical across
  * crash schedules.
  *
  * Trained stores must have [[graft.etl.DerivedState.train]]ed before
  * the stream starts (the store enforces it); a retrain is a NEW
  * generation — stop the stream, retrain, re-feed, restart with a new
  * checkpoint.
  */
object StreamingDerivedIndex {

  /** Wire a keyed stream into a derived store: returns the started
    * query. `keyed` must carry the store's key column plus whatever
    * columns its derivation reads. */
  def indexStream(keyed: DataFrame, state: DerivedState,
                  checkpoint: String): StreamingQuery =
    writer(keyed, state, checkpoint)
      .option("checkpointLocation", checkpoint)
      .start()

  private[streaming] def writer(keyed: DataFrame, state: DerivedState,
                                checkpoint: String): DataStreamWriter[Row] = {
    // batchIds restart at 0 per checkpoint: scope the idempotency key
    // by the checkpoint identity (the [[StreamingDedupIndex.scopeOf]]
    // rule — 128-bit digest, collisions negligible; legacy-scope
    // continuity on upgrade via [[StreamingDedupIndex.scopeFor]])
    val scope = StreamingDedupIndex.scopeFor(checkpoint,
      state.lastAppliedKey)
    keyed
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          state.update(batch, idempotencyKey = Some((scope, batchId)))
          ()
        }
      }
  }
}
