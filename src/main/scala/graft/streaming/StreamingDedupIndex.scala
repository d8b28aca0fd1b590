package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.etl.DedupState

/** The production handoff the curator + dedup-state pair exists for:
  * a BOUNDED streaming admission gate ([[StreamingCurator.curate]],
  * TTL-evicted seen-set) in front of the INFINITE-horizon persisted
  * index ([[graft.etl.DedupState]]), folded forward one micro-batch at
  * a time.
  *
  * Exactly-once: `foreachBatch` may replay a micro-batch after a crash
  * (its guarantee is at-least-once), so every fold passes the batchId
  * as the store's idempotency key — a replayed batch is skipped at the
  * store's atomic CURRENT pointer, never double-counted. The store's
  * own crash contract covers the other half: a failure between the
  * fold's data writes and the pointer flip leaves an orphan version
  * dir that the retry overwrites.
  *
  * Cost shape per micro-batch = the store's update contract: signature
  * work ∝ the batch's new distinct content, index scans semi-join-
  * pruned to the batch's buckets, quotient-graph clustering. The gate
  * in front has already absorbed intra-TTL duplicates, so the fold
  * mostly sees genuinely new content.
  */
object StreamingDedupIndex {

  /** The idempotency SCOPE of a checkpoint identity: a 128-bit md5 hex
    * of the checkpoint string. Scope strings ride the store's CURRENT
    * pointer (whitespace-delimited), so the raw path can't be used
    * verbatim; a 32-bit hash (the earlier choice) makes a collision
    * between two checkpoints that ever feed the same store merely
    * unlikely, and a collision would cross their seq comparisons and
    * silently SKIP real micro-batches — at 128 bits it is negligible
    * at any fleet size, the md5-as-identity bar the content keys
    * already rely on. */
  private[streaming] def scopeOf(checkpoint: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** The pre-md5 32-bit scope rendering — recognized for UPGRADE
    * CONTINUITY only: a store whose CURRENT pointer still carries this
    * checkpoint's legacy scope keeps that scope (same sequence, higher
    * seqs skip correctly) instead of starting a fresh one, which would
    * re-ingest once any micro-batch that was committed to the store
    * but not yet to the streaming checkpoint at upgrade time. */
  private[streaming] def legacyScopeOf(checkpoint: String): String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(checkpoint) & 0xffffffffL)

  /** The scope a fold should key under: the stored key's scope when it
    * is this checkpoint's legacy rendering, else the md5 scope. */
  private[streaming] def scopeFor(checkpoint: String,
                                  last: Option[(String, Long)]): String = {
    val legacy = legacyScopeOf(checkpoint)
    if (last.exists(_._1 == legacy)) legacy else scopeOf(checkpoint)
  }

  /** Wire a curated stream into a dedup store: returns the started
    * query. `curated` is [[StreamingCurator.curate]]'s output (or any
    * streaming Dataset carrying doc_id and the store's content column
    * — `text` for the text family, an embedding array for a
    * content-generic store). */
  def indexStream(curated: DataFrame, state: DedupState,
                  checkpoint: String): StreamingQuery =
    writer(curated, state, checkpoint)
      .option("checkpointLocation", checkpoint)
      .start()

  private[streaming] def writer(curated: DataFrame, state: DedupState,
                                checkpoint: String): DataStreamWriter[Row] = {
    // batchIds restart at 0 per checkpoint: scope the idempotency key
    // by the checkpoint identity so a NEW checkpoint against an
    // existing store starts a fresh sequence instead of colliding
    // (legacy-scope continuity: see [[scopeFor]])
    val scope = scopeFor(checkpoint, state.lastAppliedKey)
    curated
      // project to the store's OWN content column: the generalized
      // store may key on an embedding array rather than text
      .select("doc_id", state.contentColumn)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // empty micro-batches fold nothing and must not churn version
        // dirs; skipping them is idempotency-safe (no data, no effect)
        if (!batch.isEmpty) {
          state.update(batch, idempotencyKey = Some((scope, batchId)))
          ()
        }
      }
  }
}
