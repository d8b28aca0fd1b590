package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.FedDedupState

/** Streaming-cadence FEDERATION maintenance: the member stores already
  * fold forward one micro-batch at a time ([[StreamingDedupIndex]]);
  * this sink closes the remaining gap — the federation store was
  * fold-on-demand only, so a streaming deployment's cross-member
  * clusters lagged until something called `fold()` by hand. Here every
  * member micro-batch fold is followed (on a configurable cadence) by
  * an automatic [[graft.etl.FedDedupState.fold]], so the federation's
  * converged labels track the streams at member-delta cost.
  *
  * Idempotency needs nothing new: the member folds key (scope, batchId)
  * through the store pointer exactly as [[StreamingDedupIndex]] does,
  * and the federation fold is idempotent BY CONSTRUCTION — its
  * per-member watermarks ride its own CURRENT pointer, so a replayed
  * or doubled fold() absorbs nothing and a crash between a member
  * flip and the federation flip is healed by the next cadence tick
  * (the fold reads whatever member versions lie beyond the
  * watermarks, whenever it runs).
  *
  * Single-writer discipline AND fold/update isolation: the federation
  * store is one-writer like every store here, and several member
  * streams tick concurrently — worse, a member's own `update` may
  * auto-compact, moving its read base and DELETING version dirs while
  * a concurrent federation fold holds a pinned version (the fold would
  * die on the mid-fold-compact guard or a vanished dir, and Spark
  * terminates the streaming query). A read/write lock closes the race
  * at the only place that owns both sides: member updates take the
  * READ side (members are independent writers — they stay parallel
  * with each other), the federation fold takes the WRITE side, so a
  * fold's pinned member versions cannot be compacted out from under it
  * and folds serialize with each other. `foldEvery` trades federation
  * freshness against fold latency: 1 = fold after every member
  * micro-batch (freshest); N folds after every Nth micro-batch ACROSS
  * the member streams, with the skipped ticks' deltas absorbed by the
  * next fold (watermarks make the batching exact, never lossy). A
  * deployment draining its streams should run one final `fed.fold()`
  * at shutdown to absorb any post-last-tick member versions.
  */
object StreamingFedIndex {

  /** Wire one curated stream per federation MEMBER (stream i feeds
    * member store i — the `fed.memberStores` order) and drive the
    * federation fold on the micro-batch cadence. Returns the started
    * queries, one per member stream. */
  def indexStreams(curatedByMember: Seq[(DataFrame, String)],
                   fed: FedDedupState,
                   foldEvery: Int = 1): Seq[StreamingQuery] = {
    require(foldEvery >= 1, "foldEvery must be >= 1")
    require(curatedByMember.size == fed.memberStores.size,
      s"got ${curatedByMember.size} member streams for a federation of " +
        s"${fed.memberStores.size} members — stream i feeds member i")
    val ticks = new AtomicLong(0L)
    val rw = new java.util.concurrent.locks.ReentrantReadWriteLock()
    curatedByMember.zip(fed.memberStores).map {
      case ((curated, checkpoint), member) =>
        val scope =
          StreamingDedupIndex.scopeFor(checkpoint, member.lastAppliedKey)
        curated
          .select("doc_id", member.contentColumn)
          .writeStream
          .outputMode("append")
          .trigger(Trigger.ProcessingTime(0L))
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // empty micro-batches fold nothing and must not churn
            // version dirs (the member-sink rule); they don't tick the
            // federation cadence either — an idle stream costs nothing
            if (!batch.isEmpty) {
              // read side: member updates (and any auto-compact inside
              // them) run in parallel with each other but never while
              // a federation fold holds pinned member versions
              rw.readLock().lock()
              try member.update(batch, idempotencyKey = Some((scope, batchId)))
              finally rw.readLock().unlock()
              if (ticks.incrementAndGet() % foldEvery == 0) {
                rw.writeLock().lock()
                try { fed.fold(); () }
                finally rw.writeLock().unlock()
              }
            }
          }
          .start()
    }
  }
}
