package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.queries.EtlQueries

/** Streaming corpus curation: the dedup/quality/PII admission gate a
  * training-data pipeline runs ON INGEST, before anything lands in the
  * corpus store — the streaming counterpart of the batch operators
  * (`q_dedup_exact`/`q_dedup_keep`, `q_text_quality`, `q_pii_redact`).
  *
  * Ordering contract: the scrub runs FIRST, so the gate's dedup
  * identity is the digest of the SCRUBBED text — a re-crawl of one
  * page differing only in a rotating email/IP deduplicates to one
  * admission. Because this gate runs before the store, the corpus the
  * BATCH operators later scan contains only scrubbed text, and their
  * raw-text digests coincide with the gate's identity by construction
  * (the batch pipeline never sees un-scrubbed bytes). The regex
  * patterns and quality-rule constants are the SAME vals the batch
  * queries interpolate ([[EtlQueries.EmailRe]]/[[EtlQueries.Ipv4Re]],
  * `QualityMinTokens`/`QualityStopMult`/`QualityStops`), so the two
  * paths cannot drift independently.
  *
  * Scale shape: the dedup state is ONE tiny record per distinct
  * content digest (16-byte key + first-id + count), partitioned by the
  * digest exactly like the batch dedup's shuffle key — at corpus scale
  * the state lives in the state store (RocksDB-backed on a real
  * cluster) and each micro-batch shuffles once on the digest, the same
  * movement the batch pipeline pays. Quality + scrub are stateless
  * per-row projections that fuse into the same stage, and the
  * per-digest fold is a single O(n)/O(1)-memory pass (a hot duplicate
  * crawled millions of times in one micro-batch never buffers its
  * copies).
  */
object StreamingCurator {

  /** Admission record for one distinct content digest: the first
    * arrival owns the content; later arrivals only bump the count. */
  final case class SeenDoc(firstId: Long, dupes: Long)

  /** A curated, admitted document as emitted by [[curate]]. */
  final case class Admitted(doc_id: Long, text: String, n_tokens: Long)

  private[streaming] def tokenCountOf(text: String): Long =
    text.count(_ == ' ').toLong + 1

  /** The batch quality rule (q_text_quality), from the SAME constants:
    * >= QualityMinTokens tokens and stopword occurrences no more than
    * 1/QualityStopMult of them. */
  private[streaming] def keepQuality(text: String): Boolean = {
    val padded = " " + text + " "
    // replace-length occurrence count — the IDENTICAL arithmetic the
    // batch rule uses (EtlQueries.occurrences), so stream and batch
    // verdicts can never diverge on overlap-adjacent stopwords
    def occ(pat: String): Int =
      (padded.length - padded.replace(pat, "").length) / pat.length
    val toks = tokenCountOf(text)
    val stops = EtlQueries.QualityStops.map(occ).sum
    toks >= EtlQueries.QualityMinTokens &&
      stops * EtlQueries.QualityStopMult <= toks
  }

  /** Exact-dedup admission gate + quality filter + PII scrub over a
    * streaming source of (doc_id LONG, text STRING) rows.
    *
    * Emits each distinct (scrubbed, quality-passing) content exactly
    * once — the FIRST arrival in stream order wins (min doc_id within
    * a micro-batch, the batch pipeline's canonical tie-break),
    * duplicates across and within micro-batches are absorbed by
    * per-digest state.
    *
    * State bound (`ttlMs`): without a TTL the seen-set grows with
    * distinct content forever — fine for a bounded backfill, unusable
    * for an always-on gate at crawl scale. With `ttlMs = Some(t)` the
    * source must carry a WATERMARKED `ts` timestamp column
    * (`source.withWatermark("ts", …)` before calling) and a digest
    * unseen for `t` of event time is EVICTED (event-time timeout,
    * extended on every arrival — a hot duplicate stays pinned). The
    * dedup horizon is then exactly `t`: a re-crawl after eviction
    * re-admits, and state size is bounded by the distinct content
    * arriving per TTL window, not the corpus. The infinite-horizon
    * exact-dup index lives in the persisted batch store
    * ([[graft.etl.DedupState]]) — the production split is a bounded
    * streaming gate in front of a versioned on-disk index.
    */
  /** The MEDIA admission gate: a streaming source of binary asset rows
    * (asset_id LONG, kind STRING, payload BINARY [, meta_source,
    * meta_chars]) through the SAME quarantining per-partition decode
    * the batch path uses ([[graft.etl.Multimodal.decodeAll]]) — every
    * input row becomes exactly one tagged output row (ok + features,
    * or the oversize/unknown-kind/decode-error reject), so one corrupt
    * container in a micro-batch costs ONE REJECT ROW, never the stream:
    * an uncaught decode throw inside foreachBatch would fail the batch,
    * the query would retry it, hit the same container, and die — the
    * job-death loop the batch quarantine exists to prevent, re-armed at
    * ingest. Narrow (a mapPartitions over the micro-batch, no state, no
    * shuffle), so it composes with any downstream sink or the text
    * gate. Callers split on `ok`; the reject side is first-class output
    * to land in an audit sink, never a silent drop. */
  def curateMedia(source: DataFrame): Dataset[graft.etl.Multimodal.AssetDecodeRow] = {
    val spark = source.sparkSession
    import spark.implicits._
    val cols = source.columns.toSet
    val assets = source.select(
        col("asset_id").cast("long").as("asset_id"),
        col("kind"), col("payload"),
        (if (cols("meta_source")) col("meta_source") else lit(""))
          .as("meta_source"),
        (if (cols("meta_chars")) col("meta_chars").cast("long") else lit(0L))
          .as("meta_chars"))
      .as[graft.etl.Multimodal.Asset]
    graft.etl.Multimodal.decodeAll(assets)
  }

  def curate(source: DataFrame, ttlMs: Option[Long] = None): Dataset[Admitted] = {
    val spark = source.sparkSession
    import spark.implicits._
    val withTs =
      if (ttlMs.isDefined) {
        require(source.columns.contains("ts"),
          "event-time TTL needs a watermarked `ts` timestamp column")
        // `ts` passes through UNTOUCHED: even a no-op cast would mint a
        // fresh attribute and strip the caller's watermark tag
        source.select(col("doc_id"), col("text"), col("ts"))
      } else source.select(col("doc_id"), col("text"),
        lit(new java.sql.Timestamp(0)).as("ts"))
    val scrubbed = withTs
      .select(col("doc_id").cast("long").as("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), EtlQueries.EmailRe, "<EMAIL>"),
          EtlQueries.Ipv4Re, "<IP>").as("text"),
        col("ts"))
      .select(col("doc_id"), col("text"),
        md5(col("text").cast("binary")).as("k"), col("ts"))
      .as[(Long, String, String, java.sql.Timestamp)]
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    scrubbed
      .groupByKey(_._3)
      .flatMapGroupsWithState[SeenDoc, Admitted](
        org.apache.spark.sql.streaming.OutputMode.Append,
        timeoutConf) { case (_, rows, state) =>
        if (ttlMs.isDefined && state.hasTimedOut) {
          // unseen for a full TTL of event time: forget the digest
          state.remove()
          Iterator.empty
        } else {
          // single O(1)-memory pass: track the min-id row and the count —
          // identical content shares one text, so keeping only the
          // current minimum never drops information
          var minId = Long.MaxValue
          var minText: String = null
          var maxTs = Long.MinValue
          var n = 0L
          rows.foreach { case (id, text, _, ts) =>
            if (id < minId) { minId = id; minText = text }
            if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
            n += 1
          }
          val out = state.getOption match {
            case Some(seen) =>
              state.update(SeenDoc(seen.firstId, seen.dupes + n))
              Iterator.empty[Admitted]
            case None =>
              state.update(SeenDoc(minId, n - 1))
              if (keepQuality(minText))
                Iterator.single(Admitted(minId, minText, tokenCountOf(minText)))
              else Iterator.empty[Admitted]
          }
          // sliding eviction deadline: every arrival extends it; the
          // timestamp must sit past the current watermark to register
          ttlMs.foreach(t => state.setTimeoutTimestamp(
            math.max(maxTs + t, state.getCurrentWatermarkMs() + 1)))
          out
        }
      }
  }
}
