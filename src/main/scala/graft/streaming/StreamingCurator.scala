package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming corpus curation: the dedup/quality/PII admission gate a
  * training-data pipeline runs ON INGEST, before anything lands in the
  * corpus store — the streaming counterpart of the batch operators
  * (`q_dedup_exact`/`q_dedup_keep`, `q_text_quality`, `q_pii_redact`).
  *
  * Scale shape: the dedup state is ONE tiny record per distinct
  * content digest (16-byte key + first-id + count), partitioned by the
  * digest exactly like the batch dedup's shuffle key — at corpus scale
  * the state lives in the state store (RocksDB-backed on a real
  * cluster) and each micro-batch shuffles once on the digest, the same
  * movement the batch pipeline pays. Quality + scrub are stateless
  * per-row projections that fuse into the same stage.
  */
object StreamingCurator {

  /** Admission record for one distinct content digest: the first
    * arrival owns the content; later arrivals only bump the count. */
  final case class SeenDoc(firstId: Long, dupes: Long)

  /** A curated, admitted document as emitted by [[curate]]. */
  final case class Admitted(doc_id: Long, text: String, n_tokens: Long)

  private[streaming] def tokenCountOf(text: String): Long =
    text.count(_ == ' ').toLong + 1

  /** The batch quality rule (q_text_quality), verbatim: >= 40 tokens
    * and stopword occurrences no more than a fifth of them. */
  private[streaming] def keepQuality(text: String): Boolean = {
    val padded = " " + text + " "
    // replace-length occurrence count — the IDENTICAL arithmetic the
    // batch rule uses (EtlQueries.occurrences), so stream and batch
    // verdicts can never diverge on overlap-adjacent stopwords
    def occ(pat: String): Int =
      (padded.length - padded.replace(pat, "").length) / pat.length
    val toks = tokenCountOf(text)
    val stops = occ(" the ") + occ(" a ")
    toks >= 40 && stops * 5 <= toks
  }

  /** Exact-dedup admission gate + quality filter + PII scrub over a
    * streaming source of (doc_id LONG, text STRING) rows.
    *
    * Emits each distinct (scrubbed, quality-passing) content exactly
    * once — the FIRST arrival in stream order wins, duplicates across
    * and within micro-batches are absorbed by per-digest state. The
    * scrub runs BEFORE the digest so a re-crawl differing only in a
    * rotating email/IP still deduplicates (the redacted form IS the
    * content identity, matching the batch pipeline's
    * scrub-then-index order).
    */
  def curate(source: DataFrame): Dataset[Admitted] = {
    val spark = source.sparkSession
    import spark.implicits._
    val scrubbed = source
      .select(col("doc_id").cast("long").as("doc_id"),
        regexp_replace(regexp_replace(col("text"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
          "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>").as("text"))
      .select(col("doc_id"), col("text"),
        md5(col("text").cast("binary")).as("k"))
      .as[(Long, String, String)]
    scrubbed
      .groupByKey(_._3)
      .flatMapGroupsWithState[SeenDoc, Admitted](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) { case (_, rows, state) =>
        // micro-batch rows for one digest arrive unordered; the batch
        // pipeline's tie-break (min doc_id = canonical) applies within
        // the batch, stream order across batches
        val sorted = rows.toSeq.sortBy(_._1)
        val head = sorted.head
        state.getOption match {
          case Some(seen) =>
            state.update(SeenDoc(seen.firstId, seen.dupes + sorted.size))
            Iterator.empty
          case None =>
            state.update(SeenDoc(head._1, (sorted.size - 1).toLong))
            if (keepQuality(head._2))
              Iterator.single(
                Admitted(head._1, head._2, tokenCountOf(head._2)))
            else Iterator.empty
        }
      }
  }
}
