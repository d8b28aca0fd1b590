package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.Store

object ContamState {

  /** Postings partition by a HASH bucket of the gram (`gp`): grams are
    * arbitrary text slices, unfit for partition directory names, where
    * a bounded integer bucket is always clean — the same reasoning as
    * [[DedupState.bandBucket]]. 64 buckets: the postings index is the
    * corpus-sided table; the texts index partitions by digest prefix
    * like DedupState's key index. */
  private[etl] val GramBuckets = 64
  private[etl] def gramBucket(c: Column): Column =
    pmod(xxhash64(c), lit(GramBuckets)).cast("int")

  /** CORPUS-WIDE live evidence across FEDERATION MEMBERS — the
    * decontamination analog of [[DedupState.federatedDocClusters]]:
    * each member root indexes the documents it ingests; the merge
    * reconstructs exactly the live postings a SINGLE store over the
    * union corpus would hold. Returns (k, g).
    *
    * Distinct-content semantics are per-CORPUS: content indexed by
    * several members contributes its postings once (the union
    * de-duplicates on (k, g) — postings are distinct per content by
    * construction), and the df cap applies to the GLOBAL document
    * frequency counted over DISTINCT content (member caps are
    * subsumed: global df ≥ member df, so a member-capped gram is
    * globally capped too, and its postings union carries the evidence
    * until the global cap retires it). All members must share the cap
    * (META invariant). Cost ∝ the unioned index — the rare
    * topology-level step, like the dedup merge.
    * FederatedDedupSpec proves two-member == single-store. */
  def federatedLivePostings(states: Seq[ContamState]): DataFrame = {
    require(states.nonEmpty, "federation needs at least one member")
    val caps = states.map(_.cap).distinct
    require(caps.size == 1,
      s"members disagree on the df cap ($caps) — the cap is an " +
        "evidence-set invariant, federated or not")
    val postAll = states.map(_.postings().select("k", "g"))
      .reduce(_ unionByName _).distinct()
    // a member-capped gram stays globally capped even when the member
    // has COMPACTED (compaction prunes capped postings, so the global
    // df recount would undercount it) — union the member verdicts in
    val memberCapped = states.map(_.capped().select("g"))
      .reduce(_ unionByName _)
    val globalCapped = postAll.groupBy("g")
      .agg(count(lit(1)).as("df")).filter(col("df") > caps.head)
      .select("g")
      .unionByName(memberCapped).distinct()
    postAll.join(globalCapped, Seq("g"), "left_anti")
  }

  /** Per-update accounting: gram work must track the batch's NEW
    * distinct content, never the corpus. */
  final case class UpdateReport(
      version: Long,
      nBatchDocs: Long,
      nNewDistinct: Long,
      nGramRows: Long,
      nNewlyCapped: Long)

  private[etl] val TextsSchema = StructType(Seq(
    StructField("k", StringType), StructField("ver", LongType)))
  private[etl] val PostingsSchema = StructType(Seq(
    StructField("k", StringType), StructField("g", StringType)))
  private[etl] val CappedSchema = StructType(Seq(
    StructField("g", StringType)))
}

/** Versioned, persisted DECONTAMINATION index with per-ingest-batch
  * incremental maintenance — the second application of the
  * [[DedupState]] pattern (versioned parquet deltas under an atomic
  * CURRENT pointer, update cost ∝ the batch): an eval-suite
  * contamination probe reads a PERSISTED rare-gram postings index; a
  * daily crawl appends its postings without re-shingling the corpus.
  *
  *   - postings are extracted ONLY for new distinct content (one
  *     anti-join against the persisted key index decides newness);
  *   - the document-frequency cap is RETROACTIVE, like DedupState's
  *     bucket cap: a gram whose total df crosses `dfCap` stops
  *     carrying contamination evidence, INCLUDING the postings it
  *     contributed in earlier versions — [[livePostings]] anti-joins
  *     the capped set, so the incremental store equals a one-shot
  *     df-capped build on any batch schedule. Cap checks count only
  *     the batch's TOUCHED grams (semi-join-pruned index scan), and
  *     df growth is monotone, so a capped gram stays capped.
  *
  * `gramsOf` maps (k, text) rows to distinct (k, g) postings — inject
  * [[graft.queries.EtlQueries.contamGrams]] so the store's extraction
  * is character-identical to the one-shot pipeline and its oracle.
  * Single-writer contract: updates assume one writer per store root
  * (the engine ingest path is single-writer per root already); readers
  * are always safe — they resolve through the atomic pointer and see
  * either the old or the new version, never a partial.
  *
  * `dfCap` persists in META; a mismatched reopen throws (it is an
  * evidence-semantics invariant, like DedupState's bucket cap).
  *
  * Physical layout: the texts index partitions by digest prefix
  * (`kp=` dirs) and the postings index by gram hash bucket (`gp=`
  * dirs), and [[update]]'s two corpus-sided scans (the newness
  * anti-join, the df-accounting semi-join) filter to the batch's
  * partition values first — a daily batch reads the partitions it
  * touches, not the corpus (StatePartitionSpec). `autoCompactEvery`
  * bounds the reader's delta-union width by self-compacting after the
  * flip, exactly as in [[DedupState]].
  */
final class ContamState(
    spark: SparkSession,
    rootUri: String,
    gramsOf: DataFrame => DataFrame,
    dfCap: Long,
    autoCompactEvery: Int = 0)
  extends VersionedStore(spark, rootUri) {

  require(autoCompactEvery >= 0, "autoCompactEvery must be >= 0 (0 = off)")

  import ContamState._
  import DedupState.Tracked

  private def pointer: (Long, Long) = {
    val (cur, base, _) = pointerParts
    (cur, base)
  }

  /** The store's df-cap invariant — federation merges require all
    * members to agree ([[ContamState.federatedLivePostings]]). */
  def cap: Long = dfCap

  private def metaLine: String = s"dfCap=$dfCap"
  private def checkMeta(): Unit =
    checkOrWriteMeta(metaLine)((stored, line) =>
      s"ContamState at $rootUri was built with '$stored', reopened " +
        s"with '$line' — the df cap is an evidence-set invariant")

  /** Physical partition column per table: the texts (key) index by
    * digest prefix, the postings index by gram hash bucket. `capped`
    * stays flat (tiny). */
  protected val partitionField: Map[String, (StructField, Column)] = Map(
    "texts" -> ((StructField("kp", StringType),
      DedupState.keyPrefix(col("k")))),
    "postings" -> ((StructField("gp", IntegerType), gramBucket(col("g")))))

  override protected def partitionFanout(name: String): Int =
    if (name == "postings") ContamState.GramBuckets else 256

  // pruned index scans for the update path (StatePartitionSpec asserts
  // files-read ∝ touched partitions — the DedupState contract)

  private[etl] def seenKeysTouching(prefixes: Seq[String],
                                    upTo: Long): DataFrame =
    touching("texts", TextsSchema, prefixes, upTo)

  private[etl] def postingsTouching(buckets: Seq[Int],
                                    upTo: Long): DataFrame =
    touching("postings", PostingsSchema, buckets, upTo)

  // ---- member-delta reads (the federated merge's fold inputs) --------
  // the [[DedupState.membersDelta]] contract: direct version-dir reads
  // (∝ the delta) while the dirs are live, exact fallbacks after a
  // compact squashed them ([[VersionedStore.deltaDirs]] owns the
  // window/boundary rules — one copy).

  /** Distinct content first indexed in (from, upTo] — ver-exact even
    * after a compact (texts keep their arrival version). */
  private[etl] def textsDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("texts", TextsSchema, from, upTo)
      .getOrElse(seenKeys(upTo).filter(col("ver") > from))

  /** Postings extracted in (from, upTo] — a content's postings land at
    * its arrival version, so the compact fallback semi-joins the
    * postings index to the delta keys (full narrow-index scan; exact
    * minus capped grams' rows the compact pruned, which the federated
    * merge retires through the capped verdicts anyway). */
  private[etl] def postingsDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("postings", PostingsSchema, from, upTo)
      .getOrElse(postings(upTo).join(
        textsDelta(from, upTo).select("k"), Seq("k"), "left_semi"))

  /** Grams the member capped in (from, upTo]. Compact fallback: the
    * FULL capped set — a safe overapproximation (tiny by construction;
    * the federated merge anti-joins its own already-known set). */
  private[etl] def cappedDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("capped", CappedSchema, from, upTo)
      .getOrElse(capped(upTo))

  /** Distinct content ever indexed — (k, ver). */
  def seenKeys(upTo: Long = currentVersion): DataFrame =
    tableFrame("texts", TextsSchema, upTo)

  /** ALL postings, including those of since-capped grams. */
  def postings(upTo: Long = currentVersion): DataFrame =
    tableFrame("postings", PostingsSchema, upTo)

  /** Grams over the df cap — boilerplate, no contamination evidence. */
  def capped(upTo: Long = currentVersion): DataFrame =
    tableFrame("capped", CappedSchema, upTo)

  /** The live evidence index: postings of under-cap grams only —
    * exactly a one-shot df-capped build over everything ever seen. */
  def livePostings(upTo: Long = currentVersion): DataFrame =
    postings(upTo).join(capped(upTo), Seq("g"), "left_anti")

  /** Fold one batch — (doc_id LONG, text STRING) — into the index. */
  def update(batch: DataFrame): UpdateReport = {
    checkMeta()
    val (cur, base) = pointer
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    val b = batch.select(col("doc_id"),
      md5(col("text").cast("binary")).as("k"), col("text"))
    val nBatchDocs = b.count()
    // the key-index scan prunes to the batch's digest-prefix partitions
    val batchTexts = b.groupBy("k").agg(min("text").as("text")).cpInto(cps)
    val batchPrefixes =
      partitionValues[String](batchTexts, DedupState.keyPrefix(col("k")))
    val newTexts = batchTexts
      .join(seenKeysTouching(batchPrefixes, cur).select("k"),
        Seq("k"), "left_anti")
      .cpInto(cps)
    val nNewDistinct = newTexts.count()

    // postings for NEW distinct content only
    val newPost = gramsOf(newTexts.select("k", "text")).cpInto(cps)
    val nGramRows = newPost.count()

    // df accounting on the TOUCHED grams only: the postings-index scan
    // prunes to the touched gram-bucket partitions, then the semi-join
    // prunes to the exact grams
    val touched = newPost.select("g").distinct().cpInto(cps)
    val touchedBuckets = partitionValues[Int](touched, gramBucket(col("g")))
    val oldCnt = postingsTouching(touchedBuckets, cur)
      .join(touched, Seq("g"), "left_semi")
      .groupBy("g").agg(count(lit(1)).as("oldN"))
    val newCnt = newPost.groupBy("g").agg(count(lit(1)).as("newN"))
    val newlyCapped = newCnt
      .join(oldCnt, Seq("g"), "left_outer")
      .filter(col("newN") + coalesce(col("oldN"), lit(0L)) > dfCap)
      .join(capped(cur), Seq("g"), "left_anti")
      .select("g").cpInto(cps)
    val nNewlyCapped = newlyCapped.count()

    // the three delta writes are independent (checkpointed inputs,
    // disjoint dirs) and land concurrently; MANIFEST and the pointer
    // flip wait for all — the orphan-version crash contract holds. On
    // failure, wait the siblings out and release checkpoints before
    // rethrowing (nothing runs detached into a retry).
    val counts = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = Seq(
        Future("texts" -> writeTable(next, "texts",
          newTexts.select("k").withColumn("ver", lit(next)), nNewDistinct)),
        Future("postings" -> writeTable(next, "postings",
          newPost.select("k", "g"), nGramRows)),
        Future("capped" -> writeTable(next, "capped", newlyCapped,
          nNewlyCapped)))
      try Await.result(Future.sequence(fs), Duration.Inf)
      catch { case t: Throwable =>
        fs.foreach(f => scala.util.Try(Await.result(f, Duration.Inf)))
        cps.synchronized(cps.toList)
          .foreach(c => scala.util.Try(c.unpersist()))
        throw t
      }
    }
    flipPointer(next, base, counts, Seq.empty)
    cps.foreach(_.unpersist())
    // bounded maintenance, mirroring DedupState: once the reader's
    // delta-union spans the threshold, squash. Runs AFTER the flip, so
    // a crash mid-compact costs nothing (the next update retries it).
    if (autoCompactEvery > 0 && next - base + 1 >= autoCompactEvery)
      compact()

    UpdateReport(next, nBatchDocs, nNewDistinct, nGramRows, nNewlyCapped)
  }

  /** Squash versions into one snapshot, pruning capped grams' postings
    * (they can never un-cap — df is monotone), and advance the base. */
  def compact(): Long = {
    val (cur, base) = pointer
    if (cur == 0) return 0L
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val tables = Seq(
      ("texts", seenKeys(cur)),
      ("postings", livePostings(cur)),
      ("capped", capped(cur)))
    val counts = tables.map { case (name, df) =>
      val chk = df.cpInto(cps)
      name -> writeTable(next, name, chk, chk.count())
    }
    flipPointer(next, next, counts, Seq.empty)
    cps.foreach(_.unpersist())
    dropVersions(base, cur, next)
    next
  }
}
