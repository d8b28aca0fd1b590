package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

import graft.storage.Store

object DerivedState {

  /** Per-update accounting: derivation work must track the batch's NEW
    * keys, never the corpus. */
  final case class UpdateReport(
      version: Long,
      nBatchRows: Long,
      nNewKeys: Long,
      nDerivedRows: Long)

  /** Key index hash-bucket fan-out (works for string digests and long
    * vec ids alike — see [[DedupState.bandBucket]] for why hash
    * buckets beat raw-value partition dirs for caller-typed keys). */
  private[etl] val KeyBuckets = 256
  private[etl] def keyBucket(c: Column): Column =
    pmod(xxhash64(c), lit(KeyBuckets)).cast("int")

  /** FEDERATED derived rows across members — the DerivedState analog of
    * [[DedupState.federatedDocClusters]], with the contract the trained
    * families NEED and the append families get for free: rows derived
    * under DIFFERENT trained artifacts (two members each running their
    * own `train()` — different quantizer scales, different centroid
    * sets, different language profiles) are mutually incomparable, and
    * nothing in the row values says so. The derivation fingerprint
    * checks the FUNCTION and its constants; the artifact digest checks
    * the trained VALUES — this merge refuses unless both agree across
    * every member (train-once-distribute via [[DerivedState.adopt]] is
    * how members come to agree). Pure-append members all carry
    * digest = None and merge freely. Keys must be disjoint across
    * members (the engine federation's disjoint-ownership contract —
    * `Federation.ownerOf`); the union preserves whatever duplicates a
    * violation would create, so a downstream dedupe-or-assert can see
    * them. */
  def federatedDerived(states: Seq[DerivedState]): DataFrame = {
    require(states.nonEmpty, "federation needs at least one member")
    val fps = states.map(_.derivationFingerprint).distinct
    require(fps.size == 1,
      s"members run different derivations ($fps) — row semantics differ")
    val digests = states.map(_.artifactDigest).distinct
    require(digests.size == 1,
      s"members derive under DIFFERENT trained artifacts ($digests) — " +
        "their rows are mutually incomparable (different quantizers/" +
        "profiles/centroids). Train one member and let the others " +
        "adopt() its frozen artifacts, then re-derive.")
    states.map(_.derived()).reduce(_ unionByName _)
  }
}

/** Versioned, persisted DERIVED-CONTENT store — the third (and
  * generic) application of the [[DedupState]] pattern (parquet deltas
  * under an atomic CURRENT pointer, update cost ∝ the batch), covering
  * every memo family that is a PURE FUNCTION of per-key content:
  * word/trigram tables, language predictions, SQ8 codes, k-means
  * assignments. A daily crawl appends its new keys' derived rows; the
  * corpus's existing rows are never recomputed.
  *
  *   - `deriveOf(newRows, artifacts)` maps the batch's genuinely-new
  *     keyed rows to their derived rows (one anti-join against the
  *     persisted key index decides newness, pruned to the batch's
  *     key-bucket partitions exactly as in DedupState);
  *   - `trainOf` (optional) produces the TRAINED ARTIFACTS the
  *     derivation depends on — language-ID profiles, a quantizer's
  *     scale, k-means centroids. Artifacts train on an explicit
  *     cadence via [[train]], which RESETS the derived state: rows
  *     derived under the old artifacts are invalid by definition, so a
  *     retrain drops them and the caller re-feeds content (this is
  *     exactly how a production quantizer/classifier retrains — a new
  *     index generation, not an in-place patch). Between retrains,
  *     derivation against the FROZEN artifacts is a pure per-key
  *     function, so any batch schedule lands on the same store as a
  *     one-shot build (DerivedStateSpec proves schedule invariance).
  *   - pure-append families pass no `trainOf` and never train;
  *     `deriveOf` receives an empty artifact frame.
  *
  * `fingerprint` names the derivation (function + its constants) and
  * persists in META: reopening a store with a different derivation
  * would silently fork row semantics, so a mismatch throws — the
  * [[DedupState]] bucket-cap argument.
  *
  * Storage layout (all via [[Store]], same crash-safety contract):
  * {{{
  *   root/CURRENT              "cur base" — pointer (atomic)
  *   root/META                 fingerprint
  *   root/schema/{keys,derived}.json   frame schemas (empty-read support)
  *   root/v{N}/MANIFEST        row counts per table
  *   root/v{N}/keys[/kb=…]     (key, ver)    new keys, hash-bucketed
  *   root/v{N}/derived         caller schema  new keys' derived rows
  *   root/v{N}/artifacts       caller schema  only at train versions
  *   root/v{N}/ARTDIGEST       md5 of the artifact rows (train/adopt),
  *                             the federation-merge compatibility key
  * }}}
  * Keys follow the [[VersionedStore.partitionCutoff]] rule: corpus-sized
  * writes (train, compact) land partitioned for the pruned anti-join,
  * batch-sized deltas stay flat. Derived deltas are never probed by
  * updates (pure append), so they stay flat at any size. A crash
  * before the CURRENT flip leaves an invisible orphan dir; the retried
  * call overwrites it. [[compact]] squashes deltas (carrying the
  * artifacts forward) and bounds the reader's union width;
  * `autoCompactEvery` runs it on the DedupState cadence.
  *
  * Single-writer per root; readers always resolve through the atomic
  * pointer.
  */
final class DerivedState(
    spark: SparkSession,
    rootUri: String,
    fingerprint: String,
    keyCol: String,
    deriveOf: (DataFrame, DataFrame) => DataFrame,
    trainOf: Option[DataFrame => DataFrame] = None,
    autoCompactEvery: Int = 0)
  extends VersionedStore(spark, rootUri) {

  require(autoCompactEvery >= 0, "autoCompactEvery must be >= 0 (0 = off)")

  import DerivedState._
  import DedupState.Tracked

  /** (current version, base version, last idempotency key) — the
    * [[DedupState]] pointer format: the (scope, seq) key rides the
    * atomic CURRENT flip so a crashed foreachBatch replay lands
    * cleanly (see [[update]]'s keyed form). One shared tail parse:
    * [[VersionedStore.keyedPointer]]. */
  private def pointer: (Long, Long, Option[(String, Long)]) = keyedPointer

  /** The last (scope, seq) idempotency key applied by a keyed
    * [[update]], if any. */
  def lastAppliedKey: Option[(String, Long)] = pointer._3

  private def checkMeta(): Unit =
    checkOrWriteMeta(fingerprint.trim)((stored, line) =>
      s"DerivedState at $rootUri was built by '$stored', reopened by " +
        s"'$line' — the derivation is a row-semantics invariant")

  /** The caller's schemas are dynamic (persisted as JSON beside the
    * data — see rememberSchema), so the writes here bypass the base's
    * static-schema writeTable; the key index still partitions by hash
    * bucket (`kb`), declared for the shared machinery's benefit. */
  protected val partitionField: Map[String, (StructField, Column)] = Map(
    "keys" -> ((StructField("kb", IntegerType), keyBucket(col(keyCol)))))

  // ---- schema persistence (dynamic caller schemas, empty-safe reads) --

  private def rememberSchema(name: String, df: DataFrame): Unit =
    if (!store.exists(s"schema/$name.json"))
      store.writeAtomic(s"schema/$name.json", df.schema.json)

  private def storedSchema(name: String): Option[StructType] =
    store.readString(s"schema/$name.json")
      .map(DataType.fromJson(_).asInstanceOf[StructType])

  private def tableUnion(name: String, upTo: Long,
                         schema: StructType): DataFrame = {
    val (_, base, _) = pointer
    unionReadAs(name, schema, base to upTo)
  }

  // ---- readers -------------------------------------------------------

  /** Every key ever derived — (key, ver). */
  def keys(upTo: Long = currentVersion): DataFrame = {
    val schema = storedSchema("keys").getOrElse(
      throw new IllegalStateException(s"empty DerivedState at $rootUri"))
    tableUnion("keys", upTo, schema).drop("kb")
  }

  /** The derived table: one generation's rows for every key ever fed
    * through [[train]]/[[update]]. */
  def derived(upTo: Long = currentVersion): DataFrame = {
    val schema = storedSchema("derived").getOrElse(
      throw new IllegalStateException(s"empty DerivedState at $rootUri"))
    tableUnion("derived", upTo, schema)
  }

  /** The current trained artifacts (at the base version — [[train]]
    * resets the base). Empty 0-column frame when untrained. */
  def artifacts(): DataFrame = {
    val (_, base, _) = pointer
    if (manifest(base).getOrElse("artifacts", 0L) > 0)
      spark.read.parquet(store.resolve(s"v$base/artifacts").toString)
    else spark.emptyDataFrame
  }

  /** The derivation identity this store was built with — compared by
    * the federated merge before unioning member rows. */
  def derivationFingerprint: String = fingerprint.trim

  /** Content digest of the current trained artifacts (None when
    * untrained / pure-append): 128-bit, order-independent, persisted
    * beside the artifact frame at train/adopt time and carried through
    * compaction. Two members whose derived rows may be merged MUST
    * agree on it ([[DerivedState.federatedDerived]]). */
  def artifactDigest: Option[String] = {
    val (_, base, _) = pointer
    store.readString(s"v$base/ARTDIGEST").map(_.trim)
  }

  /** Canonical content digest of an artifact frame: md5 over the
    * sorted JSON rendering of its rows. Artifact frames are small by
    * contract (they broadcast into every derivation), so the collect
    * is bounded; JSON field order follows the schema and parquet
    * round-trips every stored value losslessly, so the digest is
    * stable across write/read/adopt hops. */
  private def digestOf(arts: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    arts.toJSON.collect().sorted.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Pruned key-index scan (the update path's corpus-sided read —
    * StatePartitionSpec's files-read ∝ touched-partitions contract). */
  private[etl] def keysTouching(buckets: Seq[Int], upTo: Long): DataFrame = {
    val schema = storedSchema("keys") match {
      case Some(sc) => sc
      case None => return spark.emptyDataFrame
    }
    tableUnion("keys", upTo, schema)
      .filter(col("kb").isin(buckets: _*)).drop("kb")
  }

  private def writeKeys(next: Long, keyFrame: DataFrame, n: Long): Long = {
    if (n > 0) {
      val target = store.resolve(s"v$next/keys").toString
      val withB = keyFrame.withColumn("kb", keyBucket(col(keyCol)))
      rememberSchema("keys", withB)
      if (n >= partitionCutoff("keys"))
        withB.repartition(col("kb"))
          .write.mode("overwrite").partitionBy("kb").parquet(target)
      else {
        val k = flatFileCount("keys", n)
        (if (k == 1) withB.coalesce(1) else withB.repartition(k, col("kb")))
          .write.mode("overwrite").parquet(target)
      }
    }
    n
  }

  private def writeFlat(next: Long, name: String, df: DataFrame,
                        n: Long): Long = {
    if (n > 0) {
      if (name == "derived") rememberSchema(name, df)
      // row-sized file count, never one-per-task (a 32-core fold would
      // spray a bench-scale derived table across 32 near-empty files)
      val k = flatFileCount(name, n)
      (if (k == 1) df.coalesce(1) else df.repartition(k))
        .write.mode("overwrite")
        .parquet(store.resolve(s"v$next/$name").toString)
    }
    n
  }

  private def finishVersion(next: Long, base: Long,
                            counts: Seq[(String, Long)],
                            key: Option[(String, Long)]): Unit =
    flipPointer(next, base, counts, keyTail(key))

  // ---- train (artifact generation boundary) --------------------------

  /** Train the artifacts on `corpus` and RESET the derived state (rows
    * derived under the previous artifacts are a dead generation):
    * version dirs before the new base become invisible and are
    * reclaimed. The caller re-feeds content through [[update]] —
    * batched or one-shot, both land on the same store. */
  def train(corpus: DataFrame): Long = {
    val t = trainOf.getOrElse(throw new IllegalStateException(
      s"DerivedState at $rootUri has no trainer (pure-append store)"))
    checkMeta()
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val arts = t(corpus).cpInto(cps)
    val v = installArtifacts(arts, expectDigest = None)
    cps.foreach(_.unpersist())
    v
  }

  /** TRAIN-ONCE-DISTRIBUTE: install another member's frozen artifact
    * frame as this store's new generation — the federation contract
    * for trained families ([[DerivedState.federatedDerived]] refuses to
    * merge members whose artifact digests differ; this is how members
    * come to agree: ONE member trains, every other adopts). Same reset
    * semantics as [[train]] — rows derived under the previous artifacts
    * are a dead generation; the caller re-feeds content. The installed
    * frame's digest is recomputed after the copy and must equal the
    * source's persisted digest (an end-to-end lossless-copy check), and
    * both stores must run the same derivation. */
  def adopt(from: DerivedState): Long = {
    require(trainOf.isDefined,
      s"DerivedState at $rootUri is pure-append — nothing to adopt")
    require(from.derivationFingerprint == derivationFingerprint,
      s"cannot adopt artifacts across derivations " +
        s"('${from.derivationFingerprint}' into '$derivationFingerprint')")
    val theirs = from.artifactDigest.getOrElse(throw new IllegalStateException(
      "source DerivedState has no trained artifacts to adopt"))
    checkMeta()
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val arts = from.artifacts().cpInto(cps)
    val v = installArtifacts(arts, expectDigest = Some(theirs))
    cps.foreach(_.unpersist())
    v
  }

  /** Shared generation-reset install for [[train]]/[[adopt]]: writes
    * the artifact frame + its digest as the new base version, drops
    * every prior version dir, sweeps orphans. */
  private def installArtifacts(arts: DataFrame,
                               expectDigest: Option[String]): Long = {
    val (cur, base, lastKey) = pointer
    val next = cur + 1
    val nArts = arts.count()
    require(nArts > 0, "trainOf produced an empty artifact frame")
    val digest = digestOf(arts)
    expectDigest.foreach(d => require(d == digest,
      s"adopted artifact frame digests to $digest, source says $d — " +
        "the copy is not the source's trained state"))
    arts.write.mode("overwrite")
      .parquet(store.resolve(s"v$next/artifacts").toString)
    store.writeAtomic(s"v$next/ARTDIGEST", digest)
    finishVersion(next, next, Seq("artifacts" -> nArts), lastKey)
    dropVersions(base, cur, next)
    next
  }

  // ---- update --------------------------------------------------------

  /** Fold one batch of keyed rows into the store: rows whose key the
    * index already holds are skipped (one bucket-pruned anti-join);
    * the rest derive against the frozen artifacts and append. */
  def update(batch: DataFrame): UpdateReport =
    update(batch, idempotencyKey = None).get

  /** Keyed [[update]] for exactly-once sinks (Structured Streaming
    * `foreachBatch` replays a micro-batch after a crash) — the
    * [[DedupState]] contract verbatim: a batch whose (scope, seq) key
    * has seq <= the last applied seq OF THE SAME SCOPE is SKIPPED
    * (returns None); the key rides the atomic CURRENT flip. seq must
    * be monotone per scope (a checkpoint's batchId is); scopes must
    * not contain whitespace. */
  def update(batch: DataFrame,
             idempotencyKey: Option[(String, Long)]): Option[UpdateReport] = {
    checkMeta()
    require(trainOf.isEmpty || currentVersion > 0,
      s"DerivedState at $rootUri requires train() before update()")
    val (cur, base, lastKey) = pointer
    (idempotencyKey, lastKey) match {
      case (Some((sc, seq)), Some((lsc, lseq))) if sc == lsc && seq <= lseq =>
        return None
      case _ => ()
    }
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    val keyed = batch.dropDuplicates(keyCol).cpInto(cps)
    val nBatchRows = keyed.count()
    val buckets = keyed.select(keyBucket(col(keyCol)).as("b")).distinct()
      .collect().toSeq.map(_.getInt(0))
    // a store with no keys yet (fresh, or freshly retrained) has no
    // persisted key schema — the prior-key side is empty by definition
    val priorKeys =
      if (storedSchema("keys").isEmpty) keyed.select(keyCol).limit(0)
      else keysTouching(buckets, cur).select(keyCol)
    val newRows = keyed
      .join(priorKeys, Seq(keyCol), "left_anti")
      .cpInto(cps)
    val nNewKeys = newRows.count()

    // the key-index write only needs newRows — it lands concurrently
    // with the derivation (the fold's expensive half); the MANIFEST
    // and pointer flip wait for both. ANY failure from here to the
    // counts waits the write out (suppressed), releases checkpoints,
    // and — on a store that had no committed keys yet — removes the
    // schema sentinel the eager write minted, so the empty-store
    // contract (`keys()` throws) survives a failed first fold; the
    // orphan v{next} dir is invisible (no MANIFEST) and overwritten
    // on retry.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val hadKeys = storedSchema("keys").nonEmpty
    val fKeys = Future(writeKeys(next,
      newRows.select(keyCol).withColumn("ver", lit(next)), nNewKeys))
    def failCleanup(t: Throwable): Nothing = {
      scala.util.Try(Await.result(fKeys, Duration.Inf))
      if (!hadKeys)
        scala.util.Try(store.deleteRecursive("schema/keys.json"))
      cps.synchronized(cps.toList)
        .foreach(c => scala.util.Try(c.unpersist()))
      throw t
    }
    val (counts, nDerived) =
      try {
        val (n, derivedDf) =
          if (nNewKeys == 0) (0L, None)
          else {
            val d = deriveOf(newRows, artifacts()).cpInto(cps)
            (d.count(), Some(d))
          }
        (Seq(
          "keys" -> Await.result(fKeys, Duration.Inf),
          "derived" -> derivedDf.map(writeFlat(next, "derived", _, n))
            .getOrElse(0L)), n)
      } catch { case t: Throwable => failCleanup(t) }
    finishVersion(next, base, counts, idempotencyKey.orElse(lastKey))
    cps.foreach(_.unpersist())
    // report the POST-compact version when auto-compaction fires:
    // compact() advances the base past `next`, so a caller using
    // report.version as an upTo bound would otherwise read an empty
    // union of deleted dirs
    val finalVersion =
      if (autoCompactEvery > 0 && next - base + 1 >= autoCompactEvery)
        compact()
      else next

    Some(UpdateReport(finalVersion, nBatchRows, nNewKeys, nDerived))
  }

  /** Squash all delta versions into one (carrying the artifacts
    * forward) and advance the base. */
  def compact(): Long = {
    val (cur, base, lastKey) = pointer
    if (cur == 0) return 0L
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // a table whose schema file was never written has never held a row
    // (empty batches / rowless derivations / train-only stores) — a
    // legitimate state compact must squash through, not throw on
    val kOpt = storedSchema("keys").map(_ => keys(cur).cpInto(cps))
    val dOpt = storedSchema("derived").map(_ => derived(cur).cpInto(cps))
    val nArts =
      if (manifest(base).getOrElse("artifacts", 0L) > 0) {
        val a = artifacts().cpInto(cps)
        val n = a.count()
        a.write.mode("overwrite")
          .parquet(store.resolve(s"v$next/artifacts").toString)
        // the digest identifies the trained VALUES, which a lossless
        // squash preserves — carry it with the frame
        artifactDigest.foreach(d => store.writeAtomic(s"v$next/ARTDIGEST", d))
        n
      } else 0L
    val counts = Seq(
      "keys" -> kOpt.map(k => writeKeys(next, k, k.count())).getOrElse(0L),
      "derived" -> dOpt.map(d => writeFlat(next, "derived", d, d.count()))
        .getOrElse(0L),
      "artifacts" -> nArts)
    finishVersion(next, next, counts, lastKey)
    cps.foreach(_.unpersist())
    dropVersions(base, cur, next)
    next
  }
}
