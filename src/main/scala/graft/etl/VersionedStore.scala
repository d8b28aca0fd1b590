package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.Store

/** The ONE copy of the versioned-parquet store machinery shared by
  * every incremental state store here — [[DedupState]], [[ContamState]]
  * and the federation stores ([[FedStoreBase]]): per-version delta dirs
  * under an atomic CURRENT pointer, per-version MANIFEST row counts
  * (skip-empty reads), physical partition columns on the corpus-sided
  * tables, the LSM write shape (partitioned base, flat batch-sized
  * deltas), the compact-squash/orphan-sweep discipline, and the
  * member-delta window reads the federation folds consume.
  *
  * Layout contract (shared verbatim by every subclass):
  * {{{
  *   root/CURRENT            "cur base tail…" — pointer (atomic write)
  *   root/META               store invariants (subclass-defined line)
  *   root/v{N}/MANIFEST      "table=rows,…" per version
  *   root/v{N}/<table>[/p=…] parquet delta of version N
  * }}}
  *
  * The pointer's first two tokens are (current version, read base);
  * the TAIL is subclass-owned — [[DedupState]] rides its (scope, seq)
  * idempotency key there, the federation stores their per-member fold
  * watermarks. Subclasses that cannot tolerate the lenient default
  * parse (a pre-base-format pointer would misread its first tail token
  * as the base) override [[validatePointer]] to refuse loudly.
  *
  * Crash contract, everywhere: data dirs → MANIFEST → CURRENT. A crash
  * before the flip leaves an orphan v{N} dir readers never see (the
  * pointer bounds every read) and the retry overwrites; a crash between
  * a compact's flip and its delete loop strands dirs BELOW the base,
  * which [[sweepOrphans]] reclaims on the next compact.
  *
  * This base exists because the machinery was triplicated across the
  * three store files and boundary fixes had to land in every copy (the
  * round-15 compact-boundary fix did) — `grep 'from < base'` now hits
  * exactly this file.
  */
private[graft] object VersionedStore {
  /** Target rows per FLAT output file: a sub-cutoff write lands as
    * ceil(n / FlatFileRows) files instead of one-per-task (a 32-core
    * fold otherwise sprays a 100k-row table across 32 near-empty
    * files — the small-files failure mode, paid again by every
    * reader's listing and footer pass). At ~50-100 B/row this sizes
    * flat files in the tens-of-MB range, splittable by row group. */
  private[etl] val FlatFileRows = 1L << 20

  /** Default average rows per partition bucket below which a write
    * stays FLAT (see [[VersionedStore.partitionCutoff]]). */
  private[etl] val DefaultMinBucketRows = 8192L
  /** The ONE lenient parse of a CURRENT pointer's tokens — (current
    * version, read base, tail): base defaults to 1 for a
    * pre-base-format pointer ("cur" only). Exposed (spark-free) so
    * metadata-only consumers (the admin console's store-status) read
    * the pointer through the same rules as the stores themselves
    * instead of re-implementing them. */
  private[graft] def parsePointer(
      tokens: Seq[String]): (Long, Long, Seq[String]) =
    (tokens(0).toLong,
      if (tokens.length > 1) tokens(1).toLong else 1L, tokens.drop(2))
}

private[etl] abstract class VersionedStore(
    protected val spark: SparkSession,
    protected val rootUri: String) {

  protected val store = new Store(rootUri, new Configuration())

  /** This store's root URI — its identity for views, daemons, and the
    * federation stores' per-member watermark keys. */
  def root: String = rootUri

  /** Raw CURRENT tokens, when the pointer exists — subclass validation
    * hooks and format-sensitive parsers read these. */
  protected final def pointerRaw: Option[Seq[String]] =
    store.readString("CURRENT").map { s =>
      val p = s.trim.split("\\s+").toSeq
      validatePointer(p)
      p
    }

  /** Validate the raw pointer tokens on EVERY parse (so format
    * corruption fails the first read, not a later fold) — default
    * accepts anything the lenient parse below handles. */
  protected def validatePointer(tokens: Seq[String]): Unit = ()

  /** (current version, read base, tail tokens) — the companion's
    * [[VersionedStore.parsePointer]] rules; (0, 1, empty) for a store
    * with no pointer yet. */
  protected final def pointerParts: (Long, Long, Seq[String]) =
    pointerRaw.map(VersionedStore.parsePointer)
      .getOrElse((0L, 1L, Seq.empty))

  def currentVersion: Long = pointerParts._1

  /** [[pointerParts]] with the tail read as the (scope, seq)
    * idempotency key the keyed-update stores ride there — ONE parse of
    * that tail contract (a format change lands here, not per store). */
  protected final def keyedPointer: (Long, Long, Option[(String, Long)]) = {
    val (cur, base, tail) = pointerParts
    (cur, base,
      if (tail.length > 1) Some((tail(0), tail(1).toLong)) else None)
  }

  /** The (scope, seq) tail rendered back to pointer tokens. */
  protected final def keyTail(key: Option[(String, Long)]): Seq[String] =
    key.map { case (sc, seq) => Seq(sc, seq.toString) }.getOrElse(Seq.empty)

  /** Number of version dirs a reader currently unions — bounded by the
    * subclass's `autoCompactEvery` cadence when set. */
  def liveVersionSpan: Long = {
    val (cur, base, _) = pointerParts
    if (cur == 0) 0L else cur - base + 1
  }

  /** Physical partition column per table (directory-level, so index
    * scans prune to a batch's partitions); tables absent here write
    * flat. */
  protected def partitionField: Map[String, (StructField, Column)]

  /** Distinct values the table's partition column can take (the hash
    * modulus / prefix domain) — sizes [[partitionCutoff]]. */
  protected def partitionFanout(name: String): Int = 256

  /** Row count at which a table's write fans into partition DIRS: the
    * dir layout pays for pruning only when the average bucket holds a
    * file's worth of rows — below that, 256 near-empty dirs cost every
    * reader a 256-file listing + footer pass for kilobytes of data
    * (measured: the sf0.1 fed-winnow store held 3,256 files for 31 MB,
    * and the store-read queries spent more time listing than
    * computing). The cutoff DERIVES from the table's fanout × a
    * per-bucket row floor instead of a flat constant, so the layout is
    * scale-adaptive: corpus-sized builds at production scale cross it
    * immediately, bench-scale fixtures stay flat (pruned readers
    * filter the partition column as data identically — the contract
    * StatePartitionSpec pins). The floor is conf-overridable
    * (`graft.store.partitionMinBucketRows`) so layout tests exercise
    * the partitioned regime without corpus-sized fixtures. */
  protected final def partitionCutoff(name: String): Long =
    spark.conf.get("graft.store.partitionMinBucketRows",
      VersionedStore.DefaultMinBucketRows.toString).toLong *
      partitionFanout(name)

  /** ceil(n / FlatFileRows), capped at the fanout — the flat write's
    * file count. */
  protected final def flatFileCount(name: String, n: Long): Int =
    math.min((n - 1) / VersionedStore.FlatFileRows + 1,
      partitionFanout(name).toLong).toInt

  // concurrent: fold stages construct index-read PLANS (diskFrame →
  // manifest) on executor-context threads while the main thread does
  // the same — a TrieMap makes the cache race-free (a doubly-evaluated
  // read inserts the same value, harmlessly)
  private val manifests =
    scala.collection.concurrent.TrieMap.empty[Long, Map[String, Long]]
  protected final def manifest(v: Long): Map[String, Long] =
    manifests.getOrElseUpdate(v,
      store.readString(s"v$v/MANIFEST").map(_.trim.split(",").collect {
        case kv if kv.contains("=") =>
          val Array(n, c) = kv.split("=", 2); n -> c.toLong
      }.toMap).getOrElse(Map.empty))

  protected final def dropManifest(v: Long): Unit = manifests.remove(v)

  protected final def emptyFrame(schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)

  private def fullSchema(name: String, schema: StructType): StructType =
    partitionField.get(name)
      .map(f => StructType(schema.fields :+ f._1)).getOrElse(schema)

  /** Union of a table's non-empty version dirs in `versions`, read
    * with `schema` AS GIVEN (callers whose schema already carries the
    * partition column — dynamic-schema stores — pass it whole) — one
    * read per version dir, unioned: a single multi-path read trips
    * partition discovery ("conflicting directory structures" — the
    * version dirs share no partitioned base), while per-dir reads each
    * discover their own partition dirs and Catalyst pushes partition
    * filters through the Union into every child scan. */
  protected final def unionReadAs(name: String, schema: StructType,
                                  versions: Seq[Long]): DataFrame = {
    val paths = versions
      .filter(v => manifest(v).getOrElse(name, 0L) > 0)
      .map(v => store.resolve(s"v$v/$name").toString)
    if (paths.isEmpty) emptyFrame(schema)
    else paths.map(p => spark.read.schema(schema).parquet(p))
      .reduce(_.unionByName(_))
  }

  /** [[unionReadAs]] with the table's partition column appended to the
    * logical schema (the static-schema stores' read shape). */
  private def unionRead(name: String, schema: StructType,
                        versions: Seq[Long]): DataFrame =
    unionReadAs(name, fullSchema(name, schema), versions)

  /** Union of a table's per-version deltas over [base, upTo], WITH the
    * table's partition column when it has one. */
  protected final def diskFrame(name: String, schema: StructType,
                                upTo: Long): DataFrame = {
    val (_, base, _) = pointerParts
    unionRead(name, schema, base to upTo)
  }

  /** [[diskFrame]] with the partition column dropped — the logical
    * schema every reader and the update math see. */
  protected final def tableFrame(name: String, schema: StructType,
                                 upTo: Long): DataFrame = {
    val df = diskFrame(name, schema, upTo)
    partitionField.get(name).map(f => df.drop(f._1.name)).getOrElse(df)
  }

  /** Partition-pruned read: the DISK frame filtered on its partition
    * column first, so the parquet scan's partitionFilters prune to the
    * touched partitions — the 100 TB contract: a daily batch reads the
    * index partitions it touches, not the corpus (StatePartitionSpec
    * asserts files-read ∝ touched partitions). */
  protected final def touching(name: String, schema: StructType,
                               values: Seq[Any], upTo: Long): DataFrame = {
    val f = partitionField(name)._1
    diskFrame(name, schema, upTo)
      .filter(col(f.name).isin(values: _*)).drop(f.name)
  }

  /** Rows a table gained in (from, upTo], read DIRECTLY from the
    * version dirs — ∝ the delta by construction — when every dir in
    * the window is a true delta; None when the window reaches back
    * past a compact squash (the squash dir sits AT `base` whenever
    * base > 1 and holds the FULL corpus, so any window with
    * from < base — INCLUDING from == base - 1, where the squash itself
    * is the window — must take the caller's exact fallback or it would
    * re-absorb the whole corpus as a "delta").
    *
    * Mid-fold compact guard: a federation fold pins a member version,
    * then reads its deltas — if the member compacts PAST the pinned
    * version in between (new base > upTo), the fallback's [base, upTo]
    * union is EMPTY, so the fold would silently absorb nothing and
    * advance its watermark over rows it never saw, permanently. That
    * window must fail LOUDLY for a retry at the member's new version
    * instead. */
  protected final def deltaDirs(name: String, schema: StructType,
                                from: Long, upTo: Long): Option[DataFrame] = {
    val (cur, base, _) = pointerParts
    if (cur > 0 && from < upTo)
      require(upTo >= base,
        s"delta window ($from, $upTo] of '$name' at $rootUri lies " +
          s"entirely below the compacted read base $base — the store " +
          "compacted past the pinned window; re-pin and retry the fold")
    if (base > 1 && from < base && from < upTo) None
    else Some {
      val df = unionRead(name, schema, from + 1 to upTo)
      partitionField.get(name).map(f => df.drop(f._1.name)).getOrElse(df)
    }
  }

  /** Write one table of version `next`: writes past the table's
    * [[partitionCutoff]] gain their partition column and repartition
    * BY it first, so each partition dir lands as one file per delta
    * instead of one per writing task. Smaller writes land FLAT in
    * row-sized files ([[flatFileCount]]) carrying the partition column
    * as data (the LSM shape: partitioned base, flat batch-sized
    * deltas — fanning a 500-row micro-batch into 256 near-empty dirs
    * is the small-files failure mode, measured 4.5× on the 100× fresh-
    * fold probe and again on the sf0.1 store-read queries; the pruned
    * readers' filter applies to the data column identically). */
  protected final def writeTable(next: Long, name: String, df: DataFrame,
                                 n: Long): Long = {
    if (n > 0) {
      val target = store.resolve(s"v$next/$name").toString
      def sized(d: DataFrame, key: Option[Column]): DataFrame = {
        val k = flatFileCount(name, n)
        if (k == 1) d.coalesce(1)
        else key.map(d.repartition(k, _)).getOrElse(d.repartition(k))
      }
      partitionField.get(name) match {
        case Some((f, expr)) if n >= partitionCutoff(name) =>
          df.withColumn(f.name, expr)
            .repartition(col(f.name))
            .write.mode("overwrite").partitionBy(f.name).parquet(target)
        case Some((f, expr)) =>
          sized(df.withColumn(f.name, expr), Some(col(f.name)))
            .write.mode("overwrite").parquet(target)
        case None =>
          sized(df, None).write.mode("overwrite").parquet(target)
      }
    }
    n
  }

  /** Flip to version `next` with the given read base and pointer tail:
    * MANIFEST → CURRENT, both atomic — the crash contract's last two
    * steps (data dirs already landed). */
  protected final def flipPointer(next: Long, base: Long,
                                  counts: Seq[(String, Long)],
                                  tail: Seq[String]): Unit = {
    store.writeAtomic(s"v$next/MANIFEST",
      counts.map { case (n, c) => s"$n=$c" }.mkString(","))
    manifests.remove(next)
    store.writeAtomic("CURRENT",
      (Seq(next.toString, base.toString) ++ tail).mkString(" "))
  }

  /** Delete the squashed version dirs [base, cur] after a compact's
    * flip, then reclaim any dirs stranded below the new base by an
    * EARLIER crash (invisible by the pointer contract, so always
    * safe). One root listing per compact. */
  protected final def dropVersions(base: Long, cur: Long,
                                   newBase: Long): Unit = {
    (base to cur).foreach { v =>
      store.deleteRecursive(s"v$v"); manifests.remove(v)
    }
    store.listNames("").foreach { name =>
      if (name.length > 1 && name.head == 'v' && name.tail.forall(_.isDigit)
          && name.tail.toLong < newBase) {
        store.deleteRecursive(name)
        manifests.remove(name.tail.toLong)
      }
    }
  }

  /** Check the store's META invariant line on reopen, writing it on
    * first use; `normalizeStored` lets a subclass migrate a
    * pre-field-format stored line before comparing (schema evolution
    * by normalize-on-read, never hard equality on the raw string). */
  protected final def checkOrWriteMeta(metaLine: String,
      normalizeStored: String => String = identity)(
      mismatch: (String, String) => String): Unit =
    store.readString("META") match {
      case Some(m) =>
        val stored = normalizeStored(m.trim)
        require(stored == metaLine, mismatch(stored, metaLine))
      case None => store.writeAtomic("META", metaLine)
    }

  /** The distinct partition values of `c` over `df` — driver-side but
    * BOUNDED by the partition-value domain (≤ 256), like the engine's
    * other bounded-bucket collects. */
  private[etl] final def partitionValues[T](df: DataFrame,
                                            c: Column): Seq[T] =
    df.select(c.as("p")).distinct().collect()
      .toSeq.map(_.getAs[T]("p"))
}
