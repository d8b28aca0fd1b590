package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The incremental stores' PHYSICAL layout contract (the 100 TB
  * maintenance-path story, made checkable):
  *
  *   1. deltas land partitioned on disk — `groups`/`texts` by digest
  *      prefix (`kp=` dirs), `bands`/`pairs`/`postings` by hash bucket
  *      (`bp=`/`gp=` dirs);
  *   2. the update path's corpus-sided index scans PRUNE — their
  *      parquet scans carry partition filters and read only the files
  *      of the batch's touched partitions, not the corpus
  *      (files-read ∝ touched partitions);
  *   3. pruned reads are exact — they return precisely the rows whose
  *      key falls in the requested partitions;
  *   4. ContamState self-compacts on the `autoCompactEvery` cadence,
  *      keeping the reader's delta-union width bounded under a long
  *      update schedule (the DedupState symmetry).
  */
class StatePartitionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("state-partition-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // exercise the partitioned regime without corpus-sized fixtures:
      // 32 rows/bucket × 256 buckets = the spec corpus crosses the
      // cutoff exactly as the old flat 8192-row threshold did
      .config("graft.store.partitionMinBucketRows", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(prefix: String): java.nio.file.Path =
    Files.createTempDirectory(prefix)

  /** Every FileSourceScanExec in the executed plan (through AQE and
    * query-stage wrappers). */
  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** (files the scans selected after pruning, files on disk under the
    * scans' locations). Forces execution first so `selectedPartitions`
    * reflects the real listing. */
  private def filesReadVsTotal(df: DataFrame): (Long, Long) = {
    df.collect()
    val ss = scans(df)
    assert(ss.nonEmpty, "expected at least one parquet scan")
    val read = ss.map(_.metrics("numFiles").value).sum
    val total = ss.map(_.relation.location.inputFiles.length.toLong).sum
    (read, total)
  }

  /** Cheap deterministic banding for layout tests: bucket = first 3
    * chars (partitioning/pruning is independent of the banding math —
    * DedupStateSpec covers real MinHash banding on this layout). */
  private val prefixBands: DataFrame => DataFrame = docs =>
    docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))

  private def fixtureDocs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

  /** A corpus big enough to cross [[VersionedStore.partitionCutoff]]
    * at the spec's lowered per-bucket floor, so its init build lands
    * physically partitioned (distinct synthetic texts: doc_id digest
    * strings). */
  private def bigDocs(n: Long): DataFrame =
    spark.range(0, n).select(col("id").as("doc_id"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1000000L).cast("string"))).as("text"))

  private def partDirs(root: java.nio.file.Path, rel: String,
                       prefix: String): Seq[String] = {
    val d = root.resolve(rel).toFile
    if (!d.exists()) Nil
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith(prefix))
  }

  test("corpus-sized writes land partitioned; batch-sized deltas stay flat") {
    val root = tmpRoot("statepart-layout-")
    val st = new DedupState(spark, root.toString, prefixBands)
    st.update(bigDocs(12000).localCheckpoint()) // > partition cutoff
    st.update(bigDocs(12050).filter(col("doc_id") >= 12000)
      .localCheckpoint()) // 50-row delta

    val kpDirs = partDirs(root, "v1/groups", "kp=")
    val bpDirs = partDirs(root, "v1/bands", "bp=")
    assert(kpDirs.size > 200,
      s"expected ~256 digest-prefix dirs, got ${kpDirs.size}")
    assert(bpDirs.nonEmpty)
    // one file per partition dir per delta (repartition-by-partition-
    // column before write), not one per writer task
    val filesInFirst = root.resolve(s"v1/groups/${kpDirs.head}").toFile
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesInFirst === 1)
    // the small delta wrote ONE flat file, not 256 near-empty dirs
    // (the 100x fresh-fold probe measured that fan-out at 4.5x)
    assert(partDirs(root, "v2/groups", "kp=").isEmpty)
    val v2Files = root.resolve("v2/groups").toFile
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(v2Files === 1)

    // the reader sees the logical schema (partition column dropped)
    // across the mixed partitioned+flat history
    assert(st.seenKeys().columns.toSeq === Seq("k", "rid", "ver"))
    assert(st.bands().columns.toSeq === Seq("rid", "bkey"))
    assert(st.seenKeys().count() === 12050L)
  }

  test("DedupState pruned scans read only the touched partitions, exactly") {
    val root = tmpRoot("statepart-prune-")
    val st = new DedupState(spark, root.toString, prefixBands)
    st.update(bigDocs(12000).localCheckpoint())
    st.update(bigDocs(24000).filter(col("doc_id") >= 12000).localCheckpoint())
    val cur = st.currentVersion

    // --- key index: one digest prefix out of ~256 ---
    val somePrefix = st.seenKeys()
      .select(substring(col("k"), 1, 2).as("p")).limit(1)
      .collect().head.getString(0)
    val pruned = st.seenKeysTouching(Seq(somePrefix), cur)
    val (kRead, kTotal) = filesReadVsTotal(pruned)
    assert(kTotal > 400, s"layout degenerate: only $kTotal key files")
    assert(kRead <= 2L, // ≤ 1 file per partitioned delta for one prefix
      s"key scan read $kRead of $kTotal files for one prefix")
    assert(scans(pruned).forall(_.partitionFilters.nonEmpty),
      "key-index scan carries no partition filters")
    // pruned read is exact
    val expect = st.seenKeys().filter(substring(col("k"), 1, 2) === somePrefix)
      .collect().map(_.getString(0)).toSet
    assert(pruned.collect().map(_.getString(0)).toSet === expect)

    // --- band index: a strict subset of the hash buckets ---
    val allBuckets = st.bands()
      .select(DedupState.bandBucket(col("bkey")).as("bp")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(allBuckets.size > 4)
    val some = allBuckets.take(2)
    val bPruned = st.bandsTouching(some, cur)
    val (bRead, bTotal) = filesReadVsTotal(bPruned)
    assert(bRead < bTotal,
      s"band scan read all $bTotal files despite bucket filter")
    assert(bRead <= 2L * some.size)
    val bExpect = st.bands()
      .filter(DedupState.bandBucket(col("bkey")).isin(some: _*))
      .count()
    assert(bPruned.count() === bExpect)
  }

  test("ContamState pruned scans read only the touched partitions") {
    val root = tmpRoot("statepart-contam-")
    val grams: DataFrame => DataFrame = texts =>
      texts.filter(length(col("text")) >= 8)
        .select(col("k"), col("text"),
          explode(sequence(lit(1), least(length(col("text")) - 7, lit(64)),
            lit(8))).as("p"))
        .select(col("k"), expr("substring(text, p, 8)").as("g"))
        .distinct()
    val st = new ContamState(spark, root.toString, grams, dfCap = 64L)
    st.update(bigDocs(9000).localCheckpoint())
    st.update(bigDocs(9050).filter(col("doc_id") >= 9000).localCheckpoint())
    val cur = st.currentVersion

    assert(partDirs(root, "v1/texts", "kp=").size > 200)
    assert(partDirs(root, "v1/postings", "gp=").size > 30)
    // the small second delta stayed flat
    assert(partDirs(root, "v2/texts", "kp=").isEmpty)

    val allBuckets = st.postings()
      .select(ContamState.gramBucket(col("g")).as("gp")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val some = allBuckets.take(2)
    val pruned = st.postingsTouching(some, cur)
    val (read, total) = filesReadVsTotal(pruned)
    assert(total > 30, s"layout degenerate: only $total posting files")
    // <= 1 partitioned file per bucket + the one flat delta file
    assert(read <= some.size + 1L,
      s"postings scan read $read of $total files for ${some.size} buckets")
    // every PARTITIONED scan prunes at the directory level; the flat
    // batch-sized delta carries the same predicate as a data filter
    assert(scans(pruned).filter(_.relation.partitionSchema.nonEmpty)
      .forall(_.partitionFilters.nonEmpty))
    val expect = st.postings()
      .filter(ContamState.gramBucket(col("g")).isin(some: _*)).count()
    assert(pruned.count() === expect)
  }

  test("DerivedState key index prunes to the batch's buckets") {
    val root = tmpRoot("statepart-derived-")
    val derive: (DataFrame, DataFrame) => DataFrame = (rows, _) =>
      rows.select(col("k"), length(col("text")).as("len"))
    val st = new DerivedState(spark, root.toString, "len", "k", derive)
    val d = bigDocs(12000).localCheckpoint()
      .select(md5(col("text").cast("binary")).as("k"), col("text"))
    st.update(d)
    st.update(bigDocs(12050).filter(col("doc_id") >= 12000)
      .select(md5(col("text").cast("binary")).as("k"), col("text")))

    assert(partDirs(root, "v1/keys", "kb=").size > 200)
    assert(partDirs(root, "v2/keys", "kb=").isEmpty) // flat small delta
    val allBuckets = st.keys()
      .select(DerivedState.keyBucket(col("k")).as("kb")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val some = allBuckets.take(2)
    val pruned = st.keysTouching(some, st.currentVersion)
    val (read, total) = filesReadVsTotal(pruned)
    assert(total > 200, s"layout degenerate: only $total key files")
    assert(read <= some.size + 1L,
      s"key scan read $read of $total files for ${some.size} buckets")
    val expect = st.keys()
      .filter(DerivedState.keyBucket(col("k")).isin(some: _*)).count()
    assert(pruned.count() === expect)
  }

  test("ContamState self-compacts on cadence: version span stays bounded") {
    val root = tmpRoot("statepart-autocompact-")
    val grams: DataFrame => DataFrame = texts =>
      texts.select(col("k"), substring(col("text"), 1, 4).as("g")).distinct()
    val st = new ContamState(spark, root.toString, grams, dfCap = 1000L,
      autoCompactEvery = 3)
    val d = fixtureDocs.localCheckpoint()
    (0 to 4).foreach { i =>
      st.update(d.filter(col("doc_id") % 5 === i))
      assert(st.liveVersionSpan <= 3,
        s"span ${st.liveVersionSpan} after update $i — compaction not firing")
    }
    // state unchanged by the squashes: equals a one-shot build
    val oneShot = new ContamState(spark,
      tmpRoot("statepart-oneshot-").toString, grams, dfCap = 1000L)
    oneShot.update(d)
    val got = st.livePostings().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = oneShot.livePostings().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === want)
  }
}
