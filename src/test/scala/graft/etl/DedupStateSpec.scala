package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The incremental dedup store's contract:
  *
  *   1. batch-schedule invariance — any split of a corpus into update
  *      batches yields the SAME components as a one-shot build (labels
  *      compared as partitions: rep ids depend on arrival order);
  *   2. retroactive bucket-cap consistency — a bucket crossing the cap
  *      mid-history drops its past pairs and only the affected
  *      components recompute, landing on the one-shot-capped result;
  *   3. cost proportionality — an update's signature work tracks the
  *      batch's NEW distinct content, never the corpus;
  *   4. durability mechanics — orphan version dirs are invisible,
  *      compact preserves state and arrival versions.
  */
class DedupStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("dedup-state-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(): String =
    Files.createTempDirectory("dedup-state-spec-").toString

  /** Label-independent view of a clustering: each doc keyed by the
    * minimum content key of its cluster. Two states agree iff their
    * partitions agree, whatever rep ids arrival order produced. */
  private def partitionOf(st: DedupState): Set[(Long, String)] = {
    val dc = st.docClusters()
    val m = st.members().select(col("doc_id"), col("k"))
    val rep = dc.join(m, "doc_id")
      .groupBy("cluster").agg(min("k").as("ck"))
    dc.join(rep, "cluster")
      .select(col("doc_id"), col("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  /** Trivial surgical banding for cap tests: bucket = first 3 chars. */
  private val prefixBands: DataFrame => DataFrame = docs =>
    docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))

  private def fixtureDocs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

  test("incremental batches equal one-shot (real MinHash banding)") {
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val d = fixtureDocs.localCheckpoint()

    val oneShot = new DedupState(spark, tmpRoot(), bandsOf)
    oneShot.update(d)

    val incr = new DedupState(spark, tmpRoot(), bandsOf)
    // doc_id % 3 order: first-seen rep ids deliberately differ from the
    // global min, so the comparison would catch label-identity leaks
    (0 to 2).foreach(i => incr.update(d.filter(col("doc_id") % 3 === i)))

    assert(incr.currentVersion === 3L)
    assert(partitionOf(incr) === partitionOf(oneShot))
  }

  test("bucket cap drops retroactively: components match one-shot") {
    // bucket "AAA": 4 members at v1 (under cap 5) pair up; 3 more at v2
    // push it to 7 > cap — the one-shot build emits NO pairs for it, so
    // the incremental state must unwind v1's pairs and split the
    // component back apart. Bucket "BBB" stays under cap throughout and
    // must keep its pairs through the surgery.
    def doc(i: Long, t: String) = (i, t)
    val v1 = Seq(
      doc(1, "AAA one"), doc(2, "AAA two"), doc(3, "AAA three"),
      doc(4, "AAA four"), doc(10, "BBB ten"), doc(11, "BBB eleven"))
    val v2 = Seq(
      doc(5, "AAA five"), doc(6, "AAA six"), doc(7, "AAA seven"),
      doc(12, "BBB twelve"))
    val ss = spark; import ss.implicits._
    val cap = Some(5L)

    val incr = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val r1 = incr.update(v1.toDF("doc_id", "text"))
    assert(r1.nNewPairs === (6L + 1L), "4-choose-2 in AAA + 1 in BBB")
    val r2 = incr.update(v2.toDF("doc_id", "text"))
    assert(r2.nDroppedBuckets === 1L, "AAA crossed the cap")
    assert(r2.nRelabeled > 0L, "AAA members split back to singletons")

    val oneShot = new DedupState(spark, tmpRoot(), prefixBands, cap)
    oneShot.update((v1 ++ v2).toDF("doc_id", "text"))
    assert(partitionOf(incr) === partitionOf(oneShot))

    // the BBB component survived
    val bbbClusters = incr.docClusters()
      .filter(col("doc_id").isin(10L, 11L, 12L))
      .select("cluster").distinct().count()
    assert(bbbClusters === 1L)
    // and AAA members are 7 singletons
    val aaaClusters = incr.docClusters()
      .filter(col("doc_id") <= 7L)
      .select("cluster").distinct().count()
    assert(aaaClusters === 7L)
  }

  test("bucket cap with REAL MinHash banding: batched equals one-shot") {
    // the fixture corpus recombines a small phrase pool, so real LSH
    // buckets grow well past a tiny cap as batches accumulate — the
    // retroactive surgery must track the one-shot capped build through
    // genuine signature collisions, not only the surgical prefix bands
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val d = fixtureDocs.localCheckpoint()
    val cap = Some(2L)
    val incr = new DedupState(spark, tmpRoot(), bandsOf, cap)
    (0 to 2).foreach(i => incr.update(d.filter(col("doc_id") % 3 === i)))
    val oneShot = new DedupState(spark, tmpRoot(), bandsOf, cap)
    oneShot.update(d)
    assert(partitionOf(incr) === partitionOf(oneShot))
    // the cap genuinely fired across batch boundaries
    assert(incr.dropped().count() > 0,
      "fixture LSH buckets must cross cap=2 for this test to bite")
  }

  /** Label-independent view of the stored pair similarities: each live
    * pair keyed by its endpoints' CONTENT keys (rep ids depend on
    * arrival order; the Jaccard is a pure content function). */
  private def pairStatsOf(st: DedupState): Set[(String, String, Long, Long)] = {
    val k = st.seenKeys().select("k", "rid")
    st.livePairStats()
      .join(k.select(col("rid").as("a"), col("k").as("ka")), "a")
      .join(k.select(col("rid").as("b"), col("k").as("kb")), "b")
      .select(least(col("ka"), col("kb")), greatest(col("ka"), col("kb")),
        col("jac_num"), col("jac_den"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("pair-level Jaccard: batched equals one-shot, and equals a direct" +
      " recompute (real MinHash banding + 4-gram features)") {
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val gramsOf = graft.queries.EtlQueries.gram4Of _
    val d = fixtureDocs.localCheckpoint()

    val oneShot = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf))
    val r = oneShot.update(d)
    assert(r.nGramRows > 0L, "the fixture must produce gram features")

    val incr = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf))
    (0 to 2).foreach(i => incr.update(d.filter(col("doc_id") % 3 === i)))

    // schedule invariance of the STORED similarity attributes: any
    // batch split lands on the same (content, content) → (num, den)
    // map — new×old pairs price their old endpoint from the persisted
    // feats index, so this proves that read path too
    val incrStats = pairStatsOf(incr)
    assert(incrStats === pairStatsOf(oneShot))
    assert(incrStats.nonEmpty)

    // and the stored values are the TRUTH: recompute one pair's
    // Jaccard directly from the two texts
    val k = incr.seenKeys().select("k", "rid")
    val texts = d.withColumn("k", md5(col("text").cast("binary")))
      .select("k", "text").dropDuplicates("k")
    val (ka, kb, num, den) = incrStats.head
    val Seq(ta, tb) = Seq(ka, kb).map(kk =>
      texts.filter(col("k") === kk).head().getString(1))
    // mirrors gram4Of: stride-2 positions capped at MaxPos = 2048
    def grams(t: String): Set[String] =
      (1 to math.min(t.length - 3, 2048) by 2).map(p =>
        t.substring(p - 1, p + 3)).toSet
    assert(num === (grams(ta) & grams(tb)).size.toLong)
    assert(den === (grams(ta) | grams(tb)).size.toLong)
    // fsizes carry the per-rep set sizes the intra expansion reads
    val sz = incr.featSizes().join(k.filter(col("k") === ka), "rid")
      .head().getAs[Long]("n")
    assert(sz === grams(ta).size.toLong)
  }

  test("pair-level Jaccard dies retroactively with capped buckets") {
    val ss = spark; import ss.implicits._
    val gramsOf = graft.queries.EtlQueries.gram4Of _
    val cap = Some(3L)
    val st = new DedupState(spark, tmpRoot(), prefixBands, cap,
      gramsOf = Some(gramsOf))
    st.update(Seq((1L, "AAA one"), (2L, "AAA two"), (10L, "BBB ten"),
      (11L, "BBB eleven")).toDF("doc_id", "text"))
    assert(st.livePairStats().count() === 2L)
    // AAA crosses cap=3 → its pair row (and stored jac) dies; BBB lives
    st.update(Seq((3L, "AAA three"), (4L, "AAA four"))
      .toDF("doc_id", "text"))
    val live = st.livePairStats().collect()
    assert(live.length === 1L)
    assert(live.head.getLong(0) === 10L && live.head.getLong(1) === 11L)
    // the surviving pair's jac is intact and non-null
    assert(!live.head.isNullAt(2) && !live.head.isNullAt(3))
  }

  test("weighted features + pair admission: the stored score is the exact" +
      " fixed-point dot; the threshold gates edges AND clustering") {
    val ss = spark; import ss.implicits._
    // three 2-d vectors in one shared band bucket: (1,2) parallel
    // (cos = 1), 3 orthogonal to both (cos = 0) — only (1,2) may pass
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)))
    val bandsOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      src => src.select(col("doc_id"), lit("one").as("bkey"))
    val gramsOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      src => src
        .select(col("doc_id"), posexplode(col("text")).as(Seq("i", "f")))
        .select(col("doc_id"), col("i").cast("string").as("g"),
          round(col("f").cast("double") * 1000000L, 0).cast("long").as("w"))
    val keep = (col("jac_num").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))) >= 0.5
    val st = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf), contentCol = "embedding",
      keyOf = c => md5(concat_ws(",",
        transform(c, x => x.cast("string"))).cast("binary")),
      pairKeep = Some(keep))
    val d = vecs.toDF("doc_id", "embedding")
    st.update(d.filter(col("doc_id") <= 2))
    st.update(d.filter(col("doc_id") > 2)) // new×old pairing path
    // only the parallel pair is ADMITTED, with the exact integer dot
    val pairs = st.livePairStats().collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getLong(2) === 2L * 1000000L * 1000000L)
    // fsizes carry the squared fixed-point norms
    val norms = st.featSizes().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(norms(1L) === 1000000L * 1000000L)
    assert(norms(2L) === 4L * 1000000L * 1000000L)
    // the clustering follows the ADMITTED edge set, not the bucket:
    // {1,2} share a component, 3 is a singleton despite co-banding
    val dc = st.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dc(1L) === dc(2L))
    assert(dc(3L) !== dc(1L))
  }

  test("livePairCounts: co-occupancy multiplicity folds and un-counts" +
      " with the cap (the winnow-match contract)") {
    val ss = spark; import ss.implicits._
    // one bucket per word; d1/d2 share {x, y}, d3 shares only {x}
    val wordBands: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      src => src.select(col("doc_id"),
        explode(split(col("text"), " ")).as("bkey"))
    val d = Seq((1L, "x y z"), (2L, "x y w"), (3L, "x q r"))
      .toDF("doc_id", "text").localCheckpoint()
    def counts(st: DedupState): Map[(Long, Long), Long] =
      st.livePairCounts().collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    // incremental: x is live at the first fold (df 2 = cap), crosses
    // the cap when d3 arrives — (1,2)'s x-row must un-count, leaving
    // the y co-occupancy; (1,3)/(2,3) were only ever justified by the
    // dead bucket and must be absent
    val st = new DedupState(spark, tmpRoot(), wordBands, Some(2L))
    st.update(d.filter(col("doc_id") <= 2))
    assert(counts(st) === Map((1L, 2L) -> 2L))
    st.update(d.filter(col("doc_id") === 3))
    assert(counts(st) === Map((1L, 2L) -> 1L))
    // one-shot equals the incremental fold
    val one = new DedupState(spark, tmpRoot(), wordBands, Some(2L))
    one.update(d)
    assert(counts(one) === counts(st))
  }

  test("gram-attribution mismatch on reopen throws (META invariant)") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val st = new DedupState(spark, root, prefixBands,
      gramsOf = Some(graft.queries.EtlQueries.gram4Of _))
    st.update(Seq((1L, "AAA xxxx")).toDF("doc_id", "text"))
    val bad = new DedupState(spark, root, prefixBands)
    val e = intercept[IllegalArgumentException] {
      bad.update(Seq((2L, "AAA yyyy")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("gram attribution"))
  }

  test("pinned keepIdentity survives a predicate-rendering change " +
      "(Spark-upgrade reopen); a dropped identity still refuses") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val gramsOf: DataFrame => DataFrame = src => src
      .select(col("doc_id"), explode(split(col("text"), " ")).as("g"))
      .distinct()
    def mk(keep: org.apache.spark.sql.Column) =
      new DedupState(spark, root, prefixBands, gramsOf = Some(gramsOf),
        pairKeep = Some(keep), keepIdentity = Some("spec:jac-pos:v1"))
    val st = mk(col("jac_num") > 0)
    st.update(Seq((1L, "AAA xxxx")).toDF("doc_id", "text"))
    // the same logical predicate under a DIFFERENT rendering (the
    // simulated Spark-upgrade toString drift): the pinned identity —
    // not the Column text — is what META compares, so reopen works
    val drifted = mk(lit(0) < col("jac_num"))
    assert(drifted.update(Seq((2L, "AAA xxxx yyyy"))
      .toDF("doc_id", "text")).nNewDistinct === 1L)
    // reopening WITHOUT the identity falls back to the rendering
    // digest, which cannot match the pinned one — refuse, never
    // silently fork admission semantics
    val bare = new DedupState(spark, root, prefixBands,
      gramsOf = Some(gramsOf), pairKeep = Some(col("jac_num") > 0))
    val e = intercept[IllegalArgumentException] {
      bare.update(Seq((3L, "AAA zzzz")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("admission"))
  }

  test("cap mismatch on reopen throws (edge-set invariant)") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val st = new DedupState(spark, root, prefixBands, Some(5L))
    st.update(Seq((1L, "AAA x")).toDF("doc_id", "text"))
    val bad = new DedupState(spark, root, prefixBands, Some(9L))
    val e = intercept[IllegalArgumentException] {
      bad.update(Seq((2L, "AAA y")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("bucket cap"))
  }

  test("update cost is proportional to the batch, not the corpus") {
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val d = fixtureDocs.localCheckpoint()
    val corpusDistinct = d.select(md5(col("text").cast("binary"))).distinct().count()

    val st = new DedupState(spark, tmpRoot(), bandsOf)
    st.update(d)

    // a crawl batch: 10 docs repeating existing content + 10 new docs
    val ss = spark; import ss.implicits._
    val dupTexts = d.orderBy("doc_id").limit(10).collect()
      .zipWithIndex.map { case (r, i) => (900000L + i, r.getString(1)) }
    val newTexts = (0 until 10).map(i =>
      (910000L + i, s"genuinely new crawl document number $i " * 8))
    val batch = (dupTexts ++ newTexts).toSeq.toDF("doc_id", "text")

    val r = st.update(batch)
    assert(r.nBatchDocs === 20L)
    assert(r.nNewDistinct === 10L, "only the unseen texts are new")
    // signature work = 4 band rows per NEW distinct text — the corpus
    // (hundreds of distinct texts) is never re-signed
    assert(r.nBandRows === 40L)
    assert(r.nBandRows < corpusDistinct,
      s"update signed ${r.nBandRows} rows; a rebuild would sign " +
        s"${4 * corpusDistinct}")
    // and the duplicate docs classify as seen content
    val seenOfBatch = st.members().filter(col("ver") === 2)
      .join(st.seenKeys().filter(col("ver") === 1).select("k"), "k")
      .count()
    assert(seenOfBatch === 10L)
  }

  test("orphan version dirs are invisible; the retried update overwrites") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val st = new DedupState(spark, root, prefixBands)
    st.update(Seq((1L, "AAA x"), (2L, "AAA y")).toDF("doc_id", "text"))
    // simulate a crash: v2 data written, CURRENT never flipped
    Seq((99L, "ZZZ zz")).toDF("doc_id", "text")
      .withColumn("k", md5(col("text").cast("binary")))
      .withColumn("ver", lit(2L)).select("doc_id", "k", "ver")
      .write.parquet(s"$root/v2/members")
    assert(st.currentVersion === 1L)
    assert(st.members().count() === 2L, "orphan rows are not read")
    val r = st.update(Seq((3L, "AAA z")).toDF("doc_id", "text"))
    assert(r.version === 2L)
    assert(st.members().count() === 3L)
    assert(st.members().filter(col("doc_id") === 99L).count() === 0L)
  }

  test("auto-compaction bounds the delta-union width without changing state") {
    val ss = spark; import ss.implicits._
    val incr = new DedupState(spark, tmpRoot(), prefixBands,
      autoCompactEvery = 3)
    val batches = (0 until 7).map(i =>
      Seq((i * 10L, s"AA$i x$i"), (i * 10L + 1, s"AA$i y$i")))
    batches.foreach(b => incr.update(b.toDF("doc_id", "text")))
    // every 3rd version squashes: the live window never exceeds the
    // threshold, yet the state equals a never-compacted build
    val plain = new DedupState(spark, tmpRoot(), prefixBands)
    batches.foreach(b => plain.update(b.toDF("doc_id", "text")))
    assert(partitionOf(incr) === partitionOf(plain))
    assert(incr.members().count() === 14L)
    assert(incr.liveVersionSpan <= 3,
      s"reader union must stay bounded, span=${incr.liveVersionSpan}")
    assert(plain.liveVersionSpan === 7L)
  }

  test("compact preserves components, arrival versions, and liveness") {
    val ss = spark; import ss.implicits._
    val v1 = Seq((1L, "AAA one"), (2L, "AAA two"), (3L, "AAA three"),
      (4L, "AAA four"), (10L, "BBB ten"), (11L, "BBB eleven"))
    val v2 = Seq((5L, "AAA five"), (6L, "AAA six"), (7L, "AAA seven"),
      (12L, "BBB twelve"))
    val st = new DedupState(spark, tmpRoot(), prefixBands, Some(5L))
    st.update(v1.toDF("doc_id", "text"))
    st.update(v2.toDF("doc_id", "text"))
    val before = partitionOf(st)
    val versBefore = st.members().select("doc_id", "ver").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val snap = st.compact()
    assert(snap === 3L)
    assert(partitionOf(st) === before)
    val versAfter = st.members().select("doc_id", "ver").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(versAfter === versBefore, "arrival versions survive compaction")
    // dead AAA pairs were pruned; BBB's live edge survived
    assert(st.liveEdges().count() === st.pairs().select("a", "b").distinct().count())

    // the store keeps working after compaction and still matches one-shot
    val v3 = Seq((20L, "BBB twenty"), (21L, "CCC alone"))
    st.update(v3.toDF("doc_id", "text"))
    val oneShot = new DedupState(spark, tmpRoot(), prefixBands, Some(5L))
    oneShot.update((v1 ++ v2 ++ v3).toDF("doc_id", "text"))
    assert(partitionOf(st) === partitionOf(oneShot))
  }
}
