package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The federated dedup-state contract
  * ([[DedupState.federatedDocClusters]]): per-member single-writer
  * stores merge into exactly the clusters a SINGLE store over the
  * union corpus produces —
  *
  *   1. with real MinHash banding and content duplicated ACROSS
  *      members (per-member reps of identical content must collapse);
  *   2. under the bucket cap applied to the GLOBAL bucket size: a
  *      bucket under the cap in every member but over it combined
  *      must drop, with its member-local pairs retroactively dead;
  *   3. cap disagreement between members refuses to merge.
  */
class FederatedDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("federated-dedup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(): String =
    Files.createTempDirectory("fed-dedup-spec-").toString

  private def fixtureDocs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

  /** Label-independent view of a clustering frame (doc_id, cluster):
    * each doc keyed by the min content key of its cluster — the
    * DedupStateSpec comparison, generalized to a frame. */
  private def partitionOf(clusters: DataFrame, docs: DataFrame)
      : Set[(Long, String)] = {
    val keyed = clusters.join(
      docs.select(col("doc_id"), md5(col("text").cast("binary")).as("k")),
      "doc_id")
    val rep = keyed.groupBy("cluster").agg(min("k").as("ck"))
    keyed.join(rep, "cluster")
      .select(col("doc_id"), col("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  private def singleStorePartition(d: DataFrame,
                                   bandsOf: DataFrame => DataFrame,
                                   cap: Option[Long]): Set[(Long, String)] = {
    val one = new DedupState(spark, tmpRoot(), bandsOf, cap)
    one.update(d)
    partitionOf(one.docClusters().select("doc_id", "cluster"), d)
  }

  test("two members equal one store (real MinHash, cross-member dups)") {
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val base = fixtureDocs.localCheckpoint()
    // duplicate a slice of member A's content into member B under new
    // doc ids: the same content now has a rep in BOTH members
    val dupes = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val d = base.unionByName(dupes).localCheckpoint()

    val a = new DedupState(spark, tmpRoot(), bandsOf)
    val b = new DedupState(spark, tmpRoot(), bandsOf)
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))

    val fed = DedupState.federatedDocClusters(Seq(a, b))
    assert(partitionOf(fed, d) === singleStorePartition(d, bandsOf, None))
  }

  test("global bucket cap: under-cap members combine over the cap") {
    // surgical banding (bucket = first 3 chars) and a corpus where one
    // bucket holds 3 docs per member — cap 4 passes each member alone
    // but the global 6 crosses it, so the merge must drop the bucket
    // and its member-local pairs retroactively
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val ss = spark; import ss.implicits._
    val hot = (0L until 6L).map(i => (i, s"HOTbucket member doc $i"))
    val cold = (10L until 20L).map(i => (i, s"c${i}_unique content $i"))
    val d = (hot ++ cold).toDF("doc_id", "text").localCheckpoint()

    val cap = Some(4L)
    val a = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val b = new DedupState(spark, tmpRoot(), prefixBands, cap)
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    // each member saw 3 HOT docs: under its local cap, so pairs exist
    assert(a.liveEdges().count() > 0 && b.liveEdges().count() > 0)

    val fed = DedupState.federatedDocClusters(Seq(a, b))
    val expect = singleStorePartition(d, prefixBands, cap)
    assert(partitionOf(fed, d) === expect)
    // and the single-store build really did cap the bucket: every HOT
    // doc is its own singleton cluster
    val hotClusters = partitionOf(fed, d).filter(_._1 < 6L).map(_._2)
    assert(hotClusters.size === 6, "capped bucket must not cluster")
  }

  test("cap counts distinct content, not per-member reps") {
    // content shared ACROSS members carries one band row per member
    // rep; the cap must count it ONCE (single-store semantics: band
    // rows are per distinct content). Here the bucket holds 4 distinct
    // contents = exactly the cap, but 5 member reps — a raw row count
    // would drop it and split the cluster a single store builds.
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val ss = spark; import ss.implicits._
    val d = Seq(
      (0L, "HOT shared content"), (1L, "HOT shared content"), // A and B
      (2L, "HOT second"), (3L, "HOT third"), (4L, "HOT fourth"),
      (10L, "c10 unique"), (11L, "c11 unique"))
      .toDF("doc_id", "text").localCheckpoint()
    val cap = Some(4L)
    val a = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val b = new DedupState(spark, tmpRoot(), prefixBands, cap)
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    val fed = DedupState.federatedDocClusters(Seq(a, b))
    assert(partitionOf(fed, d) === singleStorePartition(d, prefixBands, cap))
    // the live bucket really did cluster: all 5 HOT docs together
    val hotKeys = partitionOf(fed, d).filter(_._1 < 5L).map(_._2)
    assert(hotKeys.size === 1, s"under-cap bucket must cluster, got $hotKeys")
  }

  test("merge plan guardrail: every join equi-keyed, no cartesian") {
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val d = fixtureDocs.limit(60).localCheckpoint()
    val a = new DedupState(spark, tmpRoot(), prefixBands, Some(8L))
    val b = new DedupState(spark, tmpRoot(), prefixBands, Some(8L))
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    val (edges, canon, members) = DedupState.federatedGraph(Seq(a, b))
    for ((name, df) <- Seq(("edges", edges), ("canon", canon),
        ("members", members))) {
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"federated $name must stay equi-keyed on bkey/k, got:\n$p")
    }
  }

  test("federated contamination: two members equal one store, compaction-safe") {
    val grams: DataFrame => DataFrame = texts =>
      texts.filter(length(col("text")) >= 8)
        .select(col("k"), col("text"),
          explode(sequence(lit(1), least(length(col("text")) - 7, lit(64)),
            lit(8))).as("p"))
        .select(col("k"), expr("substring(text, p, 8)").as("g"))
        .distinct()
    // duplicate a slice across members so shared content counts once,
    // and use a low cap so some grams cross it only GLOBALLY
    val base = fixtureDocs.localCheckpoint()
    val dupes = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val d = base.unionByName(dupes).localCheckpoint()
    val cap = 8L

    val one = new ContamState(spark, tmpRoot(), grams, cap)
    one.update(d)
    val want = one.livePostings().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

    val a = new ContamState(spark, tmpRoot(), grams, cap)
    val b = new ContamState(spark, tmpRoot(), grams, cap)
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    def fedSet = ContamState.federatedLivePostings(Seq(a, b)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fedSet === want)
    // compaction prunes a member's capped postings; the merge must
    // still retire those grams globally instead of recounting them low
    a.compact()
    assert(fedSet === want)
    // cap disagreement refuses
    val c = new ContamState(spark, tmpRoot(), grams, cap + 1)
    val e = intercept[IllegalArgumentException](
      ContamState.federatedLivePostings(Seq(a, c)))
    assert(e.getMessage.contains("cap"))
  }

  test("thresholded store: cross-member pairs pass the shared admission gate") {
    // the embedding-family shape: weighted features (fixed-point
    // vector components), a cosine-threshold pair-ADMISSION predicate
    // — in such a store band co-membership is only CANDIDACY, so the
    // merge must SCORE cross-member candidates from the members'
    // feats indexes and apply the same predicate, not admit them on
    // co-banding as the MinHash merge does
    val ss = spark; import ss.implicits._
    // one shared band bucket = every pair is a candidate; parity split
    // puts 1,3 in member B and 2,4 in member A; (1,2,4) are parallel
    // (cos = 1 across members, 4 duplicates 1's content exactly) and 3
    // is orthogonal to all (cos = 0 — candidate, must be rejected)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 0.0f)))
    val bandsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"), lit("one").as("bkey"))
    val gramsOf: DataFrame => DataFrame =
      src => src
        .select(col("doc_id"), posexplode(col("text")).as(Seq("i", "f")))
        .select(col("doc_id"), col("i").cast("string").as("g"),
          round(col("f").cast("double") * 1000000L, 0).cast("long").as("w"))
    val keep = (col("jac_num").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))) >= 0.5
    def mkStore() = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf), contentCol = "embedding",
      keyOf = c => md5(concat_ws(",",
        transform(c, x => x.cast("string"))).cast("binary")),
      pairKeep = Some(keep))
    val d = vecs.toDF("doc_id", "embedding").localCheckpoint()

    def partition(clusters: DataFrame): Set[Set[Long]] = clusters
      .groupBy("cluster").agg(collect_set("doc_id").as("ds"))
      .collect().map(_.getSeq[Long](1).toSet).toSet

    val one = mkStore(); one.update(d)
    val want = partition(one.docClusters().select("doc_id", "cluster"))

    val a = mkStore(); val b = mkStore()
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    val fed = DedupState.federatedDocClusters(Seq(a, b))
    assert(partition(fed) === want)
    // and concretely: the parallel trio clusters across the split, the
    // orthogonal co-banded candidate stays a singleton
    assert(want === Set(Set(1L, 2L, 4L), Set(3L)))
  }

  test("federated pair report equals one store (gram-attributed, cross-member scoring)") {
    // the UNthresholded gram-attributed shape (the text 4-gram store):
    // member pairs carry fold-time Jaccard, cross-member candidates
    // must be scored at merge time with the same algebra, and the
    // canonical mapping must collapse shared-content reps without
    // pairing a content with itself
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val gramsOf = graft.queries.EtlQueries.gram4Of _
    val base = fixtureDocs.localCheckpoint()
    val dupes = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val d = base.unionByName(dupes).localCheckpoint()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val one = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf))
    one.update(d)
    val want = rows(one.livePairStats())
    assert(want.nonEmpty, "fixture must produce candidate pairs")

    val a = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf))
    val b = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf))
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    assert(rows(DedupState.federatedLivePairStats(Seq(a, b))) === want)
    // and the canonical feature summary matches the one-shot store's
    val szOne = one.featSizes().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val szFed = DedupState.federatedFeatSizes(Seq(a, b)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(szFed === szOne)
  }

  test("thresholded read handles: views open bare, merges demand the predicate") {
    val ss = spark; import ss.implicits._
    val bandsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"), lit("one").as("bkey"))
    val gramsOf: DataFrame => DataFrame =
      src => src
        .select(col("doc_id"), posexplode(col("text")).as(Seq("i", "f")))
        .select(col("doc_id"), col("i").cast("string").as("g"),
          round(col("f").cast("double") * 1000000L, 0).cast("long").as("w"))
    val keep = (col("jac_num").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))) >= 0.5
    val (rootA, rootB) = (tmpRoot(), tmpRoot())
    def mk(root: String) = new DedupState(spark, root, bandsOf,
      gramsOf = Some(gramsOf), contentCol = "embedding",
      keyOf = c => md5(concat_ws(",",
        transform(c, x => x.cast("string"))).cast("binary")),
      pairKeep = Some(keep))
    val d = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 0.0f)))
      .toDF("doc_id", "embedding").localCheckpoint()
    mk(rootA).update(d.filter(col("doc_id") % 2 === 0))
    mk(rootB).update(d.filter(col("doc_id") % 2 === 1))

    // a bare read handle serves views (stored rows are already
    // admission-filtered) …
    val bare = EtlViews.openDedup(spark, rootA)
    assert(bare.livePairStats().count() >= 0)
    // … but cannot enter a merge: the on-disk identity says the store
    // is thresholded and the handle has no predicate to score with
    val e = intercept[IllegalArgumentException](
      DedupState.federatedDocClusters(Seq(
        bare, EtlViews.openDedup(spark, rootB))))
    assert(e.getMessage.contains("WITHOUT its"))
    // a WRONG predicate refuses at open
    val e2 = intercept[IllegalArgumentException](
      EtlViews.openDedup(spark, rootA,
        pairKeep = Some(col("jac_num") >= 9L)))
    assert(e2.getMessage.contains("edge-set invariant"))
    // the store's own predicate opens AND merges — equal to one store
    val fedHandles = DedupState.federatedDocClusters(Seq(
      EtlViews.openDedup(spark, rootA, pairKeep = Some(keep)),
      EtlViews.openDedup(spark, rootB, pairKeep = Some(keep))))
    val sizes = fedHandles.groupBy("cluster")
      .agg(collect_set("doc_id").as("ds"))
      .collect().map(_.getSeq[Long](1).toSet).toSet
    assert(sizes === Set(Set(1L, 2L, 4L), Set(3L)))
  }

  test("explicit admission identity: reopen independent of Column rendering") {
    val ss = spark; import ss.implicits._
    // Column.toString is deterministic within one Spark version but
    // not ACROSS versions — a long-lived store pins an explicit
    // keepIdentity at creation, and any later handle carrying the same
    // identity opens regardless of how its predicate tree renders
    val bandsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"), lit("one").as("bkey"))
    val gramsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"),
        explode(split(col("text"), " ")).as("g")).distinct()
    val id = Some("share-a-word:v1")
    val root = tmpRoot()
    val st = new DedupState(spark, root, bandsOf, gramsOf = Some(gramsOf),
      pairKeep = Some(col("jac_num") >= 1L), keepIdentity = id)
    st.update(Seq((1L, "alpha beta"), (3L, "beta gamma"),
      (5L, "zeta")).toDF("doc_id", "text"))
    val want = st.livePairStats().collect().map(_.toString).toSet
    assert(want.nonEmpty)
    // same semantics, DIFFERENT expression tree: the identity governs
    val reopened = EtlViews.openDedup(spark, root,
      pairKeep = Some(!(col("jac_num") < 1L)), keepIdentity = id)
    assert(reopened.livePairStats().collect()
      .map(_.toString).toSet === want)
    // a wrong identity refuses at open
    val e = intercept[IllegalArgumentException](
      EtlViews.openDedup(spark, root,
        pairKeep = Some(col("jac_num") >= 1L),
        keepIdentity = Some("other:v2")))
    assert(e.getMessage.contains("edge-set invariant"))
    // an identity without its predicate refuses at construction
    val e2 = intercept[IllegalArgumentException](
      new DedupState(spark, tmpRoot(), bandsOf, gramsOf = Some(gramsOf),
        keepIdentity = id))
    assert(e2.getMessage.contains("keepIdentity"))
  }

  test("pair-admission disagreement refuses to merge") {
    val bandsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"), lit("one").as("bkey"))
    val gramsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"), col("text").as("g"), lit(1L).as("w"))
    def mk(thr: Double) = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf),
      pairKeep = Some(col("jac_num").cast("double") >= thr))
    val e = intercept[IllegalArgumentException](
      DedupState.federatedDocClusters(Seq(mk(0.5), mk(0.6))))
    assert(e.getMessage.contains("admission"))
    // every federated reader shares the parity/conflict guards — the
    // feature-summary reader refuses the same mismatch
    val eFs = intercept[IllegalArgumentException](
      DedupState.federatedFeatSizes(Seq(mk(0.5), mk(0.6))))
    assert(eFs.getMessage.contains("admission"))
    // and a predicate without the attribute source refuses at
    // construction — it would otherwise be silently ignored
    val e2 = intercept[IllegalArgumentException](
      new DedupState(spark, tmpRoot(), bandsOf,
        pairKeep = Some(col("jac_num") >= 1L)))
    assert(e2.getMessage.contains("gramsOf"))
  }

  test("cap disagreement refuses to merge") {
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val a = new DedupState(spark, tmpRoot(), prefixBands, Some(4L))
    val b = new DedupState(spark, tmpRoot(), prefixBands, Some(8L))
    val e = intercept[IllegalArgumentException](
      DedupState.federatedDocClusters(Seq(a, b)))
    assert(e.getMessage.contains("cap"))
  }
}
