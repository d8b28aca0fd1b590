package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The INCREMENTAL federation-store contract ([[FedDedupState]],
  * [[FedContamState]]): folding member deltas at batch cost must serve
  * exactly what the one-shot merges ([[DedupState.federatedDocClusters]]
  * / [[DedupState.federatedLivePairStats]] / [[ContamState
  * .federatedLivePostings]]) compute from scratch — on ANY fold
  * schedule, across member compactions, and under the retroactive
  * global cap. */
class FedStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fed-state-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(): String =
    Files.createTempDirectory("fed-state-spec-").toString

  private def fixtureDocs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

  /** Label-independent clustering view (see FederatedDedupSpec). */
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

  private def pairRows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("a", "b", "jac_num", "jac_den").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("schedule invariance: staged folds equal the one-shot merge " +
      "(MinHash, cross-member dups, member compaction)") {
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val base = fixtureDocs.localCheckpoint()
    val dupes = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val d = base.unionByName(dupes).localCheckpoint()
    val dA = d.filter(col("doc_id") % 2 === 0)
    val dB = d.filter(col("doc_id") % 2 === 1)

    val a = new DedupState(spark, tmpRoot(), bandsOf)
    val b = new DedupState(spark, tmpRoot(), bandsOf)
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))

    // interleaved member batches with a fed fold after each stage —
    // including a fold where only ONE member advanced, and a member
    // compact that squashes the delta dirs the next fold would read
    // (exercising the documented exact fallbacks)
    a.update(dA.filter(col("doc_id") % 3 === 0))
    assert(fed.fold().isDefined)
    b.update(dB.filter(col("doc_id") % 3 =!= 2))
    a.update(dA.filter(col("doc_id") % 3 === 1))
    assert(fed.fold().isDefined)
    a.update(dA.filter(col("doc_id") % 3 === 2))
    a.compact() // deltas of the LAST batch are squashed before folding
    b.update(dB.filter(col("doc_id") % 3 === 2))
    assert(fed.fold().isDefined)
    // idempotency: nothing new to absorb
    assert(fed.fold().isEmpty)

    val want = partitionOf(
      DedupState.federatedDocClusters(Seq(a, b)), d)
    assert(partitionOf(fed.docClusters(), d) === want)

    // a fresh store folding everything at once agrees (fold-count
    // invariance from the other direction)
    val once = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    once.fold()
    assert(partitionOf(once.docClusters(), d) === want)

    // the federation's own compact: reads unchanged, span bounded,
    // later member folds land on the squashed base
    val span = fed.liveVersionSpan
    assert(span >= 3L)
    fed.compact()
    assert(fed.liveVersionSpan === 1L)
    assert(partitionOf(fed.docClusters(), d) === want)
    assert(fed.fold().isEmpty, "compact must not disturb the watermarks")
    val extra = d.limit(0).sparkSession
      .createDataFrame(Seq((9999991L, "post compact fed doc")))
      .toDF("doc_id", "text")
    a.update(extra)
    assert(fed.fold().isDefined)
    assert(partitionOf(fed.docClusters(), d.unionByName(extra)) ===
      partitionOf(DedupState.federatedDocClusters(Seq(a, b)),
        d.unionByName(extra)))
  }

  test("retroactive global cap: pairs admitted in earlier folds die " +
      "when the federation bucket crosses the cap") {
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val ss = spark; import ss.implicits._
    val hot = (0L until 6L).map(i => (i, s"HOTbucket member doc $i"))
    val cold = (10L until 20L).map(i => (i, s"c${i}_unique content $i"))
    val d = (hot ++ cold).toDF("doc_id", "text").localCheckpoint()
    val cap = Some(4L)
    val a = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val b = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))

    // fold 1: member A alone — its 3 HOT docs cluster (global size 3)
    a.update(d.filter(col("doc_id") % 2 === 0))
    fed.fold()
    val afterA = partitionOf(fed.docClusters(),
      d.filter(col("doc_id") % 2 === 0))
    assert(afterA.filter(_._1 < 6L).map(_._2).size === 1,
      "HOT bucket must cluster while under the global cap")

    // fold 2: member B pushes the bucket to 6 > 4 — the fold must
    // retire the bucket AND the fold-1 pairs retroactively
    b.update(d.filter(col("doc_id") % 2 === 1))
    fed.fold()
    val want = partitionOf(DedupState.federatedDocClusters(Seq(a, b)), d)
    assert(partitionOf(fed.docClusters(), d) === want)
    assert(partitionOf(fed.docClusters(), d).filter(_._1 < 6L).map(_._2)
      .size === 6, "capped bucket must un-cluster retroactively")
  }

  test("cap counts distinct content across members, incrementally") {
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val ss = spark; import ss.implicits._
    val d = Seq(
      (0L, "HOT shared content"), (1L, "HOT shared content"),
      (2L, "HOT second"), (3L, "HOT third"), (4L, "HOT fourth"),
      (10L, "c10 unique"), (11L, "c11 unique"))
      .toDF("doc_id", "text").localCheckpoint()
    val cap = Some(4L)
    val a = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val b = new DedupState(spark, tmpRoot(), prefixBands, cap)
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    a.update(d.filter(col("doc_id") % 2 === 0))
    fed.fold()
    b.update(d.filter(col("doc_id") % 2 === 1))
    fed.fold()
    // 4 distinct contents (5 member reps) = exactly the cap: live
    assert(partitionOf(fed.docClusters(), d) ===
      partitionOf(DedupState.federatedDocClusters(Seq(a, b)), d))
    assert(partitionOf(fed.docClusters(), d)
      .filter(_._1 < 5L).map(_._2).size === 1,
      "a raw member-rep count would over-count the shared content")
  }

  test("a smaller rid arriving late relabels its component (canon move)") {
    val ss = spark; import ss.implicits._
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val a = new DedupState(spark, tmpRoot(), prefixBands)
    val b = new DedupState(spark, tmpRoot(), prefixBands)
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    // member A first: reps 10 and 11 cluster, label = 10
    a.update(Seq((10L, "HOT one"), (11L, "HOT two"))
      .toDF("doc_id", "text"))
    fed.fold()
    assert(fed.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((10L, 10L), (11L, 10L)))
    // member B later delivers doc 2 with rep 10's CONTENT: the
    // federation canon for that content moves to 2, and min-label CC
    // must relabel the whole component — exactly what a single store
    // over the union (where 2 is the first-arrival rep) assigns
    b.update(Seq((2L, "HOT one")).toDF("doc_id", "text"))
    fed.fold()
    val got = fed.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 2L), (11L, 2L), (2L, 2L)),
      s"late smaller rid must relabel, got $got")
    // and agrees with the one-shot merge VERBATIM (labels included)
    val oneShot = DedupState.federatedDocClusters(Seq(a, b)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === oneShot)
  }

  test("thresholded store: staged folds serve clusters AND the pair " +
      "report verbatim (cross-member admission scoring)") {
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
    def mkStore() = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(gramsOf), contentCol = "embedding",
      keyOf = c => md5(concat_ws(",",
        transform(c, x => x.cast("string"))).cast("binary")),
      pairKeep = Some(keep))
    val d = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 0.0f)),
      (5L, Array(3.0f, 0.1f)), (6L, Array(0.1f, 2.0f)))
      .toDF("doc_id", "embedding").localCheckpoint()
    val a = mkStore(); val b = mkStore()
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    a.update(d.filter(col("doc_id") % 2 === 0 && col("doc_id") <= 4))
    b.update(d.filter(col("doc_id") % 2 === 1 && col("doc_id") <= 4))
    fed.fold()
    a.update(d.filter(col("doc_id") === 6L))
    b.update(d.filter(col("doc_id") === 5L))
    fed.fold()

    def partition(c: DataFrame): Set[Set[Long]] = c
      .groupBy("cluster").agg(collect_set("doc_id").as("ds"))
      .collect().map(_.getSeq[Long](1).toSet).toSet
    val wantClusters = partition(DedupState.federatedDocClusters(Seq(a, b)))
    assert(partition(fed.docClusters()) === wantClusters)
    // the pair report: stats AND canonical feature summaries verbatim
    assert(pairRows(fed.livePairStats()) ===
      pairRows(DedupState.federatedLivePairStats(Seq(a, b))))
    val wantReport = DedupState.federatedPairReport(Seq(a, b)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val gotReport = fed.pairReport().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(gotReport === wantReport)
  }

  test("a member compact while the federation is caught up folds to " +
      "nothing new (squash dir is not a delta)") {
    val ss = spark; import ss.implicits._
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val a = new DedupState(spark, tmpRoot(), prefixBands)
    val b = new DedupState(spark, tmpRoot(), prefixBands)
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    a.update(Seq((1L, "HOT one"), (3L, "HOT two")).toDF("doc_id", "text"))
    b.update(Seq((2L, "HOT three"), (4L, "c4 other"))
      .toDF("doc_id", "text"))
    fed.fold()
    val before = fed.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the compact ADVANCES the member's version, so the federation sees
    // an unabsorbed window — but that window is the full-corpus squash,
    // which the delta readers must reconstruct as the EMPTY delta (the
    // exact ver-keyed fallbacks), never direct-read as new rows
    a.compact()
    val rep = fed.fold()
    assert(rep.isDefined, "the version moved, so a fold happens")
    assert(rep.get.nNewReps === 0 && rep.get.nNewPairs === 0 &&
      rep.get.nStarEdges === 0,
      s"a squash must fold to nothing new, got $rep")
    val after = fed.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "no doc may be re-absorbed")
    assert(fed.docClusters().count() === before.size.toLong,
      "exactly one row per doc — a squash re-read would duplicate")
    // a real post-compact batch still folds at batch cost on top
    a.update(Seq((5L, "HOT four")).toDF("doc_id", "text"))
    assert(fed.fold().get.nNewReps === 1)
    assert(partitionOf(fed.docClusters(),
        Seq((1L, "HOT one"), (2L, "HOT three"), (3L, "HOT two"),
          (4L, "c4 other"), (5L, "HOT four")).toDF("doc_id", "text")) ===
      partitionOf(DedupState.federatedDocClusters(Seq(a, b)),
        Seq((1L, "HOT one"), (2L, "HOT three"), (3L, "HOT two"),
          (4L, "c4 other"), (5L, "HOT four")).toDF("doc_id", "text")))
    // the contamination analog: a caught-up member compact folds to
    // nothing new there too
    val grams: DataFrame => DataFrame = texts =>
      texts.select(col("k"), col("text").as("g"))
    val ca = new ContamState(spark, tmpRoot(), grams, dfCap = 5L)
    val cb = new ContamState(spark, tmpRoot(), grams, dfCap = 5L)
    val cfed = new FedContamState(spark, tmpRoot(), Seq(ca, cb))
    ca.update(Seq((1L, "alpha"), (3L, "beta")).toDF("doc_id", "text"))
    cb.update(Seq((2L, "gamma")).toDF("doc_id", "text"))
    cfed.fold()
    val postsBefore = cfed.livePostings().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    ca.compact()
    val crep = cfed.fold()
    assert(crep.isDefined && crep.get.nNewKeys === 0 &&
      crep.get.nNewPostings === 0, s"squash fold must be empty, got $crep")
    assert(cfed.livePostings().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet === postsBefore)
  }

  test("winnow-match family: staged folds serve the single-store pair " +
      "counts (livePairCounts over canonical rids, global df cap)") {
    val ss = spark; import ss.implicits._
    // one bucket per content FEATURE (the winnow-fingerprint shape:
    // bkey = fingerprint), so livePairCounts = |shared under-cap
    // features| — 3-char word features here
    val wordBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"),
          explode(expr("filter(split(text, ' '), x -> length(x) > 0)"))
            .as("bkey"))
        .distinct()
    val cap = Some(3L)
    val d = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc ee"), (3L, "bb cc ff"),
      (4L, "aa gg"), (5L, "gg hh"), (6L, "hh ii jj"),
      // shared content across members (star collapse + rep dup rows)
      (7L, "aa bb cc dd"), (8L, "bb cc ff"))
      .toDF("doc_id", "text").localCheckpoint()
    // parity split puts the content of docs 1/7 and 3/8 in BOTH members
    val a = new DedupState(spark, tmpRoot(), wordBands, cap)
    val b = new DedupState(spark, tmpRoot(), wordBands, cap)
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    // staged: "aa" has df 3 (contents 1,2,4) after stage 1+2 and the
    // cap is 3 — a later fold must NOT have over-counted, and "bb"/"cc"
    // (df 3 of contents 1,2,3) stay live though 5 member reps band them
    a.update(d.filter(col("doc_id") % 2 === 1 && col("doc_id") <= 4))
    fed.fold()
    b.update(d.filter(col("doc_id") % 2 === 0 && col("doc_id") <= 4))
    a.update(d.filter(col("doc_id") % 2 === 1 && col("doc_id") > 4))
    fed.fold()
    b.update(d.filter(col("doc_id") % 2 === 0 && col("doc_id") > 4))
    fed.fold()
    assert(fed.fold().isEmpty)
    // the comparator: ONE store over the union corpus — its rep ids
    // are the global min doc_id per content, i.e. the canonical rids
    val one = new DedupState(spark, tmpRoot(), wordBands, cap)
    one.update(d)
    def counts(df: DataFrame): Set[(Long, Long, Long)] = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = counts(one.livePairCounts())
    assert(want.nonEmpty, "fixture must produce shared-feature pairs")
    assert(counts(fed.livePairCounts()) === want)
    // and survives the federation's own compact
    fed.compact()
    assert(counts(fed.livePairCounts()) === want)
  }

  test("mid-fold member compact guard: a delta window entirely below " +
      "the compacted base fails loudly instead of folding nothing") {
    val ss = spark; import ss.implicits._
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val st = new DedupState(spark, tmpRoot(), prefixBands)
    st.update(Seq((1L, "one alpha")).toDF("doc_id", "text"))
    st.update(Seq((2L, "two beta")).toDF("doc_id", "text"))
    st.update(Seq((3L, "three gamma")).toDF("doc_id", "text"))
    // a federation fold pins upTo = 3 here, then the member compacts:
    // base becomes 4, so the fallback's [base, upTo] union would be
    // EMPTY — a silent all-zero "delta" that advances the watermark
    // past rows it never absorbed. The reader must throw for a retry.
    st.compact()
    for (read <- Seq[(Long, Long) => org.apache.spark.sql.DataFrame](
        st.membersDelta, st.groupsDelta, st.bandsDelta, st.pairsDelta)) {
      val e = intercept[IllegalArgumentException](read(1L, 3L))
      assert(e.getMessage.contains("compacted past"),
        s"expected the loud mid-fold-compact refusal, got: ${e.getMessage}")
    }
    // a window that reaches the squash still reads (the exact fallback)
    assert(st.membersDelta(1L, st.currentVersion).count() === 2L)
    // the contamination twins share the one deltaDirs copy — prove the
    // guard holds there too
    val grams: DataFrame => DataFrame = texts =>
      texts.select(col("k"), col("text").as("g"))
    val ct = new ContamState(spark, tmpRoot(), grams, dfCap = 5L)
    ct.update(Seq((1L, "alpha")).toDF("doc_id", "text"))
    ct.update(Seq((2L, "beta")).toDF("doc_id", "text"))
    ct.compact()
    val e = intercept[IllegalArgumentException](ct.textsDelta(0L, 1L))
    assert(e.getMessage.contains("compacted past"))
  }

  test("store-read plan guardrail: every federation read stays equi-keyed") {
    val bandsOf = graft.queries.EtlQueries.bandKeys _
    val d = fixtureDocs.limit(80).localCheckpoint()
    val a = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(graft.queries.EtlQueries.gram4Of))
    val b = new DedupState(spark, tmpRoot(), bandsOf,
      gramsOf = Some(graft.queries.EtlQueries.gram4Of))
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    val fed = new FedDedupState(spark, tmpRoot(), Seq(a, b))
    fed.fold()
    // the 100 TB guardrail: labels/canon/pair reads join on rid/k/crid
    // only — a cartesian or nested-loop join anywhere here would scale
    // as corpus², and nothing in the fixture sizes would catch it
    for ((name, df) <- Seq(
        ("docClusters", fed.docClusters()),
        ("livePairStats", fed.livePairStats()),
        ("pairReport", fed.pairReport()),
        ("featSizes", fed.featSizes()))) {
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"federation store read $name must stay equi-keyed, got:\n$p")
    }
  }

  test("membership, parity and doc_id guards") {
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val ss = spark; import ss.implicits._
    val a = new DedupState(spark, tmpRoot(), prefixBands)
    val b = new DedupState(spark, tmpRoot(), prefixBands)
    val root = tmpRoot()
    val fed = new FedDedupState(spark, root, Seq(a, b))
    a.update(Seq((1L, "alpha one")).toDF("doc_id", "text"))
    fed.fold()
    // reopening with a different member list refuses (META identity)
    val c = new DedupState(spark, tmpRoot(), prefixBands)
    val e = intercept[IllegalArgumentException](
      new FedDedupState(spark, root, Seq(a, c)).fold())
    assert(e.getMessage.contains("membership"))
    // cap parity refuses at fold (parity is lazy so read-only handles
    // can serve views over bare members — the single-store view rule)
    val capped = new DedupState(spark, tmpRoot(), prefixBands, Some(4L))
    val e2 = intercept[IllegalArgumentException](
      new FedDedupState(spark, tmpRoot(), Seq(a, capped)).fold())
    assert(e2.getMessage.contains("cap"))
    // a doc_id claiming DIFFERENT content in two members refuses
    b.update(Seq((1L, "bravo other")).toDF("doc_id", "text"))
    val e3 = intercept[IllegalArgumentException](fed.fold())
    assert(e3.getMessage.contains("globally unique"))
  }

  test("federated contamination store: staged folds equal the one-shot " +
      "merge across member compaction") {
    val grams: DataFrame => DataFrame = texts =>
      texts.filter(length(col("text")) >= 8)
        .select(col("k"), col("text"),
          explode(sequence(lit(1), least(length(col("text")) - 7, lit(64)),
            lit(8))).as("p"))
        .select(col("k"), expr("substring(text, p, 8)").as("g"))
        .distinct()
    val base = fixtureDocs.localCheckpoint()
    val dupes = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val d = base.unionByName(dupes).localCheckpoint()
    val cap = 8L
    val dA = d.filter(col("doc_id") % 2 === 0)
    val dB = d.filter(col("doc_id") % 2 === 1)

    val a = new ContamState(spark, tmpRoot(), grams, cap)
    val b = new ContamState(spark, tmpRoot(), grams, cap)
    val fed = new FedContamState(spark, tmpRoot(), Seq(a, b))
    a.update(dA.filter(col("doc_id") % 3 === 0))
    assert(fed.fold().isDefined)
    b.update(dB.filter(col("doc_id") % 3 =!= 2))
    a.update(dA.filter(col("doc_id") % 3 =!= 0))
    a.compact() // member-capped postings pruned; verdicts must survive
    assert(fed.fold().isDefined)
    b.update(dB.filter(col("doc_id") % 3 === 2))
    assert(fed.fold().isDefined)
    assert(fed.fold().isEmpty)

    def rows(df: DataFrame): Set[(String, String)] = df.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = rows(ContamState.federatedLivePostings(Seq(a, b)))
    assert(rows(fed.livePostings()) === want)
    // the federation's own compact: live evidence unchanged (capped
    // grams' postings prune, their verdicts persist), span bounded
    fed.compact()
    assert(fed.liveVersionSpan === 1L)
    assert(rows(fed.livePostings()) === want)
    assert(fed.fold().isEmpty)
    // cap disagreement refuses at open
    val cOther = new ContamState(spark, tmpRoot(), grams, cap + 1)
    val e = intercept[IllegalArgumentException](
      new FedContamState(spark, tmpRoot(), Seq(a, cOther)))
    assert(e.getMessage.contains("cap"))
  }
}
