package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The generic derived-content store's contract
  * ([[graft.etl.DerivedState]]):
  *
  *   1. batch-schedule invariance — any split of a corpus into update
  *      batches yields the SAME derived table as a one-shot feed (the
  *      derivation is a pure per-key function; for trained stores,
  *      pure against the FROZEN artifacts);
  *   2. cost proportionality — an update's derivation work tracks the
  *      batch's NEW keys, never the corpus;
  *   3. retrain semantics — train() starts a new artifact generation
  *      and resets the derived state (rows derived under dead
  *      artifacts never survive);
  *   4. durability mechanics — compact preserves state and carries
  *      artifacts, the version span stays bounded under
  *      autoCompactEvery, and a mismatched derivation fingerprint
  *      refuses to open the store.
  */
class DerivedStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("derived-state-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(): String =
    Files.createTempDirectory("derived-state-spec-").toString

  private def fixtureDocs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("k"),
        col("text"))

  /** Pure-append derivation: per-key word counts. */
  private val wordDerive: (DataFrame, DataFrame) => DataFrame = (rows, _) =>
    rows.select(col("k"),
        explode(expr("filter(split(text, ' '), x -> length(x) > 0)"))
          .as("word"))
      .groupBy("k", "word").agg(count(lit(1)).as("c"))

  private def derivedSet(st: DerivedState): Set[(String, String, Long)] =
    st.derived().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("pure-append: any batch schedule equals the one-shot feed") {
    val d = fixtureDocs.localCheckpoint()
    val oneShot = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive)
    oneShot.update(d)
    val incr = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive)
    val reports = (0 to 2).map(i =>
      incr.update(d.filter(col("doc_id") % 3 === i)))
    assert(incr.currentVersion === 3L)
    assert(derivedSet(incr) === derivedSet(oneShot))
    // cost ∝ batch: a replayed batch derives NOTHING
    val replay = incr.update(d.filter(col("doc_id") % 3 === 0))
    assert(replay.nNewKeys === 0L && replay.nDerivedRows === 0L)
    // duplicate content across batches derived exactly once
    assert(reports.map(_.nNewKeys).sum ===
      d.select("k").distinct().count())
  }

  test("trained store: frozen artifacts make batched == one-shot") {
    val d = fixtureDocs.localCheckpoint()
    // artifact = the corpus's max text length; derivation scores each
    // key against it — any artifact drift across batches would show
    val trainer: DataFrame => DataFrame = corpus =>
      corpus.agg(max(length(col("text"))).as("maxlen"))
    val derive: (DataFrame, DataFrame) => DataFrame = (rows, art) =>
      rows.crossJoin(broadcast(art))
        .select(col("k"), (length(col("text")) * lit(1000L) /
          col("maxlen")).as("score"))
    val one = new DerivedState(spark, tmpRoot(), "score", "k", derive,
      Some(trainer))
    one.train(d)
    one.update(d)
    val incr = new DerivedState(spark, tmpRoot(), "score", "k", derive,
      Some(trainer))
    // update before train must refuse — there is nothing to derive against
    val e = intercept[IllegalArgumentException](incr.update(d))
    assert(e.getMessage.contains("train"))
    incr.train(d)
    (0 to 2).foreach(i => incr.update(d.filter(col("doc_id") % 3 === i)))
    def set(st: DerivedState) = st.derived().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(set(incr) === set(one))
    assert(incr.artifacts().head().getInt(0) ===
      one.artifacts().head().getInt(0))
  }

  test("retrain resets the derived generation and reclaims old versions") {
    val d = fixtureDocs.localCheckpoint()
    val half = d.filter(col("doc_id") % 2 === 0).localCheckpoint()
    val trainer: DataFrame => DataFrame = corpus =>
      corpus.agg(max(length(col("text"))).as("maxlen"))
    val derive: (DataFrame, DataFrame) => DataFrame = (rows, art) =>
      rows.crossJoin(broadcast(art))
        .select(col("k"), (length(col("text")) * lit(1000L) /
          col("maxlen")).as("score"))
    val root = tmpRoot()
    val st = new DerivedState(spark, root, "score", "k", derive,
      Some(trainer))
    st.train(half)      // generation 1: scale from half the corpus
    st.update(half)
    val gen1 = st.derived().count()
    assert(gen1 > 0)
    st.train(d)         // generation 2: new scale — old rows are dead
    assert(st.derived().count() === 0L,
      "retrain must drop rows derived under the old artifacts")
    st.update(d)
    // generation 2 equals a fresh one-shot build on the full corpus
    val fresh = new DerivedState(spark, tmpRoot(), "score", "k", derive,
      Some(trainer))
    fresh.train(d); fresh.update(d)
    def set(s2: DerivedState) = s2.derived().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(set(st) === set(fresh))
    // old generation's version dirs are gone from disk
    val vDirs = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("v")).toSet
    assert(!vDirs.contains("v1") && !vDirs.contains("v2"))
  }

  test("adopt = train-once-distribute; federatedDerived refuses " +
      "independently-trained members") {
    val d = fixtureDocs.localCheckpoint()
    val trainer: DataFrame => DataFrame = corpus =>
      corpus.agg(max(length(col("text"))).as("maxlen"))
    val derive: (DataFrame, DataFrame) => DataFrame = (rows, art) =>
      rows.crossJoin(broadcast(art))
        .select(col("k"), (length(col("text")) * lit(1000L) /
          col("maxlen")).as("score"))
    def mk() = new DerivedState(spark, tmpRoot(), "score", "k", derive,
      Some(trainer))
    val a = mk(); val b = mk()
    a.train(d)
    b.adopt(a)
    // the adopted artifact frame is the trainer's, digest-verified
    assert(b.artifactDigest === a.artifactDigest)
    assert(b.artifactDigest.isDefined)
    assert(b.artifacts().head().getInt(0) === a.artifacts().head().getInt(0))
    // members derive their own (disjoint) halves; the merge equals a
    // single store fed the whole corpus under the same artifacts
    a.update(d.filter(col("doc_id") % 2 === 0))
    b.update(d.filter(col("doc_id") % 2 === 1))
    val merged = DerivedState.federatedDerived(Seq(a, b)).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val one = mk(); one.train(d); one.update(d)
    assert(merged === one.derived().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet)

    // an independently-trained member is INCOMPARABLE: its quantizing
    // artifact differs (trained on half the corpus), and the merge
    // must refuse rather than silently union incompatible codes
    val c = mk()
    // a truncated training corpus guarantees a different maxlen artifact
    c.train(d.withColumn("text", substring(col("text"), 1, 10)))
    assert(c.artifactDigest !== a.artifactDigest,
      "fixture must produce genuinely different artifacts")
    val e = intercept[IllegalArgumentException](
      DerivedState.federatedDerived(Seq(a, c)))
    assert(e.getMessage.contains("adopt"))
    // adopting across derivations refuses too
    val alien = new DerivedState(spark, tmpRoot(), "score:v2", "k",
      derive, Some(trainer))
    val e2 = intercept[IllegalArgumentException](alien.adopt(a))
    assert(e2.getMessage.contains("derivation"))
    // adopt() is a generation reset: rows derived under c's own
    // artifacts die when it adopts the shared ones
    assert(c.update(d.filter(col("doc_id") % 2 === 1)).nDerivedRows > 0)
    c.adopt(a)
    assert(c.derived().count() === 0L,
      "adopt must drop rows derived under the replaced artifacts")
    c.update(d.filter(col("doc_id") % 2 === 1))
    assert(DerivedState.federatedDerived(Seq(a, c)).count() ===
      one.derived().count())
  }

  test("an orphan version dir is invisible; the retried update overwrites it") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val st = new DerivedState(spark, root, "words", "k", wordDerive)
    val d = fixtureDocs.localCheckpoint()
    val b0 = d.filter(col("doc_id") % 3 === 0)
    val b1 = d.filter(col("doc_id") % 3 =!= 0)
    st.update(b0)
    val afterB0 = derivedSet(st)
    // simulate a crash AFTER v2's data writes but BEFORE the CURRENT
    // flip: junk data + manifest land at v2, the pointer still says 1
    Seq(("junk", "junk", 99L)).toDF("k", "word", "c").coalesce(1)
      .write.parquet(s"$root/v2/derived")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/v2/MANIFEST"),
      "keys=1,derived=1".getBytes("UTF-8"))
    // readers resolve through the pointer: the orphan is invisible
    assert(derivedSet(st) === afterB0)
    // the retried batch lands AS v2, overwriting the orphan cleanly
    st.update(b1)
    val oneShot = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive)
    oneShot.update(d)
    assert(derivedSet(st) === derivedSet(oneShot))
    assert(!derivedSet(st).exists(_._1 == "junk"))
  }

  test("compact survives rowless stores: empty batches, train-only") {
    val ss = spark; import ss.implicits._
    // (a) pure-append store whose updates all land empty batches:
    // versions advance, the autoCompact trigger fires, nothing throws
    val st = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive,
      autoCompactEvery = 2)
    val empty = Seq.empty[(String, String)].toDF("k", "text")
    st.update(empty); st.update(empty); st.update(empty)
    assert(st.liveVersionSpan <= 2)
    // (b) trained store compacted before any content arrives: the
    // artifacts must carry through the squash
    val trainer: DataFrame => DataFrame = corpus =>
      corpus.agg(max(length(col("text"))).as("maxlen"))
    val derive: (DataFrame, DataFrame) => DataFrame = (rows, art) =>
      rows.crossJoin(broadcast(art))
        .select(col("k"), (length(col("text")) * lit(1000L) /
          col("maxlen")).as("score"))
    val t = new DerivedState(spark, tmpRoot(), "score", "k", derive,
      Some(trainer))
    t.train(fixtureDocs.limit(50).localCheckpoint())
    t.compact()
    assert(t.artifacts().count() === 1L)
    t.update(fixtureDocs.limit(20).localCheckpoint())
    assert(t.derived().count() > 0)
  }

  test("keyed updates skip replays within a scope, apply across scopes") {
    val d = fixtureDocs.localCheckpoint()
    val st = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive)
    val b0 = d.filter(col("doc_id") % 3 === 0)
    val b1 = d.filter(col("doc_id") % 3 === 1)
    assert(st.update(b0, Some(("cp1", 0L))).isDefined)
    // a crashed foreachBatch replays the same (scope, seq): skipped
    assert(st.update(b0, Some(("cp1", 0L))).isEmpty)
    assert(st.lastAppliedKey === Some(("cp1", 0L)))
    assert(st.update(b1, Some(("cp1", 1L))).isDefined)
    // a NEW checkpoint (different scope) always applies
    assert(st.update(b1, Some(("cp2", 0L))).isDefined)
    // state equals the unkeyed two-batch build (the cp2 replay of b1
    // found no new keys — idempotent content-wise too)
    val plain = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive)
    plain.update(b0); plain.update(b1)
    assert(derivedSet(st) === derivedSet(plain))
  }

  test("update reports the POST-compact version when auto-compaction fires") {
    val d = fixtureDocs.localCheckpoint()
    val st = new DerivedState(spark, tmpRoot(), "words", "k", wordDerive,
      autoCompactEvery = 2)
    st.update(d.filter(col("doc_id") % 2 === 0))
    // this update triggers the compact (span reaches 2): the report
    // must carry a version the READERS can use as an upTo bound
    val r = st.update(d.filter(col("doc_id") % 2 === 1))
    assert(r.version === st.currentVersion,
      "report.version must be usable as keys()/derived() upTo")
    assert(st.keys(r.version).count() > 0)
    assert(st.derived(r.version).count() > 0)
  }

  test("compact sweeps version dirs orphaned below the base") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val st = new DerivedState(spark, root, "words", "k", wordDerive)
    val d = fixtureDocs.localCheckpoint()
    st.update(d.filter(col("doc_id") % 2 === 0))
    st.update(d.filter(col("doc_id") % 2 === 1))
    st.compact()
    // simulate the crash window of a PRIOR compact: a stranded dir
    // below the read base that the interrupted delete loop never
    // reclaimed (invisible to readers, permanently leaked otherwise)
    Seq(("zzz", "zzz", 1L)).toDF("k", "word", "c").coalesce(1)
      .write.parquet(s"$root/v1/derived")
    val before = derivedSet(st)
    st.compact()
    assert(derivedSet(st) === before)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/v1")),
      "the sweep must reclaim dirs below the base")
  }

  test("fingerprint is an open invariant; compact preserves; span bounded") {
    val d = fixtureDocs.localCheckpoint()
    val root = tmpRoot()
    val st = new DerivedState(spark, root, "words:v1", "k", wordDerive,
      autoCompactEvery = 3)
    (0 to 4).foreach { i =>
      st.update(d.filter(col("doc_id") % 5 === i))
      assert(st.liveVersionSpan <= 3,
        s"span ${st.liveVersionSpan} after update $i")
    }
    val before = derivedSet(st)
    st.compact()
    assert(derivedSet(st) === before)
    assert(st.liveVersionSpan === 1L)
    // a different derivation must refuse the same root
    val e = intercept[IllegalArgumentException](
      new DerivedState(spark, root, "words:v2", "k", wordDerive).update(d))
    assert(e.getMessage.contains("row-semantics"))
  }
}
