package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The incremental decontamination index's contract: split-invariance
  * (any batch schedule = the one-shot df-capped build, including grams
  * that cross the cap mid-history), gram work proportional to the
  * batch, and compaction that prunes dead evidence without changing
  * the live set. */
class ContamStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("contam-state-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def tmpRoot(): String =
    Files.createTempDirectory("contam-state-spec-").toString

  private val gramsOf: DataFrame => DataFrame =
    graft.queries.EtlQueries.contamGrams

  private def liveSet(st: ContamState): Set[(String, String)] =
    st.livePostings().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  // docs sharing the 8-gram "SHAREDGR"; suffixes make them distinct
  private def sharer(i: Int) = s"SHAREDGRAM carrier number $i with tail"
  private def loner(i: Int) = s"unique document $i with its own grams"

  test("batched builds equal one-shot, including a gram crossing the cap") {
    val ss = spark; import ss.implicits._
    val cap = 3L
    // batch 1: 2 sharers (under cap) + a loner; batch 2: 2 more
    // sharers push every "SHAREDGR*" stride-gram past df=3 — the
    // one-shot build has no evidence from them, so the incremental
    // store must retire batch 1's postings for those grams too
    val b1 = Seq((1L, sharer(1)), (2L, sharer(2)), (10L, loner(1)))
    val b2 = Seq((3L, sharer(3)), (4L, sharer(4)), (11L, loner(2)))

    val incr = new ContamState(spark, tmpRoot(), gramsOf, cap)
    val r1 = incr.update(b1.toDF("doc_id", "text"))
    assert(r1.nNewDistinct === 3L && r1.nNewlyCapped === 0L)
    val r2 = incr.update(b2.toDF("doc_id", "text"))
    assert(r2.nNewlyCapped > 0L, "shared grams crossed the cap")

    val oneShot = new ContamState(spark, tmpRoot(), gramsOf, cap)
    oneShot.update((b1 ++ b2).toDF("doc_id", "text"))
    assert(liveSet(incr) === liveSet(oneShot))
    // the capped grams really are gone from the live evidence
    val sharedLeft = incr.livePostings()
      .filter(col("g").startsWith("SHAREDGR")).count()
    assert(sharedLeft === 0L)
    // loners' grams survive
    assert(liveSet(incr).nonEmpty)
  }

  test("gram work tracks the batch, duplicates are free, cap mismatch throws") {
    val ss = spark; import ss.implicits._
    val root = tmpRoot()
    val st = new ContamState(spark, root, gramsOf, 10L)
    val corpus = (0 until 40).map(i => (i.toLong, loner(i) + s" extra $i"))
    st.update(corpus.toDF("doc_id", "text"))
    // a batch of pure re-crawls: no new content, ZERO gram work
    val r = st.update(corpus.take(5)
      .map { case (id, t) => (id + 1000L, t) }.toDF("doc_id", "text"))
    assert(r.nBatchDocs === 5L && r.nNewDistinct === 0L && r.nGramRows === 0L)
    // df cap is a persisted invariant
    val bad = new ContamState(spark, root, gramsOf, 11L)
    val e = intercept[IllegalArgumentException] {
      bad.update(Seq((1L, "x")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("df cap"))
  }

  test("compact prunes capped postings, preserves the live set, keeps working") {
    val ss = spark; import ss.implicits._
    val cap = 2L
    val st = new ContamState(spark, tmpRoot(), gramsOf, cap)
    st.update(Seq((1L, sharer(1)), (2L, sharer(2))).toDF("doc_id", "text"))
    st.update(Seq((3L, sharer(3)), (10L, loner(1))).toDF("doc_id", "text"))
    val before = liveSet(st)
    assert(st.compact() === 3L)
    assert(liveSet(st) === before)
    // dead postings physically pruned: all stored rows are live now
    assert(st.postings().count() === st.livePostings().count())
    // a capped gram STAYS capped after its old postings were pruned
    val r = st.update(Seq((4L, sharer(4))).toDF("doc_id", "text"))
    assert(st.livePostings()
      .filter(col("g").startsWith("SHAREDGR")).count() === 0L)
    // and the whole history still equals a one-shot build
    val oneShot = new ContamState(spark, tmpRoot(), gramsOf, cap)
    oneShot.update(Seq((1L, sharer(1)), (2L, sharer(2)), (3L, sharer(3)),
      (10L, loner(1)), (4L, sharer(4))).toDF("doc_id", "text"))
    assert(liveSet(st) === liveSet(oneShot))
  }
}
