package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.DedupState

/** The curator → persisted-index handoff: a stream folded through
  * `foreachBatch` lands in the SAME state a one-shot batch build
  * produces, and replayed micro-batches (at-least-once delivery) are
  * absorbed by the store's idempotency key. */
class StreamingDedupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-dedup-index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private val prefixBands: DataFrame => DataFrame = docs =>
    docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))

  private def partitionOf(st: DedupState): Set[(Long, String)] = {
    val dc = st.docClusters()
    val m = st.members().select(col("doc_id"), col("k"))
    val rep = dc.join(m, "doc_id").groupBy("cluster").agg(min("k").as("ck"))
    dc.join(rep, "cluster").select(col("doc_id"), col("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  test("streamed folds equal the one-shot build; state survives restart") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val root = Files.createTempDirectory("sdi-state-").toString
    val ckpt = Files.createTempDirectory("sdi-ckpt-").toString
    val state = new DedupState(spark, root, prefixBands)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedupIndex.indexStream(
      mem.toDF().toDF("doc_id", "text"), state, ckpt)
    mem.addData((1L, "AAA one"), (2L, "AAA two"))
    q.processAllAvailable()
    mem.addData((3L, "AAA three"), (10L, "BBB ten"))
    q.processAllAvailable()
    q.stop()

    val oneShot = new DedupState(spark,
      Files.createTempDirectory("sdi-oneshot-").toString, prefixBands)
    oneShot.update(Seq((1L, "AAA one"), (2L, "AAA two"),
      (3L, "AAA three"), (10L, "BBB ten")).toDF("doc_id", "text"))
    assert(partitionOf(state) === partitionOf(oneShot))

    // a new query (fresh source/checkpoint — MemoryStream cannot
    // resume a foreign checkpoint) folds into the SAME persisted
    // store and continues where the last query left off; the key is
    // scoped by checkpoint, so the new query's batch 0 applies
    // instead of colliding with the old sequence
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingDedupIndex.indexStream(
      mem2.toDF().toDF("doc_id", "text"), state,
      Files.createTempDirectory("sdi-ckpt2-").toString)
    mem2.addData((11L, "BBB eleven"))
    q2.processAllAvailable()
    q2.stop()
    assert(state.docClusters().count() === 5L)
    assert(state.docClusters()
      .filter(col("doc_id").isin(10L, 11L))
      .select("cluster").distinct().count() === 1L,
      "post-restart fold joins the existing BBB component")
  }

  test("a content-generic (embedding) store takes streamed folds") {
    // the generalized store keys on an ARRAY column with weighted
    // features and a cosine admission threshold — the sink must
    // project the stream to the store's OWN content column, and the
    // streamed result must equal the one-shot thresholded build
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val bandsOf: DataFrame => DataFrame =
      src => src.select(col("doc_id"), lit("one").as("bkey"))
    val gramsOf: DataFrame => DataFrame =
      src => src
        .select(col("doc_id"), posexplode(col("text")).as(Seq("i", "f")))
        .select(col("doc_id"), col("i").cast("string").as("g"),
          round(col("f").cast("double") * 1000000L, 0).cast("long").as("w"))
    val keep = (col("jac_num").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))) >= 0.5
    def mk() = new DedupState(spark,
      Files.createTempDirectory("sdi-emb-").toString, bandsOf,
      gramsOf = Some(gramsOf), contentCol = "embedding",
      keyOf = c => md5(concat_ws(",",
        transform(c, x => coalesce(x.cast("string"), lit("∅"))))
        .cast("binary")),
      pairKeep = Some(keep))
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 0.0f)))

    val state = mk()
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingDedupIndex.indexStream(
      mem.toDF().toDF("doc_id", "embedding"), state,
      Files.createTempDirectory("sdi-emb-ckpt-").toString)
    mem.addData(vecs.take(2): _*)
    q.processAllAvailable()
    mem.addData(vecs.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val oneShot = mk()
    oneShot.update(vecs.toDF("doc_id", "embedding"))
    def partition(st: DedupState): Set[Set[Long]] = st.docClusters()
      .groupBy("cluster").agg(collect_set("doc_id").as("ds"))
      .collect().map(_.getSeq[Long](1).toSet).toSet
    assert(partition(state) === partition(oneShot))
    assert(partition(state) === Set(Set(1L, 2L, 4L), Set(3L)))
    // and the stored pair attributes match (exact dot across batches)
    def stats(st: DedupState) = st.livePairStats().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(stats(state) === stats(oneShot))
  }

  test("a replayed micro-batch is skipped at the idempotency key") {
    val ss = spark
    import ss.implicits._
    val root = Files.createTempDirectory("sdi-replay-").toString
    val state = new DedupState(spark, root, prefixBands)
    val batch = Seq((1L, "AAA one"), (2L, "AAA two")).toDF("doc_id", "text")
    assert(state.update(batch, idempotencyKey = Some(("ck1", 0L))).isDefined)
    val before = state.currentVersion
    // foreachBatch redelivers batch 0 after a simulated sink crash
    assert(state.update(batch, idempotencyKey = Some(("ck1", 0L))).isEmpty,
      "replay must be skipped, not double-counted")
    assert(state.currentVersion === before)
    assert(state.members().count() === 2L)
    assert(state.lastAppliedKey === Some(("ck1", 0L)))
    // the next batch applies normally
    assert(state.update(Seq((3L, "CCC three")).toDF("doc_id", "text"),
      idempotencyKey = Some(("ck1", 1L))).isDefined)
    assert(state.members().count() === 3L)
    // a DIFFERENT scope (new checkpoint) restarts its own sequence:
    // its batch 0 must apply, not be mistaken for a replay
    assert(state.update(Seq((4L, "DDD four")).toDF("doc_id", "text"),
      idempotencyKey = Some(("ck2", 0L))).isDefined)
    assert(state.members().count() === 4L)
    assert(state.lastAppliedKey === Some(("ck2", 0L)))
  }

  test("scope upgrade continuity: a store on the legacy 32-bit scope " +
      "keeps its sequence") {
    val cp = "/ckpts/curated-stream-7"
    val legacy = StreamingDedupIndex.legacyScopeOf(cp)
    val modern = StreamingDedupIndex.scopeOf(cp)
    // a store whose CURRENT still carries THIS checkpoint's pre-md5
    // scope keeps it (same sequence → committed-but-unacked replays
    // skip); anything else — fresh store, another checkpoint's key —
    // gets the md5 scope
    assert(StreamingDedupIndex.scopeFor(cp, Some((legacy, 7L))) === legacy)
    assert(StreamingDedupIndex.scopeFor(cp, Some((modern, 7L))) === modern)
    assert(StreamingDedupIndex.scopeFor(cp, Some(("other", 7L))) === modern)
    assert(StreamingDedupIndex.scopeFor(cp, None) === modern)
  }
}
