package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.DerivedState

/** Streaming folds into the generic derived-content store: a stream
  * fed through `foreachBatch` lands in the SAME state a one-shot batch
  * build produces, replays are absorbed at the idempotency key, and a
  * trained store's frozen artifacts serve every micro-batch. */
class StreamingDerivedIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-derived-index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private val wordDerive: (DataFrame, DataFrame) => DataFrame = (rows, _) =>
    rows.select(col("k"),
        explode(expr("filter(split(text, ' '), x -> length(x) > 0)"))
          .as("word"))
      .groupBy("k", "word").agg(count(lit(1)).as("c"))

  private def derivedSet(st: DerivedState): Set[(String, String, Long)] =
    st.derived().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("streamed folds equal the one-shot build; duplicate keys derive once") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val root = Files.createTempDirectory("sdrv-state-").toString
    val state = new DerivedState(spark, root, "words", "k", wordDerive)
    val mem = MemoryStream[(String, String)]
    val q = StreamingDerivedIndex.indexStream(
      mem.toDF().toDF("k", "text"), state,
      Files.createTempDirectory("sdrv-ckpt-").toString)
    mem.addData(("ka", "alpha beta"), ("kb", "beta gamma gamma"))
    q.processAllAvailable()
    // second micro-batch re-sends ka (seen key: derives nothing new)
    mem.addData(("ka", "alpha beta"), ("kc", "delta"))
    q.processAllAvailable()
    q.stop()

    val oneShot = new DerivedState(spark,
      Files.createTempDirectory("sdrv-oneshot-").toString, "words", "k",
      wordDerive)
    oneShot.update(Seq(("ka", "alpha beta"), ("kb", "beta gamma gamma"),
      ("kc", "delta")).toDF("k", "text"))
    assert(derivedSet(state) === derivedSet(oneShot))
    // both micro-batches applied under the checkpoint scope
    assert(state.lastAppliedKey.exists(_._2 == 1L))
  }

  test("a replayed micro-batch is skipped at the idempotency key") {
    val ss = spark; import ss.implicits._
    val root = Files.createTempDirectory("sdrv-replay-").toString
    val state = new DerivedState(spark, root, "words", "k", wordDerive)
    val b = Seq(("ka", "alpha")).toDF("k", "text")
    assert(state.update(b, Some(("cp", 0L))).isDefined)
    val vAfter = state.currentVersion
    // the crash-replay path foreachBatch takes: same (scope, seq)
    assert(state.update(b, Some(("cp", 0L))).isEmpty)
    assert(state.currentVersion === vAfter,
      "a replay must not churn version dirs")
  }
}
