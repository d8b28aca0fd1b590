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

  test("a TRAINED store (PQ codes) streams: frozen codebooks serve " +
       "every micro-batch, streamed codes equal the one-shot build") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val (pqM, pqSub, pqK) = (2, 2, 2)
    def subCol(e: org.apache.spark.sql.Column, s: Int) =
      slice(e, s * pqSub + 1, pqSub)
    val trainer: DataFrame => DataFrame = c => {
      val cents = (0 until pqM).flatMap { s =>
        val sub = c.select(col("vec_id"),
          subCol(col("embedding"), s).as("embedding"))
        val c0 = graft.etl.KMeans.quantizedCentroids(
          sub.withColumn("cluster", col("vec_id") % pqK))
        val c1 = graft.etl.KMeans.quantizedCentroids(
          sub.withColumn("cluster",
            graft.etl.KMeans.assignL2(col("embedding"), c0)))
        c1.map(x => x.copy(id = s * pqK + x.id))
      }
      graft.etl.KMeans.centroidRows(spark, cents)
    }
    val derive: (DataFrame, DataFrame) => DataFrame = (rows, arts) => {
      val bySub = graft.etl.KMeans.centroidsFromRows(arts)
        .groupBy(x => (x.id / pqK).toInt)
        .map { case (k2, cs) =>
          k2 -> cs.map(x => x.copy(id = x.id % pqK)).sortBy(_.id) }
      rows.select(col("vec_id") +: (0 until pqM).map(s =>
        graft.etl.KMeans.assignL2(subCol(col("embedding"), s),
          bySub(s)).as(s"c$s")): _*)
    }
    val train = Seq(
      0L -> Array(0.1f, 0.2f, 0.9f, 0.8f),
      1L -> Array(0.8f, 0.9f, 0.1f, 0.2f),
      2L -> Array(0.15f, 0.22f, 0.88f, 0.79f),
      3L -> Array(0.81f, 0.88f, 0.12f, 0.18f)).toDF("vec_id", "embedding")
    val st = new DerivedState(spark,
      Files.createTempDirectory("sdrv-pq-").toString, "pq", "vec_id",
      derive, Some(trainer))
    st.train(train)
    val artsBefore = st.artifacts().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingDerivedIndex.indexStream(
      mem.toDF().toDF("vec_id", "embedding"), st,
      Files.createTempDirectory("sdrv-pq-ckpt-").toString)
    mem.addData(0L -> Array(0.1f, 0.2f, 0.9f, 0.8f),
      1L -> Array(0.8f, 0.9f, 0.1f, 0.2f))
    q.processAllAvailable()
    // later micro-batch: NEW vectors code against the FROZEN codebooks
    mem.addData(4L -> Array(0.12f, 0.19f, 0.91f, 0.77f),
      5L -> Array(0.79f, 0.91f, 0.09f, 0.21f))
    q.processAllAvailable()
    q.stop()
    assert(st.artifacts().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      === artsBefore, "streaming folds must never retrain the codebooks")
    val oneShot = new DerivedState(spark,
      Files.createTempDirectory("sdrv-pq-oneshot-").toString, "pq",
      "vec_id", derive, Some(trainer))
    oneShot.train(train)
    oneShot.update(Seq(
      0L -> Array(0.1f, 0.2f, 0.9f, 0.8f),
      1L -> Array(0.8f, 0.9f, 0.1f, 0.2f),
      4L -> Array(0.12f, 0.19f, 0.91f, 0.77f),
      5L -> Array(0.79f, 0.91f, 0.09f, 0.21f)).toDF("vec_id", "embedding"))
    def codes(s2: DerivedState) = s2.derived().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(codes(st) === codes(oneShot))
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
