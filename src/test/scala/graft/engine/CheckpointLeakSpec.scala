package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance passes (pyramid fold, compact, purge) materialize
  * intermediate frames via local checkpoints whose blocks the
  * CacheManager never tracks — `Dataset.unpersist` cannot free them.
  * On a long-lived ingest driver an unreleased checkpoint per commit is
  * unbounded block-manager growth. This spec pins the contract: after
  * the deliberate metadata caches are seeded, ANY number of
  * insert/flush/delete/compact/purge cycles leaves the persistent-RDD
  * registry no larger than it started.
  */
class CheckpointLeakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("checkpoint-leak-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("ingest + maintenance cycles do not grow the persistent-RDD registry") {
    val dir = Files.createTempDirectory("leakspec").toString
    val db = new Btrdb(spark, dir, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L,
      pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12, commitRangePw = 8)
    def insert(uuid: String, pts: Seq[(Long, Double)]): Unit =
      db.insert(uuid, spark.createDataFrame(pts).toDF("time", "value"))

    db.createStream("u-a", "leak/a", Map("k" -> "a"))
    db.createStream("u-b", "leak/b", Map("k" -> "b"))
    // one full cycle of every maintenance shape seeds the deliberate
    // caches (catalog, commits) at their steady-state footprint
    insert("u-a", (0L until 256L).map(t => (t, 1.0)))
    db.deleteRange("u-a", 0L, 64L)
    db.compact("u-a")
    insert("u-b", (0L until 64L).map(t => (t, 2.0)))
    db.obliterate("u-b")
    db.purgeObliterated()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet.size

    // every commit runs a pyramid fold (one checkpoint each); deletes +
    // compact run the recompute and compact checkpoints; purge runs the
    // point-log and pyramid rewrite checkpoints
    (0 until 4).foreach { i =>
      insert("u-a", (i * 1000L until i * 1000L + 128L).map(t => (t, i.toDouble)))
    }
    db.deleteRange("u-a", 1000L, 1100L)
    db.compact("u-a")
    db.createStream("u-c", "leak/c", Map("k" -> "c"))
    insert("u-c", (0L until 64L).map(t => (t, 3.0)))
    db.obliterate("u-c")
    db.purgeObliterated()

    val now = spark.sparkContext.getPersistentRDDs.keySet.size
    assert(now <= baseline,
      s"persistent-RDD registry grew from $baseline to $now — a " +
        "maintenance checkpoint is leaking block-manager storage")
    db.close()
  }

  test("checkpoint release drops exactly its own RDD, never a bystander") {
    val dir = Files.createTempDirectory("leakspec2").toString
    val db = new Btrdb(spark, dir, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L,
      pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12, commitRangePw = 8)
    import org.apache.spark.sql.functions.lit
    def registry = spark.sparkContext.getPersistentRDDs.keySet
    val before = registry
    val (cp, release) = db.checkpointReleasable(
      spark.range(200).withColumn("v", lit(1.0)).toDF())
    val own = registry.diff(before)
    assert(own.nonEmpty, "the eager checkpoint must persist an RDD")
    assert(cp.count() == 200)
    // a cache materialized while the checkpoint is LIVE (the window in
    // which a registry-diff release would misattribute it)
    val bystander = spark.range(100).withColumn("v", lit(2.0)).cache()
    bystander.count()
    release()
    val after = registry
    assert(own.forall(!after.contains(_)),
      s"release() left the checkpoint's own RDD(s) $own persisted")
    assert(after.exists(id => !before.contains(id) && !own.contains(id)),
      "bystander cache should still be registered after release()")
    bystander.unpersist(blocking = true)
    db.close()
  }
}
