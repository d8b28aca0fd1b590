package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Btrdb
import graft.etl.DedupState

/** The operator console ([[AdminCli]]): every maintenance command an
  * operator needs runs against real roots and reports a JSON line —
  * the reference ships this surface as a CLI plugin, so the engine
  * owes its operators the same reach without an sbt console. */
class AdminCliSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("admin-cli-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def run(args: String*): String =
    AdminCli.run(args.toArray, () => spark)

  test("engine commands: info, stream, compact, repair, purge") {
    val ss = spark; import ss.implicits._
    val root = Files.createTempDirectory("admin-cli-engine-").toString
    val db = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 44,
      pyramidLevels = Seq(20, 30), lockRoot = false)
    db.createStream("admin-uuid", "ops/a", Map("unit" -> "v"))
    val pts = (0L until 4096L).map(i => (i * 1000L, i.toDouble))
      .toDF("time", "value")
    db.insert("admin-uuid", pts)
    db.flush("admin-uuid")
    db.insert("admin-uuid",
      Seq((5000000L, 1.0)).toDF("time", "value"))
    db.flush("admin-uuid")

    val info = run("info", root)
    assert(info.contains(""""op":"info"""") &&
      info.contains(""""streams":1""") &&
      info.contains(""""ops/a""""), info)
    val si = run("stream", root, "admin-uuid")
    assert(si.contains(""""uuid":"admin-uuid"""") &&
      si.contains(""""major":2"""), si)
    // compact squashes the commit archive; reads unchanged
    val before = db.rawValues("admin-uuid", 0, Long.MaxValue / 2).count()
    val c = run("compact", root, "admin-uuid")
    assert(c.contains(""""op":"compact""""), c)
    db.refreshCommits()
    assert(db.rawValues("admin-uuid", 0, Long.MaxValue / 2).count()
      === before)
    val rep = run("repair", root, "admin-uuid")
    assert(rep.contains(""""op":"repair"""), rep)
    // purge after obliterate reclaims the stream's data
    db.obliterate("admin-uuid")
    val purged = run("purge", root)
    assert(purged.contains(""""purged_sids":["""), purged)
  }

  test("store commands: status and compaction over a real dedup root") {
    val ss = spark; import ss.implicits._
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    val root = Files.createTempDirectory("admin-cli-store-").toString
    val st = new DedupState(spark, root, prefixBands)
    st.update(Seq((1L, "AAA one"), (2L, "AAA two")).toDF("doc_id", "text"))
    st.update(Seq((3L, "BBB three")).toDF("doc_id", "text"))

    // status is pure metadata (no Spark needed): pointer + META +
    // per-live-version manifests
    val status = run("store-status", root)
    assert(status.contains(""""version":2""") &&
      status.contains(""""base":1""") &&
      status.contains(""""live_versions":2""") &&
      status.contains("maxBucket="), status)

    // compaction through the CLI: span collapses to 1, reads unchanged
    val before = st.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = run("store-compact", "dedup", root)
    assert(out.contains(""""op":"store-compact"""") &&
      out.contains(""""version":3"""), out)
    val reopened = graft.etl.EtlViews.openDedup(spark, root)
    assert(reopened.liveVersionSpan === 1L)
    assert(reopened.docClusters().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === before)

    // unknown commands/kinds refuse loudly
    intercept[IllegalArgumentException](run("store-compact", "nope", root))
    intercept[IllegalArgumentException](run("frobnicate"))
  }

  test("store-fold: console-driven federation fold over member deltas") {
    val ss = spark; import ss.implicits._
    val prefixBands: DataFrame => DataFrame = docs =>
      docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))
    def member() = new DedupState(spark,
      Files.createTempDirectory("admin-cli-fedm-").toString, prefixBands)
    val (a, b) = (member(), member())
    a.update(Seq((1L, "AAA one"), (2L, "AAA two")).toDF("doc_id", "text"))
    b.update(Seq((3L, "AAA three")).toDF("doc_id", "text"))
    val fedRoot = Files.createTempDirectory("admin-cli-fed-").toString
    // the pipeline creates the store (first fold writes MEMBERS) …
    new graft.etl.FedDedupState(spark, fedRoot, Seq(a, b)).fold()

    // … and the console folds later member deltas on demand
    a.update(Seq((4L, "AAA four")).toDF("doc_id", "text"))
    val out = run("store-fold", "fed-dedup", fedRoot)
    assert(out.contains(""""op":"store-fold"""") &&
      out.contains(""""folded":true""") &&
      out.contains(""""version":2"""), out)
    // cross-member pairs visible through a fresh read handle
    val fed = graft.etl.EtlViews.openFedDedup(spark, fedRoot)
    assert(fed.livePairCounts().count() > 0)

    // nothing unabsorbed → reports folded:false, burns no version
    val noop = run("store-fold", "fed-dedup", fedRoot)
    assert(noop.contains(""""folded":false""") &&
      !noop.contains(""""version":"""), noop)
    assert(graft.etl.EtlViews.openFedDedup(spark, fedRoot)
      .currentVersion === 2L)

    intercept[IllegalArgumentException](run("store-fold", "dedup", fedRoot))
  }
}
