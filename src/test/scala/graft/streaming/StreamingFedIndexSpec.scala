package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DedupState, FedDedupState}

/** Streaming federation maintenance ([[StreamingFedIndex]]): member
  * micro-batch folds followed by the AUTOMATIC federation fold must
  * land the federation store in the same state as the one-shot merge
  * over the final member corpora — on any cadence, with the skipped
  * ticks' deltas absorbed by the next fold. */
class StreamingFedIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-fed-index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private val prefixBands: DataFrame => DataFrame = docs =>
    docs.select(col("doc_id"), substring(col("text"), 1, 3).as("bkey"))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Label-independent clustering view over (doc_id, content key). */
  private def partitionOf(clusters: DataFrame, docs: DataFrame)
      : Set[(Long, String)] = {
    val keyed = clusters.join(
      docs.select(col("doc_id"), md5(col("text").cast("binary")).as("k")),
      "doc_id")
    val rep = keyed.groupBy("cluster").agg(min("k").as("ck"))
    keyed.join(rep, "cluster").select(col("doc_id"), col("ck"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  test("streamed member folds + automatic federation folds equal the " +
      "one-shot merge (including a cadence that skips ticks)") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val a = new DedupState(spark, tmp("sfi-a-"), prefixBands)
    val b = new DedupState(spark, tmp("sfi-b-"), prefixBands)
    val fed = new FedDedupState(spark, tmp("sfi-fed-"), Seq(a, b))
    val memA = MemoryStream[(Long, String)]
    val memB = MemoryStream[(Long, String)]
    // foldEvery = 2: the federation folds on every SECOND member
    // micro-batch — the skipped tick's delta must be absorbed by the
    // next fold, exactly (watermark batching, never loss)
    val qs = StreamingFedIndex.indexStreams(
      Seq(memA.toDF().toDF("doc_id", "text") -> tmp("sfi-ckpt-a-"),
        memB.toDF().toDF("doc_id", "text") -> tmp("sfi-ckpt-b-")),
      fed, foldEvery = 2)
    // cross-member near-dups ("AAA" prefix buckets span members) and
    // identical content in BOTH members (docs 2 and 5 — star collapse)
    memA.addData((1L, "AAA one"), (2L, "AAA shared"))
    qs.foreach(_.processAllAvailable())
    memB.addData((5L, "AAA shared"), (6L, "BBB six"))
    qs.foreach(_.processAllAvailable())
    memA.addData((3L, "BBB three"))
    qs.foreach(_.processAllAvailable())
    memB.addData((8L, "CCC eight"))
    qs.foreach(_.processAllAvailable())
    qs.foreach(_.stop())
    // drain: absorb anything past the last cadence tick
    fed.fold()

    val d = Seq((1L, "AAA one"), (2L, "AAA shared"), (3L, "BBB three"),
      (5L, "AAA shared"), (6L, "BBB six"), (8L, "CCC eight"))
      .toDF("doc_id", "text")
    val want = partitionOf(DedupState.federatedDocClusters(Seq(a, b)), d)
    assert(partitionOf(fed.docClusters(), d) === want)
    assert(fed.docClusters().count() === 6L)
    // idempotency: nothing left to absorb
    assert(fed.fold().isEmpty)
  }
}
