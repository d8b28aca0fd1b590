package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DebugRepro extends AnyFunSuite {
  test("repro pinned read") {
    val spark = SparkSession.builder().master("local[4]")
      .appName("dbg").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("dbgrepro").toString
    val owner = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L, pyramidLevels = Seq(4, 8),
      pyramidWBucketPw = 12, commitRangePw = 8)
    val uuid = "u-iso"
    owner.createStream(uuid, "iso/a", Map("k" -> "v"))
    owner.insert(uuid, spark.createDataFrame(
      (0L until 64L).map(t => (t, 1.0))).toDF("time", "value"))
    val reader = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L, pyramidLevels = Seq(4, 8),
      pyramidWBucketPw = 12, commitRangePw = 8, lockRoot = false)
    println("DBG latest=" + reader.rawValues(uuid, 0, 4096).count())
    println("DBG version=" + reader.version(uuid))
    println("DBG pinned-before=" + reader.rawValues(uuid, 0, 4096, version = 1).count())
    owner.insert(uuid, spark.createDataFrame(
      (100L until 164L).map(t => (t, 2.0))).toDF("time", "value"))
    println("DBG pinned-after-ins=" + reader.rawValues(uuid, 0, 4096, version = 1).count())
    owner.deleteRange(uuid, 0L, 32L)
    println("DBG pinned-after-del=" + reader.rawValues(uuid, 0, 4096, version = 1).count())
    println("DBG owner-pinned=" + owner.rawValues(uuid, 0, 4096, version = 1).count())
    val pts = spark.read.parquet(s"$root/points")
    pts.groupBy("version").count().show()
    owner.close(); reader.close()
    spark.stop()
  }
}
