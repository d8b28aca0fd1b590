package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Btrdb

/** Runnable end-to-end usage example of the engine facade: create a
  * stream, ingest, query raw/windows, delete a range, diff versions.
  * `sbt "runMain graft.Demo [workDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("btrdbspark-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("btrdb-demo").toString)

    val db = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 52,
      pyramidLevels = Seq(8))
    db.createStream("demo-uuid-1", "grid/west", Map("phase" -> "L1"))
    val pts = spark.createDataFrame(
      (0L until 2000L).map(t => (t * 7, math.sin(t / 10.0)))).toDF("time", "value")
    db.insert("demo-uuid-1", pts)
    db.flush("demo-uuid-1")
    println(s"version          = ${db.version("demo-uuid-1")}")
    println(s"first raw times  = " +
      db.rawValues("demo-uuid-1", 0, 100).collect().map(_.getLong(0)).mkString(","))
    val wins = db.alignedWindows("demo-uuid-1", 0, 14000, 10).collect()
    println(s"aligned pw=10    = ${wins.length} windows, total count " +
      wins.map(_.getLong(1)).sum)
    db.deleteRange("demo-uuid-1", 0, 7000)
    println(s"after delete     = ${db.rawValues("demo-uuid-1", 0, 20000).count()} points")
    println(s"changes(0,2)     = " +
      db.changes("demo-uuid-1", 0, 2, 6).collect().map(r =>
        s"[${r.getLong(0)},${r.getLong(1)})").mkString(" "))
    spark.stop()
  }
}
