package graft.queries

import org.apache.spark.sql.SparkSession

/** One-off: report memo-frame partition counts and row counts. */
object MemoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    
    val frames: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "contamPostings" -> EtlQueries.contamPostings(spark, sfDir),
      "fedContamPostings" -> EtlQueries.fedContamPostings(spark, sfDir),
      "docKeys" -> EtlQueries.docKeys(spark, sfDir),
      "distinctGroups" -> EtlQueries.distinctGroups(spark, sfDir),
      "groupMembers" -> EtlQueries.groupMembers(spark, sfDir),
      "repWordCounts" -> EtlQueries.repWordCounts(spark, sfDir),
      "repTriGrams" -> EtlQueries.repTriGrams(spark, sfDir))
    frames.foreach { case (n, df) =>
      println(f"MEMOPROBE $n%-20s parts=${df.rdd.getNumPartitions}%4d rows=${df.count()}")
    }
    spark.stop()
  }
}
