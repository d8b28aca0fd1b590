package graft

import org.apache.spark.sql.SparkSession

/** Media-decode throughput probe: SCALE.md's claim for the codec
  * registry is "narrow per-partition decode, memory-bounded, cost
  * linear in payload" — this main MEASURES it per codec instead of
  * asserting it. It synthesizes `repl` copies of the corpus's document
  * texts (distinct content shifted per replica so nothing dedups away),
  * routes every asset class through the same quarantining
  * [[graft.etl.Multimodal.decodeAll]] iterator the pipeline uses, and
  * times one full decode pass per kind — reporting assets/s and
  * decoded MB/s, plus the reject tally (the edge-case residues ride
  * along, so the quarantine's cost sits IN the measured number, not
  * beside it).
  *
  * `sbt "runMain graft.MediaBench [repl]"` over
  * `SPARK_GRAFT_SF_DIR` (default /root/testdata/sf0.1). One JSON line.
  */
object MediaBench {
  def main(args: Array[String]): Unit = {
    val repl = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.etl.Multimodal

    // replicate with doc_id striding so every replica keeps its residue
    // class (doc_id % 32 routing survives +32k shifts) but carries
    // distinct content (a per-replica prefix)
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("source"),
        col("n_chars").cast("long"))
    val maxId = docs0.agg(max("doc_id")).head().getLong(0)
    val stride = ((maxId / 32) + 1) * 32 // residue-preserving shift
    val docs = (0 until repl).map { r =>
      docs0.select((col("doc_id") + lit(r * stride)).as("doc_id"),
        concat(lit(s"r$r "), col("text")).as("text"),
        col("source"), (col("n_chars") + lit(2 + r.toString.length))
          .as("n_chars"))
    }.reduce(_ union _)
    val assets = Multimodal.assetsWithEdgeCases(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = assets.count() // materialize containers OUTSIDE the timing

    def pass(kindFilter: String => Boolean): (Long, Long, Long, Double) = {
      val t0 = System.nanoTime()
      val agg = Multimodal.decodeAll(
          assets.filter((a: Multimodal.Asset) => kindFilter(a.kind)))
        .toDF()
        .agg(count(lit(1)), sum(when(col("ok"), 0L).otherwise(1L)),
          sum(col("n_bytes")))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), sec)
    }
    // warmup (JIT the codecs)
    pass(_ => true)
    val kinds = Seq(
      "all" -> ((_: String) => true),
      "wav" -> ((k: String) => k == "audio/wav"),
      "flac" -> ((k: String) => k == "audio/flac"),
      "png" -> ((k: String) => k == "image/png"),
      "jpeg" -> ((k: String) => k == "image/jpeg"),
      "bmp" -> ((k: String) => k == "image/bmp"),
      "gif" -> ((k: String) => k == "image/gif"))
    val lines = kinds.map { case (name, f) =>
      val (n, rejects, bytes, sec) = pass(f)
      val mbps = bytes / 1e6 / sec
      f""""$name":{"assets":$n,"rejects":$rejects,"assets_per_s":${(n / sec).toLong},"mb_per_s":${mbps.toLong},"sec":${"%.3f".format(sec)}}"""
    }
    // Format-invariant dup-query slope lines: the full decode + digest
    // groupBy pipelines of q_media_dup / q_media_dup_raster — plus the
    // container-walk tier (q_media_dup_tagged: six kinds, two variants
    // each) and the animation-render tier (q_media_gif_render) — over
    // the RAW corpus dir (median of 3, one warmup) — point
    // SPARK_GRAFT_SF_DIR at a tools/make_grow.py dir for a
    // GENUINE-growth slope (replicas only prove replication invariance).
    val dupLines = Seq("q_media_dup", "q_media_dup_raster",
        "q_media_dup_tagged", "q_media_gif_render").map { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, sfDir).count() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      f""""$q":{"sec":${"%.3f".format(med)},"groups":${ts.head._2}}"""
    }
    println(s"""{"metric":"media_decode","repl":$repl,""" +
      s""""spark_master":"local[$cpus]","total_assets":$total,""" +
      (lines ++ dupLines).mkString(",") + "}")
    assets.unpersist()
    spark.stop()
  }
}
