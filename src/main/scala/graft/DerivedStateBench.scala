package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the generic derived-content store
  * ([[graft.etl.DerivedState]]): for the heaviest memo family (the
  * unigram word table) and a trained family (SQ8 codes), measure
  *
  *   1. `*_init_sec` — one-shot feed of the whole corpus (the cost the
  *      store exists to never pay twice; for SQ8 this includes the
  *      scale training), and
  *   2. `*_fold_sec` — folding a fresh ~1% batch in incrementally.
  *
  * The claim under test is fold cost ∝ batch: at the 100× replica the
  * fold stays near the 1× figure while the corpus-sided key index has
  * grown 100× (it is scanned bucket-pruned, never re-derived). Prints
  * ONE JSON line. Usage:
  * {{{
  *   SPARK_GRAFT_SF_DIR=/tmp/sf001x100 sbt "runMain graft.DerivedStateBench"
  * }}}
  */
object DerivedStateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def freshRoot() = java.nio.file.Files
      .createTempDirectory("derived-state-bench-").toString

    // ---- word table over documents ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("k"),
        col("text")).localCheckpoint()
    val batch = docs.filter(col("doc_id") % 101 === 0).localCheckpoint()
    val corpus = docs.filter(col("doc_id") % 101 =!= 0).localCheckpoint()
    val fresh = batch.select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("edited crawl revision: "), col("text")).as("text"))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("k"),
        col("text")).localCheckpoint()
    val wordDerive: (DataFrame, DataFrame) => DataFrame = (rows, _) =>
      rows.select(col("k"),
          explode(expr("filter(split(text, ' '), x -> length(x) > 0)"))
            .as("word"))
        .groupBy("k", "word").agg(count(lit(1)).as("c"))
    // warmup: JIT + file cache on a throwaway store
    new graft.etl.DerivedState(spark, freshRoot(), "words", "k", wordDerive)
      .update(batch)
    val wst = new graft.etl.DerivedState(spark, freshRoot(), "words", "k",
      wordDerive)
    val (_, wInit) = timed(wst.update(corpus))
    val (wRep, wFold) = timed(wst.update(fresh))

    // ---- SQ8 codes over embeddings (trained family) ----
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val eBatch = emb.filter(col("vec_id") % 101 === 0).localCheckpoint()
    val eCorpus = emb.filter(col("vec_id") % 101 =!= 0).localCheckpoint()
    val sc: DataFrame => DataFrame = e => e
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "f")))
      .select(col("vec_id"), col("i"), col("f").cast("double").as("v"))
    val trainer: DataFrame => DataFrame = c =>
      sc(c).agg(max(abs(col("v"))).as("gmax"))
    val sq8Derive: (DataFrame, DataFrame) => DataFrame = (rows, gm) =>
      sc(rows).crossJoin(broadcast(gm))
        .select(col("vec_id"), col("i"),
          round(col("v") * 127 / col("gmax"), 0).cast("long").as("q"))
    val sst = new graft.etl.DerivedState(spark, freshRoot(), "sq8",
      "vec_id", sq8Derive, Some(trainer))
    val (_, sInit) = timed { sst.train(eCorpus); sst.update(eCorpus) }
    val (sRep, sFold) = timed(sst.update(eBatch))

    // ---- PQ codes (trained family, round 20): per-sub-space L2
    // codebooks + the m-wide code fold — the compressed-ANN index
    // cadence (the q_ann_pq store's trainer/derive shape)
    val (pqM, pqSub, pqK) = (8, 8, 16)
    def pqSubCol(e: org.apache.spark.sql.Column, sIdx: Int) =
      slice(e, sIdx * pqSub + 1, pqSub)
    val pqTrainer: DataFrame => DataFrame = c => {
      val cents = (0 until pqM).flatMap { sIdx =>
        val sub = c.select(col("vec_id"),
          pqSubCol(col("embedding"), sIdx).as("embedding"))
        val c0 = graft.etl.KMeans.quantizedCentroids(
          sub.withColumn("cluster", col("vec_id") % pqK))
        val c1 = graft.etl.KMeans.quantizedCentroids(
          sub.withColumn("cluster",
            graft.etl.KMeans.assignL2(col("embedding"), c0)))
        c1.map(x => x.copy(id = sIdx * pqK + x.id))
      }
      graft.etl.KMeans.centroidRows(spark, cents)
    }
    val pqDerive: (DataFrame, DataFrame) => DataFrame = (rows, arts) => {
      val bySub = graft.etl.KMeans.centroidsFromRows(arts)
        .groupBy(x => (x.id / pqK).toInt)
        .map { case (k2, cs) =>
          k2 -> cs.map(x => x.copy(id = x.id % pqK)).sortBy(_.id) }
      rows.select(col("vec_id") +: (0 until pqM).map(sIdx =>
        graft.etl.KMeans.assignL2(pqSubCol(col("embedding"), sIdx),
          bySub(sIdx)).as(s"c$sIdx")): _*)
    }
    val pst = new graft.etl.DerivedState(spark, freshRoot(), "pq",
      "vec_id", pqDerive, Some(pqTrainer))
    val (_, pInit) = timed { pst.train(eCorpus); pst.update(eCorpus) }
    val (pRep, pFold) = timed(pst.update(eBatch))

    // ---- LM trigram conditional score (trained family, round 16):
    // same trainer/derive as the q_lm_score fixture path, so the
    // fold-cost shape here IS the shipped family's
    val lmTrainer = graft.queries.EtlQueries.lmTrainer
    val lmDerive = graft.queries.EtlQueries.lmDerive
    val lst = new graft.etl.DerivedState(spark, freshRoot(), "lm3", "k",
      lmDerive, Some(lmTrainer))
    val (_, lInit) = timed { lst.train(corpus); lst.update(corpus) }
    val (lRep, lFold) = timed(lst.update(fresh))

    println(s"""{"metric":"derived_state","word_init_sec":$wInit,""" +
      s""""word_fold_sec":$wFold,""" +
      s""""word_fold_new_keys":${wRep.nNewKeys},""" +
      s""""word_fold_rows":${wRep.nDerivedRows},""" +
      s""""sq8_init_sec":$sInit,"sq8_fold_sec":$sFold,""" +
      s""""sq8_fold_new_keys":${sRep.nNewKeys},""" +
      s""""sq8_fold_rows":${sRep.nDerivedRows},""" +
      s""""lm_init_sec":$lInit,"lm_fold_sec":$lFold,""" +
      s""""lm_fold_new_keys":${lRep.nNewKeys},""" +
      s""""lm_fold_rows":${lRep.nDerivedRows},""" +
      s""""pq_init_sec":$pInit,"pq_fold_sec":$pFold,""" +
      s""""pq_fold_new_keys":${pRep.nNewKeys},""" +
      s""""pq_fold_rows":${pRep.nDerivedRows},""" +
      s""""corpus_docs":${corpus.count()},"sf":"$sfDir"}""")
    spark.stop()
  }
}
