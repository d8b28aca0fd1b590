package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the incremental dedup store
  * ([[graft.etl.DedupState]]): against a corpus directory, measure
  *
  *   1. `init_sec` — one-shot state build over the whole corpus (the
  *      cost the store exists to never pay twice), and
  *   2. `update_sec` — folding in a ~1% crawl batch incrementally.
  *
  * The claim under test is update cost ∝ batch: at the 100× replica the
  * init grows ~linearly while the update stays near the 1× figure (its
  * corpus-sided inputs are narrow persisted indexes, scanned not
  * re-derived). Prints ONE JSON line. Usage:
  * {{{
  *   SPARK_GRAFT_SF_DIR=/tmp/sf001x100 sbt "runMain graft.DedupStateBench"
  * }}}
  */
object DedupStateBench {
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    // ~1% of docs as the incoming crawl batch, rest as the corpus
    val batch = docs.filter(col("doc_id") % 101 === 0).localCheckpoint()
    val corpus = docs.filter(col("doc_id") % 101 =!= 0).localCheckpoint()
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def freshRoot() = java.nio.file.Files
      .createTempDirectory("dedup-state-bench-").toString

    val bandsOf = graft.queries.EtlQueries.bandKeys _
    // warmup: JIT + file cache on a throwaway store
    new graft.etl.DedupState(spark, freshRoot(), bandsOf).update(batch)

    val st = new graft.etl.DedupState(spark, freshRoot(), bandsOf)
    val (_, initSec) = timed(st.update(corpus))
    val (rep, updSec) = timed(st.update(batch))
    // a second batch of genuinely NEW near-dup content (the batch's
    // texts lightly edited): exercises the signature + pairing + CC
    // path, not just the digest anti-join
    val fresh = batch.select((col("doc_id") + 10000000L).as("doc_id"),
      concat(lit("edited crawl revision: "), col("text")).as("text"))
      .localCheckpoint()
    val (rep2, updSec2) = timed(st.update(fresh))

    // same probe for the decontamination index (the second application
    // of the versioned-store pattern): init over the corpus, then fold
    // the fresh near-dup batch in at batch cost
    val cst = new graft.etl.ContamState(spark, freshRoot(),
      graft.queries.EtlQueries.contamGrams, dfCap = 10L)
    val (_, cInitSec) = timed(cst.update(corpus))
    val (crep, cUpdSec) = timed(cst.update(fresh))

    // FEDERATED merges (the topology-time steps — member migration /
    // corpus-wide reports, NOT the ingest path): two member stores over
    // a parity split of the corpus, then the global merge. Cost is
    // documented ∝ corpus edges (dedup) / unioned index (contam), so
    // at the 100× replica these lines grow ~linearly — the probe pins
    // the constant and catches any accidental super-linearity.
    val ma = new graft.etl.DedupState(spark, freshRoot(), bandsOf)
    val mb = new graft.etl.DedupState(spark, freshRoot(), bandsOf)
    ma.update(corpus.filter(col("doc_id") % 2 === 0))
    mb.update(corpus.filter(col("doc_id") % 2 === 1))
    val (fedDocs, fedSec) = timed(
      graft.etl.DedupState.federatedDocClusters(Seq(ma, mb)).count())
    val ca = new graft.etl.ContamState(spark, freshRoot(),
      graft.queries.EtlQueries.contamGrams, dfCap = 10L)
    val cb = new graft.etl.ContamState(spark, freshRoot(),
      graft.queries.EtlQueries.contamGrams, dfCap = 10L)
    ca.update(corpus.filter(col("doc_id") % 2 === 0))
    cb.update(corpus.filter(col("doc_id") % 2 === 1))
    val (fedPosts, fedPostSec) = timed(
      graft.etl.ContamState.federatedLivePostings(Seq(ca, cb)).count())
    // federated PAIR REPORT over gram-attributed members (cross-member
    // candidates scored at merge time through the pruned feats probes
    // — the round-14 reader); same linear-in-corpus-edges contract
    val ga = new graft.etl.DedupState(spark, freshRoot(), bandsOf,
      gramsOf = Some(graft.queries.EtlQueries.gram4Of _))
    val gb = new graft.etl.DedupState(spark, freshRoot(), bandsOf,
      gramsOf = Some(graft.queries.EtlQueries.gram4Of _))
    ga.update(corpus.filter(col("doc_id") % 2 === 0))
    gb.update(corpus.filter(col("doc_id") % 2 === 1))
    val (fedPairs, fedPairSec) = timed(
      graft.etl.DedupState.federatedLivePairStats(Seq(ga, gb)).count())

    // INCREMENTAL federation stores: the same merges as versioned
    // stores folding MEMBER DELTAS ([[graft.etl.FedDedupState]] /
    // [[graft.etl.FedContamState]]). The first fold absorbs the whole
    // corpus (the topology-time cost, paid once); the DELTA fold after
    // a member ingests the ~1% crawl batch must stay near the
    // single-store update figure — ∝ the member delta, never corpus
    // edges — the line that retires the per-refresh cost the one-shot
    // readers above pay on every invocation.
    val fedSt = new graft.etl.FedDedupState(spark, freshRoot(), Seq(ma, mb))
    val (_, fedInitSec) = timed(fedSt.fold())
    ma.update(batch)
    val (fedRep, fedFoldSec) = timed(fedSt.fold())
    val cFed = new graft.etl.FedContamState(spark, freshRoot(), Seq(ca, cb))
    val (_, cFedInitSec) = timed(cFed.fold())
    ca.update(batch)
    val (_, cFedFoldSec) = timed(cFed.fold())

    // WINNOW-MATCH federation (the third banding family, round 16):
    // member match stores band on winnow fingerprints (from-text here;
    // the fixture path feeds them from the shared selection store —
    // same banding rows, so the fold-cost shape is identical), folded
    // into one FedDedupState, then the livePairCounts read that serves
    // q_winnow_fed. Same contracts under test: init ∝ corpus ONCE,
    // delta fold ∝ the member batch, the read ∝ live pairs.
    val winBands = graft.queries.EtlQueries.winnowBandsOf _
    val winCap = Some(graft.queries.EtlQueries.WinnowDfCap.toLong)
    val wa = new graft.etl.DedupState(spark, freshRoot(), winBands,
      maxBucket = winCap)
    val wb = new graft.etl.DedupState(spark, freshRoot(), winBands,
      maxBucket = winCap)
    wa.update(corpus.filter(col("doc_id") % 2 === 0))
    wb.update(corpus.filter(col("doc_id") % 2 === 1))
    val wFed = new graft.etl.FedDedupState(spark, freshRoot(), Seq(wa, wb))
    val (_, wInitSec) = timed(wFed.fold())
    wa.update(fresh)
    val (_, wFoldSec) = timed(wFed.fold())
    val (wPairs, wReadSec) = timed(wFed.livePairCounts().count())

    println(s"""{"metric":"dedup_state","init_sec":$initSec,""" +
      s""""update_sec":$updSec,"corpus_docs":$nCorpus,""" +
      s""""batch_docs":$nBatch,"batch_new_distinct":${rep.nNewDistinct},""" +
      s""""batch_band_rows":${rep.nBandRows},""" +
      s""""batch_new_pairs":${rep.nNewPairs},""" +
      s""""batch_relabeled":${rep.nRelabeled},""" +
      s""""fresh_update_sec":$updSec2,""" +
      s""""fresh_new_distinct":${rep2.nNewDistinct},""" +
      s""""fresh_new_pairs":${rep2.nNewPairs},""" +
      s""""fresh_relabeled":${rep2.nRelabeled},""" +
      s""""contam_init_sec":$cInitSec,"contam_update_sec":$cUpdSec,""" +
      s""""contam_fresh_grams":${crep.nGramRows},""" +
      s""""fed_merge_sec":$fedSec,"fed_merge_docs":$fedDocs,""" +
      s""""fed_postings_sec":$fedPostSec,"fed_postings":$fedPosts,""" +
      s""""fed_pairstats_sec":$fedPairSec,"fed_pairstats":$fedPairs,""" +
      s""""fed_store_init_sec":$fedInitSec,""" +
      s""""fed_store_fold_sec":$fedFoldSec,""" +
      s""""fed_store_fold_reps":${fedRep.map(_.nNewReps).getOrElse(0L)},""" +
      s""""fed_store_fold_pairs":${fedRep.map(_.nNewPairs).getOrElse(0L)},""" +
      s""""fed_contam_init_sec":$cFedInitSec,""" +
      s""""fed_contam_fold_sec":$cFedFoldSec,""" +
      s""""fed_winnow_init_sec":$wInitSec,""" +
      s""""fed_winnow_fold_sec":$wFoldSec,""" +
      s""""fed_winnow_read_sec":$wReadSec,""" +
      s""""fed_winnow_pairs":$wPairs,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
