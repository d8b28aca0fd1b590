package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guardrails: the properties that make these operators
  * survive a 100 TB scale-up. A correctness-green query whose plan quietly
  * stopped pushing filters or broadcasting its dim table is a regression
  * these tests catch at CI time.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString()
  }

  test("raw time-range scan pushes bounds to the parquet reader") {
    val p = plan("q_raw_values")
    assert(p.contains("PushedFilters:"), "scan node with pushdown")
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"raw-column lower bound must be pushed, got:\n$p")
    assert(p.contains("LessThan(ts"),
      "raw-column upper bound must be pushed")
  }

  test("time-range scan prunes columns (no full-width read)") {
    val p = plan("q_raw_values")
    assert(p.contains("ReadSchema"), "parquet scan present")
    assert(!p.contains("event_type"),
      "unused columns must be pruned from the scan")
  }

  test("dim-fact joins broadcast the small side") {
    assert(plan("q_join_agg").contains("BroadcastHashJoin"))
    val nr = plan("q_nation_revenue")
    assert(nr.contains("BroadcastHashJoin") &&
      !nr.contains("SortMergeJoin"), "both dims must broadcast")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("nearest compiles to a limit over a pruned scan, not a full sort+shuffle") {
    val p = plan("q_nearest_fwd")
    assert(p.contains("TakeOrderedAndProject"),
      s"nearest should be top-1-by-time, got:\n$p")
  }

  test("aligned windows aggregate partially before the exchange") {
    val p = plan("q_aligned_windows")
    assert(p.contains("HashAggregate"), "hash aggregation")
    // partial + final pair: two HashAggregate nodes around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side combine")
  }

  test("cosine top-k broadcasts the query vector") {
    assert(plan("q_ann_topk").contains("BroadcastNestedLoopJoin") ||
      plan("q_ann_topk").contains("BroadcastExchange"))
  }

  test("MRL prefix funnel broadcasts the query row; both tiers stay top-k") {
    val p = plan("q_ann_mrl")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"the one-row query frame must broadcast, got:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "shortlist and rerank must compile to top-k, not global sorts")
    assert(!p.contains("SortMergeJoin"),
      "nothing in the funnel may shuffle-join")
  }

  test("hyperplane ANN broadcasts the query row and avoids cartesian products") {
    val p = plan("q_ann_ivf")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"), "rerank must stay top-k")
  }

  test("banded embedding dedup joins on signatures, never all-pairs") {
    val p = plan("q_dedup_embcos")
    assert(!p.contains("CartesianProduct"),
      s"candidate stage must be a bucketed equality join, got:\n$p")
  }

  test("rolling-hash fingerprint is one aggregation, no join blowup") {
    val p = plan("q_fingerprint_roll")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("repetition quality metrics aggregate with map-side combine, no blowup") {
    val p = plan("q_quality_repetition")
    // gram counting must be partial-aggregated before its exchange and
    // the word/bigram stat join must stay equi-keyed on doc_id
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("stratified sampling is a pure map-side filter (no shuffle before the sort)") {
    val p = plan("q_corpus_sample")
    assert(!p.contains("CartesianProduct"))
    // exactly one exchange: the final presentation orderBy's range
    // partitioning — the keep decision itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(p).size -
      "ReusedExchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the orderBy exchange, got:\n$p")
  }

  test("contamination containment join is equi-keyed, never all-pairs") {
    val p = plan("q_contamination")
    assert(!p.contains("CartesianProduct"),
      s"gram containment must join on the gram key, got:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "no nested-loop fallback in the containment join")
    // the probe side is an eval suite (small by construction): its
    // gram postings must BROADCAST so the corpus postings are never
    // sort-merge-shuffled against a KB-scale table
    assert(p.contains("BroadcastHashJoin"),
      s"probe postings must broadcast into the containment join, got:\n$p")
  }

  test("dedup clustering never goes all-pairs") {
    val p = plan("q_dedup_cluster")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cluster assignment must stay banded/equi-keyed, got:\n$p")
  }

  test("minhash banding pipeline joins on band keys, never all-pairs") {
    // the fixture-memoized candidate graph is a materialized scan in
    // its consumers' plans; assert the shape of the pipeline that
    // BUILDS it (the same code path every dedup query shares)
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text")
    val p = EtlQueries.bandPairsPipeline(src)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"band self-join must be an equality join on the lane tuple, got:\n$p")
  }

  test("embedding-cosine candidate pipeline joins on signatures, never all-pairs") {
    // same memo-bypass probe for the embedding side: the consumers'
    // plans read a checkpointed scan, so the banded LSH shape must be
    // asserted on the building pipeline itself
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
    val p = EtlQueries.embCosPipeline(base)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate stage must be a bucketed equality join, got:\n$p")
  }

  test("BM25 is scan + broadcast stats + top-k: no tokenize explode, no shuffle join") {
    val p = plan("q_bm25")
    // tf comes from the replace-length trick — a pure scan, never a
    // per-token Generate; the one-row stats frame broadcasts; the
    // final ranking is a distributed top-k
    assert(!p.contains("Generate"), s"no tokenize explode, got:\n$p")
    assert(!p.contains("SortMergeJoin"), "stats must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("TF-IDF df side broadcasts (vocabulary-bounded), tf aggregates map-side") {
    val p = plan("q_tfidf_source")
    assert(p.contains("BroadcastHashJoin"),
      s"df join must broadcast the vocab-bounded side, got:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side combine on tf")
  }

  test("vocab coverage: global top-K is a TakeOrdered, not a full sort") {
    val p = plan("q_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-K terms must TakeOrdered before the rank window, got:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("packing shuffles once (by shard) and aggregates with map-side combine") {
    val p = plan("q_pack")
    assert(p.contains("Window"), "running offset is a window cumsum")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("PII redaction is a pure per-row scan — no join, no pre-sort shuffle") {
    val p = plan("q_pii_redact")
    assert(!p.contains("Join"), s"scrub pass must not join, got:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size -
      "ReusedExchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"only the presentation orderBy may shuffle, got:\n$p")
  }

  test("curation report is one digest join + one map-side-combined aggregate") {
    val p = plan("q_curate_e2e")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the keep decision must stay equi-keyed on the digest, got:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side combine")
  }

  test("BPE merge counting: map-side-combined aggregates, top-K stays TakeOrdered") {
    val p = plan("q_bpe_merges")
    assert(p.contains("TakeOrderedAndProject"), "merge table must not global-sort")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "map-side combine")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("length deciles: one window sort per source partition, no joins") {
    val p = plan("q_len_deciles")
    assert(p.contains("Window"), "NTILE window present")
    assert(!p.contains("Join"), s"report must stay join-free, got:\n$p")
  }

  test("SemDeDup pairs within clusters only — an equi-join on cluster, never all-pairs") {
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"within-cluster pairing must be cluster-keyed, got:\n$p")
  }

  test("LM score is a store read joined on content digest — no corpus explode at query time") {
    val p = plan("q_lm_score")
    // the trigram explode + model join ran ONCE into the derived
    // store; the query plan is docs ⋈ scores on the digest, nothing
    // quadratic and no re-derivation
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"digest equi-join only, got:\n$p")
    assert(!p.toLowerCase.contains("generate"),
      s"no per-query trigram explode — scores come from the store:\n$p")
  }

  test("k-means IVF broadcasts the probe set and the query row; rerank stays top-k") {
    val p = plan("q_ann_kmivf")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "probe clusters and query row are broadcast-joined")
    assert(p.contains("TakeOrderedAndProject"), "rerank must stay top-k")
    assert(!p.contains("CartesianProduct"))
  }

  test("SQ8 ANN broadcasts the quantizer scale and the quantized query") {
    val p = plan("q_ann_sq8")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must never shuffle into a merge join, got:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("rate/gaps distillates are one per-stream window pass — no joins") {
    for (q <- Seq("q_rate", "q_gaps")) {
      val p = plan(q)
      assert(p.contains("Window"), s"$q: ordered window pass present")
      assert(!p.contains("Join"), s"$q must stay join-free, got:\n$p")
    }
  }

  test("correlation matrix: aligned agg reduces BEFORE the pair join; no cartesian") {
    val p = plan("q_stream_corr")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pairing must be an equi-join on the window start, got:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "window-mean and per-pair aggregates both map-side combine")
  }

  test("winnowing match + dup report: equi-joins only, never all-pairs") {
    for (q <- Seq("q_winnow_pairs", "q_dup_report")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must join on keys, got:\n$p")
    }
  }

  test("z-score scan broadcasts the one-row stats frame; seasonal combines map-side") {
    val z = plan("q_zscore")
    assert(z.contains("BroadcastExchange") ||
      z.contains("BroadcastNestedLoopJoin"),
      s"the stats frame must broadcast, got:\n$z")
    val se = plan("q_seasonal")
    assert("HashAggregate".r.findAllIn(se).size >= 2,
      "hour-of-day aggregate must partial-combine before the exchange")
    assert(!se.contains("Join"), "seasonal profile is join-free")
  }

  test("as-of align: tile equi-joins + broadcast carry, never a range join") {
    for (q <- Seq("q_asof_align", "q_resample_hold", "q_resample_linear")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q: the as-of must co-partition on tiles, got:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the tile carry-in frame must broadcast, got:\n$p")
    }
  }

  test("depth-capped windows: one pushed-filter scan, no join for the attribution") {
    val p = plan("q_windows_depth")
    // the scan bounds (dropped straddler excluded) reach the reader
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(ts"),
      s"depth window scan bounds must push down, got:\n$p")
    // bucket→window attribution is pure column arithmetic: the only
    // join is the empty-window materialization against spark.range
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"attribution must not shuffle-join, got:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "window stats must partial-combine before the exchange")
  }

  test("threshold crossings are one join-free ordered window pass") {
    val p = plan("q_threshold_events")
    assert(!p.contains("Join"), s"event detection must not join, got:\n$p")
    assert(p.contains("Window"), "lag window expected")
  }

  test("softdedup weights: equi-join chain, no cartesian, map-side combine") {
    val p = plan("q_softdedup_weights")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cluster-size join must be equi-keyed, got:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-source sums must partial-combine before the exchange")
  }

  test("ann recall: ground truth broadcasts the query frame; no cartesian blowup") {
    val p = plan("q_ann_recall")
    assert(!p.contains("CartesianProduct"),
      s"recall eval must broadcast the tiny probe/np frames, got:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"the query set and nprobe frames must broadcast, got:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"every join side here is broadcastable, got:\n$p")
  }

  test("tagged container dedup: narrow decode, join-free, one map-side-" +
       "combined digest groupBy") {
    val p = plan("q_media_dup_tagged")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("CartesianProduct"),
      s"the identity pipeline is decode + groupBy — no joins, got:\n$p")
    assert(p.contains("HashAggregate") && p.contains("partial_count"),
      s"the digest groupBy must combine map-side, got:\n$p")
    // exactly one hash shuffle (the groupBy); the orderBy adds at most a
    // range exchange — anything more means the decode stopped being narrow
    val hashExchanges = "hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 2, // plan string repeats the exchange in AQE
      s"expected one digest-keyed shuffle, got $hashExchanges:\n$p")
  }
}
