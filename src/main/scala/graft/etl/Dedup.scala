package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable near-duplicate detection pipeline for document corpora:
  *
  *   shingle → MinHash signatures → LSH bands → candidate pairs →
  *   connected components → canonical-per-cluster dedup verdict.
  *
  * All stages are DataFrame programs. The pair stage is banded (LSH), so
  * it is linear in bucket sizes, and the clustering is iterative
  * min-label propagation over the candidate graph — O(cluster diameter)
  * rounds, each one join + one groupBy, with localCheckpoint to keep the
  * lineage flat. Nothing is collected to the driver except the
  * convergence flag (one count per round).
  */
object Dedup {

  /** stride MUST stay 1 for edit-robustness: with stride > 1 a single
    * character insertion shifts every later shingle sampling position,
    * making the shingle sets of near-identical docs disjoint. At stride 1
    * the shingle SET is position-independent — an edit perturbs only
    * ~shingleLen shingles. */
  final case class Params(
      numHashes: Int = 16,
      rowsPerBand: Int = 4,
      shingleLen: Int = 8,
      stride: Int = 1)

  /** Character shingles (not distinct — MinHash MIN is duplicate-
    * insensitive). `docs` must have (id LONG, text STRING). Docs shorter
    * than the shingle length have no shingles (and surface downstream as
    * singleton clusters) — the pre-filter also guards `sequence`, whose
    * upper bound must not fall below its lower bound. */
  def shingles(docs: DataFrame, p: Params = Params()): DataFrame =
    docs.filter(length(col("text")) >= p.shingleLen)
      .select(col("id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (p.shingleLen - 1),
          lit(p.stride))).as("pos"))
      .select(col("id"), expr(s"substring(text, pos, ${p.shingleLen})").as("sh"))

  /** Per-doc LSH band signatures: (id, band, sig). One shuffle — the
    * numHashes min-aggregates are columns of a single groupBy. */
  def bandSignatures(docs: DataFrame, p: Params = Params()): DataFrame = {
    // each md5 call yields four 8-hex-char minhash lanes — numHashes
    // lanes need only numHashes/4 md5 evaluations per shingle row
    val nMd5 = (p.numHashes + 3) / 4
    val hashed = shingles(docs, p).select(Seq(col("id")) ++ (0 until nMd5).map(g =>
      md5(concat(lit(s"$g:"), col("sh")).cast("binary")).as(s"H$g")): _*)
    val aggs = (0 until p.numHashes).map(i =>
      min(substring(col(s"H${i / 4}"), 1 + 8 * (i % 4), 8)).as(s"h$i"))
    val mh = hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until p.numHashes / p.rowsPerBand).map { b =>
      val sig = md5(concat((0 until p.rowsPerBand)
        .map(r => col(s"h${b * p.rowsPerBand + r}")): _*).cast("binary"))
      struct(lit(b).as("band"), sig.as("sig"))
    }
    mh.select(col("id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Near-dup candidate pairs (a < b) from shared LSH buckets.
    *
    * `maxBucket` is the degenerate-bucket guard for corpus scale: a
    * bucket of size B contributes B² pairs, so one pathological
    * signature (boilerplate, empty-ish docs) can dominate the whole
    * join. Buckets above the cap are dropped — the LSH analog of
    * stop-word removal; their members are (near-)identical to hundreds
    * of others and are better handled by exact-hash dedup first. The
    * drop is logged via the returned plan shape, not silent: callers
    * size the cap explicitly. */
  def candidatePairs(docs: DataFrame, p: Params = Params(),
                     maxBucket: Option[Int] = None): DataFrame = {
    val bands0 = bandSignatures(docs, p)
    val bands = maxBucket match {
      case None => bands0
      case Some(cap) =>
        val ok = bands0.groupBy("band", "sig")
          .agg(count(lit(1)).as("_n")).filter(col("_n") <= cap)
          .select("band", "sig")
        bands0.join(ok, Seq("band", "sig"), "left_semi")
    }
    val a = bands.select(col("id").as("a"), col("band"), col("sig"))
    val b = bands.select(col("id").as("b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Connected components over an undirected pair graph: returns
    * (id, cluster) where cluster = min id in the component. Iterative
    * min-label propagation; rounds = graph diameter (near-dup clusters
    * are shallow — a handful of rounds in practice).
    *
    * One distributed action per round: the propagation join CARRIES
    * the previous label through the checkpoint as `old`, so the
    * convergence check is a limit(1) scan of the just-materialized
    * blocks — no second join-plus-count job re-deriving the same
    * comparison (which doubled the per-round actions and was ~half
    * the measured round cost). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint()
    // edge-free fold (a batch with no candidate pairs — the common
    // fresh-content case): the min-label fixpoint over zero nodes is
    // empty by definition; skip the init/iterate jobs entirely
    if (edges.isEmpty)
      return edges.select(col("src").as("id"), col("src").as("cluster"))
        .limit(0)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster", "nCluster"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nCluster").as("nMin"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("nMin"), col("cluster"))).as("cluster"))
        .localCheckpoint()
      val changed =
        next.filter(col("cluster") =!= col("old")).limit(1).count()
      labels = next.select("id", "cluster")
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Full dedup verdict for a corpus: every doc labeled with its cluster
    * and whether it is the cluster's canonical (minimum-id) member.
    * Docs in no candidate pair are their own singleton cluster. */
  def dedup(docs: DataFrame, p: Params = Params()): DataFrame = {
    val clusters = connectedComponents(candidatePairs(docs, p))
    docs.select(col("id"))
      .join(clusters, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .withColumn("is_canonical", col("id") === col("cluster"))
  }
}
