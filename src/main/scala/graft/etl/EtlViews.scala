package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.Store

/** SQL-daemon surface for the persisted ETL/curation stores — the same
  * move the engine views made for telemetry (`Btrdb.registerViews`) and
  * the pyramid got in the thrift daemon: the dedup and decontamination
  * states already live on disk as versioned parquet under an atomic
  * pointer, so an analyst at a stock JDBC client should be able to ask
  * "which cluster is this doc in", "how duplicated is the corpus",
  * "what near-duplicate pairs exist and how similar are they", "which
  * rare grams carry contamination evidence" as plain SQL — without the
  * session-bound Scala API the pipeline itself uses.
  *
  * All views are READ-ONLY by construction: the handles are opened with
  * refusing ingest functions (updates go through the single writer per
  * store root; readers resolve through the atomic CURRENT pointer and
  * are always safe). Like every registered temp view, a view captures
  * its file listing at registration — `graft.Service`'s auto-refresh
  * re-registers when a store's pointer moves, the same bounded-staleness
  * contract the engine views run under.
  */
object EtlViews {

  private def refuse: DataFrame => DataFrame =
    _ => throw new UnsupportedOperationException(
      "read-only ETL view handle — updates go through the store's " +
        "single ingest writer")

  private def metaOf(rootUri: String, what: String): Map[String, String] = {
    val store = new Store(rootUri, new Configuration())
    val meta = store.readString("META").getOrElse(
      throw new IllegalStateException(s"no $what at $rootUri (missing META)"))
    meta.trim.split(",").collect {
      case e if e.contains("=") =>
        val Array(k, v) = e.split("=", 2); k -> v
    }.toMap
  }

  /** Open a [[DedupState]] root for reading: the bucket cap (an
    * edge-set invariant the READERS need — live-edge filtering) comes
    * from the store's own META, so the handle can never disagree with
    * the writer's semantics.
    *
    * A THRESHOLDED store (META `keep=` ≠ `-`) records its
    * pair-admission identity. Views never evaluate the predicate
    * (stored pairs are already admission-filtered), so opening without
    * it is fine for reading — but such a handle refuses to enter a
    * federated merge (the merge must SCORE cross-member candidates
    * with the predicate; `DedupState.federatedGraph` checks the
    * on-disk identity, so the handle cannot pass the store off as
    * unthresholded). To merge, supply `pairKeep` — digest-checked here
    * against META, so a WRONG predicate refuses at open instead of
    * silently changing what an edge is. */
  def openDedup(spark: SparkSession, rootUri: String,
                pairKeep: Option[Column] = None,
                keepIdentity: Option[String] = None): DedupState = {
    val kv = metaOf(rootUri, "DedupState")
    val cap = kv.get("maxBucket").map(_.toLong).filter(_ >= 0)
    val grams = kv.get("grams").exists(_.toBoolean)
    val storedKeep = kv.get("keep").filter(_ != "-")
    keepIdentity.map(DedupState.keepIdOf)
      .orElse(pairKeep.map(DedupState.keepId)).foreach { id =>
      require(storedKeep.contains(id),
        s"DedupState at $rootUri records pair-admission identity " +
          s"${storedKeep.getOrElse("-")} but the handle supplied $id — " +
          "the predicate is an edge-set invariant; open with the " +
          "store's own or with none (read-only views)")
    }
    new DedupState(spark, rootUri, refuse, cap,
      gramsOf = if (grams) Some(refuse) else None,
      pairKeep = pairKeep, keepIdentity = keepIdentity)
  }

  /** Open a [[ContamState]] root for reading (df cap from META). */
  def openContam(spark: SparkSession, rootUri: String): ContamState = {
    val kv = metaOf(rootUri, "ContamState")
    val cap = kv.get("dfCap").map(_.toLong).getOrElse(
      throw new IllegalStateException(s"ContamState META at $rootUri " +
        "carries no dfCap"))
    new ContamState(spark, rootUri, refuse, cap)
  }

  /** Register the dedup store's query surface:
    *   - `<prefix>_clusters`   (doc_id, cluster, is_canonical, ver) —
    *     every ingested doc's converged near-duplicate cluster; the
    *     canonical doc is the one whose id labels the cluster (min rep
    *     id of the component, the keep-selection every dedup consumer
    *     uses);
    *   - `<prefix>_dup_report` (cluster, n_docs, n_distinct) — per-
    *     cluster duplication accounting (docs vs distinct contents);
    *   - `<prefix>_dup_pairs`  (a, b, jac_num, jac_den, na, nb) — live
    *     candidate pairs with their stored exact similarity
    *     attributes: Jaccard = jac_num/jac_den for set features,
    *     cosine = jac_num / (sqrt(na)·sqrt(nb)) for weighted
    *     (embedding) stores where jac_num is the exact fixed-point dot
    *     and na/nb the squared norms (all null in stores built without
    *     gram attribution).
    */
  def registerDedupViews(spark: SparkSession, prefix: String,
                         rootUri: String): Unit = {
    val st = openDedup(spark, rootUri)
    val sz = st.featSizes()
    val report = st.livePairStats()
      .join(sz.select(col("rid").as("a"), col("n").as("na")),
        Seq("a"), "left_outer")
      .join(sz.select(col("rid").as("b"), col("n").as("nb")),
        Seq("b"), "left_outer")
      .select("a", "b", "jac_num", "jac_den", "na", "nb")
    registerClusterSurface(prefix, st.docClusters(),
      st.members().select("doc_id", "k"), report)
  }

  /** The three dedup views, shared by the single-store and FEDERATION
    * registrations — one definition of the surface, two sources. Both
    * sources serve (doc_id, cluster, ver). */
  private def registerClusterSurface(prefix: String, docClusters: DataFrame,
                                     memberKeys: DataFrame,
                                     pairReport: DataFrame): Unit = {
    docClusters
      .withColumn("is_canonical", col("doc_id") === col("cluster"))
      .select("doc_id", "cluster", "is_canonical", "ver")
      .createOrReplaceTempView(s"${prefix}_clusters")
    docClusters.select("doc_id", "cluster").join(memberKeys, "doc_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_docs"), countDistinct("k").as("n_distinct"))
      .createOrReplaceTempView(s"${prefix}_dup_report")
    pairReport.createOrReplaceTempView(s"${prefix}_dup_pairs")
  }

  private def memberRootsOf(rootUri: String): Seq[String] = {
    val store = new Store(rootUri, new Configuration())
    store.readString("MEMBERS").getOrElse(
      throw new IllegalStateException(
        s"no federation store at $rootUri (missing MEMBERS)"))
      .trim.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Open a [[FedDedupState]] root for reading: member read handles
    * reconstruct from the store's MEMBERS file (bare — stored rows are
    * already admission-filtered, and a read handle never folds, so the
    * lazy parity/predicate demands of [[FedDedupState.fold]] are never
    * forced). */
  def openFedDedup(spark: SparkSession, rootUri: String): FedDedupState =
    new FedDedupState(spark, rootUri,
      memberRootsOf(rootUri).map(openDedup(spark, _)))

  /** Open a [[FedContamState]] root for reading (member handles from
    * MEMBERS, each with its own META df cap). */
  def openFedContam(spark: SparkSession, rootUri: String): FedContamState =
    new FedContamState(spark, rootUri,
      memberRootsOf(rootUri).map(openContam(spark, _)))

  /** Register the FEDERATION dedup store's query surface — the same
    * three views as [[registerDedupViews]], over the INCREMENTALLY
    * folded cross-member state: a view refresh reads converged labels
    * and the persisted pair index instead of re-running the ∝-corpus
    * merge ([[DedupState.federatedDocClusters]]) per refresh. */
  def registerFedDedupViews(spark: SparkSession, prefix: String,
                            rootUri: String): Unit = {
    val fed = openFedDedup(spark, rootUri)
    registerClusterSurface(prefix, fed.docClusters(),
      fed.fedMembers().select("doc_id", "k"), fed.pairReport())
  }

  /** Register the FEDERATION contamination store's query surface —
    * the [[registerContamViews]] shape over the folded global
    * postings. */
  def registerFedContamViews(spark: SparkSession, prefix: String,
                             rootUri: String): Unit = {
    val fed = openFedContam(spark, rootUri)
    fed.livePostings().createOrReplaceTempView(s"${prefix}_contamination")
    fed.capped().createOrReplaceTempView(s"${prefix}_contam_capped")
  }

  /** Open a [[DerivedState]] root for reading: the derivation
    * fingerprint comes from the store's own META (a read handle never
    * derives, so the function itself is a refusing stub — same
    * read-only contract as [[openDedup]]). */
  def openDerived(spark: SparkSession, rootUri: String): DerivedState = {
    val store = new Store(rootUri, new Configuration())
    val fp = store.readString("META").getOrElse(
      throw new IllegalStateException(
        s"no DerivedState at $rootUri (missing META)")).trim
    new DerivedState(spark, rootUri, fp, keyCol = "k",
      deriveOf = (_, _) => throw new UnsupportedOperationException(
        "read-only derived view handle — updates go through the " +
          "store's single ingest writer"))
  }

  /** Register ONE derived-family view: the store's derived table under
    * `viewName`, read-only. Covers every [[DerivedState]] family —
    * language predictions (`…_lang`), SQ8 codes (`…_codes`), k-means
    * assignments (`…_cells`), winnow selections / span hashes
    * (`…_spans`), word/trigram tables (`…_vocab`) — the daemon maps
    * family names to roots (`graft.Service`'s SPARK_GRAFT_ETL_DERIVED),
    * so a new family is an env entry, not a code change. */
  def registerDerivedView(spark: SparkSession, viewName: String,
                          rootUri: String): Unit =
    openDerived(spark, rootUri).derived().createOrReplaceTempView(viewName)

  /** Register the decontamination store's query surface:
    *   - `<prefix>_contamination` (k, g) — the LIVE rare-gram postings
    *     index (df-capped evidence; join a probe's grams against it);
    *   - `<prefix>_contam_capped` (g) — grams retired by the df cap.
    * Rows are keyed by content digest `k` (the store's distinct-content
    * contract); the dedup views carry the doc_id → k mapping when both
    * stores serve one corpus. */
  def registerContamViews(spark: SparkSession, prefix: String,
                          rootUri: String): Unit = {
    val st = openContam(spark, rootUri)
    st.livePostings().createOrReplaceTempView(s"${prefix}_contamination")
    st.capped().createOrReplaceTempView(s"${prefix}_contam_capped")
  }

  /** One epoch string per store root — `graft.Service`'s poller
    * fingerprint: the CURRENT pointer names the exact visible version,
    * so any fold/compact moves it. */
  def epochOf(rootUri: String): String =
    new Store(rootUri, new Configuration())
      .readString("CURRENT").getOrElse("").trim
}
