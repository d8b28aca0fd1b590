package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.Store

object DedupState {

  /** Physical-layout knobs. The key index partitions by the first two
    * hex chars of the md5 digest (`kp`, 256 uniform values — the
    * digest is computed by [[DedupState.update]] itself, so the value
    * set is guaranteed hex); the band and pair indexes partition by a
    * HASH bucket of `bkey` (`bp`), because `bkey` is caller-supplied
    * (the injected banding function) and arbitrary strings make unsafe
    * partition directory names where a bounded integer bucket is
    * always clean. Both are deterministic functions of the join key,
    * which is all pruning needs: a batch row can only match index rows
    * in its own partition, so filtering the index scan to the batch's
    * partition values is exact. */
  /** 128-bit identity digest of a pair-admission predicate — see
    * `pairKeepId`. */
  private[etl] def keepId(keep: Column): String =
    keepIdOf(keep.toString)

  /** Digest of an EXPLICIT admission-identity string (the
    * Spark-version-stable form a long-lived store pins at creation —
    * `DedupState(..., keepIdentity = Some("cos>=0.2:v1"))`). */
  private[etl] def keepIdOf(identity: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private[etl] val BandBuckets = 256
  private[etl] def keyPrefix(c: Column): Column = substring(c, 1, 2)
  private[etl] def bandBucket(c: Column): Column =
    pmod(xxhash64(c), lit(BandBuckets)).cast("int")

  // The partitioned-vs-flat write policy lives in
  // [[VersionedStore.partitionCutoff]]: a write fans into partition
  // dirs only when the average bucket holds a file's worth of rows
  // (scale-adaptive — corpus-sized builds at production scale cross
  // it, bench-scale fixtures stay flat in row-sized files).

  /** Per-update accounting — the spec's cost-proportionality evidence.
    * `nBandRows` is the number of signature rows COMPUTED this update:
    * it must track the batch's new distinct content, never the corpus
    * (re-MinHashing a 100 TB corpus per daily crawl is exactly what
    * this store exists to avoid). `nGramRows` is the gram-feature rows
    * computed when the store carries pair-level similarity attributes
    * ([[DedupState]]'s `gramsOf`) — same proportionality contract. */
  final case class UpdateReport(
      version: Long,
      nBatchDocs: Long,
      nBatchDistinct: Long,
      nNewDistinct: Long,
      nBandRows: Long,
      nNewPairs: Long,
      nDroppedBuckets: Long,
      nRelabeled: Long,
      nGramRows: Long = 0L)

  private[etl] val MembersSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("k", StringType),
    StructField("ver", LongType)))
  private[etl] val GroupsSchema = StructType(Seq(
    StructField("k", StringType), StructField("rid", LongType),
    StructField("ver", LongType)))
  private[etl] val BandsSchema = StructType(Seq(
    StructField("rid", LongType), StructField("bkey", StringType)))
  private[etl] val PairsSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType),
    StructField("bkey", StringType),
    StructField("jac_num", LongType), StructField("jac_den", LongType)))
  private[etl] val FeatsSchema = StructType(Seq(
    StructField("rid", LongType), StructField("g", StringType),
    StructField("w", LongType)))
  private[etl] val FSizesSchema = StructType(Seq(
    StructField("rid", LongType), StructField("n", LongType),
    StructField("nb", LongType)))
  private[etl] val DroppedSchema = StructType(Seq(
    StructField("bkey", StringType)))
  private[etl] val LabelsSchema = StructType(Seq(
    StructField("rid", LongType), StructField("cluster", LongType),
    StructField("ver", LongType)))

  /** CORPUS-WIDE clusters across FEDERATION MEMBERS — the dedup analog
    * of the engine's federated pyramid serving: each member root runs
    * its own single-writer [[DedupState]] over the documents it
    * ingests, and this merge step computes the clusters a SINGLE store
    * over the union corpus would produce. Returns (doc_id, cluster).
    *
    * The single-store edge set reconstructs exactly from member state:
    *
    *   - within-member candidate edges are each member's persisted
    *     `pairs` (bucket co-membership is a pure function of content,
    *     so member-local pairing loses nothing);
    *   - CROSS-member candidates are bucket co-memberships spanning
    *     members: the unioned band index self-joins on `bkey` across
    *     member tags (bounded by the global bucket cap, like every
    *     pairing here). In a THRESHOLDED store (`pairKeep`) candidacy
    *     is not admission: cross-member candidates are scored from the
    *     members' feats indexes with the same stored-attribute algebra
    *     as [[update]] and pass the same predicate — members must
    *     agree on the predicate (META-style parity check), exactly as
    *     they must agree on the cap;
    *   - identical content ingested by several members carries one rep
    *     PER member — star edges link each rep to the global min-rid
    *     rep per content key, exactly collapsing what a single store
    *     never splits;
    *   - the bucket cap applies to the GLOBAL bucket size (member
    *     drops are subsumed: a member-dropped bucket's global size is
    *     at least its member size, so it is globally dropped too), and
    *     edges justified only by globally-dropped buckets die — the
    *     same retroactive rule [[DedupState.update]] applies within
    *     one store. All members must share the cap (META invariant).
    *
    * INVARIANT: `doc_id` must be GLOBALLY unique across federation
    * members (the single-store contract, federated): the merge joins
    * band/group rows on `rid` (a doc_id) and builds star edges from the
    * per-content min rid, so a doc_id claimed by two members — worse,
    * for DIFFERENT content — would silently corrupt the edge and canon
    * graphs. The merge refuses when it can SEE a violation (one doc_id
    * mapped to two content keys across members); same-content
    * collisions are indistinguishable from legitimate shared ingest and
    * remain the deployment's responsibility (the engine's federation
    * assigns members disjoint ownership — `Federation.ownerOf`).
    *
    * Cost: one CC over the global candidate-edge set — ∝ corpus
    * edges, NOT ∝ a batch. This is the rare topology-level step (run
    * at member migration / corpus-wide report time), not the ingest
    * path; day-to-day folds stay per-member at batch cost.
    * FederatedDedupSpec proves the two-member merge equals a
    * single-store build, capped and uncapped. */
  def federatedDocClusters(states: Seq[DedupState]): DataFrame = {
    val (edges, canon, membersAll) = federatedGraph(states)
    val cc = Dedup.connectedComponents(edges)
      .withColumnRenamed("id", "crid")
    membersAll.join(canon, "k")
      .join(cc, Seq("crid"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("crid")).as("cluster"))
  }

  /** FEDERATED near-duplicate pair report — the [[DedupState
    * .livePairStats]] of the union corpus, reconstructed from member
    * state in CANONICAL rid space (the global min rid per content
    * key — the rep ids a single store over the union would use):
    * (a, b, jac_num, jac_den), a < b, distinct. Member pairs carry
    * their fold-time attributes; cross-member candidates are scored
    * here with the same algebra ([[pairAttributes]]) and — in a
    * thresholded store — pass the shared admission predicate.
    * Same-content pairs collapse to self under the canonical mapping
    * and are dropped, exactly as a single store never pairs a content
    * with itself. Attributes are pure content functions, so the
    * member/cross duplicates of one canonical pair agree and the
    * final distinct is lossless. Topology-time cost, like
    * [[federatedDocClusters]]. */
  def federatedLivePairStats(states: Seq[DedupState]): DataFrame =
    pairStatsFrom(federatedParts(states))

  /** FEDERATED per-rep feature summary in canonical rid space — the
    * [[DedupState.featSizes]] of the union corpus: (rid, n, nb).
    * n = Σw² and the band-row count are pure content functions, so the
    * per-member rows of shared content agree and collapse under
    * distinct. Built on the same [[federatedParts]] pass as the other
    * readers, so the federation guards (cap/grams/admission parity,
    * globally-unique doc_id) apply here identically. */
  def federatedFeatSizes(states: Seq[DedupState]): DataFrame =
    featSizesFrom(states, federatedParts(states))

  /** The combined federated pair REPORT — (a, b, jac_num, jac_den,
    * na, nb), the `<prefix>_dup_pairs` view shape: pair stats and the
    * endpoints' feature summaries from ONE [[federatedParts]] pass
    * (one parity/conflict check; the canonical-rep aggregation
    * appears once per side in a single plan, where Spark's exchange
    * reuse dedupes it — two separate reader calls cannot share). */
  def federatedPairReport(states: Seq[DedupState]): DataFrame = {
    val p = federatedParts(states)
    val sz = featSizesFrom(states, p)
    pairStatsFrom(p)
      .join(sz.select(col("rid").as("a"), col("n").as("na")),
        Seq("a"), "left_outer")
      .join(sz.select(col("rid").as("b"), col("n").as("nb")),
        Seq("b"), "left_outer")
      .select("a", "b", "jac_num", "jac_den", "na", "nb")
  }

  private def pairStatsFrom(p: FedParts): DataFrame = {
    val cross = p.keepCol match {
      case Some(keep) => p.crossScored().filter(keep)
      case None =>
        // an attribute-carrying store computes jac for every admitted
        // pair at fold time — the merge owes its cross pairs the same;
        // attribute-less stores store null jac, and get null here
        if (p.grams) p.crossScored()
        else p.crossRaw.distinct()
          .withColumn("jac_num", lit(null).cast("long"))
          .withColumn("jac_den", lit(null).cast("long"))
    }
    val m = p.groupsAll.join(p.canon, "k").select(col("rid"), col("crid"))
    p.liveMemberPairs
      .unionByName(cross.select("a", "b", "jac_num", "jac_den"))
      .join(m.select(col("rid").as("a"), col("crid").as("ca")), "a")
      .join(m.select(col("rid").as("b"), col("crid").as("cb")), "b")
      .filter(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"),
        col("jac_num"), col("jac_den"))
      .distinct()
  }

  private def featSizesFrom(states: Seq[DedupState],
                            p: FedParts): DataFrame = {
    val m = p.groupsAll.join(p.canon, "k").select(col("rid"), col("crid"))
    states.map(_.featSizes()).reduce(_ unionByName _)
      .join(m, "rid")
      .select(col("crid").as("rid"), col("n"), col("nb"))
      .distinct()
  }

  /** The merge's declarative half, separable so FederatedDedupSpec can
    * assert its PLAN (every join equi-keyed on bkey/k — no cartesian
    * anywhere, the 100 TB guardrail): (global live candidate edges,
    * canonical rep per content key, all member docs). */
  private[etl] def federatedGraph(states: Seq[DedupState])
      : (DataFrame, DataFrame, DataFrame) = {
    val p = federatedParts(states)
    // cross-member pairs through the same admission gate a member's
    // own pairs passed at fold time; without a predicate, candidacy IS
    // admission (the MinHash contract) and no scoring happens
    val crossAdmitted = p.keepCol match {
      case None => p.crossRaw
      case Some(keep) => p.crossScored().filter(keep).select("a", "b")
    }
    val edges = p.liveMemberPairs.select("a", "b")
      .unionByName(crossAdmitted)
      .unionByName(p.sameKey).distinct()
    (edges, p.canon, p.membersAll)
  }

  /** The declarative pieces every federated reader shares — parity
    * checks, the global bucket cap, live member/cross pairs, the
    * canonical-rep frames. `crossScored` is a thunk because building
    * it collects the candidates' partition values (a bounded driver
    * job the attribute-less graph path should not pay). */
  private final case class FedParts(
      keepCol: Option[Column],
      grams: Boolean,
      liveMemberPairs: DataFrame,
      crossRaw: DataFrame,
      crossScored: () => DataFrame,
      sameKey: DataFrame,
      canon: DataFrame,
      membersAll: DataFrame,
      groupsAll: DataFrame)

  /** The federation parity contract — (bucket cap, gram attribution,
    * usable admission predicate), shared by the one-shot merge readers
    * ([[federatedParts]]) and the incremental federation store
    * ([[FedDedupState]]), so "what may merge" has exactly one
    * definition:
    *
    *   - the bucket cap is an edge-set invariant (META), so members
    *     must agree on it before their edge sets can be unioned;
    *   - gram attribution is a pair-row invariant: a mixed federation
    *     would emit half-null, half-scored reports;
    *   - pair ADMISSION: in a thresholded store (pairKeep set) a band
    *     bucket is only CANDIDACY — the predicate over the computed
    *     pair attributes decides edges, so members must agree on it AND
    *     the merge must hold a usable Column to score its cross-member
    *     candidates with. Parity checks the ON-DISK identity
    *     (storedKeepId), so a read-only handle opened without the
    *     predicate cannot pass a thresholded store off as
    *     unthresholded — but such a handle has no usable Column to
    *     score with, so it refuses here too. */
  private[etl] def memberParity(states: Seq[DedupState])
      : (Option[Long], Boolean, Option[Column]) = {
    require(states.nonEmpty, "federation needs at least one member")
    val caps = states.map(_.bucketCap).distinct
    require(caps.size == 1,
      s"members disagree on the bucket cap ($caps) — the cap is an " +
        "edge-set invariant, federated or not")
    val grams = states.map(_.hasGrams).distinct
    require(grams.size == 1,
      "members disagree on gram attribution — attribute semantics are " +
        "a pair-row invariant, federated or not")
    // (A set predicate implies every member carries gramsOf — the
    // constructor owns that invariant.)
    val keeps = states.map(_.storedKeepId).distinct
    require(keeps.size == 1,
      s"members disagree on the pair-admission predicate ($keeps) — " +
        "admission is an edge-set invariant, federated or not")
    val keepCol = keeps.head.map { id =>
      val cols = states.flatMap(_.pairKeepColumn)
      require(cols.size == states.size,
        s"a thresholded member (admission $id) was opened WITHOUT its " +
          "admission predicate — the merge must score cross-member " +
          "candidates with it; reopen the member handle with the " +
          "predicate (EtlViews.openDedup(root, pairKeep = Some(...)))")
      cols.head
    }
    (caps.head, grams.head, keepCol)
  }

  private def federatedParts(states: Seq[DedupState]): FedParts = {
    val (cap, gramsHead, keepCol) = memberParity(states)
    val bandsAll = states.zipWithIndex.map { case (st, m) =>
        st.bands().withColumn("m", lit(m)) }
      .reduce(_ unionByName _)
    val pairsAll = states.map(_.pairs()).reduce(_ unionByName _)
    val groupsAll = states.map(_.seenKeys().select("k", "rid"))
      .reduce(_ unionByName _)
    val membersAll = states.map(_.members().select("doc_id", "k"))
      .reduce(_ unionByName _)
    // the globally-unique-doc_id invariant (see scaladoc): refuse when a
    // doc_id maps to two content keys across members — a silent graph
    // corruption otherwise. One narrow aggregation over the id/key
    // frame; this merge is a topology-time step, so the check is cheap
    // relative to the CC it guards.
    val conflicts = membersAll.groupBy("doc_id")
      .agg(countDistinct("k").as("nk")).filter(col("nk") > 1)
      .limit(1).collect()
    require(conflicts.isEmpty,
      s"doc_id ${conflicts.head.getLong(0)} carries different content in " +
        "different federation members — doc_ids must be globally unique " +
        "across members")
    // the cap counts DISTINCT CONTENT per bucket, as a single store
    // does (band rows are per distinct content there): content
    // ingested by several members carries one band row PER MEMBER REP,
    // so the raw row count would inflate shared buckets and drop
    // buckets a single store keeps — dedupe through the content key
    // before counting
    val globalDropped = cap match {
      case None => bandsAll.select("bkey").limit(0)
      case Some(cap) => bandsAll
        .join(groupsAll.select("rid", "k"), "rid")
        .select("bkey", "k").distinct()
        .groupBy("bkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > cap).select("bkey")
    }
    val liveBands = bandsAll.join(globalDropped, Seq("bkey"), "left_anti")
    val crossRaw = liveBands.as("x")
      .join(liveBands.as("y"), "bkey")
      .filter(col("x.m") < col("y.m"))
      .select(least(col("x.rid"), col("y.rid")).as("a"),
        greatest(col("x.rid"), col("y.rid")).as("b"))
      .filter(col("a") =!= col("b"))
    // score distinct cross-member candidates from the members' feats
    // indexes (rids are globally unique, so each endpoint's features
    // live in exactly one member) with the stored-attribute algebra of
    // [[update]] — nab = Σ wa·wb, n = Σ w²
    val crossScored = () => {
      val cands = crossRaw.distinct()
      val eps = cands.select(col("a").as("rid"))
        .unionByName(cands.select(col("b").as("rid"))).distinct()
      // pruned probes, not full-index reads: the endpoints' rid
      // buckets (≤ 256 values, driver-bounded) filter each member's
      // feats scan to the partitions the candidates touch — the
      // update path's featsTouching contract, applied at merge time
      val buckets =
        states.head.partitionValues[Int](eps, bandBucket(col("rid")))
      val epFeats = states
        .map(st => st.featsTouching(buckets, st.currentVersion))
        .reduce(_ unionByName _)
        .join(eps, Seq("rid"), "left_semi")
      pairAttributes(cands, epFeats)
    }
    val liveMemberPairs = pairsAll
      .join(globalDropped, Seq("bkey"), "left_anti")
      .select("a", "b", "jac_num", "jac_den")
    // one canonical rep per content key; star edges collapse the
    // per-member reps of identical content
    val canon = groupsAll.groupBy("k").agg(min("rid").as("crid"))
    val sameKey = groupsAll.join(canon, "k")
      .filter(col("rid") =!= col("crid"))
      .select(col("crid").as("a"), col("rid").as("b"))
    FedParts(keepCol, gramsHead, liveMemberPairs, crossRaw, crossScored,
      sameKey, canon, membersAll, groupsAll)
  }

  /** The stored-attribute algebra — the ONE copy of the bit-parity
    * contract shared by the fold path ([[DedupState.update]]'s
    * pair-emission scoring) and the federated merge's cross-member
    * admission scoring: for candidate pairs `ab` (a, b — distinct) and
    * endpoint features `epFeats` (rid, g, w), returns
    * (a, b, jac_num = Σ wa·wb, jac_den = na + nb − nab, na = Σ wa²,
    * nb = Σ wb²) — set-intersection/union sizes for unweighted
    * features (w = 1), exact fixed-point dot and squared norms for
    * weighted ones. Outer joins: an endpoint whose gramsOf emitted
    * nothing (too short) keeps its pair row with a (0, n) or (0, 0)
    * attribute. A single definition, because any divergence between
    * fold-time and merge-time scoring silently forks admission
    * semantics and breaks the federated == one-shot contract. */
  private[etl] def pairAttributes(ab: DataFrame,
                                  epFeats: DataFrame): DataFrame = {
    val szs = epFeats.groupBy("rid").agg(sum(col("w") * col("w")).as("n"))
    val inter = ab
      .join(epFeats.select(col("rid").as("a"), col("g"),
        col("w").as("wa")), "a")
      .join(epFeats.select(col("rid").as("b"), col("g"),
        col("w").as("wb")), Seq("b", "g"))
      .groupBy("a", "b").agg(sum(col("wa") * col("wb")).as("nab"))
    // a DEGENERATE pair (both endpoints emitted no features — possible
    // only for bandsOf/gramsOf combinations where banding does not
    // imply grams) carries NULL attributes rather than (0, 0): a 0/0
    // row would divide-by-zero in ratio consumers and pass >=-style
    // admission predicates as a "perfect" match, where null correctly
    // evaluates the predicate to null (rejected) and reads as
    // attribute-less
    val den = coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) -
      coalesce(col("nab"), lit(0L))
    ab
      .join(inter, Seq("a", "b"), "left_outer")
      .join(szs.select(col("rid").as("a"), col("n").as("na")),
        Seq("a"), "left_outer")
      .join(szs.select(col("rid").as("b"), col("n").as("nb")),
        Seq("b"), "left_outer")
      .select(col("a"), col("b"),
        when(den > 0, coalesce(col("nab"), lit(0L))).as("jac_num"),
        when(den > 0, den).as("jac_den"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
  }

  /** The ONE copy of the incremental label-fold algebra — shared by the
    * single-store fold ([[DedupState.update]]) and the federated merge
    * fold ([[FedDedupState.fold]]), because any divergence between the
    * two silently forks clustering semantics and breaks the
    * federated == one-shot contract (the [[pairAttributes]] argument,
    * applied to the CC fold).
    *
    * Given the converged pre-fold labels, this fold's new distinct
    * edges and first-seen node ids, and the (distinct) edges dying this
    * fold under a retroactive cap, returns the LABEL DELTAS — one
    * (rid, cluster) row per node whose label is new or changed,
    * checkpointed into `cps`:
    *
    *   - removal: components losing an edge are recomputed from the
    *     remaining live edges — only those components; `livePriorEdges`
    *     (every still-live pre-fold edge) is evaluated lazily and
    *     semi-pruned to them;
    *   - additions: connected components on the QUOTIENT graph
    *     (existing cluster labels + new node ids as nodes, new edges
    *     mapped through current labels), so the fixpoint runs over a
    *     graph proportional to the fold, and min-label CC keeps the
    *     global min-rid labeling the one-shot pipeline assigns. */
  private[etl] def foldLabels(
      curLabels: DataFrame,
      newEdges: DataFrame,
      newRepIds: DataFrame,
      removed: DataFrame,
      hasRemovals: Boolean,
      livePriorEdges: => DataFrame,
      cps: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
    def emptyLabels: DataFrame = curLabels.sparkSession
      .createDataFrame(java.util.Collections.emptyList[Row](), LabelsSchema)

    // EDGE-FREE fast path (the common fresh-content fold: no candidate
    // pairs, no dying buckets): every new rep is its own singleton and
    // no existing label can change — skip the quotient machinery's
    // checkpoint/CC jobs entirely. One cheap emptiness probe over the
    // (checkpointed) pair frame buys ~4 jobs off the fold's critical
    // path whenever it hits.
    if (!hasRemovals && newEdges.isEmpty)
      return newRepIds.select(col("rid"), col("rid").as("cluster"))
        .cpInto(cps)

    // ---- retroactive removal: recompute components that lose edges ----
    val (labelsAfterRemoval, removalMembers) =
      if (!hasRemovals || removed.isEmpty) (curLabels, None)
      else {
        val endpoints = removed.select(col("a").as("rid"))
          .unionByName(removed.select(col("b").as("rid"))).distinct()
        val affLabels = curLabels.join(endpoints, Seq("rid"), "left_semi")
          .select("cluster").distinct()
        val affMembers = curLabels
          .join(affLabels, Seq("cluster"), "left_semi")
          .select("rid", "cluster").cpInto(cps)
        // remaining live edges of the affected components (an edge's
        // endpoints share a component, so one-sided semi suffices)
        val subEdges = livePriorEdges
          .join(affMembers.select(col("rid").as("a")), Seq("a"), "left_semi")
        val recomp = Dedup.connectedComponents(subEdges)
          .withColumnRenamed("id", "rid")
          .withColumnRenamed("cluster", "newCluster")
        val relabeled = affMembers.select("rid")
          .join(recomp, Seq("rid"), "left_outer")
          .select(col("rid"),
            coalesce(col("newCluster"), col("rid")).as("cluster"))
          .cpInto(cps)
        val updated = curLabels
          .join(affMembers.select("rid"), Seq("rid"), "left_anti")
          .unionByName(relabeled)
        (updated, Some((affMembers.select("rid"), relabeled)))
      }

    // ---- additions: CC on the quotient graph ----
    // label lookups only ever hit the new edges' endpoints: semi-prune
    // the (corpus-sized) label frame to them first, so the la/lb
    // left-outer joins run against a fold-sized (broadcastable) side
    // instead of shuffling the full label frame twice
    val endpointRids = newEdges.select(col("a").as("rid"))
      .unionByName(newEdges.select(col("b").as("rid"))).distinct()
    val endpointLabels = labelsAfterRemoval
      .join(endpointRids, Seq("rid"), "left_semi")
      .cpInto(cps)
    val la = endpointLabels.select(col("rid").as("a"),
      col("cluster").as("la"))
    val lb = endpointLabels.select(col("rid").as("b"),
      col("cluster").as("lb"))
    val quotEdges0 = newEdges
      .join(la, Seq("a"), "left_outer")
      .join(lb, Seq("b"), "left_outer")
      .select(coalesce(col("la"), col("a")).as("qa"),
        coalesce(col("lb"), col("b")).as("qb"),
        col("la").isNotNull.as("oa"), col("lb").isNotNull.as("ob"))
      .cpInto(cps)
    val quotEdges = quotEdges0.filter(col("qa") =!= col("qb"))
      .select(col("qa").as("a"), col("qb").as("b"))
    // quotient components: node ids are labels (= min rids of existing
    // components) and new node ids, so the min-label CC result is the
    // global min rid of each merged component — the same label the
    // one-shot pipeline assigns
    val qcc = Dedup.connectedComponents(quotEdges)
      .cpInto(cps)
    val remap = qcc.select(col("id").as("node"), col("cluster").as("fin"))

    def applyRemap(df: DataFrame): DataFrame = df
      .join(broadcast(remap), df("cluster") === remap("node"), "left_outer")
      .select(df("rid"), coalesce(col("fin"), df("cluster")).as("cluster"))

    // new nodes: quotient label, or themselves when edge-free
    val newRepLabels =
      applyRemap(newRepIds.select(col("rid"), col("rid").as("cluster")))
    // old labels merged into a smaller-rid component: rewrite members
    val oldNodes = quotEdges0.filter(col("oa")).select(col("qa").as("node"))
      .unionByName(quotEdges0.filter(col("ob")).select(col("qb").as("node")))
      .distinct()
    val changedOld = qcc
      .join(oldNodes, qcc("id") === oldNodes("node"), "left_semi")
      .filter(col("cluster") =!= col("id"))
      .select(col("id").as("oldL"), col("cluster").as("newL"))
    val mergedOldMembers = labelsAfterRemoval
      .join(broadcast(changedOld),
        labelsAfterRemoval("cluster") === changedOld("oldL"))
      .select(col("rid"), col("newL").as("cluster"))
    // removal-affected members: final label after any further merge
    val removalFinal = removalMembers match {
      case None => emptyLabels.select("rid", "cluster")
      case Some((_, relabeled)) => applyRemap(relabeled)
    }
    val removalRids = removalMembers
      .map(_._1).getOrElse(emptyLabels.select("rid"))
    // one row per rid: removal-affected members are excluded from the
    // merge rewrite (removalFinal already carries their final label)
    newRepLabels
      .unionByName(mergedOldMembers
        .join(removalRids, Seq("rid"), "left_anti"))
      .unionByName(removalFinal)
      .cpInto(cps)
  }

  /** ONE Spark job counting several already-materialized frames: the
    * fold's per-frame `.count()` calls were pure job-launch latency
    * (~10 sequential jobs over a few thousand checkpointed rows), so
    * the report/write counts batch into a single union-count. Inputs
    * MUST be checkpointed — a lazy frame would recompute inside the
    * union. */
  private[etl] def countAll(dfs: Seq[DataFrame]): Seq[Long] = {
    if (dfs.isEmpty) return Seq.empty
    val u = dfs.zipWithIndex
      .map { case (d, i) => d.select(lit(i).as("i")) }
      .reduce(_ unionByName _)
    val m = u.groupBy("i").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    dfs.indices.map(i => m.getOrElse(i, 0L))
  }

  /** Checkpoint-and-track: update/compact materialize many small
    * frames; tracking them lets the caller unpersist after the write
    * lands, so a long-lived ingest daemon doesn't accumulate blocks
    * (the engine's checkpointReleasable discipline). Appends
    * synchronize on the bag: independent stages of [[DedupState
    * .update]] materialize CONCURRENTLY (the fold's fixed cost is
    * job-launch latency, not data). */
  private[etl] implicit class Tracked(private val df: DataFrame)
      extends AnyVal {
    def cpInto(bag: scala.collection.mutable.Buffer[DataFrame]): DataFrame = {
      val c = df.localCheckpoint(); bag.synchronized { bag += c }; c
    }
  }

}

/** Versioned, persisted near-duplicate state with per-ingest-commit
  * incremental maintenance — the dedup analog of the engine's pyramid
  * fold (`Btrdb.maintainPyramid`: commit-touched ranges → fold only
  * dirtied buckets). A daily crawl against a 100 TB corpus cannot
  * re-MinHash the corpus; this store updates at cost proportional to
  * the BATCH:
  *
  *   - exact-dup index (`groups`): the batch digest-groups itself, then
  *     one anti-join against the persisted key index decides which
  *     content is genuinely new. No text outside the batch is read —
  *     the store's corpus-sided inputs are all narrow key/label frames.
  *   - signatures (`bands`): computed ONLY for new distinct content, by
  *     the same banding function as the one-shot pipeline (the caller
  *     injects it — [[graft.queries.EtlQueries.bandKeys]] in
  *     production), so bucket co-membership is identical.
  *   - candidate pairs: new members join old members of the touched
  *     buckets only (`left_semi` on the new batch's bucket keys prunes
  *     the persisted band index before anything pairs); pair emission
  *     is new×old + new×new, never old×old (those were emitted when
  *     THEY were new — bucket co-membership is monotone).
  *   - clustering: connected components run on the QUOTIENT graph
  *     (existing cluster labels + new reps, edges = the batch's new
  *     pairs mapped through current labels) — the fixpoint re-runs
  *     over a graph proportional to the batch, and only members of
  *     clusters whose label actually changes are rewritten (min-label
  *     means the larger/older side of a merge usually keeps its label).
  *
  * Degenerate-bucket cap (`maxBucket`): a bucket whose TOTAL size
  * crosses the cap is dropped — including retroactively: pairs it
  * emitted in earlier versions are removed and the affected components
  * (only those) are recomputed from the remaining live edges, so the
  * incremental state equals a one-shot build with the same cap on any
  * batch schedule. The cap is a store invariant (persisted in META);
  * changing it would silently fork the edge-set semantics, so a
  * mismatch throws.
  *
  * Storage layout (all Parquet + atomic pointer, via [[Store]] — the
  * same Hadoop FileSystem crash-safety contract as the commit log):
  * {{{
  *   root/CURRENT            "cur base [scope seq]" — pointer (atomic)
  *   root/META               store invariants (banding cap)
  *   root/v{N}/MANIFEST      row counts per table (skip-empty reads)
  *   root/v{N}/members       (doc_id, k, ver)   batch docs → content key
  *   root/v{N}/groups/kp=…   (k, rid, ver)      new distinct content,
  *                                              partitioned by digest prefix
  *   root/v{N}/bands/bp=…    (rid, bkey)        signatures of new reps,
  *                                              partitioned by bkey bucket
  *   root/v{N}/pairs/bp=…    (a, b, bkey,       new edges + provenance
  *                            jac_num, jac_den)  + pair similarity,
  *                                              partitioned by bkey bucket
  *   root/v{N}/dropped       (bkey)             buckets newly over cap
  *   root/v{N}/labels        (rid, cluster, ver) new + relabeled reps
  *   root/v{N}/feats/bp=…    (rid, g, w)        weighted gram features of
  *                                              new reps (only with
  *                                              `gramsOf`), partitioned
  *                                              by rid bucket
  *   root/v{N}/fsizes        (rid, n, nb)       gram-set size + band-row
  *                                              count per new rep
  * }}}
  *
  * Pair-level similarity (`gramsOf`, optional): when the caller supplies
  * a gram-feature function — (doc_id, text) → distinct (doc_id, g) rows,
  * e.g. the char-4-gram shingling of the n-gram-Jaccard pipeline — every
  * emitted pair is persisted WITH its exact Jaccard fraction
  * (jac_num = |A∩B|, jac_den = |A∪B|) computed at pair-emission time.
  * This is the right place to price it: the Jaccard is a pure function
  * of the two contents, pairs are emitted exactly once (new×old +
  * new×new; bucket co-membership is monotone), and pairs die
  * retroactively with capped buckets — so the attributes fold and die
  * with their rows, and a corpus-wide similarity report becomes a READ
  * of the pair index instead of a per-session re-shingle + intersect of
  * every candidate. The gram features themselves persist per NEW rep
  * (the feats index, rid-bucket partitioned so the pair step's
  * old-endpoint reads prune like every other index probe here), and the
  * per-rep size n = Σw² persists in fsizes for consumers that need |A|
  * (or a squared norm) without re-counting (identical-content pairs
  * have J = n/n by construction).
  *
  * Content genericity (`contentCol` / `keyOf` / weighted features /
  * `pairKeep`): nothing in the store's machinery is text-specific —
  * the content column may be any orderable type (e.g. an ARRAY<FLOAT>
  * embedding), `keyOf` supplies its 128-bit identity digest, and a
  * gram feature row may carry an integer weight `w` (omitted = 1), in
  * which case the stored pair score Σ wa·wb generalizes from
  * set-intersection size to an exact integer dot product — fixed-point
  * vector components keyed by dimension make the stored attribute the
  * exact-cosine numerator, with the denominators' squared norms in
  * fsizes. `pairKeep` is an optional pair-ADMISSION predicate over the
  * computed attributes (e.g. a cosine threshold): pure per-content and
  * therefore monotone, so the persisted edge set — and the clustering
  * built on it — equals a one-shot thresholded build on any batch
  * schedule. This one mechanism serves both the text near-dup family
  * (MinHash bands + 4-gram Jaccard) and the embedding near-dup family
  * (hyperplane bands + thresholded exact cosine).
  * A crash between data writes and the CURRENT flip leaves an orphan
  * v{N} dir that readers never see; the retried update overwrites it.
  * [[compact]] squashes all versions into one (and prunes dead pairs),
  * bounding both the reader's union width and delta accumulation — the
  * analog of the engine's segmented-archive fold.
  *
  * At 100 TB the narrow index frames (keys, bands, labels) are the
  * honest linear-size component: updates SCAN them (never re-derive
  * them), and the scans PRUNE — the key index is physically
  * partitioned by digest prefix (`kp=` dirs, 256 uniform hex values)
  * and the band/pair indexes by a bkey hash bucket (`bp=` dirs), and
  * every corpus-sided join in [[update]] filters its index scan to the
  * batch's partition values first, so a daily batch reads the
  * partitions it touches, not the corpus (StatePartitionSpec asserts
  * files-read ∝ touched partitions). The label frame is the one
  * deliberate full read: the merge rewrite needs arbitrary members of
  * changed clusters, and its per-endpoint lookups are semi-pruned to
  * the batch's edge endpoints before joining.
  *
  * Single-writer contract: updates assume one writer per store root
  * (the engine ingest path is single-writer per root already); readers
  * are always safe — they resolve through the atomic pointer and see
  * either the old or the new version, never a partial. `doc_id` is the
  * document identity and must be GLOBALLY unique across batches — rep
  * ids are doc ids, and the quotient-graph argument (old labels and
  * new rep ids never collide as nodes) rests on that uniqueness.
  *
  * Reference anchor: the reference maintains its stat tree incrementally
  * per commit (/root/reference/qtree/qtree.go:436-468 SetChild relink);
  * this class is that idea applied to the ETL dedup indexes.
  */
final class DedupState(
    spark: SparkSession,
    rootUri: String,
    bandsOf: DataFrame => DataFrame,
    maxBucket: Option[Long] = None,
    autoCompactEvery: Int = 0,
    gramsOf: Option[DataFrame => DataFrame] = None,
    contentCol: String = "text",
    keyOf: Column => Column = c => md5(c.cast("binary")),
    pairKeep: Option[Column] = None,
    keepIdentity: Option[String] = None)
  extends VersionedStore(spark, rootUri) {

  require(autoCompactEvery >= 0, "autoCompactEvery must be >= 0 (0 = off)")
  require(pairKeep.isEmpty || gramsOf.isDefined,
    "pairKeep admits pairs on their computed attributes — it requires " +
      "gramsOf (the attribute source); without it the predicate would be " +
      "silently ignored")
  require(keepIdentity.isEmpty || pairKeep.isDefined,
    "keepIdentity names a pair-admission predicate — supply pairKeep " +
      "with it (an identity without the predicate admits nothing)")

  import DedupState._

  /** The content column [[update]] reads from its batches — streaming
    * sinks project their micro-batches to (doc_id, this) instead of
    * assuming the text shape. */
  private[graft] def contentColumn: String = contentCol

  /** The pair-admission predicate's identity: a 128-bit md5 hex of the
    * caller-supplied `keepIdentity` string when given, else of the
    * Column's rendering (toString = the column node's SQL-ish text,
    * deterministic for a given expression tree WITHIN one Spark
    * version — a Spark upgrade may render the same logical predicate
    * differently and permanently refuse reopen/merge, which is why
    * long-lived deployments should pin an EXPLICIT identity string at
    * store creation and keep passing it). A DIGEST rather than the raw
    * text because it rides the comma-separated META line (predicate
    * SQL and identity strings may contain commas) — identity
    * comparison is all the two consumers need: the META edge-set
    * invariant on reopen, and the federation parity check
    * ([[DedupState.federatedGraph]]: members must agree on what an
    * edge IS before their edge sets can be unioned). */
  private[etl] val pairKeepId: Option[String] =
    keepIdentity.map(id => DedupState.keepIdOf(id))
      .orElse(pairKeep.map(DedupState.keepId))
  private[etl] def pairKeepColumn: Option[Column] = pairKeep
  private[etl] def hasGrams: Boolean = gramsOf.isDefined

  /** The admission identity this handle is accountable to: the one
    * recorded on disk (META `keep=`) when the store exists — a
    * read-only handle opened WITHOUT the predicate still knows the
    * store is thresholded — falling back to the declared predicate for
    * a store that has not written META yet. [[DedupState
    * .federatedGraph]] checks parity on THIS (and separately requires
    * the usable Column), so a view handle cannot launder a thresholded
    * store through a merge as if it were unthresholded. */
  private[etl] def storedKeepId: Option[String] =
    store.readString("META").map(_.trim.split(",").collectFirst {
      case e if e.startsWith("keep=") && e != "keep=-" => e.drop(5)
    }).getOrElse(pairKeepId)

  // ---- version pointer & metadata ------------------------------------

  /** (current version, base version, last idempotency key) — base > 1
    * after a compact. The key is (scope, seq): seq numbers are only
    * comparable within one scope (a streaming sink's checkpoint), so a
    * NEW checkpoint against an existing store starts a new scope
    * instead of colliding with the old sequence; it rides the shared
    * pointer's tail tokens ([[VersionedStore.keyedPointer]]). */
  private def pointer: (Long, Long, Option[(String, Long)]) = keyedPointer

  /** The store's bucket-cap invariant — federation merges require all
    * members to agree ([[DedupState.federatedDocClusters]]). */
  def bucketCap: Option[Long] = maxBucket

  /** The last (scope, seq) idempotency key applied by a keyed
    * [[update]], if any. */
  def lastAppliedKey: Option[(String, Long)] = pointer._3

  // keep= carries the admission predicate's 128-bit identity digest
  // (edge-set invariant: reopening a thresholded store with a
  // different — or no — predicate would silently change what an edge
  // is); hex, so the comma-separated META format stays parseable
  private def metaLine: String =
    s"maxBucket=${maxBucket.getOrElse(-1L)},grams=${gramsOf.isDefined}" +
      s",keep=${pairKeepId.getOrElse("-")}"

  private def checkMeta(): Unit =
    // back-compat: a store written before the keep= field existed
    // could not have carried an admission predicate — normalize its
    // META to keep=- instead of refusing every further update
    checkOrWriteMeta(metaLine,
      m => if (m.contains(",keep=")) m else m + ",keep=-")(
      (stored, line) =>
        s"DedupState at $rootUri was built with '$stored', reopened with " +
          s"'$line' — the bucket cap, gram attribution and pair " +
          "admission are edge-set invariants")

  /** Physical partition column per table (directory-level, so index
    * scans prune to a batch's partitions): the key index by digest
    * prefix, the band/pair indexes by bkey hash bucket. `members` and
    * `labels` stay flat — updates never probe members, and the label
    * frame is read whole (the quotient fold needs arbitrary labels). */
  protected val partitionField: Map[String, (StructField, Column)] = Map(
    "groups" -> ((StructField("kp", StringType), keyPrefix(col("k")))),
    "bands" -> ((StructField("bp", IntegerType), bandBucket(col("bkey")))),
    "pairs" -> ((StructField("bp", IntegerType), bandBucket(col("bkey")))),
    // feats are probed by REP id (the pair step's old-endpoint read),
    // so they bucket on rid — same hash-bucket rationale as bkey
    "feats" -> ((StructField("bp", IntegerType), bandBucket(col("rid")))))

  // ---- pruned index scans (the update path's corpus-sided reads) ----
  // Thin names over [[VersionedStore.touching]]: the logical schema,
  // disk frame filtered on its partition column first (pruned scans —
  // StatePartitionSpec asserts files-read ∝ touched partitions).

  private[etl] def seenKeysTouching(prefixes: Seq[String],
                                    upTo: Long): DataFrame =
    touching("groups", GroupsSchema, prefixes, upTo)

  private[etl] def bandsTouching(buckets: Seq[Int], upTo: Long): DataFrame =
    touching("bands", BandsSchema, buckets, upTo)

  private[etl] def pairsTouching(buckets: Seq[Int], upTo: Long): DataFrame =
    touching("pairs", PairsSchema, buckets, upTo)

  private[etl] def featsTouching(buckets: Seq[Int], upTo: Long): DataFrame =
    touching("feats", FeatsSchema, buckets, upTo)
      // feats written before the weight column existed read w = null;
      // they were unweighted sets by construction, so w = 1 exactly
      .withColumn("w", coalesce(col("w"), lit(1L)))

  // ---- member-delta reads (the federated merge's fold inputs) --------
  // Rows a table gained in versions (from, upTo] — what [[FedDedupState
  // .fold]] folds per member at MEMBER-BATCH cost. While every delta
  // version dir is still live (the member has not compacted past
  // `from`), this is a direct read of exactly those dirs, ∝ the delta
  // by construction; after a compact squashed them, each table falls
  // back to an exact reconstruction documented at its reader.

  /** Doc rows admitted in (from, upTo] — ver-exact even after a
    * compact (members keep their arrival version through the squash). */
  private[etl] def membersDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("members", MembersSchema, from, upTo)
      .getOrElse(members(upTo).filter(col("ver") > from))

  /** Distinct content first seen in (from, upTo] — same ver-exact
    * compact fallback as [[membersDelta]]. */
  private[etl] def groupsDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("groups", GroupsSchema, from, upTo)
      .getOrElse(seenKeys(upTo).filter(col("ver") > from))

  /** Band rows of reps first seen in (from, upTo]. Compact fallback:
    * the band index semi-joined to the delta reps — a full scan of the
    * narrow band index (the price of losing the version dirs), exact
    * because a rep's band rows are written once, at its arrival
    * version. */
  private[etl] def bandsDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("bands", BandsSchema, from, upTo)
      .getOrElse(bands(upTo).join(
        groupsDelta(from, upTo).select("rid"), Seq("rid"), "left_semi"))

  /** Pair rows emitted in (from, upTo]. Compact fallback: a pair lands
    * at the version of its LATER endpoint (emission happens when that
    * endpoint arrives), so rows with either endpoint's arrival version
    * > `from` reconstruct the delta exactly — minus pairs the compact
    * already pruned as dead, which the federated merge excludes anyway
    * (a member-dead bucket is globally dead: member size ≤ global
    * size). */
  private[etl] def pairsDelta(from: Long, upTo: Long): DataFrame =
    deltaDirs("pairs", PairsSchema, from, upTo).getOrElse {
      val newRids = groupsDelta(from, upTo).select("rid")
      pairs(upTo)
        .join(newRids.withColumnRenamed("rid", "a"), Seq("a"), "left_semi")
        .unionByName(pairs(upTo)
          .join(newRids.withColumnRenamed("rid", "b"), Seq("b"), "left_semi"))
        .distinct()
    }

  // ---- readers -------------------------------------------------------

  /** Every ingested doc's content key, with the version that admitted
    * it — (doc_id, k, ver). */
  def members(upTo: Long = currentVersion): DataFrame =
    tableFrame("members", MembersSchema, upTo)

  /** The exact-dup index: one row per distinct content ever seen —
    * (k, rid, ver); `ver` is the version that first saw it. */
  def seenKeys(upTo: Long = currentVersion): DataFrame =
    tableFrame("groups", GroupsSchema, upTo)

  /** Persisted band signatures — (rid, bkey). Append-only. */
  def bands(upTo: Long = currentVersion): DataFrame =
    tableFrame("bands", BandsSchema, upTo)

  /** Candidate edges with bucket provenance and (when the store carries
    * `gramsOf`) their exact Jaccard fraction — (a, b, bkey, jac_num,
    * jac_den); jac columns are null in attribute-less stores. Includes
    * edges whose bucket later died; [[liveEdges]] filters those. */
  def pairs(upTo: Long = currentVersion): DataFrame =
    tableFrame("pairs", PairsSchema, upTo)

  /** Persisted gram features per rep — (rid, g, w): unweighted (set)
    * features carry w = 1, weighted ones (e.g. fixed-point vector
    * components) their integer weight. Only populated when the store
    * was built with `gramsOf`; pre-weight-column files read w = 1. */
  def feats(upTo: Long = currentVersion): DataFrame =
    tableFrame("feats", FeatsSchema, upTo)
      .withColumn("w", coalesce(col("w"), lit(1L)))

  /** Per-rep summary — (rid, n = Σw² — set size for unweighted
    * features, squared fixed-point norm for weighted ones — and
    * nb = band rows): reps whose `gramsOf` AND `bandsOf` both emitted
    * nothing are absent. */
  def featSizes(upTo: Long = currentVersion): DataFrame =
    tableFrame("fsizes", FSizesSchema, upTo)

  /** Distinct LIVE pairs with their stored similarity — (a, b, jac_num,
    * jac_den): the corpus near-duplicate report served as a READ of the
    * pair index (the jac columns are a pure function of (a, b), so the
    * per-bucket provenance rows collapse losslessly). */
  def livePairStats(upTo: Long = currentVersion): DataFrame =
    livePairs(upTo)
      .select("a", "b", "jac_num", "jac_den").distinct()

  /** Pair provenance rows whose bucket is still live — the one
    * dead-bucket filter every pair reader builds on. */
  private def livePairs(upTo: Long): DataFrame =
    pairs(upTo).join(dropped(upTo), Seq("bkey"), "left_anti")

  /** Live co-occupancy MULTIPLICITY per pair — (a, b, n_shared): how
    * many LIVE buckets justify the edge. For a store whose banding
    * emits one bucket per content feature (e.g. winnow fingerprints),
    * this is exactly |shared features with df ≤ cap| — each live
    * (a, b, bkey) provenance row was emitted once (a pair enters a
    * bucket only when its later endpoint arrives) and dies with its
    * bucket, so the count folds incrementally and un-counts
    * retroactively with the cap, like every edge here. */
  def livePairCounts(upTo: Long = currentVersion): DataFrame =
    livePairs(upTo)
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))

  /** Buckets dropped for crossing the cap — (bkey). */
  def dropped(upTo: Long = currentVersion): DataFrame =
    tableFrame("dropped", DroppedSchema, upTo)

  /** Distinct live candidate edges (dead buckets' pairs excluded —
    * an edge survives if ANY live bucket still justifies it). */
  def liveEdges(upTo: Long = currentVersion): DataFrame =
    livePairs(upTo)
      .select("a", "b").distinct()

  /** The CONVERGED cluster assignment per rep — (rid, cluster);
    * the latest version's row wins per rid. */
  def labels(upTo: Long = currentVersion): DataFrame =
    tableFrame("labels", LabelsSchema, upTo)
      .groupBy("rid")
      .agg(max_by(col("cluster"), col("ver")).as("cluster"))

  /** Every ingested doc's cluster — (doc_id, cluster, ver); `ver` is
    * the doc's arrival version. Exact-duplicate members inherit their
    * rep's component; singletons are their own. */
  def docClusters(upTo: Long = currentVersion): DataFrame =
    members(upTo)
      .join(seenKeys(upTo).select("k", "rid"), "k")
      .join(labels(upTo), Seq("rid"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("rid")).as("cluster"), col("ver"))

  // ---- update --------------------------------------------------------

  /** Ingest one batch — (doc_id LONG, text STRING) — and fold it into
    * the state. Everything corpus-sized the update touches is a narrow
    * persisted index (keys / bands / labels; pairs only when a bucket
    * dies); the batch's text is the only text read. */
  def update(batch: DataFrame): UpdateReport =
    update(batch, idempotencyKey = None).get

  /** Keyed [[update]] for exactly-once sinks (Structured Streaming
    * `foreachBatch` replays a micro-batch after a crash): a batch whose
    * (scope, seq) key has seq <= the last applied seq OF THE SAME SCOPE
    * is SKIPPED (returns None) — the key rides the atomic CURRENT flip,
    * so a crash between data writes and the flip replays into an orphan
    * version dir and the retry lands cleanly. seq must be monotone per
    * scope (a checkpoint's batchId is); a different scope (a new
    * checkpoint) always applies and starts a fresh sequence. Scopes
    * must not contain whitespace. */
  def update(batch: DataFrame,
             idempotencyKey: Option[(String, Long)]): Option[UpdateReport] = {
    checkMeta()
    val (cur, _, lastKey) = pointer
    (idempotencyKey, lastKey) match {
      case (Some((sc, seq)), Some((lsc, lseq))) if sc == lsc && seq <= lseq =>
        return None
      case _ => ()
    }
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    val b = batch.select(col("doc_id"),
      keyOf(col(contentCol)).as("k"), col(contentCol).as("text"))
    val batchMembers = b.select("doc_id", "k").cpInto(cps)
    // batch-internal digest grouping: rid = min doc_id of first arrival
    val batchGroups = b.groupBy("k")
      .agg(min("doc_id").as("rid"), min("text").as("text"))
      .cpInto(cps)
    // one anti-join against the persisted key index finds new content;
    // the index scan prunes to the batch's digest-prefix partitions
    val batchPrefixes =
      partitionValues[String](batchGroups, keyPrefix(col("k")))
    val newGroups = batchGroups
      .join(seenKeysTouching(batchPrefixes, cur).select("k"),
        Seq("k"), "left_anti")
      .cpInto(cps)
    // report/write row counts batch into ONE job after the last frame
    // materializes (DedupState.countAll) — per-frame .count() calls
    // were a fold-latency tax, not data cost

    // The fold's fixed cost is JOB-LAUNCH LATENCY, not data (a ~1%
    // crawl batch materializes ~20 checkpoint/count/write jobs over a
    // few thousand rows), so independent stages materialize
    // CONCURRENTLY: bands ∥ gram features ∥ the label-index read, then
    // the per-rep summary ∥ the old-bucket probe. Spark job submission
    // is thread-safe. A failure ANYWHERE in the fold must not leave
    // sibling stages running detached into a streaming retry of the
    // same store: every stage registers in `pending`, and the failure
    // path waits them out (suppressing their own errors), releases the
    // checkpoints, and rethrows — the orphan-version crash contract
    // then covers the aborted version dir as usual.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val pending = scala.collection.mutable.ArrayBuffer.empty[Future[_]]
    def stage[T](f: => T): Future[T] = {
      val x = Future(f); pending.synchronized { pending += x }; x
    }
    def drain(t: Throwable): Nothing = {
      pending.synchronized(pending.toList)
        .foreach(p => scala.util.Try(Await.result(p, Duration.Inf)))
      cps.synchronized(cps.toList)
        .foreach(c => scala.util.Try(c.unpersist()))
      throw t
    }
    try {

    // signatures for NEW distinct content only
    val fBands = stage {
      bandsOf(newGroups.select(col("rid").as("doc_id"), col("text")))
        .select(col("doc_id").as("rid"), col("bkey"))
        .cpInto(cps)
    }
    // gram features for NEW distinct content only (when the store
    // carries pair attributes) — the same ∝-batch contract as bands.
    // A feature row is (g, w): unweighted (set) features omit `w` and
    // get w = 1, making the pair score Σ wa·wb the set-intersection
    // size; weighted features (e.g. fixed-point vector components
    // keyed by dimension) make it an exact integer dot product.
    val fFeats = stage {
      gramsOf.map { gf =>
        val out = gf(newGroups.select(col("rid").as("doc_id"), col("text")))
        val weighted =
          if (out.columns.contains("w")) out else out.withColumn("w", lit(1L))
        weighted.select(col("doc_id").as("rid"), col("g"),
          col("w").cast("long").as("w")).cpInto(cps)
      }
    }
    // the label-index read is batch-independent — overlap it with the
    // signature work; it is consumed after the pair step
    val fLabels = stage { labels(cur).cpInto(cps) }
    val newBands = Await.result(fBands, Duration.Inf)
    val newFeats = Await.result(fFeats, Duration.Inf)

    // per-rep summary row: gram-set size + band-row count — `nb` lets
    // consumers ask "did this rep band at all?" (the intra-pair gate of
    // the expansion) without touching the band index, whose
    // corpus-sized partitioned layout is priced for PRUNED probes, not
    // full-index distincts
    // n = Σ w² — the set SIZE for unweighted features (w = 1) and the
    // squared fixed-point NORM for weighted ones; one definition
    // serves both the Jaccard denominator and the cosine denominator
    val fSizes = stage {
      newFeats.map { f =>
        f.groupBy("rid").agg(sum(col("w") * col("w")).as("n"))
          .join(newBands.groupBy("rid").agg(count(lit(1)).as("nb")),
            Seq("rid"), "full_outer")
          .select(col("rid"), coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("nb"), lit(0L)).as("nb"))
          .cpInto(cps)
      }
    }
    // old members of the touched buckets: the band-index scan prunes
    // to the touched bkey-bucket partitions, then the semi-join prunes
    // to the exact buckets before anything pairs
    val fOld = stage {
      // newBands is checkpointed — the distinct over it is cheap to
      // evaluate twice (collect + semi-join build side), and skipping
      // its own checkpoint saves a job on the fold's critical path
      val t = newBands.select("bkey").distinct()
      val buckets = partitionValues[Int](t, bandBucket(col("bkey")))
      bandsTouching(buckets, cur)
        .join(t, Seq("bkey"), "left_semi")
        .cpInto(cps)
    }
    val newSizes = Await.result(fSizes, Duration.Inf)
    val oldTouched = Await.result(fOld, Duration.Inf)

    // bucket-cap accounting on TOTAL (old + new) size
    val prevDropped = dropped(cur)
    val newlyDropped = maxBucket match {
      case None => emptyFrame(DroppedSchema)
      case Some(cap) =>
        val oldSz = oldTouched.groupBy("bkey").agg(count(lit(1)).as("oldN"))
        val newSz = newBands.groupBy("bkey").agg(count(lit(1)).as("newN"))
        newSz.join(oldSz, Seq("bkey"), "left_outer")
          .filter(col("newN") + coalesce(col("oldN"), lit(0L)) > cap)
          .join(prevDropped, Seq("bkey"), "left_anti")
          .select("bkey").cpInto(cps)
    }
    val nDroppedBuckets =
      if (maxBucket.isEmpty) 0L else newlyDropped.count()
    val deadKeys = prevDropped.select("bkey")
      .unionByName(newlyDropped).distinct()

    // new candidate edges: new×old + new×new within live buckets
    val liveNew = newBands.join(deadKeys, Seq("bkey"), "left_anti")
    val liveOld = oldTouched.join(deadKeys, Seq("bkey"), "left_anti")
    val crossPairs = liveNew.as("n")
      .join(liveOld.as("o"), "bkey")
      .select(least(col("n.rid"), col("o.rid")).as("a"),
        greatest(col("n.rid"), col("o.rid")).as("b"), col("bkey"))
    val selfPairs = liveNew.as("x")
      .join(liveNew.as("y"), "bkey")
      .filter(col("x.rid") < col("y.rid"))
      .select(col("x.rid").as("a"), col("y.rid").as("b"), col("bkey"))
    val rawPairs = crossPairs.unionByName(selfPairs)
    // pair-emission-time similarity: exact Jaccard of the two
    // endpoints' gram sets, priced ONCE per pair ever (pairs are
    // monotone; dying buckets take their pair rows — and the stored
    // attributes — with them). Endpoint-bounded: old endpoints' gram
    // sets come from the feats index pruned to the endpoints' rid
    // buckets, never the corpus.
    val newPairs = (newFeats match {
      case None => rawPairs
        .withColumn("jac_num", lit(null).cast("long"))
        .withColumn("jac_den", lit(null).cast("long"))
      case Some(nf) =>
        val ab = rawPairs.select("a", "b").distinct()
        val endpoints = ab.select(col("a").as("rid"))
          .unionByName(ab.select(col("b").as("rid"))).distinct().cpInto(cps)
        val epFeats = nf.join(endpoints, Seq("rid"), "left_semi")
          .unionByName(featsTouching(
              partitionValues[Int](endpoints, bandBucket(col("rid"))), cur)
            .join(endpoints, Seq("rid"), "left_semi"))
          .cpInto(cps)
        val jac = pairAttributes(ab, epFeats)
        pairKeep match {
          // pair-ADMISSION predicate over (jac_num, jac_den, na, nb):
          // a pure content function (e.g. a cosine threshold over the
          // stored dot + norms), so admission is monotone like bucket
          // co-membership — a rejected pair is rejected on any batch
          // schedule, and the persisted edge set (hence the
          // clustering) equals the one-shot thresholded build
          case Some(keep) =>
            rawPairs.join(jac.filter(keep).select("a", "b", "jac_num",
              "jac_den"), Seq("a", "b"))
          case None =>
            rawPairs.join(jac.select("a", "b", "jac_num", "jac_den"),
              Seq("a", "b"), "left_outer")
        }
    }).cpInto(cps)
    val newEdges = newPairs.select("a", "b").distinct()

    // materialized concurrently with the signature stage above
    val curLabels = Await.result(fLabels, Duration.Inf)

    // ---- retroactive cap + additions: the shared label fold ----
    // the pair-index scan prunes to the dying buckets' partitions
    val removed =
      if (nDroppedBuckets == 0) emptyFrame(PairsSchema).select("a", "b")
      else pairsTouching(
          partitionValues[Int](newlyDropped, bandBucket(col("bkey"))), cur)
        .join(newlyDropped, Seq("bkey"), "left_semi")
        .select("a", "b").distinct().cpInto(cps)
    val labelDeltas = DedupState.foldLabels(
      curLabels, newEdges, newGroups.select("rid"),
      removed, hasRemovals = nDroppedBuckets > 0,
      livePriorEdges = pairs(cur).join(deadKeys, Seq("bkey"), "left_anti")
        .select("a", "b").distinct(),
      cps = cps)

    // every report/write count in ONE job, now that the last frame is
    // materialized (see DedupState.countAll)
    val it = DedupState.countAll(
      Seq(batchMembers, batchGroups, newGroups, newBands) ++
        newFeats.toSeq ++ newSizes.toSeq ++
        Seq(newPairs, labelDeltas)).iterator
    val nBatchDocs = it.next(); val nBatchDistinct = it.next()
    val nNewDistinct = it.next(); val nBandRows = it.next()
    val nGramRows = if (newFeats.isDefined) it.next() else 0L
    val nSizeRows = if (newSizes.isDefined) it.next() else 0L
    val nNewPairs = it.next(); val nLabelRows = it.next()
    val nRelabeled = nLabelRows - nNewDistinct

    // ---- persist: data dirs → MANIFEST → CURRENT (atomic flip) ----
    // the eight table writes are independent (checkpointed inputs,
    // disjoint target dirs) and land CONCURRENTLY; the MANIFEST and
    // the pointer flip wait for all of them — a crash mid-writes
    // leaves an orphan v{next} the retry overwrites, exactly as with
    // sequential writes
    val base = pointer._2
    def writeDelta(name: String, df: DataFrame, n: Long)
        : Future[(String, Long)] =
      stage(name -> writeTable(next, name, df, n))
    val counts = Await.result(Future.sequence(Seq(
      writeDelta("members",
        batchMembers.withColumn("ver", lit(next)), nBatchDocs),
      writeDelta("groups",
        newGroups.select("k", "rid").withColumn("ver", lit(next)),
        nNewDistinct),
      writeDelta("bands", newBands, nBandRows),
      newFeats.map(writeDelta("feats", _, nGramRows))
        .getOrElse(Future("feats" -> 0L)),
      newSizes.map(writeDelta("fsizes", _, nSizeRows))
        .getOrElse(Future("fsizes" -> 0L)),
      writeDelta("pairs", newPairs, nNewPairs),
      writeDelta("dropped", newlyDropped, nDroppedBuckets),
      writeDelta("labels",
        labelDeltas.withColumn("ver", lit(next)), nLabelRows))),
      Duration.Inf)
    flipPointer(next, base, counts, keyTail(idempotencyKey.orElse(lastKey)))
    cps.foreach(_.unpersist())
    // bounded maintenance: once the reader's delta-union spans the
    // threshold, squash — the same self-maintenance cadence the
    // engine's segmented archive runs on. Runs AFTER the flip, so a
    // crash mid-compact costs nothing (the next update retries it).
    // Report the POST-compact version in that case: compact advances
    // the base past `next`, so a caller using report.version as an
    // upTo bound would otherwise read an empty union of deleted dirs.
    val finalVersion =
      if (autoCompactEvery > 0 && next - base + 1 >= autoCompactEvery)
        compact()
      else next

    Some(UpdateReport(finalVersion, nBatchDocs, nBatchDistinct, nNewDistinct,
      nBandRows, nNewPairs, nDroppedBuckets, math.max(0L, nRelabeled),
      nGramRows))

    } catch { case t: Throwable => drain(t) }
  }

  /** Squash all versions into one full snapshot (pruning dead buckets'
    * pairs) and advance the read base — bounds the reader's union
    * width and the label-delta accumulation, like the engine's
    * segmented-archive fold. Members/groups keep their original `ver`
    * (arrival semantics); labels carry the snapshot version. */
  def compact(): Long = {
    val (cur, base, lastKey) = pointer
    if (cur == 0) return 0L
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // lazy: each table takes its one checkpoint inside its write
    // future below — a definition-site checkpoint would materialize
    // the pair and label frames twice per compact
    val livePairs = pairs(cur)
      .join(dropped(cur), Seq("bkey"), "left_anti")
    val resolved = labels(cur).withColumn("ver", lit(next))
    val tables = Seq(
      ("members", members(cur)), ("groups", seenKeys(cur)),
      ("bands", bands(cur)), ("feats", feats(cur)),
      ("fsizes", featSizes(cur)), ("pairs", livePairs),
      ("dropped", dropped(cur)), ("labels", resolved))
    // the eight squash writes are independent (disjoint target dirs)
    // and land concurrently — compact runs INSIDE the fold at the
    // auto-compact cadence, so its wall-clock is fold tail latency.
    // On failure, wait the sibling writes out (suppressed) and release
    // the checkpoints before rethrowing — nothing may run detached
    // into a retry (the orphan v{next} dir is then overwritten).
    val counts = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = tables.map { case (name, df) =>
        Future {
          val chk = df.cpInto(cps)
          name -> writeTable(next, name, chk, chk.count())
        }
      }
      try Await.result(Future.sequence(fs), Duration.Inf)
      catch { case t: Throwable =>
        fs.foreach(f => scala.util.Try(Await.result(f, Duration.Inf)))
        cps.synchronized(cps.toList)
          .foreach(c => scala.util.Try(c.unpersist()))
        throw t
      }
    }
    flipPointer(next, next, counts, keyTail(lastKey))
    cps.foreach(_.unpersist())
    dropVersions(base, cur, next)
    next
  }
}
