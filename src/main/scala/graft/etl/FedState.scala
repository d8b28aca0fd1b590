package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.Store

/** Shared plumbing of the INCREMENTAL FEDERATION stores
  * ([[FedDedupState]], [[FedContamState]]) on top of the one
  * [[VersionedStore]] machinery: the federation-specific pointer
  * payload is ONE FOLD WATERMARK PER MEMBER ("cur base w0 w1 …",
  * member order fixed by META), so a fold knows exactly which member
  * versions it has already absorbed and a replay after a crash between
  * data writes and the flip re-folds the same member deltas into an
  * orphan dir the retry overwrites — the member stores' idempotency
  * contract, carried by the watermarks instead of a (scope, seq) key.
  *
  * [[FedDedupState.compact]] / [[FedContamState.compact]] squash the
  * delta dirs into one snapshot (pruning dead pairs / capped postings)
  * and advance the read base — the [[DedupState.compact]] shape, run
  * on the `autoCompactEvery` cadence when set, so a streaming-cadence
  * federation bounds its reader's union width like the member stores.
  */
private[etl] abstract class FedStoreBase(
    sparkSession: SparkSession, rootUri: String)
  extends VersionedStore(sparkSession, rootUri) {

  /** 128-bit identity of a member root URI — member-list entries in
    * META (root URIs may contain commas; digests never do). */
  protected def memberId(memberRoot: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(memberRoot.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ---- version pointer: "cur base w0 w1 …" ----------------------------

  /** Format sanity on EVERY parse: base ∈ [1, cur] always — a token
    * stream that violates it (e.g. a pre-base-format pointer whose
    * first watermark lands in the base slot) must fail LOUDLY here,
    * not misparse into empty reads or a corpus re-absorption. */
  protected override def validatePointer(p: Seq[String]): Unit = {
    val s = p.mkString(" ")
    require(p.length >= 2, s"malformed federation CURRENT '$s'")
    val (cur, base) = (p(0).toLong, p(1).toLong)
    require(base >= 1 && base <= cur,
      s"federation CURRENT '$s' at $rootUri does not parse as " +
        "'cur base w0 w1 …' — refusing rather than misreading")
  }

  protected def pointer: (Long, Long, Seq[Long]) = {
    val (cur, base, tail) = pointerParts
    (cur, base, tail.map(_.toLong))
  }

  /** Per-member fold watermarks (member versions already absorbed),
    * zero-filled before the first fold. */
  protected def watermarks(nMembers: Int): Seq[Long] = {
    val (_, _, ws) = pointer
    if (ws.isEmpty) Seq.fill(nMembers)(0L)
    else {
      require(ws.size == nMembers,
        s"federation store at $rootUri tracks ${ws.size} member " +
          s"watermarks but was opened with $nMembers members — " +
          "membership is fixed at store creation")
      ws
    }
  }

  /** [[VersionedStore.flipPointer]] with the watermarks as the pointer
    * tail. */
  protected def flip(next: Long, base: Long, counts: Seq[(String, Long)],
                     wms: Seq[Long]): Unit =
    flipPointer(next, base, counts, wms.map(_.toString))

  protected def checkFedMeta(metaLine: String): Unit =
    checkOrWriteMeta(metaLine)((stored, line) =>
      s"federation store at $rootUri was built with '$stored', " +
        s"reopened with '$line' — membership and edge-set " +
        "invariants are fixed at store creation")

  /** Persist the member ROOT URIs (one per line) beside META, so a
    * daemon can reconstruct read handles from the store root alone
    * ([[EtlViews]]); META's member digests stay the identity check,
    * this file is the directory. */
  protected def writeMembersFile(roots: Seq[String]): Unit =
    if (!store.exists("MEMBERS"))
      store.writeAtomic("MEMBERS", roots.mkString("\n"))
}

object FedDedupState {

  /** Per-fold accounting: every count must track the MEMBER DELTAS,
    * never the federation corpus — the federated analog of
    * [[DedupState.UpdateReport]]'s proportionality contract. */
  final case class FoldReport(
      version: Long,
      memberVersions: Seq[Long],
      nNewReps: Long,
      nStarEdges: Long,
      nNewPairs: Long,
      nDroppedBuckets: Long,
      nLabelRows: Long)

  private[etl] val FBandsSchema = StructType(Seq(
    StructField("bkey", StringType), StructField("k", StringType),
    StructField("rid", LongType), StructField("m", IntegerType)))
  private[etl] val FStarsSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))
}

/** The INCREMENTAL federated dedup merge — a versioned store that folds
  * MEMBER DELTAS at member-batch cost, retiring the one repeating
  * ∝-corpus job the one-shot readers ([[DedupState.federatedDocClusters]]
  * / [[DedupState.federatedLivePairStats]] / [[DedupState
  * .federatedPairReport]]) pay per invocation: a JDBC view refreshing
  * the federation's `_clusters`/`_dup_pairs` no longer rebuilds the
  * cross-member candidate graph and re-runs CC over the corpus — it
  * reads converged labels this store folded incrementally, exactly as
  * the single-store views read [[DedupState]]'s.
  *
  * The reads serve the one-shot merges' results VERBATIM on any fold
  * schedule, because every ingredient of the federated edge set is
  * monotone-with-retroactive-death — the same shape [[DedupState
  * .update]] folds within one store:
  *
  *   - WITHIN-member admitted pairs arrive as member pair-index deltas
  *     (emitted once ever, at the later endpoint's arrival, attributes
  *     computed at emission);
  *   - CROSS-member candidacy is bucket co-membership, monotone: a
  *     cross pair becomes visible exactly when its later endpoint's
  *     band rows arrive in some member delta, so folding delta bands
  *     against the accumulated federation band index (pruned to the
  *     delta's bkey-bucket partitions) emits each cross pair once.
  *     Admission re-scores candidates from member feats probes through
  *     the SHARED predicate ([[DedupState.pairAttributes]] — candidacy
  *     ≠ admission in a thresholded store);
  *   - the GLOBAL bucket cap counts distinct CONTENT per bucket
  *     (member reps of shared content collapse through `k` before
  *     counting — the single-store unit), grows monotonically, and
  *     kills pair provenance rows retroactively, exactly like the
  *     member-local cap;
  *   - same-content reps across members link by STAR edges to the
  *     content's first-known federation rep — any spanning tree of a
  *     content's reps yields the same connectivity, so later canon
  *     changes (a smaller rid arriving late) need no edge rewrites;
  *   - labels fold through the ONE shared quotient-graph algebra
  *     ([[DedupState.foldLabels]]): min-label CC over nodes that are
  *     labels-or-new-rids keeps the global-min-rid labeling the
  *     one-shot pipeline assigns, and removal recomputes only the
  *     components that lost an edge — here from live pairs AND star
  *     edges (stars never die: content never leaves a member).
  *
  * Member deltas are read from the members' version dirs directly
  * (∝ the delta) while those dirs are live, with exact documented
  * fallbacks after a member compact ([[DedupState.membersDelta]] ff.).
  * Parity (cap / gram attribution / admission identity) is the same
  * contract as the one-shot merge ([[DedupState.memberParity]]) plus
  * a fixed member list in META; watermarks make replays idempotent.
  *
  * The globally-unique doc_id refusal is ∝ delta against the flat
  * federation members index — a narrow (doc_id, k) scan; deployments
  * whose federation assigns members disjoint id ranges (the reference's
  * ownership contract, `Federation.ownerOf`) can disable it
  * (`verifyDocIds = false`) since the invariant holds by construction.
  *
  * Reference anchor: the reference federates per-collection trees
  * behind one API (/root/reference/grpcinterface/interface.go) — this
  * store is that idea applied to the cross-member dedup graph, with
  * the incremental fold the reference's commit model implies.
  */
final class FedDedupState(
    sparkSession: SparkSession,
    rootUri: String,
    members: Seq[DedupState],
    verifyDocIds: Boolean = true,
    autoCompactEvery: Int = 0)
  extends FedStoreBase(sparkSession, rootUri) {

  require(autoCompactEvery >= 0, "autoCompactEvery must be >= 0 (0 = off)")

  import DedupState.{MembersSchema, GroupsSchema, PairsSchema,
    DroppedSchema, LabelsSchema, keyPrefix, bandBucket, Tracked}
  import FedDedupState._

  /** The member handles this federation store folds (fixture/daemon
    * callers fold members and the federation under one orchestration —
    * the store exposes its members so they need not be threaded
    * separately). */
  def memberStores: Seq[DedupState] = members

  // the one-shot merge's parity contract — LAZY, so a read-only handle
  // over bare member handles (the JDBC view surface, where stored rows
  // are already admission-filtered) can serve reads; fold() forces it,
  // exactly the single-store rule ("views open bare, merges demand the
  // predicate")
  private lazy val parity = DedupState.memberParity(members)

  private def metaLine: String = {
    val (cap, grams, _) = parity
    s"cap=${cap.getOrElse(-1L)},grams=$grams" +
      s",keep=${members.head.storedKeepId.getOrElse("-")}" +
      s",members=${members.map(st => memberId(st.root)).mkString(":")}"
  }

  protected val partitionField: Map[String, (StructField, Column)] = Map(
    "fgroups" -> ((StructField("kp", StringType), keyPrefix(col("k")))),
    "fbands" -> ((StructField("bp", IntegerType), bandBucket(col("bkey")))),
    "fpairs" -> ((StructField("bp", IntegerType), bandBucket(col("bkey")))))

  // ---- readers ---------------------------------------------------------

  /** All member docs — (doc_id, k, ver); ver = the fold that absorbed
    * them. */
  def fedMembers(upTo: Long = currentVersion): DataFrame =
    tableFrame("fmembers", MembersSchema, upTo)

  /** Every member rep ever absorbed — (k, rid, ver). A content key
    * ingested by several members carries one row PER member rep. */
  def fedGroups(upTo: Long = currentVersion): DataFrame =
    tableFrame("fgroups", GroupsSchema, upTo)

  /** The canonical federation rep per content key — (k, crid), the
    * global min rid, exactly the rep a single store over the union
    * corpus would keep. Derived (min is a fold-free read), so a
    * smaller rid arriving late updates canon with no rewrite. */
  def canon(upTo: Long = currentVersion): DataFrame =
    fedGroups(upTo).groupBy("k").agg(min("rid").as("crid"))

  private def fedBands(upTo: Long): DataFrame =
    tableFrame("fbands", FBandsSchema, upTo)

  private def fedBandsTouching(buckets: Seq[Int], upTo: Long): DataFrame =
    diskFrame("fbands", FBandsSchema, upTo)
      .filter(col("bp").isin(buckets: _*)).drop("bp")

  private def fedPairs(upTo: Long): DataFrame =
    tableFrame("fpairs", PairsSchema, upTo)

  private def fedPairsTouching(buckets: Seq[Int], upTo: Long): DataFrame =
    diskFrame("fpairs", PairsSchema, upTo)
      .filter(col("bp").isin(buckets: _*)).drop("bp")

  private def fedGroupsTouching(prefixes: Seq[String],
                                upTo: Long): DataFrame =
    diskFrame("fgroups", GroupsSchema, upTo)
      .filter(col("kp").isin(prefixes: _*)).drop("kp")

  private def stars(upTo: Long): DataFrame =
    tableFrame("fstars", FStarsSchema, upTo)

  def dropped(upTo: Long = currentVersion): DataFrame =
    tableFrame("fdropped", DroppedSchema, upTo)

  /** Converged federation labels per member rep — (rid, cluster);
    * latest fold's row wins, like the member stores' label reader. */
  def labels(upTo: Long = currentVersion): DataFrame =
    tableFrame("flabels", LabelsSchema, upTo)
      .groupBy("rid")
      .agg(max_by(col("cluster"), col("ver")).as("cluster"))

  /** Corpus-wide clusters across federation members — (doc_id,
    * cluster, ver): [[DedupState.federatedDocClusters]]'s result served
    * as a READ of the persisted fold (no candidate graph, no CC); `ver`
    * is the fold that absorbed the doc, the single-store analog. */
  def docClusters(upTo: Long = currentVersion): DataFrame =
    fedMembers(upTo).join(canon(upTo), "k")
      .join(labels(upTo).withColumnRenamed("rid", "crid"),
        Seq("crid"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("crid")).as("cluster"), col("ver"))

  /** The federated near-duplicate pair report in CANONICAL rid space —
    * (a, b, jac_num, jac_den), a < b, distinct: [[DedupState
    * .federatedLivePairStats]]'s result as a read of the persisted
    * pair index (same-content pairs collapse to self and drop, the
    * attribute columns are pure content functions so duplicates of a
    * canonical pair agree and the distinct is lossless). */
  def livePairStats(upTo: Long = currentVersion): DataFrame = {
    val m = fedGroups(upTo).join(canon(upTo), "k")
      .select(col("rid"), col("crid"))
    fedPairs(upTo).join(dropped(upTo), Seq("bkey"), "left_anti")
      .select("a", "b", "jac_num", "jac_den")
      .join(m.select(col("rid").as("a"), col("crid").as("ca")), "a")
      .join(m.select(col("rid").as("b"), col("crid").as("cb")), "b")
      .filter(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"),
        col("jac_num"), col("jac_den"))
      .distinct()
  }

  /** Live co-occupancy MULTIPLICITY per CANONICAL pair — (a, b,
    * n_shared): the federated [[DedupState.livePairCounts]], the
    * winnow-match read. A single store over the union corpus holds ONE
    * live provenance row per (pair, bucket); here the same co-occupancy
    * may arrive several times — one member pair row per member holding
    * both contents, plus cross rows between every rep combination — so
    * the count is over DISTINCT (canonical a, canonical b, bkey)
    * triples, which is exactly the single-store row set: banding is
    * pure content, so every member rep of a content occupies the same
    * buckets, and the canonical mapping collapses the rep multiplicity
    * the federation introduced. Same-content pairs collapse to self
    * and drop; dead buckets' rows are excluded (retroactive cap),
    * exactly the member-store read. */
  def livePairCounts(upTo: Long = currentVersion): DataFrame = {
    val m = fedGroups(upTo).join(canon(upTo), "k")
      .select(col("rid"), col("crid"))
    fedPairs(upTo).join(dropped(upTo), Seq("bkey"), "left_anti")
      .select("a", "b", "bkey")
      .join(m.select(col("rid").as("a"), col("crid").as("ca")), "a")
      .join(m.select(col("rid").as("b"), col("crid").as("cb")), "b")
      .filter(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"), col("bkey"))
      .distinct()
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
  }

  /** Canonical per-rep feature summary — (rid, n, nb), [[DedupState
    * .federatedFeatSizes]]'s result: sizes are pure content functions,
    * read from the members' fsizes tables (narrow, one row per rep)
    * through the persisted canon map. */
  def featSizes(upTo: Long = currentVersion): DataFrame = {
    val m = fedGroups(upTo).join(canon(upTo), "k")
      .select(col("rid"), col("crid"))
    members.map(_.featSizes()).reduce(_ unionByName _)
      .join(m, "rid")
      .select(col("crid").as("rid"), col("n"), col("nb"))
      .distinct()
  }

  /** The combined pair report — (a, b, jac_num, jac_den, na, nb), the
    * `_dup_pairs` view shape ([[DedupState.federatedPairReport]]). */
  def pairReport(upTo: Long = currentVersion): DataFrame = {
    val sz = featSizes(upTo)
    livePairStats(upTo)
      .join(sz.select(col("rid").as("a"), col("n").as("na")),
        Seq("a"), "left_outer")
      .join(sz.select(col("rid").as("b"), col("n").as("nb")),
        Seq("b"), "left_outer")
      .select("a", "b", "jac_num", "jac_den", "na", "nb")
  }

  // ---- fold ------------------------------------------------------------

  /** Fold every member's unabsorbed versions into the federation state.
    * Cost ∝ the member deltas (pruned probes against the federation's
    * own partitioned indexes; the quotient label fold); no-op (None)
    * when every member is already absorbed. */
  def fold(): Option[FoldReport] = {
    val (cap, grams, keepCol) = parity
    checkFedMeta(metaLine)
    writeMembersFile(members.map(_.root))
    val (cur, base, _) = pointer
    val wms = watermarks(members.size)
    // pin each member's version NOW: members are independent writers,
    // and the fold must absorb a consistent (wm, pinned] window even
    // if a member flips mid-fold
    val pinned = members.map(_.currentVersion)
    if (wms.zip(pinned).forall { case (w, v) => w >= v }) return None
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      val deltas = members.zipWithIndex.zip(wms).zip(pinned).collect {
        case (((st, m), wm), v) if v > wm => (st, m, wm, v)
      }

      // ---- member deltas, tagged by member index ----
      val dGroups = deltas.map { case (st, m, wm, v) =>
          st.groupsDelta(wm, v).select("k", "rid").withColumn("m", lit(m)) }
        .reduce(_ unionByName _).cpInto(cps)
      val dMembers = deltas.map { case (st, _, wm, v) =>
          st.membersDelta(wm, v).select("doc_id", "k") }
        .reduce(_ unionByName _).cpInto(cps)

      // ---- globally-unique doc_id refusal (see class doc) ----
      if (verifyDocIds) {
        val knownHit = fedMembers(cur).select("doc_id", "k")
          .join(dMembers.select("doc_id"), Seq("doc_id"), "left_semi")
        val conflicts = dMembers.select("doc_id", "k").unionByName(knownHit)
          .groupBy("doc_id").agg(countDistinct("k").as("nk"))
          .filter(col("nk") > 1).limit(1).collect()
        require(conflicts.isEmpty,
          s"doc_id ${conflicts.head.getLong(0)} carries different " +
            "content in different federation members — doc_ids must be " +
            "globally unique across members")
      }

      // ---- federation band rows of the delta: (bkey, k, rid, m) ----
      // bands are written per NEW member rep, so the rid join against
      // the delta groups is total
      val newFBands = deltas.map { case (st, m, wm, v) =>
          st.bandsDelta(wm, v).withColumn("m", lit(m)) }
        .reduce(_ unionByName _)
        .select("rid", "bkey", "m")
        .join(dGroups.select("rid", "k"), "rid")
        .select("bkey", "k", "rid", "m")
        .cpInto(cps)

      // ---- global bucket cap: distinct CONTENT per bucket ----
      // the accumulated index is probed only at the delta's bkey-bucket
      // partitions; member reps of shared content collapse through `k`
      // before counting (the single-store counting unit — raw rows
      // would inflate shared buckets)
      val touched = newFBands.select("bkey").distinct().cpInto(cps)
      val buckets = partitionValues[Int](touched, bandBucket(col("bkey")))
      val oldTouched = fedBandsTouching(buckets, cur)
        .join(touched, Seq("bkey"), "left_semi")
        .cpInto(cps)
      val prevDropped = dropped(cur)
      val newlyDropped = cap match {
        case None => emptyFrame(DroppedSchema)
        case Some(c) =>
          val oldK = oldTouched.select("bkey", "k").distinct()
          val newK = newFBands.select("bkey", "k").distinct()
            .join(oldK, Seq("bkey", "k"), "left_anti")
          val oldSz = oldK.groupBy("bkey").agg(count(lit(1)).as("oldN"))
          newK.groupBy("bkey").agg(count(lit(1)).as("newN"))
            .join(oldSz, Seq("bkey"), "left_outer")
            .filter(col("newN") + coalesce(col("oldN"), lit(0L)) > c)
            .join(prevDropped, Seq("bkey"), "left_anti")
            .select("bkey").cpInto(cps)
      }
      val nDroppedBuckets = newlyDropped.count()
      val deadKeys = prevDropped.select("bkey")
        .unionByName(newlyDropped).distinct()

      // ---- cross-member candidates: delta × accumulated, live ----
      // within-member pairs arrive pre-admitted from the member delta;
      // only DIFFERENT-member co-bucketing pairs here (x.m ≠ y.m),
      // normalized + distinct so delta×delta pairs emit once
      val liveNew = newFBands.join(deadKeys, Seq("bkey"), "left_anti")
      val liveAll = oldTouched.join(deadKeys, Seq("bkey"), "left_anti")
        .unionByName(liveNew)
      val crossCand = liveNew.as("x")
        .join(liveAll.as("y"), "bkey")
        .filter(col("x.m") =!= col("y.m"))
        .select(least(col("x.rid"), col("y.rid")).as("a"),
          greatest(col("x.rid"), col("y.rid")).as("b"), col("bkey"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .cpInto(cps)

      // ---- cross admission: score from member feats, shared algebra --
      val crossRows: DataFrame =
        if (!grams)
          crossCand.withColumn("jac_num", lit(null).cast("long"))
            .withColumn("jac_den", lit(null).cast("long"))
        else {
          val ab = crossCand.select("a", "b").distinct()
          val eps = ab.select(col("a").as("rid"))
            .unionByName(ab.select(col("b").as("rid"))).distinct()
            .cpInto(cps)
          val epBuckets = partitionValues[Int](eps, bandBucket(col("rid")))
          // ALL members, not just the folding ones: a candidate's old
          // endpoint may belong to a member with no delta this fold,
          // and its features live only in that member's feats index
          val epFeats = members.map(st =>
              st.featsTouching(epBuckets, st.currentVersion))
            .reduce(_ unionByName _)
            .join(eps, Seq("rid"), "left_semi")
          val scored = DedupState.pairAttributes(ab, epFeats)
          val admitted = keepCol match {
            case Some(keep) => scored.filter(keep)
            case None => scored
          }
          crossCand.join(
            admitted.select("a", "b", "jac_num", "jac_den"), Seq("a", "b"))
        }

      // ---- new pair provenance rows: member deltas + cross, live ----
      val dPairs = deltas.map { case (st, _, wm, v) => st.pairsDelta(wm, v) }
        .reduce(_ unionByName _)
        .join(deadKeys, Seq("bkey"), "left_anti")
      val newPairRows = dPairs
        .select("a", "b", "bkey", "jac_num", "jac_den")
        .unionByName(crossRows.select("a", "b", "bkey",
          "jac_num", "jac_den"))
        .cpInto(cps)

      // ---- star edges: each delta rep links to its content's anchor --
      // anchor = the content's first-known federation rep (existing min
      // if known, else the delta's min) — any spanning tree of a
      // content's reps gives the same connectivity, so a smaller rid
      // arriving LATE still connects (to the old anchor) and canon
      // (a derived min) moves with no edge rewrites
      val prefixes = partitionValues[String](dGroups, keyPrefix(col("k")))
      val knownMin = fedGroupsTouching(prefixes, cur)
        .join(dGroups.select("k"), Seq("k"), "left_semi")
        .groupBy("k").agg(min("rid").as("kmin"))
      val anchors = dGroups.groupBy("k").agg(min("rid").as("dmin"))
        .join(knownMin, Seq("k"), "left_outer")
        .select(col("k"), coalesce(col("kmin"), col("dmin")).as("anchor"))
      val starEdges = dGroups.join(anchors, "k")
        .filter(col("rid") =!= col("anchor"))
        .select(least(col("rid"), col("anchor")).as("a"),
          greatest(col("rid"), col("anchor")).as("b"))
        .cpInto(cps)

      // ---- labels: the ONE shared quotient fold ----
      val newEdges = newPairRows.select("a", "b")
        .unionByName(starEdges).distinct()
      val removed =
        if (nDroppedBuckets == 0)
          emptyFrame(PairsSchema).select("a", "b")
        else fedPairsTouching(
            partitionValues[Int](newlyDropped, bandBucket(col("bkey"))), cur)
          .join(newlyDropped, Seq("bkey"), "left_semi")
          .select("a", "b").distinct().cpInto(cps)
      val curLabels = labels(cur).cpInto(cps)
      val labelDeltas = DedupState.foldLabels(
        curLabels, newEdges, dGroups.select("rid"),
        removed, hasRemovals = nDroppedBuckets > 0,
        // stars never die (content never leaves a member), so the
        // removal recompute must see them alongside the live pairs
        livePriorEdges = fedPairs(cur)
          .join(deadKeys, Seq("bkey"), "left_anti")
          .select("a", "b").distinct()
          .unionByName(stars(cur)),
        cps = cps)

      // every report/write count in ONE job ([[DedupState.countAll]])
      val Seq(nNewDocs, nNewReps, nFBands, nNewPairs, nStarEdges,
        nLabelRows) = DedupState.countAll(Seq(
        dMembers, dGroups, newFBands, newPairRows, starEdges, labelDeltas))

      // ---- persist: data dirs → MANIFEST → CURRENT ----
      val counts = Seq(
        "fmembers" -> writeTable(next, "fmembers",
          dMembers.withColumn("ver", lit(next)), nNewDocs),
        "fgroups" -> writeTable(next, "fgroups",
          dGroups.select("k", "rid").withColumn("ver", lit(next)),
          nNewReps),
        "fbands" -> writeTable(next, "fbands", newFBands, nFBands),
        "fpairs" -> writeTable(next, "fpairs", newPairRows, nNewPairs),
        "fstars" -> writeTable(next, "fstars", starEdges, nStarEdges),
        "fdropped" -> writeTable(next, "fdropped", newlyDropped,
          nDroppedBuckets),
        "flabels" -> writeTable(next, "flabels",
          labelDeltas.withColumn("ver", lit(next)), nLabelRows))
      flip(next, base, counts, pinned)
      // bounded maintenance on the member-store cadence: squash once
      // the reader's union spans the threshold (post-flip, so a crash
      // mid-compact costs nothing — the next fold retries it)
      val finalVersion =
        if (autoCompactEvery > 0 && next - base + 1 >= autoCompactEvery)
          compact()
        else next
      Some(FoldReport(finalVersion, pinned, nNewReps, nStarEdges,
        nNewPairs, nDroppedBuckets, nLabelRows))
    } finally cps.foreach(c => scala.util.Try(c.unpersist()))
  }

  /** Squash all fold versions into one snapshot (pruning dead buckets'
    * pair rows) and advance the read base — [[DedupState.compact]] for
    * the federation: bounds the reader's union width and the
    * label-delta accumulation for streaming-cadence folds. Members,
    * groups and the watermarks keep their meaning (arrival versions
    * survive; the squash is invisible to the fold contract). */
  def compact(): Long = {
    import DedupState.Tracked
    val (cur, base, wms) = pointer
    if (cur == 0) return 0L
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // lazy here — each table takes its ONE checkpoint inside its write
    // future below (a definition-site checkpoint would materialize the
    // largest frames twice)
    val livePairRows = fedPairs(cur)
      .join(dropped(cur), Seq("bkey"), "left_anti")
    val resolved = labels(cur).withColumn("ver", lit(next))
    val tables = Seq(
      ("fmembers", fedMembers(cur)), ("fgroups", fedGroups(cur)),
      ("fbands", fedBands(cur)), ("fpairs", livePairRows),
      ("fstars", stars(cur)), ("fdropped", dropped(cur)),
      ("flabels", resolved))
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
    flip(next, next, counts, wms)
    cps.foreach(_.unpersist())
    dropVersions(base, cur, next)
    next
  }
}

object FedContamState {

  /** Per-fold accounting — ∝ the member deltas. */
  final case class FoldReport(
      version: Long,
      memberVersions: Seq[Long],
      nNewKeys: Long,
      nNewPostings: Long,
      nNewlyCapped: Long)
}

/** The INCREMENTAL federated decontamination merge — [[ContamState
  * .federatedLivePostings]] as a versioned store folding member deltas,
  * the [[FedDedupState]] pattern applied to the (simpler) postings
  * shape: no pairing and no CC, just
  *
  *   - distinct-content postings: a content key contributes its
  *     postings ONCE federation-wide (first member to deliver it;
  *     gramsOf is a pure content function, so any member's rows are
  *     the same rows) — later members' copies of a known key fold to
  *     nothing;
  *   - the global df cap, counted over distinct content and MONOTONE:
  *     a gram's federation df only grows, so a capped verdict is
  *     permanent and the fold only ever checks the delta's touched
  *     grams (pruned probe of the accumulated postings index);
  *   - member capped verdicts union in (member df ≤ global df, so a
  *     member-capped gram is globally capped — and the verdict must
  *     survive member compaction, which prunes the member's postings).
  *
  * Reads serve the one-shot merge VERBATIM on any fold schedule:
  * live postings = accumulated postings minus capped grams, exactly
  * the member stores' read shape. */
final class FedContamState(
    sparkSession: SparkSession,
    rootUri: String,
    members: Seq[ContamState],
    autoCompactEvery: Int = 0)
  extends FedStoreBase(sparkSession, rootUri) {

  require(autoCompactEvery >= 0, "autoCompactEvery must be >= 0 (0 = off)")

  import ContamState.{TextsSchema, PostingsSchema, CappedSchema, gramBucket}
  import DedupState.{keyPrefix, Tracked}
  import FedContamState._

  /** The member handles this federation store folds. */
  def memberStores: Seq[ContamState] = members

  private val caps = members.map(_.cap).distinct
  require(members.nonEmpty, "federation needs at least one member")
  require(caps.size == 1,
    s"members disagree on the df cap ($caps) — the cap is an " +
      "evidence-set invariant, federated or not")
  private val dfCap = caps.head

  private def metaLine: String =
    s"dfCap=$dfCap,members=${members.map(st => memberId(st.root))
      .mkString(":")}"

  protected val partitionField: Map[String, (StructField, Column)] = Map(
    "ftexts" -> ((StructField("kp", StringType), keyPrefix(col("k")))),
    "fposts" -> ((StructField("gp", IntegerType), gramBucket(col("g")))))

  override protected def partitionFanout(name: String): Int =
    if (name == "fposts") ContamState.GramBuckets else 256

  /** Distinct content keys absorbed federation-wide — (k, ver). */
  def fedKeys(upTo: Long = currentVersion): DataFrame =
    tableFrame("ftexts", TextsSchema, upTo)

  private def fedKeysTouching(prefixes: Seq[String],
                              upTo: Long): DataFrame =
    diskFrame("ftexts", TextsSchema, upTo)
      .filter(col("kp").isin(prefixes: _*)).drop("kp")

  /** Accumulated distinct postings — (k, g), including rows of grams
    * that later capped ([[livePostings]] filters those, the member
    * stores' read shape). */
  def postings(upTo: Long = currentVersion): DataFrame =
    tableFrame("fposts", PostingsSchema, upTo)

  private def postingsTouching(buckets: Seq[Int], upTo: Long): DataFrame =
    diskFrame("fposts", PostingsSchema, upTo)
      .filter(col("gp").isin(buckets: _*)).drop("gp")

  /** Grams whose federation df crossed the cap — (g); monotone. */
  def capped(upTo: Long = currentVersion): DataFrame =
    tableFrame("fcapped", CappedSchema, upTo)

  /** The federation's LIVE contamination evidence — (k, g):
    * [[ContamState.federatedLivePostings]]'s result as a read. */
  def livePostings(upTo: Long = currentVersion): DataFrame =
    postings(upTo).join(capped(upTo), Seq("g"), "left_anti")

  /** Fold every member's unabsorbed versions — cost ∝ the deltas. */
  def fold(): Option[FoldReport] = {
    checkFedMeta(metaLine)
    writeMembersFile(members.map(_.root))
    val (cur, base, _) = pointer
    val wms = watermarks(members.size)
    val pinned = members.map(_.currentVersion)
    if (wms.zip(pinned).forall { case (w, v) => w >= v }) return None
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      val deltas = members.zip(wms).zip(pinned).collect {
        case ((st, wm), v) if v > wm => (st, wm, v)
      }
      val dTexts = deltas.map { case (st, wm, v) =>
          st.textsDelta(wm, v).select("k") }
        .reduce(_ unionByName _).distinct().cpInto(cps)
      // new-to-federation content: one pruned anti-join, like the
      // member stores' newness check
      val prefixes = partitionValues[String](dTexts, keyPrefix(col("k")))
      val newKeys = dTexts
        .join(fedKeysTouching(prefixes, cur).select("k"),
          Seq("k"), "left_anti")
        .cpInto(cps)
      val nNewKeys = newKeys.count()
      // postings of the new keys only (a known key's rows are already
      // absorbed — distinct-content semantics), distinct across the
      // members delivering the same new key this fold
      val dPosts = deltas.map { case (st, wm, v) =>
          st.postingsDelta(wm, v).select("k", "g") }
        .reduce(_ unionByName _)
        .join(newKeys, Seq("k"), "left_semi")
        .distinct()
        .cpInto(cps)
      val nNewPostings = dPosts.count()
      // df accounting over the delta's TOUCHED grams (pruned probe)
      val gBuckets = partitionValues[Int](dPosts, gramBucket(col("g")))
      val oldCounts = postingsTouching(gBuckets, cur)
        .join(dPosts.select("g").distinct(), Seq("g"), "left_semi")
        .groupBy("g").agg(count(lit(1)).as("oldN"))
      val prevCapped = capped(cur)
      val newlyOver = dPosts.groupBy("g").agg(count(lit(1)).as("newN"))
        .join(oldCounts, Seq("g"), "left_outer")
        .filter(col("newN") + coalesce(col("oldN"), lit(0L)) > dfCap)
        .select("g")
      // member verdicts union in: a member-capped gram is globally
      // capped (member df ≤ global df) even when the member compacted
      // its postings away
      val dCapped = deltas.map { case (st, wm, v) =>
          st.cappedDelta(wm, v).select("g") }
        .reduce(_ unionByName _)
      val newlyCapped = newlyOver.unionByName(dCapped).distinct()
        .join(prevCapped, Seq("g"), "left_anti")
        .cpInto(cps)
      val nNewlyCapped = newlyCapped.count()

      val counts = Seq(
        "ftexts" -> writeTable(next, "ftexts",
          newKeys.withColumn("ver", lit(next)), nNewKeys),
        "fposts" -> writeTable(next, "fposts", dPosts, nNewPostings),
        "fcapped" -> writeTable(next, "fcapped", newlyCapped,
          nNewlyCapped))
      flip(next, base, counts, pinned)
      val finalVersion =
        if (autoCompactEvery > 0 && next - base + 1 >= autoCompactEvery)
          compact()
        else next
      Some(FoldReport(finalVersion, pinned, nNewKeys, nNewPostings,
        nNewlyCapped))
    } finally cps.foreach(c => scala.util.Try(c.unpersist()))
  }

  /** Squash all fold versions into one snapshot and advance the read
    * base. Capped grams' postings prune (their verdicts persist in
    * fcapped, exactly the member stores' compact semantics — the df
    * accounting never needs a capped gram's rows again because capped
    * is monotone). */
  def compact(): Long = {
    import DedupState.Tracked
    val (cur, base, wms) = pointer
    if (cur == 0) return 0L
    val next = cur + 1
    val cps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val tables = Seq(
      ("ftexts", fedKeys(cur)), ("fposts", livePostings(cur)),
      ("fcapped", capped(cur)))
    val counts =
      try tables.map { case (name, df) =>
        val chk = df.cpInto(cps)
        name -> writeTable(next, name, chk, chk.count())
      } catch { case t: Throwable =>
        // release the checkpoints taken so far — a retrying daemon
        // must not accumulate orphaned blocks (the orphan v{next} dir
        // is invisible and overwritten on retry, as everywhere here)
        cps.foreach(c => scala.util.Try(c.unpersist()))
        throw t
      }
    flip(next, next, counts, wms)
    cps.foreach(_.unpersist())
    dropVersions(base, cur, next)
    next
  }
}
