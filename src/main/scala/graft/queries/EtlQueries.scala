package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Training-data pipeline operators over `documents` / `embeddings`:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), text
  * analysis (language-ID, quality, token counts, fingerprinting) and
  * embedding similarity (norms, brute-force cosine top-k, sign-LSH
  * bucketing). Every computation is engine-portable by construction —
  * md5/substr/replace string ops and exact scaled-integer arithmetic —
  * so each query hash-matches its DuckDB oracle bit-for-bit.
  *
  * Scale notes (100 TB): every operator here is a pure
  * shingle/explode → hash → groupBy/join pipeline with no driver-side
  * loops; candidate generation is always banded/bucketed (LSH) so the
  * pairwise stage never goes quadratic in the corpus.
  */
object EtlQueries {

  /** Number of MinHash permutations and LSH band width (4 bands × 4 rows). */
  private val NumHashes = 16
  private val RowsPerBand = 4
  /** Char-shingle geometry: 8-gram, stride 4, max scan fixed (docs ≤ 2 KB). */
  private val ShingleLen = 8
  private val ShingleStride = 4
  private val MaxPos = 2048
  /** Profile depth for the Cavnar-Trenkle language-ID query. */
  private val LangIdTopK = 40
  /** Contamination df cap: 8-grams present in more than this many
    * DISTINCT texts are dropped from the containment check on both
    * sides (and from the denominator) — the n-gram analog of stopword
    * removal. Common grams carry no contamination evidence, and the
    * cap bounds the gram join linearly in the probe corpus where the
    * uncapped join grows quadratically through hot grams. */
  private val ContamDfCap = 128
  /** Probe-side broadcast bound for the contamination check, in GRAM
    * POSTINGS (the thing actually broadcast): a real eval suite is
    * thousands of docs × ≤ MaxPos/2 rare grams ≈ low millions of
    * ~25-byte postings — comfortably broadcastable, and broadcasting
    * it spares the CORPUS postings a sort-merge shuffle (the 100 TB
    * win). Above the bound the join falls back to shuffle: measured at
    * the 100× replica (where the %97 probe slice degenerates to
    * corpus-distinct scale, ~5 M postings), forcing the broadcast cost
    * 16.4 → 26.9 s — the posting count, not a doc-count proxy, is the
    * quantity that decides. */
  private val ContamBroadcastMaxPostings = 2000000L
  /** Trigram positions per doc for language-ID — the signal saturates in
    * the first few hundred characters; unbounded explode would scale the
    * query with doc length for no accuracy gain. */
  private val LangIdMaxPos = 128
  /** Profile training samples 1-in-N docs (deterministic doc_id modulo,
    * DuckDB-reproducible): at corpus scale profiles are always trained
    * on a sample, never the full corpus. */
  private val LangIdTrainMod = 8
  /** Embedding fixed-point scale: values ~[-1,1]; 1e6 keeps 64-dim dot
    * products far inside Long range while making sums order-independent. */
  private val Scale = graft.functions.FixedPointDot.Scale
  /** Spherical k-means geometry for SemDeDup / IVF: cluster count,
    * the within-cluster near-duplicate threshold (the same cosine bar
    * the LSH dedup family uses), and the IVF probe fan-out. k is the
    * 100 TB knob: cluster size ≈ N/k bounds the within-cluster
    * pairwise stage, so k grows with the corpus (SemDeDup used 50k
    * clusters over LAION) while assignment stays one projection over
    * k plan-constant centroids. */
  private val KMeansK = 8
  /** SemDeDup prune bar. Must sit ABOVE the within-cluster background
    * correlation: k-means groups vectors by direction, so cluster
    * members correlate with the centroid and hence each other — at the
    * LSH dedup family's 0.2 bar the prune removes 87% of this corpus
    * (background, not duplication). 0.3 clears the baseline (measured
    * within-cluster max 0.47, median ≪ 0.2) and prunes the genuinely
    * redundant tail. */
  private val SemDedupTau = 0.3
  private val KmIvfProbes = 2
  private val KmIvfTopK = 10
  // recall report: every 97th vector probes the index, capped at a
  // FIXED query budget — the eval's brute-force ground truth costs
  // |queries| × corpus, so the probe set must not scale with the
  // corpus (uncapped, the 100× replica ran 500 ground-truth passes:
  // 112 s where the capped set holds the eval at a constant ~16).
  // Candidate recall of the exact top-RecallK at nprobe in {1, 2, 4}.
  private val RecallQueryMod = 97
  private val RecallQueryCap = 97L * 16
  private val RecallK = 10
  /** Karp-Rabin rolling-hash base and modulus. */
  private val RollB = 131L
  private val RollM = 1000000007L
  /** Retrieval / training-export knobs. BM25 uses the standard
    * k1 = 1.2, b = 0.75 written as exact literals inside ONE shared
    * formula shape so Spark and DuckDB evaluate the identical IEEE
    * double expression tree. The probe terms span the df spectrum
    * (one rare, two common) so the ranking exercises the idf weight. */
  private val Bm25Terms = Seq("dup", "vector", "query")
  private val Bm25TopK = 15
  /** Context-window chunking: 256-char windows advancing 192 chars
    * (64-char overlap) — the overlap-chunking shape a RAG/pretraining
    * text splitter uses. */
  private val ChunkLen = 256
  private val ChunkStride = 192
  /** Sequence packing: token budget per packed training sequence and
    * the deterministic shard fan-out the packing runs inside. */
  private val PackBudget = 512L
  private val PackShards = 16L
  /** Vocabulary coverage report depth (BPE vocab budget planning). */
  private val VocabTopK = 64
  /** BPE merge-candidate report depth (the first merge-table step of
    * tokenizer training) and the per-word pair-scan cap (pairs past
    * position 64 of a pathological unbroken token carry no merge
    * signal; the cap bounds the explode exactly like MaxPos does for
    * shingles). */
  private val BpeTopK = 32
  private val MaxWordLen = 64
  /** Length-distribution report: decile count per source. */
  private val LenNtiles = 10
  /** PII patterns kept to character classes only ([.] instead of \. )
    * so the SAME literal is a valid Java regex (Spark) and RE2 regex
    * (DuckDB) with no escape-layer divergence. Shared with the
    * streaming admission gate ([[graft.streaming.StreamingCurator]])
    * so stream and batch scrub identically by construction. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private[graft] val Ipv4Re = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
  /** Quality-rule constants (q_text_quality / q_curate_e2e / the
    * streaming gate): minimum token count, stopword patterns, and the
    * stops·mult ≤ tokens bound — ONE definition so the batch and
    * streaming verdicts cannot drift. */
  private[graft] val QualityMinTokens = 40
  private[graft] val QualityStopMult = 5
  private[graft] val QualityStops = Seq(" the ", " a ")

  /** 2-universal MinHash lane arithmetic: lane_i = (a·h1 + b·h2 + c) mod
    * LaneP with (h1, h2) two 32-bit words of ONE md5 per shingle.
    * Coefficients come from a fixed LCG so Spark and the DuckDB oracle
    * share them as literals. a, b < 2^20 keep every product < 2^52 —
    * exact int64 in both engines. */
  private val LaneP = 2147483647L
  private val laneCoef: IndexedSeq[(Long, Long, Long)] = {
    var x = 0x5DEECE66DL
    def next(bound: Long): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      java.lang.Math.floorMod(x >>> 17, bound)
    }
    (0 until NumHashes).map(_ =>
      (1 + next((1L << 20) - 1), 1 + next((1L << 20) - 1), next(LaneP)))
  }
  private def laneSqlExprs: String = laneCoef.zipWithIndex.map {
    case ((a, b, c), i) =>
      s"    MIN(($a * h1 + $b * h2 + $c) % $LaneP) AS l$i"
  }.mkString(",\n")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** Exact occurrence count of `pat` in a string column (replace-length
    * trick — no regex, identical semantics in any SQL engine). */
  private def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / pat.length).cast("long")
  private def occSql(e: String, pat: String): String =
    s"CAST((length($e) - length(replace($e, '$pat', ''))) / ${pat.length} AS BIGINT)"

  /** Whitespace token count: spaces + 1 (single-space-separated corpus). */
  private def tokenCount(c: Column): Column =
    (length(c) - length(replace(c, lit(" "), lit(""))) + 1).cast("long")
  private val tokenCountSql =
    "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"

  /** DuckDB CTE for the distinct character-shingle set (mirror of
    * [[shinglesOf]]). */
  private def shinglesSql(len: Int = ShingleLen, stride: Int = ShingleStride,
                          from: String = "documents"): String =
    s"""SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), $len) AS sh
       |  FROM $from, generate_series(1, $MaxPos, $stride) AS gp(p)
       |  WHERE p <= length(text) - ${len - 1}""".stripMargin

  /** Expand rep-level pair rows back to the full id-level pair set.
    * `members` maps rep id → member id (rid, id); `repPairs` carries
    * (a, b, carry…) over rep ids; `intraCarry` lists the reps whose
    * duplicate groups pair among THEMSELVES (always true of groups
    * that produce a signature — identical content shares every
    * bucket) plus the carry columns an intra pair gets. Cross and
    * intra sets are disjoint and duplicate-free by construction. */
  private def expandPairs(members: DataFrame, repPairs: DataFrame,
                          intraCarry: DataFrame): DataFrame = {
    // members is corpus-sized but narrow (two 8-byte ids/row) and is
    // consumed FOUR times below (both cross sides + both intra sides);
    // each consumer would otherwise re-run the scan → digest → distinct
    // group → join pipeline that produced it. Materialize once
    // (spillable), like the candidate waist of the callers.
    val m = members.localCheckpoint()
    val carry = repPairs.columns.toSeq.filterNot(Set("a", "b"))
    val cross = repPairs
      .join(m.select(col("rid").as("a"), col("id").as("xa")), "a")
      .join(m.select(col("rid").as("b"), col("id").as("xb")), "b")
      .select(least(col("xa"), col("xb")).as("a") +:
        greatest(col("xa"), col("xb")).as("b") +: carry.map(col): _*)
    val ea = m.join(intraCarry, Seq("rid"))
      .select(col("rid") +: col("id").as("a") +: carry.map(col): _*)
    val eb = m.join(intraCarry.select("rid"), Seq("rid"), "left_semi")
      .select(col("rid"), col("id").as("b"))
    val intra = ea.join(eb, "rid").filter(col("a") < col("b"))
      .select(("a" +: "b" +: carry).map(col): _*)
    cross.unionByName(intra)
  }

  /** 128-bit content digest used as THE distinct-content shuffle key:
    * the distinct-group and re-key joins move a 16-byte digest instead
    * of the full ~2 KB text as the join KEY (the text crosses the wire
    * once, as payload into the compute side only). Hash-identity on
    * md5 is the same contract the exact-dedup query already keys on. */
  private def textKey: Column = md5(col("text").cast("binary"))

  // Embeddings deliberately group/join on the RAW array: Spark hashes
  // and compares arrays natively inside codegen, while any digest of
  // the array must first render it (to_json is a codegen-fallback
  // Jackson call per row — measured 3.5× slower end-to-end at the 100×
  // replica than shuffling the 256-byte array itself). The digest
  // trade-off only wins for ~2 KB texts, where it replaces a key two
  // orders of magnitude wider.

  /** Run a pure-function-of-text computation ONCE per distinct text
    * and restore the per-doc shape: `compute` receives one
    * representative (doc_id, text) row per distinct text and returns
    * rows keyed by that doc_id; the result re-keys every original
    * doc_id by joining back on the text DIGEST. A duplicate-heavy
    * corpus (the crawled-corpus norm) pays the expensive transform
    * once per distinct value — the same split the lang-ID scoring
    * pass uses. Docs for which `compute` emits nothing (e.g. too
    * short to shingle) stay absent, exactly as in the direct form. */
  private def perDistinctText(s: SparkSession, dir: String)
      (compute: DataFrame => DataFrame): DataFrame = {
    // the distinct-group frame is the fixture-memoized one every dedup
    // consumer shares — rid is min(doc_id) per digest, exactly the
    // representative the direct groupBy produced
    val g = distinctGroups(s, dir)
    val byKey = compute(g.select(col("rid").as("doc_id"), col("text")))
      .join(g.select(col("rid").as("doc_id"), col("k")), "doc_id")
      .drop("doc_id")
    docs(s, dir).select(col("doc_id"), textKey.as("k"))
      .join(byKey, Seq("k"))
      .drop("k")
  }

  /** Fixture-memo accessor shared by the three dedup memos below:
    * evicts entries of STOPPED sessions first — a stopped session's
    * checkpointed frames are unusable, and without eviction the
    * object-lifetime map would pin every dead session and its plan
    * trees for the JVM's life — then computes-if-absent for the live
    * one. The maps stay a handful of entries (one per live session ×
    * fixture), so the sweep is a few pointer checks. */
  private def fixtureMemo[T](
      map: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), T],
      s: SparkSession, dir: String)(build: => T): T = {
    val it = map.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    map.computeIfAbsent((s, dir), _ => build)
  }

  /** Run two independent fixture-build steps CONCURRENTLY (two member
    * stores over disjoint roots, two independent updates): Spark
    * schedules jobs from both threads onto the same executor pool, so
    * the wall cost of a federation fixture is ~the slower member, not
    * the sum — exactly how a real two-member topology builds. Only for
    * steps with no ordering dependency. */
  private def inParallel[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(fa)
    val f2 = Future(fb)
    (Await.result(f1, scala.concurrent.duration.Duration.Inf),
      Await.result(f2, scala.concurrent.duration.Duration.Inf))
  }

  /** Session-lifetime temp root for a fixture's PERSISTED store (the
    * stores are durable by design; the fixture roots are not), removed
    * at JVM exit. */
  private def tempStateRoot(prefix: String): String = {
    val rootDir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(rootDir).iterator().asScala.toList
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Exception => () }))
    rootDir.toString
  }

  // ---- cross-invocation store reuse -----------------------------------
  // The persisted stores are versioned + fingerprinted BY DESIGN — a
  // production pipeline builds each index once per corpus and every
  // later session reads it. The fixture layer now does the same: a
  // store family's root lives under the scratch dir keyed by
  // (epoch, family, semantics, corpus-content digest), a FIXTURE_DONE
  // marker (written only after the FULL build sequence — folds, train,
  // adopt, federation fold — lands) gates reuse, and a second JVM
  // invocation on the same corpus reopens instead of rebuilding
  // (bench memo_build collapses to reads; the first build is still
  // honestly attributed in memo_parts). SPARK_GRAFT_STORE_REUSE=0
  // disables (every invocation pays the build, the pre-r15 behavior).

  /** Bump on ANY change to store-building semantics that the stores'
    * own META would not catch (banding/gram/derivation functions,
    * fixture batch composition) — the epoch is part of every durable
    * identity, so roots built by older code are never reused. */
  private val FixtureEpoch = "r16a" // r16a: embed admission id pinned

  private val corpusDigestMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]
  /** Content identity of the fixture corpus: a digest over the input
    * parquet files' (name, length, mtime) — regenerated testdata gets
    * a new digest and therefore fresh store roots. */
  private def corpusDigest(s: SparkSession, dir: String): String =
    fixtureMemo(corpusDigestMemo, s, dir) {
      val conf = s.sessionState.newHadoopConf()
      val md = java.security.MessageDigest.getInstance("MD5")
      Seq("documents.parquet", "embeddings.parquet").foreach { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) {
          val sts =
            if (fs.getFileStatus(p).isDirectory)
              fs.listStatus(p).sortBy(_.getPath.getName)
            else Array(fs.getFileStatus(p))
          sts.foreach(st => md.update(
            s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}\n"
              .getBytes("UTF-8")))
        }
      }
      md.digest().map("%02x".format(_)).mkString
    }

  private def storeScratch: String =
    sys.env.get("SPARK_GRAFT_SCRATCH").filter(_.nonEmpty)
      .getOrElse(System.getProperty("java.io.tmpdir"))

  private def reuseEnabled: Boolean =
    !sys.env.get("SPARK_GRAFT_STORE_REUSE").contains("0")

  /** Age bound for durable fixture roots: anything whose DONE marker
    * (or build lock) is this old belongs to a corpus/epoch no current
    * run uses — one sweep per build keeps the scratch bounded without
    * ever touching a sibling run's live roots (different corpora in
    * flight have different tags and FRESH markers). */
  private val StaleRootMillis = 24L * 3600 * 1000

  /** Roots THIS process holds open (reused or built), with their root
    * URI + identity: the sweep skips them unconditionally, and a
    * daemon refresher re-touches their DONE markers well inside the
    * age bound — so a session outliving [[StaleRootMillis]] (a
    * long-lived daemon holding readers over a reused root) never has
    * its roots aged out under it by a SIBLING run's sweep, whose only
    * liveness signal is the marker mtime. */
  private val liveRoots =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def registerLiveRoot(rootName: String, rootUri: String,
                               identity: String): Unit = {
    liveRoots.put(rootName, (rootUri, identity))
    rootRefresher
  }
  private lazy val rootRefresher: Thread = {
    val t = new Thread(() => {
      while (true) {
        Thread.sleep(StaleRootMillis / 4)
        liveRoots.forEach { (_, v) =>
          val (uri, identity) = v
          try new graft.storage.Store(uri,
              new org.apache.hadoop.conf.Configuration())
            .writeAtomic("FIXTURE_DONE", identity)
          catch { case _: Exception => () }
        }
      }
    }, "graft-fixture-root-refresher")
    t.setDaemon(true)
    t.start()
    t
  }

  /** A per-host random token persisted on the machine-LOCAL temp
    * filesystem: the distinguishing identity when hostname + MAC set
    * are ambiguous — two misconfigured machines can share a hostname,
    * and an unprivileged JVM (the common container shape) often cannot
    * read hardware addresses AT ALL, leaving the MAC set empty on both
    * sides of a shared scratch. Two hosts can never share the token
    * (it lives outside the shared scratch); JVMs on the SAME host
    * (same tmpdir) read the same token, which keeps dead-builder
    * reclamation working where it is sound. Creation races lose to
    * the first writer (move without REPLACE_EXISTING) and re-read it;
    * a token mismatch between same-host JVMs (distinct tmpdirs) only
    * means claims are presumed live — the safe direction. */
  private lazy val hostToken: String = scala.util.Try {
    // /dev/shm first: tmpfs is machine-local BY CONSTRUCTION, where
    // java.io.tmpdir can itself be pointed at shared storage (a common
    // CI shape: -Djava.io.tmpdir on the NFS workspace) — a shared token
    // would fabricate a same-host identity across machines and re-open
    // the delete-a-live-builder hole the token exists to close
    val dir = Seq(java.nio.file.Paths.get("/dev/shm"),
        java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp")))
      .find(d => java.nio.file.Files.isDirectory(d) &&
        java.nio.file.Files.isWritable(d)).get
    val p = dir.resolve("graft_host_token")
    if (!java.nio.file.Files.exists(p)) {
      val tmp = java.nio.file.Files.createTempFile(
        dir, "graft_host_token", ".tmp")
      java.nio.file.Files.write(tmp,
        java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
      // world-readable (createTempFile defaults to 0600): other users'
      // JVMs on this host must READ the same token or same-host
      // reclamation silently splits by user
      scala.util.Try(java.nio.file.Files.setPosixFilePermissions(tmp,
        java.nio.file.attribute.PosixFilePermissions.fromString("rw-r--r--")))
      try java.nio.file.Files.move(tmp, p)
      catch { case _: java.io.IOException =>
        java.nio.file.Files.deleteIfExists(tmp) }
    }
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
  }.getOrElse("")

  /** Host identity for the build-lock claim: pids are host-local, so
    * on a SHARED scratch (NFS/object store) liveness may only be
    * judged for claims from this host — a foreign host's claim is
    * presumed live. The hostname alone can COLLIDE (two misconfigured
    * machines both reporting "localhost" would pid-probe each other's
    * claims and re-open the delete-a-live-builder hole), so the name
    * is never a probe basis by itself: the id must carry a MAC set or
    * the per-host [[hostToken]] to count as distinguishing. With
    * neither, the sentinel makes [[claimantAlive]] presume every claim
    * live (never probe on a possibly-shared name). */
  private[queries] lazy val hostId: String = {
    val name = scala.util.Try(
      java.net.InetAddress.getLocalHost.getHostName).getOrElse("")
    val macs = scala.util.Try {
      import scala.jdk.CollectionConverters._
      java.net.NetworkInterface.getNetworkInterfaces.asScala
        .flatMap(i => Option(i.getHardwareAddress))
        .map(_.map("%02x".format(_)).mkString)
        .toSeq.sorted.mkString(",")
    }.getOrElse("")
    if (macs.isEmpty && hostToken.isEmpty) "unknown-host"
    else {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$name|$macs|$hostToken".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      s"$name-$digest"
    }
  }

  /** Is the writer of a BUILD_LOCK claim still alive? Probe-able ONLY
    * when the claim provably came from THIS host (same distinguishing
    * [[hostId]]): pids are host-local, so a foreign host's claim, a
    * sentinel identity two identity-less machines could share, and a
    * claim whose format we cannot attribute to a host at all (the
    * pre-host bare-pid format — old and new code can coexist on a
    * shared scratch, so "host-local by era" does not hold) are ALL
    * presumed live. Un-reclaimed dead claims age out through the
    * stale-root sweep; deleting a live builder's root cannot be
    * undone. */
  private[queries] def claimantAlive(p: String): Boolean =
    p.trim.split(":", 2) match {
      case Array(h, pid) if h == hostId && h != "unknown-host" =>
        scala.util.Try(ProcessHandle.of(pid.toLong).isPresent)
          .getOrElse(true)
      case _ => true
    }

  /** Build-once-reuse-forever wrapper for a fixture's persisted store
    * family: `open` constructs the handle(s) against the durable root
    * (sub-stores go under `<root>/...`), `build` runs the full fold/
    * train sequence — skipped entirely when a completed build of the
    * same identity already sits there. Falls back to a private temp
    * root when reuse is disabled or another LIVE process is mid-build
    * on the same root (never fight a concurrent builder; losing a
    * fixture rebuild is cheaper than corrupting a single-writer
    * store). */
  private def durableStore[T](s: SparkSession, dir: String, family: String,
                              semantics: String)(open: String => T)
                             (build: T => Unit): T = {
    def privately(): T = {
      val t = open(tempStateRoot(s"graft-$family-"))
      build(t)
      t
    }
    if (!reuseEnabled) return privately()
    val identity =
      s"$FixtureEpoch|$family|$semantics|${corpusDigest(s, dir)}"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(identity.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    val conf = new org.apache.hadoop.conf.Configuration()
    val scratch = storeScratch
    val rootName = s"graft_etl_store_${family}_$tag"
    val root = s"$scratch/$rootName"
    val store = new graft.storage.Store(root, conf)
    try {
      // stale-root sweep: old corpora / old epochs, age-gated so live
      // sibling runs (fresh markers) are never touched
      val scratchStore = new graft.storage.Store(scratch, conf)
      scratchStore.listNames("")
        .filter(n => n.startsWith("graft_etl_store_") && n != rootName &&
          !liveRoots.containsKey(n))
        .foreach { n =>
          val seen = Seq("FIXTURE_DONE", "BUILD_LOCK").flatMap(f =>
            scratchStore.modificationTime(s"$n/$f"))
          if (seen.nonEmpty &&
              seen.forall(m =>
                System.currentTimeMillis() - m > StaleRootMillis))
            try scratchStore.deleteRecursive(n)
            catch { case _: Exception => () }
        }
    } catch { case _: Exception => () }
    if (store.readString("FIXTURE_DONE").exists(_.trim == identity)) {
      // refresh the marker's mtime BEFORE opening: the age-gated sweep
      // reads mtimes, so a root reused daily must never look idle to a
      // sibling run while this one holds live readers over its files.
      // ATOMIC (tmp + rename): a truncate-then-write would open a
      // window where a concurrent run reads a partial marker, claims
      // the root, and rebuilds it out from under this run's readers
      try store.writeAtomic("FIXTURE_DONE", identity)
      catch { case _: Exception => () }
      registerLiveRoot(rootName, root, identity)
      return open(root) // completed build of this exact identity: reuse
    }
    // claim the root; a live concurrent builder wins and we build
    // privately — a dead one's leftovers are swept and reclaimed.
    // The claim carries the HOST: pids are host-local, so on a shared
    // scratch a claim from another host must be presumed live (a
    // foreign builder mid-build would otherwise be judged dead by a
    // pid probe here and have its root deleted out from under it).
    val claim = s"$hostId:${ProcessHandle.current().pid()}"
    val owned = store.writeExclusive("BUILD_LOCK", claim) || {
      val alive = store.readString("BUILD_LOCK").exists(claimantAlive)
      if (alive) false
      else {
        try store.deleteRecursive("") catch { case _: Exception => () }
        store.writeExclusive("BUILD_LOCK", claim)
      }
    }
    if (!owned) return privately()
    try {
      // a half-built root (crashed earlier run) restarts clean
      store.listNames("").filter(_ != "BUILD_LOCK")
        .foreach(n => try store.deleteRecursive(n)
          catch { case _: Exception => () })
      val t = open(root)
      build(t)
      store.writeAtomic("FIXTURE_DONE", identity)
      registerLiveRoot(rootName, root, identity)
      t
    } finally store.delete("BUILD_LOCK")
  }

  /** Shared builder for the PURE-APPEND content stores (trigrams,
    * words, winnow selections, span hashes): one
    * [[graft.etl.DerivedState]] per family, fed the MEMOIZED
    * distinct-content frame in two rid-striped batches — re-scanning
    * raw docs would re-digest and re-dedupe per store build, and the
    * batch split keeps the incremental fold path exercised on every
    * fixture (full schedule invariance is DerivedStateSpec's job; the
    * fixture pays for two folds, not a spec's worth). `derive` sees
    * (rid, k, text) rows keyed by `k`. */
  private def contentStore(
      memo: java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
        graft.etl.DerivedState],
      s: SparkSession, dir: String, family: String, fingerprint: String,
      derive: (DataFrame, DataFrame) => DataFrame): graft.etl.DerivedState =
    fixtureMemo(memo, s, dir) {
      durableStore(s, dir, family, fingerprint)(root =>
        new graft.etl.DerivedState(s, root, fingerprint, "k", derive)) { st =>
        val d = distinctGroups(s, dir).select("rid", "k", "text")
        (0 to 1).foreach(i => st.update(d.filter(col("rid") % 2 === i)))
      }
    }

  /** Distinct-text groups of the fixture corpus — (k, rid, nm, text)
    * with rid = min doc_id, nm = multiplicity — memoized per
    * (session, fixture) and materialized once: EVERY dedup consumer
    * (exact counts aside) starts from this frame, and re-deriving the
    * corpus scan + digest groupBy per consumer was the single biggest
    * repeated cost of the dedup family. Bounded by distinct content;
    * spillable. The fixture tables are immutable for a run, so no
    * invalidation. */
  private val distinctGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def distinctGroups(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(distinctGroupMemo, s, dir) {
      docs(s, dir).select(col("doc_id"), textKey.as("k"), col("text"))
        .groupBy("k")
        .agg(min("doc_id").as("rid"), count(lit(1)).as("nm"),
          min("text").as("text"))
        .localCheckpoint()
    }

  /** rep id → member doc_id map over the distinct groups (NOT
    * memoized: two narrow joins over the memoized frames — cheap, and
    * corpus-sized rows are better re-streamed than pinned). */
  private def groupMembers(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), textKey.as("k"))
      .join(distinctGroups(s, dir).select("rid", "k"), "k")
      .select(col("rid"), col("doc_id").as("id"))

  /** The banded MinHash candidate graph over the distinct-text reps —
    * (a, b) pairs of rep ids — memoized per (session, fixture) like
    * the cluster assignment: the pair listing, the rep forms, the
    * clustering, the keep-selection and the corpus Jaccard all read
    * the SAME candidate graph, and a real pipeline materializes it
    * exactly once (the shingle → md5 → lane → band pipeline behind it
    * is the most expensive scan of the whole dedup family — paying it
    * per consumer is pure waste at any scale). Output-bounded
    * (candidate pairs), so the pinned frame is tiny. */
  private val bandPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def corpusBandPairs(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(bandPairsMemo, s, dir) {
      bandPairsFromSignatures(repSignatures(s, dir))
        .localCheckpoint()
    }

  /** The PERSISTED 16-lane MinHash signature store: (k, l0..l15) per
    * distinct content — the most expensive pure-per-content scan of
    * the dedup family (shingle explode + per-shingle md5), priced once
    * per content key EVER like every other derived family; the
    * candidate graph, the banding lookups and the LSH accuracy report
    * all read the stored lanes. Rep ids are corpus facts and attach at
    * read time from [[distinctGroups]]. */
  private val sigStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def sigState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    contentStore(sigStateMemo, s, dir, "signatures",
      s"minhash:lanes=$NumHashes:lcg", (rows, _) =>
        minhashSignatures(rows.select(col("k").as("doc_id"), col("text")))
          .withColumnRenamed("doc_id", "k"))

  /** The raw signature matrix over the distinct-text reps — a READ of
    * the signature store, memoized per session for its many consumers. */
  private val sigMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def repSignatures(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(sigMemo, s, dir) {
      val lanes = (0 until NumHashes).map(i => col(s"l$i"))
      sigState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        .select(col("rid").as("doc_id") +: lanes: _*)
        .localCheckpoint()
    }

  /** Per-distinct-text language prediction — (k, pred) — Cavnar-
    * Trenkle profiles trained on the deterministic doc_id-mod sample
    * and every distinct text scored once, memoized per fixture: a
    * pipeline labels its corpus's languages once and every consumer
    * (stratified sampling, mixing, the confusion report) reads the
    * labels. Tiny (digest + code per distinct text). */
  private val langPredMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The PERSISTED incremental language-prediction store
    * ([[graft.etl.DerivedState]]): profiles TRAIN once per corpus on
    * the deterministic doc_id-mod sample (the artifact generation);
    * every distinct text classifies ONCE against the frozen profiles
    * — a pure per-key function, so the fixture's two doc_id-striped
    * batches land on exactly the one-shot prediction set (the
    * DerivedStateSpec schedule-invariance contract) and a daily crawl
    * classifies its new content at batch cost. */
  private val langStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def langPredState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(langStateMemo, s, dir) {
      val trainer: DataFrame => DataFrame = corpus => {
        val sample = corpus.filter(col("doc_id") % LangIdTrainMod === 0)
          .groupBy("k", "lang")
          .agg(count(lit(1)).as("w"), min("text").as("text"))
        graft.etl.LangId.profilesWeighted(
          graft.etl.LangId.trigrams(sample, "text", LangIdMaxPos)
            .select("lang", "g", "w"),
          LangIdTopK)
      }
      // classification keys by the content digest directly (classify
      // is id-agnostic); texts matching no profile gram get no row,
      // exactly as in the one-shot form (callers COALESCE)
      val derive: (DataFrame, DataFrame) => DataFrame = (rows, prof) =>
        graft.etl.LangId.classify(
            graft.etl.LangId.trigrams(
              rows.select(col("k").as("doc_id"), col("text")),
              "text", LangIdMaxPos),
            prof, LangIdTopK)
          .select(col("doc_id").as("k"), col("pred"))
      val fp =
        s"langpred:topk=$LangIdTopK:mod=$LangIdTrainMod:maxpos=$LangIdMaxPos"
      durableStore(s, dir, "langpred", fp)(root =>
        new graft.etl.DerivedState(s, root, fp, "k", derive,
          Some(trainer))) { st =>
        val d = docs(s, dir).filter(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"), textKey.as("k"), col("text"))
        st.train(d)
        (0 to 1).foreach(i => st.update(d.filter(col("doc_id") % 2 === i)))
      }
    }
  private def langPredictions(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(langPredMemo, s, dir) {
      langPredState(s, dir).derived().localCheckpoint()
    }

  // --- character-trigram LM quality score (CCNet-shaped) --------------

  /** Fixed-point scale of the LM conditional ratio: r(g3) =
    * ⌊2^20 · c3(g3) / c2(prefix)⌋ — exact integer arithmetic end to
    * end (no libm), so the per-doc SUM is an order-independent integer
    * and the DuckDB oracle reproduces the engine's model bit-for-bit. */
  private val LmScale = 1L << 20
  /** Per-doc scored-position bound: LM filtering reads a prefix; the
    * bound keeps per-doc explode work O(1) at any document length. */
  private val LmMaxPos = 512

  /** The LM position walk over (k, text): the trigram at p and its
    * bigram prefix, positions 1..min(len−2, LmMaxPos), stride 1 (the
    * conditional CHAIN, unlike the strided contamination grams) —
    * shared by the model trainer, the derived scorer and (in SQL
    * shape) the q_lm_score oracle, so the three can never drift. */
  private def lmPositions(texts: DataFrame): DataFrame =
    texts.filter(length(col("text")) >= 3)
      .select(col("k"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - 2, lit(LmMaxPos)), lit(1))).as("p"))
      .select(col("k"),
        expr("substring(text, p, 3)").as("g3"),
        expr("substring(text, p, 2)").as("g2"))

  private val lmStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private val lmScoreMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  /** LM model + per-content scores as a DERIVED-CONTENT store (the
    * CCNet shape: score every document under a corpus LM, filter the
    * tail): the trigram conditional table TRAINS once per corpus —
    * counts weighted by content multiplicity, so the model sees
    * duplication without re-scanning the copies — and every distinct
    * text scores ONCE against the frozen model, a pure per-key
    * function: batch schedule cannot change a score, and a daily crawl
    * scores its new content at batch cost. The model is BROADCASTABLE
    * BY CONSTRUCTION at any corpus size: distinct char-trigram rows
    * are bounded by alphabet³, not by corpus bytes. */
  /** The lm3 family's trainer: the trigram conditional table, counts
    * weighted by content multiplicity. Shared by the fixture store and
    * DerivedStateBench so the bench measures the SHIPPED semantics. */
  private[graft] val lmTrainer: DataFrame => DataFrame = corpus => {
    val w = corpus.groupBy("k")
      .agg(count(lit(1)).as("w"), min("text").as("text"))
    val pos = lmPositions(w.select(col("k"), col("text")))
      .join(w.select("k", "w"), "k")
    val c3 = pos.groupBy("g3").agg(sum("w").as("c3"))
    val c2 = pos.groupBy("g2").agg(sum("w").as("c2"))
    c3.select(col("g3"), expr("substring(g3, 1, 2)").as("g2"),
        col("c3"))
      .join(c2, "g2")
      .select(col("g3"), expr(s"(c3 * ${LmScale}L) div c2").as("r"))
  }

  /** The lm3 family's per-key scorer against the frozen model. */
  private[graft] val lmDerive: (DataFrame, DataFrame) => DataFrame =
    (rows, model) =>
      lmPositions(rows.select(col("k"), col("text")))
        .groupBy("k", "g3").agg(count(lit(1)).as("m"))
        .join(broadcast(model), Seq("g3"), "left_outer")
        .groupBy("k")
        .agg(sum(col("m")).as("n_pos"),
          sum(coalesce(col("r"), lit(0L)) * col("m")).as("lm_fp"))

  private def lmScoreState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(lmStateMemo, s, dir) {
      val fp = s"lm3:maxpos=$LmMaxPos:scale=$LmScale"
      durableStore(s, dir, "lm3", fp)(root =>
        new graft.etl.DerivedState(s, root, fp, "k", lmDerive,
          Some(lmTrainer))) { st =>
        val d = docs(s, dir).filter(length(col("text")) >= 3)
          .select(col("doc_id"), textKey.as("k"), col("text"))
        st.train(d)
        (0 to 1).foreach(i => st.update(d.filter(col("doc_id") % 2 === i)))
      }
    }
  private def lmScores(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(lmScoreMemo, s, dir) {
      lmScoreState(s, dir).derived().localCheckpoint()
    }

  /** Rare-8-gram postings per distinct text — (k, g), document-
    * frequency-capped — the decontamination index a pipeline builds
    * ONCE per corpus and probes with every eval suite; memoized per
    * fixture like the other dedup frames. One gram explode per
    * distinct text, shared by both sides of the containment join, with
    * the DF CAP applied before any pairwise work: a gram present in >
    * ContamDfCap distinct texts carries no contamination evidence but
    * dominates the join (Σ_g df_c·df_p is quadratic in text count
    * through common grams); capping df bounds the join at cap × probe
    * postings — linear in the probe corpus. Probes whose every gram is
    * common drop out (no rare-gram denominator), as they should. */
  private val contamPostingsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The decontamination gram extraction over (k, text) rows: distinct
    * (k, g) with g the strided 8-grams of the first MaxPos positions —
    * shared verbatim by the memoized index, its DuckDB oracle shape,
    * and the INCREMENTAL store ([[graft.etl.ContamState]]), so the
    * three can never drift. */
  private[graft] def contamGrams(texts: DataFrame): DataFrame =
    texts.filter(length(col("text")) >= 8)
      .select(col("k"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - 7, lit(MaxPos)), lit(2))).as("p"))
      .select(col("k"), expr("substring(text, p, 8)").as("g"))
      .distinct()

  /** The PERSISTED incremental decontamination index for the fixture
    * ([[graft.etl.ContamState]]), built in two doc_id-striped batches
    * — any split lands on the same live postings (split-invariance is
    * the store's contract), and at 100 TB a crawl batch appends its
    * postings at batch cost instead of re-shingling the corpus. */
  private val contamStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.ContamState]
  private def incrContamState(s: SparkSession, dir: String)
      : graft.etl.ContamState =
    fixtureMemo(contamStateMemo, s, dir) {
      durableStore(s, dir, "contam", s"contam:g8:cap=$ContamDfCap")(root =>
        new graft.etl.ContamState(s, root, contamGrams, ContamDfCap)) { st =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        (0 to 1).foreach(i => st.update(d.filter(col("doc_id") % 2 === i)))
      }
    }

  /** The shared in-session frame is now a READ of the persisted
    * incremental index — one build serves the contamination probe, the
    * source-overlap matrix, and the cross-session storage story. The
    * (k, g) set is identical to the old one-shot derivation: the store
    * uses the same [[contamGrams]] extraction and its retroactive df
    * cap equals a one-shot capped build on any batch schedule
    * (ContamStateSpec). */
  private def contamPostings(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(contamPostingsMemo, s, dir) {
      incrContamState(s, dir).livePostings().localCheckpoint()
    }

  /** Word-trigram counts per distinct text — (rid, gram, c) — the
    * n-gram table the diversity report (and any future LM-style
    * statistic) reads; pure per-corpus, so memoized and materialized
    * once like the other distinct-content frames. Corpus-token-sized
    * but narrow (one row per distinct trigram per distinct text). */
  private val triGramMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The PERSISTED trigram store: rows key by the content digest (a
    * pure per-content derivation — rep ids and multiplicities are
    * CORPUS facts that shift as duplicates arrive, so they attach at
    * read time from [[distinctGroups]], never in the store). A daily
    * crawl appends its new content's trigrams at batch cost. */
  private val triStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def triGramState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    contentStore(triStateMemo, s, dir, "trigrams",
      "trigrams:ws-split:n=3", (rows, _) =>
        rows
          .select(col("k"),
            expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .select(col("k"), size(col("w")).as("n"), col("w"))
          .filter(col("n") >= 3)
          .select(col("k"), explode(expr(
            "transform(sequence(0, n - 3), i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))"))
            .as("gram"))
          .groupBy("k", "gram").agg(count(lit(1)).as("c")))
  private def repTriGrams(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(triGramMemo, s, dir) {
      triGramState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        .select("rid", "gram", "c")
        .localCheckpoint()
    }

  /** Winnowing fingerprint-index df cap and the shared-fingerprint
    * report bar: a fingerprint hash present in more distinct texts
    * than the cap is boilerplate (dominates the match join, carries no
    * pair evidence — the ContamDfCap argument; this synthetic corpus
    * recombines a small phrase pool, so its fingerprint df tail is far
    * heavier than real prose and the cap sits low). Measured at
    * sf0.01: cap 10 bounds the index to 6.4k rows and the join to 10k
    * grouped pairs; bar 5 reports the top ~0.2%. */
  private[graft] val WinnowDfCap = 10
  private val WinnowMinShared = 5

  /** DuckDB CTE chain for the winnowing selection (grams → windowed
    * rightmost-min keys → distinct `sel(doc_id, sel)`), mirror of
    * [[winnowKeysOf]]. Callers may retarget the source table by
    * replacing `FROM documents`. */
  private val winnowSelSql: String =
    s"""grams AS (
       |  SELECT doc_id, g.p AS p,
       |    CAST('0x' || substr(md5(substr(text, CAST(g.p AS INTEGER), 8)), 1, 8)
       |      AS BIGINT) AS h
       |  FROM documents, generate_series(1, $MaxPos) AS g(p)
       |  WHERE g.p <= LEAST(length(text) - 7, $MaxPos)),
       |wins AS (
       |  SELECT doc_id, p,
       |    MIN(h * 4096 + (4096 - p)) OVER (
       |      PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
       |  FROM grams),
       |sel AS (SELECT DISTINCT doc_id, sel FROM wins WHERE p >= 8)""".stripMargin

  /** The winnowing selection over (doc_id, text) rows: distinct
    * (doc_id, sel) keys, sel = h·4096 + (4096 − p) — the rightmost-min
    * tie rule encoded in the key so one windowed MIN does the whole
    * selection. Shared by the per-doc sketch report and the match
    * step. */
  private def winnowKeysOf(reps: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    reps
      // < 8 grams (len < 15) can fill no window — absent, as in the
      // oracle's p >= 8 guard
      .filter(length(col("text")) >= 15)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - 7, lit(MaxPos)))).as("p"))
      .select(col("doc_id"), col("p"),
        conv(substring(md5(expr("substring(text, p, 8)").cast("binary")),
          1, 8), 16, 10).cast("long").as("h"))
      .withColumn("sel", min(col("h") * 4096L + (lit(4096L) - col("p")))
        .over(W.partitionBy("doc_id").orderBy("p").rowsBetween(-7, 0)))
      .filter(col("p") >= 8)
      .select("doc_id", "sel").distinct()
  }

  /** The PERSISTED winnowing-selection store: (k, sel) per distinct
    * text — a pure per-content derivation (the windowed-MIN sketch),
    * so it appends at batch cost like the word/trigram stores. The
    * fingerprint df cap stays READ-side (it is a corpus fact over the
    * index, index-sized to recompute), but the expensive part — the
    * per-position hash scan + windowed MIN over every distinct text —
    * is priced once per content key, ever. */
  private val winnowStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def winnowState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    contentStore(winnowStateMemo, s, dir, "winnow",
      s"winnow:w8:k8:maxpos=$MaxPos", (rows, _) =>
        winnowKeysOf(rows.select(col("k").as("doc_id"), col("text")))
          .select(col("doc_id").as("k"), col("sel")))
  /** Winnow FINGERPRINT bands over (doc_id, text) — bkey = sel div
    * 4096 (the hash without the position tie-break), one band row per
    * distinct fingerprint per doc: pure per-content, so the winnow
    * match step can live in a [[graft.etl.DedupState]] with the df cap
    * as the store's bucket cap. The FROM-TEXT definition — specs pin
    * [[winnowStoreBandsOf]] against it. */
  private[graft] def winnowBandsOf(src: DataFrame): DataFrame =
    winnowKeysOf(src)
      .select(col("doc_id"),
        expr("sel div 4096").cast("string").as("bkey"))
      .distinct()

  /** [[winnowBandsOf]] served from the PERSISTED winnow selection
    * store instead of re-winnowing the batch's text: the selections
    * are a pure per-content derivation the [[winnowState]] fold
    * already paid (per-position hash scan + windowed MIN), so the
    * match store's banding is a content-key LOOKUP — the
    * [[fixtureBandsOf]] move, at fold-orchestration level. Docs
    * shorter than the window (no selections in the store) band to
    * nothing, exactly as the from-text path's length guard. Total for
    * any batch whose content the selection store has absorbed — true
    * here by fixture construction and in production by folding the
    * selection store first (the orchestration ORDER contract);
    * FactoredEquivalenceSpec pins store-fed == from-text. */
  private[queries] def winnowStoreBandsOf(s: SparkSession, dir: String)
      : DataFrame => DataFrame = src =>
    src.select(col("doc_id"), textKey.as("k"))
      .join(winnowState(s, dir).derived(), "k")
      .select(col("doc_id"),
        expr("sel div 4096").cast("string").as("bkey"))
      .distinct()

  /** The PERSISTED winnow-match store: the fingerprint df cap
    * (WinnowDfCap) is the bucket cap, so boilerplate fingerprints
    * drop — retroactively, as the corpus grows — and the pair index's
    * live provenance rows ARE the match counts
    * ([[graft.etl.DedupState.livePairCounts]]): n_shared folds at
    * batch cost and un-counts when a fingerprint crosses the cap.
    * Third banding family on the one store (MinHash text bands,
    * hyperplane embedding bands, winnow fingerprints); banding is fed
    * from the winnow SELECTION store ([[winnowStoreBandsOf]]), so the
    * winnowing scan is priced once across both stores. */
  private val winnowPairStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DedupState]
  private def winnowPairState(s: SparkSession, dir: String)
      : graft.etl.DedupState =
    fixtureMemo(winnowPairStateMemo, s, dir) {
      durableStore(s, dir, "winnow_pairs",
        s"winnow:w8:k8:cap=$WinnowDfCap")(root =>
        new graft.etl.DedupState(s, root,
          bandsOf = winnowStoreBandsOf(s, dir),
          maxBucket = Some(WinnowDfCap.toLong))) { st =>
        st.update(docs(s, dir).select(col("doc_id"), col("text")))
      }
    }

  /** The FEDERATED winnow-match store: two member match stores
    * (doc_id-parity split — identical content lands reps in BOTH
    * members, exercising the canonical-rid collapse) folded into one
    * [[graft.etl.FedDedupState]], third banding family on the one
    * federation mechanism (MinHash text bands, hyperplane embedding
    * bands, winnow fingerprints). The read is
    * [[graft.etl.FedDedupState.livePairCounts]]: distinct (canonical
    * pair, fingerprint) provenance — exactly the single match store's
    * n_shared, which is what `q_winnow_fed` serving the q_winnow_pairs
    * oracle VERBATIM proves (FedStateSpec pins staged folds ==
    * one-shot on the winnow family). Banding is fed from the shared
    * winnow SELECTION store, so the per-position hash scan is still
    * priced once per distinct text across all three stores. */
  private val winnowFedStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.FedDedupState]
  private def winnowFedState(s: SparkSession, dir: String)
      : graft.etl.FedDedupState =
    fixtureMemo(winnowFedStateMemo, s, dir) {
      durableStore(s, dir, "fed_winnow",
        s"winnow:w8:k8:cap=$WinnowDfCap:parity") { root =>
        def member(sub: String) = new graft.etl.DedupState(s, s"$root/$sub",
          bandsOf = winnowStoreBandsOf(s, dir),
          maxBucket = Some(WinnowDfCap.toLong))
        new graft.etl.FedDedupState(s, s"$root/merge",
          Seq(member("a"), member("b")))
      } { fed =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(d.filter(col("doc_id") % 2 === 0)),
          b.update(d.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
    }

  /** The winnow selections re-keyed to rep ids — (doc_id = rid, sel) —
    * shared by the sketch report and the match step. */
  private val winnowSelMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def winnowSelSet(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(winnowSelMemo, s, dir) {
      winnowState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        .select(col("rid").as("doc_id"), col("sel"))
        .localCheckpoint()
    }

  /** The PERSISTED 32-token span-hash store: (k, h, c) per distinct
    * text, h = md5 of each 32-token window (capped at 512 positions),
    * c = occurrences within the text — pure per-content, so it appends
    * at batch cost like the winnow store; corpus facts (rid, nm)
    * attach at read time. */
  private val spanStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def spanState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    contentStore(spanStateMemo, s, dir, "spans",
      "spans:w32:cap512", (rows, _) =>
        rows
          .select(col("k"),
            expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .filter(size(col("w")) >= 32)
          .select(col("k"), col("w"),
            explode(sequence(lit(1),
              least(size(col("w")) - 31, lit(512)))).as("i"))
          .select(col("k"),
            md5(concat_ws(" ", expr("slice(w, i, 32)")).cast("binary"))
              .as("h"))
          .groupBy("k", "h").agg(count(lit(1)).as("c")))

  // The round-13 per-corpus 4-gram DerivedState is gone: its one
  // consumer (q_ngram_jaccard_lsh) re-joined and re-intersected the
  // stored gram sets per invocation — a measured 2× regression. The
  // gram family now lives INSIDE the dedup store as pair-emission-time
  // attributes ([[graft.etl.DedupState]] `gramsOf`): the Jaccard is
  // priced once per PAIR ever, and the report is a read.

  /** Per-distinct-text word counts — (rid, nm, word, c) — the unigram
    * table every token-level consumer (tf-idf, vocab coverage, BPE
    * merge counting, unigram rarity) previously re-derived with its
    * own corpus-wide explode; pure per-corpus, so memoized and
    * materialized once like the trigram frame. Corpus-token-sized but
    * narrow; nm rides along so corpus totals (Σ nm·c) need no join
    * back to the group frame. */
  private val wordMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The PERSISTED unigram store — the [[triGramState]] argument
    * verbatim: (k, word, c) is pure per-content; rid and nm attach at
    * read time from [[distinctGroups]]. */
  private val wordStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def wordState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    contentStore(wordStateMemo, s, dir, "words",
      "words:ws-split", (rows, _) =>
        rows
          .select(col("k"),
            explode(expr("filter(split(text, ' '), x -> length(x) > 0)"))
              .as("word"))
          .groupBy("k", "word").agg(count(lit(1)).as("c")))
  private def repWordCounts(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(wordMemo, s, dir) {
      wordState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid", "nm"), "k")
        .select("rid", "nm", "word", "c")
        .localCheckpoint()
    }

  /** FEDERATED dedup clusters of the fixture corpus: two member
    * [[graft.etl.DedupState]]s split by doc_id parity (so identical
    * content lands reps in BOTH members — the star-edge collapse is
    * exercised), folded into a PERSISTED incremental federation store
    * ([[graft.etl.FedDedupState]]) and served as a read of its
    * converged labels — the production shape, where a JDBC view
    * refresh reads the fold instead of re-running the ∝-corpus merge.
    * Must equal the one-shot full-corpus clustering, which is exactly
    * what the q_dedup_fed oracle checks (FedStateSpec pins the
    * store == one-shot-merge equivalence on staged schedules). */
  private val fedClustersMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def fedDocClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedClustersMemo, s, dir) {
      val fed = durableStore(s, dir, "fed_dedup", "minhash16x4:parity") {
        root =>
          val bandsOf = fixtureBandsOf(s, dir)
          val a = new graft.etl.DedupState(s, s"$root/a", bandsOf)
          val b = new graft.etl.DedupState(s, s"$root/b", bandsOf)
          new graft.etl.FedDedupState(s, s"$root/merge", Seq(a, b))
      } { fed =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(d.filter(col("doc_id") % 2 === 0)),
          b.update(d.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
      fed.docClusters().localCheckpoint()
    }

  /** Plan-guardrail probe ([[graft.queries.PlanSpec]]): the banding
    * pipeline over an arbitrary (doc_id, text) frame, BYPASSING the
    * fixture memo — the memoized frames are materialized RDD scans, so
    * asserting plan shape on the consumers alone would assert nothing
    * about the pipeline that builds them. */
  private[queries] def bandPairsPipeline(src: DataFrame): DataFrame =
    minhashBandPairs(src)

  /** Same probe for the embedding-cosine candidate pipeline (memo
    * bypass; see [[bandPairsPipeline]]). */
  private[queries] def embCosPipeline(base: DataFrame): DataFrame =
    cosinePairs(base, threshold = 0.2)

  /** The 16-lane/4-band MinHash candidate pairs over `src`
    * (doc_id, text) — ONE implementation shared by the pair and
    * representative forms (and mirrored term-for-term by
    * [[minhashPairsSql]]); a tuning change must touch exactly one
    * Spark pipeline and one SQL builder. */
  private def minhashBandPairs(src: DataFrame): DataFrame =
    bandPairsFromSignatures(minhashSignatures(src))

  /** The per-doc 16-lane MinHash signature matrix over `src`
    * (doc_id, text) — the shingle explode + per-shingle md5 behind it
    * is the most expensive scan of the dedup family, so the result is
    * materialized (17 longs per distinct doc) for its consumers: the
    * band self-join reads it twice, and the LSH accuracy report reads
    * the raw lanes again. */
  private def minhashSignatures(src: DataFrame): DataFrame = {
    val sh0 = shinglesOf(src, distinctShingles = false)
    val hs = sh0.select(col("doc_id"), md5(col("sh").cast("binary")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
    val aggs = laneCoef.zipWithIndex.map { case ((a, b, c), i) =>
      min((col("h1") * a + col("h2") * b + c) % LaneP).as(s"l$i")
    }
    hs.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()
  }

  /** Band → bucket self-join over a signature matrix. */
  private def bandPairsFromSignatures(mh: DataFrame): DataFrame = {
    val bandCols = (0 until NumHashes / RowsPerBand).map { g =>
      struct(lit(g).as("band"),
        col(s"l${4 * g}").as("k0"), col(s"l${4 * g + 1}").as("k1"),
        col(s"l${4 * g + 2}").as("k2"), col(s"l${4 * g + 3}").as("k3"))
    }
    val keys = Seq("band", "k0", "k1", "k2", "k3")
    val bands = mh.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id") +: keys.map(k => col(s"bs.$k").as(k)): _*)
    val a = bands.withColumnRenamed("doc_id", "a")
    val b = bands.withColumnRenamed("doc_id", "b")
    a.join(b, keys).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** The per-doc LSH band BUCKET keys of `src` (doc_id, text) — one
    * row per (doc, band) with `bkey` = md5 of the band's four lanes.
    * Co-membership in a bkey bucket is EXACTLY co-membership in a
    * (band, k0..k3) bucket of [[bandPairsFromSignatures]] (md5 makes
    * key collisions negligible at any corpus size), so a pairing built
    * from these buckets reproduces the global candidate graph. This is
    * the banding function [[graft.etl.DedupState]] persists: the
    * incremental store must speak the same signature scheme as the
    * one-shot pipeline or its components would diverge from the
    * oracle's. */
  private[graft] def bandKeys(src: DataFrame): DataFrame =
    bkeysFromSignatures(minhashSignatures(src))

  /** The band-key digest step of [[bandKeys]], separable so fixtures
    * that already hold the signature matrix ([[repSignatures]]) can
    * band without re-shingling. */
  private def bkeysFromSignatures(mh: DataFrame): DataFrame = {
    val bandCols = (0 until NumHashes / RowsPerBand).map { g =>
      md5(concat_ws(":", lit(g), col(s"l${4 * g}"), col(s"l${4 * g + 1}"),
        col(s"l${4 * g + 2}"), col(s"l${4 * g + 3}")).cast("binary"))
    }
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
  }

  /** The corpus band keys re-keyed by content digest — (k, bkey) —
    * derived from the MEMOIZED signature matrix (zero extra shingle
    * scans) and shared by every fixture [[graft.etl.DedupState]] via
    * [[fixtureBandsOf]]: the single-store and both federation-member
    * builds band the SAME corpus content, and a real deployment
    * likewise computes a content's signature once, whatever store it
    * lands in. The banding FUNCTION is unchanged ([[bandKeys]] term for
    * term), so the stores' bucket semantics are identical — specs keep
    * exercising the from-text path ([[bandKeys]] itself). */
  private val bandKeyMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def repBandKeys(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(bandKeyMemo, s, dir) {
      bkeysFromSignatures(repSignatures(s, dir))
        .join(distinctGroups(s, dir).select(col("rid").as("doc_id"),
          col("k")), "doc_id")
        .select("k", "bkey")
        .localCheckpoint()
    }

  /** Content-keyed lookup banding for fixture stores: joins the batch's
    * texts to [[repBandKeys]] through the content digest — every batch
    * a fixture store ingests is a subset of the fixture corpus, so the
    * lookup is total and exactly equals [[bandKeys]] on the batch. */
  private def fixtureBandsOf(s: SparkSession, dir: String)
      : DataFrame => DataFrame = src =>
    src.select(col("doc_id"), textKey.as("k"))
      .join(repBandKeys(s, dir), "k")
      .select("doc_id", "bkey")

  /** The distinct char-4-gram rows of `src` (doc_id, text) — stride 2,
    * [[MaxPos]] cap — the gram-feature function the fixture dedup store
    * persists pair-level Jaccard with ([[graft.etl.DedupState]]'s
    * `gramsOf`), and the same shingling `q_ngram_jaccard`'s oracle
    * mirrors with generate_series(1, MaxPos, 2). */
  private[graft] def gram4Of(src: DataFrame): DataFrame =
    src.filter(length(col("text")) >= 4)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - 3, lit(MaxPos)), lit(2))).as("p"))
      .select(col("doc_id"), expr("substring(text, p, 4)").as("g"))
      .distinct()

  /** The DuckDB mirror of [[minhashBandPairs]]: CTE chain
    * shingles→hs→mh→bands→pairs over `from` (doc_id, text). */
  private def minhashPairsSql(from: String): String =
    s"""shingles AS (
       |${shinglesSql(from = from)}),
       |hs AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM shingles),
       |mh AS (
       |  SELECT doc_id,
       |$laneSqlExprs
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, l0 AS k0, l1 AS k1, l2 AS k2, l3 AS k3 FROM mh
       |  UNION ALL SELECT doc_id, 1, l4, l5, l6, l7 FROM mh
       |  UNION ALL SELECT doc_id, 2, l8, l9, l10, l11 FROM mh
       |  UNION ALL SELECT doc_id, 3, l12, l13, l14, l15 FROM mh),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
       |    AND a.k2 = b.k2 AND a.k3 = b.k3 AND a.doc_id < b.doc_id)"""
      .stripMargin

  /** DuckDB CTE chain assigning every doc its dedup cluster (shared by
    * `q_dedup_cluster` and `q_dedup_keep`): distinct-text groups →
    * MinHash band pairs → undirected edges → recursive reachability
    * fixpoint → MIN-label per rep → `clusters(doc_id, cluster)`.
    * Callers prepend `WITH RECURSIVE`. */
  private def clusterCteSql: String =
    s"""g AS (
       |  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
       |${minhashPairsSql("g")},
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION SELECT b AS src, a AS dst FROM pairs),
       |cc(id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst),
       |repc AS (SELECT id, MIN(lbl) AS cluster FROM cc GROUP BY id),
       |rep AS (
       |  SELECT d.doc_id, g.doc_id AS rid
       |  FROM documents d JOIN g ON g.text = d.text),
       |clusters AS (
       |  SELECT r.doc_id, COALESCE(c.cluster, r.rid) AS cluster
       |  FROM rep r LEFT JOIN repc c ON c.id = r.rid)""".stripMargin

  /** (doc_id, cluster) for every doc — the Spark mirror of
    * [[clusterCteSql]]: connected components
    * ([[graft.etl.Dedup.connectedComponents]] — iterative min-label
    * propagation, O(cluster diameter) rounds) over the rep-level
    * MinHash candidate graph, exact-duplicate members inheriting their
    * rep's component, singletons their own id.
    *
    * The CONVERGED assignment is memoized per (session, fixture): it
    * is the frame every downstream dedup action reads (clustering
    * report, keep-selection, and any future filter-by-cluster), and a
    * real pipeline materializes it exactly once — the iterative CC
    * fixpoint is far too expensive to re-derive per consumer. The
    * fixture tables are immutable for a run, so the memo needs no
    * invalidation; stopped sessions' entries are evicted on access
    * ([[fixtureMemo]]). */
  private val clusterMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(clusterMemo, s, dir) {
      val cc = graft.etl.Dedup.connectedComponents(corpusBandPairs(s, dir))
        .withColumnRenamed("id", "rid")
      groupMembers(s, dir).join(cc, Seq("rid"), "left_outer")
        .select(col("id").as("doc_id"),
          coalesce(col("cluster"), col("rid")).as("cluster"))
        // corpus-sized but two longs per row; every consumer reads it
        .localCheckpoint()
    }

  /** The PERSISTED incremental dedup state for the fixture's
    * seen/incoming split ([[graft.etl.DedupState]]): initialized with
    * the src0-src9 half as version 1, folded forward with src10-src19
    * as version 2 — each update at cost proportional to its batch, the
    * shape a daily-crawl pipeline runs at 100 TB (the dedup analog of
    * the engine's commit-touched pyramid fold). Memoized per (session,
    * fixture) because the store is the long-lived artifact; its root
    * lives in a temp dir for the session. Uses the SAME banding
    * ([[bandKeys]]) as the memoized one-shot pipeline, so components
    * match the oracle's. */
  private val dedupStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DedupState]
  private[graft] def incrDedupState(s: SparkSession, dir: String)
      : graft.etl.DedupState =
    fixtureMemo(dedupStateMemo, s, dir) {
      // lookup banding ([[fixtureBandsOf]] — the memoized signature
      // index, zero re-shingling) + gram features: the store persists
      // every candidate pair WITH its exact 4-gram Jaccard, so the
      // corpus similarity report (q_ngram_jaccard_lsh) is a read of
      // the pair index
      durableStore(s, dir, "dedup", "minhash16x4:gram4")(root =>
        new graft.etl.DedupState(s, root,
          fixtureBandsOf(s, dir), gramsOf = Some(gram4Of))) { st =>
        val d = docs(s, dir).select(col("doc_id"), col("text"),
          expr("CAST(substr(source, 4, 8) AS INT)").as("sn"))
        st.update(d.filter(col("sn") < 10).select("doc_id", "text"))
        st.update(d.filter(col("sn") >= 10).select("doc_id", "text"))
      }
    }

  /** Distinct-embedding groups — (embedding, rid = min vec_id, n) —
    * the embedding analog of [[distinctGroups]], memoized per fixture
    * and read by both cosine-dedup forms. */
  private val embGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def embGroups(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embGroupMemo, s, dir) {
      emb(s, dir).groupBy("embedding")
        .agg(min("vec_id").as("rid"), count(lit(1)).as("n"))
        .localCheckpoint()
    }

  /** Hyperplane band keys over (doc_id, text = ARRAY<FLOAT>) — bkey =
    * band index + full 8-bit signature, so bucket co-membership is
    * EXACTLY co-membership in a (band, sig) bucket of
    * [[graft.etl.Similarity.candidatePairs]] (bands = 2, bits = 8,
    * dim = 64 — the q_dedup_embcos tuning). */
  private def embedBandsOf(src: DataFrame): DataFrame =
    (0 until 2).map(g => src.select(col("doc_id"),
        concat_ws(":", lit(g), graft.etl.Similarity
          .hyperplaneBucket(col("text"), bits = 8, dim = 64, band = g))
          .as("bkey")))
      .reduce(_ unionByName _)

  /** WEIGHTED feature rows of an embedding — (doc_id, g = dimension,
    * w = µs-fixed-point component, the exact
    * [[graft.functions.FixedPointDot.scale]] rounding): the stored
    * pair score Σ wa·wb is then bit-for-bit the fixed-point dot
    * product every oracle-matched cosine shares. */
  private def embedGramsOf(src: DataFrame): DataFrame =
    src.select(col("doc_id"), posexplode(col("text")).as(Seq("i", "f")))
      .select(col("doc_id"), col("i").cast("string").as("g"),
        round(col("f").cast("double") * Scale, 0).cast("long").as("w"))

  /** The exact-cosine tree over the STORED pair attributes — the
    * [[graft.functions.FixedPointOps.exactCosine]] shape (cast and
    * operand placement are the bit-parity contract) with the dot from
    * the pair row and the squared norms from fsizes. */
  private def storedCos: Column =
    col("jac_num").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))

  /** The PERSISTED embedding near-duplicate store — the
    * [[incrDedupState]] pattern applied to the embedding family via
    * [[graft.etl.DedupState]]'s content genericity: hyperplane band
    * keys, fixed-point components as weighted features (the stored
    * pair attribute IS the exact dot product), and a cosine-threshold
    * pair-ADMISSION predicate, so the persisted edge set and the
    * clustering equal the one-shot thresholded build on any batch
    * schedule. */
  private val embedStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DedupState]
  /** One embedding near-dup store with the family's edge-set identity
    * (bands, weighted grams, content key, admission threshold) — the
    * single-store fixture and both federation members MUST construct
    * through here: the META/parity checks make a drifted copy refuse,
    * but the identity itself should exist once. */
  private def newEmbedStore(s: SparkSession, root: String)
      : graft.etl.DedupState =
    new graft.etl.DedupState(s, root,
      bandsOf = embedBandsOf,
      gramsOf = Some(embedGramsOf),
      contentCol = "embedding",
      // 128-bit content identity for an array column: digest the
      // deterministic per-component rendering (codegen'd casts, no
      // JSON library in the loop); paid once per NEW distinct
      // vector at store-build time — the priced index work, unlike
      // the per-query digesting the raw-array grouping lesson in
      // [[textKey]]'s note forbids. Per-element null marker because
      // concat_ws SKIPS nulls — without it [1.0, null] and [1.0]
      // would collide to one content key and the store would silently
      // merge distinct vectors (the rendering must partition arrays
      // exactly as the raw-array GROUP BY every oracle uses does)
      keyOf = c => md5(concat_ws(",",
        transform(c, x => coalesce(x.cast("string"), lit("∅"))))
        .cast("binary")),
      pairKeep = Some(storedCos >= 0.2),
      // PINNED admission identity: the default digests the Column's
      // RENDERING (Column.toString), which a Spark upgrade may change
      // for the same logical predicate — permanently refusing to
      // reopen a long-lived store. The explicit string is the
      // Spark-version-stable name of this predicate; bump its version
      // suffix if the THRESHOLD or formula ever changes.
      keepIdentity = Some("embcos:jac/sqrt(na*nb)>=0.2:v1"))
  private def embedState(s: SparkSession, dir: String)
      : graft.etl.DedupState =
    fixtureMemo(embedStateMemo, s, dir) {
      // ONE fold: batch-schedule invariance is the specs' job
      // (DedupStateSpec's weighted two-batch test, FederatedDedupSpec's
      // parity members), and a DedupState update has a fixed multi-job
      // cost the memo line shouldn't pay twice. First-arrival rep ids
      // in a single whole-corpus batch are the GLOBAL min vec_id per
      // distinct embedding — the same reps [[embGroups]] and every
      // oracle use.
      durableStore(s, dir, "embed", "hyperplane2x8:cos0.2")(
        root => newEmbedStore(s, root)) { st =>
        st.update(emb(s, dir).select(col("vec_id").as("doc_id"),
          col("embedding")))
      }
    }

  /** The PERSISTED federation store over the embedding members — two
    * member stores on a vec_id PARITY split (identical embeddings land
    * reps in BOTH members, exercising the star-edge collapse AND the
    * cross-member admission scoring — parallel vectors straddle the
    * split), folded into one [[graft.etl.FedDedupState]] under a
    * shared durable root; BOTH federated embedding readers (clusters +
    * pair report) are reads of it, the way the single store's pair and
    * label indexes share one fold. */
  private val fedEmbStoreMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.FedDedupState]
  private def fedEmbStore(s: SparkSession, dir: String)
      : graft.etl.FedDedupState =
    fixtureMemo(fedEmbStoreMemo, s, dir) {
      durableStore(s, dir, "fed_embed", "hyperplane2x8:cos0.2:parity") {
        root =>
          val a = newEmbedStore(s, s"$root/a")
          val b = newEmbedStore(s, s"$root/b")
          new graft.etl.FedDedupState(s, s"$root/merge", Seq(a, b))
      } { fed =>
        val e = emb(s, dir).select(col("vec_id").as("doc_id"),
          col("embedding"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(e.filter(col("doc_id") % 2 === 0)),
          b.update(e.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
    }

  /** FEDERATED embedding near-dup clusters — a read of the persisted
    * federation store's converged labels ([[fedEmbStore]]). The store's
    * min-label quotient fold over member pairs + star edges +
    * admission-scored cross-member pairs assigns the global-min-rid
    * labels the one-shot thresholded clustering does — which
    * `q_embcos_fed` serving [[embcosClusterOracleSql]] VERBATIM
    * proves (FedStateSpec pins store == one-shot on staged
    * schedules; FederatedDedupSpec covers the one-shot merge itself). */
  private val fedEmbClustersMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def fedEmbClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedEmbClustersMemo, s, dir) {
      fedEmbStore(s, dir).docClusters().localCheckpoint()
    }

  /** FEDERATED embedding near-dup PAIR REPORT — (a, b, cos) in
    * canonical rid space: the persisted federation store's pair
    * report (stored dots over the squared norms, admission applied at
    * fold time), composed with the same [[storedCos]] tree the
    * single-store read uses. Must equal [[embCosPairs]] row-for-row —
    * `q_dedup_embcos_fed` serves it under q_dedup_embcos's oracle
    * VERBATIM. */
  private val fedEmbPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def fedEmbCosPairs(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedEmbPairsMemo, s, dir) {
      fedEmbStore(s, dir).pairReport()
        .select(col("a"), col("b"), storedCos.as("cos"))
        .localCheckpoint()
    }

  /** The banded-hyperplane candidate graph over the distinct-embedding
    * reps, exact-cosine-reranked and thresholded — (a, b, cos) —
    * memoized per fixture by the same argument as
    * [[corpusBandPairs]]: one candidate graph, every cosine-dedup
    * consumer reads it. Since round 14 this is a READ of the persisted
    * [[embedState]] pair index: the dot is the stored pair attribute,
    * the norms come from fsizes, the threshold was applied at pair
    * admission — no banding, reranking or vector arithmetic happens at
    * query time (the round-13 "every memo family persists" sweep
    * finally reaches the embedding family). Output-bounded, tiny. */
  private val embPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def embCosPairs(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embPairsMemo, s, dir) {
      val st = embedState(s, dir)
      val sz = st.featSizes()
      st.livePairStats()
        .join(sz.select(col("rid").as("a"), col("n").as("na")), "a")
        .join(sz.select(col("rid").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"), storedCos.as("cos"))
        .localCheckpoint()
    }

  /** The CONVERGED embedding cluster assignment — (vec_id, cluster)
    * for every vector — the embedding analog of [[dedupClusters]] and
    * memoized by the same argument: the iterative CC fixpoint
    * ([[graft.etl.Dedup.connectedComponents]]) is far too expensive to
    * re-derive per consumer, the fixture is immutable for a run, and
    * every downstream embedding-dedup action (clustering report,
    * filter-by-cluster) reads this one frame. Identical-embedding
    * members inherit their rep's component; vectors in no surviving
    * pair are their own singleton. */
  private val embClusterMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def embClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embClusterMemo, s, dir) {
      // the CONVERGED assignment is the store's label index (the CC
      // fixpoint ran incrementally at fold time over the admitted —
      // thresholded — edges); reading it replaces the per-session
      // connectedComponents run entirely. Store rep ids are the global
      // min vec_ids (range-batched fixture), so labels match the
      // oracle's min-reachable-vec_id semantics.
      embedState(s, dir).docClusters()
        .select(col("doc_id").as("vec_id"), col("cluster"))
        // corpus-sized but two longs per row; every consumer reads it
        .localCheckpoint()
    }

  /** Symmetric-int8 quantized codes of the fixture's embeddings —
    * (vec_id, i, q) with q = round(v·127/gmax) — memoized per
    * (session, fixture): an SQ8 index trains its scale and encodes the
    * corpus ONCE (at 100 TB the codes persist as the index files, 4×
    * smaller than the floats) and every query scores against the
    * stored codes. Re-deriving the explode + scale scan per query was
    * the dominant cost of q_ann_sq8 at the 100× replica. */
  private val sq8Memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The PERSISTED SQ8 code store: the scale (gmax) TRAINS once per
    * corpus as the store's artifact; new vectors encode against the
    * frozen scale at batch cost — a production quantizer's exact
    * retrain cadence ([[graft.etl.DerivedState.train]] starts a new
    * index generation when the scale must move). */
  private val sq8StateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def scaledComponents(e: DataFrame): DataFrame = e
    .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "f")))
    .select(col("vec_id"), col("i"), col("f").cast("double").as("v"))
  private val sq8Trainer: DataFrame => DataFrame = corpus =>
    scaledComponents(corpus).agg(max(abs(col("v"))).as("gmax"))
  private val sq8Derive: (DataFrame, DataFrame) => DataFrame = (rows, gm) =>
    scaledComponents(rows).crossJoin(broadcast(gm))
      .select(col("vec_id"), col("i"),
        round(col("v") * 127 / col("gmax"), 0).cast("long").as("q"))
  private def newSq8State(s: SparkSession, root: String)
      : graft.etl.DerivedState =
    new graft.etl.DerivedState(s, root,
      "sq8:sym-int8:gmax", "vec_id", sq8Derive, Some(sq8Trainer))
  private def sq8State(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(sq8StateMemo, s, dir) {
      durableStore(s, dir, "sq8", "sq8:sym-int8:gmax")(
        root => newSq8State(s, root)) { st =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        st.train(e)
        (0 to 1).foreach(i => st.update(e.filter(col("vec_id") % 2 === i)))
      }
    }
  private def sq8Codes(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(sq8Memo, s, dir) {
      sq8State(s, dir).derived().localCheckpoint()
    }

  /** FEDERATED SQ8 codes: two member stores (vec_id-parity split) under
    * ONE quantizer — the trainer member (a) trains the scale on the
    * union corpus sample (here the full embedding set, so the merged
    * index is evidence-indistinguishable from the single store); member
    * (b) ADOPTS the frozen artifact frame
    * ([[graft.etl.DerivedState.adopt]]: digest-verified copy, new
    * generation); each encodes only the vectors it owns. The merge
    * ([[graft.etl.DerivedState.federatedDerived]]) REFUSES mismatched
    * artifact digests — the contract that makes a federated q_ann_sq8
    * answerable at all: codes quantized under different scales are
    * mutually incomparable numbers. */
  private val fedSq8Memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def fedSq8Codes(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedSq8Memo, s, dir) {
      val (a, b) = durableStore(s, dir, "fed_sq8",
        "sq8:sym-int8:gmax:adopt") { root =>
        (newSq8State(s, s"$root/a"), newSq8State(s, s"$root/b"))
      } { case (a, b) =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        a.train(e)
        b.adopt(a)
        inParallel(
          a.update(e.filter(col("vec_id") % 2 === 0)),
          b.update(e.filter(col("vec_id") % 2 === 1)))
      }
      graft.etl.DerivedState.federatedDerived(Seq(a, b)).localCheckpoint()
    }

  /** Trained spherical-k-means artifacts of the fixture's embeddings —
    * the final QUANTIZED centroids after two fixed Lloyd passes
    * (deterministic init: cluster = vec_id % k) and the converged
    * (vec_id, cluster) assignment — memoized per (session, fixture) by
    * the SQ8 argument: a coarse quantizer trains ONCE per corpus (at
    * 100 TB the centroids and assignment persist as the index files)
    * and every consumer (SemDeDup pruning, IVF probing) reads the
    * trained artifacts instead of re-running the Lloyd passes. */
  private val kmCentMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Seq[graft.etl.KMeans.Centroid]]
  /** The PERSISTED k-means index store: the two fixed Lloyd passes
    * TRAIN the centroids once per corpus (the store's artifact, saved
    * losslessly via [[graft.etl.KMeans.centroidRows]]); new vectors
    * assign against the frozen centroids at batch cost. Re-clustering
    * is an explicit [[graft.etl.DerivedState.train]] — a new index
    * generation, exactly how a production IVF coarse quantizer
    * retrains. */
  private val kmStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private def kmState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(kmStateMemo, s, dir) {
      val trainer: DataFrame => DataFrame = corpus => {
        val c0 = graft.etl.KMeans.quantizedCentroids(
          corpus.withColumn("cluster", col("vec_id") % KMeansK))
        val c1 = graft.etl.KMeans.quantizedCentroids(
          corpus.withColumn("cluster",
            graft.etl.KMeans.assign(col("embedding"), c0)))
        graft.etl.KMeans.centroidRows(s, c1)
      }
      val derive: (DataFrame, DataFrame) => DataFrame = (rows, arts) => {
        val cents = graft.etl.KMeans.centroidsFromRows(arts)
        rows.select(col("vec_id"),
          graft.etl.KMeans.assign(col("embedding"), cents).as("cluster"))
      }
      val fp = s"kmeans:k=$KMeansK:lloyd=2:init=mod"
      durableStore(s, dir, "kmeans", fp)(root =>
        new graft.etl.DerivedState(s, root, fp, "vec_id", derive,
          Some(trainer))) { st =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        st.train(e)
        (0 to 1).foreach(i => st.update(e.filter(col("vec_id") % 2 === i)))
      }
    }
  private def kmeansCentroids(s: SparkSession, dir: String)
      : Seq[graft.etl.KMeans.Centroid] =
    fixtureMemo(kmCentMemo, s, dir) {
      graft.etl.KMeans.centroidsFromRows(kmState(s, dir).artifacts())
    }
  private val kmAssignMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def kmeansAssignments(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(kmAssignMemo, s, dir) {
      // two longs per row; read by SemDeDup and every IVF probe
      kmState(s, dir).derived().localCheckpoint()
    }

  /** DuckDB mirror of the two fixed Lloyd passes ([[kmeansCentroids]]):
    * CTE chain sc→norms→a0→(c0,cn0,d0,s0,a1)→(c1,cn1,d1,s1,a2). cN
    * carries the grid-quantized centroids (`round(sum(v)/n)` — exact
    * integer sums, one IEEE division, SQL ROUND half-away like
    * [[graft.functions.FixedPointDot.scale]]); sN the exact-arithmetic
    * cosines; aN+1 the argmax via `ORDER BY cos DESC, cluster` —
    * NaN-first under DuckDB's NaN-greatest order, exactly Spark's
    * NaN-greatest struct `array_max` in [[graft.etl.KMeans.assign]]. */
  private def kmeansSql: String = {
    def pass(n: Int, prev: String) =
      s"""c$n AS (
         |  SELECT $prev.cluster, sc.i,
         |    CAST(ROUND(CAST(SUM(sc.v) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS q
         |  FROM sc JOIN $prev ON $prev.vec_id = sc.vec_id
         |  GROUP BY $prev.cluster, sc.i),
         |cn$n AS (SELECT cluster, SUM(q * q) AS cn FROM c$n GROUP BY cluster),
         |d$n AS (
         |  SELECT sc.vec_id, c$n.cluster, SUM(sc.v * c$n.q) AS dot
         |  FROM sc JOIN c$n ON c$n.i = sc.i
         |  GROUP BY sc.vec_id, c$n.cluster),
         |s$n AS (
         |  SELECT d$n.vec_id, d$n.cluster,
         |    CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
         |  FROM d$n
         |  JOIN norms ON norms.vec_id = d$n.vec_id
         |  JOIN cn$n ON cn$n.cluster = d$n.cluster),
         |a${n + 1} AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY cos DESC, cluster) AS rn
         |    FROM s$n) t WHERE rn = 1)"""
        .stripMargin
    s"""sc AS (
       |  SELECT vec_id, unnest(range(len(embedding))) AS i,
       |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
       |  FROM embeddings),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM sc GROUP BY vec_id),
       |a0 AS (SELECT vec_id, vec_id % $KMeansK AS cluster FROM embeddings),
       |${pass(0, "a0")},
       |${pass(1, "a1")}"""
      .stripMargin
  }

  /** Banded hyperplane-signature candidates over `base`
    * (vec_id, embedding) + exact fixed-point cosine, one implementation
    * for the pair and representative forms (SQL mirror:
    * [[embcosPairsSql]]). Emits (a, b, cos) above `threshold`. */
  private def cosinePairs(base: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
    val cand = graft.etl.Similarity.candidatePairs(
      base.select("vec_id", "embedding"), bands = 2, bits = 8, dim = 64)
    cand
      .join(base.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(base.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .select(col("a"), col("b"),
        exactCosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The DuckDB mirror of [[cosinePairs]]: CTE chain
    * sc→coef/bits→bk→cand→norms→dots→cpairs over `from`
    * (vec_id, embedding); `cpairs` carries (a, b, cos) unthresholded.
    */
  private def embcosPairsSql(from: String): String =
    s"""sc AS (
       |  SELECT vec_id, unnest(range(len(embedding))) AS i,
       |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
       |  FROM $from),
       |${hyperplaneSql(nPlanes = 16)},
       |bk AS (
       |  SELECT vec_id, j // 8 AS band,
       |    SUM(CASE WHEN b = 1
       |        THEN (CAST(1 AS BIGINT) << CAST(j % 8 AS INTEGER)) ELSE 0 END) AS sig
       |  FROM bits GROUP BY vec_id, j // 8),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bk x JOIN bk y
       |    ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM sc GROUP BY vec_id),
       |dots AS (
       |  SELECT c.a, c.b, SUM(sa.v * sb.v) AS dot
       |  FROM cand c
       |  JOIN sc sa ON sa.vec_id = c.a
       |  JOIN sc sb ON sb.vec_id = c.b AND sb.i = sa.i
       |  GROUP BY c.a, c.b),
       |cpairs AS (
       |  SELECT d.a, d.b,
       |    CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(qa.nn AS DOUBLE)) * sqrt(CAST(qb.nn AS DOUBLE))) AS cos
       |  FROM dots d
       |  JOIN norms qa ON qa.vec_id = d.a JOIN norms qb ON qb.vec_id = d.b)"""
      .stripMargin

  /** The embedding pair-report oracle — shared verbatim by the
    * single-store (`q_dedup_embcos`) and federated
    * (`q_dedup_embcos_fed`) forms: the federated pair report must be
    * evidence-indistinguishable from one store over the union corpus,
    * exact cosines included. */
  private def embcosPairsOracleSql: String =
    s"""WITH ${embcosPairsSql("embeddings")}
       |SELECT a, b, cos FROM cpairs WHERE cos >= 0.2
       |ORDER BY a, b""".stripMargin

  /** The embedding-clustering oracle — shared verbatim by the
    * single-store (`q_embcos_cluster`) and federated (`q_embcos_fed`)
    * forms, the [[contaminationSql]] pattern: a federated merge is
    * proven by being evidence-indistinguishable from one store over
    * the union corpus, labels included (the merge's canonical rep per
    * content is the global min rid, and CC labels are min-reachable —
    * both exactly the single-store definitions). */
  private def embcosClusterOracleSql: String =
    s"""WITH RECURSIVE g AS (
       |  SELECT MIN(vec_id) AS vec_id, embedding
       |  FROM embeddings GROUP BY embedding),
       |${embcosPairsSql("g")},
       |edges AS (
       |  SELECT a AS src, b AS dst FROM cpairs WHERE cos >= 0.2
       |  UNION SELECT b AS src, a AS dst FROM cpairs WHERE cos >= 0.2),
       |cc(id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst),
       |repc AS (SELECT id, MIN(lbl) AS cluster FROM cc GROUP BY id),
       |rep AS (
       |  SELECT e.vec_id, g.vec_id AS rid
       |  FROM embeddings e JOIN g ON g.embedding = e.embedding),
       |clusters AS (
       |  SELECT r.vec_id, COALESCE(c.cluster, r.rid) AS cluster
       |  FROM rep r LEFT JOIN repc c ON c.id = r.rid)
       |SELECT vec_id, cluster,
       |  CAST(vec_id = cluster AS BIGINT) AS is_canonical
       |FROM clusters ORDER BY vec_id""".stripMargin

  /** Force every per-(session, fixture) memo — the corpus-derived index
    * frames a real pipeline materializes once at build time (distinct
    * groups, MinHash signatures + band pairs, converged cluster
    * assignments, language predictions, contamination postings,
    * word/trigram tables, embedding groups/pairs/clusters, SQ8 codes,
    * k-means artifacts). [[graft.Bench]] calls this in its settle phase
    * and reports the cost as its own `memo_build` line, so per-query
    * bench numbers measure STEADY-STATE plans instead of whichever
    * query happens to touch a cold memo first (the attribution drift
    * flagged in round 11). Builders are dependency-ordered; each memo's
    * `localCheckpoint()` is eager, so invoking the accessor builds it. */
  /** The contamination probe's oracle SQL — shared verbatim by the
    * single-store (`q_contamination`) and federated (`q_contam_fed`)
    * forms: the federated merge must be evidence-indistinguishable
    * from one store over the union corpus. */
  private def contaminationSql: String =
    s"""WITH grams AS (
       |  SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 8) AS g
       |  FROM documents, generate_series(1, $MaxPos, 2) AS s(p)
       |  WHERE p <= length(text) - 7),
       |tg AS (
       |  SELECT DISTINCT text, substr(text, CAST(p AS INTEGER), 8) AS g
       |  FROM documents, generate_series(1, $MaxPos, 2) AS s(p)
       |  WHERE p <= length(text) - 7),
       |rare AS (SELECT g FROM tg GROUP BY g HAVING COUNT(*) <= $ContamDfCap),
       |rg AS (SELECT doc_id, grams.g FROM grams JOIN rare ON rare.g = grams.g),
       |probe AS (SELECT doc_id, g FROM rg WHERE doc_id % 97 = 0),
       |psz AS (SELECT doc_id, COUNT(*) AS np FROM probe GROUP BY doc_id),
       |hits AS (
       |  SELECT c.doc_id, p.doc_id AS probe_id, COUNT(*) AS shared
       |  FROM rg c JOIN probe p ON p.g = c.g AND c.doc_id % 97 <> 0
       |  GROUP BY c.doc_id, p.doc_id)
       |SELECT h.doc_id, h.probe_id, CAST(h.shared AS BIGINT) AS shared,
       |  CAST(s.np AS BIGINT) AS np
       |FROM hits h JOIN psz s ON s.doc_id = h.probe_id
       |WHERE h.shared * 20 >= s.np * 3
       |ORDER BY h.doc_id, h.probe_id""".stripMargin

  /** The contamination probe over an arbitrary live-postings index
    * (k, g) — the downstream shared by both query forms. */
  private def contaminationReport(s: SparkSession, dir: String,
                                  kGrams: DataFrame): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), textKey.as("k"))
    val isProbe = pmod(col("doc_id"), lit(97)) === 0
    val probeM = d.filter(isProbe)
      .select(col("k").as("kp"), col("doc_id").as("probe_id"))
    val corpusM = d.filter(!isProbe)
      .select(col("k").as("kc"), col("doc_id"))
    // The probe relation is an eval suite by construction (thousands
    // of docs, low-millions of rare-gram postings); when its ACTUAL
    // posting count is small, BROADCAST it so the corpus postings
    // are never sort-merge-shuffled against a KB-scale table — at
    // 100 TB that shuffle would move the whole corpus gram set for
    // nothing. The probe frame is materialized once (both the
    // containment join and the denominator read it; an un-pinned
    // broadcast would re-derive the whole gram pipeline through the
    // driver per consumer), so the posting count that gates the
    // broadcast is a free scan of its blocks.
    val probeGrams = kGrams
      .join(probeM.select(col("kp").as("k")).distinct(), Seq("k"), "left_semi")
      .withColumnRenamed("k", "kp")
      .localCheckpoint()
    def probeSide(df: DataFrame): DataFrame =
      if (probeGrams.count() <= ContamBroadcastMaxPostings) broadcast(df)
      else df
    val corpusGrams = kGrams
      .join(corpusM.select(col("kc").as("k")).distinct(), Seq("k"), "left_semi")
      .withColumnRenamed("k", "kc")
    val np = probeGrams.groupBy("kp").agg(count(lit(1)).as("np"))
    val hitsK = corpusGrams.join(probeSide(probeGrams), "g")
      .groupBy("kc", "kp").agg(count(lit(1)).as("shared"))
      .join(probeSide(np), "kp")
      .filter(col("shared") * 20 >= col("np") * 3)
    hitsK.join(corpusM, "kc").join(probeM, "kp")
      .select(col("doc_id"), col("probe_id"), col("shared"), col("np"))
      .orderBy("doc_id", "probe_id")
  }

  /** Two member decontamination indexes (doc_id-parity split) folded
    * into a PERSISTED incremental federation store
    * ([[graft.etl.FedContamState]]) and served as a read of its live
    * postings — the production shape; FedStateSpec pins the
    * store == one-shot [[graft.etl.ContamState.federatedLivePostings]]
    * equivalence on staged schedules. */
  private val fedContamMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private def fedContamPostings(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedContamMemo, s, dir) {
      val fed = durableStore(s, dir, "fed_contam",
        s"contam:g8:cap=$ContamDfCap:parity") { root =>
        val a = new graft.etl.ContamState(s, s"$root/a", contamGrams,
          ContamDfCap)
        val b = new graft.etl.ContamState(s, s"$root/b", contamGrams,
          ContamDfCap)
        new graft.etl.FedContamState(s, s"$root/merge", Seq(a, b))
      } { fed =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(d.filter(col("doc_id") % 2 === 0)),
          b.update(d.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
      fed.livePostings().localCheckpoint()
    }

  /** Build every fixture memo / persisted store, returning per-family
    * wall times so the bench can attribute the one-time index-build
    * cost line by line (round-over-round comparability — the single
    * `memo_build` total hid which family grew). Order matters only
    * for attribution: a family's time covers what IT adds on top of
    * the memos built before it. */
  def prebuildMemos(s: SparkSession, dir: String): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      out += name -> (System.nanoTime() - t0) / 1e9
    }
    t("groups") { distinctGroups(s, dir) }
    t("minhash") { repSignatures(s, dir); corpusBandPairs(s, dir)
      dedupClusters(s, dir); repBandKeys(s, dir) }
    t("langpred") { langPredictions(s, dir) }
    t("lm3") { lmScores(s, dir) }
    t("contam") { contamPostings(s, dir) }
    t("ngrams") { inParallel(repTriGrams(s, dir), repWordCounts(s, dir)) }
    t("embed") { embGroups(s, dir); embedState(s, dir)
      embCosPairs(s, dir); embClusters(s, dir) }
    t("sq8") { sq8Codes(s, dir) }
    t("fed_sq8") { fedSq8Codes(s, dir) }
    t("kmeans") { kmeansCentroids(s, dir); kmeansAssignments(s, dir) }
    t("dedup_store") { incrDedupState(s, dir) }
    t("fed_dedup") { fedDocClusters(s, dir) }
    t("winnow") { winnowSelSet(s, dir) }
    t("winnow_pairs") { winnowPairState(s, dir) }
    t("fed_winnow") { winnowFedState(s, dir) }
    t("spans") { spanState(s, dir) }
    t("fed_contam") { fedContamPostings(s, dir) }
    t("fed_embed") { fedEmbClusters(s, dir); fedEmbCosPairs(s, dir) }
    out.toSeq
  }

  val defs: Map[String, QueryDef] = Map(

    // ---- Deduplication ------------------------------------------------

    // Exact dedup: content-hash groupBy; per-source duplicate accounting.
    "q_dedup_exact" -> QueryDef(
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
         |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dups
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text").cast("binary"))).as("n_distinct"),
          (count(lit(1)) - countDistinct(md5(col("text").cast("binary")))).as("n_dups"))
        .orderBy("source")
    },

    // MinHash + LSH near-dup candidates: shingle → ONE md5 → 16
    // 2-universal integer lanes (Broder-style (a·h1 + b·h2 + c) mod P,
    // fixed LCG-derived coefficients) → 4 bands of 4 lanes → bucket
    // self-join on the integer lane tuple. One digest per shingle where
    // the first cut computed four, and the band key is 4 longs instead
    // of an md5-of-concat string — the hash volume, not the single
    // shuffle, dominated this query's cost. Everything stays exact
    // int64 (products < 2^53), so DuckDB reproduces it bit-for-bit.
    "q_dedup_minhash" -> QueryDef(
      s"""WITH ${minhashPairsSql("documents")}
         |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin) { (s, dir) =>
      // Identical texts have identical lane minima, so band buckets —
      // and therefore the PAIR SET — factor through distinct texts:
      // hash/band work runs once per distinct text, and the full pair
      // set is recovered by expansion (cross pairs via the rep pair ×
      // both member sets; intra pairs for any text that shingles at
      // all, since it shares every band with its copies). Identical
      // output to banding the raw corpus — the oracle still does — at
      // hash cost ∝ distinct content + output size, where the direct
      // form re-hashed every duplicate (93 s vs ~10 s at the 100×
      // duplicate-heavy replica, SCALE.md). Group/join keys are the
      // 16-byte content digest, never the raw text; the groups and
      // the candidate graph are the fixture-memoized frames every
      // dedup consumer shares.
      val g = distinctGroups(s, dir)
      val shingly = g.filter(length(col("text")) >= ShingleLen)
        .select(col("rid"))
      expandPairs(groupMembers(s, dir), corpusBandPairs(s, dir), shingly)
        .orderBy("a", "b")
    },

    // Replication-invariant MinHash: collapse bit-identical texts to a
    // representative (min doc_id) + multiplicity, then the IDENTICAL
    // lane/band pipeline over representatives only. Pair emission over
    // a duplicate-heavy corpus is output-bound (k copies → k²/2 pairs
    // per group — a crawled corpus at 100× replication put
    // q_dedup_minhash at 92.5 s, SCALE.md round-7); this form's LSH
    // join sees each distinct text once, so its cost and result are
    // invariant under duplication and the counts carry the rest.
    "q_dedup_minhash_rep" -> QueryDef(
      s"""WITH g AS (
         |  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n, text
         |  FROM documents GROUP BY text),
         |${minhashPairsSql("g")}
         |SELECT p.a, p.b, ga.n AS na, gb.n AS nb
         |FROM pairs p
         |JOIN g ga ON ga.doc_id = p.a JOIN g gb ON gb.doc_id = p.b
         |ORDER BY p.a, p.b""".stripMargin) { (s, dir) =>
      val g = distinctGroups(s, dir)
      corpusBandPairs(s, dir)
        .join(g.select(col("rid").as("a"), col("nm").as("na")), "a")
        .join(g.select(col("rid").as("b"), col("nm").as("nb")), "b")
        .select("a", "b", "na", "nb").orderBy("a", "b")
    },

    // Dedup clustering — the step a real pipeline ACTS on: connected
    // components over the rep-level MinHash candidate graph, every doc
    // labeled with its cluster (min doc_id in the component, through
    // exact-duplicate membership) and a keep/drop canonical flag.
    // Spark side: graft.etl.Dedup.connectedComponents — iterative
    // min-label propagation, one join + one groupBy per round,
    // O(cluster diameter) rounds (near-dup clusters are shallow), no
    // corpus-wide collect. The oracle reproduces the fixpoint with a
    // recursive CTE (reachability set → MIN label), which is exact at
    // fixture scale.
    "q_dedup_cluster" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql
         |SELECT doc_id, cluster,
         |  CAST(doc_id = cluster AS BIGINT) AS is_canonical
         |FROM clusters ORDER BY doc_id""".stripMargin) { (s, dir) =>
      dedupClusters(s, dir)
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster")).cast("long"))
        .orderBy("doc_id")
    },

    // Canonical selection over the dedup clusters: the keep/drop
    // decision a pipeline executes — per cluster, KEEP the longest
    // member (the standard near-dup heuristic: the longest variant
    // subsumes its truncations), ties to the smallest doc_id. One
    // window over the cluster assignment; skew is bounded by duplicate
    // group size, and a cluster's members already co-locate on the
    // cluster key.
    "q_dedup_keep" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql
         |SELECT c.doc_id, c.cluster,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY c.cluster
         |    ORDER BY length(d.text) DESC, c.doc_id) = 1 AS BIGINT) AS keep
         |FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("len").desc, col("doc_id").asc)
      dedupClusters(s, dir)
        .join(docs(s, dir)
          .select(col("doc_id"), length(col("text")).as("len")), "doc_id")
        .withColumn("keep", (row_number().over(w) === 1).cast("long"))
        .select("doc_id", "cluster", "keep")
        .orderBy("doc_id")
    },

    // Eval-set contamination: corpus docs whose distinct RARE-8-gram
    // set contains ≥ 15% of some probe ("eval") doc's rare grams — the
    // containment check a training pipeline runs against its benchmark
    // suites before training (real checks run 8-13-gram containment;
    // the threshold is the tunable). The probe set here is the
    // deterministic doc_id % 97 slice standing in for an eval suite. Distinct-
    // factored: gram sets are computed once per distinct text (keyed by
    // the content digest) and doc-level hits expand through the member
    // maps; at corpus scale the probe side is a small broadcastable
    // relation (eval suites are thousands of docs), and top-frequency
    // "stopword" grams would be dropped before the join to bound key
    // skew — the fixture's gram distribution doesn't need it.
    "q_contamination" -> QueryDef(contaminationSql) { (s, dir) =>
      contaminationReport(s, dir, contamPostings(s, dir))
    },

    // FEDERATED contamination: the same probe report computed from TWO
    // member decontamination indexes (doc_id-parity split) merged by
    // ContamState.federatedLivePostings — the merge must serve the
    // exact evidence a single store over the union corpus holds, so
    // the oracle is q_contamination's, VERBATIM.
    "q_contam_fed" -> QueryDef(contaminationSql) { (s, dir) =>
      contaminationReport(s, dir, fedContamPostings(s, dir))
    },


    // Cross-source overlap matrix — which sources copy from each
    // other, the provenance audit that decides whether dedup must run
    // ACROSS source boundaries before mixing. Shared-rare-gram counts
    // per source pair over the SAME df-capped index q_contamination
    // probes (one build, memoized): the pair join is keyed on the
    // gram, and the df cap bounds each gram's fan-out to ≤ cap
    // sources, so the matrix costs Σ_g df_g² ≤ cap · |vocab| — linear
    // in the gram vocabulary, never sources × corpus. Overlap ratio =
    // shared / min(|A|, |B|) (exact ints + one IEEE division).
    "q_source_overlap" -> QueryDef(
      s"""WITH tg AS (
         |  SELECT DISTINCT text, substr(text, CAST(p AS INTEGER), 8) AS g
         |  FROM documents, generate_series(1, $MaxPos, 2) AS s(p)
         |  WHERE p <= length(text) - 7),
         |rare AS (SELECT g FROM tg GROUP BY g HAVING COUNT(*) <= $ContamDfCap),
         |sg AS (
         |  SELECT DISTINCT d.source, t.g
         |  FROM tg t JOIN rare ON rare.g = t.g
         |  JOIN documents d ON d.text = t.text),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM sg GROUP BY source),
         |ov AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS shared
         |  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT ov.src_a, ov.src_b, ov.shared, za.nv AS na, zb.nv AS nb,
         |  CAST(ov.shared AS DOUBLE) / LEAST(za.nv, zb.nv) AS overlap
         |FROM ov
         |JOIN sz za ON za.source = ov.src_a
         |JOIN sz zb ON zb.source = ov.src_b
         |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      val sg = contamPostings(s, dir)
        .join(docs(s, dir).select(textKey.as("k"), col("source")).distinct(), "k")
        .select("source", "g").distinct()
        // sources × rare-gram vocab, three consumers below
        .localCheckpoint()
      val sz = sg.groupBy("source").agg(count(lit(1)).as("nv"))
      sg.select(col("source").as("src_a"), col("g"))
        .join(sg.select(col("source").as("src_b"), col("g")), "g")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
        .join(broadcast(sz.select(col("source").as("src_a"),
          col("nv").as("na"))), "src_a")
        .join(broadcast(sz.select(col("source").as("src_b"),
          col("nv").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("shared"), col("na"), col("nb"),
          (col("shared").cast("double") / least(col("na"), col("nb")))
            .as("overlap"))
        .orderBy("src_a", "src_b")
    },

    // Per-source duplication report: the mixing-decision statistic
    // that tells a pipeline WHERE its duplication lives — per source,
    // the exact-duplicate surplus (docs minus distinct texts) and the
    // near-duplicate exposure (docs whose MinHash cluster has ≥ 2
    // members corpus-wide). Reads the shared memoized distinct-group
    // and cluster-assignment frames; adds two joins and one aggregate.
    "q_dup_report" -> QueryDef(
      s"""WITH RECURSIVE ${clusterCteSql},
         |csz AS (
         |  SELECT cluster, COUNT(*) AS csz FROM clusters GROUP BY cluster),
         |j AS (
         |  SELECT d.source, d.text, s.csz
         |  FROM documents d
         |  JOIN clusters c ON c.doc_id = d.doc_id
         |  JOIN csz s ON s.cluster = c.cluster)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
         |  CAST(SUM(CASE WHEN csz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
         |  CAST(COUNT(*) - COUNT(DISTINCT text) AS DOUBLE) / COUNT(*) AS exact_ratio,
         |  CAST(SUM(CASE WHEN csz >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         |    AS near_ratio
         |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val cl = dedupClusters(s, dir)
      // cluster sizes are DOC-level member counts (dedupClusters emits one
      // row per doc): a pure exact-duplicate group has csz >= 2 with no
      // near-dup edge, so n_neardup counts docs whose content is shared,
      // exactly or nearly. Co-partitioned equi-join, deliberately NOT
      // broadcast (too big at corpus scale).
      val csz = cl.groupBy("cluster").agg(count(lit(1)).as("csz"))
      docs(s, dir).select(col("doc_id"), col("source"), textKey.as("k"))
        .join(cl, "doc_id")
        .join(csz, "cluster")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("k").as("n_distinct"),
          sum(when(col("csz") >= 2, 1L).otherwise(0L)).as("n_neardup"))
        .select(col("source"), col("n_docs"), col("n_distinct"), col("n_neardup"),
          ((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"))
            .as("exact_ratio"),
          (col("n_neardup").cast("double") / col("n_docs")).as("near_ratio"))
        .orderBy("source")
    },

    // SOFT dedup: instead of dropping near-duplicates, weight each doc
    // by the inverse of its cluster's size (the "count each content
    // once" correction from the dedup literature — repeated content
    // contributes one document's worth of gradient split across its
    // copies). Weights are integer MICRO-docs (1e6 div csz) so the
    // per-source sum is an exact order-independent integer — a double
    // 1/csz sum would be partition-order dependent. Reads the shared
    // memoized cluster assignment; one broadcast-free equi-join chain.
    "q_softdedup_weights" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql,
         |csz AS (
         |  SELECT cluster, COUNT(*) AS csz FROM clusters GROUP BY cluster)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(1000000 // s.csz) AS BIGINT) AS eff_microdocs,
         |  CAST(SUM(1000000 // s.csz) AS DOUBLE) / (COUNT(*) * 1000000)
         |    AS eff_ratio
         |FROM documents d
         |JOIN clusters c ON c.doc_id = d.doc_id
         |JOIN csz s ON s.cluster = c.cluster
         |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
      val cl = dedupClusters(s, dir)
      val csz = cl.groupBy("cluster").agg(count(lit(1)).as("csz"))
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(cl, "doc_id")
        .join(csz, "cluster")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("1000000 div csz")).as("eff_microdocs"))
        .select(col("source"), col("n_docs"), col("eff_microdocs"),
          (col("eff_microdocs").cast("double") /
            (col("n_docs") * lit(1000000L))).as("eff_ratio"))
        .orderBy("source")
    },

    // Stratified deterministic sampling — corpus mixing by language
    // with per-stratum rates (down-weight the dominant language), the
    // reproducible-sample primitive every training-data pipeline needs:
    // the keep decision is a pure hash of (doc_id, text), so the same
    // sample falls out on any engine, any partitioning, any run. Pure
    // map-side filter: no shuffle, no state, scales with the scan.
    "q_corpus_sample" -> QueryDef(
      s"""SELECT doc_id, lang,
         |  CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8) AS BIGINT) % 100 AS BIGINT) AS bucket
         |FROM documents
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8) AS BIGINT) % 100
         |      < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("text")).cast("binary")), 1, 8), 16, 10).cast("long"),
        lit(100))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") <
          when(col("lang") === "en", 20).otherwise(50))
        .orderBy("doc_id")
    },

    // SimHash: 16-bit signature; bit j votes from a hex digit of each
    // feature's md5 (parity of the digit's value).
    "q_dedup_simhash" -> QueryDef(
      s"""WITH shingles AS (
         |${shinglesSql()}),
         |bits AS (
         |  SELECT doc_id, j.j,
         |    SUM(CASE WHEN (strpos('0123456789abcdef',
         |          substr(md5(sh), CAST(j.j + 1 AS INTEGER), 1)) - 1) % 2 = 1
         |        THEN 1 ELSE -1 END) AS vote
         |  FROM shingles, generate_series(0, 15) AS j(j)
         |  GROUP BY doc_id, j.j)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // One shuffle: the 16 bit-position votes are 16 agg columns of a
      // single groupBy(doc_id) over the distinct-shingle set (votes are
      // per distinct feature, so distinct matters here, unlike minhash).
      // The signature is a pure function of the text → computed once
      // per distinct text.
      perDistinctText(s, dir) { reps =>
        val sh = shinglesOf(reps)
          .select(col("doc_id"), md5(col("sh").cast("binary")).as("h"))
        val votes = (0 until 16).map(j =>
          sum(when((instr(lit("0123456789abcdef"),
              substring(col("h"), j + 1, 1)) - 1) % 2 === 1, 1L)
            .otherwise(-1L)).as(s"v$j"))
        sh.groupBy("doc_id").agg(votes.head, votes.tail: _*)
          .select(col("doc_id"),
            (0 until 16).map(j => when(col(s"v$j") > 0, 1L << j).otherwise(0L))
              .reduce(_ + _).cast("long").as("simhash"))
      }.orderBy("doc_id")
    },

    // n-gram Jaccard on a doc subset: exact integer |A∩B| and |A∪B| per
    // pair (no float), via equality join of distinct 4-gram sets.
    "q_ngram_jaccard" -> QueryDef(
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 4) AS g
         |  FROM documents, generate_series(1, $MaxPos, 2) AS s(p)
         |  WHERE p <= length(text) - 3 AND doc_id < 40),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS nab
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i.a, i.b, CAST(i.nab AS BIGINT) AS jac_num,
         |  CAST(sa.n + sb.n - i.nab AS BIGINT) AS jac_den
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
         |WHERE i.nab * 4 >= sa.n + sb.n - i.nab
         |ORDER BY i.a, i.b""".stripMargin) { (s, dir) =>
      val grams = docs(s, dir).filter(col("doc_id") < 40 && length(col("text")) >= 4)
        .select(col("doc_id"), col("text"),
          // cap mirrors the oracle's generate_series(1, MaxPos, 2)
          explode(sequence(lit(1),
            least(length(col("text")) - 3, lit(MaxPos)), lit(2))).as("p"))
        .select(col("doc_id"), expr("substring(text, p, 4)").as("g"))
        .distinct()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = grams.select(col("doc_id").as("a"), col("g"))
        .join(grams.select(col("doc_id").as("b"), col("g")), "g")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      inter
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .filter(col("nab") * 4 >= col("na") + col("nb") - col("nab"))
        .select(col("a"), col("b"), col("nab").as("jac_num"),
          (col("na") + col("nb") - col("nab")).as("jac_den"))
        .orderBy("a", "b")
    },

    // The corpus-scale Jaccard form the audit table promises: exact
    // 4-gram |A∩B| / |A∪B| computed ONLY for banded MinHash candidate
    // pairs over the WHOLE corpus (q_ngram_jaccard's bounded-subset
    // equality join would go quadratic on hot grams), reported at the
    // same ≥1/4 threshold. Distinct-factored end to end: banding,
    // gram sets, and the Jaccard itself are text functions, so rep
    // pairs carry their (jac_num, jac_den) through the expansion and
    // intra pairs of identical texts are J = 1 (n, n) by construction.
    "q_ngram_jaccard_lsh" -> QueryDef(
      s"""WITH ${minhashPairsSql("documents")},
         |grams AS (
         |  SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 4) AS g
         |  FROM documents, generate_series(1, $MaxPos, 2) AS s2(p)
         |  WHERE p <= length(text) - 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT pr.a, pr.b, COUNT(*) AS nab
         |  FROM pairs pr
         |  JOIN grams ga ON ga.doc_id = pr.a
         |  JOIN grams gb ON gb.doc_id = pr.b AND gb.g = ga.g
         |  GROUP BY pr.a, pr.b)
         |SELECT i.a, i.b, CAST(i.nab AS BIGINT) AS jac_num,
         |  CAST(sa.n + sb.n - i.nab AS BIGINT) AS jac_den
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
         |WHERE i.nab * 4 >= sa.n + sb.n - i.nab
         |ORDER BY i.a, i.b""".stripMargin) { (s, dir) =>
      // served from the PERSISTED dedup store: every candidate pair was
      // stored WITH its exact 4-gram Jaccard at pair-emission time
      // ([[graft.etl.DedupState]] `gramsOf` — a pure function of the
      // two contents, priced once per pair ever), so the corpus report
      // is a READ of the pair index + the duplicate-group expansion.
      // No gram is shingled, joined, or intersected at query time —
      // the round-13 form re-read and re-intersected a gram store per
      // invocation, a measured 2× regression.
      val st = incrDedupState(s, dir)
      val members = st.members().select("doc_id", "k")
        .join(st.seenKeys().select("k", "rid"), "k")
        .select(col("rid"), col("doc_id").as("id"))
      val repJac = st.livePairStats()
        .filter(col("jac_num") * 4 >= col("jac_den"))
      // identical texts: A = B, so J = 1 exactly — (n, n) per
      // duplicate group whose content banded at all (the oracle's
      // intra pairs exist iff the content produced band buckets);
      // both the gram-set size and the banded-at-all gate come from
      // the store's per-rep summary (fsizes) — the band index itself
      // is never read here
      val nm = members.groupBy("rid").agg(count(lit(1)).as("nm"))
      val intraCarry = st.featSizes().filter(col("nb") > 0)
        .join(nm.filter(col("nm") >= 2), Seq("rid"), "left_semi")
        .select(col("rid"), col("n").as("jac_num"), col("n").as("jac_den"))
      expandPairs(members, repPairs = repJac, intraCarry = intraCarry)
        .orderBy("a", "b")
    },

    // LSH accuracy report: for every banded candidate pair, the
    // MinHash ESTIMATE (equal lanes / 16) against the EXACT shingle-set
    // Jaccard it estimates, with an integer milli-error — the
    // measure-don't-guess loop for tuning lanes/bands/threshold at
    // corpus scale. Reads the memoized signature matrix and candidate
    // graph; adds only the shingle-set intersection of candidate reps
    // (output-bounded). err_milli = |est − exact|·1000 truncated: the
    // numerator is non-negative, so Spark's `div` (toward zero) and
    // DuckDB's `//` (floor) agree.
    "q_minhash_acc" -> QueryDef({
      val nEqSql = (0 until NumHashes)
        .map(i => s"CASE WHEN ma.l$i = mb.l$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH g AS (
         |  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |${minhashPairsSql("g")},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
         |inter AS (
         |  SELECT p.a, p.b, COUNT(*) AS nab
         |  FROM pairs p
         |  JOIN shingles x ON x.doc_id = p.a
         |  JOIN shingles y ON y.doc_id = p.b AND y.sh = x.sh
         |  GROUP BY p.a, p.b),
         |eq AS (
         |  SELECT p.a, p.b, $nEqSql AS n_eq
         |  FROM pairs p JOIN mh ma ON ma.doc_id = p.a
         |  JOIN mh mb ON mb.doc_id = p.b)
         |SELECT e.a, e.b, CAST(e.n_eq AS BIGINT) AS n_eq,
         |  CAST(COALESCE(i.nab, 0) AS BIGINT) AS jac_num,
         |  CAST(sa.n + sb.n - COALESCE(i.nab, 0) AS BIGINT) AS jac_den,
         |  CAST(abs(e.n_eq * (sa.n + sb.n - COALESCE(i.nab, 0))
         |           - $NumHashes * COALESCE(i.nab, 0)) * 1000
         |    // ($NumHashes * (sa.n + sb.n - COALESCE(i.nab, 0))) AS BIGINT)
         |    AS err_milli
         |FROM eq e
         |LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
         |JOIN sizes sa ON sa.doc_id = e.a
         |JOIN sizes sb ON sb.doc_id = e.b
         |ORDER BY e.a, e.b""".stripMargin
    }) { (s, dir) =>
      val pairs = corpusBandPairs(s, dir)
      val sig = repSignatures(s, dir)
      val sa = sig.select(col("doc_id").as("a") +:
        (0 until NumHashes).map(i => col(s"l$i").as(s"la$i")): _*)
      val sb = sig.select(col("doc_id").as("b") +:
        (0 until NumHashes).map(i => col(s"l$i").as(s"lb$i")): _*)
      val nEq = (0 until NumHashes)
        .map(i => when(col(s"la$i") === col(s"lb$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      // exact shingle-set sizes/intersection priced for candidate reps
      // only (the same left-semi trim the corpus Jaccard uses)
      val needed = pairs.select(col("a").as("doc_id"))
        .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
      val sh = shinglesOf(distinctGroups(s, dir)
          .select(col("rid").as("doc_id"), col("text"))
          .join(needed, Seq("doc_id"), "left_semi"))
        .localCheckpoint()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh.select(col("doc_id").as("a"), col("sh")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
        .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val uni = col("na") + col("nb") - col("nab")
      pairs
        .join(sa, "a").join(sb, "b")
        .withColumn("n_eq", nEq)
        .join(inter, Seq("a", "b"), "left_outer")
        .na.fill(0L, Seq("nab"))
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"), col("n_eq"),
          col("nab").as("jac_num"), uni.as("jac_den"),
          expr(s"abs(n_eq * (na + nb - nab) - $NumHashes * nab) * 1000" +
            s" div ($NumHashes * (na + nb - nab))").as("err_milli"))
        .orderBy("a", "b")
    },

    // ---- Text analysis ------------------------------------------------

    // Language-ID: Cavnar-Trenkle character-trigram rank-order profiles
    // (graft.etl.LangId) trained on the labeled corpus and scored per
    // doc, reported as a predicted-vs-labeled confusion matrix. NOTE on
    // the fixture: `documents.lang` is statistically independent of the
    // synthetic text (no language-specific tokens exist), so accuracy
    // is chance-level by construction — the query exercises the real
    // classifier machinery (profile build, broadcast score join,
    // deterministic argmax) and LangIdSpec proves classification
    // quality on text that actually carries a signal.
    "q_lang_id" -> QueryDef(
      s"""WITH d AS (
         |  SELECT doc_id, lang, lower(text) AS t FROM documents
         |  WHERE length(text) >= 3),
         |grams AS (
         |  SELECT doc_id, lang, substr(t, CAST(p AS INTEGER), 3) AS g
         |  FROM d, generate_series(1, $LangIdMaxPos) AS s(p)
         |  WHERE p <= length(t) - 2),
         |prof AS (
         |  SELECT * FROM (
         |    SELECT lang AS plang, g,
         |      ROW_NUMBER() OVER (PARTITION BY lang
         |        ORDER BY COUNT(*) DESC, g ASC) AS rnk
         |    FROM grams WHERE doc_id % $LangIdTrainMod = 0
         |    GROUP BY lang, g)
         |  WHERE rnk <= $LangIdTopK),
         |dg AS (SELECT doc_id, g, COUNT(*) AS n FROM grams GROUP BY doc_id, g),
         |score AS (
         |  SELECT dg.doc_id, pr.plang,
         |    SUM(dg.n * (${LangIdTopK + 1} - pr.rnk)) AS s
         |  FROM dg JOIN prof pr ON dg.g = pr.g
         |  GROUP BY dg.doc_id, pr.plang),
         |pred AS (
         |  SELECT doc_id, plang AS pred FROM (
         |    SELECT doc_id, plang,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id
         |        ORDER BY s DESC, plang ASC) AS rn
         |    FROM score)
         |  WHERE rn = 1)
         |SELECT d.lang, COALESCE(p.pred, 'en') AS pred,
         |  CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM d LEFT JOIN pred p ON d.doc_id = p.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // training sampling is keyed by doc_id, so the SAMPLE comes from
      // the raw corpus — but within it, identical (text, lang) rows
      // contribute identical gram rows, so training too collapses to
      // distinct texts with multiplicity weights (exactly the
      // per-occurrence counts); SCORING is a pure function of the
      // text, so each DISTINCT text is scored once and the prediction
      // joins back by the content DIGEST (the text never rides a
      // shuffle as join key). On a duplicate-heavy corpus the ~200×
      // trigram explosion prices distinct content only, in both
      // passes (same confusion matrix either way; the oracle scores
      // per doc and hash-matches this). Train + score are memoized per
      // fixture ([[langPredictions]]) — the corpus's language labels
      // are computed once and every downstream consumer (sampling,
      // mixing, this confusion matrix) reads them.
      docs(s, dir).filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"), textKey.as("k"))
        .join(langPredictions(s, dir), Seq("k"), "left_outer")
        .groupBy(col("lang"), coalesce(col("pred"), lit("en")).as("pred"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred")
    },

    // Quality scoring: length/token/stopword features + a rule label.
    "q_text_quality" -> QueryDef {
      val stops = QualityStops.map(p => occSql("' ' || text || ' '", p)).mkString(" + ")
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  $tokenCountSql AS n_tokens,
         |  CAST($stops AS BIGINT) AS n_stop,
         |  CAST($stops AS DOUBLE) / $tokenCountSql AS stop_ratio,
         |  CASE WHEN $tokenCountSql >= $QualityMinTokens
         |        AND ($stops) * $QualityStopMult <= $tokenCountSql
         |       THEN 'keep' ELSE 'drop' END AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    } { (s, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      val stops = QualityStops.map(occurrences(padded, _)).reduce(_ + _)
      val toks = tokenCount(col("text"))
      docs(s, dir).select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          toks.as("n_tokens"),
          stops.as("n_stop"),
          (stops.cast("double") / toks).as("stop_ratio"),
          when(toks >= QualityMinTokens && stops * QualityStopMult <= toks,
            "keep").otherwise("drop").as("quality"))
        .orderBy("doc_id")
    },

    // Repetition-based quality filters (the Gopher/MassiveText rule
    // family, Rae et al. 2021 §A1.1): per doc the duplicate-word
    // fraction, most-common-word fraction and most-common-word-bigram
    // fraction, plus an INTEGER-arithmetic STRICTLY-EXCEEDS keep/drop
    // (a doc at exactly the threshold keeps, so short docs with top_w=1
    // cannot be dropped by rounding) so the verdict
    // can't drift across float formatting. Pure per-text function →
    // factored over distinct content ([[perDistinctText]], replication-
    // invariant like the dedup family); gram counting is explode →
    // groupBy keyed (doc, gram) — map-side combine, one shuffle, no
    // skew (the doc id is in the key), linear in corpus tokens.
    "q_quality_repetition" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '),
         |                             x -> length(x) > 0) AS w
         |  FROM documents),
         |base AS (SELECT doc_id, len(w) AS n, w FROM wl),
         |wrows AS (SELECT doc_id, n, unnest(w) AS word FROM base),
         |wc AS (SELECT doc_id, n, word, COUNT(*) AS c
         |       FROM wrows GROUP BY 1, 2, 3),
         |wstat AS (SELECT doc_id, n, COUNT(*) AS nd, MAX(c) AS top_w
         |          FROM wc GROUP BY 1, 2),
         |brows AS (
         |  SELECT doc_id, unnest(list_transform(range(1, n),
         |    i -> w[i] || ' ' || w[i + 1])) AS bg
         |  FROM base WHERE n >= 2),
         |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM brows GROUP BY 1, 2),
         |bstat AS (SELECT doc_id, MAX(c) AS top_bg FROM bc GROUP BY 1)
         |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_words,
         |  CAST(s.n - s.nd AS DOUBLE) / s.n AS dup_word_frac,
         |  CAST(s.top_w AS DOUBLE) / s.n AS top_word_frac,
         |  CAST(COALESCE(b.top_bg, 0) AS DOUBLE) / (s.n - 1) AS top_bigram_frac,
         |  CASE WHEN s.top_w * 5 > s.n OR (s.n - s.nd) * 2 > s.n
         |            OR COALESCE(b.top_bg, 0) * 4 > s.n - 1
         |       THEN 'drop' ELSE 'keep' END AS verdict
         |FROM wstat s LEFT JOIN bstat b USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      perDistinctText(s, dir) { reps =>
        // ONE pass over the tokenized corpus: words and bigrams explode
        // together as (kind, gram) rows — the text is split once and
        // never rescanned — then two doc-keyed aggregations and a
        // 2-value pivot replace the former word/bigram subplan pair
        // plus their join. sequence(1, 0) is [1, 0] (negative default
        // step), hence the n >= 2 guard inside the if().
        val grams = reps.select(col("doc_id"),
            expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .select(col("doc_id"), size(col("w")).as("n"), col("w"))
          .select(col("doc_id"), col("n"), explode(expr(
            "concat(transform(w, x -> struct(0 AS kind, x AS g)), " +
              "if(n >= 2, transform(sequence(1, n - 1), " +
              "i -> struct(1 AS kind, concat(element_at(w, i), ' ', " +
              "element_at(w, i + 1)) AS g)), " +
              "array()))")).as("t"))
          .select(col("doc_id"), col("n"),
            col("t.kind").as("kind"), col("t.g").as("g"))
        val pivoted = grams
          .groupBy("doc_id", "n", "kind", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "n", "kind")
          .agg(count(lit(1)).as("nd"), max("c").as("topc"))
          .groupBy("doc_id", "n").pivot("kind", Seq(0, 1))
          .agg(first("nd").as("nd"), first("topc").as("topc"))
        pivoted
          .select(col("doc_id"), col("n").cast("long").as("n_words"),
            ((col("n") - col("0_nd")).cast("double") / col("n"))
              .as("dup_word_frac"),
            (col("0_topc").cast("double") / col("n")).as("top_word_frac"),
            (coalesce(col("1_topc"), lit(0L)).cast("double") /
              (col("n") - 1)).as("top_bigram_frac"),
            when(col("0_topc") * 5 > col("n") ||
              (col("n") - col("0_nd")) * 2 > col("n") ||
              coalesce(col("1_topc"), lit(0L)) * 4 > col("n") - 1,
              "drop").otherwise("keep").as("verdict"))
      }.orderBy("doc_id")
    },

    // Token accounting per source (corpus-level budgeting).
    "q_token_count" -> QueryDef(
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM($tokenCountSql) AS BIGINT) AS total_tokens,
         |  CAST(MAX($tokenCountSql) AS BIGINT) AS max_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("total_tokens"),
          max(tokenCount(col("text"))).as("max_tokens"))
        .orderBy("source")
    },

    // BPE-ish subtoken accounting: greedy longest-match over letter
    // runs / single digits / single punctuation (the shape of a byte-
    // pair-encoded vocabulary's pretokenizer), vs whitespace words.
    // Plain character-class regex → identical semantics in Java regex
    // (Spark) and RE2 (DuckDB).
    "q_token_bpeish" -> QueryDef(
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_subtokens,
         |  $tokenCountSql AS n_words
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)"))
            .cast("long").as("n_subtokens"),
          tokenCount(col("text")).as("n_words"))
        .orderBy("doc_id")
    },

    // Rolling-hash fingerprint (Karp-Rabin): fp = Σ ord(c_i)·B^(n-i)
    // mod M over the first 2048 chars — the positional content hash a
    // shift-tolerant dedup layer keys on. Exact 64-bit integer
    // arithmetic on both sides (terms < 2.6e11, ≤2048 of them — no
    // overflow before the final mod).
    "q_fingerprint_roll" -> QueryDef(
      s"""WITH RECURSIVE powers(k, p) AS (
         |  SELECT 0, CAST(1 AS BIGINT)
         |  UNION ALL SELECT k + 1, (p * $RollB) % $RollM FROM powers WHERE k < ${MaxPos - 1}),
         |ch AS (
         |  SELECT doc_id, LEAST(length(text), $MaxPos) AS n, g.i AS i,
         |    ord(substr(text, CAST(g.i AS INTEGER), 1)) AS c
         |  FROM documents, generate_series(1, $MaxPos) AS g(i)
         |  WHERE g.i <= LEAST(length(text), $MaxPos))
         |SELECT ch.doc_id,
         |  CAST(SUM(ch.c * p.p) % $RollM AS BIGINT) AS fp_roll
         |FROM ch JOIN powers p ON p.k = ch.n - ch.i
         |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin) { (s, dir) =>
      // powers table precomputed driver-side and broadcast as a literal
      // array — no sequential dependency in the distributed plan; the
      // hash is a pure function of the text → computed once per
      // distinct text (the 2048-way explode prices distinct content)
      val powers = Array.iterate(1L, MaxPos)(p => p * RollB % RollM)
      val n = least(length(col("text")), lit(MaxPos))
      perDistinctText(s, dir) { reps =>
        reps
          // empty text: sequence(1, 0) is [1, 0] (negative default step)
          // and element_at(powers, 0) THROWS — omit the doc, exactly as
          // the oracle's WHERE g.i <= 0 does
          .filter(length(col("text")) >= 1)
          .select(col("doc_id"), col("text"), n.as("n"),
            explode(sequence(lit(1), n)).as("i"))
          .select(col("doc_id"),
            (ascii(expr("substring(text, i, 1)")).cast("long") *
              element_at(typedlit(powers), (col("n") - col("i") + 1).cast("int")))
              .as("term"))
          .groupBy("doc_id")
          .agg((sum("term") % RollM).as("fp_roll"))
      }.orderBy("doc_id")
    },

    // Document fingerprint: normalized-prefix content hash + length bucket.
    "q_fingerprint" -> QueryDef(
      s"""SELECT doc_id,
         |  md5(substr(replace(text, ' ', ''), 1, 64) ||
         |      ':' || CAST(length(text) // 64 AS VARCHAR)) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          md5(concat(
            substring(replace(col("text"), lit(" "), lit("")), 1, 64),
            lit(":"),
            TimeOpsFloorDiv(length(col("text")), 64).cast("string")).cast("binary")).as("fp"))
        .orderBy("doc_id")
    },

    // Winnowing fingerprint selection (the MOSS scheme): per 8-char
    // gram position a 32-bit hash; in every window of 8 consecutive
    // gram hashes select the minimum, rightmost occurrence winning
    // ties; the distinct selected set is the document's fingerprint
    // sketch, with the guarantee that any shared substring of length
    // ≥ w + k − 1 = 15 produces a shared selected hash. The rightmost
    // tie rule is ENCODED IN THE KEY — min(h·4096 + (4096 − p)) picks
    // the smallest hash and, among equals, the largest position — so
    // one windowed MIN does the whole selection (no argmin self-join;
    // at corpus scale a single per-doc ordered pass). Pure function of
    // text → priced once per distinct text; the oracle computes the
    // unfactored form, which re-keys to the same rows.
    "q_winnow" -> QueryDef(
      s"""WITH $winnowSelSql
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sel,
         |  CAST(COUNT(DISTINCT sel // 4096) AS BIGINT) AS n_fp,
         |  CAST(SUM(sel // 4096) AS BIGINT) AS fp_sum
         |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // reads the PERSISTED winnow store ([[winnowState]]) — the
      // selection scan is priced once per distinct text, ever
      perDistinctText(s, dir) { _ =>
        winnowSelSet(s, dir)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sel"),
            countDistinct(expr("sel div 4096")).as("n_fp"),
            sum(expr("sel div 4096")).as("fp_sum"))
      }.orderBy("doc_id")
    },

    // Winnowing MATCH step (the rest of the MOSS scheme): candidate
    // pairs = distinct texts sharing ≥ WinnowMinShared distinct
    // selected fingerprints. The guarantee makes this the substring-overlap
    // complement to MinHash banding: any shared run of ≥ 15 chars
    // forces a shared fingerprint, so long verbatim overlaps are
    // caught even when whole-document similarity is too low to band.
    // The fingerprint index is df-capped (a hash in > $WinnowDfCap
    // distinct texts is boilerplate — it dominates the join and
    // carries no pair signal, the ContamDfCap argument) so the
    // self-join is bounded by cap × index size. Rep-level report,
    // like q_minhash_acc.
    "q_winnow_pairs" -> QueryDef(
      s"""WITH g0 AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |${winnowSelSql.replace("FROM documents", "FROM g0")},
         |fp AS (SELECT DISTINCT doc_id, sel // 4096 AS f FROM sel),
         |keep AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) <= $WinnowDfCap),
         |fk AS (SELECT fp.doc_id, fp.f FROM fp JOIN keep ON keep.f = fp.f)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM fk a JOIN fk b ON a.f = b.f AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      // since round 14 a READ of the persisted winnow-match store
      // ([[winnowPairState]]): the df-capped fingerprint self-join ran
      // at fold time, its live provenance rows are the match counts —
      // no fingerprint index scan or self-join at query time
      winnowPairState(s, dir).livePairCounts()
        .filter(col("n_shared") >= WinnowMinShared)
        .orderBy("a", "b")
    },

    // FEDERATED winnowing match: the same report served from a
    // TWO-MEMBER federation store (doc_id-parity split, identical
    // content repped in both members) — q_winnow_pairs' oracle
    // VERBATIM, because the federation's distinct (canonical pair,
    // fingerprint) provenance rows are exactly the rows one store over
    // the union corpus holds (banding is pure content; the global df
    // cap counts distinct content). Third banding family proven on the
    // incremental federation mechanism.
    "q_winnow_fed" -> QueryDef(
      s"""WITH g0 AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |${winnowSelSql.replace("FROM documents", "FROM g0")},
         |fp AS (SELECT DISTINCT doc_id, sel // 4096 AS f FROM sel),
         |keep AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) <= $WinnowDfCap),
         |fk AS (SELECT fp.doc_id, fp.f FROM fp JOIN keep ON keep.f = fp.f)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM fk a JOIN fk b ON a.f = b.f AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      winnowFedState(s, dir).livePairCounts()
        .filter(col("n_shared") >= WinnowMinShared)
        .orderBy("a", "b")
    },

    // ---- Embedding similarity ----------------------------------------

    // L2 norms via exact fixed-point arithmetic (order-independent sums).
    "q_embed_norm" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings)
         |SELECT vec_id, sqrt(CAST(SUM(v * v) AS DOUBLE)) / $Scale AS norm
         |FROM sc GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
      emb(s, dir).select(col("vec_id"),
          (sqrt(graft.functions.FixedPointOps.fixedPointNormSq(col("embedding"))
            .cast("double")) / Scale).as("norm"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-k against one query vector — the exact
    // baseline an ANN index is graded against.
    "q_ann_topk" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings),
         |q AS (SELECT i, v AS qv FROM sc WHERE vec_id = 0),
         |dots AS (
         |  SELECT sc.vec_id, SUM(sc.v * q.qv) AS dot, SUM(sc.v * sc.v) AS nn
         |  FROM sc JOIN q ON sc.i = q.i GROUP BY sc.vec_id),
         |qn AS (SELECT nn AS qnn FROM dots WHERE vec_id = 0)
         |SELECT vec_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM dots, qn WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      // native codegen'd fixed-point dot (graft.functions.FixedPointDot):
      // same arithmetic as the oracle's scaled-int unnest/join, one fused
      // loop per row instead of interpreted lambdas + array allocs
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val base = emb(s, dir)
      val q = base.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
      base.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },

    // Sign-LSH bucketing over the first 8 dims — the scale path that
    // bounds ANN candidate sets; reported as a bucket histogram.
    "q_ann_lsh" -> QueryDef {
      val bitsSql = (0 until 8)
        .map(d => s"CASE WHEN embedding[${d + 1}] >= 0 THEN ${1 << d} ELSE 0 END")
        .mkString(" + ")
      s"""SELECT CAST($bitsSql AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS cnt, CAST(MIN(vec_id) AS BIGINT) AS first_vec
         |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin
    } { (s, dir) =>
      val bits = (0 until 8)
        .map(d => when(element_at(col("embedding"), d + 1) >= 0f, 1L << d).otherwise(0L))
        .reduce(_ + _)
      emb(s, dir).select(bits.cast("long").as("bucket"), col("vec_id"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), min("vec_id").as("first_vec"))
        .orderBy("bucket")
    },

    // Embedding-cosine near-duplicate pairs: banded RANDOM-HYPERPLANE
    // signatures (2 bands × 8 bits, deterministic LCG coefficients over
    // ALL 64 dims — computable bit-for-bit in SQL) gate the candidate
    // pairs, exact fixed-point cosine reranks, keep pairs above
    // threshold. Candidate volume scales as Σ bucket², tuned by bits
    // (SCALE.md) — never all-pairs.
    "q_dedup_embcos" -> QueryDef(embcosPairsOracleSql) { (s, dir) =>
      // Same factoring as q_dedup_minhash: signatures and cosines are
      // pure functions of the embedding, so LSH + rerank run on
      // distinct vectors and the full pair set expands afterwards —
      // cross pairs inherit their rep pair's exact fixed-point cosine,
      // intra pairs get the self-cosine computed by the IDENTICAL
      // formula (≈1.0 up to the same sqrt rounding the direct form
      // produces; a zero vector's NaN self-cosine is KEPT by
      // `NaN >= 0.2` under Spark's and DuckDB's shared NaN-greatest
      // ordering — consistently on both sides and in the oracle, so
      // the forms still agree row-for-row). Identical output, compute
      // ∝ distinct vectors + output (359 s → output-bound at the 100×
      // replica, SCALE.md). Keys are the raw array — codegen-hashed in
      // the exchange; see the note above replacing embKey.
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val g = embGroups(s, dir)
      val members = emb(s, dir).join(g, "embedding")
        .select(col("rid"), col("vec_id").as("id"))
      val repPairs = embCosPairs(s, dir)
      val selfCos = g.select(col("rid"),
          exactCosine(col("embedding"), col("embedding")).as("cos"))
        .filter(col("cos") >= 0.2)
      expandPairs(members, repPairs, selfCos).orderBy("a", "b")
    },

    // The FEDERATED form of the pair report: the rep-level pairs come
    // from the merged member stores ([[fedEmbCosPairs]] — member pair
    // attributes + cross-member candidates scored through the shared
    // admission threshold, mapped to canonical rep ids), and must
    // expand to exactly the rows the single-store report produces —
    // which serving q_dedup_embcos's oracle VERBATIM proves. The
    // expansion frames (membership, self-cosines) are pure corpus
    // functions shared with the single-store form; the federated
    // evidence is the pair set and its stored-dot cosines.
    "q_dedup_embcos_fed" -> QueryDef(embcosPairsOracleSql) { (s, dir) =>
      import graft.functions.FixedPointOps.exactCosine
      val g = embGroups(s, dir)
      val members = emb(s, dir).join(g, "embedding")
        .select(col("rid"), col("vec_id").as("id"))
      val selfCos = g.select(col("rid"),
          exactCosine(col("embedding"), col("embedding")).as("cos"))
        .filter(col("cos") >= 0.2)
      expandPairs(members, fedEmbCosPairs(s, dir), selfCos)
        .orderBy("a", "b")
    },

    // The duplicate-heavy-corpus form of embedding dedup: collapse
    // bit-identical embeddings to one representative (min vec_id) with
    // a multiplicity FIRST, then run the same banded LSH + exact rerank
    // over representatives only. Pair-emission over the raw corpus is
    // OUTPUT-bound — k identical copies of a vector contribute k²/2
    // pairs, so a replicated/crawled corpus makes q_dedup_embcos
    // quadratic in duplication (measured: 359 s at 100× vs 4.6 s at
    // 10×, SCALE.md round-7) while this form stays linear: the LSH join
    // sees each distinct vector once and multiplicities ride along as
    // counts.
    "q_dedup_embcos_rep" -> QueryDef(
      s"""WITH g AS (
         |  SELECT MIN(vec_id) AS vec_id, COUNT(*) AS n, embedding
         |  FROM embeddings GROUP BY embedding),
         |${embcosPairsSql("g")}
         |SELECT c.a, c.b, c.cos, ga.n AS na, gb.n AS nb
         |FROM cpairs c
         |JOIN g ga ON ga.vec_id = c.a JOIN g gb ON gb.vec_id = c.b
         |WHERE c.cos >= 0.2
         |ORDER BY c.a, c.b""".stripMargin) { (s, dir) =>
      val g = embGroups(s, dir)
      embCosPairs(s, dir)
        .join(g.select(col("rid").as("a"), col("n").as("na")), "a")
        .join(g.select(col("rid").as("b"), col("n").as("nb")), "b")
        .select("a", "b", "cos", "na", "nb").orderBy("a", "b")
    },

    // Embedding-cosine dedup CLUSTERING — the action an embedding
    // near-dup pipeline executes, symmetric with q_dedup_cluster on
    // the text side: connected components over the thresholded cosine
    // candidate graph (reps = distinct embeddings), every vector
    // labeled (cluster = min vec_id reachable, is_canonical).
    // Identical-embedding members inherit their rep's component;
    // vectors in no surviving pair are their own singleton. Reads the
    // fixture-memoized groups + candidate graph; the oracle reproduces
    // the fixpoint with a recursive CTE over the same banded pipeline.
    "q_embcos_cluster" -> QueryDef(embcosClusterOracleSql) { (s, dir) =>
      embClusters(s, dir)
        .withColumn("is_canonical",
          (col("vec_id") === col("cluster")).cast("long"))
        .orderBy("vec_id")
    },

    // The FEDERATED form: two member stores (vec_id parity split),
    // merged with cross-member pairs scored from the members' feats
    // indexes through the shared cosine-threshold admission predicate
    // ([[fedEmbClusters]]). Served under q_embcos_cluster's oracle
    // VERBATIM — labels included — because the merge's canonical rep
    // (global min rid per content) and CC labels (min reachable) are
    // exactly the single-store definitions. This is the thresholded
    // counterpart of q_dedup_fed: there, bucket co-membership IS the
    // edge; here the merge must also reproduce the admission decision
    // across members.
    "q_embcos_fed" -> QueryDef(embcosClusterOracleSql) { (s, dir) =>
      fedEmbClusters(s, dir)
        .select(col("doc_id").as("vec_id"), col("cluster"))
        .withColumn("is_canonical",
          (col("vec_id") === col("cluster")).cast("long"))
        .orderBy("vec_id")
    },

    // IVF-style two-stage ANN: coarse quantization to a RANDOM-
    // HYPERPLANE bucket (8 deterministic hash-derived planes over all 64
    // dims — not fixed sign bits of a dim prefix), probe the query's
    // bucket plus Hamming-distance-1 neighbors, exact cosine rerank only
    // on those candidates. Candidate fraction ≈ (1+bits)/2^bits; `bits`
    // is the corpus-scale knob (SCALE.md).
    "q_ann_ivf" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings),
         |${hyperplaneSql(nPlanes = 8)},
         |bk AS (
         |  SELECT vec_id,
         |    SUM(CASE WHEN b = 1
         |        THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS bucket
         |  FROM bits GROUP BY vec_id),
         |qb AS (SELECT bucket AS qbucket FROM bk WHERE vec_id = 0),
         |cand AS (
         |  SELECT bk.vec_id FROM bk, qb
         |  WHERE bk.vec_id <> 0 AND bit_count(xor(bk.bucket, qb.qbucket)) <= 1),
         |q AS (SELECT i, v AS qv FROM sc WHERE vec_id = 0),
         |dots AS (
         |  SELECT sc.vec_id, SUM(sc.v * q.qv) AS dot, SUM(sc.v * sc.v) AS nn
         |  FROM sc JOIN q ON sc.i = q.i
         |  WHERE sc.vec_id IN (SELECT vec_id FROM cand) OR sc.vec_id = 0
         |  GROUP BY sc.vec_id),
         |qn AS (SELECT nn AS qnn FROM dots WHERE vec_id = 0)
         |SELECT vec_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM dots, qn WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val base = emb(s, dir).withColumn("bucket",
        graft.etl.Similarity.hyperplaneBucket(col("embedding"), bits = 8, dim = 64))
      val qrow = base.filter(col("vec_id") === 0)
        .select(col("bucket").as("qbucket"), col("embedding").as("qemb"))
      base.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qrow))
        .filter(expr("bit_count(bucket ^ qbucket) <= 1"))
        .select(col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(5)
    },

    // SemDeDup (semantic dedup, Abbas et al. 2023 shape): spherical
    // k-means coarse-clusters the embeddings, then near-duplicate
    // pruning runs WITHIN each cluster only — the all-pairs cosine
    // that is quadratic in the corpus becomes quadratic in a bounded
    // cluster size (k is the scale knob). Complements the LSH dedup
    // family: k-means groups by global geometry, so semantically-close
    // pairs that land in different LSH buckets still meet; pairs split
    // across cluster boundaries are the documented recall trade every
    // SemDeDup deployment makes. Keep rule: a vector is dropped iff a
    // SMALLER-id member of its cluster sits within the cosine bar
    // (deterministic greedy keep-first; the oracle's NOT isnan guard
    // documents that a degenerate NaN cosine could never mark a
    // duplicate — the engine side rejects zero-norm vectors outright
    // under ANSI division).
    // Training (two Lloyd passes) is fixture-memoized like the SQ8
    // codes; the oracle unrolls the identical passes in SQL.
    "q_semdedup" -> QueryDef(
      s"""WITH $kmeansSql,
         |pairs AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM a2 x JOIN a2 y
         |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         |pd AS (
         |  SELECT pairs.a, pairs.b, SUM(sa.v * sb.v) AS dot
         |  FROM pairs
         |  JOIN sc sa ON sa.vec_id = pairs.a
         |  JOIN sc sb ON sb.vec_id = pairs.b AND sb.i = sa.i
         |  GROUP BY pairs.a, pairs.b),
         |pc AS (
         |  SELECT pd.b,
         |    CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
         |  FROM pd
         |  JOIN norms na ON na.vec_id = pd.a
         |  JOIN norms nb ON nb.vec_id = pd.b),
         |dropped AS (
         |  SELECT DISTINCT b FROM pc
         |  WHERE cos >= $SemDedupTau AND NOT isnan(cos))
         |SELECT a2.vec_id, a2.cluster,
         |  a2.vec_id NOT IN (SELECT b FROM dropped) AS kept
         |FROM a2 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // Factored over DISTINCT embeddings (the oracle specifies the
      // direct per-vector rule; this computes the identical booleans):
      // assignment and pairwise cosines are pure functions of the
      // embedding, so the within-cluster pairing runs over group REPS
      // and per-member verdicts follow by algebra —
      //   drop(v ∈ g) ⟺ (selfCos(g) ≥ τ ∧ v > rid_g)          [in-group
      //     peer: rid_g < v and identical-vector cosine]
      //       ∨ (min{rid_g' : repCos(g,g') ≥ τ, same cluster} < v)
      //     [cross-group peer: g' has a member < v iff its min does]
      // A duplicate-heavy corpus pays the quadratic-in-cluster-size
      // stage once per DISTINCT vector (replica-invariant, like the
      // rest of the dedup family); cluster size stays the k knob.
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val cents = kmeansCentroids(s, dir)
      val g = embGroups(s, dir)
      val reps = g.select(col("rid"), col("embedding"),
        graft.etl.KMeans.assign(col("embedding"), cents).as("cluster"))
      val selfCos = exactCosine(col("embedding"), col("embedding"))
      val pairCos = exactCosine(col("ea"), col("eb"))
      val adjMin = reps
        .select(col("cluster"), col("rid").as("ra"), col("embedding").as("ea"))
        .join(reps.select(col("cluster"), col("rid").as("rb"),
          col("embedding").as("eb")), "cluster")
        .filter(col("ra") =!= col("rb"))
        .select(col("ra"), col("rb"), pairCos.as("cos"))
        .filter(col("cos") >= SemDedupTau && !isnan(col("cos")))
        .groupBy("ra").agg(min("rb").as("adjmin"))
        .withColumnRenamed("ra", "rid")
      val flags = reps
        .select(col("rid"), col("cluster"),
          (selfCos >= SemDedupTau && !isnan(selfCos)).as("selfdup"))
        .join(adjMin, Seq("rid"), "left_outer")
      emb(s, dir).join(g.select("embedding", "rid"), "embedding")
        .select(col("rid"), col("vec_id"))
        .join(flags, "rid")
        .select(col("vec_id"), col("cluster"),
          not((col("selfdup") && col("vec_id") > col("rid")) ||
            (col("adjmin").isNotNull && col("adjmin") < col("vec_id")))
            .as("kept"))
        .orderBy("vec_id")
    },

    // k-means IVF ANN — the real IVF structure (centroid lists, not
    // hyperplane buckets): probe the query's nearest `KmIvfProbes`
    // centroids, exact-rerank only their member lists. Candidate cost
    // = probes/k of the corpus ON AVERAGE but adapts to geometry
    // (dense regions get dense lists), vs the hyperplane variant's
    // fixed bucket fractions. Reads the fixture-memoized trained
    // centroids + assignment; probe selection stays in-frame (an
    // 8-row sort), never a driver-side argmax over data.
    "q_ann_kmivf" -> QueryDef(
      s"""WITH $kmeansSql,
         |probe AS (
         |  SELECT cluster FROM (
         |    SELECT cluster,
         |      ROW_NUMBER() OVER (ORDER BY cos DESC, cluster) AS rn
         |    FROM s1 WHERE vec_id = 0) t
         |  WHERE rn <= $KmIvfProbes),
         |cand AS (
         |  SELECT a2.vec_id FROM a2
         |  JOIN probe ON probe.cluster = a2.cluster
         |  WHERE a2.vec_id <> 0),
         |qv AS (SELECT i, v FROM sc WHERE vec_id = 0),
         |cd AS (
         |  SELECT sc.vec_id, SUM(sc.v * qv.v) AS dot
         |  FROM sc JOIN qv ON qv.i = sc.i
         |  WHERE sc.vec_id IN (SELECT vec_id FROM cand)
         |  GROUP BY sc.vec_id),
         |qn AS (SELECT nn AS qnn FROM norms WHERE vec_id = 0)
         |SELECT cd.vec_id,
         |  CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM cd JOIN norms ON norms.vec_id = cd.vec_id, qn
         |ORDER BY cos DESC, cd.vec_id LIMIT $KmIvfTopK""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val cents = kmeansCentroids(s, dir)
      val qf = emb(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qemb"))
      val probe = qf.select(explode(array(cents.map(c =>
          struct(graft.etl.KMeans.cosineTo(col("qemb"), c).as("cos"),
            lit(c.id).as("cluster"))): _*)).as("p"))
        .select(col("p.cos").as("cos"), col("p.cluster").as("cluster"))
        .orderBy(col("cos").desc, col("cluster"))
        .limit(KmIvfProbes)
        .select("cluster")
      kmeansAssignments(s, dir)
        .join(broadcast(probe), "cluster")
        .filter(col("vec_id") =!= 0)
        .join(emb(s, dir).select("vec_id", "embedding"), "vec_id")
        .crossJoin(broadcast(qf))
        .select(col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(KmIvfTopK)
    },

    // IVF recall report — the measure-don't-guess loop for the k-means
    // coarse quantizer (the analog of q_minhash_acc for banding): for a
    // deterministic probe set of query vectors, what fraction of the
    // EXACT cosine top-10 lives inside the nprobe nearest centroids'
    // cells, per nprobe? This is candidate recall — the rerank is exact
    // cosine, so reachability is the only loss an IVF probe introduces.
    // Ground truth (|queries| brute passes) is an EVAL-ONLY cost: the
    // serving path stays q_ann_kmivf's probe-then-rerank. Shares the
    // memoized centroids/assignments with every other IVF consumer.
    "q_ann_recall" -> QueryDef(
      s"""WITH $kmeansSql,
         |qs AS (SELECT vec_id AS qid FROM embeddings
         |       WHERE vec_id % $RecallQueryMod = 0
         |         AND vec_id < $RecallQueryCap),
         |cr AS (
         |  SELECT s1.vec_id AS qid, s1.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY s1.vec_id
         |      ORDER BY cos DESC, cluster) AS crn
         |  FROM s1 JOIN qs ON qs.qid = s1.vec_id),
         |qd AS (
         |  SELECT q.vec_id AS qid, sc.vec_id, SUM(sc.v * q.v) AS dot
         |  FROM sc JOIN sc q ON q.i = sc.i
         |  JOIN qs ON qs.qid = q.vec_id
         |  WHERE sc.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, sc.vec_id),
         |gt AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qd.qid, qd.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qd.qid ORDER BY
         |        CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE))
         |          * sqrt(CAST(n2.nn AS DOUBLE))) DESC, qd.vec_id) AS rn
         |    FROM qd
         |    JOIN norms n1 ON n1.vec_id = qd.qid
         |    JOIN norms n2 ON n2.vec_id = qd.vec_id) t
         |  WHERE rn <= $RecallK),
         |np AS (SELECT unnest([1, 2, 4]) AS nprobe),
         |hit AS (
         |  SELECT np.nprobe,
         |    CASE WHEN cr.crn <= np.nprobe THEN 1 ELSE 0 END AS hit
         |  FROM gt
         |  JOIN a2 ON a2.vec_id = gt.vec_id
         |  JOIN cr ON cr.qid = gt.qid AND cr.cluster = a2.cluster
         |  CROSS JOIN np)
         |SELECT CAST(nprobe AS BIGINT) AS nprobe,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(hit) AS BIGINT) AS hits,
         |  CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall
         |FROM hit GROUP BY nprobe ORDER BY nprobe""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.exactCosine
      import s.implicits._
      val cents = kmeansCentroids(s, dir)
      val qs = emb(s, dir)
        .filter(col("vec_id") % RecallQueryMod === 0 &&
          col("vec_id") < RecallQueryCap)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      // centroid rank per query: K centroids broadcast as literals
      val cr = qs.select(col("qid"), explode(array(cents.map(c =>
          struct(graft.etl.KMeans.cosineTo(col("qemb"), c).as("cos"),
            lit(c.id).as("cluster"))): _*)).as("p"))
        .select(col("qid"), col("p.cluster").as("cluster"),
          col("p.cos").as("cos"))
        .withColumn("crn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("cluster"))))
        .select("qid", "cluster", "crn")
      // exact ground truth per query (broadcast the tiny query frame)
      val gt = emb(s, dir).select(col("vec_id"), col("embedding"))
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= RecallK)
        .select("qid", "vec_id")
      val np = Seq(1L, 2L, 4L).toDF("nprobe")
      gt.join(kmeansAssignments(s, dir), "vec_id")
        .join(cr, Seq("qid", "cluster"))
        .crossJoin(broadcast(np))
        .select(col("nprobe"),
          when(col("crn") <= col("nprobe"), 1L).otherwise(0L).as("hit"))
        .groupBy("nprobe")
        .agg(count(lit(1)).as("n_pairs"), sum("hit").as("hits"))
        .select(col("nprobe"), col("n_pairs"), col("hits"),
          (col("hits").cast("double") / col("n_pairs")).as("recall"))
        .orderBy("nprobe")
    },

    // ---- Retrieval, corpus statistics & training export ---------------

    // BM25 keyword retrieval (Robertson-Spärck Jones): the quality-
    // ranking primitive a data pipeline uses to score documents against
    // a probe query (e.g. "educational value" seed terms). idf is the
    // raw Robertson ratio (N - df + 0.5)/(df + 0.5) rather than its
    // log: per term this is a monotone (rank-preserving) function of
    // df — always positive, like Lucene's shifted idf — but the
    // MULTI-term sum is a different aggregate than log-idf BM25, so
    // near-ties between docs matching different term subsets can order
    // differently than textbook BM25 (a doc heavy in common probe
    // terms is rewarded more). That is the deliberate trade for
    // engine-exact arithmetic: every op here is exact-rounded IEEE
    // (+,-,*,/), where libm log's last ulp is engine-dependent and
    // would break the bit-level oracle. Term frequencies come from the
    // replace-length trick — a pure SCAN, no tokenize/explode/shuffle;
    // the corpus statistics (N, avgdl, df per term) reduce to ONE row
    // that cross-joins back broadcast, so the whole query is scan →
    // broadcast → project → top-k: at 100 TB it reads the corpus
    // exactly twice (once for stats, once for scoring) and shuffles
    // only the k winners.
    "q_bm25" -> QueryDef {
      val tfSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"    ${occSql("' ' || text || ' '", s" $t ")} AS tf$i" }.mkString(",\n")
      // CAST(tf AS DOUBLE) everywhere tf meets a fractional literal:
      // DuckDB types 2.2 as DECIMAL and BIGINT*DECIMAL stays exact
      // decimal — a DIFFERENT number than Spark's fl(tf)·fl(2.2)
      // double product (bit-divergent in ~1/3 of probed inputs).
      // Forcing the operand to DOUBLE makes both engines evaluate the
      // identical IEEE expression tree.
      val scoreSql = Bm25Terms.indices.map { i =>
        s"(n - df$i + 0.5) / (df$i + 0.5) * (CAST(tf$i AS DOUBLE) * 2.2) / " +
          s"(CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))" }.mkString("\n  + ")
      val dfSql = Bm25Terms.indices.map { i =>
        s"    CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i" }
        .mkString(",\n")
      s"""WITH d AS (
         |  SELECT doc_id, $tokenCountSql AS dl,
         |$tfSql
         |  FROM documents),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         |$dfSql
         |  FROM d)
         |SELECT doc_id,
         |  CAST(${Bm25Terms.indices.map(i => s"tf$i").mkString(" + ")} AS BIGINT) AS hits,
         |  $scoreSql AS score
         |FROM d, st
         |WHERE ${Bm25Terms.indices.map(i => s"tf$i").mkString(" + ")} > 0
         |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    } { (s, dir) =>
      // factored over distinct content: tf and dl are pure functions
      // of the text, so the occurrence scans run once per distinct
      // text; the corpus statistics carry multiplicity as integer
      // weights (N = Σ nm, Σdl = Σ nm·dl, df = Σ nm over texts with
      // tf>0 — integer sums, exactly the direct per-doc values) and
      // each doc inherits its rep's score through the digest re-key.
      // A duplicate-heavy corpus pays the scan for distinct content
      // only (the 100× replica measured 21 s direct).
      val padded = concat(lit(" "), col("text"), lit(" "))
      val g = distinctGroups(s, dir)
      val reps = g.select(
        col("rid") +: col("nm") +: tokenCount(col("text")).as("dl") +:
          Bm25Terms.zipWithIndex.map { case (t, i) =>
            occurrences(padded, s" $t ").as(s"tf$i") }: _*)
      val stAggs =
        sum("nm").cast("double").as("n") +:
          (sum(col("nm") * col("dl")).cast("double") / sum("nm")).as("avgdl") +:
          Bm25Terms.indices.map { i =>
            sum(when(col(s"tf$i") > 0, col("nm")).otherwise(0L))
              .cast("double").as(s"df$i")
          }
      val st = reps.agg(stAggs.head, stAggs.tail: _*)
      val score = Bm25Terms.indices.map { i =>
        (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) *
          (col(s"tf$i") * 2.2) /
          (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      val hits = Bm25Terms.indices.map(i => col(s"tf$i")).reduce(_ + _)
      perDistinctText(s, dir) { r =>
        val pad2 = concat(lit(" "), col("text"), lit(" "))
        r.select(
            col("doc_id") +: tokenCount(col("text")).as("dl") +:
              Bm25Terms.zipWithIndex.map { case (t, i) =>
                occurrences(pad2, s" $t ").as(s"tf$i") }: _*)
          .crossJoin(broadcast(st))
          .filter(hits > 0)
          .select(col("doc_id"), hits.cast("long").as("hits"),
            score.as("score"))
      }
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Bm25TopK)
    },

    // TF-IDF characteristic terms per source — the per-subcorpus
    // signature report a mixing pipeline reads when weighting sources.
    // idf here is the SHIFTED ratio (#sources - df)/df: like log idf
    // it is ZERO for corpus-wide terms — a stopword present in every
    // source can never top a source's signature, which the raw
    // #sources/df ratio got wrong (a high-tf universal term would
    // outrank a source-exclusive one) — and it stays inside exact-
    // rounded IEEE arithmetic, which libm log would not. tf aggregates
    // with map-side combine keyed (source, term); df is vocabulary-
    // bounded so its join side broadcasts; the rank window partitions
    // by source — no single-partition stage anywhere.
    "q_tfidf_source" -> QueryDef(
      s"""WITH w AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '),
         |                                    x -> length(x) > 0)) AS word
         |  FROM documents),
         |tf AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM w GROUP BY 1, 2),
         |df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |ns AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS s FROM documents)
         |SELECT source, rank, word, tf, df, score FROM (
         |  SELECT tf.source, tf.word, tf.tf, df.df,
         |    tf.tf * (ns.s - df.df) / df.df AS score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.source
         |      ORDER BY tf.tf * (ns.s - df.df) / df.df DESC, tf.word ASC) AS BIGINT) AS rank
         |  FROM tf JOIN df USING (word), ns)
         |WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin) { (s, dir) =>
      // factored over distinct content: the tokenize/explode runs once
      // per distinct text (the SHARED memoized unigram frame —
      // [[repWordCounts]]); per-(rep, source) multiplicities (tiny — a
      // crawled duplicate keeps its source) re-weight the per-rep word
      // counts into the exact per-source tf (tf = Σ m·c, an integer
      // sum equal to the direct per-occurrence count). The 100×
      // duplication replica measured 15.3 s direct; the factored form
      // explodes 1% of the rows.
      val g = distinctGroups(s, dir)
      val repWords = repWordCounts(s, dir).select("rid", "word", "c")
      val srcMult = docs(s, dir).select(textKey.as("k"), col("source"))
        .join(g.select("k", "rid"), "k")
        .groupBy("rid", "source").agg(count(lit(1)).as("m"))
      val tf = repWords.join(srcMult, "rid")
        .groupBy("source", "word").agg(sum(col("m") * col("c")).as("tf"))
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val ns = docs(s, dir).agg(countDistinct("source").cast("double").as("s"))
      val score = col("tf") * (col("s") - col("df")) / col("df")
      val rankW = Window.partitionBy("source")
        .orderBy(score.desc, col("word").asc)
      tf.join(broadcast(df), "word").crossJoin(broadcast(ns))
        .withColumn("score", score)
        .withColumn("rank", row_number().over(rankW).cast("long"))
        .filter(col("rank") <= 5)
        .select("source", "rank", "word", "tf", "df", "score")
        .orderBy("source", "rank")
    },

    // N-gram diversity per source — distinct-trigram ratio, the
    // standard template-and-boilerplate signal a mixing decision reads
    // next to the repetition filters (a low ratio flags a source whose
    // documents recombine the same phrases). Factored over distinct
    // content like q_tfidf_source: trigrams explode once per distinct
    // text; occurrence totals re-weight by the per-(rep, source)
    // multiplicities (Σ m·c ≡ the direct count) while the distinct
    // count is multiplicity-free by definition. Exact integers + one
    // IEEE division.
    "q_ngram_diversity" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT source, list_filter(string_split(text, ' '),
         |                             x -> length(x) > 0) AS w
         |  FROM documents),
         |base AS (SELECT source, len(w) AS n, w FROM wl),
         |g AS (
         |  SELECT source, unnest(list_transform(range(1, n - 1),
         |    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
         |  FROM base WHERE n >= 3),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
         |  FROM g GROUP BY 1)
         |SELECT source, n_grams, n_distinct,
         |  CAST(n_distinct AS DOUBLE) / n_grams AS distinct_ratio
         |FROM agg ORDER BY source""".stripMargin) { (s, dir) =>
      val srcMult = docs(s, dir).select(textKey.as("k"), col("source"))
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        .groupBy("rid", "source").agg(count(lit(1)).as("m"))
      repTriGrams(s, dir).join(srcMult, "rid")
        .groupBy("source")
        .agg(sum(col("m") * col("c")).as("n_grams"),
          countDistinct("gram").as("n_distinct"))
        .select(col("source"), col("n_grams"), col("n_distinct"),
          (col("n_distinct").cast("double") / col("n_grams")).as("distinct_ratio"))
        .orderBy("source")
    },

    // Vocabulary coverage (Zipf report): top-K terms by corpus
    // frequency with the cumulative fraction of all token occurrences
    // they cover — the curve a BPE vocab-size decision reads. The
    // frequency table is vocabulary-bounded; the global top-K is a
    // distributed TakeOrdered (orderBy + limit), and only the K
    // winners enter the single-partition rank/cumsum window. ROWS
    // framing (not RANGE) keeps the running sum per-row under cnt
    // ties on both engines.
    "q_vocab_coverage" -> QueryDef(
      s"""WITH w AS (
         |  SELECT unnest(list_filter(string_split(text, ' '),
         |                            x -> length(x) > 0)) AS word
         |  FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c),
         |top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word ASC LIMIT $VocabTopK),
         |r AS (
         |  SELECT word, cnt,
         |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT) AS rank,
         |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
         |  FROM top)
         |SELECT rank, word, cnt, cum_cnt, cum_cnt / tot AS coverage
         |FROM r, tot ORDER BY rank""".stripMargin) { (s, dir) =>
      // factored over distinct content: the corpus frequency table is
      // Σ nm·c over the SHARED memoized unigram frame — an integer sum
      // identical to the direct per-occurrence count — so the explode
      // prices distinct content only, once per corpus (9.5 s direct at
      // the 100× duplication replica).
      val c = repWordCounts(s, dir)
        .groupBy("word").agg(sum(col("nm") * col("c")).as("cnt"))
      val tot = c.agg(sum("cnt").cast("double").as("tot"))
      val top = c.orderBy(col("cnt").desc, col("word").asc).limit(VocabTopK)
      val ord = Window.orderBy(col("cnt").desc, col("word").asc)
      top
        .withColumn("rank", row_number().over(ord).cast("long"))
        .withColumn("cum_cnt", sum("cnt")
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("word"), col("cnt"), col("cum_cnt"),
          (col("cum_cnt") / col("tot")).as("coverage"))
        .orderBy("rank")
    },

    // BPE tokenizer training, merge step 1: count adjacent character
    // pairs across the corpus and rank the merge candidates — the
    // primitive a BPE trainer iterates (each round merges the top pair
    // and recounts). The corpus-sized pass is the word-frequency count
    // (distinct-content-factored like q_vocab_coverage); the pair
    // explode then runs over the DISTINCT VOCABULARY only — bounded by
    // vocabulary size × word length, microscopic next to a 100 TB
    // corpus — with each pair weighted by its word's corpus frequency.
    // Exact integer counts; rank ties break on the pair string.
    "q_bpe_merges" -> QueryDef(
      s"""WITH w AS (
         |  SELECT unnest(list_filter(string_split(text, ' '),
         |                            x -> length(x) > 0)) AS word
         |  FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |p AS (
         |  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, cnt
         |  FROM c, generate_series(1, $MaxWordLen - 1) AS g(i)
         |  WHERE i <= length(word) - 1),
         |m AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM p GROUP BY 1),
         |top AS (SELECT pair, cnt FROM m ORDER BY cnt DESC, pair ASC LIMIT $BpeTopK)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank,
         |  pair, cnt
         |FROM top ORDER BY rank""".stripMargin) { (s, dir) =>
      val c = repWordCounts(s, dir)
        .groupBy("word").agg(sum(col("nm") * col("c")).as("cnt"))
      // guard length ≥ 2 BEFORE the sequence: Spark's sequence(1, 0)
      // yields a DESCENDING [1, 0], not the empty series DuckDB emits;
      // the MaxWordLen cap matches the oracle's fixed series bound
      val pairs = c.filter(length(col("word")) >= 2)
        .select(col("word"), col("cnt"),
          explode(sequence(lit(1),
            least(length(col("word")) - 1, lit(MaxWordLen - 1)))).as("i"))
        .select(expr("substring(word, i, 2)").as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("cnt"))
      val ord = Window.orderBy(col("cnt").desc, col("pair").asc)
      pairs.orderBy(col("cnt").desc, col("pair").asc).limit(BpeTopK)
        .withColumn("rank", row_number().over(ord).cast("long"))
        .select("rank", "pair", "cnt").orderBy("rank")
    },

    // Per-source token-length decile table — the length-distribution
    // report batch/packing planning reads (sequence budget sizing,
    // truncation-rate estimates). NTILE over (toks, doc_id) is
    // deterministic on both engines (same remainder-to-first-buckets
    // rule, total order); all aggregates are exact integers. One
    // shuffle (the per-source window sort) + one aggregate; at corpus
    // scale an exact decile table per source is a sorted pass — the
    // same cost profile as q_pack's shard windows.
    "q_len_deciles" -> QueryDef(
      s"""WITH d AS (
         |  SELECT source, doc_id, $tokenCountSql AS toks FROM documents),
         |n AS (
         |  SELECT source, toks,
         |    CAST(NTILE($LenNtiles) OVER (PARTITION BY source
         |      ORDER BY toks, doc_id) AS BIGINT) AS decile
         |  FROM d)
         |SELECT source, decile, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(toks) AS BIGINT) AS min_toks,
         |  CAST(MAX(toks) AS BIGINT) AS max_toks,
         |  CAST(SUM(toks) AS BIGINT) AS sum_toks
         |FROM n GROUP BY source, decile
         |ORDER BY source, decile""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy(col("toks"), col("doc_id"))
      docs(s, dir)
        .select(col("source"), col("doc_id"), tokenCount(col("text")).as("toks"))
        .withColumn("decile", ntile(LenNtiles).over(w).cast("long"))
        .groupBy("source", "decile")
        .agg(count(lit(1)).as("n"), min("toks").as("min_toks"),
          max("toks").as("max_toks"), sum("toks").as("sum_toks"))
        .orderBy("source", "decile")
    },

    // Context-window chunking: 256-char windows at stride 192 (64-char
    // overlap) with per-chunk content digests — the splitter that
    // turns documents into model-context-sized training/RAG pieces.
    // Pure function of the text → factored over distinct content
    // ([[perDistinctText]]): a duplicate-heavy corpus chunks each
    // distinct text once. Output-bounded (≈ len/stride chunks per
    // doc); no shuffle beyond the digest re-key join.
    "q_chunk" -> QueryDef(
      s"""SELECT doc_id,
         |  CAST((p - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(length(substr(text, CAST(p AS INTEGER), $ChunkLen)) AS BIGINT) AS n_chars,
         |  md5(substr(text, CAST(p AS INTEGER), $ChunkLen)) AS h
         |FROM documents, generate_series(1, $MaxPos, $ChunkStride) AS g(p)
         |WHERE p <= length(text)
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      perDistinctText(s, dir) { reps =>
        val chunk = expr(s"substring(text, p, $ChunkLen)")
        reps.filter(length(col("text")) >= 1)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), least(length(col("text")), lit(MaxPos)),
              lit(ChunkStride))).as("p"))
          .select(col("doc_id"),
            TimeOpsFloorDiv(col("p") - 1, ChunkStride).as("chunk_idx"),
            length(chunk).cast("long").as("n_chars"),
            md5(chunk.cast("binary")).as("h"))
      }.orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing for training export: documents are dealt into
    // deterministic shards (doc_id mod), concatenated in doc_id order,
    // and cut into fixed token-budget sequences — the GPT-style "pack
    // then slice every 2048 tokens" export, reported per packed
    // sequence. The only shuffle is the shard partition; the running
    // offset is a window cumsum of exact longs inside each shard.
    // At 100 TB the shard count scales with the cluster (the mod is a
    // knob), and each shard's window is a single ordered pass.
    "q_pack" -> QueryDef(
      s"""WITH d AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    $tokenCountSql AS toks
         |  FROM documents),
         |o AS (
         |  SELECT shard, doc_id, toks,
         |    SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS off
         |  FROM d)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(off // $PackBudget AS BIGINT) AS seq,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
         |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
         |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        tokenCount(col("text")).as("toks"))
      val cum = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("off", sum("toks").over(cum) - col("toks"))
        .groupBy(col("shard").cast("long").as("shard"),
          TimeOpsFloorDiv(col("off"), PackBudget).as("seq"))
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard", "seq")
    },

    // PII detection + redaction fingerprint: per-doc email/IPv4 match
    // counts and the digest of the redacted text — the scrub pass a
    // compliance pipeline runs before export. Patterns use character
    // classes only ([.] not \.) so one literal is simultaneously a
    // Java regex and an RE2 regex; the synthetic corpus is PII-free
    // (counts 0, digest = digest of the unchanged text) and
    // TrainingExportSpec proves the detection/redaction semantics on
    // a fixture that does carry PII. n_ip is counted on the
    // EMAIL-REDACTED text — the same text the IP replacement runs
    // on — so counts and fingerprint always reconcile (an IPv4 inside
    // a matched email is consumed by <EMAIL>, and is neither counted
    // nor doubly redacted). Pure per-row scan — no shuffle.
    "q_pii_redact" -> QueryDef(
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ip,
         |  md5(regexp_replace(t1, '$Ipv4Re', '<IP>', 'g')) AS redacted_fp
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("t1", regexp_replace(col("text"), EmailRe, "<EMAIL>"))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$EmailRe', 0)"))
            .cast("long").as("n_email"),
          size(expr(s"regexp_extract_all(t1, '$Ipv4Re', 0)"))
            .cast("long").as("n_ip"),
          md5(regexp_replace(col("t1"), Ipv4Re, "<IP>").cast("binary"))
            .as("redacted_fp"))
        .orderBy("doc_id")
    },

    // Cross-document repeated-substring detection (the signal behind
    // exact-substring dedup, Lee et al. 2021 "Deduplicating Training
    // Data Makes Language Models Better"): every 32-token window is
    // content-hashed and windows appearing in >= 2 distinct docs are
    // reported. Span rows are linear in corpus tokens (position cap
    // mirrors the shingle MaxPos bound); the aggregate is keyed by the
    // 16-byte span hash with map-side combine — the heavy lifting a
    // suffix-array dedup does with a global sort happens here as one
    // hash aggregation, which is the shape that scales on a cluster.
    "q_substring_dup" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '),
         |                             x -> length(x) > 0) AS w
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i + 31 AS INTEGER)], ' ')) AS h
         |  FROM wl, generate_series(1, 512) AS g(i)
         |  WHERE i <= len(w) - 31)
         |SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
         |FROM sp GROUP BY h
         |HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY first_doc, h""".stripMargin) { (s, dir) =>
      // factored over distinct content: spans are a pure function of
      // the text, so each DISTINCT text is windowed once and its
      // multiplicity nm rides along as a count — n_docs = Σ nm over
      // groups containing the span (every member doc contains it),
      // n_occ = Σ nm·(occurrences within the text), first_doc =
      // min(rid) (rid IS the min member id). Identical output to the
      // direct per-doc form the oracle computes; compute ∝ distinct
      // content + output, so a duplicate-heavy corpus (the replica
      // probe, the crawled-corpus norm) pays nothing for its copies.
      // reads the PERSISTED span store ([[spanState]]: (k, h, c) per
      // distinct text) — the 32-token windowing is priced once per
      // content key, ever; rid/nm attach at read
      spanState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid", "nm"), "k")
        .groupBy("h")
        .agg(sum("nm").as("n_docs"),
          sum(col("nm") * col("c")).as("n_occ"), min("rid").as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("first_doc", "h")
    },

    // Per-label embedding centroids via exact fixed-point sums — the
    // codebook/centroid-training step an IVF index or a k-means
    // iteration runs at corpus scale: one explode, one (label, dim)
    // aggregate with map-side combine, output bounded by
    // labels × dims. Integer sums make the mean order-independent
    // across partitions (the float-sum alternative is
    // partition-order-dependent and can't hash-match).
    "q_emb_centroid" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT label, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings)
         |SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
         |  CAST(SUM(v) AS DOUBLE) / COUNT(*) / $Scale AS centroid
         |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      emb(s, dir)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("i", "f")))
        .select(col("label"), col("i").cast("long").as("i"),
          round(col("f").cast("double") * Scale, 0).cast("long").as("v"))
        .groupBy("label", "i")
        .agg((sum("v").cast("double") / count(lit(1)) / Scale).as("centroid"))
        .orderBy("label", "i")
    },

    // Unigram-rarity quality score: per-doc mean scaled inverse token
    // frequency against the corpus unigram distribution — the exact-
    // arithmetic stand-in for the LM-perplexity filter family (CCNet-
    // style): a doc whose tokens are, on average, much rarer than the
    // corpus norm is flagged. A true log-prob perplexity needs libm
    // log (last-ulp engine-dependent); the inverse-frequency mean
    // ranks the same tail and stays hash-exact: per-word tot/cnt is
    // fixed-pointed to an integer so the per-doc sum is exact and
    // order-independent. The unigram table is vocabulary-bounded and
    // BROADCASTS; the per-doc aggregate combines map-side.
    "q_token_rarity" -> QueryDef(
      s"""WITH w AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |                                    x -> length(x) > 0)) AS word
         |  FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c),
         |sif AS (
         |  SELECT word, CAST(ROUND(tot / cnt * 1000000, 0) AS BIGINT) AS sif
         |  FROM c, tot),
         |d AS (
         |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(s.sif) AS BIGINT) AS ssum
         |  FROM w JOIN sif s USING (word) GROUP BY 1)
         |SELECT doc_id, n AS n_tokens,
         |  CAST(ssum AS DOUBLE) / n / 1000000 AS rarity,
         |  CASE WHEN CAST(ssum AS DOUBLE) / n / 1000000 > 40 THEN 'rare'
         |       ELSE 'common' END AS verdict
         |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // factored over distinct content twice: the unigram table counts
      // each distinct text once with its multiplicity nm as a weight
      // (Σ nm·occ ≡ the direct per-occurrence count — the model MUST
      // see duplication, and does, without re-scanning the copies),
      // and the per-doc score — a pure function of the text given the
      // broadcast table — is computed once per distinct text and
      // re-keyed by digest ([[perDistinctText]]).
      val words = repWordCounts(s, dir)
      val c = words.groupBy("word").agg(sum(col("nm") * col("c")).as("cnt"))
      val tot = c.agg(sum("cnt").cast("double").as("tot"))
      val sif = c.crossJoin(broadcast(tot))
        .select(col("word"),
          round(col("tot") / col("cnt") * 1000000, 0).cast("long").as("sif"))
      val rarity = col("ssum").cast("double") / col("n") / 1000000
      perDistinctText(s, dir) { _ =>
        // the per-rep score derives from the same memoized unigram
        // frame (n = Σ c, ssum = Σ sif·c — identical to the direct
        // per-occurrence sums), so no second corpus explode exists
        words
          .join(broadcast(sif), "word")
          .select(col("rid").as("doc_id"), col("c"), col("sif"))
          .groupBy("doc_id")
          .agg(sum("c").as("n"), sum(col("sif") * col("c")).as("ssum"))
          .select(col("doc_id"), col("n").as("n_tokens"),
            rarity.as("rarity"),
            when(rarity > 40, "rare").otherwise("common").as("verdict"))
      }.orderBy("doc_id")
    },

    // CCNet-shaped LM quality score: a character-trigram conditional
    // model over the corpus (occurrence counts — the store trains on
    // content weighted by multiplicity, identically), scored as the
    // FIXED-POINT sum Σ ⌊2^20·c3(tri)/c2(prefix)⌋ over each doc's
    // first LmMaxPos trigram positions — exact integer arithmetic end
    // to end, so the oracle reproduces the engine's model and scores
    // bit-for-bit (no libm anywhere). Served from the persisted
    // derived store: the model trains once per corpus, every distinct
    // text scores once against the frozen model, and the model join
    // is broadcastable BY CONSTRUCTION (distinct char trigrams are
    // bounded by alphabet³, not corpus bytes).
    "q_lm_score" -> QueryDef(
      s"""WITH pos AS (
         |  SELECT doc_id, substr(text, CAST(p AS INTEGER), 3) AS g3
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1,
         |            LEAST(length(text) - 2, $LmMaxPos))) AS p
         |        FROM documents WHERE length(text) >= 3) t),
         |c3 AS (SELECT g3, CAST(COUNT(*) AS BIGINT) AS c3
         |       FROM pos GROUP BY 1),
         |c2 AS (SELECT substr(g3, 1, 2) AS g2, CAST(COUNT(*) AS BIGINT) AS c2
         |       FROM pos GROUP BY 1),
         |model AS (
         |  SELECT c3.g3, (c3.c3 * $LmScale) // c2.c2 AS r
         |  FROM c3 JOIN c2 ON c2.g2 = substr(c3.g3, 1, 2))
         |SELECT pos.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_pos,
         |  CAST(SUM(m.r) AS BIGINT) AS lm_fp,
         |  CAST(SUM(m.r) // COUNT(*) AS BIGINT) AS avg_fp
         |FROM pos JOIN model m USING (g3)
         |GROUP BY pos.doc_id ORDER BY pos.doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).filter(length(col("text")) >= 3)
        .select(col("doc_id"), textKey.as("k"))
        .join(lmScores(s, dir), "k")
        .select(col("doc_id"), col("n_pos"), col("lm_fp"),
          expr("lm_fp div n_pos").as("avg_fp"))
        .orderBy("doc_id")
    },

    // End-to-end curation report: the whole batch pipeline — exact
    // dedup (canonical = min doc_id per digest, read from the SAME
    // memoized distinct-groups frame every dedup consumer shares) →
    // quality gate (the q_text_quality rule, verbatim) → per-source
    // token accounting and packed-sequence yield at the PackBudget.
    // This is the one-query answer to "what does this crawl contribute
    // to the training set": one corpus scan, one digest join, one
    // per-source aggregate — no stage that wouldn't fuse at 100 TB.
    "q_curate_e2e" -> QueryDef {
      val stops = s"${occSql("' ' || d.text || ' '", " the ")} + ${occSql("' ' || d.text || ' '", " a ")}"
      s"""WITH g AS (SELECT MIN(doc_id) AS rid, text FROM documents GROUP BY text),
         |d AS (
         |  SELECT d.doc_id, d.source, g.rid,
         |    CAST(length(d.text) - length(replace(d.text, ' ', '')) + 1 AS BIGINT) AS toks,
         |    $stops AS stops
         |  FROM documents d JOIN g ON g.text = d.text),
         |k AS (
         |  SELECT source, toks,
         |    CASE WHEN doc_id = rid AND toks >= 40 AND stops * 5 <= toks
         |         THEN 1 ELSE 0 END AS keep
         |  FROM d)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(keep) AS BIGINT) AS n_kept,
         |  CAST(SUM(keep * toks) AS BIGINT) AS n_tokens,
         |  CAST((SUM(keep * toks) + ${PackBudget - 1}) // $PackBudget AS BIGINT) AS n_seqs
         |FROM k GROUP BY source ORDER BY source""".stripMargin
    } { (s, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      val stops = occurrences(padded, " the ") + occurrences(padded, " a ")
      val toks = tokenCount(col("text"))
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"), textKey.as("k"),
          toks.as("toks"), stops.as("stops"))
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
      d.select(col("source"), col("toks"),
          when(col("doc_id") === col("rid") && col("toks") >= 40 &&
            col("stops") * 5 <= col("toks"), 1L).otherwise(0L).as("keep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
          sum(col("keep") * col("toks")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_kept"), col("n_tokens"),
          TimeOpsFloorDiv(col("n_tokens") + (PackBudget - 1), PackBudget).as("n_seqs"))
        .orderBy("source")
    },

    // Incremental (cross-corpus) dedup: the decision a pipeline makes
    // when NEW crawl data arrives against an already-trained corpus —
    // never re-admit what the model has seen. "Seen" is the src0-src9
    // half of the corpus, incoming is src10-src19; each incoming doc is
    // dup_exact (digest already in the seen index), dup_near (shares a
    // MinHash cluster with a seen doc), or new. Since round 12 this
    // reads the PERSISTED incremental store ([[incrDedupState]]: a
    // graft.etl.DedupState initialized with the seen half, then updated
    // with the incoming batch at cost proportional to the batch) — the
    // production shape, where dedup state is a versioned on-disk index
    // maintained per ingest commit, not a per-session recompute. The
    // oracle is unchanged: it derives the same verdicts from the
    // one-shot full-corpus clustering, which DedupStateSpec proves the
    // incremental store reproduces component-for-component. The
    // seen-digest index joins equi-keyed on the 16-byte digest (at
    // 100 TB this is THE persisted dedup index, a join not a
    // broadcast); the seen-cluster set is output-bounded.
    "q_dedup_incr" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql,
         |sn AS (
         |  SELECT doc_id, text, CAST(substr(source, 4, 8) AS INTEGER) AS sn
         |  FROM documents),
         |seen AS (SELECT DISTINCT text FROM sn WHERE sn < 10),
         |seenc AS (
         |  SELECT DISTINCT c.cluster
         |  FROM clusters c JOIN sn ON sn.doc_id = c.doc_id
         |  WHERE sn.sn < 10)
         |SELECT d.doc_id,
         |  CASE WHEN d.text IN (SELECT text FROM seen) THEN 'dup_exact'
         |       WHEN c.cluster IN (SELECT cluster FROM seenc) THEN 'dup_near'
         |       ELSE 'new' END AS verdict
         |FROM sn d JOIN clusters c ON c.doc_id = d.doc_id
         |WHERE d.sn >= 10
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val st = incrDedupState(s, dir)
      // (doc_id, k, cluster, ver): arrival version 1 = the seen half,
      // 2 = the incoming batch; labels are the post-update (full)
      // components, exactly the oracle's one-shot clustering
      val m = st.members()
      // no checkpoint: the seen-clusters branch and the main branch
      // share identical subplans, so Catalyst reuses the exchange; a
      // per-call checkpoint would leak one block per invocation in a
      // long-lived daemon
      val dcl = m
        .join(st.seenKeys().select("k", "rid"), "k")
        .join(st.labels(), Seq("rid"), "left_outer")
        .select(m("doc_id"), m("k"),
          coalesce(col("cluster"), col("rid")).as("cluster"), m("ver"))
      val seenK = st.seenKeys().filter(col("ver") === 1)
        .select("k").withColumn("seen_exact", lit(1))
      val seenClusters = dcl.filter(col("ver") === 1)
        .select("cluster").distinct()
        .withColumn("seen_near", lit(1))
      dcl.filter(col("ver") === 2)
        .join(seenK, Seq("k"), "left_outer")
        .join(seenClusters, Seq("cluster"), "left_outer")
        .select(col("doc_id"),
          when(col("seen_exact").isNotNull, "dup_exact")
            .when(col("seen_near").isNotNull, "dup_near")
            .otherwise("new").as("verdict"))
        .orderBy("doc_id")
    },

    // FEDERATED dedup: corpus-wide cluster sizes computed from TWO
    // member stores (doc_id-parity split, so identical content has a
    // rep in both members) merged by DedupState.federatedDocClusters.
    // The oracle derives the same sizes from the one-shot full-corpus
    // clustering — the merge must be indistinguishable from a single
    // store over the union corpus. Output is label-independent
    // (per-doc cluster size), so it cannot pass by accident of label
    // arithmetic.
    "q_dedup_fed" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql
         |SELECT d.doc_id,
         |  CAST(COUNT(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS csize
         |FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val fc = fedDocClusters(s, dir)
      val sizes = fc.groupBy("cluster").agg(count(lit(1)).as("csize"))
      fc.join(sizes, "cluster")
        .select(col("doc_id"), col("csize"))
        .orderBy("doc_id")
    },

    // Mixture weighting: per-source sampling allocation proportional to
    // tokens^0.75 (the sub-linear upweighting of small sources every
    // multi-corpus training mix uses) against a fixed token budget.
    // t^0.75 is computed as sqrt(t * sqrt(t)) — sqrt is an IEEE
    // exact-rounded op in BOTH engines, where pow(t, 0.75) is a libm
    // call whose last ulp may differ — then fixed-pointed so the
    // normalizing total is an exact integer sum (order-independent
    // across partitions). One tiny aggregate per source; the totals
    // row broadcasts back.
    "q_mix_weights" -> QueryDef(
      s"""WITH t AS (
         |  SELECT source, CAST(SUM($tokenCountSql) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n_tokens,
         |    CAST(ROUND(sqrt(n_tokens * sqrt(n_tokens)) * 1000000, 0) AS BIGINT) AS wq
         |  FROM t),
         |tot AS (SELECT SUM(wq) AS tot FROM w)
         |SELECT source, n_tokens, wq,
         |  CAST(wq AS DOUBLE) / tot AS share,
         |  CAST(ROUND(CAST(wq AS DOUBLE) / tot * 1000000, 0) AS BIGINT) AS alloc_tokens
         |FROM w, tot ORDER BY source""".stripMargin) { (s, dir) =>
      val t = docs(s, dir).groupBy("source")
        .agg(sum(tokenCount(col("text"))).as("n_tokens"))
      val w = t.select(col("source"), col("n_tokens"),
        round(sqrt(col("n_tokens") * sqrt(col("n_tokens"))) * 1000000, 0)
          .cast("long").as("wq"))
      val tot = w.agg(sum("wq").as("tot"))
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"), col("wq"),
          (col("wq").cast("double") / col("tot")).as("share"),
          round(col("wq").cast("double") / col("tot") * 1000000, 0)
            .cast("long").as("alloc_tokens"))
        .orderBy("source")
    },

    // Scalar-quantized (SQ8) ANN scoring: a SYMMETRIC int8 quantizer
    // (q = round(v · 127 / gmax), gmax = corpus abs-max — zero maps to
    // zero, so the quantized dot is an unbiased scaled dot product)
    // scores vectors against the query in the compressed domain —
    // exact int64 sums of int8 products, order-independent and
    // engine-exact — then ranks by quantized COSINE, the same metric
    // as the exact baseline. (An asymmetric per-dim min/max quantizer
    // is the wrong tool for dot/cosine ranking: the per-dim offsets
    // bias the inner product by data-dependent cross terms — measured
    // 0/10 recall on this corpus — while the symmetric form measures
    // 10/10; TrainingExportSpec pins the recall.) This is the memory-
    // bound scale path: codes are 4× smaller than float32, the
    // trained scale (one scalar) and the quantized query broadcast to
    // every executor, and the corpus side never shuffles until the
    // final top-k.
    "q_ann_sq8" -> QueryDef(sq8OracleSql) { (s, dir) =>
      // reads the memoized trained codes ([[sq8Codes]]) — the index is
      // encoded once per corpus; each query is a compressed-domain scan
      sq8TopK(sq8Codes(s, dir))
    },

    // The FEDERATED form of the same query: member stores encode their
    // own vectors under ONE adopted quantizer ([[fedSq8Codes]] — the
    // train-once-distribute artifact contract), and the merged
    // compressed-domain top-k must equal the single-store answer, which
    // is exactly what serving this under q_ann_sq8's oracle VERBATIM
    // proves. The plan is the single-store plan over a two-member
    // union — broadcast query vector, map-side partial aggregation,
    // TakeOrdered top-k; nothing about the merge adds a shuffle.
    "q_ann_sq8_fed" -> QueryDef(sq8OracleSql) { (s, dir) =>
      sq8TopK(fedSq8Codes(s, dir))
    },

    // ---- Multimodal ---------------------------------------------------

    // Audio frame sampling over the mixed-media column: every 2nd
    // 64-byte PCM frame's unsigned-byte energy, via the REAL RIFF
    // chunk walk ([[graft.etl.Multimodal.frameEnergies]]). The oracle
    // recomputes from the source text (the WAV data region IS the
    // UTF-8 text bytes — ASCII corpus, so ord() = the byte) — the
    // decode path is proven against an independent byte model.
    "q_media_frames" -> QueryDef(
      s"""WITH a AS (
         |  SELECT doc_id, text, length(text) AS n FROM documents
         |  WHERE doc_id % 4 = 0),
         |pos AS (
         |  SELECT doc_id, (p - 1) // 64 AS frame,
         |    ord(substr(text, CAST(p AS INTEGER), 1)) AS b
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1, n)) AS p FROM a))
         |SELECT doc_id AS asset_id, CAST(frame AS BIGINT) AS frame,
         |  CAST(COUNT(*) AS BIGINT) AS n_bytes, CAST(SUM(b) AS BIGINT) AS energy
         |FROM pos WHERE frame % 2 = 0
         |GROUP BY doc_id, frame ORDER BY asset_id, frame""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.frameEnergies(
          graft.etl.Multimodal.assetsFromDocuments(docs(s, dir)),
          frameLen = 64, sampleEvery = 2)
        .toDF("asset_id", "frame", "n_bytes", "energy")
        .orderBy("asset_id", "frame")
    },

    // Mixed FOUR-format decode (WAV / PNG / JPEG / BMP by doc_id % 4;
    // the JPEG class splits % 16 into BASELINE GRAYSCALE (2),
    // PROGRESSIVE grayscale (10 — a real SOF2 multi-scan frame: DC
    // scan + EOB-run AC scan, decoded by accumulating coefficients
    // across scans) and COLOR 3-component YCbCr 4:4:4 (6, 14)
    // containers), each a REAL container walk — PNG a real zlib
    // inflate + the five-filter unfilter pass, JPEG a real entropy
    // decode (Huffman + restart resync + dequant + IDCT, fixed-point
    // YCbCr→RGB on the color branch). The oracle recomputes every
    // field arithmetically from the known layouts:
    //   n_bytes — WAV 44+n; BMP 54+n; PNG 57 + zlen with
    //     zlen = 6 + 5·ceil(raw/65535) + raw, raw = h·(w+1) (stored
    //     deflate blocks are byte-deterministic, which is why the
    //     encoder writes them — the decoder inflates ANY valid zlib);
    //     PROGRESSIVE JPEG 185 const + per-block DC cost (1 byte when
    //     ord%16 in 5..11 — no EOB nibble in a DC scan — else 2) +
    //     ceil(blocks/31) one-byte EOB-run chunks (the whole AC band
    //     is zero; Multimodal.JpegCodec.SizeProgConst pins the
    //     constant);
    //     JPEG 316 header + per-block byte-aligned DC-only codes
    //     (restart interval 1): 1 byte for a zero diff (text byte
    //     % 16 = 8), 2 otherwise, + 2·(blocks−1) restart markers
    //     + 2 EOI ⟹ 316 + 4·blocks − |{i ≤ n : ord%16 = 8}|;
    //   checksum — the first 32 bytes of the DECODED content region:
    //     the document's utf-8 bytes for WAV/PNG/BMP (ASCII corpus, so
    //     ord() = the byte), and for JPEG the first 32 PIXELS — each
    //     8×8 block constant at gray 120 + byte%16, so the sum is
    //     arithmetic over the first four block columns. The oracle
    //     derives all of it from the source text having never seen a
    //     container, so a hash match proves each decode path — incl.
    //     the DCT round-trip — end to end;
    //   dims — BMP (w, 1+n/64); PNG (w, ceil(n/w)); JPEG pixel dims
    //     (8w, 8·ceil(n/w)); WAV (1, n).
    "q_multimodal" -> QueryDef(
      s"""WITH b AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n
         |  FROM documents),
         |d AS (
         |  -- GREATEST(1, …) mirrors the adapter's height clamp: an
         |  -- EMPTY document still encodes as a valid 1×1-block image
         |  -- (ceil(0/w) = 0 is not a legal height)
         |  SELECT doc_id, text, n, 1 + n % 64 AS w, 1 + n // 64 AS hb,
         |         GREATEST(1, (n + (1 + n % 64) - 1) // (1 + n % 64))
         |           AS hp FROM b),
         |cs AS (
         |  SELECT doc_id,
         |    SUM(ord(substr(text, CAST(p AS INTEGER), 1))) AS checksum
         |  FROM d, generate_series(1, 32) s(p) WHERE p <= n
         |  GROUP BY doc_id),
         |j8 AS (
         |  SELECT doc_id,
         |    SUM(CASE WHEN ord(substr(text, CAST(p AS INTEGER), 1))
         |      % 16 = 8 THEN 1 ELSE 0 END) AS cnt8
         |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS p
         |        FROM d) t
         |  GROUP BY doc_id),
         |jm AS (
         |  -- COLOR JPEG (doc_id % 8 = 6) byte cost: per-MCU 5 bytes
         |  -- when the luma diff category is small (ord%16 in 5..11,
         |  -- |d| <= 3) else 6 — chroma adds a fixed 28 bits/MCU
         |  SELECT doc_id,
         |    SUM(CASE WHEN ord(substr(text, CAST(p AS INTEGER), 1))
         |      % 16 BETWEEN 5 AND 11 THEN 1 ELSE 0 END) AS cntm
         |  FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS p
         |        FROM d) t
         |  GROUP BY doc_id),
         |jcs AS (
         |  SELECT d.doc_id,
         |    SUM(120 + CASE WHEN 1 + ((p - 1) % (8 * w)) // 8 <= n
         |      THEN ord(substr(text,
         |        CAST(1 + ((p - 1) % (8 * w)) // 8 AS INTEGER), 1)) % 16
         |      ELSE 0 END) AS checksum
         |  FROM d, generate_series(1, 32) s(p)
         |  GROUP BY d.doc_id),
         |jcsc AS (
         |  -- color checksum: first 32 INTERLEAVED RGB bytes — byte j
         |  -- is channel (j-1)%3 of pixel 1+(j-1)//3, and the chroma
         |  -- constants (132, 124) land fixed RGB offsets (-6, +1, +7)
         |  -- on the block's luma with no clamping in the ±8 domain
         |  SELECT d.doc_id,
         |    SUM(120 + CASE WHEN 1 + (((j - 1) // 3) % (8 * w)) // 8 <= n
         |      THEN ord(substr(text,
         |        CAST(1 + (((j - 1) // 3) % (8 * w)) // 8 AS INTEGER), 1)) % 16
         |      ELSE 0 END
         |      + CASE (j - 1) % 3 WHEN 0 THEN -6 WHEN 1 THEN 1
         |        ELSE 7 END) AS checksum
         |  FROM d, generate_series(1, 32) s(j)
         |  GROUP BY d.doc_id)
         |SELECT d.doc_id AS asset_id,
         |  CASE WHEN d.doc_id % 4 = 0 THEN 'audio/wav'
         |       WHEN d.doc_id % 4 = 1 THEN 'image/png'
         |       WHEN d.doc_id % 4 = 2 THEN 'image/jpeg'
         |       ELSE 'image/bmp' END AS kind,
         |  CAST(CASE WHEN d.doc_id % 4 = 0 THEN 44 + n
         |       WHEN d.doc_id % 4 = 1 THEN 57 + 6
         |         + 5 * ((hp * (w + 1) + 65534) // 65535) + hp * (w + 1)
         |       -- progressive gray: no EOB nibble in a DC scan, so a
         |       -- block is ONE byte whenever ord%16 in 5..11 (the same
         |       -- cntm the color branch counts), plus the EOB-run bytes
         |       WHEN d.doc_id % 16 = 10 THEN 185 + 4 * w * hp
         |         - COALESCE(jm.cntm, 0) + (w * hp + 30) // 31
         |       WHEN d.doc_id % 8 = 2 THEN 316 + 4 * w * hp
         |         - COALESCE(j8.cnt8, 0)
         |       WHEN d.doc_id % 8 = 6 THEN 326 + 8 * w * hp
         |         - COALESCE(jm.cntm, 0)
         |       ELSE 54 + n END AS BIGINT) AS n_bytes,
         |  -- LEFT joins + COALESCE: an empty doc has no byte rows but
         |  -- is still a corpus asset (checksum of no content = 0)
         |  CAST(CASE WHEN d.doc_id % 8 = 2 THEN jcs.checksum
         |       WHEN d.doc_id % 8 = 6 THEN jcsc.checksum
         |       ELSE COALESCE(cs.checksum, 0) END AS BIGINT) AS checksum,
         |  CAST(CASE WHEN d.doc_id % 4 = 0 THEN 1
         |       WHEN d.doc_id % 4 = 2 THEN 8 * w
         |       ELSE w END AS INTEGER) AS width,
         |  CAST(CASE WHEN d.doc_id % 4 = 0 THEN n
         |       WHEN d.doc_id % 4 = 1 THEN hp
         |       WHEN d.doc_id % 4 = 2 THEN 8 * hp
         |       ELSE hb END AS INTEGER) AS height
         |FROM d LEFT JOIN cs ON cs.doc_id = d.doc_id
         |       LEFT JOIN j8 ON j8.doc_id = d.doc_id
         |       LEFT JOIN jm ON jm.doc_id = d.doc_id
         |       LEFT JOIN jcs ON jcs.doc_id = d.doc_id
         |       LEFT JOIN jcsc ON jcsc.doc_id = d.doc_id
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.features(s, dir).drop("feature")
    },

    // Corrupt-asset QUARANTINE over the mixed-media column: a
    // deterministic subset of containers arrives broken (truncated to
    // 10 bytes mid-header — one residue per codec class, doc_id % 32
    // ∈ {4 WAV, 9 PNG, 18 JPEG, 27 BMP}) or oversized (% 32 = 26: a
    // 15-byte JPEG declaring 2^27 px, past the full decoder's 2^26
    // allocation bound). [[graft.etl.Multimodal.decodeAll]] must
    // SURVIVE the whole corpus — at crawl scale one truncated JPEG
    // must not kill the job through stage retries — and emit exactly
    // one tagged reject row per broken container, never a silent
    // skip. The hash gate proves both directions at once: a codec
    // that falsely rejects a clean container adds a row; weak
    // validation that "decodes" a truncated one loses a row.
    "q_multimodal_rejects" -> QueryDef(
      s"""SELECT doc_id AS asset_id,
         |  CASE WHEN doc_id % 4 = 0 THEN 'audio/wav'
         |       WHEN doc_id % 4 = 1 THEN 'image/png'
         |       WHEN doc_id % 4 = 2 THEN 'image/jpeg'
         |       ELSE 'image/bmp' END AS kind,
         |  CAST(CASE WHEN doc_id % 32 = 26 THEN 15 ELSE 10 END
         |    AS BIGINT) AS n_bytes,
         |  CASE WHEN doc_id % 32 = 26 THEN 'oversize'
         |       ELSE 'decode-error' END AS error_class
         |FROM documents
         |WHERE doc_id % 32 IN (4, 9, 18, 26, 27)
         |ORDER BY asset_id""".stripMargin) { (s, dir) =>
      graft.etl.Multimodal.decodeAll(
          graft.etl.Multimodal.assetsWithEdgeCases(docs(s, dir)))
        .toDF()
        .filter(!col("ok"))
        .select(col("asset_id"), col("kind"), col("n_bytes"),
          col("error_class"))
        .orderBy("asset_id")
    })

  /** The SQ8 oracle — shared VERBATIM by the single-store
    * (`q_ann_sq8`) and federated (`q_ann_sq8_fed`) forms: a federated
    * index under one adopted quantizer must be evidence-
    * indistinguishable from the single store. */
  private def sq8OracleSql: String =
    s"""WITH sc AS (
       |  SELECT vec_id, unnest(range(len(embedding))) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings),
       |gm AS (SELECT MAX(ABS(v)) AS gmax FROM sc),
       |q8 AS (
       |  SELECT vec_id, i, CAST(ROUND(v * 127 / gmax, 0) AS BIGINT) AS q
       |  FROM sc, gm),
       |qv AS (SELECT i, q AS qq FROM q8 WHERE vec_id = 0),
       |dots AS (
       |  SELECT q8.vec_id, SUM(q8.q * qv.qq) AS adot, SUM(q8.q * q8.q) AS nn
       |  FROM q8 JOIN qv ON q8.i = qv.i GROUP BY q8.vec_id),
       |qn AS (SELECT nn AS qnn FROM dots WHERE vec_id = 0)
       |SELECT vec_id,
       |  CAST(adot AS DOUBLE) /
       |    (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS acos
       |FROM dots, qn WHERE vec_id <> 0
       |ORDER BY acos DESC, vec_id LIMIT 10""".stripMargin

  /** The SQ8 compressed-domain top-k over a code frame (vec_id, i, q):
    * broadcast quantized query vector, exact int64 dot/norm sums
    * (order-independent), quantized-cosine rank. */
  private def sq8TopK(q8: DataFrame): DataFrame = {
    val qv = q8.filter(col("vec_id") === 0).select(col("i"), col("q").as("qq"))
    val dots = q8.join(broadcast(qv), "i")
      .groupBy("vec_id")
      .agg(sum(col("q") * col("qq")).as("adot"),
        sum(col("q") * col("q")).as("nn"))
    val qn = dots.filter(col("vec_id") === 0).select(col("nn").as("qnn"))
    dots.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qn))
      .select(col("vec_id"),
        (col("adot").cast("double") /
          (sqrt(col("nn").cast("double")) * sqrt(col("qnn").cast("double"))))
          .as("acos"))
      .orderBy(col("acos").desc, col("vec_id"))
      .limit(10)
  }

  /** Character shingles (ShingleLen-grams at ShingleStride), optionally
    * distinct per doc. Duplicate-insensitive consumers (minhash MIN) skip
    * the distinct and its shuffle. */
  private def shinglesOf(d: DataFrame, distinctShingles: Boolean = true): DataFrame = {
    // length pre-filter guards sequence() against short docs (negative
    // upper bound throws); the oracle's WHERE clause is the same guard.
    // The MaxPos cap mirrors the oracle's generate_series(1, MaxPos, …)
    // bound — without it a > MaxPos-char doc grows Spark-side shingles
    // the SQL never scans.
    val sh = d.filter(length(col("text")) >= ShingleLen)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - (ShingleLen - 1), lit(MaxPos)),
          lit(ShingleStride))).as("p"))
      .select(col("doc_id"), expr(s"substring(text, p, $ShingleLen)").as("sh"))
    if (distinctShingles) sh.distinct() else sh
  }

  /** Exact integer floor-div for non-negative int columns. */
  private def TimeOpsFloorDiv(a: Column, b: Long): Column =
    graft.core.TimeOps.floorDiv(a.cast("long"), b)

  /** DuckDB CTEs for `nPlanes` deterministic random-hyperplane sign
    * bits over the scaled-embedding CTE `sc` — the SQL mirror of
    * [[graft.etl.Similarity.hyperplane]]'s LCG coefficients. Yields
    * `bits(vec_id, j, b)`. */
  private def hyperplaneSql(nPlanes: Int, dim: Int = 64): String =
    s"""coef AS (
       |  SELECT j.j, i.i,
       |    ((CAST(j.j * $dim + i.i + 1 AS BIGINT) * 2654435761) % 4294967296)
       |      % 2001 - 1000 AS c
       |  FROM generate_series(0, ${nPlanes - 1}) AS j(j),
       |       generate_series(0, ${dim - 1}) AS i(i)),
       |bits AS (
       |  SELECT sc.vec_id, coef.j,
       |    CASE WHEN SUM(sc.v * coef.c) >= 0 THEN 1 ELSE 0 END AS b
       |  FROM sc JOIN coef ON sc.i = coef.i
       |  GROUP BY sc.vec_id, coef.j)""".stripMargin
}
