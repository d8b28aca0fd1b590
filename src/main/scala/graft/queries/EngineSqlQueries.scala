package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.engine.{Btrdb, Federation}
import graft.storage.Store
import graft.tables.Tables

/** Oracle-gated queries that exercise the ENGINE end-to-end through its
  * plain-SQL surface: the events-derived point fixture is ingested into
  * a real Btrdb root (createStreams → bulk stage → flush →
  * pyramid), the root is registered as temp views
  * ([[graft.engine.Btrdb.registerViews]]), and the queries run as
  * `spark.sql` text over those views — the path a SQL-only consumer of
  * the library takes, with no DataFrame plumbing.
  *
  * `q_sql_pyramid` additionally REQUIRES the Catalyst pyramid
  * substitution ([[graft.plans.PyramidSubstitutionRule]]) to have fired
  * — it fails loudly if the plan still reads the point log — so the
  * driver's DuckDB hash compare gates the rewrite's EXACT equivalence
  * on real data, not just its plan shape. All five stat aggregates are
  * exposed to the hash, including avg/sum: the pyramid carries the
  * exact integer cents sum (`vsc`), whose combine is associative, so
  * the served mean/sum are bit-identical to the oracle's fixed-point
  * computation over raw rows. Serving avg/sum this way is gated on the
  * per-stream cents-grid flag the ingest path records — the fixture's
  * `events.value` column is 2-decimal, so every stream qualifies and
  * the rule is REQUIRED to fire; a stream with off-grid doubles would
  * instead fall back to the raw IEEE plan (PyramidSqlSpec pins both
  * sides).
  *
  * The session must be built with
  * `withExtensions(new graft.functions.GraftExtensions)` — `Verify`
  * and `Bench` both do.
  */
object EngineSqlQueries {

  /** One ingested root per (session, sfDir) per JVM — ingest is a
    * standing pipeline in production; queries hit an already-populated
    * root. `Bench` calls [[prebuild]] to pay this cost in its fixture
    * phase, BEFORE any warmup or timing. */
  private val roots = TrieMap[(SparkSession, String), String]()
  private val fedRoots = TrieMap[(SparkSession, String), String]()
  private val engines = TrieMap[(SparkSession, String), Btrdb]()
  private val fedEngines = TrieMap[(SparkSession, String), Seq[Btrdb]]()

  /** Build the engine fixture roots for `dir` now (idempotent). Bench
    * invokes this in its fixture phase so that no engine ingest runs
    * inside the measured (or even warmup) passes — residual executor/
    * JVM state from an in-measurement ingest inflated unrelated query
    * times by up to 54× before this phase existed. */
  def prebuild(spark: SparkSession, dir: String): Unit = {
    viewPrefix(spark, dir); fedPrefix(spark, dir)
  }

  private val RootPrefix = "graft_sql_root_"
  /** A crash leftover is one whose engine lock is this stale — 10× the
    * engine's own takeover bound, because the stakes differ: the
    * engine's lock steal claims a root it then OWNS, while the reaper
    * DELETES a sibling's data. A JVM paused past the engine bound
    * (long GC, machine suspend) must not lose its fixture to a
    * concurrent run, so the reaper demands a margin no live heartbeat
    * (30 s cadence) can miss short of real death. */
  private val StaleLockMillis = 10L * 120000L

  /** Unique-per-(fixture, JVM, session) base name: a hash-only path let
    * a second session or a concurrent JVM sharing the scratch dir
    * deleteRecursive a LIVE root (lock file included, silently
    * bypassing the single-writer check) out from under the session that
    * registered views on it. */
  private def fixtureTag(dir: String): String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir) & 0xffffffffL)

  private def fixtureBase(spark: SparkSession, dir: String): String =
    s"$RootPrefix${fixtureTag(dir)}_p${ProcessHandle.current().pid()}" +
      s"_s${Integer.toHexString(System.identityHashCode(spark))}"

  private def scratchDir: String =
    sys.props.get("graft.sql.scratch")
      .orElse(sys.env.get("SPARK_GRAFT_SCRATCH"))
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Create an empty fixture root `<base><suffix>` under the scratch,
    * reaping crash leftovers from other runs on the way: a LIVE fixture
    * root heartbeats its engine.lock, so a missing or stale lock marks
    * an orphan from a dead JVM; a fresh lock is left alone. */
  private def newRoot(spark: SparkSession, dir: String,
                      suffix: String): String = {
    val scratch = scratchDir
    val conf = spark.sessionState.newHadoopConf()
    val base = fixtureBase(spark, dir)
    val scratchStore = new Store(scratch, conf)
    try scratchStore.listNames("")
      .filter(n => n.startsWith(RootPrefix) && !n.startsWith(base))
      .foreach { n =>
        val live = scratchStore.modificationTime(s"$n/${Btrdb.LockFile}")
          .exists(m => System.currentTimeMillis() - m <= StaleLockMillis)
        // a stale lock alone is not proof of death — a JVM paused past
        // the margin (debugger, machine suspend) still owns its
        // fixture, and losing it would be cross-process data deletion
        // keyed on wall clock. Require the root's embedded pid to be
        // provably dead ON THIS HOST too; an unparsable pid (foreign
        // naming, or a remote store where the pid namespace is not
        // ours) falls back to the mtime rule alone.
        val pidDead = "_p([0-9]+)".r.findFirstMatchIn(n).forall(m =>
          scala.util.Try(ProcessHandle.of(m.group(1).toLong).isEmpty)
            .getOrElse(true))
        if (!live && pidDead)
          try scratchStore.deleteRecursive(n) catch { case _: Exception => () }
      }
    catch { case _: Exception => () }
    val root = s"$scratch/$base$suffix"
    // resolved + cleaned through the engine's Store (any Hadoop
    // scheme, not only POSIX); the root is also removed at JVM exit
    val store = new Store(root, conf)
    store.deleteRecursive("")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try store.deleteRecursive("") catch { case _: Exception => () }))
    root
  }

  /** Session-unique view prefix: the pyramid-substitution registry is
    * JVM-global and keyed by view name, so a shared prefix would let a
    * second session's registration shadow the first's. */
  private def viewName(spark: SparkSession, dir: String, kind: String) =
    s"g${kind}_${fixtureTag(dir)}" +
      s"_s${Integer.toHexString(System.identityHashCode(spark))}"

  private def viewPrefix(spark: SparkSession, dir: String): String =
    roots.getOrElseUpdate((spark, dir), {
      // quantileLevel: the per-window cents-histogram rollup, so
      // q_quantile_pyr can gate the O(windows) quantile serve path
      val db = new Btrdb(spark, newRoot(spark, dir, ""),
        quantileLevel = Some(42))
      val sids = db.createStreams((0 until Tables.NumSids).map(k =>
        (s"sql-u$k", "sql/events", Map("sid" -> k.toString))))
      require(sids == (0L until Tables.NumSids.toLong),
        s"fresh root must allocate sids 0..${Tables.NumSids - 1}, got $sids")
      // ONE fixture scan stages every stream's points; per-stream flush
      // then reads only its own staging partition
      db.insertAll(Tables.points(spark, dir).select("sid", "time", "value"))
      db.flushAll(maxAgeMillis = 0)
      val prefix = viewName(spark, dir, "sql")
      db.registerViews(prefix)
      engines.put((spark, dir), db)
      prefix
    })

  /** The ingested fixture ENGINE (building it if needed) — for queries
    * that exercise engine methods with no SQL-view surface. */
  private def engine(spark: SparkSession, dir: String): Btrdb = {
    viewPrefix(spark, dir)
    engines((spark, dir))
  }

  /** A two-writer federation over the SAME fixture: every stream exists
    * in both roots (so local sids line up with the fixture's global sid
    * space), but each root ingests only the half [[Federation.ownerOf]]
    * analog below places there — the reference's MASH-disjoint write
    * placement, with the read surface unioned back by
    * [[Federation.registerViews]]. */
  private def fedPrefix(spark: SparkSession, dir: String): String =
    fedRoots.getOrElseUpdate((spark, dir), {
      val half = Tables.NumSids / 2
      val members = Seq("_f0", "_f1").map(s =>
        new Btrdb(spark, newRoot(spark, dir, s), quantileLevel = Some(42)))
      members.foreach { db =>
        val sids = db.createStreams((0 until Tables.NumSids).map(k =>
          (s"sqlfed-u$k", "sql/events", Map("sid" -> k.toString))))
        require(sids == (0L until Tables.NumSids.toLong),
          s"fresh root must allocate sids 0..${Tables.NumSids - 1}, got $sids")
      }
      val pts = Tables.points(spark, dir).select("sid", "time", "value")
      members.head.insertAll(pts.filter(col("sid") < half))
      members.last.insertAll(pts.filter(col("sid") >= half))
      members.foreach(_.flushAll(maxAgeMillis = 0))
      val prefix = viewName(spark, dir, "fed")
      Federation.registerViews(spark, prefix,
        members.zipWithIndex.map { case (e, i) => (s"e$i", e) })
      fedEngines.put((spark, dir), members)
      prefix
    })

  private def fedMembers(spark: SparkSession, dir: String): Seq[Btrdb] = {
    fedPrefix(spark, dir)
    fedEngines((spark, dir))
  }

  private val P = s"WITH points AS (${Tables.pointsSql})"
  private val pw = 44
  private val sumCents = "SUM(CAST(ROUND(value*100, 0) AS BIGINT))"

  val defs: Map[String, QueryDef] = Map(

    // The merged read surface as SQL: every ingested point comes back
    // out of `<prefix>_points` exactly — gates the full write path
    // (validate → stage → flush → commit) plus the view's
    // merge-on-read plan against the fixture the points came from.
    "q_sql_points" -> QueryDef(
      s"""$P SELECT sid, time, value FROM points
         |ORDER BY sid, time, value""".stripMargin) { (s, dir) =>
      val p = viewPrefix(s, dir)
      s.sql(s"""SELECT sid, time, value FROM ${p}_points
               |ORDER BY sid, time, value""".stripMargin)
    },

    // A stat-shaped GROUP BY in plain SQL, REQUIRED to be served from
    // the rollup pyramid by the Catalyst substitution: the oracle
    // computes the same aggregates from the raw fixture, so a hash
    // match proves the pyramid's combined partials — including the
    // cents-exact avg and sum — are exactly the raw truth.
    "q_sql_pyramid" -> QueryDef(
      s"""$P SELECT sid, (time >> $pw) << $pw AS wstart,
         |  CAST(COUNT(*) AS BIGINT) AS cnt,
         |  MIN(value) AS vmin, MAX(value) AS vmax,
         |  $sumCents / 100.0 / NULLIF(COUNT(*), 0) AS vavg,
         |  $sumCents / 100.0 AS vsum
         |FROM points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val p = viewPrefix(s, dir)
      val df = s.sql(
        s"""SELECT sid, shiftleft(shiftright(time, $pw), $pw) AS wstart,
           |  count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
           |  avg(value) AS vavg, sum(value) AS vsum
           |FROM ${p}_points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      // inspect the actual scan locations, not the rendered plan text —
      // plan toString truncates long paths, which silently broke a
      // substring check when the fixture root moved to a longer
      // per-(jvm,session) path
      require(graft.plans.PlanChecks.readsPyramidOnly(df),
        "pyramid substitution did not fire; scans=" +
          s"${graft.plans.PlanChecks.scanRootPaths(df)}\n" +
          df.queryExecution.optimizedPlan.toString())
      df
    },

    // The SAME stat shape against a TWO-writer federation: the points
    // live in two disjoint engine roots behind one union view, and the
    // substitution is REQUIRED to serve it from BOTH members' pyramids
    // (a union of per-member partials, one final combine) — the one
    // query shape a 100 TB federation must never answer by scanning N
    // point logs (/root/reference/qtree/qtree.go:863-944 answers it
    // from pre-aggregated cores on every node). The oracle is the same
    // whole-fixture truth as q_sql_pyramid: a hash match proves the
    // cross-root combine is exact, including the cents avg/sum.
    "q_sql_pyramid_fed" -> QueryDef(
      s"""$P SELECT sid, (time >> $pw) << $pw AS wstart,
         |  CAST(COUNT(*) AS BIGINT) AS cnt,
         |  MIN(value) AS vmin, MAX(value) AS vmax,
         |  $sumCents / 100.0 / NULLIF(COUNT(*), 0) AS vavg,
         |  $sumCents / 100.0 AS vsum
         |FROM points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val p = fedPrefix(s, dir)
      val df = s.sql(
        s"""SELECT sid, shiftleft(shiftright(time, $pw), $pw) AS wstart,
           |  count(*) AS cnt, min(value) AS vmin, max(value) AS vmax,
           |  avg(value) AS vavg, sum(value) AS vsum
           |FROM ${p}_points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      require(graft.plans.PlanChecks.readsPyramidOnly(df),
        "federated pyramid substitution did not fire; scans=" +
          s"${graft.plans.PlanChecks.scanRootPaths(df)}\n" +
          df.queryExecution.optimizedPlan.toString())
      df
    },

    // Pyramid-served EXACT quantiles: p50/p95 per aligned 2^44 window
    // for every stream, answered from the persisted per-window cents
    // HISTOGRAM (`qhist`, maintained per ingest commit) — REQUIRED to
    // never touch the point log, the property that makes a
    // p50-per-window query O(windows · distinct cents) instead of a
    // full raw scan at 100 TB. The oracle recomputes the same
    // nearest-rank quantiles from raw rows, so a hash match proves the
    // histogram fold is exact, not merely the plan shape.
    "q_quantile_pyr" -> QueryDef(
      s"""$P, b AS (
         |  SELECT sid, (time >> $pw) << $pw AS wstart,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS c
         |  FROM points),
         |w AS (
         |  SELECT sid, wstart, c,
         |    ROW_NUMBER() OVER (PARTITION BY sid, wstart ORDER BY c) AS rn,
         |    COUNT(*) OVER (PARTITION BY sid, wstart) AS n
         |  FROM b)
         |SELECT sid, wstart, CAST(MAX(n) AS BIGINT) AS cnt,
         |  SUM(CASE WHEN rn = (n+1) // 2 OR rn = (n+2) // 2 THEN c END)
         |    / (2 - MAX(n) % 2) / 100.0 AS p50,
         |  MAX(CASE WHEN rn = (19*n + 19) // 20 THEN c END) / 100.0 AS p95
         |FROM w GROUP BY sid, wstart
         |ORDER BY sid, wstart""".stripMargin) { (s, dir) =>
      val db = engine(s, dir)
      val df = db.quantileWindowsBulk(
        (0 until Tables.NumSids).map(k => s"sql-u$k"),
        Tables.T0, Tables.T0 + 40 * Tables.DayNs, pw)
      val scans = graft.plans.PlanChecks.scanRootPaths(df)
      require(scans.nonEmpty && scans.forall(_.contains("/qhist")),
        s"quantiles not served from the histogram rollup; scans=$scans")
      df
    },

    // The SAME quantile shape against the two-writer federation: each
    // member serves ITS streams' windows from its own qhist and the
    // results union — the disjoint-write placement means a non-owner
    // member contributes nothing for a stream, so the federated answer
    // is the members' histogram reads stitched together, never a
    // cross-root point scan. Oracle identical to q_quantile_pyr (the
    // fixture is the same whole corpus), so a hash match proves the
    // per-member histograms compose exactly across roots.
    "q_quantile_fed" -> QueryDef(
      s"""$P, b AS (
         |  SELECT sid, (time >> $pw) << $pw AS wstart,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS c
         |  FROM points),
         |w AS (
         |  SELECT sid, wstart, c,
         |    ROW_NUMBER() OVER (PARTITION BY sid, wstart ORDER BY c) AS rn,
         |    COUNT(*) OVER (PARTITION BY sid, wstart) AS n
         |  FROM b)
         |SELECT sid, wstart, CAST(MAX(n) AS BIGINT) AS cnt,
         |  SUM(CASE WHEN rn = (n+1) // 2 OR rn = (n+2) // 2 THEN c END)
         |    / (2 - MAX(n) % 2) / 100.0 AS p50,
         |  MAX(CASE WHEN rn = (19*n + 19) // 20 THEN c END) / 100.0 AS p95
         |FROM w GROUP BY sid, wstart
         |ORDER BY sid, wstart""".stripMargin) { (s, dir) =>
      val members = fedMembers(s, dir)
      val uuids = (0 until Tables.NumSids).map(k => s"sqlfed-u$k")
      // union the member HISTOGRAMS, then finish ONCE: stream
      // ownership is disjoint (a non-owner member's histogram holds
      // nothing for a stream), so no (sid, wstart) group straddles
      // members and finishing the union is row-identical to unioning
      // finished members — minus one full window/sort/aggregate pass
      // and one sort per member (guide §2.4; was 7 Exchanges)
      val df = graft.engine.Btrdb.quantileFinish(
        members.map(_.quantileHistogram(uuids,
            Tables.T0, Tables.T0 + 40 * Tables.DayNs, pw))
          .reduce(_ unionByName _))
      val scans = graft.plans.PlanChecks.scanRootPaths(df)
      require(scans.nonEmpty && scans.forall(_.contains("/qhist")),
        s"federated quantiles must read only member qhists; scans=$scans")
      df
    })
}
