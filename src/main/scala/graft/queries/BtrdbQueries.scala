package graft.queries

import org.apache.spark.sql.functions._

import graft.core.TimeOps
import graft.operators.StatOps
import graft.operators.StatOps.{cents, meanFromCents}
import graft.tables.Tables
import graft.tables.Tables.{DayNs, T0}

/** The BTrDB query surface (SURVEY §2) expressed over the events-derived
  * point log, each with its DuckDB oracle. Constants are computed once in
  * Scala and spliced into the SQL text so both sides agree bit-for-bit.
  */
object BtrdbQueries {

  private val week1 = T0 + 7 * DayNs
  private val week2 = T0 + 14 * DayNs
  private val end28 = T0 + 28 * DayNs
  private val pw42 = 42
  private val pw44 = 44
  private val w42 = 1L << pw42
  private val w44 = 1L << pw44
  // AlignedWindows bounds round DOWN to 2^pw (quasar.go:279-283)
  private val s42 = TimeOps.alignDown(T0, pw42)
  private val e42 = TimeOps.alignDown(end28, pw42)
  private val s44 = TimeOps.alignDown(T0, pw44)
  private val e44 = TimeOps.alignDown(T0 + 35 * DayNs, pw44)
  private val nearT = T0 + 12 * DayNs
  private val del0 = T0 + 10 * DayNs
  private val del1 = T0 + 20 * DayNs
  // Extends 15 days past the data's end so hole emission (zero-count
  // windows) is actually exercised; truncates to 45 whole days.
  private val winEnd = T0 + 45 * DayNs + DayNs / 2

  private val P = s"WITH points AS (${Tables.pointsSql})"
  private val C = s"WITH catalog AS (${Tables.catalogSql})"
  private val sumCents = "SUM(CAST(ROUND(value*100, 0) AS BIGINT))"
  private def meanSql(cntExpr: String = "COUNT(*)") =
    s"$sumCents / 100.0 / NULLIF($cntExpr, 0)"

  val defs: Map[String, QueryDef] = Map(

    // S1/F1/O2 — RawValues: all points of one stream in [start,end), time-ordered.
    "q_raw_values" -> QueryDef(
      s"""$P SELECT time, value FROM points
         |WHERE sid = 3 AND time >= $week1 AND time < $week2
         |ORDER BY time, value""".stripMargin) { (s, dir) =>
      Tables.timeSlice(Tables.points(s, dir), week1, week2)
        .filter(col("sid") === 3)
        .select("time", "value")
        .orderBy("time", "value")
    },

    // F2 — version-pinned snapshot read: only points committed at version <= 3.
    "q_version_pin" -> QueryDef(
      s"""$P SELECT sid, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  MIN(time) AS tmin, MAX(time) AS tmax,
         |  CAST($sumCents AS BIGINT) AS sum_cents
         |FROM points WHERE version <= 3 GROUP BY sid ORDER BY sid""".stripMargin) { (s, dir) =>
      Tables.points(s, dir).filter(col("version") <= 3)
        .groupBy("sid")
        .agg(count(lit(1)).as("cnt"), min("time").as("tmin"), max("time").as("tmax"),
          sum(cents(col("value"))).as("sum_cents"))
        .orderBy("sid")
    },

    // A3 — AlignedWindows: 2^42-ns tumbling windows for one stream,
    // bounds aligned down, non-empty windows only.
    "q_aligned_windows" -> QueryDef(
      s"""$P SELECT (time >> $pw42) << $pw42 AS wstart,
         |  CAST(COUNT(*) AS BIGINT) AS cnt, MIN(value) AS vmin,
         |  ${meanSql()} AS vmean, MAX(value) AS vmax
         |FROM points WHERE sid = 1 AND time >= $s42 AND time < $e42
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      StatOps.alignedWindows(
        Tables.timeSlice(Tables.points(s, dir), s42, e42)
          .filter(col("sid") === 1), pw42, T0, end28, keys = Nil)
        .orderBy("wstart")
    },

    // A4 — Windows: arbitrary-width (1 day) tumbling windows, trailing
    // partial window truncated, EMPTY WINDOWS EMITTED with zeros.
    "q_windows" -> QueryDef(
      s"""$P, agg AS (
         |  SELECT (time - $T0) // $DayNs AS i, COUNT(*) AS cnt, MIN(value) AS vmin,
         |         ${meanSql()} AS vmean, MAX(value) AS vmax
         |  FROM points WHERE sid = 5 AND time >= $T0 AND time < ${T0 + 45 * DayNs}
         |  GROUP BY 1)
         |SELECT g.i AS i, g.i * $DayNs + $T0 AS wstart,
         |  CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt, COALESCE(vmin, 0.0) AS vmin,
         |  COALESCE(vmean, 0.0) AS vmean, COALESCE(vmax, 0.0) AS vmax
         |FROM generate_series(0, 44) AS g(i) LEFT JOIN agg ON agg.i = g.i
         |ORDER BY 1""".stripMargin) { (s, dir) =>
      StatOps.windows(Tables.timeSlice(Tables.points(s, dir), T0, winEnd), 5,
        T0, winEnd, DayNs).orderBy("i")
    },

    // A4 — Windows with the reference's depth cap, EXACT arithmetic
    // (qtree.go:1064-1176 via the StatOps.windowsDepth closed form):
    // depth=46 caps attribution at ladder pw 44 (~4.9 h buckets inside
    // 1-day windows), so whole 2^44 buckets land in the window holding
    // their start, the bucket containing T0 is dropped (activation
    // quirk), and the final window keeps its straddler's tail past the
    // truncated end. Counts exact, boundaries approximate — the
    // reference's rollup-speed trade, reproduced bit-for-bit.
    "q_windows_depth" -> QueryDef({
      val c = StatOps.depthBucketPw(46)   // = 44
      val u = 1L << c
      val e = TimeOps.truncateEnd(T0, winEnd, DayNs)
      val lo = TimeOps.alignDown(T0, c) + u
      val hi = TimeOps.alignDown(e - 1, c) + u
      s"""$P, agg AS (
         |  SELECT ((((time >> $c) << $c) - $T0) // $DayNs) AS i,
         |    COUNT(*) AS cnt, MIN(value) AS vmin,
         |    ${meanSql()} AS vmean, MAX(value) AS vmax
         |  FROM points WHERE sid = 5 AND time >= $lo AND time < $hi
         |  GROUP BY 1)
         |SELECT g.i AS i, g.i * $DayNs + $T0 AS wstart,
         |  CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt, COALESCE(vmin, 0.0) AS vmin,
         |  COALESCE(vmean, 0.0) AS vmean, COALESCE(vmax, 0.0) AS vmax
         |FROM generate_series(0, 44) AS g(i) LEFT JOIN agg ON agg.i = g.i
         |ORDER BY 1""".stripMargin
    }) { (s, dir) =>
      // timeSlice carries the scan bounds on the RAW ts column so they
      // push into the parquet reader (the operator's own filter is on
      // the derived ns expression, which can't push)
      val c = StatOps.depthBucketPw(46)
      val e = TimeOps.truncateEnd(T0, winEnd, DayNs)
      StatOps.windowsDepth(
        Tables.timeSlice(Tables.points(s, dir),
          TimeOps.alignDown(T0, c) + (1L << c),
          TimeOps.alignDown(e - 1, c) + (1L << c)),
        5, T0, winEnd, DayNs, depth = 46).orderBy("i")
    },

    // W1 — Nearest forward: first point with t >= T (inclusive).
    "q_nearest_fwd" -> QueryDef(
      s"""$P SELECT time, value FROM points WHERE sid = 2 AND time >= $nearT
         |ORDER BY time, value LIMIT 1""".stripMargin) { (s, dir) =>
      StatOps.nearest(Tables.timeSlice(Tables.points(s, dir), nearT,
        graft.core.TimeConsts.MaximumTime), 2, nearT, backward = false)
    },

    // W1 — Nearest backward: last point with t < T (exclusive).
    "q_nearest_back" -> QueryDef(
      s"""$P SELECT time, value FROM points WHERE sid = 2 AND time < $nearT
         |ORDER BY time DESC, value DESC LIMIT 1""".stripMargin) { (s, dir) =>
      StatOps.nearest(Tables.timeSlice(Tables.points(s, dir),
        graft.core.TimeConsts.MinimumTime, nearT), 2, nearT, backward = true)
    },

    // W2 — Changes(1, 4, resolution=44): per-commit touched ranges snapped
    // to 2^44 then interval-coalesced per stream.
    "q_changes" -> QueryDef(
      s"""$P, ranges AS (
         |  SELECT sid, (MIN(time) >> $pw44) << $pw44 AS s,
         |         ((MAX(time) >> $pw44) << $pw44) + $w44 AS e
         |  FROM points WHERE version > 1 AND version <= 4 GROUP BY sid, version),
         |m AS (SELECT sid, s, e,
         |  MAX(e) OVER (PARTITION BY sid ORDER BY s, e
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM ranges),
         |f AS (SELECT sid, s, e,
         |  CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS flag FROM m),
         |g AS (SELECT sid, s, e,
         |  SUM(flag) OVER (PARTITION BY sid ORDER BY s, e
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
         |  FROM f)
         |SELECT sid, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY sid, seg
         |ORDER BY sid, s""".stripMargin) { (s, dir) =>
      val ranges = Tables.points(s, dir)
        .groupBy("sid", "version")
        .agg(min("time").as("tmin"), max("time").as("tmax"))
      StatOps.changes(ranges, 1, 4, pw44).orderBy("sid", "s")
    },

    // W2 (tree-diff fidelity) — Changes from per-bucket touched ranges:
    // each commit records the exact envelope of every touched 2^44
    // bucket instead of one commit-wide envelope, so a commit touching
    // two distant clusters reports two ranges (the reference's
    // generation-stamped subtree walk, qtree.go:255-351). Snap to 2^40
    // and coalesce per stream.
    "q_changes_split" -> QueryDef(
      s"""$P, ranges AS (
         |  SELECT sid, ((MIN(time) >> 40) << 40) AS s,
         |         ((MAX(time) >> 40) << 40) + ${1L << 40} AS e
         |  FROM points WHERE version > 1 AND version <= 4
         |  GROUP BY sid, version, time >> $pw44),
         |m AS (SELECT sid, s, e,
         |  MAX(e) OVER (PARTITION BY sid ORDER BY s, e
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM ranges),
         |f AS (SELECT sid, s, e,
         |  CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS flag FROM m),
         |g AS (SELECT sid, s, e,
         |  SUM(flag) OVER (PARTITION BY sid ORDER BY s, e
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
         |  FROM f)
         |SELECT sid, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY sid, seg
         |ORDER BY sid, s""".stripMargin) { (s, dir) =>
      val ranges = Tables.points(s, dir)
        .groupBy(col("sid"), col("version"),
          shiftright(col("time"), pw44).as("tb"))
        .agg(min("time").as("tmin"), max("time").as("tmax"))
        .select("sid", "version", "tmin", "tmax")
      StatOps.changes(ranges, 1, 4, 40).orderBy("sid", "s")
    },

    // W2 (adaptive fine resolution) — Changes at 2^32 from ranges
    // recorded per 2^36 bucket: the adaptive commit recording keeps
    // per-bucket point envelopes, so a fine requested resolution (4.3 s
    // here) is served exactly instead of snapping to a coarse floor.
    "q_changes_fine" -> QueryDef(
      s"""$P, ranges AS (
         |  SELECT sid, ((MIN(time) >> 32) << 32) AS s,
         |         ((MAX(time) >> 32) << 32) + ${1L << 32} AS e
         |  FROM points WHERE version > 1 AND version <= 4
         |  GROUP BY sid, version, time >> 36),
         |m AS (SELECT sid, s, e,
         |  MAX(e) OVER (PARTITION BY sid ORDER BY s, e
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM ranges),
         |f AS (SELECT sid, s, e,
         |  CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS flag FROM m),
         |g AS (SELECT sid, s, e,
         |  SUM(flag) OVER (PARTITION BY sid ORDER BY s, e
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
         |  FROM f)
         |SELECT sid, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY sid, seg
         |ORDER BY sid, s""".stripMargin) { (s, dir) =>
      val ranges = Tables.points(s, dir)
        .groupBy(col("sid"), col("version"),
          shiftright(col("time"), 36).as("tb"))
        .agg(min("time").as("tmin"), max("time").as("tmax"))
        .select("sid", "version", "tmin", "tmax")
      StatOps.changes(ranges, 1, 4, 32).orderBy("sid", "s")
    },

    // S3 — DeleteRange [del0, del1) committed at version 4, read at latest:
    // merge-on-read anti-filter (points of version 5 in the range survive).
    "q_delete_range" -> QueryDef(
      s"""$P SELECT sid, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  MIN(time) AS tmin, MAX(time) AS tmax,
         |  CAST($sumCents AS BIGINT) AS sum_cents
         |FROM points
         |WHERE NOT (time >= $del0 AND time < $del1 AND version <= 4)
         |GROUP BY sid ORDER BY sid""".stripMargin) { (s, dir) =>
      Tables.points(s, dir)
        .filter(!(col("time") >= del0 && col("time") < del1 && col("version") <= 4))
        .groupBy("sid")
        .agg(count(lit(1)).as("cnt"), min("time").as("tmin"), max("time").as("tmax"),
          sum(cents(col("value"))).as("sum_cents"))
        .orderBy("sid")
    },

    // J3 — buffer-merge union: committed (v<=4) ∪ staging (v=5) then
    // re-aggregate — Spark's partial/final agg is the stat combine.
    "q_buffer_merge" -> QueryDef(
      s"""$P SELECT (time >> $pw44) << $pw44 AS wstart,
         |  CAST(COUNT(*) AS BIGINT) AS cnt, MIN(value) AS vmin,
         |  ${meanSql()} AS vmean, MAX(value) AS vmax
         |FROM points WHERE sid = 0 AND time >= $s44 AND time < $e44
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val p = Tables.timeSlice(Tables.points(s, dir), s44, e44)
        .filter(col("sid") === 0)
      val committed = p.filter(col("version") <= 4)
      val staging = p.filter(col("version") === 5)
      StatOps.alignedWindows(
        committed.unionByName(staging), pw44, T0, T0 + 35 * DayNs, keys = Nil)
        .orderBy("wstart")
    },

    // J1 — GenerateCSV k-way temporal align: 4 streams pivoted on the
    // 2^44 window; a stream with no points in a window yields NULL.
    "q_multi_align" -> QueryDef(
      s"""$P SELECT (time >> $pw44) << $pw44 AS wstart,
         |  ${alignCellSql(0)} AS s0, ${alignCellSql(1)} AS s1,
         |  ${alignCellSql(2)} AS s2, ${alignCellSql(3)} AS s3
         |FROM points WHERE sid < 4 AND time >= $s44 AND time < $e44
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      def cell(sid: Int) = meanFromCents(
        sum(when(col("sid") === sid, cents(col("value")))),
        count(when(col("sid") === sid, lit(1)))).as(s"s$sid")
      Tables.timeSlice(Tables.points(s, dir), s44, e44)
        .filter(col("sid") < 4)
        .groupBy(TimeOps.clampTime(col("time"), pw44).as("wstart"))
        .agg(cell(0), cell(1), cell(2), cell(3))
        .orderBy("wstart")
    },

    // J1 (raw mode) — k-way full-outer align on exact timestamps: each
    // output row is one instant; streams without a point there are NULL
    // (GenerateCSV raw semantics). Per-(sid,time) max() guards the join
    // against duplicate-timestamp blowup on both sides identically.
    "q_multi_align_raw" -> QueryDef(
      s"""$P, p AS (
         |  SELECT sid, time, MAX(value) AS v FROM points
         |  WHERE sid < 3 AND time >= $week1 AND time < ${week1 + 3 * DayNs}
         |  GROUP BY sid, time),
         |s0 AS (SELECT time, v AS v0 FROM p WHERE sid = 0),
         |s1 AS (SELECT time, v AS v1 FROM p WHERE sid = 1),
         |s2 AS (SELECT time, v AS v2 FROM p WHERE sid = 2)
         |SELECT COALESCE(s0.time, s1.time, s2.time) AS time, v0, v1, v2
         |FROM s0
         |FULL JOIN s1 ON s0.time = s1.time
         |FULL JOIN s2 ON COALESCE(s0.time, s1.time) = s2.time
         |ORDER BY time""".stripMargin) { (s, dir) =>
      // the chained full-outer joins are a PIVOT: one row per time
      // present in ANY of the three sids, with that sid's MAX(value)
      // or null — identical rows from ONE scan + one aggregate instead
      // of three scan+aggregate subtrees and two full-outer
      // SortMergeJoins (8 Exchanges → 2, 3 scans → 1)
      Tables.timeSlice(Tables.points(s, dir), week1, week1 + 3 * DayNs)
        .filter(col("sid") < 3)
        .groupBy("time").pivot("sid", Seq(0, 1, 2)).agg(max("value"))
        .select(col("time"), col("0").as("v0"), col("1").as("v1"),
          col("2").as("v2"))
        .orderBy("time")
    },

    // A1/A2 — stat pyramid: rollup at pw=38 combined up to pw=44; the
    // oracle aggregates raw points directly — exact-integer stats make
    // the two algebraically identical (count/min/max/sum compose).
    "q_stat_pyramid" -> QueryDef(
      s"""$P SELECT sid, (time >> $pw44) << $pw44 AS wstart,
         |  CAST(COUNT(*) AS BIGINT) AS cnt, MIN(value) AS vmin,
         |  ${meanSql()} AS vmean, MAX(value) AS vmax
         |FROM points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val l1 = Tables.points(s, dir)
        .groupBy(col("sid"), TimeOps.clampTime(col("time"), 38).as("w"))
        .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
          max("value").as("vmax"), sum(cents(col("value"))).as("sc"))
      l1.groupBy(col("sid"), TimeOps.clampTime(col("w"), pw44).as("wstart"))
        .agg(sum("cnt").as("cnt"), min("vmin").as("vmin"),
          meanFromCents(sum(col("sc")), sum(col("cnt"))).as("vmean"),
          max("vmax").as("vmax"))
        .select("sid", "wstart", "cnt", "vmin", "vmean", "vmax")
        .orderBy("sid", "wstart")
    },

    // J2 — LookupStreams: tag-value predicate + key-existence semi-join
    // over the catalog's tag map.
    "q_lookup_streams" -> QueryDef(
      s"""$C SELECT sid, collection FROM catalog
         |WHERE parity = '1' AND special IS NOT NULL ORDER BY sid""".stripMargin) { (s, dir) =>
      Tables.catalog(s, dir)
        .filter(col("tags")("parity") === "1" && col("tags")("special").isNotNull)
        .select("sid", "collection")
        .orderBy("sid")
    },

    // A6 — GetKeyUsage: streams-per-tag-key counts for a collection prefix.
    "q_key_usage" -> QueryDef(
      s"""$C SELECT key, CAST(cnt AS BIGINT) AS cnt FROM (
         |  SELECT 'bucket' AS key, COUNT(*) AS cnt FROM catalog
         |  UNION ALL SELECT 'parity', COUNT(*) FROM catalog
         |  UNION ALL SELECT 'special', COUNT(*) FROM catalog WHERE special IS NOT NULL)
         |ORDER BY key""".stripMargin) { (s, dir) =>
      Tables.catalog(s, dir)
        .filter(col("collection").startsWith("events/"))
        .select(explode(map_keys(col("tags"))).as("key"))
        .groupBy("key").agg(count(lit(1)).as("cnt"))
        .orderBy("key")
    },

    // O3 — ListCollections: prefix scan, ordered, limited.
    "q_list_collections" -> QueryDef(
      s"""$C SELECT DISTINCT collection FROM catalog
         |WHERE collection LIKE 'events/%' ORDER BY collection LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.catalog(s, dir)
        .filter(col("collection").startsWith("events/"))
        .select("collection").distinct()
        .orderBy("collection").limit(10)
    })

  private def alignCellSql(sid: Int): String =
    s"SUM(CASE WHEN sid = $sid THEN CAST(ROUND(value*100, 0) AS BIGINT) END) / 100.0" +
      s" / NULLIF(COUNT(CASE WHEN sid = $sid THEN 1 END), 0)"
}
