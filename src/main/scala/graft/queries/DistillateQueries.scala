package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Distillate
import graft.tables.Tables
import graft.tables.Tables.{DayNs, T0}

/** Derived-stream ("distillate") queries over the point log — the
  * rate / gap / alignment family the reference ecosystem computes as
  * DISTIL distillate streams on top of BTrDB. Each entry pairs the
  * [[graft.operators.Distillate]] transform with a DuckDB oracle whose
  * float arithmetic is the same IEEE expression tree (shared literal
  * shapes; integer time math throughout).
  */
object DistillateQueries {

  private val week1 = T0 + 7 * DayNs
  private val week2 = T0 + 14 * DayNs
  private val end28 = T0 + 28 * DayNs
  /** Gap-report threshold: 2 h. At sf0.01 the per-stream median
    * inter-arrival is ~22 min with a multi-hour tail, so the report is
    * non-empty but far from all-pairs at every SF. */
  private val GapNs = 7200000000000L
  /** Resample grid: 6-hour zero-order-hold steps across the 28 days.
    * NGrid comes from the operator's own grid-size formula so the
    * oracle's generated series can never drift from the Spark grid. */
  private val StepNs = 21600000000000L
  private val NGrid = Distillate.gridSize(T0, end28, StepNs)
  /** As-of tile width (the skew knob): one day. */
  private val TileNs = DayNs
  /** Correlation-matrix window: 2^42 ns (~73 min) aligned windows. */
  private val CorrPw = 42
  private val cs42 = graft.core.TimeOps.alignDown(T0, CorrPw)
  private val ce42 = graft.core.TimeOps.alignDown(end28, CorrPw)

  private val P = s"WITH points AS (${Tables.pointsSql})"

  /** The identical IEEE rate expression on both sides:
    * (v − v_prev) · 1e9 / (t − t_prev), NULL on a 0-ns baseline. */
  private val rateSql =
    "(value - pv) * 1000000000.0 / NULLIF(time - pt, 0)"

  /** Crossing-detector threshold: well above the ~34 median and well
    * below the ~320 max of every stream's values, so both directions
    * fire throughout the range at every SF. */
  private val CrossT = 100.0

  val defs: Map[String, QueryDef] = Map(

    // Event detection: threshold crossings of stream 6 — the DISTIL
    // sag/excursion-detector distillate. Pure comparisons against the
    // shared (time, value) order; no float arithmetic to diverge.
    "q_threshold_events" -> QueryDef(
      s"""$P, s AS (
         |  SELECT time, value, lag(value) OVER w AS pv
         |  FROM points WHERE sid = 6
         |  WINDOW w AS (ORDER BY time, value))
         |SELECT time, value,
         |  CASE WHEN value >= $CrossT THEN 'up' ELSE 'down' END AS dir
         |FROM s
         |WHERE pv IS NOT NULL AND
         |  ((value >= $CrossT AND pv < $CrossT) OR
         |   (value < $CrossT AND pv >= $CrossT))
         |ORDER BY time, value""".stripMargin) { (s, dir) =>
      Distillate.crossings(
        Tables.points(s, dir).filter(col("sid") === 6)
          .select("sid", "time", "value"), CrossT)
        .select("time", "value", "dir")
        .orderBy("time", "value")
    },

    // Rate-of-change distillate: units/second between consecutive
    // points; rate_ctr treats a decrease as a counter reset (NULL).
    "q_rate" -> QueryDef(
      s"""$P, s AS (
         |  SELECT sid, time, value,
         |    lag(time)  OVER w AS pt, lag(value) OVER w AS pv
         |  FROM points WHERE sid = 2 AND time >= $week1 AND time < $week2
         |  WINDOW w AS (PARTITION BY sid ORDER BY time, value))
         |SELECT sid, time, value, $rateSql AS rate,
         |  CASE WHEN value - pv < 0 THEN NULL ELSE $rateSql END AS rate_ctr
         |FROM s WHERE pt IS NOT NULL ORDER BY time, value""".stripMargin) { (s, dir) =>
      Distillate.rate(
        Tables.timeSlice(Tables.points(s, dir), week1, week2)
          .filter(col("sid") === 2)
          .select("sid", "time", "value"))
        .orderBy("time", "value")
    },

    // Gap report: inter-arrival holes > 2 h, every stream.
    "q_gaps" -> QueryDef(
      s"""$P, s AS (
         |  SELECT sid,
         |    lag(time) OVER (PARTITION BY sid ORDER BY time, value) AS gap_start,
         |    time AS gap_end
         |  FROM points)
         |SELECT sid, gap_start, gap_end, gap_end - gap_start AS gap_ns
         |FROM s WHERE gap_start IS NOT NULL AND gap_end - gap_start > $GapNs
         |ORDER BY sid, gap_start""".stripMargin) { (s, dir) =>
      Distillate.gaps(
        Tables.points(s, dir).select("sid", "time", "value"), GapNs)
        .orderBy("sid", "gap_start")
    },

    // As-of alignment: stream 2's most recent value at or before each
    // stream-1 point of the second week (ties: right rows first, then
    // larger value — both sides spell the same order).
    "q_asof_align" -> QueryDef(
      s"""$P, l AS (
         |  SELECT time, value FROM points
         |  WHERE sid = 1 AND time >= $week1 AND time < $week2),
         |r AS (SELECT time, value FROM points WHERE sid = 2),
         |u AS (
         |  SELECT time, value, time AS otime, 1 AS tag FROM l
         |  UNION ALL
         |  SELECT time, value, time AS otime, 0 AS tag FROM r),
         |s AS (
         |  SELECT time, value, tag,
         |    last_value(CASE WHEN tag = 0 THEN time  END IGNORE NULLS) OVER w AS ref_time,
         |    last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER w AS ref_value
         |  FROM u WINDOW w AS (
         |    ORDER BY otime, tag, CASE WHEN tag = 0 THEN value END
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT time, value, ref_time, ref_value FROM s WHERE tag = 1
         |ORDER BY time, value""".stripMargin) { (s, dir) =>
      val pts = Tables.points(s, dir)
      Distillate.asOf(
        Tables.timeSlice(pts, week1, week2).filter(col("sid") === 1)
          .select("time", "value"),
        pts.filter(col("sid") === 2).select("time", "value"),
        TileNs)
        .orderBy("time", "value")
    },

    // Quantile stat windows: exact p50/p95 per aligned 2^44 window —
    // the percentile face of the stat-window family (BTrDB serves
    // count/min/mean/max; a telemetry user asks for tail latency).
    // NO interpolation ambiguity: median = mean of the middle one-or-
    // two CENTS values, p95 = the nearest-rank (ceil(0.95 n)) value —
    // every selection is integer rank arithmetic over the cents
    // integers, the final /100.0 the only float step, so both engines
    // agree bit-for-bit. One shuffle: the rank window and the
    // per-window aggregate share the (sid, wstart) partitioning.
    "q_quantile_windows" -> QueryDef(
      s"""$P, b AS (
         |  SELECT sid, (time >> 44) << 44 AS wstart,
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
         |FROM w GROUP BY sid, wstart ORDER BY sid, wstart""".stripMargin) { (s, dir) =>
      Distillate.quantileWindows(
        Tables.points(s, dir).select("sid", "time", "value"), 44)
        .orderBy("sid", "wstart")
    },

    // Seasonal (hour-of-day) profile per stream: the diurnal-shape
    // report a telemetry pipeline derives from every feed (T0 is
    // midnight UTC, so integer hour bucketing is exact: ns-epoch div
    // hour, mod 24 — positive domain, trunc == floor on both sides).
    "q_seasonal" -> QueryDef(
      s"""$P SELECT sid, (time // 3600000000000) % 24 AS hour,
         |  CAST(COUNT(*) AS BIGINT) AS cnt,
         |  MIN(value) AS vmin,
         |  SUM(CAST(ROUND(value*100, 0) AS BIGINT)) / 100.0 / COUNT(*) AS vmean,
         |  MAX(value) AS vmax
         |FROM points GROUP BY 1, 2 ORDER BY sid, hour""".stripMargin) { (s, dir) =>
      import graft.operators.StatOps
      // Same UNGUARDED cents as q_zscore below (not StatOps.cents, whose
      // NULL-skip would split numerator exclusion from the full COUNT(*)
      // denominator the oracle uses), summed via a DECIMAL(38,0)
      // accumulator so a window of legal near-domain values widens
      // exactly where DuckDB's HUGEINT does instead of wrapping/throwing.
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      Tables.points(s, dir)
        .groupBy(col("sid"), expr("(time div 3600000000000) % 24").as("hour"))
        .agg(count(lit(1)).as("cnt"), min("value").as("vmin"),
          StatOps.meanFromCents(
            sum(expr("CAST(ROUND(value*100, 0) AS BIGINT)").cast(dec)),
            count(lit(1))).as("vmean"),
          max("value").as("vmax"))
        .orderBy("sid", "hour")
    },

    // Anomaly report: points of stream 4 more than 2 sample standard
    // deviations from the stream mean over the 28 days. All Pearson-
    // style moments are exact integer cents sums; the z expression is
    // the one shared double tree. One scan + a broadcast one-row
    // stats frame — no shuffle of the points.
    "q_zscore" -> QueryDef(
      s"""$P, p AS (
         |  SELECT time, value, CAST(ROUND(value*100, 0) AS BIGINT) AS c
         |  FROM points WHERE sid = 4),
         |st AS (
         |  SELECT COUNT(*) AS n, SUM(c) AS s1, SUM(c*c) AS s2 FROM p)
         |SELECT time, value,
         |  (CAST(c*n - s1 AS DOUBLE) / n)
         |    / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE) / (n*(n-1))) AS z
         |FROM p, st
         |WHERE abs((CAST(c*n - s1 AS DOUBLE) / n)
         |    / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE) / (n*(n-1)))) > 2
         |ORDER BY time, value""".stripMargin) { (s, dir) =>
      // DECIMAL(38,0) moments: n·Σc² tops 2^63 already at sf0.1
      // (~125k points × cents² ~2.4e9) — a long would overflow where
      // DuckDB's HUGEINT stays exact; casting the same exact integer
      // to double rounds identically from either width. The cents
      // expression is the oracle's UNGUARDED round+cast (both engines
      // fail loudly past ±2^63 cents rather than this side silently
      // NULL-skipping what the oracle counts — the numerator-only
      // exclusion split StatOps.rawMean warns against).
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val p = Tables.points(s, dir).filter(col("sid") === 4)
        .select(col("time"), col("value"),
          expr("CAST(ROUND(value*100, 0) AS BIGINT)").cast(dec).as("c"))
      val st = p.agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      val z = ((col("c") * col("n") - col("s1")).cast("double") / col("n")) /
        sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n") * (col("n") - 1)))
      p.crossJoin(broadcast(st))
        .withColumn("z", z)
        .filter(abs(col("z")) > 2)
        .select("time", "value", "z")
        .orderBy("time", "value")
    },

    // Stream-correlation matrix: Pearson correlation of every stream
    // pair over cents-quantized aligned-window mean series. Integer
    // accumulators; the final double tree is the only float math.
    "q_stream_corr" -> QueryDef(
      s"""$P, wm AS (
         |  SELECT sid, (time >> $CorrPw) << $CorrPw AS wstart,
         |    CAST(FLOOR(CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*)) AS BIGINT) AS mq
         |  FROM points WHERE time >= $cs42 AND time < $ce42
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT a.sid AS sa, b.sid AS sb, a.mq AS x, b.mq AS y
         |  FROM wm a JOIN wm b ON a.wstart = b.wstart AND a.sid < b.sid),
         |g AS (
         |  SELECT sa, sb, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
         |  FROM p GROUP BY sa, sb)
         |SELECT sa, sb, CAST(n AS BIGINT) AS n_win,
         |  CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
         |       ELSE CAST(n*sxy - sx*sy AS DOUBLE)
         |         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
         |            * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
         |  END AS corr_w
         |FROM g ORDER BY sa, sb""".stripMargin) { (s, dir) =>
      Distillate.corrMatrix(
        Tables.timeSlice(Tables.points(s, dir), cs42, ce42)
          .select("sid", "time", "value"),
        CorrPw, T0, end28)
        .orderBy("sa", "sb")
    },

    // Linear-interpolation resample of stream 5 onto the 6-hour grid:
    // value between the last point at-or-before and the first strictly
    // after; NULL outside [first, last]. The shared IEEE tree is
    // v0 + (v1 − v0)·(g − t0)/(t1 − t0) on both sides.
    "q_resample_linear" -> QueryDef(
      s"""$P, g AS (
         |  SELECT $T0 + $StepNs * i AS time FROM range(0, $NGrid) t(i)),
         |r AS (SELECT time, value FROM points WHERE sid = 5),
         |u AS (
         |  SELECT time, time AS otime, 1 AS tag, NULL::DOUBLE AS value FROM g
         |  UNION ALL
         |  SELECT NULL, time AS otime, 0 AS tag, value FROM r),
         |s AS (
         |  SELECT time, tag,
         |    last_value(CASE WHEN tag = 0 THEN otime END IGNORE NULLS) OVER wp AS t0,
         |    last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER wp AS v0,
         |    first_value(CASE WHEN tag = 0 THEN otime END IGNORE NULLS) OVER wn AS t1,
         |    first_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER wn AS v1
         |  FROM u WINDOW
         |    wp AS (ORDER BY otime, tag, CASE WHEN tag = 0 THEN value END
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (ORDER BY otime, tag, CASE WHEN tag = 0 THEN -value END
         |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         |SELECT time, t0 AS prev_time, t1 AS next_time,
         |  CASE WHEN t0 = time THEN v0
         |       WHEN t0 IS NOT NULL AND t1 IS NOT NULL
         |       THEN v0 + (v1 - v0) * (time - t0) / (t1 - t0) END AS v_lerp
         |FROM s WHERE tag = 1 ORDER BY time""".stripMargin) { (s, dir) =>
      Distillate.resampleLinear(
        Tables.points(s, dir).filter(col("sid") === 5)
          .select("time", "value"),
        T0, end28, StepNs, TileNs)
        .orderBy("time")
    },

    // Zero-order-hold resample of stream 3 onto a 6-hour grid.
    "q_resample_hold" -> QueryDef(
      s"""$P, g AS (
         |  SELECT $T0 + $StepNs * i AS time FROM range(0, $NGrid) t(i)),
         |r AS (SELECT time, value FROM points WHERE sid = 3),
         |u AS (
         |  SELECT time, time AS otime, 1 AS tag, NULL::DOUBLE AS value FROM g
         |  UNION ALL
         |  SELECT NULL, time AS otime, 0 AS tag, value FROM r),
         |s AS (
         |  SELECT time, tag,
         |    last_value(CASE WHEN tag = 0 THEN otime END IGNORE NULLS) OVER w AS ref_time,
         |    last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER w AS ref_value
         |  FROM u WINDOW w AS (
         |    ORDER BY otime, tag, CASE WHEN tag = 0 THEN value END
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT time, ref_time, ref_value FROM s WHERE tag = 1
         |ORDER BY time""".stripMargin) { (s, dir) =>
      Distillate.resampleHold(
        Tables.points(s, dir).filter(col("sid") === 3)
          .select("time", "value"),
        T0, end28, StepNs, TileNs)
        .orderBy("time")
    },
  )
}
