package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derived-stream ("distillate") transforms over the point log — the
  * operator family the reference ecosystem computes as materialized
  * distillate streams on top of BTrDB (the DISTIL pattern: a derived
  * stream per input stream, recomputed over changed ranges; the engine
  * here expresses each as one declarative pass so Catalyst schedules
  * it as a single per-stream ordered window or one co-partitioned
  * shuffle).
  *
  * Inputs are point frames with (sid LONG, time LONG ns, value DOUBLE).
  * Every transform is deterministic: window orders break time ties by
  * value, and all float arithmetic is a single shared expression shape
  * so the DuckDB oracle evaluates the identical IEEE tree.
  */
object Distillate {

  /** Per-stream ordered window. Ties on time are ordered by value so
    * results are stable under any physical row order. */
  private def seq(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy(col("time"), col("value"))

  /** Rate of change between consecutive points of each stream, in
    * value-units per second: (v - v_prev) * 1e9 / (t - t_prev).
    *
    * Emits one row per point that HAS a predecessor. `rate` is NULL
    * when the two points share a timestamp (duplicate-µs events —
    * a 0-ns baseline has no defined slope). `rate_ctr` additionally
    * treats a value DECREASE as a counter reset (the monotone-counter
    * convention): NULL instead of a negative artifact spike.
    *
    * One shuffle (the per-sid window exchange); at cluster scale each
    * stream's pass is a single ordered partition sweep — the same
    * shape the reference's changed-range distillate recompute walks.
    */
  def rate(points: DataFrame, keys: Seq[String] = Seq("sid")): DataFrame = {
    val w = seq(keys)
    val dv = col("value") - lag("value", 1).over(w)
    val dt = col("time") - lag("time", 1).over(w)
    val r = dv * lit(1.0e9) / nullif(dt, lit(0L))
    points
      .select(keys.map(col) ++ Seq(col("time"), col("value"),
        lag("time", 1).over(w).as("pt"), r.as("rate"),
        when(dv < 0, lit(null)).otherwise(r).as("rate_ctr")): _*)
      .filter(col("pt").isNotNull)
      .drop("pt")
  }

  /** Inter-arrival gaps larger than `thresholdNs` per stream: emits
    * (keys…, gap_start, gap_end, gap_ns) for each consecutive pair of
    * points whose spacing exceeds the threshold — the data-outage /
    * hole-report distillate. Same single-window shape as [[rate]]. */
  def gaps(points: DataFrame, thresholdNs: Long,
           keys: Seq[String] = Seq("sid")): DataFrame = {
    val w = seq(keys)
    points
      .select(keys.map(col) ++ Seq(
        lag("time", 1).over(w).as("gap_start"),
        col("time").as("gap_end")): _*)
      .filter(col("gap_start").isNotNull &&
        col("gap_end") - col("gap_start") > thresholdNs)
      .withColumn("gap_ns", col("gap_end") - col("gap_start"))
  }

  /** Threshold-crossing events per stream: each point where the value
    * crosses `threshold` relative to the previous point — `dir` = "up"
    * (value ≥ T, previous < T) or "down" (value < T, previous ≥ T) —
    * the DISTIL ecosystem's canonical event-detection distillate (the
    * voltage-sag / frequency-excursion detectors the reference's
    * analytics layer runs on every feed). Pure comparisons on the
    * shared (time, value) order — no float arithmetic, so both engines
    * agree bit-for-bit; the first point of a stream has no predecessor
    * and emits nothing. Same single ordered window pass as [[rate]]. */
  def crossings(points: DataFrame, threshold: Double,
                keys: Seq[String] = Seq("sid")): DataFrame = {
    val w = seq(keys)
    val pv = lag("value", 1).over(w)
    points
      .select(keys.map(col) ++ Seq(col("time"), col("value"),
        pv.as("pv")): _*)
      .filter(col("pv").isNotNull &&
        ((col("value") >= threshold && col("pv") < threshold) ||
          (col("value") < threshold && col("pv") >= threshold)))
      .withColumn("dir",
        when(col("value") >= threshold, "up").otherwise("down"))
      .drop("pv")
  }

  /** As-of alignment: for every left row, the most recent right row at
    * or before its `time` (the reference ecosystem's align-to-driving-
    * stream distillate step; SQL AS OF join).
    *
    * Distributed shape — NO global-order window and NO range join:
    *  1. both sides bucket into `tileNs` time tiles;
    *  2. the right side's per-tile LAST value (max (rtime, rvalue)
    *     struct — value breaks timestamp ties deterministically) is a
    *     tiny frame (one row per non-empty tile, data-independent
    *     cardinality ≈ range/tileNs), whose running prefix BEFORE each
    *     tile becomes the tile's carry-in;
    *  3. left rows, right rows and (broadcast) carry-ins co-partition
    *     on the tile for one within-tile ordered window; right rows
    *     order before left rows at equal time (at-or-before includes
    *     the same instant).
    *
    * One data-scale shuffle (the tile exchange); the only single-
    * partition window runs over the tile-aggregate frame, which grows
    * with the TIME RANGE, not the data volume. `tileNs` is the skew
    * knob: smaller tiles spread hot ranges over more partitions.
    *
    * Left columns pass through; the matched right row arrives as
    * (ref_time, ref_value), NULL before the first right point.
    */
  def asOf(left: DataFrame, right: DataFrame, tileNs: Long): DataFrame = {
    val reserved = Set("tile", "tag", "rtime", "rvalue", "seen", "carry", "m",
      "ref_time", "ref_value")
    require(!left.columns.exists(reserved),
      s"asOf left frame must not use the internal column names $reserved")
    val lcols = left.columns.toSeq
    // the tile id is the tile's START, t − (t mod tileNs): pure int64
    // arithmetic — raw ns exceed 2^53, so any division-based tile id
    // (double quotient, or even floorDiv's divide-after-align) can
    // round at the boundaries; the pmod form is exact for the whole
    // signed domain and stays floor-aligned for negative times
    val tile = (col("time") - pmod(col("time"), lit(tileNs))).as("tile")

    val l = left.select(col("*"), tile, lit(1).as("tag"),
      col("time").as("rtime"), lit(null).cast("double").as("rvalue"))
    val r = right.select(
      Seq(tile, lit(0).as("tag"), col("time").as("rtime"),
        col("value").as("rvalue")) ++
        lcols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Per-tile last right value, then the running prefix STRICTLY
    // before each tile = the tile's carry-in. Tiles that exist only on
    // the LEFT side must still receive a carry row, so the prefix runs
    // over the union of both sides' tile ids. Both windows run over the
    // tile-aggregate frame only (bounded by range/tileNs, not by rows).
    val perTile = right
      .groupBy((col("time") - pmod(col("time"), lit(tileNs))).as("tile"))
      .agg(max(struct(col("time").as("rtime"), col("value").as("rvalue")))
        .as("lastr"))
    val tiles = l.select("tile").distinct()
      .unionByName(perTile.select("tile")).distinct()
    val carry = tiles
      .join(perTile, Seq("tile"), "left_outer")
      .select(col("tile"),
        max("lastr").over(Window.orderBy("tile")
          .rowsBetween(Window.unboundedPreceding, -1)).as("carry"))

    // Within-tile ordered sweep: last right row at-or-before each row.
    // Right rows (tag 0) sort before left rows (tag 1) at equal time.
    val w = Window.partitionBy("tile")
      .orderBy(col("rtime"), col("tag"), col("rvalue"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("seen",
        last(when(col("tag") === 0, struct(col("rtime"), col("rvalue"))),
          ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .join(broadcast(carry), Seq("tile"), "left_outer")
      .withColumn("m", coalesce(col("seen"), col("carry")))
      .select(lcols.map(col) ++ Seq(
        col("m.rtime").as("ref_time"),
        col("m.rvalue").as("ref_value")): _*)
  }

  /** Stream-correlation matrix: Pearson correlation between every pair
    * of streams over their ALIGNED-WINDOW mean series — the
    * find-related-feeds analytic the reference ecosystem runs over
    * distillate streams (correlated phasor/voltage feeds). Windows of
    * width 2^pw aligned to the epoch; a pair correlates over the
    * windows where BOTH streams have data.
    *
    * Exactness: each window mean is quantized to floor(mean·100)
    * (integer "mean cents" — floor of an exact-integer-over-count
    * division, bit-identical in any engine), and all five Pearson
    * accumulators are integer sums — order-independent — so the final
    * double expression tree is the only float arithmetic and any two
    * engines agree bit-for-bit (casting the same exact integer to
    * double rounds identically whatever the engine's wide-int type).
    * NULL for a pair where either series is constant (zero variance).
    * The accumulators are DECIMAL(38,0) on the Spark side (DuckDB sums
    * BIGINT into HUGEINT on its own): a LONG n·Σx² wraps silently once
    * n²·(mean cents)² exceeds 2^63 — at ~550 windows that is a mean of
    * only ~±55k units, well inside real data. Values off the cents
    * grid entirely (|v| > 9e16) are NULL-skipped by [[StatOps.cents]],
    * the same domain rule as every cents aggregate.
    *
    * Scale shape: the aligned aggregation reduces the data to a
    * (streams × windows) series frame BEFORE any pairing; the pair
    * join is an equi-join on the window start (per-window fan-out =
    * streams, the inherent k² of a correlation matrix), and the final
    * per-pair reduce is a map-side-combined hash aggregate. */
  def corrMatrix(points: DataFrame, pw: Int, start: Long, end: Long): DataFrame = {
    val s = graft.core.TimeOps.alignDown(start, pw)
    val e = graft.core.TimeOps.alignDown(end, pw)
    val wm = points
      .filter(col("time") >= s && col("time") < e)
      .groupBy(col("sid"),
        graft.core.TimeOps.clampTime(col("time"), pw).as("wstart"))
      // centsSum, not a raw long sum: a window of near-domain cents
      // overflows int64 (the StatOps.centsSum contract)
      .agg(sum(StatOps.centsSum(col("value"))).as("sc"), count(lit(1)).as("cnt"))
      .select(col("sid"), col("wstart"),
        floor(col("sc").cast("double") / col("cnt")).cast("long").as("mq"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val a = wm.select(col("sid").as("sa"), col("wstart"),
      col("mq").cast(dec).as("x"))
    val b = wm.select(col("sid").as("sb"), col("wstart"),
      col("mq").cast(dec).as("y"))
    val g = a.join(b, Seq("wstart")).filter(col("sa") < col("sb"))
      .groupBy("sa", "sb")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val da = col("n") * col("sxx") - col("sx") * col("sx")
    val db = col("n") * col("syy") - col("sy") * col("sy")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    g.select(col("sa"), col("sb"), col("n").as("n_win"),
      when(da === 0 || db === 0, lit(null))
        .otherwise(num.cast("double") /
          (sqrt(da.cast("double")) * sqrt(db.cast("double"))))
        .as("corr_w"))
  }

  /** Exact p50/p95 per aligned 2^pw window — the percentile face of
    * the stat-window family, with NO interpolation ambiguity: median =
    * mean of the middle one-or-two CENTS values, p95 = the
    * nearest-rank (ceil(0.95·n)) value; every selection is integer
    * rank arithmetic over cents, the final /100.0 the only float step.
    * One shuffle: the rank window and the per-window aggregate share
    * the (sid, wstart) partitioning. */
  def quantileWindows(points: DataFrame, pw: Int): DataFrame = {
    val win = Window.partitionBy("sid", "wstart")
    val b = points.select(col("sid"),
      expr(s"(time >> $pw) << $pw").as("wstart"),
      expr("CAST(ROUND(value*100, 0) AS BIGINT)").as("c"))
    b.withColumn("rn", row_number().over(win.orderBy("c")))
      .withColumn("n", count(lit(1)).over(win))
      .groupBy("sid", "wstart")
      .agg(max("n").as("nn"),
        sum(when(col("rn") === expr("(n+1) div 2") ||
          col("rn") === expr("(n+2) div 2"), col("c"))).as("mid"),
        max(when(col("rn") === expr("(19*n + 19) div 20"), col("c"))).as("c95"))
      .select(col("sid"), col("wstart"), col("nn").as("cnt"),
        (col("mid") / (lit(2) - col("nn") % 2) / lit(100.0)).as("p50"),
        (col("c95") / lit(100.0)).as("p95"))
  }

  /** Number of grid instants start, start+step, … strictly below
    * `end` — shared by both resamplers AND their oracle SQL (the
    * query layer splices this value, so the two sides cannot drift). */
  def gridSize(start: Long, end: Long, step: Long): Long =
    Math.max(0L, Math.floorDiv(end - 1 - start, step) + 1)

  private def gridOf(points: DataFrame, start: Long, end: Long,
                     step: Long): DataFrame =
    points.sparkSession.range(gridSize(start, end, step))
      .select((col("id") * step + start).as("time"))

  /** Zero-order-hold resample: the stream's value held at each grid
    * instant start, start+step, … (< end) — [[asOf]] with a generated
    * grid as the left side. The grid is `spark.range`-born (size set by
    * the query range, not the data), so the only data-scale work is the
    * right side's tile pass. */
  def resampleHold(points: DataFrame, start: Long, end: Long, step: Long,
                   tileNs: Long): DataFrame =
    asOf(gridOf(points, start, end, step), points, tileNs)

  /** Linear-interpolation resample: at each grid instant g the value
    * v0 + (v1 − v0)·(g − t0)/(t1 − t0) between the last point at or
    * before g and the FIRST point strictly after it; NULL strictly
    * outside [first, last] (no extrapolation). A grid instant hitting
    * a point exactly returns that point's value — including at the
    * last point, where no strictly-after neighbor exists.
    *
    * Both neighbors come from the same tile-partitioned [[asOf]]: the
    * strictly-after side runs it on the negated, parity-shifted axis
    * t ↦ −2t (left probes at −(2g+1)), so "at-or-before" there is
    * exactly "strictly-after" here and the tie rule (nearest time,
    * then larger value) is preserved — no second operator to keep
    * correct. Two tile shuffles + one grid-sized equi-join; still no
    * range join, no data-sized single-partition window. */
  def resampleLinear(points: DataFrame, start: Long, end: Long, step: Long,
                     tileNs: Long): DataFrame = {
    val grid = gridOf(points, start, end, step)
    val prev = asOf(grid, points, tileNs)
      .select(col("time"), col("ref_time").as("t0"), col("ref_value").as("v0"))
    val nxt = asOf(
        grid.select(col("time").as("g"), (col("time") * -2 - 1).as("time")),
        points.select((col("time") * -2).as("time"), col("value")),
        tileNs)
      .select(col("g").as("time"),
        // −ref_time = 2t exactly (even → zero remainder), so `div`
        // is exact for either sign of t
        expr("(-ref_time) div 2").as("t1"), col("ref_value").as("v1"))
    prev.join(nxt, Seq("time"))
      .select(col("time"), col("t0").as("prev_time"), col("t1").as("next_time"),
        // an exact hit returns the sample even at the LAST point,
        // where no strictly-after neighbor exists
        when(col("t0") === col("time"), col("v0"))
          .when(col("t0").isNotNull && col("t1").isNotNull,
            col("v0") + (col("v1") - col("v0")) * (col("time") - col("t0")) /
              (col("t1") - col("t0")))
          .as("v_lerp"))
  }
}
