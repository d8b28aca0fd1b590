package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables plus the deterministic
  * events→points mapping shared by every BTrDB-surface query and its
  * DuckDB oracle (FIXTURES.md §3).
  *
  * `events.ts` is parquet TIMESTAMP(MICROS) without UTC adjustment, which
  * Spark reads as TIMESTAMP_NTZ. The engine's canonical time axis is ns
  * since epoch (SURVEY §1.6), so [[points]] derives `time` as
  * `unix_micros(ts) * 1000` — bit-for-bit the same value DuckDB's
  * `epoch_ns(ts)` produces for the oracle (both treat the naive
  * timestamp as UTC; we pin the session zone to UTC in [[events]] so the
  * NTZ→LTZ hop inside `unix_micros` is the identity).
  */
object Tables {

  /** 2024-01-01T00:00:00Z in ns — epoch anchor for the events table. */
  val T0: Long = 1704067200000000000L
  val DayNs: Long = 86400000000000L
  val WeekNs: Long = 7L * DayNs
  /** Number of derived streams: sid = user_id % NumSids. */
  val NumSids: Int = 8

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    table(spark, dir, "events")
  }

  /** µs-since-epoch → TIMESTAMP_NTZ literal (UTC wall clock), for
    * predicates against the raw parquet `ts` column. */
  private def ntzLit(micros: Long) =
    lit(java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC))

  /** `ts` (TIMESTAMP_NTZ, µs) as ns since epoch — µs-aligned by
    * construction, so no further truncation is needed. */
  private val tsNsExpr = "unix_micros(cast(ts as timestamp_ltz)) * 1000"

  /** Pre-round-11 testdata carried `ts` as BIGINT ns; the driver can
    * regenerate the fixtures between rounds, so the Spark side adapts
    * to whichever physical type it finds (µs-truncating the ns form —
    * the historical semantics). The STATIC oracle CTEs ([[pointsSql]])
    * can't branch on schema; they match the current TIMESTAMP form, so
    * a future flip back to BIGINT surfaces as an oracle-side error,
    * not a silent Spark-side crash taking the whole suite down. */
  private def tsNsExprFor(df: DataFrame): String =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "(ts div 1000) * 1000"
      case _ => tsNsExpr
    }

  /** The engine's point log derived from `events`:
    *   sid     = user_id % 8
    *   time    = ns since epoch (exact, ns granularity)
    *   value   = events.value (2-decimal doubles)
    *   version = 1 + (time - T0) div week  — one commit "generation" per
    *             week of data, giving 5 versions over the one-month range
    *             to exercise version pinning / changes / buffer-merge.
    *
    * Oracle-side equivalent (DuckDB): see [[pointsSql]].
    */
  def points(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val tsNs = tsNsExprFor(ev)
    ev.select(
      (col("user_id") % NumSids).as("sid"),
      expr(tsNs).as("time"),
      col("value"),
      (expr(s"(($tsNs) - ${T0}L) div ${WeekNs}L") + lit(1L)).as("version"),
      col("event_type"),
      col("ts").as("ts_raw"))
  }

  /** Time-range filter [lo, hi) on `time` that ALSO pushes to the parquet
    * scan: `time` is an arithmetic derivation of `ts`, so a predicate on
    * it alone cannot reach row-group stats. The conjoined raw-column
    * bounds are a strict superset in µs space (time = µs*1000 ≥ lo ⇒
    * µs ≥ ⌊lo/1000⌋; time < hi ⇒ µs < ⌊hi/1000⌋+1) — semantics
    * unchanged, pushdown restored. At 100 TB this is the difference
    * between a pruned scan and reading every row-group. */
  def timeSlice(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.schema("ts_raw").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns-typed raw column: `div` truncates toward zero, so for
        // NEGATIVE ts the truncated `time` sits above ts — the strict
        // raw-bound superset is symmetric: time ≥ lo ⇒ ts > lo - 1000,
        // time < hi ⇒ ts < hi + 999
        df.filter(col("time") >= lo && col("time") < hi &&
          col("ts_raw") >= lo - 999L && col("ts_raw") < hi + 999L)
      case _ =>
        df.filter(col("time") >= lo && col("time") < hi &&
          col("ts_raw") >= ntzLit(Math.floorDiv(lo, 1000L)) &&
          col("ts_raw") < ntzLit(Math.floorDiv(hi, 1000L) + 1L))
    }

  /** DuckDB CTE text equivalent to [[points]]. Paste as `WITH points AS (...)`.
    * The source `ts` is TIMESTAMP(MICROS), so `epoch_ns(ts)` is already
    * µs-aligned and the `// 1000 * 1000` truncation is the identity — kept
    * so both sides stay textually robust to a finer-grained source. */
  val pointsSql: String =
    s"""SELECT user_id % $NumSids AS sid,
       |       (epoch_ns(ts) // 1000) * 1000 AS time,
       |       value,
       |       (((epoch_ns(ts) // 1000) * 1000) - $T0) // $WeekNs + 1 AS version,
       |       event_type
       |FROM events""".stripMargin

  /** Derived stream catalog: one stream per sid with a deterministic
    * collection and tag map (SURVEY §1.1 StreamDescriptor shape). The
    * 'special' tag exists only for sid % 3 == 0 so key-existence lookups
    * and key-usage counts are non-trivial.
    */
  def catalog(spark: SparkSession, dir: String): DataFrame =
    points(spark, dir).select("sid").distinct().select(
      col("sid"),
      concat(lit("events/"), (col("sid") % 2).cast("string")).as("collection"),
      when(col("sid") % 3 === 0,
        map(lit("parity"), (col("sid") % 2).cast("string"),
            lit("bucket"), (col("sid") % 4).cast("string"),
            lit("special"), lit("yes")))
        .otherwise(
          map(lit("parity"), (col("sid") % 2).cast("string"),
              lit("bucket"), (col("sid") % 4).cast("string")))
        .as("tags"))

  /** DuckDB CTE for the catalog in tidy (one row per stream) form with
    * tag values as plain columns — semantically the same predicate
    * surface as the map in [[catalog]]. */
  val catalogSql: String =
    s"""SELECT DISTINCT user_id % $NumSids AS sid,
       |       'events/' || CAST((user_id % $NumSids) % 2 AS VARCHAR) AS collection,
       |       CAST((user_id % $NumSids) % 2 AS VARCHAR) AS parity,
       |       CAST((user_id % $NumSids) % 4 AS VARCHAR) AS bucket,
       |       CASE WHEN (user_id % $NumSids) % 3 = 0 THEN 'yes' END AS special
       |FROM events""".stripMargin
}
