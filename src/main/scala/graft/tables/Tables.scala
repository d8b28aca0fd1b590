package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables plus the deterministic
  * events→points mapping shared by every BTrDB-surface query and its
  * DuckDB oracle (FIXTURES.md §3).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS). Spark's TimestampType is
  * µs-precision, so we read nanos as a plain LongType ns column
  * (`spark.sql.legacy.parquet.nanosAsLong`) — which is exactly the
  * engine's canonical time representation (SURVEY §1.6) and matches
  * DuckDB's `epoch_ns(ts)` bit-for-bit.
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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
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
  def points(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      (col("user_id") % NumSids).as("sid"),
      expr("(ts div 1000) * 1000").as("time"),
      col("value"),
      (expr(s"(((ts div 1000) * 1000) - ${T0}L) div ${WeekNs}L") + lit(1L)).as("version"),
      col("event_type"),
      col("ts").as("ts_raw"))

  /** Time-range filter [lo, hi) on `time` that ALSO pushes to the parquet
    * scan: `time` is an arithmetic derivation of `ts`, so a predicate on
    * it alone cannot reach row-group stats. The conjoined raw-column
    * bounds are a strict superset (trunc(ts) >= lo ⇒ ts >= lo;
    * trunc(ts) < hi ⇒ ts < hi + 1000) — semantics unchanged, pushdown
    * restored. At 100 TB this is the difference between a pruned scan
    * and reading every row-group. */
  def timeSlice(df: DataFrame, lo: Long, hi: Long): DataFrame =
    df.filter(col("time") >= lo && col("time") < hi &&
      col("ts_raw") >= lo && col("ts_raw") < hi + 1000L)

  /** DuckDB CTE text equivalent to [[points]]. Paste as `WITH points AS (...)`.
    * `time` is truncated to µs-aligned ns on BOTH sides because DuckDB ≤1.0
    * reads parquet TIMESTAMP(NANOS) at µs precision — the engine itself
    * stays ns-native; only this shared fixture is µs-aligned. */
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
